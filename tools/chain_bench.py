"""Subject-chaining A/B on real hardware: equal-true-work chained vs
unchained wavefront kernels (swtpu.ops.wave_sw n_segs).

For one population of subjects, packs the SAME sequences (a) one per lane
and (b) chained S per lane, checks both against the exact XLA kernel, and
times steady state with the axon-safe protocol (distinct lhs inputs,
device->host barrier).  Reports padded GCUPS (sweep-overhead check: should
match the unchained rate) and TRUE GCUPS (the win: fewer padded cells for
the same real work).
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax.numpy as jnp
from swtpu.matrices import blosum50_ref
from swtpu.ops import wave_sw, xla_sw
from swtpu.utils import bucketing


def run(n_subj, max_len, qlen, S, check=True, reps=10):
    rng = np.random.default_rng(0)
    m = blosum50_ref()
    q = rng.integers(0, 25, qlen).astype(np.int8)
    lens = rng.integers(max(max_len // 4, 1), max_len + 1, n_subj)
    subjects = [rng.integers(0, 25, l).astype(np.int8) for l in lens]
    true_cells = int(lens.sum()) * qlen

    qpad = -(-qlen // 32) * 32
    prof = xla_sw.make_profile(q, m, pad_rows_to=qpad)

    ws = bucketing._chain_seg_cols(max_len, S) if S > 1 else None
    if S == 1:
        need = -(-(max_len + 32) // 32) * 32
        while not wave_sw.has_lc(need):
            need += 32
        width, L2 = need - 32, need
    else:
        width, L2 = S * ws, S * ws + 32
    lanes = -(-n_subj // S)
    Bt = wave_sw.pick_bt_div(-(-lanes // 128) * 128)
    bpad = -(-lanes // Bt) * Bt
    Lc = wave_sw.pick_lc(width)

    stack = np.full((L2, bpad), xla_sw.PAD_SUBJECT, np.int8)
    for k, s in enumerate(subjects):
        lane, seg = k // S, k % S
        off = seg * (ws or width)
        stack[off : off + len(s), lane] = s
    subjT = jnp.asarray(stack)
    padded_cells = bpad * L2 * qpad

    lhs_vars = [
        jnp.asarray(wave_sw.build_lhs_banded(np.roll(prof, k, axis=0))) for k in range(11)
    ]
    t0 = time.perf_counter()
    out = np.asarray(
        wave_sw.sw_wave(lhs_vars[0], subjT, gap=2, Lc=Lc, Bt=Bt, n_segs=S)
    )
    compile_s = time.perf_counter() - t0
    tag = f"S={S} ws={ws or width} L2={L2} lanes={bpad} Bt={Bt} Lc={Lc}"
    if check:
        wq = max(256, -(-max_len // 256) * 256)
        flat = np.full((n_subj, wq), xla_sw.PAD_SUBJECT, np.int8)
        for k, s in enumerate(subjects):
            flat[k, : len(s)] = s
        prof32 = xla_sw.make_profile(q, m, pad_rows_to=32)
        ref = np.asarray(
            xla_sw.sw_score_bucket(jnp.asarray(prof32), jnp.asarray(flat), gap=2, strip=32)
        )
        if not (out[:n_subj] == ref).all():
            bad = np.nonzero(out[:n_subj] != ref)[0][:5]
            print(f"{tag}: MISMATCH at {bad}: got {out[bad]} want {ref[bad]}")
            return
        if not (out[n_subj:] == 0).all():
            print(f"{tag}: pad slots nonzero")
            return
    t0 = time.perf_counter()
    for k in range(reps):
        r = wave_sw.sw_wave(lhs_vars[1 + k % 10], subjT, gap=2, Lc=Lc, Bt=Bt, n_segs=S)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{tag}: compile {compile_s:5.1f}s  {dt * 1e3:7.2f} ms  "
        f"{padded_cells / dt / 1e9:6.1f} GCUPS(padded)  "
        f"{true_cells / dt / 1e9:6.1f} GCUPS(true)  pad x{padded_cells / true_cells:.2f}"
        + ("  OK" if check else ""),
        flush=True,
    )


if __name__ == "__main__":
    # Mid-length population (SwissProt bulk): S=1 vs S=2 vs S=4
    for S in (1, 2, 4):
        run(8192, 224, 464, S)
    # Short population (SwissProt short tail): S=1 vs S=4 vs S=6
    for S in (1, 4, 6):
        run(16384, 96, 464, S)
