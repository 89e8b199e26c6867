"""Quick kernel-level timing of swtpu.ops.wave_sw at engine shapes."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax.numpy as jnp
from swtpu.matrices import blosum50_ref
from swtpu.ops import wave_sw, xla_sw

def run(B, L, Q, check=False):
    rng = np.random.default_rng(0)
    m = blosum50_ref()
    q = rng.integers(0, 25, Q).astype(np.int8)
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(max(L//4,1), L+1)); subj[i, :n] = rng.integers(0, 25, n)
    prof = xla_sw.make_profile(q, m, pad_rows_to=wave_sw.W)
    need = -(-(L + 32) // 32) * 32
    while not wave_sw.has_lc(need):
        need += 32
    width = need - 32
    Lc = wave_sw.pick_lc(width)
    subjT = jnp.asarray(wave_sw.transpose_pad(subj, width))
    Bt = wave_sw.pick_bt_div(B)
    # Timing rules for the remote (axon) tunnel: block_until_ready is
    # non-blocking there and identical dispatches are served from a result
    # cache, so cycle DISTINCT lhs inputs and use a device->host transfer
    # of the last output as the barrier (FIFO device queue).
    lhs_vars = [jnp.asarray(wave_sw.build_lhs_banded(np.roll(prof, k, axis=0))) for k in range(11)]
    out = np.asarray(wave_sw.sw_wave(lhs_vars[0], subjT, gap=2, Lc=Lc, Bt=Bt))
    if check:
        ref = np.asarray(xla_sw.sw_score_bucket(jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32)), jnp.asarray(subj), gap=2, strip=32))
        assert (out == ref).all(), "MISMATCH"
    t0 = time.perf_counter(); reps = 10
    for k in range(reps):
        r = wave_sw.sw_wave(lhs_vars[1 + k % 10], subjT, gap=2, Lc=Lc, Bt=Bt)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    cells = B * subjT.shape[0] * prof.shape[0]
    print(f"B={B} L={L} Q={Q} Lc={Lc} Bt={Bt}: {dt*1e3:7.2f} ms {cells/dt/1e9:7.1f} GCUPS(padded) {'OK' if check else ''}")

if __name__ == "__main__":
    run(4096, 512, 512, check=True)
    run(4096, 288, 512, check=True)
    run(8192, 288, 144)
    run(4096, 512, 4548)
