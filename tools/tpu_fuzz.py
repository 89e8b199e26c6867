"""Randomized on-TPU differential fuzz: wavefront kernel vs XLA exact.

Random (B, L, Q, gap, matrix) configurations, full random subject content
including empty sequences; asserts bit-exact agreement.  Complements the
CPU interpret tests (tests/test_wave.py) with real-Mosaic coverage.

Usage: python tools/tpu_fuzz.py [n_cases] [seed]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from swtpu.matrices import blosum50_ref, get_matrix
from swtpu.ops import wave_sw, xla_sw


def main(n_cases: int = 14, seed: int = 123) -> int:
    rng = np.random.default_rng(seed)
    n_ok = 0
    for i in range(n_cases):
        L = int(rng.choice([32, 96, 160, 288, 480, 800, 1376]))
        B = int(rng.choice([128, 256, 512, 1024]))
        Q = int(rng.integers(5, 700))
        gap = int(rng.choice([1, 2, 3]))
        mat = blosum50_ref() if i % 3 else get_matrix("blosum50")
        subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
        for b in range(B):
            n = int(rng.integers(0, L + 1))
            subj[b, :n] = rng.integers(0, 25, n)
        prof = xla_sw.make_profile(rng.integers(0, 25, Q).astype(np.int8), mat, pad_rows_to=32)
        got = np.asarray(wave_sw.sw_score_bucket_wave(prof, subj, gap=gap))
        want = np.asarray(
            xla_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=gap, strip=32)
        )
        ok = bool((got == want).all())
        n_ok += ok
        if not ok:
            print(f"MISMATCH case {i}: B={B} L={L} Q={Q} gap={gap}")
    print(f"TPU fuzz: {n_ok}/{n_cases} configs bit-exact")
    return 0 if n_ok == n_cases else 1


def main_multi(n_cases: int = 4, seed: int = 321) -> int:
    """Multi-query band batching: random Q equal-pad queries in ONE
    dispatch vs per-query dispatches (round-3 serving path)."""
    rng = np.random.default_rng(seed)
    n_ok = 0
    for i in range(n_cases):
        L = int(rng.choice([96, 288, 480]))
        B = int(rng.choice([256, 512]))
        nq = int(rng.integers(2, 9))
        qpad = int(rng.choice([64, 160, 320]))
        gap = int(rng.choice([1, 2]))
        mat = blosum50_ref()
        subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
        for b in range(B):
            n = int(rng.integers(0, L + 1))
            subj[b, :n] = rng.integers(0, 25, n)
        lhss, singles = [], []
        width = L
        need = -(-(L + wave_sw.W) // 32) * 32
        while not wave_sw.has_lc(need):
            need += 32
        width = need - wave_sw.W
        subjT = jnp.asarray(wave_sw.transpose_pad(subj, width))
        Lc, Bt = wave_sw.pick_lc(width), wave_sw.pick_bt_div(B)
        for _ in range(nq):
            ql = int(rng.integers(qpad - 31, qpad + 1))
            prof = xla_sw.make_profile(rng.integers(0, 25, ql).astype(np.int8), mat, pad_rows_to=qpad)
            lhss.append(wave_sw.build_lhs_banded(prof))
            singles.append(np.asarray(wave_sw.sw_wave(jnp.asarray(lhss[-1]), subjT, gap=gap, Lc=Lc, Bt=Bt)))
        multi = np.asarray(wave_sw.sw_wave(jnp.asarray(np.stack(lhss)), subjT, gap=gap, Lc=Lc, Bt=Bt))
        ok = all((multi[k] == singles[k]).all() for k in range(nq))
        n_ok += ok
        if not ok:
            print(f"MULTI MISMATCH case {i}: B={B} L={L} nq={nq} qpad={qpad} gap={gap}")
    print(f"TPU multi-query fuzz: {n_ok}/{n_cases} configs bit-exact")
    return 0 if n_ok == n_cases else 1


def main_shard(n_cases: int = 3, seed: int = 555) -> int:
    """Query-band systolic pipeline (top_in carry) vs XLA exact."""
    from swtpu.parallel.mesh import make_mesh
    from swtpu.parallel.query_shard import wave_query_sharded_scores

    rng = np.random.default_rng(seed)
    mesh = make_mesh(1)
    n_ok = 0
    for i in range(n_cases):
        L = int(rng.choice([150, 333, 700]))
        B = int(rng.integers(100, 900))
        Q = int(rng.integers(40, 600))
        gap = int(rng.choice([1, 2]))
        mat = blosum50_ref()
        subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
        for b in range(B):
            n = int(rng.integers(0, L + 1))
            subj[b, :n] = rng.integers(0, 25, n)
        qres = rng.integers(0, 25, Q).astype(np.int8)
        got = wave_query_sharded_scores(mesh, qres, subj, mat, gap=gap)
        prof = xla_sw.make_profile(qres, mat, pad_rows_to=32)
        want = np.asarray(xla_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=gap, strip=32))
        ok = bool((got == want).all())
        n_ok += ok
        if not ok:
            print(f"SHARD MISMATCH case {i}: B={B} L={L} Q={Q} gap={gap}")
    print(f"TPU query-shard fuzz: {n_ok}/{n_cases} configs bit-exact")
    return 0 if n_ok == n_cases else 1


def main_chain(n_cases: int = 6, seed: int = 777) -> int:
    """Subject chaining (n_segs lanes-of-S) vs XLA exact on real Mosaic.

    Random chain factor / segment width / query length / gap, random
    subject content including empty segments; asserts bit-exact per
    (lane, segment) flat slot and zero on pad slots."""
    from swtpu.utils import bucketing

    rng = np.random.default_rng(seed)
    n_ok = 0
    for i in range(n_cases):
        S = int(rng.choice([2, 3, 4, 6, 8]))
        max_len = int(rng.choice([48, 96, 150, 224]))
        ws = bucketing._chain_seg_cols(max_len, S)
        if ws is None:
            n_ok += 1
            continue
        lanes = int(rng.choice([128, 256]))
        Q = int(rng.integers(5, 500))
        gap = int(rng.choice([1, 2, 3]))
        mat = blosum50_ref() if i % 2 else get_matrix("blosum50")
        L2 = S * ws + wave_sw.W
        n_subj = lanes * S - int(rng.integers(0, lanes))
        stack = np.full((L2, lanes), xla_sw.PAD_SUBJECT, np.int8)
        flatw = max(256, -(-max_len // 256) * 256)
        flat = np.full((n_subj, flatw), xla_sw.PAD_SUBJECT, np.int8)
        for k in range(n_subj):
            n = int(rng.integers(0, max_len + 1))
            s = rng.integers(0, 25, n).astype(np.int8)
            stack[(k % S) * ws : (k % S) * ws + n, k // S] = s
            flat[k, :n] = s
        prof = xla_sw.make_profile(
            rng.integers(0, 25, Q).astype(np.int8), mat, pad_rows_to=-(-Q // 32) * 32
        )
        lhsB = wave_sw.build_lhs_banded(prof)
        got = np.asarray(
            wave_sw.sw_wave(
                jnp.asarray(lhsB),
                jnp.asarray(stack),
                gap=gap,
                Lc=wave_sw.pick_lc(S * ws),
                Bt=128,
                n_segs=S,
            )
        )
        want = np.asarray(
            xla_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(flat), gap=gap, strip=32)
        )
        ok = bool((got[:n_subj] == want).all() and (got[n_subj:] == 0).all())
        n_ok += ok
        if not ok:
            bad = np.nonzero(got[:n_subj] != want)[0][:4]
            print(f"CHAIN MISMATCH case {i}: S={S} ws={ws} Q={Q} gap={gap} at {bad}")
    print(f"TPU chain fuzz: {n_ok}/{n_cases} configs bit-exact")
    return 0 if n_ok == n_cases else 1


def main_affine(n_cases: int = 5, seed: int = 888) -> int:
    """Affine (Gotoh) wavefront mode vs the scalar oracle on real Mosaic.

    Random open/extend (open >= extend), query lengths crossing band
    boundaries, random subject lengths including empty."""
    from swtpu.ops import oracle

    rng = np.random.default_rng(seed)
    n_ok = 0
    for i in range(n_cases):
        L = int(rng.choice([96, 224, 480]))
        B = 128
        Q = int(rng.integers(5, 400))
        ext = int(rng.integers(1, 4))
        open_ = ext + int(rng.integers(0, 12))
        mat = blosum50_ref() if i % 2 else get_matrix("blosum50")
        subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
        lens = rng.integers(0, L + 1, B)
        for b in range(B):
            subj[b, : lens[b]] = rng.integers(0, 25, lens[b])
        q = rng.integers(0, 25, Q).astype(np.int8)
        prof = xla_sw.make_profile(q, mat, pad_rows_to=-(-Q // 32) * 32)
        lhsB = wave_sw.build_lhs_banded(prof)
        need = -(-(L + 32) // 32) * 32
        while not wave_sw.has_lc(need):
            need += 32
        subjT = jnp.asarray(wave_sw.transpose_pad(subj, need - 32))
        got = np.asarray(
            wave_sw.sw_wave(
                jnp.asarray(lhsB),
                subjT,
                Lc=wave_sw.pick_lc(need - 32),
                Bt=128,
                gap_open=open_,
                gap_extend=ext,
            )
        )
        ok = all(
            int(got[b]) == oracle.sw_affine_score_scalar(q, subj[b, : lens[b]], mat, open_, ext)
            for b in range(0, B, 5)
        )
        n_ok += ok
        if not ok:
            print(f"AFFINE MISMATCH case {i}: L={L} Q={Q} open={open_} ext={ext}")
    print(f"TPU affine fuzz: {n_ok}/{n_cases} configs bit-exact")
    return 0 if n_ok == n_cases else 1


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    rc = main(*args)
    rc |= main_multi()
    rc |= main_shard()
    rc |= main_chain()
    rc |= main_affine()
    raise SystemExit(rc)
