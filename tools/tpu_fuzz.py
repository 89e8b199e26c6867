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


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    raise SystemExit(main(*args))
