"""Batch-planner invariant tests: any length distribution must produce a
plan that covers every sequence exactly once with sufficient widths."""

import numpy as np
import pytest

from swtpu.utils.bucketing import pack_database, plan_batches, width_edges

RNG = np.random.default_rng(23)


def _check_invariants(lengths, plan):
    n = lengths.shape[0]
    assert plan.n_sequences == n
    all_ids = np.concatenate([b.ids for b in plan.batches]) if plan.batches else np.zeros(0)
    # every id exactly once
    assert sorted(all_ids.tolist()) == list(range(n))
    for b in plan.batches:
        assert b.n_valid <= b.rows
        assert lengths[b.ids].max() <= b.width  # no truncation ever
    assert len(plan.shapes) <= 40  # bounded compile count


@pytest.mark.parametrize(
    "dist",
    [
        lambda: np.clip(RNG.lognormal(5.67, 0.62, 5000), 20, 8000).astype(np.int64),  # SwissProt-ish
        lambda: RNG.integers(1, 50, 300).astype(np.int64),  # all tiny
        lambda: np.array([35000, 8, 9, 10]),  # one huge outlier
        lambda: np.full(1000, 290, dtype=np.int64),  # uniform
        lambda: np.array([5]),  # single sequence
        lambda: RNG.integers(1, 36000, 2000).astype(np.int64),  # uniform-wide spread
    ],
    ids=["swissprot", "tiny", "outlier", "uniform", "single", "wide"],
)
def test_plan_invariants(dist):
    lengths = dist()
    plan = plan_batches(lengths)
    _check_invariants(lengths, plan)


def test_plan_empty():
    plan = plan_batches(np.zeros(0, dtype=np.int64))
    assert plan.batches == () and plan.n_sequences == 0


def test_plan_padding_bounded_on_swissprot_shape():
    lengths = np.clip(RNG.lognormal(5.67, 0.62, 50000), 20, 8000).astype(np.int64)
    plan = plan_batches(lengths)
    ratio = plan.total_cells / lengths.sum()
    assert ratio < 1.6, f"padding ratio {ratio:.2f} regressed"


def test_pack_database_groups_cover_plan():
    from swtpu.io.fasta import database_from_sequences
    from swtpu.alphabet import decode

    seqs = [decode(RNG.integers(0, 25, int(RNG.integers(1, 400))).astype(np.int8)) for _ in range(200)]
    db = database_from_sequences(seqs)
    plan = plan_batches(db.lengths, batch_rows=64, max_batch_cells=1 << 15)
    packed = pack_database(db, plan)
    ids = np.concatenate([g.ids.ravel() for g in packed.groups])
    ids = ids[ids >= 0]
    assert sorted(ids.tolist()) == list(range(200))
    assert packed.total_cells == sum(g.chunks * g.rows * g.width for g in packed.groups)


def test_width_edges_ladder():
    edges = width_edges(5000, quantum=128, ratio=1.25)
    assert edges[0] == 128
    assert edges[-1] >= 5000
    assert all(b > a for a, b in zip(edges, edges[1:]))
    assert all(e % 128 == 0 for e in edges)


def test_plan_rows_divisible_by_min_rows():
    """Non-power-of-two mesh sizes need every batch's rows % n == 0."""
    lengths = RNG.integers(1, 3000, 5000).astype(np.int64)
    for n in (3, 6, 8):
        plan = plan_batches(lengths, min_rows=n)
        for b in plan.batches:
            assert b.rows % n == 0, (b.rows, n)


def test_plan_wave_buckets_and_iter_groups():
    """Planner/packer split: plan covers every positive-length id exactly
    once, respects max_rows, and iter_wave_groups matches pack_database_wave."""
    import numpy as np

    from swtpu.io.fasta import database_from_sequences
    from swtpu.utils.bucketing import (
        iter_wave_groups,
        pack_database_wave,
        plan_wave_buckets,
    )

    rng = np.random.default_rng(5)
    seqs = ["".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, int(n)))
            for n in rng.integers(1, 400, 300)]
    seqs[7] = ""  # zero-length record: must not enter any bucket
    db = database_from_sequences(seqs)

    buckets = plan_wave_buckets(db, max_rows=128)
    all_ids = np.concatenate([ids for _, ids, _, _, _ in buckets])
    expect = np.nonzero(db.lengths > 0)[0]
    assert sorted(all_ids.tolist()) == sorted(expect.tolist())
    for width, ids, bt, bpad, n_segs in buckets:
        assert ids.shape[0] <= 128 * n_segs  # max_rows (lanes) respected
        assert bpad % bt == 0 and bpad * n_segs >= ids.shape[0]
        assert (db.lengths[ids] <= width // n_segs).all()

    a = pack_database_wave(db, max_rows=128)
    b = list(iter_wave_groups(db, max_rows=128))
    assert len(a) == len(b)
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ga.stack), gb.stack)
        np.testing.assert_array_equal(ga.ids, gb.ids)


def test_pick_lanes_properties():
    """pick_lanes: padded count covers n, divides by the tile, and never
    wastes more than the coarsest quantum."""
    from swtpu.ops.wave_sw import pick_lanes

    for n in (1, 100, 300, 512, 700, 1400, 4097):
        for lm in (1, 2, 8):
            bt, bpad = pick_lanes(n, lm)
            assert bpad >= n
            assert bpad % (bt * lm) == 0
            assert bpad - n < 512 * lm  # never worse than the 512 quantum
