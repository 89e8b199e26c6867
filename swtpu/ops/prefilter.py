"""Heuristic k-mer prefilter: MXU coarse pass feeding the exact engine.

Beyond-reference optional subsystem (the reference is exhaustive —
src/SWSolver.cu scores every subject; this stays off unless
``SWConfig.prefilter`` is set).  CUDASW++-class engines multiply effective
search throughput with a cheap coarse pass that discards obvious
non-matches before exact scoring; the TPU-native shape of that idea is:

* every sequence is summarised ONCE as a (DIM,) int8 **presence signature**
  of its hashed k-mers (k=3, DIM=1024 by default) — an O(L) host-side
  pass, cached per database like the resident pack;
* the coarse score of query q vs subject s starts from the number of
  distinct hashed k-mer buckets they share: ``sig_s . sig_q`` — so scoring
  the WHOLE database is one (n, DIM) x (DIM,) int8 matmul on the MXU,
  ~DIM MACs per subject regardless of length (vs L1*L2 DP cells:
  ~300,000x fewer operations for a 300-aa query);
* the raw count has a strong LENGTH BIAS (a long random subject marks a
  third of all buckets and shares ~qk/3 by chance, outranking a short
  distant homolog), so candidates are ranked by the binomial z-score
  ``(count - E) / sqrt(E)`` with ``E = qk * popcount(sig_s) / DIM`` — an
  elementwise correction off one precomputed (n,) popcount vector.
  Measured on 10k synthetics + planted 10-50%-mutated homologs: raw count
  ranks the 50% mutant ~5400th, the z-score ranks all planted homologs
  top-6 at every DIM tried (1024/2048/4096);
* the top candidates by coarse score (``max(top_k, min_candidates,
  frac * n)`` of them) are scored EXACTLY by the wavefront kernel;
  reported hits are exact SW scores with original file-order ids.

Serving-path mechanics (everything per-query must be cheap AND
shape-stable — each new Mosaic shape is seconds of compile):

* the whole coarse pass is ONE dispatch (:func:`coarse_candidates`:
  matmul + z-correction + per-signal device top-k) returning one small
  packed array — one device->host round trip per query;
* the exact phase packs candidates ON DEVICE from the resident flat
  residue buffer (:func:`gather_stack`) — the per-query upload is the id
  vector, not megabytes of residues (a remote-attached chip measures
  seconds per MB of host->device traffic);
* exact-phase shapes are PINNED: two buckets split at the ladder's 992
  boundary with per-DATABASE widths and power-of-two lane counts, so the
  compiled family is O(log n_cand) per database instead of per-query.

The coarse pass is a heuristic: a true top-K member outside the candidate
set is missed (measured recall on the bundled data lives in the tests and
tools/prefilter_bench.py).  The exact phase guarantees that every
*reported* score is the true Smith-Waterman score.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Hash-space size: power of two (cheap masking) sized so a ~400-aa subject
# marks <= ~40% of buckets (expected collision loss stays small), while the
# full-SwissProt signature matrix stays modest (559k x 1024 int8 = 573 MB).
DIM = 1024
K = 3  # k-mer length; 3 balances sensitivity (25^3 distinct) vs noise

# Odd 32-bit mixing constants (Knuth/xxHash-style); uint32 wrap-around is the
# hash.  Distinct multipliers per position keep permuted k-mers distinct.
_MIX = np.array([2654435761, 2246822519, 3266489917], dtype=np.uint32)


def kmer_hashes(residues: np.ndarray, dim: int = DIM, k: int = K) -> np.ndarray:
    """Hash bucket of every k-mer window of one encoded sequence."""
    r = np.asarray(residues, dtype=np.uint32)
    if r.shape[0] < k:
        return np.zeros((0,), dtype=np.int64)
    acc = np.zeros(r.shape[0] - k + 1, dtype=np.uint32)
    for j in range(k):
        acc += r[j : r.shape[0] - k + 1 + j] * _MIX[j]
    # Low bits of a multiplicative hash are the weakest — take high bits.
    return ((acc >> np.uint32(20)) ^ acc).astype(np.int64) & (dim - 1)


def signature(residues: np.ndarray, dim: int = DIM, k: int = K) -> np.ndarray:
    """(dim,) int8 presence signature of one sequence."""
    sig = np.zeros((dim,), dtype=np.int8)
    sig[kmer_hashes(residues, dim, k)] = 1
    return sig


def database_signatures(
    db, dim: int = DIM, k: int = K, chunk: int = 1 << 24
) -> np.ndarray:
    """(n, dim) int8 presence signatures for a whole database.

    Vectorised over the flat residue buffer (no per-sequence Python loop):
    every position's record id comes from the offsets array, k-mers that
    would straddle a record boundary are masked out, and presence bits are
    scattered with one flat assignment per chunk.  ``chunk`` bounds peak
    temporary memory (~24 bytes/position).
    """
    n = db.n
    sig = np.zeros((n, dim), dtype=np.int8)
    total = db.length_sum
    if total < k or n == 0:
        return sig
    from .. import native

    sig_c = native.build_signatures_native(db.residues, db.offsets, dim, k, _MIX)
    if sig_c is not None:  # ~270x the NumPy pass; bit-identical (tested)
        return sig_c
    flat = np.asarray(db.residues, dtype=np.uint32)
    offsets = np.asarray(db.offsets, dtype=np.int64)
    lengths = db.lengths
    rec_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
    # A flat position is a valid k-mer start unless it falls in the last
    # k-1 positions of its record — marked directly off the offsets
    # (O(n*k) writes) instead of gathering record ends for every position.
    n_starts = total - k + 1
    valid_all = np.ones(n_starts, dtype=bool)
    for j in range(1, k):
        idx = offsets[1:][lengths >= j] - j
        idx = idx[idx < n_starts]
        valid_all[idx] = False
    sig_flat = sig.reshape(-1)
    for lo in range(0, n_starts, chunk):
        hi = min(lo + chunk, n_starts)
        acc = np.zeros(hi - lo, dtype=np.uint32)
        for j in range(k):
            acc += flat[lo + j : hi + j] * _MIX[j]
        v = valid_all[lo:hi]
        h = (((acc >> np.uint32(20)) ^ acc).astype(np.int64) & (dim - 1))[v]
        sig_flat[rec_of[lo:hi][v] * dim + h] = 1
    return sig


@functools.partial(jax.jit, donate_argnums=())
def coarse_scores(sig_db, sig_q) -> jax.Array:
    """(n,) int32 shared-bucket counts: one MXU int8 matmul."""
    return jnp.dot(sig_db, sig_q.astype(jnp.int8), preferred_element_type=jnp.int32)


@functools.partial(jax.jit, donate_argnums=())
def coarse_zscores(sig_db, popcounts, sig_q) -> jax.Array:
    """(n,) float32 length-corrected coarse scores (the ranking signal).

    Binomial z-score of the shared-bucket count against the
    chance-overlap expectation E = qk * popcount_s / DIM: removes the
    length bias that would otherwise rank long random subjects above
    short distant homologs.  ``popcounts`` is the (n,) per-subject
    signature popcount (precompute once per database).
    """
    c = coarse_scores(sig_db, sig_q).astype(jnp.float32)
    qk = jnp.sum(sig_q.astype(jnp.float32))
    e = qk * popcounts.astype(jnp.float32) / sig_db.shape[1]
    return (c - e) * jax.lax.rsqrt(jnp.maximum(e, 1.0))


@functools.partial(jax.jit, static_argnames=("n_cand",))
def coarse_candidates(sig_db, popcounts, sig_q, n_cand: int):
    """Fused coarse pass: ONE device dispatch, tiny transfer.

    Computes the shared-bucket counts, the z-scores, and each signal's
    device top-``n_cand`` ids (lax.top_k tie-breaks by lowest flat index
    == lowest id, matching :func:`select_candidates`'s lexsort), plus the
    max raw count for the host's no-signal fallback check.  Replaces two
    full-(n,) host transfers (2 x ~25 ms on a remote-attached chip) with
    two (n_cand,) id vectors and a scalar.
    """
    c = jnp.dot(sig_db, sig_q.astype(jnp.int8), preferred_element_type=jnp.int32)
    qk = jnp.sum(sig_q.astype(jnp.float32))
    e = qk * popcounts.astype(jnp.float32) / sig_db.shape[1]
    z = (c.astype(jnp.float32) - e) * jax.lax.rsqrt(jnp.maximum(e, 1.0))
    _, z_ids = jax.lax.top_k(z, n_cand)
    _, r_ids = jax.lax.top_k(c, n_cand)
    # One packed row per signal + the raw max, so the host fetches ONE
    # array (one device->host round trip, not three).
    return jnp.stack([z_ids, r_ids, jnp.full_like(z_ids, jnp.max(c))])


@functools.partial(jax.jit, static_argnames=("n_cand",))
def coarse_candidates_many(sig_db, popcounts, sig_qs, n_cand: int):
    """Batched coarse pass: Q queries in ONE dispatch (round-3 VERDICT
    item 5 — the per-query loop paid a ~25 ms tunnel round trip each).

    One (Q, DIM) x (n, DIM)^T int8 matmul against the resident signature
    matrix, per-query z-correction and device top-k.  Returns
    (Q, 3, n_cand) int32: [q, 0] z-ranked ids, [q, 1] raw-ranked ids,
    [q, 2] broadcast max raw count (the host's no-signal fallback check) —
    one transfer for the whole batch.
    """
    c = jax.lax.dot_general(
        sig_qs.astype(jnp.int8),
        sig_db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (Q, n)
    qk = jnp.sum(sig_qs.astype(jnp.float32), axis=1, keepdims=True)  # (Q, 1)
    e = qk * popcounts.astype(jnp.float32)[None, :] / sig_db.shape[1]
    z = (c.astype(jnp.float32) - e) * jax.lax.rsqrt(jnp.maximum(e, 1.0))
    _, z_ids = jax.lax.top_k(z, n_cand)  # (Q, n_cand)
    _, r_ids = jax.lax.top_k(c, n_cand)
    mx = jnp.broadcast_to(jnp.max(c, axis=1)[:, None], z_ids.shape)
    return jnp.stack([z_ids, r_ids, mx], axis=1)


def pack_flat_words(residues: np.ndarray) -> np.ndarray:
    """Residue buffer as little-endian uint32 words (+1 slack word), the
    resident form :func:`gather_stack` gathers from."""
    n = residues.shape[0]
    padded = np.zeros((-(-n // 4) + 1) * 4, dtype=np.uint8)
    padded[:n] = residues.view(np.uint8)
    return padded.view("<u4")


@functools.partial(jax.jit, static_argnames=("width", "w"))
def gather_stack(flat_words, offsets, cand, width: int, w: int = 32):
    """Device-side candidate pack: (width + w, bpad) transposed stack.

    ``flat_words``/``offsets`` are the database's flat residue buffer (as
    uint32 words, :func:`pack_flat_words`) and record offsets, kept
    RESIDENT once per database — a candidate rescore uploads only the
    (bpad,) id vector (~KB) instead of host-packing and shipping the
    candidate residues (~MB per query; a remote-attached chip measures
    SECONDS per MB of host->device traffic).  ``cand`` pads with -1: pad
    lanes read length 0 and fill with PAD_SUBJECT, scoring exactly 0.

    TPU gather is ~slow per ELEMENT, so the gather runs at word
    granularity (4 residues per gathered element) from each lane's
    word-aligned base, and the 0-3-byte misalignment is fixed with the
    classic funnel shift — all four rotation variants are cheap vector
    shift/or ops, and a per-lane select picks the right one.  Measured
    ~4x over the byte-granularity gather at rescore shapes.
    """
    from .xla_sw import PAD_SUBJECT

    if width % 4:
        raise ValueError(f"gather_stack width {width} must be a multiple of 4")
    safe = jnp.maximum(cand, 0)
    starts = offsets[safe].astype(jnp.uint32)  # (bpad,) byte offsets
    lens = jnp.where(cand >= 0, offsets[safe + 1].astype(jnp.uint32) - starts, 0)
    base = (starts >> 2).astype(jnp.int32)  # word-aligned lane base
    rot = (starts & 3).astype(jnp.uint32)  # misalignment in bytes
    nw = width // 4
    jw = jnp.arange(nw + 1, dtype=jnp.int32)[:, None]  # (nw+1, 1)
    words = jnp.take(flat_words, base[None, :] + jw, mode="clip")  # (nw+1, bpad)
    w0, w1 = words[:-1], words[1:]
    c = w0
    for r in (1, 2, 3):
        sh = jnp.uint32(8 * r)
        variant = (w0 >> sh) | (w1 << jnp.uint32(32 - 8 * r))
        c = jnp.where(rot[None, :] == r, variant, c)
    by = jax.lax.bitcast_convert_type(c, jnp.int8)  # (nw, bpad, 4) LE bytes
    stack = jnp.transpose(by, (0, 2, 1)).reshape(width, cand.shape[0])
    j = jnp.arange(width, dtype=jnp.uint32)[:, None]
    stack = jnp.where(j < lens[None, :], stack, jnp.int8(PAD_SUBJECT))
    return jnp.concatenate(
        [stack, jnp.full((w, cand.shape[0]), PAD_SUBJECT, jnp.int8)], axis=0
    )


def merge_candidates(z_ids: np.ndarray, r_ids: np.ndarray, n_cand: int) -> np.ndarray:
    """Round-robin merge of per-signal top-id lists (dedup keeps first).

    Exactly :func:`select_candidates`'s merge given each list is its
    signal's descending-order prefix: the round-robin never consumes more
    than n_cand from either.  Returns ids sorted ascending.
    """
    out = np.empty(n_cand, dtype=np.int64)
    seen = set()
    filled = 0
    for i in range(n_cand):
        for ids in (z_ids, r_ids):
            v = int(ids[i])
            if v not in seen:
                seen.add(v)
                out[filled] = v
                filled += 1
                if filled == n_cand:
                    return np.sort(out)
    return np.sort(out[:filled])


def select_candidates(signals, n_cand: int) -> np.ndarray:
    """Top ``n_cand`` ids, merged round-robin across ranked signals.

    ``signals`` is one score array or a list of them; with several, ids
    are taken alternately from each signal's descending-score order (dedup
    keeps the first occurrence) — the engine passes (z-score, raw count)
    so the set covers BOTH true homologs (z wins: length-corrected) and
    the long-sequence noise ties exhaustive SW itself favours (raw wins:
    shares SW's Karlin-Altschul-style length preference).  Ties break by
    ascending id, so candidate sets are deterministic.  Returns ids sorted
    ascending.
    """
    if isinstance(signals, np.ndarray):
        signals = [signals]
    n = signals[0].shape[0]
    n_cand = min(n_cand, n)
    if n_cand >= n:
        return np.arange(n, dtype=np.int64)
    orders = [
        np.lexsort((np.arange(n), -np.asarray(s, dtype=np.float64)))
        for s in signals
    ]
    seen = np.zeros(n, dtype=bool)
    out = np.empty(n_cand, dtype=np.int64)
    filled = 0
    for i in range(n):
        for o in orders:
            v = o[i]
            if not seen[v]:
                seen[v] = True
                out[filled] = v
                filled += 1
                if filled == n_cand:
                    return np.sort(out)
    return np.sort(out[:filled])
