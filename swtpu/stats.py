"""Hit-significance statistics: empirical E-values and bit scores.

The reference reports raw max scores only (src/main.cpp:58-60); a
production search engine reports SIGNIFICANCE — how surprising a score is
against this database.  Max local-alignment scores of UNRELATED sequence
pairs follow an extreme-value (Gumbel) law (Karlin-Altschul):

    P(S >= x) = 1 - exp(-exp(-lambda * (x - mu)))      per comparison

Published (lambda, K) constants exist only for standard scoring schemes
(e.g. BLOSUM50 + affine 10/2); the reference's linear-gap-2 zeroed-`*`
scheme has none, so the law is FIT empirically to each query's own score
distribution over the database — the same approach as FASTA/SSEARCH's
empirical statistics.  The fit uses trimmed moment estimation: the top
tail (true homologs — the very scores being judged) is excluded so the
null law is estimated from the unrelated bulk.

The E-value of a hit is the expected number of database sequences
reaching its score by chance: E(x) = n * P(S >= x).  The bit score
normalises a raw score across scoring systems: S' = (lambda*S - ln K) /
ln 2, with K recovered from the fitted location via mu = ln(K*m*n̄) /
lambda (m = query length, n̄ = mean subject length).

Everything here is host-side numpy over the already-transferred score
array (0.5 M floats at SwissProt scale — microseconds); no device work.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class GumbelFit:
    """Empirical null law: P(S >= x) = 1 - exp(-exp(-lam*(x - mu)))."""

    lam: float  # scale (Karlin-Altschul lambda analogue)
    mu: float  # location; absorbs ln(K*m*n̄)/lam
    n_fit: int  # scores the fit used (after masking + trimming)

    def sf(self, x) -> np.ndarray:
        """Per-comparison survival P(S >= x)."""
        z = np.exp(-self.lam * (np.asarray(x, np.float64) - self.mu))
        return -np.expm1(-z)

    def k_constant(self, query_length: int, mean_subject_length: float) -> float:
        """Karlin-Altschul K recovered from mu = ln(K*m*n̄)/lam."""
        mn = max(query_length * mean_subject_length, 1.0)
        return float(np.exp(self.lam * self.mu) / mn)


def fit_gumbel(scores: np.ndarray, trim: float = 0.02) -> GumbelFit:
    """Trimmed-moment Gumbel fit of the null score distribution.

    ``scores`` is the full per-sequence score array; zeros are excluded
    (pad/empty records — and a score of 0 carries no rank information
    under local alignment), then the top ``trim`` fraction is dropped so
    homolog outliers do not inflate the null's scale.  Moment estimators
    on the remaining bulk: lambda = pi / (sqrt(6)*sd), mu = mean -
    gamma/lambda (gamma = Euler-Mascheroni).
    """
    s = np.asarray(scores, np.float64)
    s = np.sort(s[s > 0])
    cut = int(np.ceil(trim * s.size)) if trim > 0 else 0
    body = s[: s.size - cut] if cut else s
    if body.size < 16:
        raise ValueError(
            f"need >= 16 nonzero scores to fit the null distribution "
            f"(got {body.size}); E-values are meaningless on tiny databases"
        )
    sd = float(body.std())
    if sd == 0.0:
        raise ValueError("degenerate score distribution (zero variance)")
    lam = float(np.pi / (np.sqrt(6.0) * sd))
    mu = float(body.mean() - np.euler_gamma / lam)
    return GumbelFit(lam=lam, mu=mu, n_fit=int(body.size))


@dataclass(frozen=True)
class HitStat:
    """One scored hit with its significance."""

    id: int
    score: int
    evalue: float
    bits: float


def hit_stats(
    scores: np.ndarray,
    hits: Sequence[Tuple[int, int]],
    query_length: int,
    mean_subject_length: float,
    trim: float = 0.02,
) -> List[HitStat]:
    """Significance of ``hits`` ((id, score) pairs) against the empirical
    null fitted from ``scores`` (the query's full per-sequence array)."""
    fit = fit_gumbel(scores, trim=trim)
    n = int(np.asarray(scores).size)
    k = fit.k_constant(query_length, mean_subject_length)
    out = []
    for sid, sc in hits:
        e = float(n * fit.sf(sc))
        bits = float((fit.lam * sc - np.log(max(k, 1e-300))) / np.log(2.0))
        out.append(HitStat(id=int(sid), score=int(sc), evalue=e, bits=bits))
    return out
