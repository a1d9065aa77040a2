"""Agreement statistics — the statistical-test layer over zonal rollups.

Reference parity: ``Assess_Agreement.R:68-94`` runs a one-sided Mann-Whitney
U test (R ``wilcox.test(..., alternative='less')``) plus the rank-biserial
effect size (``effectsize::rank_biserial``) over per-polygon
satellite-indicated percentages, then labels the effect magnitude
(Negligible/Small/Moderate/Large at |r| < 0.1/0.3/0.5).

Spark shape: the distributed part is the zonal histogram/percent rollup
(queries.q_zonal_event_stats / pip_join + groupBy) — per-polygon rows are
few (one per zone), so the test itself is a driver-side finisher on the
collected zone table, exactly like the reference's per-site R calls.
scipy-free: the EXACT U distribution (Mann-Whitney recurrence) for small
untied samples — the same path R takes for n < 50 without ties — and the
normal approximation with tie correction and continuity correction
otherwise, R's large-sample/tied path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _rankdata(a: np.ndarray) -> np.ndarray:
    """Average ranks (ties share the mean rank) — scipy.stats.rankdata
    'average' semantics, pure numpy."""
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a), np.float64)
    sa = a[order]
    i = 0
    while i < len(sa):
        j = i
        while j + 1 < len(sa) and sa[j + 1] == sa[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return ranks


def _wilcox_counts(m: int, n: int) -> np.ndarray:
    """Frequency table of the Mann-Whitney U statistic under H0 for sample
    sizes (m, n): counts[u] = number of the C(m+n, m) equally-likely rank
    arrangements with U == u. Mann & Whitney's (1947) recurrence
    c(u; m, n) = c(u-n; m-1, n) + c(u; m, n-1), built iteratively."""
    # rows[k] = counts array for (k, j) at the current j
    rows = [np.ones(1, np.float64) for _ in range(m + 1)]  # j = 0: U always 0
    for j in range(1, n + 1):
        new_rows = [np.ones(1, np.float64)]  # k = 0: U always 0
        for k in range(1, m + 1):
            size = k * j + 1
            c = np.zeros(size, np.float64)
            a = new_rows[k - 1]  # (k-1, j): shifted by j
            c[j : j + len(a)] += a
            b = rows[k]  # (k, j-1)
            c[: len(b)] += b
            new_rows.append(c)
        rows = new_rows
    return rows[m]


def _wilcox_exact_p(u1: float, m: int, n: int, alternative: str) -> float:
    """Exact Mann-Whitney p-value from the full U distribution — R
    wilcox.test's exact path (``Assess_Agreement.R:68-94`` calls
    wilcox.test, which uses the exact distribution when both samples have
    < 50 observations and there are no ties)."""
    counts = _wilcox_counts(m, n)
    total = counts.sum()
    u = int(round(u1))
    if alternative == "less":
        return float(counts[: u + 1].sum() / total)
    if alternative == "greater":
        return float(counts[u:].sum() / total)
    if u1 > m * n / 2.0:
        p = 2.0 * counts[u:].sum() / total
    else:
        p = 2.0 * counts[: u + 1].sum() / total
    return float(min(p, 1.0))


def mann_whitney_u(
    x: np.ndarray, y: np.ndarray, alternative: str = "less"
) -> dict:
    """Mann-Whitney U, matching R wilcox.test's path selection: the EXACT
    U distribution when both samples have < 50 observations and there are
    no ties (round-4 fix — the normal approximation diverges from R for
    small samples), else the tie-corrected normal approximation with
    continuity correction.

    U is the U statistic of `x` (number of (x, y) pairs with x > y, ties
    counting half). rank_biserial = 2*U/(n1*n2) - 1 (favorable-minus-
    unfavorable pair fraction). `alternative` 'less' tests x stochastically
    smaller than y, 'greater' the reverse, 'two-sided' either."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n1, n2 = len(x), len(y)
    if n1 == 0 or n2 == 0:
        return {"u": float("nan"), "p_value": float("nan"), "rank_biserial": float("nan")}
    both = np.concatenate([x, y])
    ranks = _rankdata(both)
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    n = n1 + n2
    # tie correction
    _, counts = np.unique(both, return_counts=True)
    has_ties = bool((counts > 1).any())
    if not has_ties and n1 < 50 and n2 < 50:
        # R's exact path: small untied samples
        p = _wilcox_exact_p(u1, n1, n2, alternative)
        r_rb = 2.0 * u1 / (n1 * n2) - 1.0
        return {"u": float(u1), "p_value": float(p), "rank_biserial": float(r_rb)}
    tie_term = float(((counts**3 - counts).sum())) / (n * (n - 1)) if n > 1 else 0.0
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - tie_term)
    sigma = math.sqrt(max(sigma2, 0.0))

    def phi(z: float) -> float:
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    if sigma == 0:
        p = 1.0
    elif alternative == "less":
        p = phi((u1 - mu + 0.5) / sigma)
    elif alternative == "greater":
        p = 1.0 - phi((u1 - mu - 0.5) / sigma)
    else:
        z = (u1 - mu - math.copysign(0.5, u1 - mu)) / sigma if u1 != mu else 0.0
        p = min(1.0, 2.0 * min(phi(z), 1.0 - phi(z)))
    r_rb = 2.0 * u1 / (n1 * n2) - 1.0
    return {"u": float(u1), "p_value": float(p), "rank_biserial": float(r_rb)}


def effect_label(r: float) -> str:
    """Reference magnitude labels (Assess_Agreement.R:94)."""
    a = abs(r)
    if math.isnan(a):
        return "NA"
    if a < 0.1:
        return "Negligible"
    if a < 0.3:
        return "Small"
    if a < 0.5:
        return "Moderate"
    return "Large"


def zonal_agreement(
    zones_df: DataFrame,
    class_col: str,
    value_col: str,
    class_a,
    class_b,
    alternative: str = "less",
) -> pd.DataFrame:
    """The reference's agreement table (Assess_Agreement.R:86-94): collect
    the (small, one-row-per-zone) class/value table, test class_a vs
    class_b, return the two-row summary (Class, n, Median, Rank-biserial,
    Difference, p_value)."""
    pdf = zones_df.select(class_col, value_col).toPandas()
    xa = pdf.loc[pdf[class_col] == class_a, value_col].to_numpy(np.float64)
    xb = pdf.loc[pdf[class_col] == class_b, value_col].to_numpy(np.float64)
    res = mann_whitney_u(xa, xb, alternative)
    label = effect_label(res["rank_biserial"])
    return pd.DataFrame(
        {
            "Class": [str(class_a), str(class_b)],
            "n": [len(xa), len(xb)],
            "Median": [float(np.median(xa)) if len(xa) else float("nan"),
                       float(np.median(xb)) if len(xb) else float("nan")],
            "Rank_biserial": [res["rank_biserial"]] * 2,
            "Difference": [label] * 2,
            "p_value": [res["p_value"]] * 2,
        }
    )
