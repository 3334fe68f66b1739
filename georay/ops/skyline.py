"""Distributed skyline (Pareto frontier) over a (minimize, maximize) pair.

The skyline-of-skylines property makes this embarrassingly reducible: any row
dominated inside its own block is globally dominated (dominance is
transitive), so ``map_batches(local skyline) → coalesce → skyline`` is exact
with only survivor rows ever moving. The final reduce runs on the union of
block skylines — tiny for low-dimensional data (2-D skylines are O(distinct
frontier steps)); a deeper reduce tree handles adversarial inputs by adding
levels, not memory.

Semantics (strict Pareto dominance, duplicate-safe): row p survives iff no q
has ``q.lo <= p.lo AND q.hi >= p.hi`` with at least one strict — exact
comparisons only, no float arithmetic, so the SQL twin is a NOT EXISTS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (minimize ``lo``, maximize
    ``hi``) in O(n log n): sort by (lo asc, hi desc); a row survives iff its
    ``hi`` equals its lo-group's max AND that max strictly beats the running
    max over all strictly-smaller ``lo`` groups. Ties on both dims all
    survive (nothing strictly dominates them)."""
    if lo.size == 0:
        return np.zeros(0, bool)
    lo = lo.astype(np.float64)
    hi = hi.astype(np.float64)
    order = np.lexsort((-hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    new_grp = np.empty(lo_s.size, bool)
    new_grp[0] = True
    new_grp[1:] = lo_s[1:] != lo_s[:-1]
    grp = np.cumsum(new_grp) - 1
    m = hi_s[new_grp]  # per-group max hi = first row of the group
    pref = np.empty_like(m)
    pref[0] = -np.inf
    if m.size > 1:
        pref[1:] = np.maximum.accumulate(m[:-1])
    keep_sorted = (m > pref)[grp] & (hi_s == m[grp])
    mask = np.zeros(lo.size, bool)
    mask[order] = keep_sorted
    return mask


def skyline(ds, lo_col: str, hi_col: str, reduce_partitions: int = 4):
    """Exact distributed 2-D skyline: minimize ``lo_col``, maximize
    ``hi_col``; all other columns pass through. Three prunes: per-block →
    ``reduce_partitions``-way → final single block (each level only sees
    the survivors of the previous one)."""

    def prune(t: pa.Table) -> pa.Table:
        mask = _skyline_mask(
            t[lo_col].to_numpy(zero_copy_only=False),
            t[hi_col].to_numpy(zero_copy_only=False),
        )
        return t.filter(pa.array(mask))

    local = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    mid = local.repartition(reduce_partitions).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True
    )
    return mid.repartition(1).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True
    )
