"""As-of join (most-recent-match join) — the temporal analogue of the
cell-keyed spatial join: for every left row, the single right row with the
greatest timestamp ≤ the left row's timestamp, within the same key.

Physical plan (Ray Data has no native as-of join): tag both sides, key by
``by``, union, co-group with one ``groupby(by)`` sort shuffle, then a
vectorized per-group ``searchsorted`` match — no per-row loop, one
exchange. Within a key group the right side is sorted once; every left
timestamp binary-searches it. Inner semantics: left rows with no prior
right row are dropped (DuckDB ``ASOF JOIN`` parity).

The op returns the MATCH MAPPING ``(by, left ts, matched right ts)`` —
payload columns reattach with ordinary equi-joins on ``(by, ts)``
(broadcast or shuffle, caller's choice); keeping the union schema to three
columns is what lets both sides share one exchange.

Partitioning assumption: one key's rows must fit a worker (same contract
as every co-group op here); sub-bucket by time range if a single key's
history outgrows that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def interval_join(
    points_ds,
    intervals_ds,
    by: str,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: int = 86_400,
    num_partitions: int = 8,
):
    """1:N containment join: every (point, interval) pair with
    ``start <= ts < end`` sharing the ``by`` key — the temporal RANGE join.

    Physical plan: intervals explode to every time bucket they overlap
    (vectorized range-expand, span/bucket + 1 rows each), points key by
    their single bucket, one hash equi-join on (key, bucket), then the
    exact half-open containment filter. Choose ``bucket`` near the typical
    interval span: too small explodes intervals, too large bloats join
    fan-in. Output: ``by``, ``point_ts``, ``start_col``, ``end_col``."""

    def prep_points(t: pa.Table) -> pa.Table:
        s = t[point_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                by: t[by],
                "_ts": pa.array(s),
                "_b": pa.array(s // bucket),
            }
        )

    def prep_intervals(t: pa.Table) -> pa.Table:
        st = t[start_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        en = t[end_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = st // bucket
        b1 = np.maximum(en - 1, st) // bucket
        counts = (b1 - b0 + 1).astype(np.int64)
        total = int(counts.sum())
        idx = np.repeat(np.arange(st.shape[0]), counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        bks = np.arange(total, dtype=np.int64) - starts + np.repeat(b0, counts)
        base = t.select([by]).take(pa.array(idx))
        return pa.table(
            {
                by: base[by],
                "_start": pa.array(st[idx]),
                "_end": pa.array(en[idx]),
                "_b": pa.array(bks),
            }
        )

    joined = points_ds.map_batches(prep_points, batch_format="pyarrow").join(
        intervals_ds.map_batches(prep_intervals, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=(by, "_b"),
    )

    def refine(t: pa.Table) -> pa.Table:
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        st = t["_start"].to_numpy(zero_copy_only=False)
        en = t["_end"].to_numpy(zero_copy_only=False)
        keep = (st <= ts) & (ts < en)
        out = t.filter(pa.array(keep))
        return pa.table(
            {
                by: out[by],
                point_ts: out["_ts"],
                start_col: out["_start"],
                end_col: out["_end"],
            }
        )

    return joined.map_batches(refine, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
):
    """For each left row: the latest right timestamp ≤ its own, per key.

    Output columns: ``by``, ``left_ts``, ``{right_ts}{suffix}``.
    Timestamps must cast to int64 (cast dates/decimals upstream). Left
    rows keep multiplicity (duplicates join independently)."""
    import pandas as pd

    def prep(role: int, ts_col: str):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table(
                {
                    "_role": pa.array(np.full(n, role, dtype=np.int8)),
                    by: t[by],
                    "_ts": t[ts_col].cast(pa.int64()),
                }
            )

        return fn

    u = left_ds.map_batches(prep(0, left_ts), batch_format="pyarrow").union(
        right_ds.map_batches(prep(1, right_ts), batch_format="pyarrow")
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        role = g["_role"].to_numpy()
        is_r = role == 1
        # no special-casing for one-sided groups: searchsorted on an empty
        # right side yields pos=-1 (all dropped), and empty lefts produce
        # the same empty frame with identical dtypes
        r_ts = np.sort(g["_ts"].to_numpy()[is_r])
        l_ts = g["_ts"].to_numpy()[~is_r]
        keys = g[by].to_numpy()[~is_r]
        pos = np.searchsorted(r_ts, l_ts, side="right") - 1
        hit = pos >= 0
        return pd.DataFrame(
            {
                by: keys[hit],
                "_lts": l_ts[hit],
                "_rts": r_ts[pos[hit]],
            }
        )

    joined = u.groupby(by).map_groups(per_key, batch_format="pandas")

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                by: t[by],
                left_ts: t["_lts"],
                f"{right_ts}{suffix}": t["_rts"],
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")
