"""Stream-shaped windowed aggregates over an event log (ray_guide
"Streaming-shaped workloads": Ray Data is batch — windows are groupbys over
(key, window) with per-group pandas for the order-dependent variants).

Ordering assumption: tumbling windows need none (pure bucketing); sliding
windows need none (each event expands to the windows containing it —
flat-map style, vectorized); session windows sort by ts WITHIN each key
group (the shuffle co-locates a key's events, map_groups sorts locally).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay.runtime import table_from_pandas

US_PER_DAY = 86_400 * 1_000_000


def tumbling(ds, key_col: str, ts_col: str, value_col: str,
             width_us: int = US_PER_DAY, combine_partitions: int = 8):
    """(key, window) → n, int-exact value sum. Two-phase partial agg."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = us // width_us
        milli = np.floor(t[value_col].to_numpy(zero_copy_only=False) * 1000).astype(np.int64)
        df = pd.DataFrame({key_col: t[key_col].to_pandas(), "win": win, "milli": milli})
        g = df.groupby([key_col, "win"], as_index=False).agg(
            p_n=("milli", "size"), p_sum=("milli", "sum")
        )
        return table_from_pandas(g)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby([key_col, "win"])
        .aggregate(Sum("p_n", alias_name="n"), Sum("p_sum", alias_name="sum_val_milli"))
    )


def sliding(ds, key_col: str, ts_col: str, value_col: str,
            width_us: int, slide_us: int, combine_partitions: int = 8,
            ts_scale_us: int = 1):
    """Sliding windows: each event replicated into the ``width/slide``
    windows covering it (vectorized np.repeat explode — 1 row → w/s rows),
    then the same two-phase aggregate keyed by window start."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if width_us % slide_us:
        raise ValueError("width must be a multiple of slide")
    n_covers = width_us // slide_us

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False) // ts_scale_us
        milli = np.floor(t[value_col].to_numpy(zero_copy_only=False) * 1000).astype(np.int64)
        keys = t[key_col].to_pandas().to_numpy()
        # windows with start w*slide contain ts iff start <= ts < start+width
        last_start = (us // slide_us) * slide_us
        offs = (np.arange(n_covers) * slide_us)[None, :]
        starts = last_start[:, None] - offs  # (n, n_covers)
        valid = starts >= 0
        rep = np.repeat(np.arange(us.size), n_covers).reshape(-1)[valid.reshape(-1)]
        win = starts.reshape(-1)[valid.reshape(-1)]
        df = pd.DataFrame(
            {key_col: keys[rep], "win_start": win,
             "milli": milli[rep]}
        )
        g = df.groupby([key_col, "win_start"], as_index=False).agg(
            p_n=("milli", "size"), p_sum=("milli", "sum")
        )
        return table_from_pandas(g)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby([key_col, "win_start"])
        .aggregate(Sum("p_n", alias_name="n"), Sum("p_sum", alias_name="sum_val_milli"))
    )


def max_concurrency(ds, key_col: str, start_col: str, end_col: str):
    """Sweep-line max-overlap per key: the maximum number of intervals
    ``[start, end)`` simultaneously open. Each interval emits +1/−1
    boundary rows batch-locally; ONE groupby(key) shuffle co-locates a
    key's boundaries; the sweep is a local sort by ``(t, delta)`` (−1
    before +1 at equal t — half-open semantics: an interval ending at t
    does not overlap one starting at t) + cumsum + max. Ties within equal
    ``(t, delta)`` carry identical deltas, so the running max is
    permutation-invariant — deterministic without any further tiebreak.
    Output one row per key: ``(key_col, max_concurrent)``."""
    import pandas as pd

    def boundaries(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        s = t[start_col].to_numpy(zero_copy_only=False)
        e = t[end_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: pa.array(np.concatenate([k, k])),
                "t": pa.array(np.concatenate([s, e])),
                "d": pa.array(np.concatenate(
                    [np.ones(k.size, dtype=np.int64),
                     -np.ones(k.size, dtype=np.int64)]
                )),
            }
        )

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["d"].to_numpy(np.int64), g["t"].to_numpy(np.int64))
        )
        c = np.cumsum(g["d"].to_numpy(np.int64)[order])
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "max_concurrent": [np.int64(c.max())],
            }
        )

    return (
        ds.select_columns([key_col, start_col, end_col])
        .map_batches(boundaries, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(sweep, batch_format="pandas")
    )


def running_stats(ds, key_col: str, ts_col: str, order_col: str,
                  value_col: str, roll: int = 3, ts_scale_us: int = 1):
    """Row-based window functions per key, ordered by (ts, order):

    - ``seq``       — 1-based row number within the key
    - ``cum_milli`` — running sum of ``floor(value·1000)`` (int-exact,
      inclusive of the current row)
    - ``dt_us``     — microseconds since the previous event (0 for the
      first) — the LAG shape
    - ``roll_milli``— rolling sum over the last ``roll`` rows (ROWS
      ``roll-1`` PRECEDING .. CURRENT ROW), via the cumsum-difference trick

    ONE groupby(key) shuffle; all four windows are numpy on the locally
    sorted key group (no per-row work). Same one-key-fits-worker contract
    as session windows. ``ts_scale_us`` divides the raw int64 timestamp to
    microseconds (1000 for datetime64[ns] inputs — pass it like session();
    the parquet tables are timestamp[us], scale 1). Output: key, order,
    seq, cum_milli, dt_us, roll_milli."""
    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g[order_col].to_numpy(np.int64),
             g[ts_col].astype("int64").to_numpy())
        )
        us = g[ts_col].astype("int64").to_numpy()[order] // ts_scale_us
        oid = g[order_col].to_numpy(np.int64)[order]
        milli = np.floor(
            g[value_col].to_numpy(np.float64)[order] * 1000
        ).astype(np.int64)
        cum = np.cumsum(milli)
        dt = np.zeros(us.size, dtype=np.int64)
        dt[1:] = us[1:] - us[:-1]
        shifted = np.zeros(us.size, dtype=np.int64)
        if us.size > roll:
            shifted[roll:] = cum[:-roll]
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy()[order],
                order_col: oid,
                "seq": np.arange(1, us.size + 1, dtype=np.int64),
                "cum_milli": cum,
                "dt_us": dt,
                "roll_milli": cum - shifted,
            }
        )

    return (
        ds.select_columns([key_col, ts_col, order_col, value_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def funnel(ds, key_col: str, ts_col: str, type_col: str, stages: list):
    """Ordered funnel: per key, the greedy strictly-increasing chain through
    ``stages`` — t₁ = min ts of stage 1, t₂ = min ts of stage 2 with
    ts > t₁, … Output one row per key: ``(key_col, stage)`` where stage is
    the deepest step reached (0 = none).

    Plan: funnel-type events shrink to (key, stage, ts); every batch also
    contributes its distinct keys as stage-0 sentinel rows so keys with no
    funnel events still appear (their sentinels dedupe in the groupby).
    ONE groupby(key) shuffle, then the K-step greedy chain runs vectorized
    per key (K is a constant, not a row loop). Same one-key-fits-worker
    contract as session windows.
    """
    import pandas as pd

    stage_of = {s: i + 1 for i, s in enumerate(stages)}
    n_stages = len(stages)

    def shrink(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = t[type_col].to_pandas()
        st = types.map(stage_of).fillna(0).to_numpy(dtype=np.int64)
        keep = st > 0
        ukeys = np.unique(keys)
        return pa.table(
            {
                key_col: pa.array(np.concatenate([keys[keep], ukeys])),
                "stage": pa.array(np.concatenate(
                    [st[keep], np.zeros(ukeys.size, dtype=np.int64)]
                )),
                "us": pa.array(np.concatenate(
                    [us[keep], np.zeros(ukeys.size, dtype=np.int64)]
                )),
            }
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        st = g["stage"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        reached = 0
        thr = None
        for s in range(1, n_stages + 1):
            sel = us[st == s] if thr is None else us[(st == s) & (us > thr)]
            if sel.size == 0:
                break
            thr = sel.min()
            reached = s
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "stage": [np.int64(reached)]}
        )

    return (
        ds.select_columns([key_col, ts_col, type_col])
        .map_batches(shrink, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def session(ds, key_col: str, ts_col: str, gap_us: int, ts_scale_us: int = 1):
    """Session windows: per-key sort by ts, split where the gap exceeds
    ``gap_us``. One shuffle (groupby key); sessionization is local pandas.
    Output: key, session_start_us, session_end_us, n."""
    import pandas as pd

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        us = np.sort(g[ts_col].astype("int64").to_numpy() // ts_scale_us)
        breaks = np.flatnonzero(np.diff(us) > gap_us) + 1
        out = []
        for seg in np.split(us, breaks):
            out.append((seg[0], seg[-1], seg.size))
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]] * len(out),
                "session_start_us": [o[0] for o in out],
                "session_end_us": [o[1] for o in out],
                "n": [o[2] for o in out],
            }
        )

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
