"""Trajectory operators over keyed, timestamped point streams.

A "trajectory" is the time-ordered sequence of capture points sharing a key
(device, user, vessel). The ops here follow the session-window idiom
(ops/window.py): ONE shuffle co-locates a key's points, then per-key work is
local, sorted, and vectorized. Contract (documented, same as session
windows): one key's points must fit in a worker — at 100 TB that means the
key is a device/track id, not a global constant.

Distances are computed on INTEGER grid coordinates supplied by the caller
(milli-degree ints in the harness queries) so sums/maxima are exact under
any execution order — the float-determinism house rule (queries.py header).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def trajectory_stats(ds, key_col: str, ts_col: str, order_col: str,
                     x_col: str, y_col: str, cell_col: str | None = None):
    """Per-key trajectory summary: legs between consecutive points.

    Sort order within a key is (``ts_col``, ``order_col``) — the tiebreak
    makes duplicate timestamps deterministic. Output, one row per key:

    - ``n_events``  — points on the trajectory
    - ``n_legs``    — consecutive-point segments (``n_events - 1``, 0 for
      singleton trajectories)
    - ``sum_d2`` / ``max_d2`` — exact integer squared leg length in the
      caller's grid units (0 when no legs)
    - ``sum_dt_us`` — total elapsed time over legs (0 when no legs)
    - ``n_cells``   — distinct ``cell_col`` values visited (omitted when
      ``cell_col`` is None)
    """

    cols = [key_col, ts_col, order_col, x_col, y_col]
    if cell_col is not None:
        cols.append(cell_col)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="quicksort")
        x = g[x_col].to_numpy(dtype=np.int64)
        y = g[y_col].to_numpy(dtype=np.int64)
        us = g[ts_col].astype("int64").to_numpy()
        dx, dy = np.diff(x), np.diff(y)
        d2 = dx * dx + dy * dy
        out = {
            key_col: [g[key_col].iloc[0]],
            "n_events": [np.int64(len(g))],
            "n_legs": [np.int64(d2.size)],
            "sum_d2": [np.int64(d2.sum()) if d2.size else np.int64(0)],
            "max_d2": [np.int64(d2.max()) if d2.size else np.int64(0)],
            "sum_dt_us": [np.int64(us[-1] - us[0]) if d2.size else np.int64(0)],
        }
        if cell_col is not None:
            out["n_cells"] = [np.int64(
                np.unique(g[cell_col].to_numpy(dtype=np.int64)).size
            )]
        return pd.DataFrame(out)

    return (
        ds.select_columns(cols)
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def od_matrix(ds, key_col: str, ts_col: str, order_col: str, cell_col: str,
              num_partitions: int = 8):
    """Origin→destination transition matrix over trajectory legs: how many
    legs go from cell A to cell B, across all keys.

    One ``groupby(key)`` shuffle co-locates each key's points; per key the
    time-sorted consecutive-cell transitions collapse LOCALLY to distinct
    ``(o_cell, d_cell, part_n)`` rows (lexsort run-length — no per-leg
    Python loop), then ONE small Sum groupby merges the partials. The wide
    exchange carries at most one row per distinct pair per key, never one
    row per leg — the tile_counts two-phase shape applied to transitions.
    Self-loop legs (consecutive points in the same cell) are counted.
    Output: ``(o_cell, d_cell, n)``.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from georay.runtime import table_from_pandas

    out_schema = pa.schema(
        [("o_cell", pa.int64()), ("d_cell", pa.int64()),
         ("part_n", pa.int64())]
    )

    def per_key(g: pd.DataFrame):
        g = g.sort_values([ts_col, order_col], kind="quicksort")
        c = g[cell_col].to_numpy(dtype=np.int64)
        if c.size < 2:
            return table_from_pandas(
                pd.DataFrame({"o_cell": [], "d_cell": [], "part_n": []}),
                schema=out_schema,
            )
        o, d = c[:-1], c[1:]
        order = np.lexsort((d, o))
        o_s, d_s = o[order], d[order]
        new = np.empty(o_s.size, dtype=bool)
        new[0] = True
        new[1:] = (o_s[1:] != o_s[:-1]) | (d_s[1:] != d_s[:-1])
        idx = np.flatnonzero(new)
        counts = np.diff(np.append(idx, o_s.size)).astype(np.int64)
        return table_from_pandas(
            pd.DataFrame(
                {"o_cell": o_s[idx], "d_cell": d_s[idx], "part_n": counts}
            ),
            schema=out_schema,
        )

    partials = (
        ds.select_columns([key_col, ts_col, order_col, cell_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )
    return (
        partials.repartition(num_partitions)
        .groupby(["o_cell", "d_cell"])
        .aggregate(Sum("part_n", alias_name="n"))
    )


def leg_cell_cover(ds, key_col: str, ts_col: str, order_col: str,
                   x_col: str, y_col: str, cell_size: int,
                   nx: int, ny: int):
    """Supercover line rasterization of trajectory legs — which grid cells
    does each consecutive-point segment cross? Completes the vector trio
    (point→cell: codec.encode; polygon→cells: cells.polygon_cover;
    line→cells: here).

    Coordinates are INTEGER grid units (milli-degrees in the harness);
    cells are ``cell_size``-sized boxes, ``nx × ny`` of them. A cell is
    covered when (a) it lies in the segment's floor-div bbox index range —
    note this is LOW-EDGE-EXCLUSIVE when the segment only touches a cell's
    low gridline from outside, the same half-open convention as the PIP
    rectangles — and (b) the segment's line straddles or touches the cell's
    corner box (min/max of the four int64 corner cross-products brackets
    zero). All arithmetic is int64 (cross products bounded by extent² <
    2⁶³), so the SQL twin is bit-exact BY CONSTRUCTION — no float geometry
    anywhere.

    One shuffle (groupby key), then per key: sort by (ts, order), build
    legs, enumerate each leg's bbox candidate cells with the offsets idiom
    (no per-leg Python loop), filter by the straddle test, and aggregate
    per leg. Output one row per leg: ``key_col, seq (0-based),
    n_cov (covered cells), sum_code (Σ cx·ny + cy — a content checksum)``.
    """
    from georay.runtime import table_from_pandas

    import pyarrow as pa

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("seq", pa.int64()),
            ("n_cov", pa.int64()),
            ("sum_code", pa.int64()),
        ]
    )
    s = np.int64(cell_size)

    def per_key(g: pd.DataFrame) -> pd.DataFrame | pa.Table:
        g = g.sort_values([ts_col, order_col], kind="quicksort")
        x = g[x_col].to_numpy(dtype=np.int64)
        y = g[y_col].to_numpy(dtype=np.int64)
        n_legs = x.size - 1
        if n_legs <= 0:
            return table_from_pandas(
                pd.DataFrame({key_col: [], "seq": [], "n_cov": [],
                              "sum_code": []}), schema=out_schema)
        x1, x2 = x[:-1], x[1:]
        y1, y2 = y[:-1], y[1:]
        cx_lo = np.minimum(x1, x2) // s
        cx_hi = np.minimum(np.maximum(x1, x2) // s, np.int64(nx - 1))
        cy_lo = np.minimum(y1, y2) // s
        cy_hi = np.minimum(np.maximum(y1, y2) // s, np.int64(ny - 1))
        w = (cx_hi - cx_lo + 1)
        h = (cy_hi - cy_lo + 1)
        counts = w * h
        total = int(counts.sum())
        leg = np.repeat(np.arange(n_legs, dtype=np.int64), counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        local = np.arange(total, dtype=np.int64) - starts
        cx = cx_lo[leg] + local // h[leg]
        cy = cy_lo[leg] + local % h[leg]
        # corner cross products vs the segment line (int64 exact)
        dx = (x2 - x1)[leg]
        dy = (y2 - y1)[leg]
        bx1, bx2 = cx * s, (cx + 1) * s
        by1, by2 = cy * s, (cy + 1) * s
        d_a = dx * (by1 - y1[leg]) - dy * (bx1 - x1[leg])
        d_b = dx * (by1 - y1[leg]) - dy * (bx2 - x1[leg])
        d_c = dx * (by2 - y1[leg]) - dy * (bx1 - x1[leg])
        d_d = dx * (by2 - y1[leg]) - dy * (bx2 - x1[leg])
        dmin = np.minimum(np.minimum(d_a, d_b), np.minimum(d_c, d_d))
        dmax = np.maximum(np.maximum(d_a, d_b), np.maximum(d_c, d_d))
        keep = (dmin <= 0) & (dmax >= 0)
        leg_k, cx_k, cy_k = leg[keep], cx[keep], cy[keep]
        n_cov = np.bincount(leg_k, minlength=n_legs).astype(np.int64)
        code = cx_k * np.int64(ny) + cy_k
        sum_code = np.zeros(n_legs, dtype=np.int64)
        np.add.at(sum_code, leg_k, code)
        return table_from_pandas(
            pd.DataFrame(
                {
                    key_col: np.full(n_legs, g[key_col].iloc[0],
                                     dtype=np.int64),
                    "seq": np.arange(n_legs, dtype=np.int64),
                    "n_cov": n_cov,
                    "sum_code": sum_code,
                }
            ),
            schema=out_schema,
        )

    cols = [key_col, ts_col, order_col, x_col, y_col]
    return (
        ds.select_columns(cols)
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )
