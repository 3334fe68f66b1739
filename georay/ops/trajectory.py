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
