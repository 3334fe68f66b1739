"""ops.trajectory: per-key leg stats vs a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _run(df: pd.DataFrame, **kw):
    import ray.data

    from georay.ops.trajectory import trajectory_stats

    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = trajectory_stats(
        ds, "k", "us", "oid", "x", "y", **kw
    ).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def _oracle(df: pd.DataFrame, with_cells: bool) -> pd.DataFrame:
    rows = []
    for k, g in df.groupby("k"):
        g = g.sort_values(["us", "oid"])
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        d2 = np.diff(x) ** 2 + np.diff(y) ** 2
        row = {
            "k": k, "n_events": len(g), "n_legs": d2.size,
            "sum_d2": int(d2.sum()) if d2.size else 0,
            "max_d2": int(d2.max()) if d2.size else 0,
            "sum_dt_us": int(us[-1] - us[0]) if d2.size else 0,
        }
        if with_cells:
            row["n_cells"] = int(np.unique(g["cell"]).size)
        rows.append(row)
    return pd.DataFrame(rows).sort_values("k").reset_index(drop=True)


def test_trajectory_stats_matches_oracle(ray_session):
    rng = np.random.RandomState(3)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 7, n),
            "us": rng.randint(0, 10**9, n).astype(np.int64),
            "oid": np.arange(n, dtype=np.int64),
            "x": rng.randint(-1000, 1000, n).astype(np.int64),
            "y": rng.randint(-1000, 1000, n).astype(np.int64),
            "cell": rng.randint(0, 20, n).astype(np.int64),
        }
    )
    out = _run(df, cell_col="cell")
    exp = _oracle(df, with_cells=True)
    pd.testing.assert_frame_equal(
        out[exp.columns].astype("int64"), exp.astype("int64")
    )


def test_trajectory_singleton_and_duplicate_ts(ray_session):
    # key 0: single point (0 legs, zero stats); key 1: duplicate timestamps
    # must tie-break on the order column deterministically
    df = pd.DataFrame(
        {
            "k": [0, 1, 1, 1],
            "us": [5, 10, 10, 10],
            "oid": [0, 3, 1, 2],  # sorted order within k=1: oid 1,2,3
            "x": [9, 7, 0, 3],
            "y": [0, 0, 0, 0],
        }
    )
    out = _run(df)
    s = out.set_index("k")
    assert s.loc[0, "n_legs"] == 0 and s.loc[0, "sum_d2"] == 0
    assert s.loc[0, "max_d2"] == 0 and s.loc[0, "sum_dt_us"] == 0
    # legs for k=1 in oid order: x 0->3 (9), 3->7 (16)
    assert s.loc[1, "n_legs"] == 2
    assert s.loc[1, "sum_d2"] == 25 and s.loc[1, "max_d2"] == 16
    assert s.loc[1, "sum_dt_us"] == 0
