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


def test_leg_cell_cover_horizontal_and_diagonal(ray_session):
    """Hand-checked segments: horizontal leg covers its 3 row cells;
    corner-touching diagonal includes the touched neighbors (closed-box
    straddle test)."""
    import pandas as pd
    import ray

    from georay.ops import trajectory as traj

    s, nx, ny = 11250, 32, 16
    df = pd.DataFrame(
        {
            "k": [1, 1, 2, 2],
            "us": [0, 1, 0, 1],
            "oid": [0, 1, 2, 3],
            "xi": [100, 30000, 0, 22500],
            "yi": [100, 100, 0, 22500],
        }
    )
    out = (
        traj.leg_cell_cover(
            ray.data.from_pandas(df).repartition(2), "k", "us", "oid",
            "xi", "yi", cell_size=s, nx=nx, ny=ny,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1 horizontal: cells (0,0),(1,0),(2,0)
    assert out.loc[0, "n_cov"] == 3 and out.loc[0, "sum_code"] == (0 + 16 + 32)
    # k=2 diagonal via corner (11250,11250) and (22500,22500): band cells
    # (0,0),(1,1),(2,2) + corner-touchers (0,1),(1,0),(1,2),(2,1)
    assert out.loc[1, "n_cov"] == 7
    codes = {0 * 16 + 0, 1 * 16 + 1, 2 * 16 + 2, 0 * 16 + 1, 1 * 16 + 0,
             1 * 16 + 2, 2 * 16 + 1}
    assert out.loc[1, "sum_code"] == sum(codes)


def test_od_matrix_matches_pandas_oracle(ray_session):
    """Random keyed cell streams vs a LAG-style pandas replica; includes
    singleton keys (no legs) and self-loop legs (same cell twice)."""
    import ray

    from georay.ops import trajectory as traj

    rng = np.random.RandomState(11)
    n = 500
    df = pd.DataFrame(
        {
            "k": np.concatenate([rng.randint(0, 9, n - 1), [99]]),  # 99 singleton
            "us": rng.randint(0, 10**6, n).astype(np.int64),
            "oid": np.arange(n, dtype=np.int64),
            "cell": rng.randint(0, 6, n).astype(np.int64),  # few cells → self-loops
        }
    )
    got = (
        traj.od_matrix(
            ray.data.from_pandas(df).repartition(4), "k", "us", "oid", "cell"
        )
        .to_pandas()
        .sort_values(["o_cell", "d_cell"])
        .reset_index(drop=True)
    )
    legs = []
    for _, g in df.groupby("k"):
        c = g.sort_values(["us", "oid"])["cell"].to_numpy(np.int64)
        legs += list(zip(c[:-1], c[1:]))
    want = (
        pd.DataFrame(legs, columns=["o_cell", "d_cell"])
        .groupby(["o_cell", "d_cell"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["o_cell", "d_cell"])
        .reset_index(drop=True)
    )
    assert (want["o_cell"] == want["d_cell"]).any()  # self-loops exercised
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_leg_cell_cover_matches_replica(ray_session):
    """Random trajectories vs a per-cell brute-force replica."""
    import pandas as pd
    import ray

    from georay.ops import trajectory as traj

    rng = np.random.RandomState(5)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 12, n),
            "us": rng.randint(0, 10**6, n),
            "oid": np.arange(n),
            "xi": rng.randint(0, 360000, n),
            "yi": rng.randint(0, 180000, n),
        }
    )
    s, nx, ny = 11250, 32, 16
    got = (
        traj.leg_cell_cover(
            ray.data.from_pandas(df).repartition(5), "k", "us", "oid",
            "xi", "yi", cell_size=s, nx=nx, ny=ny,
        )
        .to_pandas()
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    rows = []
    for k, g in df.groupby("k"):
        g = g.sort_values(["us", "oid"])
        x, y = g["xi"].to_numpy(np.int64), g["yi"].to_numpy(np.int64)
        for i in range(len(g) - 1):
            x1, y1, x2, y2 = x[i], y[i], x[i + 1], y[i + 1]
            ncv, sc = 0, 0
            for cx in range(min(x1, x2) // s, min(max(x1, x2) // s, nx - 1) + 1):
                for cy in range(min(y1, y2) // s,
                                min(max(y1, y2) // s, ny - 1) + 1):
                    dx, dy = int(x2 - x1), int(y2 - y1)
                    ds_ = [dx * (by - y1) - dy * (bx - x1)
                           for bx in (cx * s, (cx + 1) * s)
                           for by in (cy * s, (cy + 1) * s)]
                    if min(ds_) <= 0 <= max(ds_):
                        ncv += 1
                        sc += cx * ny + cy
            rows.append((k, i, ncv, sc))
    want = pd.DataFrame(rows, columns=["k", "seq", "n_cov", "sum_code"])
    want = want.sort_values(["k", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_cov": "int64", "sum_code": "int64"}),
        want.astype({c: "int64" for c in want.columns}),
    )
