"""Windowed-aggregate ops vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def events():
    rng = np.random.RandomState(0)
    n = 3000
    ts = np.sort(rng.randint(0, 90 * 86_400, n)) * 1_000_000  # 90 days, in us
    key = rng.choice(["a", "b", "c"], n)
    val = rng.uniform(0, 100, n)
    return pa.table(
        {
            "k": key,
            "ts": pa.array(ts, pa.timestamp("us")),
            "v": val,
        }
    )


def test_tumbling_matches_pandas(ray_session, events):
    import ray

    from georay.ops import window as win

    out = win.tumbling(
        ray.data.from_arrow(events).repartition(5), "k", "ts", "v"
    ).to_pandas()
    df = events.to_pandas()
    df["win"] = df["ts"].astype("int64") // win.US_PER_DAY
    df["milli"] = np.floor(df["v"] * 1000).astype(np.int64)
    want = df.groupby(["k", "win"], as_index=False).agg(
        n=("milli", "size"), sum_val_milli=("milli", "sum")
    )
    got = out.sort_values(["k", "win"]).reset_index(drop=True)
    want = want.sort_values(["k", "win"]).reset_index(drop=True)
    assert got[["k", "win"]].equals(want[["k", "win"]])
    assert np.array_equal(got["n"], want["n"])
    assert np.array_equal(got["sum_val_milli"], want["sum_val_milli"])


def test_sliding_matches_brute(ray_session, events):
    import ray

    from georay.ops import window as win

    width, slide = 5 * 86_400, 86_400
    out = win.sliding(
        ray.data.from_arrow(events).repartition(4), "k", "ts", "v",
        width_us=width, slide_us=slide, ts_scale_us=1_000_000,
    ).to_pandas()
    df = events.to_pandas()
    s = df["ts"].astype("int64") // 1_000_000
    milli = np.floor(df["v"] * 1000).astype(np.int64)
    rows = []
    for start in range(0, int(s.max()) + 1, slide):
        m = (s >= start) & (s < start + width)
        if not m.any():
            continue
        for k in df.loc[m, "k"].unique():
            mm = m & (df["k"] == k)
            rows.append((k, start, int(mm.sum()), int(milli[mm].sum())))
    want = pd.DataFrame(rows, columns=["k", "win_start", "n", "sum_val_milli"])
    got = out.sort_values(["k", "win_start"]).reset_index(drop=True)
    want = want.sort_values(["k", "win_start"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert np.array_equal(got["n"], want["n"])
    assert np.array_equal(got["sum_val_milli"], want["sum_val_milli"])


def test_sliding_rejects_bad_slide(ray_session, events):
    import ray

    from georay.ops import window as win

    with pytest.raises(ValueError):
        win.sliding(ray.data.from_arrow(events), "k", "ts", "v",
                    width_us=7, slide_us=3)


def test_session_matches_brute(ray_session, events):
    import ray

    from georay.ops import window as win

    gap = 3600  # 1h in scaled units (seconds)
    out = win.session(
        ray.data.from_arrow(events).repartition(4), "k", "ts",
        gap_us=gap, ts_scale_us=1_000_000,
    ).to_pandas()
    df = events.to_pandas()
    want_rows = []
    for k, g in df.groupby("k"):
        s = np.sort(g["ts"].astype("int64").to_numpy() // 1_000_000)
        breaks = np.flatnonzero(np.diff(s) > gap) + 1
        for seg in np.split(s, breaks):
            want_rows.append((k, seg[0], seg[-1], seg.size))
    want = set(want_rows)
    got = set(
        zip(out["k"], out["session_start_us"], out["session_end_us"], out["n"])
    )
    assert got == want


def test_asof_join_matches_pandas(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from georay.ops import asof as asof_ops

    rng = np.random.RandomState(4)
    n_l, n_r = 2000, 300
    left = pa.table(
        {"k": rng.randint(0, 5, n_l).astype(np.int64),
         "ts": rng.randint(0, 100_000, n_l).astype(np.int64)}
    )
    right = pa.table(
        {"k": rng.randint(0, 5, n_r).astype(np.int64),
         "ts": rng.randint(0, 100_000, n_r).astype(np.int64)}
    )
    out = asof_ops.asof_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(2),
        by="k",
    ).to_pandas()
    rdf = right.to_pandas()
    def latest(k, ts):
        c = rdf[(rdf.k == k) & (rdf.ts <= ts)]
        return int(c.ts.max()) if len(c) else None
    got = sorted(zip(out["k"], out["ts"], out["ts_r"]))
    exp = []
    for k, ts in zip(left["k"].to_numpy(), left["ts"].to_numpy()):
        m = latest(k, ts)
        if m is not None:
            exp.append((int(k), int(ts), m))
    assert got == sorted(exp)


def test_interval_join_matches_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from georay.ops import asof as asof_ops

    rng = np.random.RandomState(6)
    pts = pa.table(
        {"k": rng.randint(0, 3, 1500).astype(np.int64),
         "ts": rng.randint(0, 50_000, 1500).astype(np.int64)}
    )
    st = rng.randint(0, 50_000, 120).astype(np.int64)
    # variable spans incl. zero-length and multi-bucket intervals
    iv = pa.table(
        {"k": rng.randint(0, 3, 120).astype(np.int64),
         "start": st,
         "end": st + rng.randint(0, 9_000, 120).astype(np.int64)}
    )
    out = asof_ops.interval_join(
        ray.data.from_arrow(pts).repartition(4),
        ray.data.from_arrow(iv).repartition(2),
        by="k", point_ts="ts", start_col="start", end_col="end",
        bucket=2_000, num_partitions=4,
    ).to_pandas()
    got = sorted(zip(out["k"], out["ts"], out["start"], out["end"]))
    p, i = pts.to_pandas(), iv.to_pandas()
    exp = []
    for _, r in i.iterrows():
        m = p[(p.k == r.k) & (p.ts >= r.start) & (p.ts < r.end)]
        exp.extend((int(r.k), int(t), int(r.start), int(r.end)) for t in m.ts)
    assert got == sorted(exp)
    assert len(got) > 0


def test_running_stats_matches_pandas(ray_session):
    """Duplicate timestamps tiebreak on the order column; rolling sum edge
    (fewer than `roll` rows) matches pandas rolling(min_periods=1)."""
    import ray

    from georay.ops.window import running_stats

    rng = np.random.RandomState(7)
    n = 300
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 6, n),
            "us": rng.randint(0, 50, n).astype(np.int64),  # many dup ts
            "oid": np.arange(n, dtype=np.int64),
            "v": rng.uniform(-5, 5, n),
        }
    )
    tab = pa.Table.from_pandas(df.assign(us=pd.to_datetime(df.us, unit="us")),
                               preserve_index=False)
    # match the parquet tables' timestamp[us] (from_pandas yields [ns])
    i = tab.schema.get_field_index("us")
    tab = tab.set_column(i, "us", tab["us"].cast(pa.timestamp("us")))
    got = (
        running_stats(ray.data.from_arrow(tab), "k", "us", "oid", "v", roll=3)
        .to_pandas().sort_values(["k", "seq"]).reset_index(drop=True)
    )
    rows = []
    for k, g in df.groupby("k"):
        g = g.sort_values(["us", "oid"], kind="stable")
        milli = np.floor(g["v"].to_numpy() * 1000).astype(np.int64)
        cum = np.cumsum(milli)
        us = g["us"].to_numpy(np.int64)
        dt = np.concatenate([[0], np.diff(us)])
        roll = (
            pd.Series(milli).rolling(3, min_periods=1).sum().to_numpy()
        ).astype(np.int64)
        for i in range(len(g)):
            rows.append((k, g["oid"].iloc[i], i + 1, cum[i], dt[i], roll[i]))
    want = pd.DataFrame(
        rows, columns=["k", "oid", "seq", "cum_milli", "dt_us", "roll_milli"]
    ).sort_values(["k", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_funnel_matches_brute(ray_session):
    """Greedy strictly-increasing chain; keys with no funnel events appear
    at stage 0; same-timestamp stage events do NOT chain (strict >)."""
    import ray

    from georay.ops.window import funnel

    df = pd.DataFrame(
        {
            "k":  [1, 1, 1,   2, 2,   3,   4, 4],
            "us": [10, 20, 30, 5, 5,   7,   1, 2],
            "ty": ["a", "b", "c", "a", "b", "x", "b", "a"],
        }
    )
    tab = pa.Table.from_pandas(
        df.assign(us=pd.to_datetime(df.us, unit="us")), preserve_index=False
    )
    i = tab.schema.get_field_index("us")
    tab = tab.set_column(i, "us", tab["us"].cast(pa.timestamp("us")))
    got = (
        funnel(ray.data.from_arrow(tab), "k", "us", "ty", ["a", "b", "c"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    # k=1: a@10 < b@20 < c@30 → 3; k=2: a@5, b@5 NOT > 5 → 1;
    # k=3: no funnel events → 0; k=4: b before a, no b after a@2 → 1
    want = pd.DataFrame({"k": [1, 2, 3, 4], "stage": [3, 1, 0, 1]})
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_max_concurrency_matches_brute(ray_session):
    """Half-open [s,e): an interval ending at t does not overlap one
    starting at t; random intervals vs a brute timeline scan."""
    import ray

    from georay.ops.window import max_concurrency

    rng = np.random.RandomState(17)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n).astype(np.int64),
            "s": rng.randint(0, 100, n).astype(np.int64),
        }
    )
    df["e"] = df["s"] + rng.randint(1, 30, n)
    got = (
        max_concurrency(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(4),
            "k", "s", "e",
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    rows = []
    for k, g in df.groupby("k"):
        best = 0
        for t in np.unique(g["s"]):  # max is attained at some start point
            best = max(best, int(((g["s"] <= t) & (t < g["e"])).sum()))
        rows.append((k, best))
    want = pd.DataFrame(rows, columns=["k", "max_concurrent"])
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_max_concurrency_touching_intervals(ray_session):
    """[0,10) and [10,20) never overlap; [0,10) and [9,20) do."""
    import ray

    from georay.ops.window import max_concurrency

    df = pd.DataFrame(
        {"k": [1, 1, 2, 2], "s": [0, 10, 0, 9], "e": [10, 20, 10, 20]}
    )
    got = (
        max_concurrency(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            "k", "s", "e",
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["max_concurrent"].tolist() == [1, 2]


def test_running_stats_ns_input_with_ts_scale(ray_session):
    """datetime64[ns] input + ts_scale_us=1000 matches the us-native run
    (ADVICE r3: dt_us was silently 1000x off on ns-typed columns)."""
    import ray

    from georay.ops.window import running_stats

    rng = np.random.RandomState(3)
    n = 200
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n),
            "us": rng.randint(0, 40, n).astype(np.int64),
            "oid": np.arange(n, dtype=np.int64),
            "v": rng.uniform(-5, 5, n),
        }
    )
    base = df.assign(us=pd.to_datetime(df.us, unit="us"))
    t_ns = pa.Table.from_pandas(base, preserve_index=False)  # [ns] by default
    t_us = t_ns.set_column(
        t_ns.schema.get_field_index("us"), "us",
        t_ns["us"].cast(pa.timestamp("us")),
    )
    key = ["k", "oid"]
    out_us = (
        running_stats(ray.data.from_arrow(t_us), "k", "us", "oid", "v")
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    out_ns = (
        running_stats(ray.data.from_arrow(t_ns), "k", "us", "oid", "v",
                      ts_scale_us=1000)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out_us, out_ns)
