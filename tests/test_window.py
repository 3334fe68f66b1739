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
