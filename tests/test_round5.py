"""Round-5 additions: ADVICE hazard guards, persisted vector index,
real multimodal containers, log-round connected components."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- guards

def test_running_stats_rejects_ns_without_scale(ray_session):
    """datetime64[ns] ts with the default ts_scale_us=1 must raise loudly
    instead of silently producing 1000x-off dt_us (VERDICT r4 weak #1)."""
    import ray

    from georay.ops.window import running_stats

    df = pd.DataFrame(
        {
            "k": np.zeros(10, np.int64),
            "ts": pd.to_datetime(np.arange(10), unit="us"),  # pandas → [ns]
            "oid": np.arange(10, dtype=np.int64),
            "v": np.ones(10),
        }
    )
    t_ns = pa.Table.from_pandas(df, preserve_index=False)
    assert t_ns["ts"].type == pa.timestamp("ns")
    with pytest.raises(Exception, match="multiple of 1000"):
        running_stats(
            ray.data.from_arrow(t_ns), "k", "ts", "oid", "v"
        ).to_pandas()


def test_session_allows_unit_coarsening_on_us(ray_session):
    """ts_scale_us is ticks-per-unit: us columns may be coarsened (e.g. to
    seconds with gaps in seconds — the events_session query shape); only
    the ns-ticks/indivisible-scale combination is the loud-failure case."""
    import ray

    from georay.ops.window import session

    t = pa.table(
        {
            "k": np.zeros(8, np.int64),
            "ts": pa.array(np.arange(8, dtype=np.int64) * 2_000_000,
                           pa.timestamp("us")),
        }
    )
    out = session(ray.data.from_arrow(t), "k", "ts", gap_us=1,
                  ts_scale_us=1_000_000).to_pandas()
    assert len(out) == 8  # every 2s step exceeds the 1-unit (second) gap


def test_resample_gapfill_rejects_out_of_range_bucket(ray_session):
    """Epoch-microsecond ts with minute buckets blows the packed 24-bit
    bucket range → ValueError, not silent key corruption (ADVICE r4)."""
    import ray

    from georay.ops.window import resample_gapfill

    # ~2024 epoch micros: bucket = ts // 60e6 ≈ 2.8e7 > 2^24
    ts = np.int64(1_700_000_000_000_000) + np.arange(10) * 60_000_000
    t = pa.table(
        {
            "k": np.zeros(10, np.int64),
            "ts": pa.array(ts, pa.timestamp("us")),
            "v": np.arange(10, dtype=np.int64),
        }
    )
    with pytest.raises(Exception, match="24-bit"):
        resample_gapfill(
            ray.data.from_arrow(t), "k", "ts", "v", bucket_us=60_000_000
        ).to_pandas()


def test_ks2_by_group_empty_input(ray_session):
    """Empty / fully-filtered input returns an empty frame with the
    documented columns instead of IndexError (ADVICE r4)."""
    import ray

    from georay.ops import sketch as sketch_ops

    t = pa.table(
        {
            "g": pa.array([], pa.string()),
            "v": pa.array([], pa.int64()),
            "f": pa.array([], pa.int64()),
        }
    )
    out = sketch_ops.ks2_by_group(ray.data.from_arrow(t), "g", "v", "f")
    assert len(out) == 0
    assert list(out.columns) == [
        "g", "n1", "n2", "ks_num", "ks_den", "arg_value", "ks"
    ]


# ------------------------------------------------- verify dual plan parity

def _synth_docs(n=400, seed=11):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i:03d}" for i in range(300)]
    texts = []
    for i in range(n):
        toks = list(rng.choice(vocab, 40, replace=False))
        if i % 7 == 1:  # near-dup of predecessor: share 37 of 40 tokens
            prev = texts[-1].split()
            toks = prev[:37] + list(rng.choice(vocab, 3, replace=False))
        texts.append(" ".join(toks))
    return pa.table({"doc_id": np.arange(n, dtype=np.int64),
                     "text": texts})


@pytest.mark.parametrize("op", ["setsim", "containment"])
def test_setsim_broadcast_and_join_verify_agree(ray_session, op):
    """The verify dual plan's two paths (broadcast lookup vs the 100 TB
    hash-join fallback) must produce identical rows."""
    import ray

    from georay.ops import setsim as setsim_ops

    docs = ray.data.from_arrow(_synth_docs()).repartition(4)

    def run(bmax):
        if op == "setsim":
            r = setsim_ops.setsim_join(docs, 7, 10,
                                       broadcast_docs_max=bmax)
        else:
            r = setsim_ops.containment_join(docs, 9, 10, min_tokens=30,
                                            broadcast_docs_max=bmax)
        return (r.to_pandas().sort_values(["id_a", "id_b"])
                .reset_index(drop=True))

    a = run(10**9)  # broadcast path
    b = run(0)      # join fallback path
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_driver_and_distributed_agree(ray_session):
    """PageRank dual plan: the small-graph driver numpy loop must be
    bit-identical to the distributed join plan (same int64 updates)."""
    import ray

    from georay.ops import pagerank as pr

    rng = np.random.RandomState(5)
    src = rng.randint(0, 60, 500).astype(np.int64)
    dst = rng.randint(60, 140, 500).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))

    a = (pr.pagerank(edges, "src", "dst", iterations=3)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (pr.pagerank(edges, "src", "dst", iterations=3,
                     driver_max_edges=0)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_nearest_segment_rejects_big_coords(ray_session):
    """|coord| > 512 breaks the int64 cross-multiplied compare → ValueError
    on the segment table (driver) and the point batches (tasks)."""
    import ray

    from georay.ops.knn import nearest_segment

    seg_ok = pa.table(
        {"sid": [1], "x1": [0], "y1": [0], "x2": [10], "y2": [0]}
    )
    seg_bad = pa.table(
        {"sid": [1], "x1": [0], "y1": [0], "x2": [600], "y2": [0]}
    )
    pts_bad = ray.data.from_arrow(
        pa.table({"pid": [1], "px": [1000], "py": [0]})
    )
    pts_ok = ray.data.from_arrow(
        pa.table({"pid": [1], "px": [5], "py": [3]})
    )
    with pytest.raises(ValueError, match="segment coord"):
        nearest_segment(pts_ok, seg_bad, "pid", "px", "py")
    with pytest.raises(Exception, match="point coord"):
        nearest_segment(pts_bad, seg_ok, "pid", "px", "py").to_pandas()
    out = nearest_segment(pts_ok, seg_ok, "pid", "px", "py").to_pandas()
    # d² = 3² = 9 as the un-reduced rational num/den with den = |v|² = 100
    assert out.loc[0, "d2_num"] / out.loc[0, "d2_den"] == 9.0
