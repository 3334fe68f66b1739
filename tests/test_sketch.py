"""ops.sketch: splitmix64 SQL parity, KMV accuracy/mergeability,
stratified-sample determinism."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from georay.ops.sketch import (
    kmv_estimate,
    sql_signed64,
    sql_splitmix64,
    sql_splitmix64_subquery,
    splitmix64,
)


def test_splitmix64_sql_parity_extremes():
    keys = np.array(
        [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63), 42], dtype=np.int64
    )
    rng = np.random.RandomState(5)
    keys = np.concatenate([keys, rng.randint(-2**62, 2**62, 500)]).astype(np.int64)
    h_np = splitmix64(keys.view(np.uint64)).view(np.int64)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    h_inline = con.execute(
        f"SELECT {sql_signed64(sql_splitmix64('k'))} AS h FROM t"
    ).fetchdf()["h"].to_numpy()
    h_sub = con.execute(
        f"SELECT {sql_signed64('hu')} AS h FROM {sql_splitmix64_subquery('t', 'k')}"
    ).fetchdf()["h"].to_numpy()
    assert (h_np == h_inline).all()
    assert (h_np == h_sub).all()


def _kmv(df: pd.DataFrame, k: int, blocks: int) -> pd.DataFrame:
    import ray.data

    from georay.ops.sketch import kmv_sketch

    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)
    return kmv_sketch(ds, "key", k=k).to_pandas()


def test_kmv_estimate_accuracy(ray_session):
    rng = np.random.RandomState(9)
    n_distinct = 10_000
    keys = rng.randint(0, 2**60, n_distinct).astype(np.int64)
    df = pd.DataFrame({"key": np.repeat(keys, 3)})  # 3 copies each
    sk = _kmv(df, k=256, blocks=4)
    assert len(sk) == 256
    est = kmv_estimate(sk, k=256)
    assert abs(est / np.unique(keys).size - 1.0) < 0.2


def test_kmv_partition_invariant(ray_session):
    rng = np.random.RandomState(2)
    df = pd.DataFrame({"key": rng.randint(0, 5000, 20_000).astype(np.int64)})
    a = _kmv(df, k=128, blocks=1)
    b = _kmv(df.sample(frac=1.0, random_state=1), k=128, blocks=7)
    pd.testing.assert_frame_equal(a, b)


def test_kmv_underfull_is_exact(ray_session):
    keys = np.arange(50, dtype=np.int64)
    df = pd.DataFrame({"key": np.tile(keys, 4)})
    sk = _kmv(df, k=256, blocks=3)
    assert len(sk) == 50
    assert kmv_estimate(sk, k=256) == 50.0


def test_stratified_sample_deterministic(ray_session):
    import ray.data

    from georay.ops.sketch import stratified_sample

    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "stratum": rng.choice(["a", "b", "c"], 900),
            "key": rng.permutation(900).astype(np.int64),
        }
    )

    def run(blocks: int, frame: pd.DataFrame) -> pd.DataFrame:
        ds = ray.data.from_arrow(
            pa.Table.from_pandas(frame, preserve_index=False)
        ).repartition(blocks)
        out = stratified_sample(ds, "stratum", "key", k=10).to_pandas()
        return out.sort_values(["stratum", "rank"]).reset_index(drop=True)

    a = run(2, df)
    b = run(9, df.sample(frac=1.0, random_state=8))
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("stratum")["rank"].max() == 10).all()
    assert (a.groupby("stratum")["rank"].min() == 1).all()


def test_grouped_quantiles_matches_duckdb_rule(ray_session):
    """Random histograms vs DuckDB quantile_disc — pins the
    max(0, ceil(q·n)-1) index rule the distributed op uses."""
    import duckdb
    import pandas as pd
    import ray

    from georay.ops import sketch as sketch_ops

    rng = np.random.RandomState(11)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1]),
            "v": rng.randint(-50, 50, size=n).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = (
        sketch_ops.grouped_quantiles(ds, "g", "v", qs=(0.1, 0.5, 0.9))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT g, CAST(quantile_disc(v, 0.1) AS BIGINT) AS p10,
                  CAST(quantile_disc(v, 0.5) AS BIGINT) AS p50,
                  CAST(quantile_disc(v, 0.9) AS BIGINT) AS p90
           FROM t GROUP BY g ORDER BY g"""
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
