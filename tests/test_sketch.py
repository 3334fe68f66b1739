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


def test_grouped_quantiles_binned_high_cardinality(ray_session):
    """10⁶-distinct float column: the binned variant stays exact vs DuckDB
    quantile_disc AND the exchange stays bounded — bin histogram ≤ groups ×
    n_bins rows, refine ≤ a few bins' worth of distinct values (the
    unbinned histogram would ship ~10⁶ rows here)."""
    import duckdb
    import pandas as pd
    import ray

    from georay.ops import sketch as sketch_ops

    rng = np.random.RandomState(13)
    n = 1_000_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1]),
            # lognormal → skewed, essentially all-distinct float64
            "v": rng.lognormal(0.0, 2.0, size=n),
        }
    )
    n_bins = 512
    refine_limit = 500  # force the refinement loop to iterate
    ds = ray.data.from_pandas(df).repartition(8)
    dbg: dict = {}
    got = (
        sketch_ops.grouped_quantiles_binned(
            ds, "g", "v", qs=(0.1, 0.5, 0.9), n_bins=n_bins,
            refine_limit=refine_limit, _debug=dbg
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT g, quantile_disc(v, 0.1) AS p10,
                  quantile_disc(v, 0.5) AS p50,
                  quantile_disc(v, 0.9) AS p90
           FROM t GROUP BY g ORDER BY g"""
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    n_distinct = df["v"].nunique()
    assert n_distinct > 990_000  # the test is vacuous otherwise
    # every binned pass ships ≤ candidates × n_bins histogram rows; the
    # exact pass ≤ candidates × refine_limit — both independent of the
    # 10⁶ value cardinality the unbinned op would ship
    n_cands = 3 * 3  # groups × quantiles
    assert dbg["bin_hist_rows"] <= n_cands * n_bins
    assert dbg["refine_rows"] <= n_cands * refine_limit
    assert dbg["refine_rows"] < n_distinct // 10
    # with refine_limit 500 the initial ~2k-row candidate bins stay open —
    # the refinement loop must actually iterate and still bound every pass
    assert 1 <= dbg["n_levels"] <= 8


def test_grouped_quantiles_binned_matches_unbinned_int(ray_session):
    """Integer column: binned and unbinned variants agree exactly."""
    import pandas as pd
    import ray

    from georay.ops import sketch as sketch_ops

    rng = np.random.RandomState(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], size=20_000),
            "v": rng.randint(-10_000, 10_000, size=20_000).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    a = (
        sketch_ops.grouped_quantiles(ds, "g", "v", qs=(0.25, 0.5, 0.99))
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        sketch_ops.grouped_quantiles_binned(
            ds, "g", "v", qs=(0.25, 0.5, 0.99), n_bins=64
        )
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


# ------------------------------------------------------------------ HLL


def _hll_brute(keys: np.ndarray, p: int) -> pd.DataFrame:
    from georay.ops.pairs import popcount64

    h = splitmix64(np.unique(keys).astype(np.int64).view(np.uint64))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    with np.errstate(over="ignore"):
        rank = np.where(
            w == 0, np.int64(64 - p + 1), popcount64(w ^ (w - np.uint64(1)))
        ).astype(np.int64)
    return (
        pd.DataFrame({"register": reg, "max_rank": rank})
        .groupby("register", as_index=False)["max_rank"].max()
        .sort_values("register").reset_index(drop=True)
    )


def test_hll_registers_match_brute_and_block_invariant(ray_session):
    import ray.data

    from georay.ops.sketch import hll_registers

    rng = np.random.RandomState(7)
    keys = rng.randint(0, 5000, size=20_000).astype(np.int64)  # heavy dups
    want = _hll_brute(keys, p=8)
    for blocks in (1, 7):
        ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(blocks)
        got = (
            hll_registers(ds, "k", p=8).to_pandas()
            .sort_values("register").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_hll_estimate_accuracy():
    from georay.ops.sketch import hll_estimate

    for ndv in (150, 3000, 60_000):
        keys = np.arange(ndv, dtype=np.int64) * 7919 + 13
        est = hll_estimate(_hll_brute(keys, p=8), p=8)
        assert abs(est - ndv) / ndv < 0.25, (ndv, est)


# -------------------------------------------------------- MG heavy hitters


def test_heavy_hitters_exact_with_many_distinct_keys(ray_session):
    import ray.data

    from georay.ops.sketch import heavy_hitters

    # 3 planted heavy keys (4% each) over 50k distinct background keys —
    # far more distinct keys than the sketch holds
    rng = np.random.RandomState(11)
    n = 60_000
    bg = rng.randint(1_000, 51_000, size=n).astype(np.int64)
    hot = np.repeat(np.array([7, 8, 9], dtype=np.int64), int(0.04 * n))
    keys = np.concatenate([bg[: n - hot.size], hot])
    rng.shuffle(keys)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(9)

    got = heavy_hitters(ds, "k", num=1, den=50, sketch_k=128).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)

    u, c = np.unique(keys, return_counts=True)
    mask = c * 50 > keys.size
    want = pd.DataFrame({"k": u[mask], "n": c[mask].astype(np.int64)})
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_mg_candidates_guarantee_and_size(ray_session):
    import ray.data

    from georay.ops.sketch import _MG_TOTAL_KEY, mg_candidates

    rng = np.random.RandomState(3)
    keys = np.concatenate(
        [rng.randint(0, 30_000, size=40_000),
         np.full(2_000, 77)]  # one 4.8% key
    ).astype(np.int64)
    out = mg_candidates(
        ray.data.from_arrow(pa.table({"k": keys})).repartition(8), "k", 64
    ).to_pandas()
    ks = out["k"].to_numpy()
    assert (ks == _MG_TOTAL_KEY).sum() == 1
    assert int(out.loc[ks == _MG_TOTAL_KEY, "mg_count"].iloc[0]) == keys.size
    cand = ks[ks != _MG_TOTAL_KEY]
    assert cand.size <= 64  # sketch never exceeds its capacity
    assert 77 in cand  # the guaranteed heavy key survives the merges


def test_heavy_hitters_output_is_acero_joinable(ray_session):
    """ADVICE r3: more combine partitions than candidate groups made the
    final aggregate emit schema-less empty blocks that crash Acero joins.
    The 1-combine-partition final must produce join-safe blocks."""
    import ray.data

    from georay.ops.sketch import heavy_hitters

    rng = np.random.RandomState(5)
    n = 20_000
    keys = np.concatenate(
        [rng.randint(100, 5_000, n).astype(np.int64),
         np.repeat(np.array([1, 2], dtype=np.int64), int(0.05 * n))]
    )
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(9)
    hh = heavy_hitters(ds, "k", num=1, den=50, sketch_k=128)
    side = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "label": ["a", "b", "c"]})
    )
    joined = hh.join(side, join_type="inner", num_partitions=2,
                     on=("k",)).to_pandas()
    assert sorted(joined["k"].tolist()) == [1, 2]
