"""Skew salting + checkpointed partitioned writes."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

from georay import runtime


def _skewed_ds(ray, n=5000):
    key = np.where(np.arange(n) % 2 == 0, 7, np.arange(n) % 50)
    return ray.data.from_arrow(
        pa.table({"cell": key.astype(np.int64), "v": np.arange(n, dtype=np.int64)})
    ).repartition(8)


def test_detect_heavy_keys(ray_session):
    import ray

    ds = _skewed_ds(ray)
    hot = runtime.detect_heavy_keys(ds, "cell", threshold=1000)
    assert hot.tolist() == [7]


def test_salting_preserves_counts(ray_session):
    import ray

    ds = _skewed_ds(ray)
    hot = np.array([7])
    salted = runtime.salt_hot_keys(ds, "cell", hot, n_salt=8)
    df = salted.to_pandas()
    # unsalting restores the original key for every row
    assert np.array_equal(df["cell_salted"].to_numpy() // 8, df["cell"].to_numpy())
    # hot key spread across multiple sub-keys, cold keys untouched
    hot_subs = df.loc[df["cell"] == 7, "cell_salted"].nunique()
    assert hot_subs > 1
    cold = df[df["cell"] != 7]
    assert (cold["cell_salted"] == cold["cell"] * 8).all()


def test_write_partitioned_and_resume(ray_session, tmp_path):
    import ray

    out = str(tmp_path / "parts")
    t = pa.table(
        {
            "part": np.repeat(np.arange(4), 25).astype(np.int64),
            "v": np.arange(100, dtype=np.int64),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    man = runtime.write_partitioned(ds, out, "part", lineage="unit-test")
    assert set(man["partitions"]) == {"0", "1", "2", "3"}
    assert sum(p["rows"] for p in man["partitions"].values()) == 100
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4

    # resume: delete one partition file (and its sidecar) but keep the
    # manifest entry -> rerun must NOT rewrite it (it is committed)
    part2 = [f for f in os.listdir(out)
             if f.startswith("part-2-") and f.endswith(".parquet")][0]
    os.remove(os.path.join(out, part2))
    os.remove(os.path.join(out, "_done-" + part2[len("part-"):-len(".parquet")] + ".json"))
    man2 = runtime.write_partitioned(ds, out, "part", lineage="unit-test-2")
    assert not any(
        f.startswith("part-2-") and f.endswith(".parquet")
        for f in os.listdir(out)
    )
    assert set(man2["partitions"]) == {"0", "1", "2", "3"}

    # fresh rerun after wiping the manifest AND sidecars rewrites everything
    os.remove(os.path.join(out, "_manifest.json"))
    for f in list(os.listdir(out)):
        if f.startswith("_done-"):
            os.remove(os.path.join(out, f))
    man3 = runtime.write_partitioned(ds, out, "part", lineage="unit-test-3")
    assert any(
        f.startswith("part-2-") and f.endswith(".parquet")
        for f in os.listdir(out)
    )
    assert sum(p["rows"] for p in man3["partitions"].values()) == 100

    # data round-trips
    import pyarrow.parquet as pq

    back = pq.ParquetDataset(
        [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")]
    ).read()
    assert back.num_rows == 100
    assert sorted(back["v"].to_pylist()) == list(range(100))


def test_write_partitioned_mid_run_crash_resume(ray_session, tmp_path):
    # simulate a crash AFTER two partitions committed (files + sidecars on
    # disk) but BEFORE the final manifest write: the rerun must skip the
    # sidecar-committed partitions and absorb them into the manifest
    import ray

    out = str(tmp_path / "crash")
    t = pa.table(
        {
            "part": np.repeat(np.arange(4), 25).astype(np.int64),
            "v": np.arange(100, dtype=np.int64),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    runtime.write_partitioned(ds, out, "part", lineage="full")
    # forge the crash state: drop the manifest and two of the partitions
    os.remove(os.path.join(out, "_manifest.json"))
    for f in list(os.listdir(out)):
        if f.startswith(("part-0-", "part-1-", "_done-0-", "_done-1-")):
            os.remove(os.path.join(out, f))
    kept = {f for f in os.listdir(out) if f.endswith(".parquet")}
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in kept}
    man = runtime.write_partitioned(ds, out, "part", lineage="rerun")
    # committed partitions 2/3 were not rewritten (mtimes unchanged)
    for f in kept:
        assert os.path.getmtime(os.path.join(out, f)) == mtimes[f]
    # 0/1 were reprocessed; manifest covers all four with full row counts
    assert set(man["partitions"]) == {"0", "1", "2", "3"}
    assert sum(p["rows"] for p in man["partitions"].values()) == 100


def test_salt_overflow_guard(ray_session):
    import pytest
    import ray

    big = pa.table({"cell": np.array([1 << 61], dtype=np.int64)})
    ds = ray.data.from_arrow(big)
    with pytest.raises(Exception, match="salting overflow"):
        runtime.salt_hot_keys(ds, "cell", np.array([1 << 61]), n_salt=8).to_pandas()
