"""Source/sink facade round-trips (SURVEY.md N9)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from georay import io as gio


def _table():
    return pa.table(
        {
            "k": np.arange(100, dtype=np.int64),
            "v": (np.arange(100) * 0.5).astype(np.float64),
            "s": [f"row{i}" for i in range(100)],
        }
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip_formats(ray_session, tmp_path, fmt):
    import ray

    ds = ray.data.from_arrow(_table()).repartition(4)
    out = str(tmp_path / f"out_{fmt}")
    gio.write_table(ds, out, format=fmt)
    back = gio.read_table(out, format=fmt).to_pandas().sort_values("k")
    assert len(back) == 100
    assert back["k"].tolist() == list(range(100))
    assert back["s"].tolist() == [f"row{i}" for i in range(100)]


def test_format_inference_and_column_pruning(ray_session, tmp_path):
    import ray

    out = str(tmp_path / "pruned")
    gio.write_table(ray.data.from_arrow(_table()), out)  # parquet default
    back = gio.read_table(out, columns=["k"])
    df = back.to_pandas()
    assert list(df.columns) == ["k"] and len(df) == 100
    assert gio.infer_format("x.csv") == "csv"
    assert gio.infer_format("x.jsonl") == "json"
    assert gio.infer_format("dir/of/shards") == "parquet"
    assert gio.infer_format("t.lance") == "lance"


def test_partitioned_sink_resume(ray_session, tmp_path):
    import os

    import ray

    out = str(tmp_path / "parts")
    t = pa.table(
        {"p": np.repeat(np.arange(3), 10).astype(np.int64),
         "v": np.arange(30, dtype=np.int64)}
    )
    man = gio.write_table(
        ray.data.from_arrow(t), out, partition_col="p", lineage="io-test"
    )
    assert set(man["partitions"]) == {"0", "1", "2"}
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 3
    back = gio.read_table(out).to_pandas()
    assert sorted(back["v"]) == list(range(30))


def test_lance_raises_clearly(ray_session):
    with pytest.raises(ImportError, match="pylance"):
        gio.read_table("/nonexistent/t.lance", format="lance")
