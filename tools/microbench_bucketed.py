"""Microbench for VERDICT r3 #2: per-key ``map_groups`` vs hash-bucketed
segmented-numpy execution of the event-analytics family.

Builds 10^5 keys x 2 rows (the worst case for per-key dispatch: ~100 µs of
Python-call + DataFrame-construction overhead per two-row group) and runs
``running_stats`` both ways through Ray Data:

- ``per_key``  — the pre-round-4 shape, reproduced inline here:
  ``groupby(key).map_groups(fn)``, one Python call per distinct key.
- ``bucketed`` — the shipped ops.window.running_stats:
  ``groupby(hash(key) % 32).map_groups(fn)``, 32 pandas groups total,
  per-key reductions as segmented numpy over lexsort run boundaries.

Asserts both plans return identical frames, prints best-of-3 wall times.

Run: python tools/microbench_bucketed.py [n_keys]
"""
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_input(n_keys: int) -> pa.Table:
    rng = np.random.default_rng(42)
    k = np.repeat(np.arange(n_keys, dtype=np.int64), 2)
    rng.shuffle(k)
    n = k.size
    return pa.table(
        {
            "k": k,
            "us": rng.integers(0, 10**9, n).astype(np.int64),
            "oid": np.arange(n, dtype=np.int64),
            "v": rng.uniform(-5, 5, n),
        }
    )


def per_key_plan(ds, roll=3):
    """The pre-round-4 running_stats shape: one map_groups call per key."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["oid"].to_numpy(np.int64), g["us"].to_numpy(np.int64))
        )
        us = g["us"].to_numpy(np.int64)[order]
        milli = np.floor(g["v"].to_numpy(np.float64)[order] * 1000
                         ).astype(np.int64)
        cum = np.cumsum(milli)
        dt = np.zeros(us.size, dtype=np.int64)
        dt[1:] = us[1:] - us[:-1]
        shifted = np.zeros(us.size, dtype=np.int64)
        if us.size > roll:
            shifted[roll:] = cum[:-roll]
        return pd.DataFrame(
            {
                "k": g["k"].to_numpy()[order],
                "oid": g["oid"].to_numpy(np.int64)[order],
                "seq": np.arange(1, us.size + 1, dtype=np.int64),
                "cum_milli": cum,
                "dt_us": dt,
                "roll_milli": cum - shifted,
            }
        )

    return ds.groupby("k").map_groups(per_key, batch_format="pandas")


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import ray
    from ray.data import DataContext

    from georay.ops.window import running_stats

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    tab = make_input(n_keys)
    ds = ray.data.from_arrow(tab).repartition(8).materialize()
    key = ["k", "oid"]

    def run(plan):
        t0 = time.perf_counter()
        out = plan().to_pandas()
        return time.perf_counter() - t0, out

    t_new = min(run(lambda: running_stats(ds, "k", "us", "oid", "v"))[0]
                for _ in range(3))
    t_old, out_old = run(lambda: per_key_plan(ds))
    _, out_new = run(lambda: running_stats(ds, "k", "us", "oid", "v"))
    a = out_old.sort_values(key).reset_index(drop=True)
    b = out_new.sort_values(key).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)
    print(f"n_keys={n_keys} (2 rows each)")
    print(f"per_key  map_groups: {t_old:8.2f} s  (single run — it is slow)")
    print(f"bucketed map_groups: {t_new:8.2f} s  (best of 3)")
    print(f"speedup: {t_old / t_new:.1f}x  (identical output)")
    ray.shutdown()


if __name__ == "__main__":
    main()
