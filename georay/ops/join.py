"""Cell-keyed spatial equi-joins (SURVEY.md §2.5 N4).

Two physical strategies, chosen by side size:

- :func:`broadcast_cell_join` — the small side is ``ray.put`` ONCE as sorted
  numpy arrays; every map_batches task binary-searches it per batch. No
  shuffle at all; the right choice whenever one side fits in a worker heap
  (dimension tables, tile sets). This is the 100 TB-scale default for
  point×polygon-table joins.
- :func:`shuffle_cell_join` — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (all-to-all exchange on the cell key). Use
  ``georay.runtime.salt_hot_keys`` first when the key distribution is
  skewed (dense urban cells).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay.runtime import check_saltable


class _SortedLookup:
    """Immutable sorted-key multimap over a pyarrow table, built once."""

    def __init__(self, table: pa.Table, key_col: str):
        keys = table[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.table = table.take(pa.array(order))

    def match(self, probe: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(probe_idx, right_row_idx) pairs for every key match — vectorized
        range-expand, no Python row loop."""
        lo = np.searchsorted(self.keys, probe, side="left")
        hi = np.searchsorted(self.keys, probe, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        probe_idx = np.repeat(np.arange(probe.shape[0]), counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        right_idx = np.arange(total) - starts + np.repeat(lo, counts)
        return probe_idx, right_idx


def broadcast_cell_join(
    left_ds,
    right_table: pa.Table,
    on: str = "cell",
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    concurrency=None,
):
    """Inner equi-join: big Dataset × small in-memory table, broadcast once.

    ``right_table`` is shipped to the object store a single time via
    ``ray.put``; each worker process materializes the sorted lookup once
    (per-process cache) — stateless tasks by default, or an actor pool when
    ``concurrency`` is given.
    """
    import ray

    from georay.runtime import per_process

    right_on = right_on or on
    if right_cols is not None:
        keep = list(dict.fromkeys([right_on] + right_cols))
        right_table = right_table.select(keep)
    right_ref = ray.put(right_table)
    key = right_ref.hex()

    def join_batch(lookup: _SortedLookup, t: pa.Table) -> pa.Table:
        if left_cols is not None:
            t = t.select(list(dict.fromkeys([on] + left_cols)))
        probe = t[on].to_numpy(zero_copy_only=False)
        li, ri = lookup.match(probe)
        left_part = t.take(pa.array(li))
        right_part = lookup.table.take(pa.array(ri))
        cols = {name: left_part[name] for name in left_part.column_names}
        for name in right_part.column_names:
            if name == right_on and right_on == on:
                continue
            out_name = name if name not in cols else f"{name}_r"
            cols[out_name] = right_part[name]
        return pa.table(cols)

    if concurrency is None:

        def fn(t: pa.Table) -> pa.Table:
            lookup = per_process(
                key, lambda: _SortedLookup(ray.get(right_ref), right_on)
            )
            return join_batch(lookup, t)

        return left_ds.map_batches(fn, batch_format="pyarrow")

    class Joiner:
        def __init__(self):
            self.lookup = _SortedLookup(ray.get(right_ref), right_on)

        def __call__(self, t: pa.Table) -> pa.Table:
            return join_batch(self.lookup, t)

    return left_ds.map_batches(
        Joiner, batch_format="pyarrow", concurrency=concurrency
    )


def shuffle_cell_join(
    left_ds,
    right_ds,
    on: str = "cell",
    num_partitions: int = 32,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    join_type: str = "inner",
):
    """Equi-join of two large Datasets: Ray Data hash shuffle join.

    ``join_type``: inner / left_outer / right_outer / full_outer."""
    if left_cols is not None:
        left_ds = left_ds.select_columns(list(dict.fromkeys([on] + left_cols)))
    if right_cols is not None:
        right_ds = right_ds.select_columns(list(dict.fromkeys([on] + right_cols)))
    return left_ds.join(
        right_ds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_suffix="_r",
    )


def salted_shuffle_join(
    left_ds,
    right_ds,
    hot_keys,
    on: str = "cell",
    n_salt: int = 8,
    num_partitions: int = 32,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
):
    """Skew-hardened hash join (SURVEY.md §4 skew row): hot join keys are
    salted on the LEFT (rows spread over ``key*n_salt + salt`` sub-keys) and
    REPLICATED ``n_salt``× on the RIGHT, so a dense cell's rows land on
    ``n_salt`` reducers instead of one. Cold keys map to ``key*n_salt``
    unchanged. Output rows carry the original (unsalted) key — row counts
    are exactly those of the plain join.
    """
    import numpy as np

    hot = np.sort(np.unique(np.asarray(hot_keys)))

    if left_cols is not None:
        left_ds = left_ds.select_columns(list(dict.fromkeys([on] + left_cols)))
    if right_cols is not None:
        right_ds = right_ds.select_columns(list(dict.fromkeys([on] + right_cols)))


    def replicate_right(t: pa.Table) -> pa.Table:
        key = t[on].to_numpy(zero_copy_only=False)
        check_saltable(key, n_salt)
        is_hot = np.isin(key, hot)
        # cold rows once at salt 0; hot rows replicated across all salts
        reps = np.where(is_hot, n_salt, 1)
        idx = np.repeat(np.arange(key.shape[0]), reps)
        base = t.take(pa.array(idx))
        # vectorized 0..r-1 per row (range-expand idiom, no Python loop)
        total = int(reps.sum())
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        salts = np.arange(total, dtype=np.int64) - starts
        salted = key[idx] * n_salt + salts
        return base.append_column("_sk", pa.array(salted))

    from georay.runtime import salt_hot_keys

    joined = (
        salt_hot_keys(left_ds, on, hot, n_salt=n_salt, salted_col="_sk")
        .join(
            right_ds.map_batches(replicate_right, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("_sk",),
            left_suffix="_l",
            right_suffix="_r",
        )
    )

    def unsalt(t: pa.Table) -> pa.Table:
        drop = [c for c in ("_sk", f"{on}_r") if c in t.column_names]
        out = t.drop_columns(drop)
        if f"{on}_l" in out.column_names:
            out = out.rename_columns(
                [on if c == f"{on}_l" else c for c in out.column_names]
            )
        return out

    return joined.map_batches(unsalt, batch_format="pyarrow")


def broadcast_semi_join(ds, keys, on: str, anti: bool = False):
    """Semi / anti join: the key SET is broadcast once (ray.put) and each
    batch filters with a sorted-array membership test — no shuffle. At the
    10^12 scale the set becomes a Bloom filter with the same stage shape."""
    import numpy as np
    import ray

    keys_ref = ray.put(np.sort(np.unique(np.asarray(keys))))

    def fn(t: pa.Table) -> pa.Table:
        kset = ray.get(keys_ref)
        probe = t[on].to_numpy(zero_copy_only=False)
        if kset.size == 0:  # empty key set: semi -> nothing, anti -> all
            hit = np.zeros(probe.shape[0], dtype=bool)
        else:
            pos = np.clip(np.searchsorted(kset, probe), 0, kset.size - 1)
            hit = kset[pos] == probe
        keep = ~hit if anti else hit
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
