"""Point-in-polygon assignment stage (SURVEY.md N3).

The polygon set (with its cell-cover candidate index) is broadcast ONCE via
``ray.put``; compute runs either as stateless tasks with a per-worker-process
cache of the materialized index (default — packs elastically with the other
stages), or as a dedicated actor pool (pass ``concurrency``) when the index
is heavy enough to warrant reserved executors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay.geometry import PolygonSet


def pip_assign(
    points_ds,
    poly_ids,
    rings,
    bits: int = 12,
    keep_cols: list[str] | None = None,
    poly_id_col: str = "poly_id",
    concurrency=None,
    backend: str = "cells",
    anti: bool = False,
):
    """Inner-join points to the polygons strictly containing them.

    ``rings``: list of (lon_array, lat_array) rings aligned with
    ``poly_ids``. Emits one row per (point, containing polygon) pair with the
    requested point columns plus ``poly_id_col``.

    ``anti=True`` is the spatial ANTI join: emits the points contained in NO
    polygon (once each, without ``poly_id_col``) — the "outside every zone"
    filter. Same broadcast index, batch-local complement, still no shuffle.
    """
    import ray

    polyset_ref = ray.put(PolygonSet(poly_ids, rings, bits=bits, backend=backend))
    key = polyset_ref.hex()

    def assign(polyset, t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        p_idx, g_idx = polyset.contains(lon, lat)
        cols_src = t if keep_cols is None else t.select(keep_cols)
        if anti:
            mask = np.ones(t.num_rows, dtype=bool)
            mask[p_idx] = False  # a point in 2+ polygons is listed 2+ times
            return cols_src.filter(pa.array(mask))
        base = cols_src.take(pa.array(p_idx))
        ids = np.asarray(polyset.poly_ids)[g_idx]
        return base.append_column(poly_id_col, pa.array(ids))

    if concurrency is None:
        from georay.runtime import per_process

        def fn(t: pa.Table) -> pa.Table:
            # LRU-capped per-process cache (one entry per broadcast ref)
            polyset = per_process(key, lambda: ray.get(polyset_ref))
            return assign(polyset, t)

        return points_ds.map_batches(fn, batch_format="pyarrow")

    class PipAssign:
        def __init__(self):
            self.polyset = ray.get(polyset_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return assign(self.polyset, t)

    return points_ds.map_batches(
        PipAssign, batch_format="pyarrow", concurrency=concurrency
    )
