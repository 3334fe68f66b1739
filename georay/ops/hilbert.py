"""Hilbert space-filling-curve keys — locality-preserving cell ordering.

Why a second curve next to the Morton codec: Morton (Z-order) has long
diagonal jumps, so consecutive key ranges can span distant cells; the
Hilbert curve's consecutive indices are ALWAYS 4-adjacent grid neighbors,
which makes key-range partitions spatially compact. At 100 TB that is the
difference between a range partition touching one city block and one
touching two hemispheres: sorting/range-partitioning a point table by
Hilbert key gives each output partition a tight bounding box, so
downstream spatial joins and kNN probes prune far more partitions.

Algorithm: the standard rotate/reflect per-level walk (public domain,
as described on the Wikipedia "Hilbert curve" page), vectorized with
numpy over int64 arrays — ``order`` iterations of O(n) boolean masking,
no Python per-row work. The same loop is unrolled verbatim as a SQL CTE
chain in queries.py's ``hilbert_order`` oracle.

SURVEY.md §2 context: extends the S/I codec family (curve keys over the
same floor-grid (x, y) from codec.xy_from_lonlat).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay import codec


def hilbert_from_xy(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Grid (x, y) in [0, 2^order)² → Hilbert index d in [0, 4^order).

    ``order`` ≤ 31 (d fits int64). Vectorized: per level, the quadrant
    contributes s²·((3·rx) XOR ry) and the lower bits are rotated into the
    quadrant's frame (flip both axes when rx=1 ∧ ry=0, then swap axes
    whenever ry=0).
    """
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(x.shape, dtype=np.int64)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        rot = ry == 0
        flip = rot & (rx == 1)
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        tmp = x[rot].copy()
        x[rot] = y[rot]
        y[rot] = tmp
        s >>= 1
    return d


def xy_from_hilbert(d: np.ndarray, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_from_xy` (bottom-up level walk)."""
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros(t.shape, dtype=np.int64)
    y = np.zeros(t.shape, dtype=np.int64)
    s = np.int64(1)
    top = np.int64(1 << order)
    while s < top:
        rx = (t >> 1) & 1
        ry = (t ^ rx) & 1
        rot = ry == 0
        flip = rot & (rx == 1)
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        tmp = x[rot].copy()
        x[rot] = y[rot]
        y[rot] = tmp
        x += s * rx
        y += s * ry
        t >>= 2
        s <<= 1
    return x, y


def hilbert_from_lonlat(lon, lat, bits: int) -> np.ndarray:
    """lon/lat → Hilbert key at an EVEN bit precision (square grid:
    order = bits/2 per axis, same floor grid as the Morton codec)."""
    if bits % 2:
        raise ValueError("Hilbert keys need a square grid — use even bits")
    x, y = codec.xy_from_lonlat(lon, lat, bits)
    return hilbert_from_xy(x, y, bits // 2)


def add_hilbert_key(
    t: pa.Table, bits: int, lon_col: str = "lon", lat_col: str = "lat",
    key_col: str = "hkey",
) -> pa.Table:
    """map_batches stage: append the Hilbert key column."""
    lon = t[lon_col].to_numpy(zero_copy_only=False)
    lat = t[lat_col].to_numpy(zero_copy_only=False)
    return t.append_column(key_col, pa.array(hilbert_from_lonlat(lon, lat, bits)))


def hilbert_sort(ds, bits: int, lon_col: str = "lon", lat_col: str = "lat"):
    """Range-partition a point Dataset along the Hilbert curve.

    ``ds.sort`` is ONE all-to-all exchange whose output blocks are
    contiguous key ranges — i.e. spatially compact regions. The hkey
    column is kept so downstream stages can derive per-block bounding
    boxes (min/max hkey → cell range) for partition pruning.
    """

    def stage(t: pa.Table) -> pa.Table:
        return add_hilbert_key(t, bits, lon_col, lat_col)

    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True).sort("hkey")
