"""Synthetic capture coordinates + cell-column stages.

The deterministic lon/lat synthesis formulas are the contract shared verbatim
with the DuckDB oracle SQL (FIXTURES.md F1/F4): identical float64 expression
order on both sides makes cell assignments bit-exact comparable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay import codec

HASH_LON = 2654435761
HASH_LAT = 40503


def synth_lonlat(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic lon/lat from an integer key (engine side of the shared
    formula; SQL side: :func:`sql_lon` / :func:`sql_lat`)."""
    key = np.asarray(key, dtype=np.int64)
    lon = ((key * HASH_LON) % 360000) / 1000.0 - 180.0
    lat = ((key * HASH_LAT) % 180000) / 1000.0 - 90.0
    return lon, lat


def sql_lon(col: str) -> str:
    return f"((({col}) * {HASH_LON}) % 360000) / 1000.0 - 180.0"


def sql_lat(col: str) -> str:
    return f"((({col}) * {HASH_LAT}) % 180000) / 1000.0 - 90.0"


def sql_x(lon_expr: str, nx: int) -> str:
    """SQL floor-grid x, mirroring codec.xy_from_lonlat bit-exactly."""
    return f"CAST(FLOOR((({lon_expr}) + 180.0) / 360.0 * {float(1 << nx)!r}) AS BIGINT)"


def sql_y(lat_expr: str, ny: int) -> str:
    return f"CAST(FLOOR((({lat_expr}) + 90.0) / 180.0 * {float(1 << ny)!r}) AS BIGINT)"


def add_synth_points(t: pa.Table, key_col: str) -> pa.Table:
    """map_batches stage: add lon/lat columns derived from ``key_col``."""
    key = t[key_col].to_numpy(zero_copy_only=False)
    lon, lat = synth_lonlat(key)
    return t.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))


def add_cell(t: pa.Table, bits: int, cell_col: str = "cell") -> pa.Table:
    """map_batches stage: add the canonical uint64 Morton cell (as int64
    for Arrow/DuckDB friendliness — bit pattern preserved, bits<=62 here)."""
    lon = t["lon"].to_numpy(zero_copy_only=False)
    lat = t["lat"].to_numpy(zero_copy_only=False)
    cell = codec.encode(lon, lat, bits)
    return t.append_column(cell_col, pa.array(cell.astype(np.int64)))


def add_cell_xy(t: pa.Table, bits: int, prefix: str = "c") -> pa.Table:
    """map_batches stage: add (x, y) grid columns (the SQL-comparable view
    of the Morton cell — bijective with it, SURVEY.md §5.6)."""
    lon = t["lon"].to_numpy(zero_copy_only=False)
    lat = t["lat"].to_numpy(zero_copy_only=False)
    x, y = codec.xy_from_lonlat(lon, lat, bits)
    return t.append_column(f"{prefix}x", pa.array(x)).append_column(
        f"{prefix}y", pa.array(y)
    )


def points_with_cells(ds, key_col: str, bits: int, xy: bool = True, cell: bool = True):
    """Dataset pipeline: key → synthetic point → cell columns."""

    def fn(t: pa.Table) -> pa.Table:
        t = add_synth_points(t, key_col)
        if cell:
            t = add_cell(t, bits)
        if xy:
            t = add_cell_xy(t, bits)
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
