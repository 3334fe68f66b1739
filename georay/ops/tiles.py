"""Raster-tile ↔ vector assignment (SURVEY.md §2.5 N6, X9).

A tile is a coarse cell prefix of the canonical Morton code. Aggregation is
two-phase to keep the all-to-all exchange small at scale: per-batch partial
counts inside ``map_batches`` (one row per distinct tile per batch), then a
tiny ``groupby(tile).sum`` over the partials — the shuffle moves O(tiles ×
batches) rows, never O(input rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay import codec


def tile_counts(ds, bits: int, cell_col: str = "cell", cell_bits: int | None = None,
                combine_partitions: int = 16):
    """Per-tile row counts. ``cell_bits`` set → cells are re-prefixed from a
    finer precision (tile = cell >> (cell_bits - bits)); else cells are
    already at tile precision. Output: ``tile_x, tile_y, n`` (SQL-comparable
    grid coords, bijective with the tile Morton code)."""
    from ray.data.aggregate import Sum

    shift = 0 if cell_bits is None else cell_bits - bits

    def partial(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if shift:
            cell = cell >> np.uint64(shift)
        tiles, counts = np.unique(cell, return_counts=True)
        return pa.table(
            {"tile": tiles.astype(np.int64), "partial_n": counts.astype(np.int64)}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)  # coalesce tiny partial blocks:
        # the sort-based shuffle cost scales with block count, not rows
        .groupby("tile")
        .aggregate(Sum("partial_n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        tile = t["tile"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x, y = codec.deinterleave(tile, bits)
        return pa.table({"tile_x": x, "tile_y": y, "n": t["n"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


def count_by(ds, col: str, out_col: str = "n", combine_partitions: int = 16):
    """Generic two-phase count-by-key (works for string keys like tile_id):
    per-batch partial counts, then a tiny groupby-sum over partials."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(arr, return_counts=True)
        return pa.table({col: keys, "partial_n": counts.astype(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby(col)
        .aggregate(Sum("partial_n", alias_name=out_col))
    )


def tile_aggregate(ds, bits: int, value_col: str, cell_col: str = "cell",
                   combine_partitions: int = 16):
    """Per-tile (count, int-sum) aggregate with the same partial/combine
    shape. ``value_col`` must be integer-valued (callers pre-scale floats to
    ints for order-independent exactness)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tiles, inverse, counts = np.unique(cell, return_inverse=True, return_counts=True)
        sums = np.zeros(tiles.size, dtype=np.int64)
        np.add.at(sums, inverse, val)
        return pa.table(
            {
                "tile": tiles.astype(np.int64),
                "partial_n": counts.astype(np.int64),
                "partial_sum": sums,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby("tile")
        .aggregate(Sum("partial_n", alias_name="n"), Sum("partial_sum", alias_name="sum_val"))
    )


def assemble_raster(ds, bits: int, value_col: str = "n", tile_bits: int = 6):
    """Raster assembly (reference ``to_xarray`` parity, SURVEY.md §2.4 X9):
    pivot cell-keyed values into dense per-tile 2-D grids. Each output row is
    one coarse tile: ``tile, x0, y0, h, w, values`` (row-major flattened
    dense grid, missing cells = 0). Groups shuffle on the coarse tile prefix
    so each dense block assembles locally."""
    import pandas as pd

    fine_per_tile = bits - tile_bits

    def add_tile(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "tile", pa.array((cell >> np.uint64(fine_per_tile)).astype(np.int64))
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].to_numpy().astype(np.uint64)
        val = g[value_col].to_numpy()
        x, y = codec.deinterleave(cell, bits)
        x0, y0 = int(x.min()), int(y.min())
        h, w = int(y.max()) - y0 + 1, int(x.max()) - x0 + 1
        grid = np.zeros((h, w), dtype=np.float64)
        grid[y - y0, x - x0] = val
        return pd.DataFrame(
            {
                "tile": [int(g["tile"].iloc[0])],
                "x0": [x0],
                "y0": [y0],
                "h": [h],
                "w": [w],
                "values": [grid.reshape(-1)],
            }
        )

    return (
        ds.map_batches(add_tile, batch_format="pyarrow")
        .groupby("tile")
        .map_groups(assemble, batch_format="pandas")
    )


def pyramid_counts(ds, bits: int, levels: int, cell_col: str = "cell",
                   cell_bits: int | None = None, combine_partitions: int = 16):
    """Zoom-pyramid tile counts in ONE pass (web-map tile pyramid: level 0
    is the base ``bits`` precision, each next level halves both axes — the
    2-bit Morton parent). Per batch the base partial counts are computed
    once with ``np.unique``, then every coarser level's partials derive
    from the previous level's UNIQUE tiles (work per extra level is
    O(distinct tiles), not O(rows)); a single ``groupby((level, tile))``
    over all partials finishes the pyramid — one shuffle for all levels,
    not one per level. Output: ``level, tile_x, tile_y, n``."""
    from ray.data.aggregate import Sum

    if 2 * (levels - 1) >= bits:
        raise ValueError("levels exceed the cell hierarchy depth")
    shift = 0 if cell_bits is None else cell_bits - bits

    def partial(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if shift:
            cell = cell >> np.uint64(shift)
        tiles, counts = np.unique(cell, return_counts=True)
        counts = counts.astype(np.int64)
        out_lvl, out_tile, out_n = [], [], []
        for lvl in range(levels):
            out_lvl.append(np.full(tiles.size, lvl, dtype=np.int64))
            out_tile.append(tiles.astype(np.int64))
            out_n.append(counts)
            if lvl + 1 < levels:
                parents = tiles >> np.uint64(2)
                up, inv = np.unique(parents, return_inverse=True)
                sums = np.zeros(up.size, dtype=np.int64)
                np.add.at(sums, inv, counts)
                tiles, counts = up, sums
        return pa.table(
            {
                "level": np.concatenate(out_lvl),
                "tile": np.concatenate(out_tile),
                "partial_n": np.concatenate(out_n),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby(["level", "tile"])
        .aggregate(Sum("partial_n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        lvl = t["level"].to_numpy(zero_copy_only=False)
        tile = t["tile"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = np.empty(tile.size, dtype=np.int64)
        y = np.empty(tile.size, dtype=np.int64)
        for b in np.unique(lvl):
            sel = lvl == b
            xb, yb = codec.deinterleave(tile[sel], bits - 2 * int(b))
            x[sel], y[sel] = xb, yb
        return pa.table(
            {"level": pa.array(lvl), "tile_x": pa.array(x),
             "tile_y": pa.array(y), "n": t["n"]}
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def focal_sum(raster_ds, bits: int, cell_col: str = "cell",
              value_col: str = "n", combine_partitions: int = 8,
              num_partitions: int | None = None):
    """3×3 k-ring focal (neighborhood) sum over an aggregated raster.

    Scatter-gather formulation: every occupied cell SCATTERS its value to
    itself + its 8 neighbors (codec.neighbors semantics — longitude wraps
    at the antimeridian, latitude clamps at the poles, off-grid neighbors
    dropped), contributions partial-combine per batch, one small
    ``groupby(cell).sum`` gathers them, and an inner hash join back to the
    occupied set restricts output to occupied cells (windows centred on
    empty cells are not emitted). Because the 3×3 ring is symmetric,
    scattering equals gathering — no second neighbor pass.

    The exchange is O(occupied cells × 9) rows pre-combined down to
    O(distinct touched cells × batches) — never O(input points); run this
    AFTER a tile/count aggregate, not on raw points.

    Output: ``cell_col, value_col, focal_sum, n_nb`` (n_nb counts the
    occupied cells in the window, for a mean = focal_sum / n_nb).
    """
    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    from ray.data.aggregate import Sum

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr, valid = codec.neighbors(cell, bits)
        parts_c = [cell]
        parts_v = [val]
        for j in range(8):
            ok = valid[:, j]
            parts_c.append(nbr[ok, j])
            parts_v.append(val[ok])
        tgt = np.concatenate(parts_c)
        contrib = np.concatenate(parts_v)
        u, inv = np.unique(tgt, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, contrib)
        c = np.bincount(inv, minlength=u.size).astype(np.int64)
        return pa.table(
            {cell_col: u.astype(np.int64), "p_sum": s, "p_cnt": c}
        )

    gathered = (
        raster_ds.map_batches(scatter, batch_format="pyarrow",
                              zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby(cell_col)
        .aggregate(Sum("p_sum", alias_name="focal_sum"),
                   Sum("p_cnt", alias_name="n_nb"))
        # merge aggregate output blocks: combine partitions exceeding the
        # group count emit SCHEMA-LESS empty blocks that Acero (the join
        # below) rejects (CLAUDE.md invariant)
        .repartition(num_partitions)
    )

    return raster_ds.join(
        gathered,
        join_type="inner",
        num_partitions=num_partitions,
        on=(cell_col,),
        right_suffix="_r",
    )


def zonal_stats(ds, zone_col: str, value_col: str, combine_partitions: int = 4):
    """Per-zone (count, sum, min, max) of an INTEGER value column — zonal
    statistics over any zone key (polygon id from ``ops.pip.pip_assign``,
    tile prefix, admin code). Two-phase: each batch collapses to one row
    per distinct zone (np.unique + bincount/add.at/minimum.at), so only
    O(zones × batches) partial rows reach the exchange; integer sums make
    the result order-independent (callers pre-scale floats, as everywhere
    in this repo). Output: zone_col, n, sum_v, min_v, max_v."""
    from ray.data.aggregate import Max, Min, Sum

    s = ds.schema()  # Ray Data Schema: parallel .names / .types (pa types)
    zone_type = dict(zip(s.names, s.types))[zone_col]

    partial_schema = pa.schema(
        [
            (zone_col, zone_type),
            ("partial_n", pa.int64()),
            ("partial_sum", pa.int64()),
            ("partial_min", pa.int64()),
            ("partial_max", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        zones = t[zone_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uz, inv, counts = np.unique(zones, return_inverse=True, return_counts=True)
        sums = np.zeros(uz.size, dtype=np.int64)
        np.add.at(sums, inv, vals)
        mins = np.full(uz.size, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, vals)
        maxs = np.full(uz.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(maxs, inv, vals)
        return pa.table(
            {
                zone_col: pa.array(uz, zone_type),
                "partial_n": pa.array(counts.astype(np.int64)),
                "partial_sum": pa.array(sums),
                "partial_min": pa.array(mins),
                "partial_max": pa.array(maxs),
            },
            schema=partial_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby(zone_col)
        .aggregate(
            Sum("partial_n", alias_name="n"),
            Sum("partial_sum", alias_name="sum_v"),
            Min("partial_min", alias_name="min_v"),
            Max("partial_max", alias_name="max_v"),
        )
    )


def hotspot_gi(ds, bits: int, cell_col: str = "cell",
               combine_partitions: int = 8, num_partitions: int | None = None):
    """Getis-Ord Gi* hot-spot z-score per OCCUPIED cell over a 3×3 queen
    neighborhood (the cell-grid form of the classic spatial hot-spot
    statistic, computed over the set of occupied cells).

    Definitions (chosen integer-first so an SQL oracle replays bit-exactly):
    with n_c the per-cell count, K the number of occupied cells,
    W_c = |occupied 3×3 ∩ occupied| (incl. self), S_c = Σ n over that set,
    sum_x = Σ n, sum_x2 = Σ n² —

        gi_z = (S - mean·W) / ((√(K·sum_x2 − sum_x²) / K) · √((K·W − W²)/(K−1)))

    where mean = sum_x/K. The variance and slack numerators stay EXACT
    INTEGERS (no float cancellation → no NaN from √(negative)); degenerate
    branches (W = K, or zero variance) emit 0.0 via an integer-exact CASE.

    Plan: two-phase per-cell counts (only (cell, partial) rows shuffle) →
    9-way neighbor explode of the COUNTS table (O(occupied·9) rows, not
    O(points)) → Sum groupby → inner join back to the counts (drops
    never-occupied targets) → one vectorized map with the three global
    scalars closed over (bounded driver pull: one partial row per counts
    block). Output: ``tile_x, tile_y, n, gi_z``.
    """
    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    from ray.data.aggregate import Sum

    from georay import codec

    half = bits // 2
    size = np.int64(1 << half)

    def partial(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        cells, counts = np.unique(cell, return_counts=True)
        return pa.table({"cell": cells.astype(np.int64),
                         "partial_n": counts.astype(np.int64)})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby("cell")
        .aggregate(Sum("partial_n", alias_name="n"))
        .repartition(num_partitions)  # merge blocks: Acero join below
        # rejects schema-less empties (CLAUDE.md invariant)
        .materialize()  # consumed 3×: scalars, explode, join-back
    )

    def sc_partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([np.int64(n.size)]),
            "sum_x": pa.array([n.sum(dtype=np.int64)]),
            "sum_x2": pa.array([(n * n).sum(dtype=np.int64)]),
        })

    st = counts.map_batches(
        sc_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas().sum()  # bounded: one row per counts block
    k_i = np.int64(st["k"])
    sum_x, sum_x2 = np.int64(st["sum_x"]), np.int64(st["sum_x2"])
    var_i = k_i * sum_x2 - sum_x * sum_x  # exact integer ≥ 0
    kf = float(k_i)
    mean = float(sum_x) / kf
    s_over_k = np.sqrt(float(var_i)) / kf

    def explode(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = t["n"].to_numpy(zero_copy_only=False)
        x, y = codec.deinterleave(cell, bits)
        x = x.astype(np.int64)
        y = y.astype(np.int64)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = x + dx, y + dy
                ok = (tx >= 0) & (tx < size) & (ty >= 0) & (ty < size)
                tgt = codec.interleave(
                    tx[ok].astype(np.uint64), ty[ok].astype(np.uint64), bits
                ).astype(np.int64)
                outs.append(pa.table({
                    "cell": tgt,
                    "w_part": np.ones(tgt.size, np.int64),
                    "s_part": n[ok],
                }))
        return pa.concat_tables(outs)

    nb = (
        counts.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby("cell")
        .aggregate(Sum("w_part", alias_name="w"), Sum("s_part", alias_name="s"))
        .repartition(num_partitions)
    )

    joined = nb.join(counts, join_type="inner",
                     num_partitions=num_partitions, on=("cell",))

    def z_rows(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x, y = codec.deinterleave(cell, bits)
        w = t["w"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        kw = k_i * w - w * w  # exact integer
        z = np.zeros(t.num_rows, np.float64)
        live = (kw > 0) & (var_i > 0)
        if live.any():
            wf = w[live].astype(np.float64)
            sf = s[live].astype(np.float64)
            z[live] = (sf - mean * wf) / (
                s_over_k * np.sqrt(kw[live].astype(np.float64) / (kf - 1.0))
            )
        return pa.table({
            "tile_x": x.astype(np.int64), "tile_y": y.astype(np.int64),
            "n": t["n"], "gi_z": pa.array(z),
        })

    return joined.map_batches(z_rows, batch_format="pyarrow",
                              zero_copy_batch=True)


def adaptive_cells(ds, bits: int, levels: int, threshold: int,
                   cell_col: str = "cell", combine_partitions: int = 16,
                   num_partitions: int | None = None):
    """Skew-adaptive quadtree leaves: split every cell holding more than
    ``threshold`` points into its 4 Morton children, down to at most
    ``bits`` precision — the partitioning primitive that turns dense urban
    geohashes into more, smaller partitions while sparse ocean stays
    coarse. Every input point lands in EXACTLY ONE leaf.

    Leaf rule (closed-form, no iteration — ancestor counts are monotone,
    so ``parent_n > threshold`` already implies every higher ancestor
    split): at the coarsest level a cell is a leaf iff ``n <= threshold``;
    at middle levels iff ``n <= threshold AND parent_n > threshold``; at
    the finest level iff ``parent_n > threshold`` (forced leaf).

    Plan: the one-pass pyramid partial (per-batch ``np.unique`` then
    O(distinct) parent roll-ups) → ONE groupby over all levels → a single
    self-join child→parent → filters. No driver-side hot-key collection:
    the leaf decision is distributed. Output: ``cell_bits, tile_x, tile_y,
    n`` (leaf precision in bits, grid coords at that precision).
    """
    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    from ray.data.aggregate import Sum

    from georay import codec

    if 2 * (levels - 1) >= bits:
        raise ValueError("levels exceed the cell hierarchy depth")
    coarsest = levels - 1

    def partial(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        tiles_u, counts = np.unique(cell, return_counts=True)
        counts = counts.astype(np.int64)
        out_lvl, out_tile, out_n = [], [], []
        for lvl in range(levels):
            out_lvl.append(np.full(tiles_u.size, lvl, dtype=np.int64))
            out_tile.append(tiles_u.astype(np.int64))
            out_n.append(counts)
            if lvl + 1 < levels:
                parents = tiles_u >> np.uint64(2)
                up, inv = np.unique(parents, return_inverse=True)
                sums = np.zeros(up.size, dtype=np.int64)
                np.add.at(sums, inv, counts)
                tiles_u, counts = up, sums
        return pa.table({
            "level": np.concatenate(out_lvl),
            "tile": np.concatenate(out_tile),
            "partial_n": np.concatenate(out_n),
        })

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby(["level", "tile"])
        .aggregate(Sum("partial_n", alias_name="n"))
        .repartition(num_partitions)  # merge blocks before the Acero join
        .materialize()  # consumed twice: child side + parent side
    )

    def child_side(t: pa.Table) -> pa.Table:
        lvl = t["level"].to_numpy(zero_copy_only=False)
        tile = t["tile"].to_numpy(zero_copy_only=False)
        keep = lvl < coarsest
        return pa.table({
            "level": lvl[keep], "tile": tile[keep],
            "n": t["n"].to_numpy(zero_copy_only=False)[keep],
            "p_level": lvl[keep] + 1,
            "p_tile": (tile[keep].astype(np.uint64)
                       >> np.uint64(2)).astype(np.int64),
        })

    def parent_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_level": t["level"], "p_tile": t["tile"], "p_n": t["n"],
        })

    children = counts.map_batches(child_side, batch_format="pyarrow",
                                  zero_copy_batch=True)
    parents = counts.map_batches(parent_side, batch_format="pyarrow",
                                 zero_copy_batch=True)
    joined = children.join(parents, join_type="inner",
                           num_partitions=num_partitions,
                           on=("p_level", "p_tile"))

    def leaf_mid(t: pa.Table) -> pa.Table:
        lvl = t["level"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        p_n = t["p_n"].to_numpy(zero_copy_only=False)
        keep = (p_n > threshold) & ((lvl == 0) | (n <= threshold))
        return pa.table({"level": lvl[keep],
                         "tile": t["tile"].to_numpy(zero_copy_only=False)[keep],
                         "n": n[keep]})

    def leaf_top(t: pa.Table) -> pa.Table:
        lvl = t["level"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        keep = (lvl == coarsest) & (n <= threshold)
        return pa.table({"level": lvl[keep],
                         "tile": t["tile"].to_numpy(zero_copy_only=False)[keep],
                         "n": n[keep]})

    leaves = joined.map_batches(
        leaf_mid, batch_format="pyarrow", zero_copy_batch=True
    ).union(counts.map_batches(
        leaf_top, batch_format="pyarrow", zero_copy_batch=True))

    def finalize(t: pa.Table) -> pa.Table:
        lvl = t["level"].to_numpy(zero_copy_only=False)
        tile = t["tile"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = np.empty(tile.size, dtype=np.int64)
        y = np.empty(tile.size, dtype=np.int64)
        for b in np.unique(lvl):
            sel = lvl == b
            xb, yb = codec.deinterleave(tile[sel], bits - 2 * int(b))
            x[sel], y[sel] = xb, yb
        return pa.table({
            "cell_bits": pa.array(bits - 2 * lvl),
            "tile_x": pa.array(x), "tile_y": pa.array(y), "n": t["n"],
        })

    return leaves.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def tile_trend(ds, cell_col: str = "cell", x_col: str = "x", y_col: str = "y",
               combine_partitions: int = 16):
    """Per-tile OLS trend (least-squares slope of integer ``y`` against
    integer ``x``), with EXACT integer moments: per-batch partials
    accumulate (n, Σx, Σy, Σxy, Σx²) as int64 via one ``np.add.at`` pass,
    a single Sum groupby merges them (order-independent), and the closed
    form ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` is evaluated on the
    small per-tile result in arbitrary-precision Python ints before ONE
    float division — bit-identical to an SQL twin using HUGEINT products.
    Degenerate tiles (all x equal) emit slope 0.0 via an integer branch.

    Caller contract: x and y pre-scaled so per-batch Σ|x·y| fits int64
    (e.g. hours × milli-units). Output: ``cell, n, slope``.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cells, inv, counts = np.unique(cell, return_inverse=True,
                                       return_counts=True)
        sums = np.zeros((cells.size, 4), dtype=np.int64)
        np.add.at(sums, inv, np.stack([x, y, x * y, x * x], axis=1))
        return pa.table({
            "cell": cells, "p_n": counts.astype(np.int64),
            "p_sx": sums[:, 0], "p_sy": sums[:, 1],
            "p_sxy": sums[:, 2], "p_sxx": sums[:, 3],
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby("cell")
        .aggregate(Sum("p_n", alias_name="n"), Sum("p_sx", alias_name="sx"),
                   Sum("p_sy", alias_name="sy"), Sum("p_sxy", alias_name="sxy"),
                   Sum("p_sxx", alias_name="sxx"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).tolist()
        sx = t["sx"].to_numpy(zero_copy_only=False).tolist()
        sy = t["sy"].to_numpy(zero_copy_only=False).tolist()
        sxy = t["sxy"].to_numpy(zero_copy_only=False).tolist()
        sxx = t["sxx"].to_numpy(zero_copy_only=False).tolist()
        slope = np.zeros(len(n), np.float64)
        for i in range(len(n)):  # small: one row per tile; python bigints
            den = n[i] * sxx[i] - sx[i] * sx[i]
            if den != 0:
                slope[i] = float(n[i] * sxy[i] - sx[i] * sy[i]) / float(den)
        return pa.table({"cell": t["cell"], "n": t["n"],
                         "slope": pa.array(slope)})

    return agg.map_batches(finalize, batch_format="pyarrow")


def variogram(raster_ds, bits: int, max_lag: int, cell_col: str = "cell",
              value_col: str = "n", combine_partitions: int = 8,
              num_partitions: int | None = None,
              vector_bins: bool = False, stat: str = "sq_diff"):
    """Empirical semivariogram of an aggregated raster: every unordered
    pair of OCCUPIED cells within Chebyshev distance ``max_lag`` is binned
    by squared Euclidean grid distance d² = dx²+dy² and contributes
    (vᵢ−vⱼ)² — all integers, so the statistic is exact under any
    execution order (γ(d²) = sq_sum / (2·n_pairs) is the caller's one
    float division).

    Plan (never O(cells²)): each cell SCATTERS its value to the half ring
    of lag offsets (dx > 0, or dx = 0 ∧ dy > 0 — each unordered pair has
    exactly one reporter, so no dedup shuffle exists), a hash join back to
    the raster lands contributions on occupied partners only, and the
    (d2, n, sq_sum) partials combine per batch before one tiny groupby.
    Exchange is O(occupied × ring/2) scatter rows + O(lags × batches)
    partial rows. Plain grid geometry — no longitude wrap: a variogram is
    a distance statistic, not a topology query.
    """
    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    from ray.data.aggregate import Sum

    nx_bits, ny_bits = codec.split_bits(bits)
    nx, ny = 1 << nx_bits, 1 << ny_bits
    offsets = [(dx, dy)
               for dx in range(0, max_lag + 1)
               for dy in range(-max_lag, max_lag + 1)
               if (dx > 0 or dy > 0) and dx * dx + dy * dy <= max_lag * max_lag]

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = codec.deinterleave(cell, bits)
        parts_c, parts_v, parts_d = [], [], []
        for dx, dy in offsets:
            tx = x.astype(np.int64) + dx
            ty = y.astype(np.int64) + dy
            ok = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
            parts_c.append(codec.interleave(
                tx[ok].astype(np.uint64), ty[ok].astype(np.uint64), bits))
            parts_v.append(val[ok])
            d_key = (dx * (2 * max_lag + 1) + dy + max_lag
                     if vector_bins else dx * dx + dy * dy)
            parts_d.append(np.full(int(ok.sum()), d_key, dtype=np.int64))
        return pa.table({
            cell_col: np.concatenate(parts_c).astype(np.int64),
            "src_v": np.concatenate(parts_v),
            "d2": np.concatenate(parts_d),
        })

    scattered = raster_ds.map_batches(
        scatter, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_partitions)

    landed = scattered.join(
        raster_ds.select_columns([cell_col, value_col])
        .repartition(num_partitions),
        join_type="inner", num_partitions=num_partitions, on=(cell_col,),
    )

    def partial(t: pa.Table) -> pa.Table:
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        a = t["src_v"].to_numpy(zero_copy_only=False)
        b = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # stat="sq_diff": Σ(vᵢ−vⱼ)² (semivariogram); "product": Σvᵢ·vⱼ
        # (the covariogram numerator — spatial autocovariance per lag)
        contrib = a * b if stat == "product" else (a - b) * (a - b)
        u, inv = np.unique(d2, return_inverse=True)
        n = np.bincount(inv, minlength=u.size).astype(np.int64)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, contrib)
        return pa.table({"d2": u, "p_n": n, "p_sq": s})

    agg = (
        landed.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .repartition(min(combine_partitions, 4))
        .groupby("d2")
        .aggregate(Sum("p_n", alias_name="n_pairs"),
                   Sum("p_sq", alias_name=(
                       "prod_sum" if stat == "product" else "sq_sum")))
        .repartition(1)  # few-group final: merge schema-less empty blocks
    )
    if not vector_bins:
        return agg

    def decode(t: pa.Table) -> pa.Table:
        # ``vector_bins`` packs the half-ring lag VECTOR (the variogram
        # map / anisotropy surface) instead of binning by d²
        k = t["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "dx": k // (2 * max_lag + 1),
            "dy": k % (2 * max_lag + 1) - max_lag,
            "n_pairs": t["n_pairs"],
            ("prod_sum" if stat == "product" else "sq_sum"):
                t["prod_sum" if stat == "product" else "sq_sum"],
        })

    return agg.map_batches(decode, batch_format="pyarrow")


def grid_bfs(raster_ds, bits: int, max_hops: int,
             cell_col: str = "cell", src_col: str = "n_src",
             num_partitions: int | None = None):
    """Multi-source BFS hop distance over OCCUPIED raster cells: sources
    are cells with ``src_col`` > 0 (hop 0); each round scatters the
    frontier to its queen 8-neighborhood (codec.neighbors — lon wrap, lat
    clamp) and keeps occupied targets only; after ``max_hops`` rounds one
    small groupby takes MIN(hop) per reached cell — bit-equal to
    first-reach semantics. The grid cost-distance primitive (raster
    proximity / catchment analysis).

    The occupied-cell set is bounded by the GRID (≤ 2^bits cells however
    large the input), so membership is a broadcast sorted array +
    searchsorted inside ``map_batches`` — no join, no all-to-all; the
    only data-sized work is the upstream raster aggregate. Frontiers are
    deduped and materialized per round (bounded), keeping the lazy plan
    one round deep.
    """
    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    import ray
    from ray.data.aggregate import Min

    # bounded driver collect: ≤ 2^bits cells by construction (to_pandas,
    # not to_arrow_refs — the latter intermittently trips the Ray core
    # reference_count CHECK on short-lived datasets, see BASELINE.md r3)
    occ_cells = np.sort(
        raster_ds.select_columns([cell_col]).to_pandas()[cell_col]
        .to_numpy())
    occ_ref = ray.put(occ_cells)

    def src(t: pa.Table) -> pa.Table:
        n = t[src_col].to_numpy(zero_copy_only=False)
        keep = n > 0
        cell = t[cell_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table({cell_col: cell,
                         "hop": np.zeros(cell.size, dtype=np.int64)})

    frontier = raster_ds.map_batches(
        src, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(1).materialize()
    reaches = [frontier]
    for hop in range(1, max_hops + 1):
        def scatter(t: pa.Table, _h=hop) -> pa.Table:
            occ = ray.get(occ_ref)
            cell = t[cell_col].to_numpy(
                zero_copy_only=False).astype(np.uint64)
            nbr, valid = codec.neighbors(cell, bits)
            tgt = np.unique(nbr[valid]).astype(np.int64)
            if occ.size:
                pos = np.minimum(np.searchsorted(occ, tgt), occ.size - 1)
                tgt = tgt[occ[pos] == tgt]
            else:
                tgt = tgt[:0]
            return pa.table({cell_col: tgt,
                             "hop": np.full(tgt.size, _h, dtype=np.int64)})

        frontier = frontier.map_batches(
            scatter, batch_format="pyarrow", zero_copy_batch=True
        ).repartition(1).materialize()
        reaches.append(frontier)

    all_reaches = reaches[0]
    for r in reaches[1:]:
        all_reaches = all_reaches.union(r)
    return (
        all_reaches.repartition(num_partitions)
        .groupby(cell_col)
        .aggregate(Min("hop", alias_name="hops"))
        .repartition(1)
    )


def kernel_convolve(raster_ds, bits: int, kernel, cell_col: str = "cell",
                    value_col: str = "n", combine_partitions: int = 8,
                    num_partitions: int | None = None):
    """Arbitrary integer-kernel raster convolution (focal_sum generalized):
    every occupied cell scatters ``value × weight`` to cell+(dx, dy) for
    each kernel tap, contributions partial-combine per batch, one small
    groupby gathers, and an inner join back to the occupied set restricts
    output (plain-grid clamp — out-of-range taps drop; no lon wrap, unlike
    focal_sum's neighbor semantics). ``kernel``: iterable of (dx, dy, w)
    integer taps. Exchange is O(occupied × taps) pre-combined rows.

    Output: ``cell_col, value_col, conv``.
    """
    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    from ray.data.aggregate import Sum

    taps = [(int(dx), int(dy), int(w)) for dx, dy, w in kernel]
    nx_bits, ny_bits = codec.split_bits(bits)
    nx, ny = 1 << nx_bits, 1 << ny_bits

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = codec.deinterleave(cell, bits)
        xi = x.astype(np.int64)
        yi = y.astype(np.int64)
        parts_c, parts_v = [], []
        for dx, dy, w in taps:
            tx, ty = xi + dx, yi + dy
            ok = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
            parts_c.append(codec.interleave(
                tx[ok].astype(np.uint64), ty[ok].astype(np.uint64), bits))
            parts_v.append(val[ok] * w)
        tgt = np.concatenate(parts_c).astype(np.int64)
        contrib = np.concatenate(parts_v)
        u, inv = np.unique(tgt, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, contrib)
        return pa.table({cell_col: u, "p_conv": s})

    gathered = (
        raster_ds.map_batches(scatter, batch_format="pyarrow",
                              zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby(cell_col)
        .aggregate(Sum("p_conv", alias_name="conv"))
        .repartition(num_partitions)  # merge empty blocks pre-join
    )
    return raster_ds.select_columns([cell_col, value_col]).repartition(
        num_partitions).join(
        gathered, join_type="inner", num_partitions=num_partitions,
        on=(cell_col,))


def flow_direction(raster_ds, bits: int, cell_col: str = "cell",
                   value_col: str = "n", combine_partitions: int = 8,
                   num_partitions: int | None = None):
    """D8 flow direction over an aggregated integer raster: every occupied
    cell drains to its LOWEST-value occupied 8-neighbor, provided that
    neighbor is strictly lower; ties break to the smallest compass index
    (codec.NEIGHBOR_ORDER, N=0 … NW=7); cells with no strictly-lower
    occupied neighbor (or no occupied neighbor at all) are pits (dir −1).
    Neighbor semantics are the engine's frozen contract: longitude wraps,
    latitude clamps.

    Plan (scatter-argmin): each occupied cell scatters ``elev·8 +
    opp(dir)`` to its valid neighbors — the receiver sees the sender's
    direction — one ``Min`` groupby computes the packed argmin (value
    first, compass index as tiebreak, ties impossible since the index is
    unique per pair), and a LEFT join back to the occupied set keeps
    isolated cells as pits. Exchange is O(occupied × 9) pre-combined rows,
    never O(points): run on an aggregated raster.

    Output: ``cell_col, value_col, dir, nb_min`` (nb_min = lowest occupied
    neighbor value, −1 when there is none).
    """
    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    sentinel = np.int64(1) << 62

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr, valid = codec.neighbors(cell, bits)
        parts_c, parts_p = [], []
        for j in range(8):
            ok = valid[:, j]
            parts_c.append(nbr[ok, j])
            parts_p.append(val[ok] * 8 + ((j + 4) % 8))
        tgt = np.concatenate(parts_c)
        pack = np.concatenate(parts_p)
        u, inv = np.unique(tgt, return_inverse=True)
        m = np.full(u.size, sentinel, dtype=np.int64)
        np.minimum.at(m, inv, pack)
        return pa.table({cell_col: u.astype(np.int64), "p_min": m})

    gathered = (
        raster_ds.map_batches(scatter, batch_format="pyarrow",
                              zero_copy_batch=True)
        .repartition(combine_partitions)
        .groupby(cell_col)
        .aggregate(Min("p_min", alias_name="minpack"))
        .repartition(num_partitions)  # schema-less empty-block guard
    )

    joined = raster_ds.join(
        gathered, join_type="left_outer", num_partitions=num_partitions,
        on=(cell_col,), right_suffix="_r",
    )

    def finalize(t: pa.Table) -> pa.Table:
        mp = pc.fill_null(t["minpack"], int(sentinel)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        has = mp != sentinel
        nb_min = np.where(has, mp >> 3, np.int64(-1))
        lower = has & (nb_min < val)
        dirs = np.where(lower, mp % 8, np.int64(-1))
        return pa.table({
            cell_col: t[cell_col],
            value_col: pa.array(val),
            "dir": dirs,
            "nb_min": nb_min,
        })

    return joined.map_batches(finalize, batch_format="pyarrow")
