"""Grid-accelerated DBSCAN over point Datasets (SURVEY.md N4/N5 depth:
proximity JOINS answer "who is near whom"; density clustering answers the
geospatial question users actually ask of dense urban geohashes — "which
points form a contiguous hot region, and which are isolated noise").

Classic DBSCAN is order-dependent at the border points; this is the
DETERMINISTIC formulation (same one the SQL twin replays):

- ``N_eps(p)`` = all points within Euclidean degree distance ``eps``
  (squared-degree metric, the frozen expression order of the kNN/dwithin
  family) — including ``p`` itself (the self-pair).
- core(p)   ⇔ |N_eps(p)| >= min_pts.
- Components of the core-core proximity graph get stable labels = the MIN
  core id reachable (the same min-label contract as ops.cluster).
- EVERY point's label = MIN over {component(n) : n ∈ N_eps(p), n core}.
  For a core point that is its own component id (p ∈ N_eps(p)); for a
  border point it is the smallest adjacent core component (deterministic,
  order-free); points with no core neighbor are noise (label -1).
- role: 2 = core, 1 = border, 0 = noise.

Scale shape — everything is the repo's existing machinery:
1. The eps-neighborhood pair list comes from ops.knn.dwithin_shuffle
   (cell-grid ring explode + ONE hash shuffle + vectorized distance
   filter; the ring provably covers ``eps``). Pairs are materialized once
   (bounded by the true neighbor-pair count, avg_degree × n) and reused by
   the three downstream consumers instead of re-running the exchange.
2. Degree counts and label mins are TWO-PHASE: per-batch partials
   (np.unique / sorted-run min) shuffle one row per (point, batch), not
   one per pair.
3. Core-component labels come from ops.cluster.connected_components
   (driver union-find under the broadcast cap, distributed min-label
   propagation above it).
Skewed dense cells are the dwithin exchange's problem and are handled
there (hash-partitioned cells); no stage here holds more than one batch
plus the O(cores) component table per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from georay.ops import knn as knn_ops
from georay.ops.buckets import segment_starts
from georay.ops.cluster import connected_components


def _partial_count(t: pa.Table) -> pa.Table:
    """(pid) pair rows → one (pid, n) partial per distinct pid per batch."""
    pid = t["pid"].to_numpy(zero_copy_only=False)
    u, c = np.unique(pid, return_counts=True)
    return pa.table({"pid": pa.array(u), "n": pa.array(c.astype(np.int64))})


def _partial_min(t: pa.Table) -> pa.Table:
    """(pid, component) rows → one (pid, lbl) min-partial per batch."""
    pid = t["pid"].to_numpy(zero_copy_only=False)
    comp = t["component"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pid, kind="quicksort")  # quicksort-only (BASELINE.md)
    pid_s, comp_s = pid[order], comp[order]
    starts = segment_starts(pid_s)
    lbl = np.minimum.reduceat(comp_s, starts) if starts.size else comp_s[:0]
    return pa.table({"pid": pa.array(pid_s[starts]), "lbl": pa.array(lbl)})


def grid_dbscan(
    points_ds,
    bits: int,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    num_partitions: int | None = None,
):
    """Deterministic grid DBSCAN. ``points_ds`` carries ``id_col`` +
    ``lon``/``lat``/``cell`` (ops.spatial.points_with_cells layout).
    Returns a Dataset ``(id_col, cluster, role)`` — cluster = min reachable
    core id (int64, -1 for noise), role ∈ {2 core, 1 border, 0 noise}.

    ``num_partitions=None`` → ``runtime.adaptive_partitions()`` (≈ cluster
    CPUs) for the pair join + label exchanges (VERDICT r4 #4).
    """
    from ray.data.aggregate import Min, Sum

    from georay.runtime import adaptive_partitions

    if num_partitions is None:
        num_partitions = adaptive_partitions()

    def as_side(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    name: t[id_col],
                    "lon": t["lon"],
                    "lat": t["lat"],
                    "cell": t["cell"],
                }
            )

        return fn

    q = points_ds.map_batches(as_side("pid"), batch_format="pyarrow")
    r = points_ds.map_batches(as_side("nid"), batch_format="pyarrow")

    # 1. eps-neighborhood pairs, reused 3× below: degree counts, core-core
    # edges, border label assignment. Bounded by the true pair count.
    pairs = (
        knn_ops.dwithin_shuffle(
            q, r, bits=bits, radius=eps, query_id="pid", ref_id="nid",
            num_partitions=num_partitions,
        )
        .select_columns(["pid", "nid"])
        .materialize()
    )

    # 2. degree → core flag (two-phase count; every point has its
    # self-pair, so deg covers the whole point set — it doubles as the
    # full-id spine for the final left join)
    deg = (
        pairs.map_batches(_partial_count, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("pid")
        .aggregate(Sum("n", alias_name="cnt"))
        # merge sort-aggregate's schema-less empty blocks before the joins
        # below (CLAUDE.md invariant: Acero rejects schema-less blocks)
        .repartition(num_partitions)
        .materialize()
    )

    core = deg.map_batches(
        lambda t: pa.table(
            {"pid": t.filter(pc.greater_equal(t["cnt"], min_pts))["pid"]}
        ),
        batch_format="pyarrow",
    ).materialize()

    if core.count() == 0:
        # no core point anywhere (sparse regime): every point is noise —
        # exact short-circuit; also avoids feeding an all-empty-block side
        # into the hash join (Acero rejects schema-less blocks)
        def all_noise(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table(
                {
                    id_col: t["pid"],
                    "cluster": pa.array(np.full(n, -1, dtype=np.int64)),
                    "role": pa.array(np.zeros(n, dtype=np.int64)),
                }
            )

        return deg.map_batches(all_noise, batch_format="pyarrow")

    # merge the filter's empty outputs into schema-carrying blocks before
    # the joins (the join hash-shuffles to num_partitions itself, so a low
    # block count here costs nothing)
    core = core.repartition(2)
    core_n = core.map_batches(
        lambda t: pa.table({"nid": t["pid"]}), batch_format="pyarrow"
    )

    # 3. core-core edges → components (stable min-id labels)
    edges = (
        pairs.join(core, join_type="inner", num_partitions=num_partitions,
                   on=("pid",))
        .join(core_n, join_type="inner", num_partitions=num_partitions,
              on=("nid",))
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["pid"], t["nid"])),
            batch_format="pyarrow",
        )
    )
    comps = connected_components(
        core, edges, node_col="pid", edge_a="pid", edge_b="nid",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table({"nid": t["pid"], "component": t["component"]}),
        batch_format="pyarrow",
    ).repartition(num_partitions)

    # 4. every point's label = MIN adjacent core component (one rule for
    # core AND border: a core point is adjacent to itself)
    lab = (
        pairs.join(comps, join_type="inner", num_partitions=num_partitions,
                   on=("nid",))
        .map_batches(_partial_min, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("pid")
        .aggregate(Min("lbl", alias_name="lbl"))
        .repartition(num_partitions)
    )

    out = deg.join(
        lab, join_type="left_outer", num_partitions=num_partitions,
        on=("pid",)
    )

    def finish(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        has = pc.is_valid(t["lbl"]).to_numpy(zero_copy_only=False)
        lblf = t["lbl"].cast(pa.float64()).to_numpy(zero_copy_only=False)
        cluster = np.where(
            has, np.nan_to_num(lblf, nan=-1.0), -1.0
        ).astype(np.int64)
        role = np.where(cnt >= min_pts, 2, np.where(has, 1, 0)).astype(
            np.int64
        )
        return pa.table(
            {
                id_col: t["pid"],
                "cluster": pa.array(cluster),
                "role": pa.array(role),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
