"""Distributed connected components → near-duplicate CLUSTERS (SURVEY.md N8
depth: pair lists are not actionable for dedup — the keep/drop decision needs
the transitive closure, "A~B, B~C ⇒ keep one of {A,B,C}").

Min-label propagation over an edge Dataset: every node starts labeled with
itself; each round, labels flow across edges (two hash joins + a min-groupby)
until no label changes. Rounds ≈ graph diameter — near-dup graphs are
unions of small cliques, so 2–3 rounds in practice. Each round's label table
is materialized (bounded: one row per node) so the lazy lineage doesn't
re-execute from scratch; the edge set streams through joins unshuffled each
round. Convergence is detected by the monotone total-label sum (labels only
ever decrease; equal sum ⇒ fixed point).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def connected_components(
    nodes_ds,
    edges_ds,
    node_col: str = "node",
    edge_a: str = "id_a",
    edge_b: str = "id_b",
    num_partitions: int = 8,
    max_rounds: int = 50,
):
    """(node, component) labeling: component = min node id reachable.

    ``nodes_ds``: one integer id per row (singletons allowed);
    ``edges_ds``: undirected edges. Returns a Dataset (node, component).
    """
    from ray.data.aggregate import Min, Sum

    def init_labels(t: pa.Table) -> pa.Table:
        ids = t[node_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(ids), "label": pa.array(ids)})

    labels = nodes_ds.map_batches(
        init_labels, batch_format="pyarrow"
    ).materialize()

    def sym(t: pa.Table) -> pa.Table:
        a = t[edge_a].to_numpy(zero_copy_only=False)
        b = t[edge_b].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()

    def label_sum(ds) -> int:
        return ds.aggregate(Sum("label", alias_name="s"))["s"] or 0

    prev = label_sum(labels)
    for _ in range(max_rounds):
        # propagate: each edge (src,dst) offers label(src) to dst
        offered = (
            edges.join(
                labels.map_batches(
                    lambda t: pa.table({"src": t["node"], "label": t["label"]}),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
            )
            .map_batches(
                lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
                batch_format="pyarrow",
            )
        )
        labels = (
            labels.union(offered)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t["node"], "component": t["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def dedup_clusters(
    docs_ds,
    pairs_ds,
    id_col: str = "doc_id",
    num_partitions: int = 8,
):
    """Near-dup clustering: every doc labeled with its component's min id
    (its own id if it has no near-duplicates). Output:
    ``(doc_id, cluster_id, is_representative)`` — downstream dedup keeps
    rows where ``is_representative``.
    """
    import pyarrow.compute as pc

    def nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": t[id_col]})

    cc = connected_components(
        docs_ds.map_batches(nodes, batch_format="pyarrow"),
        pairs_ds,
        num_partitions=num_partitions,
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t["node"],
                "cluster_id": t["component"],
                "is_representative": pc.equal(t["node"], t["component"]),
            }
        )

    return cc.map_batches(fin, batch_format="pyarrow")
