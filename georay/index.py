"""Cell-keyed inverted index over a partitioned Parquet layout.

Ray-Data-native replacement for the reference's UnQLite inverted index
(SURVEY.md §2.4 X1–X8: ``index.init_geohash/open_geohash``, ``GeoHash.update/
extend/keys/query/query_box``, ``storage.unqlite``, ``lock``): instead of a
single mutable KV file guarded by fcntl locks, records live in one Parquet
partition per coarse cell prefix, written via the checkpointed
``runtime.write_partitioned`` (shuffle ownership replaces locking — each
reducer owns its cells exclusively; manifest commits are atomic renames).

Queries prune at the partition level (only files whose prefix intersects the
requested cells/box are opened), then refine exactly on the cell column —
the distributed analogue of the reference's per-code KV lookups.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from georay import cells as cells_mod
from georay import codec, runtime

_PROPS = "_index.json"


class CellIndex:
    """Handle to an on-disk cell-partitioned index (open_geohash parity)."""

    def __init__(self, root: str):
        self.root = root
        try:
            with open(os.path.join(root, _PROPS)) as f:
                props = json.load(f)
        except FileNotFoundError:
            old = root.rstrip("/") + ".compact-old"
            if os.path.isdir(old):
                raise FileNotFoundError(
                    f"index missing at {root} but {old} exists: a compact() "
                    "crashed between its two renames — restore with "
                    f"`mv {old} {root}`"
                ) from None
            raise
        self.bits = props["bits"]
        self.prefix_bits = props["prefix_bits"]
        self.cell_col = props["cell_col"]

    # -------------------------------------------------------------- building

    @staticmethod
    def build(
        ds,
        root: str,
        bits: int,
        prefix_bits: int = 8,
        cell_col: str = "cell",
        resume: bool = True,
    ) -> "CellIndex":
        """init_geohash + update parity: shuffle records by cell prefix and
        write one partition file per prefix with a committed manifest."""
        os.makedirs(root, exist_ok=True)
        shift = bits - prefix_bits

        def add_prefix(t: pa.Table) -> pa.Table:
            cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            return t.append_column(
                "_prefix", pa.array((cell >> np.uint64(shift)).astype(np.int64))
            )

        keyed = ds.map_batches(add_prefix, batch_format="pyarrow")
        runtime.write_partitioned(
            keyed, root, "_prefix", resume=resume, lineage=f"build bits={bits}"
        )
        props = {"bits": bits, "prefix_bits": prefix_bits, "cell_col": cell_col}
        tmp = os.path.join(root, _PROPS + ".tmp")
        with open(tmp, "w") as f:
            json.dump(props, f)
        os.replace(tmp, os.path.join(root, _PROPS))
        return CellIndex(root)

    def extend(self, ds) -> None:
        """extend parity: append new records for possibly-existing cells.
        Implemented as a fresh partition write into a fragment subdir; reads
        union all fragments (compaction = rebuild)."""
        frag = os.path.join(
            self.root,
            f"frag-{len([d for d in os.listdir(self.root) if d.startswith('frag-')])}",
        )
        shift = self.bits - self.prefix_bits
        cell_col = self.cell_col

        def add_prefix(t: pa.Table) -> pa.Table:
            cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            return t.append_column(
                "_prefix", pa.array((cell >> np.uint64(shift)).astype(np.int64))
            )

        runtime.write_partitioned(
            ds.map_batches(add_prefix, batch_format="pyarrow"),
            frag,
            "_prefix",
            resume=False,
            lineage="extend",
        )

    def compact(self) -> None:
        """Merge ``extend()`` fragments back into the base partition layout
        (one file per prefix again — repeated extends otherwise degrade
        reads with one extra file per prefix per extend).

        Full union scan → fresh partitioned write into a sibling dir →
        two-rename directory swap. MAINTENANCE OPERATION, single-writer,
        NO CONCURRENT READERS: between the two renames the root briefly
        does not exist (POSIX cannot atomically swap directories), and a
        crash in that window leaves the previous layout at
        ``<root>.compact-old`` (CellIndex() then raises with the restore
        command). Run it like a rebuild, not like a query."""
        import shutil

        frags = [d for d in os.listdir(self.root) if d.startswith("frag-")]
        if not frags:
            return
        shift = self.bits - self.prefix_bits
        cell_col = self.cell_col

        def add_prefix(t: pa.Table) -> pa.Table:
            cell = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            return t.append_column(
                "_prefix", pa.array((cell >> np.uint64(shift)).astype(np.int64))
            )

        tmp = self.root.rstrip("/") + ".compact-tmp"
        old = self.root.rstrip("/") + ".compact-old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        runtime.write_partitioned(
            self.scan().map_batches(add_prefix, batch_format="pyarrow"),
            tmp,
            "_prefix",
            resume=False,
            lineage=f"compact of {len(frags)} fragments",
        )
        props = {"bits": self.bits, "prefix_bits": self.prefix_bits,
                 "cell_col": self.cell_col}
        with open(os.path.join(tmp, _PROPS), "w") as f:
            json.dump(props, f)
        os.rename(self.root, old)
        os.rename(tmp, self.root)
        shutil.rmtree(old)

    # -------------------------------------------------------------- querying

    def _files_for_prefixes(self, prefixes: set[int]) -> list[str]:
        roots = [self.root] + [
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith("frag-")
        ]
        out = []
        for r in roots:
            for f in os.listdir(r):
                if f.startswith("part-") and f.endswith(".parquet"):
                    p = int(f[len("part-") : -len(".parquet")].rsplit("-", 1)[0])
                    if p in prefixes:
                        out.append(os.path.join(r, f))
        return out

    def _read_pruned(self, prefixes: set[int], columns=None):
        import ray.data

        files = self._files_for_prefixes(prefixes)
        if not files:
            return None
        return ray.data.read_parquet(files, columns=columns)

    def query_cells(self, cells: np.ndarray, columns=None,
                    expand_neighbors: bool = False, ring: int = 1):
        """X5 parity: records of exactly these cells — partition-pruned read
        + exact cell filter (vectorized isin per batch).

        ``expand_neighbors=True`` widens the request by the Chebyshev
        ``ring`` of surrounding cells first (the reference's border-
        tolerance query expansion, SURVEY.md X5 MUST-VERIFY: points near a
        cell edge live in a neighboring cell)."""
        cells = np.unique(np.asarray(cells, dtype=np.uint64))
        if expand_neighbors and cells.size:
            ring_cells, valid = cells_mod.k_ring(cells, self.bits, ring)
            cells = np.unique(ring_cells.reshape(-1)[valid.reshape(-1)])
        shift = self.bits - self.prefix_bits
        prefixes = set((cells >> np.uint64(shift)).astype(np.int64).tolist())
        if columns is not None:
            # the refine step needs the cell column; _prefix is dropped there
            columns = list(dict.fromkeys(list(columns) + [self.cell_col]))
            columns = [c for c in columns if c != "_prefix"]
        ds = self._read_pruned(prefixes, columns)
        if ds is None:
            return None
        cell_col = self.cell_col
        wanted = np.sort(cells.astype(np.int64))

        def refine(t: pa.Table) -> pa.Table:
            got = t[cell_col].to_numpy(zero_copy_only=False)
            keep = np.isin(got, wanted)
            out = t.filter(pa.array(keep))
            if "_prefix" in out.column_names:
                out = out.drop_columns(["_prefix"])
            return out

        return ds.map_batches(refine, batch_format="pyarrow")

    def query_box(self, box: tuple, columns=None):
        """X6 parity: records of every cell intersecting the box cover —
        cover cells from grid arithmetic, then pruned read + refine."""
        cover = codec.bounding_boxes(box, self.bits)
        return self.query_cells(cover, columns)

    def _all_prefixes(self) -> set[int]:
        roots = [self.root] + [
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith("frag-")
        ]
        out = set()
        for r in roots:
            for f in os.listdir(r):
                if f.startswith("part-") and f.endswith(".parquet"):
                    out.add(int(f[len("part-") : -len(".parquet")].rsplit("-", 1)[0]))
        return out

    def keys(self) -> np.ndarray:
        """X4 parity: distinct cells present (sorted numpy array —
        ``Dataset.unique`` already collects to the driver in Ray)."""
        ds = self._read_pruned(self._all_prefixes(), [self.cell_col])
        if ds is None:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.asarray(ds.unique(self.cell_col), dtype=np.int64))

    def scan(self, columns=None):
        """X4 values()/items() parity: full index scan as a Dataset."""
        ds = self._read_pruned(self._all_prefixes(), columns)
        if ds is None:
            return None

        def drop(t: pa.Table) -> pa.Table:
            return t.drop_columns(["_prefix"]) if "_prefix" in t.column_names else t

        return ds.map_batches(drop, batch_format="pyarrow")
