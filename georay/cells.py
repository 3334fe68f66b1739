"""H3/S2-style hierarchy over the Morton cell substrate (SURVEY.md §2.5 N1).

The int64 Morton code at ``bits`` precision forms a quadtree when stepped by
2 bits (4 children/level — S2-like) and the base32 string hierarchy when
stepped by 5 bits (32 children/level — geohash-string-like). All ops are
vectorized numpy; the distributed variants (``compact_dataset``) co-locate
sibling cells with a prefix shuffle first.
"""

from __future__ import annotations

import numpy as np

from georay import codec

_U = np.uint64


def cell_to_parent(code, bits: int, parent_bits: int) -> np.ndarray:
    """Parent cell at a coarser bit precision (prefix of the Morton code)."""
    if parent_bits > bits:
        raise ValueError("parent_bits must be <= bits")
    return np.asarray(code, dtype=np.uint64) >> _U(bits - parent_bits)


def cell_to_children(code, bits: int, child_bits: int) -> np.ndarray:
    """All children at a finer precision → shape (N, 2**(child_bits-bits)).

    Callers in Ray stages explode this to rows with ``np.repeat`` on the
    sibling axis (1 row → 2^Δ rows), never with Python loops."""
    if child_bits < bits:
        raise ValueError("child_bits must be >= bits")
    d = child_bits - bits
    code = np.asarray(code, dtype=np.uint64)
    sib = np.arange(1 << d, dtype=np.uint64)
    return (code[:, None] << _U(d)) | sib[None, :]


def k_ring(code, bits: int, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """All cells within Chebyshev distance k in grid space (incl. center).

    Returns ``(codes[N, (2k+1)**2], valid[N, (2k+1)**2])``; longitude wraps,
    latitude clamps (invalid rows masked). k=1 ≡ neighbors+self.
    """
    nx, ny = codec.split_bits(bits)
    x, y = codec.deinterleave(code, bits)
    dxs, dys = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    dxs = dxs.reshape(-1)
    dys = dys.reshape(-1)
    mask_x = (1 << nx) - 1
    xn = (x[:, None] + dxs[None, :]) & mask_x
    yn = y[:, None] + dys[None, :]
    valid = (yn >= 0) & (yn < (1 << ny))
    yn = np.clip(yn, 0, (1 << ny) - 1)
    codes = codec.interleave(xn.reshape(-1), yn.reshape(-1), bits).reshape(x.shape[0], -1)
    return codes, valid


def compact(codes: np.ndarray, bits: int, step: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Replace complete sibling sets by their parent, repeatedly (H3 compact).

    ``step=2`` → quadtree siblings (4/level); ``step=5`` → base32 string
    levels (32/level). Input cells must be unique and at one precision.
    Returns ``(codes, code_bits)`` — mixed precisions after compaction.

    In-memory numpy (sort + run-length); the distributed variant is
    :func:`compact_dataset`.
    """
    codes = np.unique(np.asarray(codes, dtype=np.uint64))
    out_codes: list[np.ndarray] = []
    out_bits: list[np.ndarray] = []
    cur = codes
    cur_bits = bits
    fanout = 1 << step
    while cur_bits - step >= step and cur.size >= fanout:
        parents = cur >> _U(step)
        uniq, counts = np.unique(parents, return_counts=True)
        full = uniq[counts == fanout]
        if full.size == 0:
            break
        is_promoted = np.isin(parents, full)
        keep = cur[~is_promoted]
        out_codes.append(keep)
        out_bits.append(np.full(keep.size, cur_bits, dtype=np.int8))
        cur = full
        cur_bits -= step
    out_codes.append(cur)
    out_bits.append(np.full(cur.size, cur_bits, dtype=np.int8))
    return np.concatenate(out_codes), np.concatenate(out_bits)


def uncompact(
    codes: np.ndarray, code_bits: np.ndarray, target_bits: int
) -> np.ndarray:
    """Expand mixed-precision cells to a single finer precision."""
    codes = np.asarray(codes, dtype=np.uint64)
    code_bits = np.asarray(code_bits)
    out = []
    for b in np.unique(code_bits):
        sel = codes[code_bits == b]
        out.append(cell_to_children(sel, int(b), target_bits).reshape(-1))
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(out)


def uncompact_dataset(ds, target_bits: int, cell_col: str = "cell",
                      bits_col: str = "cell_bits"):
    """Distributed uncompact: mixed-precision cells (the output shape of
    :func:`compact_dataset`) exploded to ``target_bits`` — 1 row →
    ``2^(target-bits)`` rows, vectorized per precision group within each
    batch (flat-map style, no shuffle). Output: ``cell:int64`` at one
    precision."""
    import pyarrow as pa

    def explode(t):
        codes = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        code_bits = t[bits_col].to_numpy(zero_copy_only=False)
        out = uncompact(codes, code_bits, target_bits)
        return pa.table({cell_col: out.astype(np.int64)})

    return ds.map_batches(explode, batch_format="pyarrow")


def compact_dataset(ds, cell_col: str, bits: int, step: int = 2, anchor_bits: int = 10):
    """Distributed compact: shuffle cells so all potential siblings of a
    coarse anchor prefix land in one group, then numpy-compact per group.

    Correct because compaction never crosses an ``anchor_bits`` prefix
    boundary as long as ``anchor_bits`` is a multiple of ``step`` below
    ``bits`` (siblings share their parent prefix). Output schema:
    ``cell:uint64, cell_bits:int8``.
    """
    import pandas as pd

    if (bits - anchor_bits) % step:
        raise ValueError("bits - anchor_bits must be a multiple of step")

    def add_anchor(t):
        import pyarrow as pa

        cells = t[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        anchor = (cells >> _U(bits - anchor_bits)).astype(np.int64)
        return pa.table({cell_col: cells.astype(np.int64), "anchor": anchor})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        cells = g[cell_col].to_numpy().astype(np.uint64)
        out, out_bits = compact(cells, bits, step=step)
        return pd.DataFrame(
            {"cell": out.astype(np.int64), "cell_bits": out_bits.astype(np.int8)}
        )

    return (
        ds.map_batches(add_anchor, batch_format="pyarrow")
        .groupby("anchor")
        .map_groups(per_group, batch_format="pandas")
    )
