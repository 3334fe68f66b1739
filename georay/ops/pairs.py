"""Shared in-bucket pair enumeration with an anti-explosion cap.

Every LSH family in this repo (MinHash bands, SimHash blocks, embedding
hyperplane buckets) ends in the same reduce shape: "all unordered pairs
within a bucket". One degenerate bucket — empty docs hashing alike, a
zero-vector embedding pile-up — turns that into an O(b²) group pinned on a
single reducer, the canonical silent scale-killer. This module is the one
place that shape lives: buckets above ``max_bucket`` are split into sorted
chunks and only in-chunk pairs are emitted (O(b·max_bucket) worst case),
and every capped bucket logs its size and skipped-pair count (worker log) —
capping is never silent. Pass ``max_bucket=None`` for exact all-pairs.
"""

from __future__ import annotations

import numpy as np


def bucket_pair_indices(
    n: int, max_bucket: int | None, label: str, log_prefix: str = "georay.pairs"
) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs (ia, ib) with ia < ib over ``n`` bucket members.

    Operates in INDEX space so callers can gather ids, signatures, or
    embedding rows for the emitted pairs without materializing an n×n
    anything. Caller is responsible for any deterministic ordering of the
    underlying rows (sort by id first for stable output)."""
    if max_bucket is not None and n > max_bucket:
        full = n * (n - 1) // 2
        kept = sum(
            (min(s + max_bucket, n) - s) * (min(s + max_bucket, n) - s - 1) // 2
            for s in range(0, n, max_bucket)
        )
        print(
            f"{log_prefix}: capped oversized LSH bucket {label} "
            f"(size {n} > max_bucket {max_bucket}); emitting {kept} "
            f"in-chunk pairs, skipping {full - kept} cross-chunk pairs"
        )
        ia_l, ib_l = [], []
        for s in range(0, n, max_bucket):
            e = min(s + max_bucket, n)
            ca, cb = np.triu_indices(e - s, k=1)
            ia_l.append(ca + s)
            ib_l.append(cb + s)
        return np.concatenate(ia_l), np.concatenate(ib_l)
    return np.triu_indices(n, k=1)


def bucket_pairs(
    ids: np.ndarray, max_bucket: int | None, label: str,
    log_prefix: str = "georay.pairs",
) -> tuple[np.ndarray, np.ndarray]:
    """All unordered id pairs within a bucket (ids sorted first, so
    ``a < b`` and chunking under the cap is deterministic)."""
    ids = np.sort(ids)
    ia, ib = bucket_pair_indices(ids.size, max_bucket, label, log_prefix)
    return ids[ia], ids[ib]
