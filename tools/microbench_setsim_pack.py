"""Microbench: setsim token_sets pack stage — per-doc mask scan vs
segment quicksort + offsets slicing (the shipped variant).

The old shape (`th[r == i]` per doc) is O(docs x total_tokens) per batch;
the shipped shape exploits that `r` is non-decreasing after
explode+drop_duplicates, so each doc's hashes are a contiguous run: one
bincount for offsets, an in-place quicksort per run, one tobytes, and
per-doc byte slicing — O(T log s). Asserts bit-identical blobs.

Run: python tools/microbench_setsim_pack.py  (no Ray needed)
"""
import os
import re
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georay.ops.sketch import splitmix64
from georay.ops.text import fingerprint64

_WORD_RE = re.compile(r"[\w']+", re.UNICODE)


def make_batch(n_docs=1000, doc_len=200, vocab=5000, seed=0):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [" ".join(rng.choice(words, size=doc_len)) for _ in range(n_docs)]
    df = pd.DataFrame({"doc_id": np.arange(n_docs), "text": texts})
    toks = df["text"].str.findall(_WORD_RE).explode().dropna().str.lower()
    row = toks.index.to_numpy().astype(np.int64)
    pairs = pd.DataFrame({"r": row, "w": toks.to_numpy()}).drop_duplicates()
    codes, uniq = pd.factorize(pairs["w"].to_numpy())
    th = splitmix64(fingerprint64(np.asarray(uniq, dtype=object)))[codes]
    return pairs["r"].to_numpy(), th, n_docs


def pack_masked(r, th, n):  # the pre-round-4 shape
    blobs, sizes = [], []
    for i in range(n):
        s = np.sort(th[r == i])
        blobs.append(s.tobytes())
        sizes.append(s.size)
    return blobs, np.asarray(sizes, dtype=np.int64)


def pack_segmented(r, th, n):  # the shipped shape (ops/setsim.py token_sets)
    sizes = np.bincount(r, minlength=n).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(sizes)))
    th_sorted = th.copy()
    for i in range(n):
        th_sorted[offs[i]:offs[i + 1]].sort(kind="quicksort")
    buf = th_sorted.tobytes()
    blobs = [buf[8 * offs[i]: 8 * offs[i + 1]] for i in range(n)]
    return blobs, sizes


def main():
    r, th, n = make_batch()
    best_old = min(_timed(pack_masked, r, th, n) for _ in range(3))
    best_new = min(_timed(pack_segmented, r, th, n) for _ in range(3))
    b1, s1 = pack_masked(r, th, n)
    b2, s2 = pack_segmented(r, th, n)
    assert b1 == b2 and (s1 == s2).all(), "pack variants diverged"
    print(f"masked   {best_old*1e3:8.2f} ms/batch")
    print(f"segmented{best_new*1e3:8.2f} ms/batch")
    print(f"speedup  {best_old/best_new:8.1f}x  (bit-identical blobs)")


def _timed(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
