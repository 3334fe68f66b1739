"""Image decode + invariant enforcement (SURVEY.md N7).

Two physical forms of the same stage:

- ``DecodeInvariant`` — callable class for an ACTOR POOL
  (``map_batches(DecodeInvariant, concurrency=N)``): the shape for heavy
  per-actor state (a real model). Actor pools RESERVE their CPUs, which on a
  small node starves the parquet read running beside them.
- ``decode_invariant`` (default) — STATELESS TASKS sharing the same cached
  state through a per-worker-process module global: Ray reuses worker
  processes, so the ground-truth cache amortizes exactly like actor state,
  while tasks pack elastically with the read/shuffle stages (no reserved-CPU
  starvation). Measured 2× end-to-end over the pool on 32 CPUs.

Per-row invariant (BASELINE.json:15): decoded pixels vs the deterministically
regenerated ground truth — exact equality for lossless fmts, PSNR ≥ 40 dB for
lossy — plus caption equality against the recomputed expected caption.
Batch size is capped in ROWS kept small because rows carry binary payloads
(SURVEY.md §7 "cap batch_size by bytes, not rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay import codec, images
from georay.fixtures import PIXEL_PERIOD, pixel_index, row_coords

PSNR_MIN = 40.0


class DecodeInvariant:
    """Actor: decode each image, check the pixel + caption invariants.

    Output schema: every input column except the binary payload and the
    caption (verified then dropped), plus ok(bool), psnr(float64),
    dec_w, dec_h — so downstream stages (cell encode, tile assign) chain
    directly on the checked stream.
    """

    def __init__(self, check_caption: bool = True):
        self.check_caption = check_caption
        # per-actor ground-truth cache: synth pixels are periodic in the
        # pixel index (PIXEL_PERIOD=768 distinct tensors, ~9 MB) — actor
        # state paying for itself across every batch the actor sees
        self._truth: dict[int, np.ndarray] = {}

    def _ground_truth(self, pix: int) -> np.ndarray:
        # NOTE: PIXEL_PERIOD must be imported at module level — a lazy
        # `import georay...` executed ON A WORKER fails when the worker's
        # sys.path lacks the repo (by-value pickling ships objects, not
        # importability)
        key = pix % PIXEL_PERIOD
        t = self._truth.get(key)
        if t is None:
            t = images.synth_pixels(key)
            self._truth[key] = t
        return t

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        id_col = t["image_id"].combine_chunks() if isinstance(
            t["image_id"], pa.ChunkedArray
        ) else t["image_id"]
        # vectorized "img%012d" -> int (no Python string parsing)
        idx = pc.cast(pc.utf8_slice_codeunits(id_col, 3, 15), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        fmts = t["fmt"].to_pylist()
        blobs = t["bytes"].to_pylist()
        n = len(fmts)
        pix_idx = pixel_index(idx)
        caption_ok = np.ones(n, dtype=bool)
        if self.check_caption:
            lon, lat = row_coords(idx)
            gh = codec.encode_str(lon, lat, 5)
            expected = pc.binary_join_element_wise(
                pa.scalar("caption for "),
                id_col,
                pa.scalar(": "),
                pa.array(gh.astype("U")),
                pa.scalar(""),  # separator
            )
            caption_ok = pc.equal(t["caption"], expected).to_numpy(
                zero_copy_only=False
            )
        ok = np.zeros(n, dtype=bool)
        psnr_v = np.zeros(n, dtype=np.float64)
        ws = np.zeros(n, dtype=np.int32)
        hs = np.zeros(n, dtype=np.int32)
        for k in range(n):
            try:
                pixels = images.decode_image(blobs[k], fmts[k])
            except Exception:
                continue
            hs[k], ws[k] = pixels.shape[0], pixels.shape[1]
            truth = self._ground_truth(int(pix_idx[k]))
            if truth.shape != pixels.shape:
                continue
            if fmts[k] not in images.LOSSY_FORMATS:
                pixel_ok = np.array_equal(truth, pixels)
                psnr_v[k] = 99.0 if pixel_ok else images.psnr(truth, pixels)
            else:
                p = images.psnr(truth, pixels)
                psnr_v[k] = p if np.isfinite(p) else 99.0
                pixel_ok = p >= PSNR_MIN
            ok[k] = pixel_ok and caption_ok[k]
        cols = {
            name: t[name]
            for name in t.column_names
            if name not in ("bytes", "caption")
        }
        cols["ok"] = pa.array(ok)
        cols["psnr"] = pa.array(psnr_v)
        cols["dec_w"] = pa.array(ws)
        cols["dec_h"] = pa.array(hs)
        return pa.table(cols)


_TASK_STATE: dict = {}


def _decode_invariant_batch(t: pa.Table) -> pa.Table:
    """Stateless-task form: per-worker-process DecodeInvariant instance."""
    inst = _TASK_STATE.get("decoder")
    if inst is None:
        inst = DecodeInvariant()
        _TASK_STATE["decoder"] = inst
    return inst(t)


def decode_invariant(ds, concurrency=None, batch_size: int = 512):
    """Run decode+invariant over an images Dataset.

    ``concurrency=None`` (default) → stateless tasks with per-process cached
    state (elastic CPU sharing with the read stage). Pass an int / (min,max)
    to force a dedicated actor pool instead (the shape for heavyweight
    state)."""
    if concurrency is None:
        return ds.map_batches(
            _decode_invariant_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        DecodeInvariant,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def dedup_by_phash(ds):
    """Exact first-wins dedup on the content hash: only (phash, image_idx)
    pairs shuffle, never the binary payloads (SURVEY.md N8)."""
    from ray.data.aggregate import Count, Min

    def project(t: pa.Table) -> pa.Table:
        idx = np.array(
            [int(s[3:]) for s in t["image_id"].to_pylist()], dtype=np.int64
        )
        return pa.table({"phash": t["phash"], "idx": pa.array(idx)})

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(16)  # coalesce before the shuffle (block-count-bound)
        .groupby("phash")
        .aggregate(Min("idx", alias_name="first_id"), Count(alias_name="n_copies"))
        .select_columns(["first_id", "n_copies"])
    )
