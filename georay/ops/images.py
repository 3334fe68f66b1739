"""Image decode + invariant enforcement as an actor-pool stage (SURVEY.md N7).

The decoder is a callable CLASS: codec dispatch tables and the cached
powers table for content hashing are per-actor state, batches stream through
``__call__``. Batch size is capped in ROWS kept small because rows carry
binary payloads (SURVEY.md §7 "cap batch_size by bytes, not rows").

Per-row invariant (BASELINE.json:15): decoded pixels vs the deterministically
regenerated ground truth — exact equality for lossless fmts, PSNR ≥ 40 dB for
lossy — plus caption equality against the recomputed expected caption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay import codec, images
from georay.fixtures import pixel_index, row_coords

PSNR_MIN = 40.0


class DecodeInvariant:
    """Actor: decode each image, check the pixel + caption invariants.

    Output schema: image_id, fmt, ok(bool), psnr(float64), w, h.
    """

    def __init__(self, check_caption: bool = True):
        self.check_caption = check_caption

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        fmts = t["fmt"].to_pylist()
        blobs = t["bytes"].to_pylist()
        captions = t["caption"].to_pylist() if self.check_caption else None
        n = len(ids)
        idx = np.array([int(s[3:]) for s in ids], dtype=np.int64)
        pix_idx = pixel_index(idx)
        lon, lat = row_coords(idx)
        gh = codec.encode_str(lon, lat, 5)
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
            truth = images.synth_pixels(int(pix_idx[k]))
            if truth.shape != pixels.shape:
                continue
            p = images.psnr(truth, pixels)
            psnr_v[k] = p if np.isfinite(p) else 99.0
            pixel_ok = (
                np.array_equal(truth, pixels)
                if fmts[k] not in images.LOSSY_FORMATS
                else p >= PSNR_MIN
            )
            caption_ok = True
            if self.check_caption:
                expected = f"caption for {ids[k]}: {gh[k].decode()}"
                caption_ok = captions[k] == expected
            ok[k] = pixel_ok and caption_ok
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "ok": pa.array(ok),
                "psnr": pa.array(psnr_v),
                "w": pa.array(ws),
                "h": pa.array(hs),
            }
        )


def decode_invariant(ds, concurrency=(1, 8), batch_size: int = 256):
    """Run the decode+invariant actor pool over an images Dataset."""
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
        .groupby("phash")
        .aggregate(Min("idx", alias_name="first_id"), Count(alias_name="n_copies"))
        .select_columns(["first_id", "n_copies"])
    )
