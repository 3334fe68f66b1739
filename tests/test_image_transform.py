"""Image transform stages: resize, features, video frame-sample plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from georay import images
from georay.ops.images import ImageTransform, resize_bilinear, sample_video_frames


def test_resize_identity():
    px = images.synth_pixels(3)
    out = resize_bilinear(px, px.shape[1], px.shape[0])
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


def test_resize_constant_image():
    px = np.full((20, 30, 3), 137, dtype=np.uint8)
    out = resize_bilinear(px, 7, 5)
    assert out.shape == (5, 7, 3)
    assert (out == 137).all()


def test_resize_downscale_preserves_gradient():
    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(32, dtype=np.uint8)[None, :] * 8
    out = resize_bilinear(px, 8, 8)
    r = out[0, :, 0].astype(int)
    assert (np.diff(r) > 0).all()  # still monotonically increasing


def test_image_features_pipeline(ray_session):
    import ray

    from georay import fixtures
    from georay.ops.images import image_features

    t = fixtures.make_image_rows(np.arange(64))
    out = image_features(
        ray.data.from_arrow(t.select(["image_id", "fmt", "bytes"])).repartition(3)
    ).to_pandas()
    assert len(out) == 64
    assert set(out.columns) == {
        "image_id", "thumb", "mean_r", "mean_g", "mean_b", "luma_std", "thumb_hash"
    }
    assert ((out["mean_r"] >= 0) & (out["mean_r"] <= 255)).all()
    # duplicate rows (i%64==63 carries i-1 pixels) share the thumb hash
    by_id = out.set_index("image_id")["thumb_hash"]
    assert by_id["img000000000063"] == by_id["img000000000062"]
    # thumbs decode back to the right shape
    th = images.decode_image(out["thumb"].iloc[0], "q6")
    assert th.shape == (16, 16, 3)


def _make_raw_video(vid: int, w=8, h=6, nf=25) -> bytes:
    rng = np.random.RandomState(vid)
    frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
    import struct

    return struct.pack("<HHH", w, h, nf) + frames.tobytes()


def test_sample_video_frames(ray_session):
    import ray

    blobs = [_make_raw_video(1), _make_raw_video(2, nf=7)]
    t = pa.table(
        {
            "video_id": ["v1", "v2"],
            "fmt": ["rawv", "rawv"],
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
    out = sample_video_frames(ray.data.from_arrow(t), every_n=10).to_pandas()
    assert list(out[out["video_id"] == "v1"]["frame_idx"]) == [0, 10, 20]
    assert list(out[out["video_id"] == "v2"]["frame_idx"]) == [0]
    frame = np.frombuffer(out["frame_rgb"].iloc[0], dtype=np.uint8).reshape(6, 8, 3)
    want = np.random.RandomState(1).randint(0, 256, size=(25, 6, 8, 3), dtype=np.uint8)[0]
    assert np.array_equal(frame, want)


def test_sample_video_unknown_codec_raises(ray_session):
    import ray

    t = pa.table(
        {
            "video_id": ["v1"],
            "fmt": ["mp4"],
            "bytes": pa.array([b"\x00" * 100], pa.binary()),
        }
    )
    with pytest.raises(Exception, match="ffmpeg|NotImplemented|video codec"):
        sample_video_frames(ray.data.from_arrow(t)).to_pandas()


def _make_raw_audio(freq=440.0, rate=8000, secs=0.5, chans=1) -> bytes:
    import struct

    t = np.arange(int(rate * secs)) / rate
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    if chans == 2:
        x = np.stack([x, x], axis=1).reshape(-1)
    return struct.pack("<IH", rate, chans) + x.tobytes()


def test_audio_features(ray_session):
    import ray

    from georay.ops.images import audio_features

    t = pa.table(
        {
            "audio_id": ["a1", "a2"],
            "fmt": ["rawa", "rawa"],
            "bytes": pa.array([_make_raw_audio(), _make_raw_audio(freq=880, chans=2)], pa.binary()),
        }
    )
    out = audio_features(ray.data.from_arrow(t)).to_pandas().set_index("audio_id")
    assert out.loc["a1", "duration_ms"] == 500
    assert abs(out.loc["a1", "rms"] - 0.5 / np.sqrt(2)) < 0.01  # sine RMS
    # 440 Hz over 0.5 s -> ~440 zero crossings (2 per cycle * 220 cycles)
    assert 430 <= out.loc["a1", "zero_crossings"] <= 450
    assert out.loc["a2", "zero_crossings"] > out.loc["a1", "zero_crossings"]


def test_audio_unknown_codec_raises(ray_session):
    import ray

    from georay.ops.images import audio_features

    t = pa.table(
        {"audio_id": ["x"], "fmt": ["mp3"], "bytes": pa.array([b"\x00" * 50], pa.binary())}
    )
    with pytest.raises(Exception, match="audio codec|NotImplemented"):
        audio_features(ray.data.from_arrow(t)).to_pandas()


def test_scene_cuts_planted_jump(ray_session):
    """A video whose frames are constant except one hard jump must report
    exactly 2 cuts (into and out of... no — one transition per boundary:
    constant→bright counts once) at the 7·fb threshold."""
    import struct

    import ray

    from georay.ops.images import scene_cuts

    w, h, nf = 4, 4, 6
    fb = w * h * 3
    frames = np.zeros((nf, fb), dtype=np.uint8)
    frames[:] = 10
    frames[3] = 200  # one bright frame → cuts at 2->3 and 3->4
    blob = struct.pack("<HHH", w, h, nf) + frames.tobytes()
    flat = np.full((nf, fb), 10, dtype=np.uint8)  # no jump anywhere
    blob2 = struct.pack("<HHH", w, h, nf) + flat.tobytes()
    t = pa.table(
        {
            "video_id": ["v1", "v2"],
            "fmt": ["rawv", "rawv"],
            "bytes": pa.array([blob, blob2], pa.binary()),
        }
    )
    out = scene_cuts(ray.data.from_arrow(t)).to_pandas().set_index("video_id")
    assert out.loc["v1", "n_frames"] == nf and out.loc["v1", "n_cuts"] == 2
    assert out.loc["v2", "n_cuts"] == 0

    bad = pa.table({"video_id": ["x"], "fmt": ["mp4"],
                    "bytes": pa.array([b"\x00" * 32], pa.binary())})
    with pytest.raises(Exception, match="ffmpeg|video codec"):
        scene_cuts(ray.data.from_arrow(bad)).to_pandas()
