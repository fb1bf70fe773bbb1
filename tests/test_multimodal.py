import numpy as np
import pytest

import ray.data as rd

from node_shovel_ray.functions import media_codec as mc
from node_shovel_ray.stages.multimodal import (
    FrameSample,
    ImageFeatures,
    ImageResize,
    gen_media,
    media_pipeline,
    synth_media_from_ids,
)


def test_gen_media_deterministic():
    a, b = gen_media(8, seed=1), gen_media(8, seed=1)
    assert a.equals(b)
    assert not a.equals(gen_media(8, seed=2))


def test_unknown_codec_rejected():
    with pytest.raises(ValueError):
        ImageFeatures(codec="jpeg2000")


# ------------------------------------------------------------ codec goldens


@pytest.mark.parametrize("w", [1, 2, 3, 4, 17])  # exercise all pad widths
def test_bmp_roundtrip(w):
    rng = np.random.default_rng(w)
    img = rng.integers(0, 256, size=(5, w, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)


def test_bmp_golden_header():
    # pinned bytes for a 1×1 red pixel — guards the published layout, not
    # just self-consistency: BM magic, 54-byte offset, BGR order, row pad
    b = mc.encode_bmp(np.array([[[255, 0, 0]]], dtype=np.uint8))
    assert b[:2] == b"BM"
    assert b[10] == 54  # pixel data offset
    assert b[28] == 24  # bpp
    assert b[54:58] == bytes([0, 0, 255, 0])  # BGR + 1 pad byte


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    enc = mc.encode_ppm(img)
    assert enc.startswith(b"P6\n6 4\n255\n")
    dec, end = mc.decode_ppm(enc)
    assert np.array_equal(dec, img) and end == len(enc)
    # netpbm grammar: '#' comments between header fields
    commented = b"P6\n# a comment\n6 4\n255\n" + img.tobytes()
    assert np.array_equal(mc.decode_ppm(commented)[0], img)


def test_wav_roundtrip_mono_stereo():
    mono = (np.arange(100, dtype=np.int16) - 50) * 100
    s, sr = mc.decode_wav(mc.encode_wav(mono, 16000))
    assert sr == 16000 and np.array_equal(s, mono)
    stereo = np.stack([mono, -mono], axis=1)
    s2, sr2 = mc.decode_wav(mc.encode_wav(stereo, 44100))
    assert sr2 == 44100 and s2.shape == (100, 2) and np.array_equal(s2, stereo)


def test_wav_unknown_chunk_skipped():
    mono = np.array([1, -2, 3], dtype=np.int16)
    b = bytearray(mc.encode_wav(mono, 8000))
    # splice an unknown odd-sized chunk between WAVE and fmt (word-aligned)
    extra = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    spliced = bytes(b[:12]) + extra + bytes(b[12:])
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    s, sr = mc.decode_wav(spliced)
    assert sr == 8000 and np.array_equal(s, mono)


def test_resize_nearest():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = mc.resize_nearest(img, 2, 3)
    assert small.shape == (2, 3, 3)
    assert np.array_equal(small[0, 0], img[0, 0])  # integer grid, corner-anchored


def test_synth_media_closed_form():
    # the SQL-oracle content contract: decoded stats are pure arithmetic
    t = synth_media_from_ids([0, 1, 2, 97], kind="image")
    for row in t.to_pylist():
        m = row["media_id"]
        img = mc.decode_image(row["payload"])
        assert img.shape == (16 + m % 7, 16 + m % 13, 3)
        expect = ((m * 37) % 256 + (m * 37 + 11) % 256 + (m * 37 + 22) % 256) / 3
        assert img.mean() == pytest.approx(expect)


# ------------------------------------------------------------ fake plumbing


def test_features_pipeline():
    ds = rd.from_arrow(gen_media(32, kind="image"))
    out = media_pipeline(ds, "features", batch_size=8, concurrency=(1, 2)).to_pandas()
    assert len(out) == 32
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (32, 16)
    np.testing.assert_allclose(feats.sum(axis=1), 1.0, atol=1e-5)
    # deterministic across runs (retry safety)
    out2 = media_pipeline(
        rd.from_arrow(gen_media(32, kind="image")), "features",
        batch_size=8, concurrency=(1, 2),
    ).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["features"], b["features"]))


def test_resize_pipeline():
    ds = rd.from_arrow(gen_media(8, kind="image"))
    out = media_pipeline(ds, "resize", batch_size=4, concurrency=(1, 2)).to_pandas()
    assert (out["width"] == 64).all() and (out["height"] == 64).all()
    assert out["payload"].map(len).eq(64 * 64).all()


def test_frame_sample_flatmap():
    ds = rd.from_arrow(gen_media(6, kind="video"))
    out = media_pipeline(ds, "frames", batch_size=3, concurrency=(1, 2)).to_pandas()
    assert len(out) == 6 * 4  # 1 video row → 4 frame rows
    assert set(out["frame_idx"]) == {0, 1, 2, 3}
    assert out.groupby("media_id").size().eq(4).all()


# ------------------------------------------------------------ real decode


def test_real_image_pipeline():
    ids = list(range(20))
    ds = rd.from_arrow(synth_media_from_ids(ids, kind="image"))
    out = (
        media_pipeline(ds, "features", codec="real", batch_size=8,
                       concurrency=(1, 2))
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert out["decoded_w"].tolist() == [16 + m % 13 for m in ids]
    assert out["decoded_h"].tolist() == [16 + m % 7 for m in ids]
    expect = [
        ((m * 37) % 256 + (m * 37 + 11) % 256 + (m * 37 + 22) % 256) / 3
        for m in ids
    ]
    np.testing.assert_allclose(out["mean_pixel"].to_numpy(), expect, atol=1e-9)


def test_real_resize_roundtrip():
    ids = [2, 3, 10, 11]  # both BMP (even) and PPM (odd)
    ds = rd.from_arrow(synth_media_from_ids(ids, kind="image"))
    out = (
        media_pipeline(ds, "resize", codec="real", batch_size=2,
                       concurrency=(1, 2))
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    for _, row in out.iterrows():
        img = mc.decode_image(row["payload"])
        assert img.shape == (64, 64, 3)  # actually re-encoded at target size
        m = row["media_id"]
        # constant channels survive nearest-neighbor resize exactly
        for k in range(3):
            assert (img[:, :, k] == (m * 37 + k * 11) % 256).all()


def test_real_audio_pipeline():
    ids = list(range(12))
    ds = rd.from_arrow(synth_media_from_ids(ids, kind="audio"))
    out = (
        media_pipeline(ds, "audio", codec="real", batch_size=4,
                       concurrency=(1, 2))
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert out["n_samples"].tolist() == [800 + (m % 5) * 160 for m in ids]
    assert (out["sample_rate"] == 16000).all()
    np.testing.assert_allclose(
        out["mean_amp"].to_numpy(), [m % 997 - 498 for m in ids], atol=1e-9
    )


def test_real_frame_walk():
    ids = [0, 1, 2, 5]
    ds = rd.from_arrow(synth_media_from_ids(ids, kind="video"))
    out = (
        media_pipeline(ds, "frames", codec="real", batch_size=2,
                       concurrency=(1, 2))
        .to_pandas().sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    )
    assert len(out) == sum(3 + m % 3 for m in ids)
    assert (out["frame_w"] == 8).all() and (out["frame_h"] == 8).all()
    for _, row in out.iterrows():
        m, f = row["media_id"], row["frame_idx"]
        assert row["frame_mean"] == pytest.approx((m * 7 + f * 13) % 256)
