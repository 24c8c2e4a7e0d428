"""Value tests for the real media decode path (VERDICT round-3 item 5).

Pure-numpy codecs (BMP / P6 PPM / PCM16 WAV / P6-stream video) and the
multimodal stages' decode=True paths: planted gradient images produce KNOWN
histograms and KNOWN nearest-neighbor resize pixels; planted PCM ramps
produce known amplitude histograms; planted P6 streams sample the expected
source frames. Compressed payloads still hit the contract stub
(NotImplementedError at the PIL/pyav seam) — covered in test_pipelines.py.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from high_performance_parallel_search_engine_ray.functions import mediacodec as mc
from high_performance_parallel_search_engine_ray.pipelines import multimodal as mm


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(1, w - 1)).astype(np.uint8),
            (yy * 255 // max(1, h - 1)).astype(np.uint8),
            ((xx + yy) % 256).astype(np.uint8),
        ],
        axis=-1,
    )


# ------------------------------------------------------------- codecs


def test_bmp_roundtrip_exact():
    px = _gradient(4, 4)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(px)), px)


def test_bmp_row_padding_roundtrip():
    # w=3 -> 9-byte rows pad to 12; padding must not leak into pixels
    px = _gradient(5, 3)
    data = mc.encode_bmp(px)
    assert (len(data) - 54) % 4 == 0
    assert np.array_equal(mc.decode_bmp(data), px)


def test_ppm_roundtrip_and_stream_walk():
    a, b = _gradient(2, 3), _gradient(4, 2)
    stream = mc.encode_ppm(a) + mc.encode_ppm(b)
    frames = mc.decode_ppm_stream(stream)
    assert len(frames) == 2
    assert np.array_equal(frames[0], a) and np.array_equal(frames[1], b)


def test_ppm_header_comments():
    px = _gradient(2, 2)
    data = b"P6\n# a netpbm comment\n2 2\n255\n" + px.tobytes()
    out, end = mc.decode_ppm(data)
    assert np.array_equal(out, px) and end == len(data)


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.arange(-5, 6) * 1000).astype(np.int16)
    s, rate = mc.decode_wav(mc.encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(s, mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    s2, rate2 = mc.decode_wav(mc.encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (11, 2) and np.array_equal(s2, stereo)


def test_detect_media_format():
    assert mc.detect_media_format(mc.encode_bmp(_gradient(2, 2))) == "bmp"
    assert mc.detect_media_format(mc.encode_ppm(_gradient(2, 2))) == "ppm"
    assert mc.detect_media_format(mc.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert mc.detect_media_format(mc.encode_png(_gradient(2, 2))) == "png"
    assert mc.detect_media_format(b"\xff\xd8\xff jpeg-ish") is None


def test_png_roundtrip_rgb_and_rgba():
    px = _gradient(5, 3)
    assert np.array_equal(mc.decode_png(mc.encode_png(px)), px)
    rgba = np.dstack([px, ((np.arange(15) * 17) % 256).reshape(5, 3).astype(np.uint8)])
    out = mc.decode_png(mc.encode_png(rgba))
    assert out.shape == (5, 3, 4) and np.array_equal(out, rgba)


def _png_with_filters(px, ftypes):
    """Forward-filter each row with the given per-row filter types (the
    encoder only emits filter 0; external PNGs use all five)."""
    import struct
    import zlib

    h, w, c = px.shape
    cur = px.reshape(h, w * c).astype(np.int32)
    prev = np.zeros(w * c, np.int32)
    raws = []
    for y in range(h):
        row, ftype = cur[y], ftypes[y % len(ftypes)]
        left = np.zeros_like(row)
        left[c:] = row[:-c]
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = (row - left) & 0xFF
        elif ftype == 2:
            filt = (row - prev) & 0xFF
        elif ftype == 3:
            filt = (row - ((left + prev) // 2)) & 0xFF
        else:  # Paeth
            ul = np.zeros_like(prev)
            ul[c:] = prev[:-c]
            p = left + prev - ul
            pa_, pb, pc_ = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            filt = (row - pred) & 0xFF
        raws.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return (
        mc.PNG_MAGIC
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + mc._png_chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    rng = np.random.default_rng(7)
    for c in (3, 4):
        px = rng.integers(0, 256, (8, 6, c), dtype=np.uint8)
        for ftype in range(5):
            got = mc.decode_png(_png_with_filters(px, [ftype]))
            assert np.array_equal(got, px), f"filter {ftype}, {c} channels"
        # mixed per-row filters, the realistic external-encoder case
        got = mc.decode_png(_png_with_filters(px, [0, 1, 2, 3, 4]))
        assert np.array_equal(got, px)


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    def mk(depth, color_type, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color_type, 0, 0, interlace)
        return (
            mc.PNG_MAGIC
            + mc._png_chunk(b"IHDR", ihdr)
            + mc._png_chunk(b"IDAT", zlib.compress(b"\x00" * 8))
            + mc._png_chunk(b"IEND", b"")
        )

    for bad in (mk(16, 2), mk(8, 0), mk(8, 3), mk(8, 2, interlace=1)):
        with pytest.raises(ValueError):
            mc.decode_png(bad)


def test_resize_nearest_known_values():
    px = _gradient(4, 4)
    out = mc.resize_nearest(px, 2, 2)
    # floor mapping: dst (0,1) -> src (0,2) on both axes
    assert np.array_equal(out, px[[0, 2]][:, [0, 2]])
    # upscale replicates
    up = mc.resize_nearest(px[:1, :1], 3, 3)
    assert (up == px[0, 0]).all() and up.shape == (3, 3, 3)


# ----------------------------------------------------- stage value tests


def _media_row(payload, mt="image", dur=-1):
    return pa.table(
        {
            "media_id": pa.array(["m1"], pa.string()),
            "media_type": pa.array([mt], pa.string()),
            "payload": pa.array([payload], pa.large_binary()),
            "width": pa.array([-1], pa.int32()),
            "height": pa.array([-1], pa.int32()),
            "duration_ms": pa.array([dur], pa.int32()),
        }
    )


def test_feature_stage_decoded_known_histogram():
    # half black / half white image: luminance 0 and 255 -> bins 0 and 15
    px = np.zeros((2, 4, 3), np.uint8)
    px[:, 2:, :] = 255
    for enc in (mc.encode_bmp, mc.encode_png):  # PNG: the compressed path
        out = mm.MediaFeatureStage(decode=True)(_media_row(enc(px)))
        f = np.array(out["features"].to_pylist()[0])
        assert f[0] == pytest.approx(0.5) and f[15] == pytest.approx(0.5)
        assert f[1:15].sum() == 0 and f[16] == 8.0  # 8 pixels
        assert out["n_bytes"].to_pylist()[0] == len(enc(px))


def test_feature_stage_decoded_wav_amplitudes():
    # all samples at int16 minimum -> amplitude bucket 0
    samples = np.full(100, -32768, np.int16)
    out = mm.MediaFeatureStage(decode=True)(
        _media_row(mc.encode_wav(samples), mt="audio", dur=10)
    )
    f = np.array(out["features"].to_pylist()[0])
    assert f[0] == pytest.approx(1.0) and f[16] == 100.0


def test_feature_stage_decoded_video_all_frames():
    # 2 frames: one all-black, one all-white -> 50/50 luminance split
    black = np.zeros((2, 2, 3), np.uint8)
    white = np.full((2, 2, 3), 255, np.uint8)
    stream = mc.encode_ppm(black) + mc.encode_ppm(white)
    out = mm.MediaFeatureStage(decode=True)(
        _media_row(stream, mt="video", dur=2000)
    )
    f = np.array(out["features"].to_pylist()[0])
    assert f[0] == pytest.approx(0.5) and f[15] == pytest.approx(0.5)
    assert f[16] == 8.0


def test_resize_stage_decoded_known_pixels():
    px = _gradient(4, 4)
    for codec_enc, codec_dec in ((mc.encode_bmp, mc.decode_bmp),
                                 (mc.encode_ppm, lambda d: mc.decode_ppm(d)[0]),
                                 (mc.encode_png, mc.decode_png)):
        out = mm.MediaResizeStage(target_w=2, target_h=2, decode=True)(
            _media_row(codec_enc(px))
        )
        got = codec_dec(out["payload"].to_pylist()[0])
        assert np.array_equal(got, px[[0, 2]][:, [0, 2]])
        assert out["width"].to_pylist() == [2]
        assert out["height"].to_pylist() == [2]


def test_frame_stage_decoded_samples_expected_frames():
    frames = [np.full((2, 2, 3), v, np.uint8) for v in (10, 120, 240)]
    stream = b"".join(mc.encode_ppm(f) for f in frames)
    # dur 3000 / interval 1000 -> 3 samples at ts 0/1000/2000 -> src 0/1/2
    out = mm.FrameSampleStage(interval_ms=1000, decode=True)(
        _media_row(stream, mt="video", dur=3000)
    )
    assert out.num_rows == 3
    for i in range(3):
        got, _ = mc.decode_ppm(out["payload"].to_pylist()[i])
        assert np.array_equal(got, frames[i])
        assert out["ts_ms"].to_pylist()[i] == i * 1000
    # interval 1500 -> 2 samples at ts 0/1500 -> src frames 0 and 1
    out2 = mm.FrameSampleStage(interval_ms=1500, decode=True)(
        _media_row(stream, mt="video", dur=3000)
    )
    assert out2.num_rows == 2
    got2, _ = mc.decode_ppm(out2["payload"].to_pylist()[1])
    assert np.array_equal(got2, frames[1])


def test_frame_stage_decoded_compressed_seam():
    with pytest.raises(NotImplementedError):
        mm.FrameSampleStage(decode=True)(
            _media_row(b"\x00\x00\x00\x18ftypmp42", mt="video", dur=2000)
        )


# ------------------------------------------------- pipeline-level drives


def _docs():
    return rd.from_items(
        [{"doc_id": i, "text": f"doc {i} body"} for i in range(24)]
    )


def test_media_features_decoded_pipeline(ray_session):
    out = mm.media_features_decoded(_docs()).take_all()
    assert len(out) == 24
    for r in out:
        f = np.array(r["features"])
        assert len(f) == mm.MediaFeatureStage.FEATURE_DIM
        assert f[:16].sum() == pytest.approx(1.0, abs=1e-5)
        assert f[16] > 0


def test_media_resize_decoded_pipeline(ray_session):
    media = {r["media_id"]: r for r in mm.attach_decodable_media(_docs()).take_all()}
    out = mm.media_resize_decoded(_docs(), target_w=6, target_h=5).take_all()
    n_img = 0
    for r in out:
        if r["media_type"] != "image":
            assert r["payload"] == media[r["media_id"]]["payload"]
            continue
        n_img += 1

        def dec(d):
            f = mc.detect_media_format(d)
            if f == "bmp":
                return f, mc.decode_bmp(d)
            if f == "png":
                return f, mc.decode_png(d)
            return f, mc.decode_ppm(d)[0]

        fmt, px = dec(r["payload"])
        assert px.shape == (5, 6, 3)
        # spot-check: output (0,0) is the source's (0,0) pixel
        sfmt, spx = dec(media[r["media_id"]]["payload"])
        assert np.array_equal(px[0, 0], spx[0, 0])
        assert fmt == sfmt  # re-encoded in the SAME format
    assert n_img > 0
    assert {mc.detect_media_format(r["payload"]) for r in out
            if r["media_type"] == "image"} >= {"png"}  # generator emits PNGs


def test_media_frame_samples_decoded_pipeline(ray_session):
    out = mm.media_frame_samples_decoded(_docs(), interval_ms=1000).take_all()
    assert out
    for r in out:
        px, _ = mc.decode_ppm(r["payload"])
        assert px.shape == (6, 8, 3)  # attach_decodable_media's frame shape
