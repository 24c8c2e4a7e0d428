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
    assert mc.detect_media_format(mc.encode_jpeg(_gradient(2, 2))) == "jpeg"
    assert mc.detect_media_format(b"\x00\x01 unknown-container") is None


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


def test_jpeg_uniform_blocks_exact():
    """Uniform 8x8-aligned color regions are DC-only: the baseline JPEG
    round trip at quality 95 reproduces them exactly."""
    from high_performance_parallel_search_engine_ray.functions import jpegcodec as jc

    px = np.zeros((16, 24, 3), np.uint8)
    px[:8] = [200, 30, 90]
    px[8:] = [10, 250, 120]
    out = jc.decode_jpeg(jc.encode_jpeg(px, quality=95))
    assert out.shape == px.shape
    assert np.array_equal(out, px)


def test_jpeg_gradient_roundtrip_tolerance():
    """Lossy but bounded: a gradient with odd (non-multiple-of-8) dims
    survives encode/decode within tight error at quality 90; padding never
    leaks into the cropped output shape."""
    from high_performance_parallel_search_engine_ray.functions import jpegcodec as jc

    yy, xx = np.mgrid[0:21, 0:13]
    px = np.stack(
        [(xx * 19) % 256, (yy * 11) % 256, (xx + yy) % 256], -1
    ).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(px, quality=90))
    assert out.shape == (21, 13, 3)
    diff = np.abs(out.astype(int) - px.astype(int))
    assert diff.mean() < 3 and diff.max() <= 32


def test_jpeg_grayscale_single_component():
    """A 1-component (grayscale) baseline stream decodes via the generic
    MCU loop and replicates to 3 channels."""
    import struct
    import zlib  # noqa: F401 — parallel to the PNG helpers' imports

    from high_performance_parallel_search_engine_ray.functions.jpegcodec import (
        DCT_M, HT_AC_LUM, HT_DC_LUM, ZIGZAG, _BitWriter, _blockify,
        _huff_codes, _magnitude, _quality_tables, decode_jpeg,
    )

    g = ((np.arange(16)[:, None] * 16 + np.arange(16)[None, :]) % 256).astype(
        np.uint8
    )
    qy, _ = _quality_tables(95)
    blocks = _blockify(g.astype(float)) - 128.0
    coef = np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)
    quant = np.round(coef / qy).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
    dc, ac = _huff_codes(*HT_DC_LUM), _huff_codes(*HT_AC_LUM)
    bw = _BitWriter()
    pred = 0
    for zz in quant:
        size, bits = _magnitude(int(zz[0]) - pred)
        pred = int(zz[0])
        c, ln = dc[size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac[0xF0]
                bw.write(c, ln)
                run -= 16
            size, bits = _magnitude(v)
            c, ln = ac[(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
        if run:
            c, ln = ac[0x00]
            bw.write(c, ln)

    def seg(m, b):
        return struct.pack(">HH", m, len(b) + 2) + b

    data = bytearray(b"\xff\xd8")
    data += seg(0xFFDB, bytes([0]) + bytes(qy.reshape(64)[ZIGZAG].astype(np.uint8)))
    data += seg(0xFFC0, bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0]))
    data += seg(0xFFC4, bytes([0x00]) + bytes(HT_DC_LUM[0]) + bytes(HT_DC_LUM[1]))
    data += seg(0xFFC4, bytes([0x10]) + bytes(HT_AC_LUM[0]) + bytes(HT_AC_LUM[1]))
    data += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    data += bw.flush() + b"\xff\xd9"
    out = decode_jpeg(bytes(data))
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.max(np.abs(out[:, :, 0].astype(int) - g.astype(int))) <= 2


def test_jpeg_420_subsampled_decode():
    """A hand-built 4:2:0 stream (2x2 luma blocks + 1 chroma block per
    MCU) decodes through the generic sampling-factor MCU loop; a uniform
    color reproduces exactly after chroma upsampling."""
    import struct

    from high_performance_parallel_search_engine_ray.functions.jpegcodec import (
        DCT_M, HT_AC_CHR, HT_AC_LUM, HT_DC_CHR, HT_DC_LUM, ZIGZAG,
        _BitWriter, _blockify, _huff_codes, _magnitude, _quality_tables,
        decode_jpeg,
    )

    h = w = 16  # one 4:2:0 MCU = 16x16 luma, 8x8 chroma
    rgb = np.full((h, w, 3), [120, 200, 60], np.uint8)
    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    cb_s = cb.reshape(8, 2, 8, 2).mean(axis=(1, 3))  # 2x2 average subsample
    cr_s = cr.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    qy, qc = _quality_tables(95)

    def quantize(plane, qt):
        blocks = _blockify(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)
        return np.round(coef / qt).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]

    yq, cbq, crq = quantize(y, qy), quantize(cb_s, qc), quantize(cr_s, qc)
    tabs = {
        0: (_huff_codes(*HT_DC_LUM), _huff_codes(*HT_AC_LUM)),
        1: (_huff_codes(*HT_DC_CHR), _huff_codes(*HT_AC_CHR)),
    }
    bw = _BitWriter()
    pred = {0: 0, 1: 0, 2: 0}

    def put_block(zz, comp, tid):
        dc, ac = tabs[tid]
        size, bits = _magnitude(int(zz[0]) - pred[comp])
        pred[comp] = int(zz[0])
        c, ln = dc[size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac[0xF0]
                bw.write(c, ln)
                run -= 16
            size, bits = _magnitude(v)
            c, ln = ac[(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
        if run:
            c, ln = ac[0x00]
            bw.write(c, ln)

    # MCU order: Y blocks raster within MCU (2x2), then Cb, then Cr.
    # _blockify of the 16x16 Y plane yields raster block order 0,1,2,3
    # which matches the (by,bx) order for a single MCU.
    for bi in range(4):
        put_block(yq[bi], 0, 0)
    put_block(cbq[0], 1, 1)
    put_block(crq[0], 2, 1)

    def seg(m, b):
        return struct.pack(">HH", m, len(b) + 2) + b

    data = bytearray(b"\xff\xd8")
    data += seg(0xFFDB, bytes([0]) + bytes(qy.reshape(64)[ZIGZAG].astype(np.uint8)))
    data += seg(0xFFDB, bytes([1]) + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8)))
    data += seg(
        0xFFC0,
        bytes([8]) + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    data += seg(0xFFC4, bytes([0x00]) + bytes(HT_DC_LUM[0]) + bytes(HT_DC_LUM[1]))
    data += seg(0xFFC4, bytes([0x10]) + bytes(HT_AC_LUM[0]) + bytes(HT_AC_LUM[1]))
    data += seg(0xFFC4, bytes([0x01]) + bytes(HT_DC_CHR[0]) + bytes(HT_DC_CHR[1]))
    data += seg(0xFFC4, bytes([0x11]) + bytes(HT_AC_CHR[0]) + bytes(HT_AC_CHR[1]))
    data += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    data += bw.flush() + b"\xff\xd9"
    out = decode_jpeg(bytes(data))
    assert out.shape == (16, 16, 3)
    assert np.max(np.abs(out.astype(int) - rgb.astype(int))) <= 1


def test_jpeg_restart_intervals():
    """A DRI=1 grayscale stream with an RSTn marker between MCUs decodes
    correctly: DC prediction resets at each restart segment."""
    import struct

    from high_performance_parallel_search_engine_ray.functions.jpegcodec import (
        DCT_M, HT_AC_LUM, HT_DC_LUM, ZIGZAG, _BitWriter, _blockify,
        _huff_codes, _magnitude, _quality_tables, decode_jpeg,
    )

    g = np.zeros((8, 16), np.uint8)
    g[:, :8] = 40
    g[:, 8:] = 200
    qy, _ = _quality_tables(95)
    blocks = _blockify(g.astype(float)) - 128.0
    coef = np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)
    quant = np.round(coef / qy).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
    dc, ac = _huff_codes(*HT_DC_LUM), _huff_codes(*HT_AC_LUM)

    def entropy_for(zz, pred):
        bw = _BitWriter()
        size, bits = _magnitude(int(zz[0]) - pred)
        c, ln = dc[size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac[0xF0]
                bw.write(c, ln)
                run -= 16
            size, bits = _magnitude(v)
            c, ln = ac[(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
        if run:
            c, ln = ac[0x00]
            bw.write(c, ln)
        return bw.flush()

    # DRI=1: each MCU is its own restart segment, DC pred resets to 0.
    # The restart marker is preceded by a 0xFF fill byte (T.81 B.1.1.2
    # allows any number) — the segment splitter must step past it.
    entropy = entropy_for(quant[0], 0) + b"\xff\xff\xd0" + entropy_for(quant[1], 0)

    def seg(m, b):
        return struct.pack(">HH", m, len(b) + 2) + b

    data = bytearray(b"\xff\xd8")
    data += seg(0xFFDB, bytes([0]) + bytes(qy.reshape(64)[ZIGZAG].astype(np.uint8)))
    data += seg(0xFFC0, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
    data += seg(0xFFC4, bytes([0x00]) + bytes(HT_DC_LUM[0]) + bytes(HT_DC_LUM[1]))
    data += seg(0xFFC4, bytes([0x10]) + bytes(HT_AC_LUM[0]) + bytes(HT_AC_LUM[1]))
    data += seg(0xFFDD, struct.pack(">H", 1))  # DRI = 1 MCU
    data += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    data += bytes(entropy) + b"\xff\xd9"
    out = decode_jpeg(bytes(data))
    assert out.shape == (8, 16, 3)
    assert np.max(np.abs(out[:, :8, 0].astype(int) - 40)) <= 1
    assert np.max(np.abs(out[:, 8:, 0].astype(int) - 200)) <= 1


def test_jpeg_progressive_rejected():
    from high_performance_parallel_search_engine_ray.functions import jpegcodec as jc

    d = jc.encode_jpeg(_gradient(8, 8), quality=90)
    i = d.find(b"\xff\xc0")
    with pytest.raises(ValueError, match="baseline"):
        jc.decode_jpeg(d[:i] + b"\xff\xc2" + d[i + 2 :])


def test_jpeg_unsupported_shapes_raise_not_garble():
    """CMYK (4-component) and non-interleaved multi-scan streams raise at
    the seam instead of silently returning wrong pixels; a grayscale frame
    declaring 2x2 sampling decodes via the spec's non-interleaved
    one-block-per-MCU geometry."""
    import struct

    from high_performance_parallel_search_engine_ray.functions import jpegcodec as jc

    d = jc.encode_jpeg(_gradient(8, 8), quality=90)
    i = d.find(b"\xff\xc0")
    (sof_len,) = struct.unpack_from(">H", d, i + 2)
    body = bytearray(d[i + 4 : i + 2 + sof_len])
    # 4-component SOF: bump nc and append a fake K component
    body4 = bytes(body[:5]) + bytes([4]) + bytes(body[6:]) + bytes([4, 0x11, 1])
    sof4 = struct.pack(">HH", 0xFFC0, len(body4) + 2) + body4
    with pytest.raises(ValueError, match="CMYK|component"):
        jc.decode_jpeg(d[:i] + sof4 + d[i + 2 + sof_len :])

    # SOS listing only 1 of the frame's 3 components = multi-scan layout
    j = d.find(b"\xff\xda")
    sos1 = struct.pack(">HH", 0xFFDA, 8) + bytes([1, 1, 0x00, 0, 63, 0])
    (sos_len,) = struct.unpack_from(">H", d, j + 2)
    with pytest.raises(ValueError, match="multi-scan"):
        jc.decode_jpeg(d[:j] + sos1 + d[j + 2 + sos_len :])

    # grayscale with 2x2 sampling factors: same pixels as 1x1 sampling
    def gray_stream(samp):
        from high_performance_parallel_search_engine_ray.functions.jpegcodec import (
            DCT_M, HT_AC_LUM, HT_DC_LUM, ZIGZAG, _BitWriter, _blockify,
            _huff_codes, _magnitude, _quality_tables,
        )

        g = ((np.arange(16)[:, None] * 7 + np.arange(16)[None, :] * 3) % 256
             ).astype(np.uint8)
        qy, _ = _quality_tables(95)
        blocks = _blockify(g.astype(float)) - 128.0
        coef = np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)
        quant = np.round(coef / qy).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        dc, ac = _huff_codes(*HT_DC_LUM), _huff_codes(*HT_AC_LUM)
        bw = _BitWriter()
        pred = 0
        for zz in quant:
            size, bits = _magnitude(int(zz[0]) - pred)
            pred = int(zz[0])
            c, ln = dc[size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac[0xF0]
                    bw.write(c, ln)
                    run -= 16
                size, bits = _magnitude(v)
                c, ln = ac[(run << 4) | size]
                bw.write(c, ln)
                bw.write(bits, size)
                run = 0
            if run:
                c, ln = ac[0x00]
                bw.write(c, ln)

        def seg(m, b):
            return struct.pack(">HH", m, len(b) + 2) + b

        data = bytearray(b"\xff\xd8")
        data += seg(0xFFDB, bytes([0]) + bytes(qy.reshape(64)[ZIGZAG].astype(np.uint8)))
        data += seg(0xFFC0, bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, samp, 0]))
        data += seg(0xFFC4, bytes([0x00]) + bytes(HT_DC_LUM[0]) + bytes(HT_DC_LUM[1]))
        data += seg(0xFFC4, bytes([0x10]) + bytes(HT_AC_LUM[0]) + bytes(HT_AC_LUM[1]))
        data += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        data += bw.flush() + b"\xff\xd9"
        return bytes(data)

    out11 = jc.decode_jpeg(gray_stream(0x11))
    out22 = jc.decode_jpeg(gray_stream(0x22))
    assert np.array_equal(out11, out22)


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
    # JPEG leg: decode -> resize -> lossy re-encode; bounded error, not exact
    big = np.repeat(np.repeat(_gradient(4, 4), 4, 0), 4, 1)  # 16x16, smooth
    out = mm.MediaResizeStage(target_w=8, target_h=8, decode=True)(
        _media_row(mc.encode_jpeg(big))
    )
    got = mc.decode_jpeg(out["payload"].to_pylist()[0])
    want = mc.resize_nearest(big, 8, 8)
    assert got.shape == (8, 8, 3)
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 8


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
            if f == "jpeg":
                return f, mc.decode_jpeg(d)
            return f, mc.decode_ppm(d)[0]

        fmt, px = dec(r["payload"])
        assert px.shape == (5, 6, 3)
        # spot-check: output (0,0) is the source's (0,0) pixel (JPEG legs
        # are lossy on BOTH decode and re-encode — tolerance there)
        sfmt, spx = dec(media[r["media_id"]]["payload"])
        if fmt == "jpeg":
            assert np.abs(px[0, 0].astype(int) - spx[0, 0].astype(int)).max() <= 32
        else:
            assert np.array_equal(px[0, 0], spx[0, 0])
        assert fmt == sfmt  # re-encoded in the SAME format
    assert n_img > 0
    fmts = {mc.detect_media_format(r["payload"]) for r in out
            if r["media_type"] == "image"}
    assert fmts >= {"png"}  # generator emits compressed formats too


def test_media_frame_samples_decoded_pipeline(ray_session):
    out = mm.media_frame_samples_decoded(_docs(), interval_ms=1000).take_all()
    assert out
    for r in out:
        px, _ = mc.decode_ppm(r["payload"])
        assert px.shape == (6, 8, 3)  # attach_decodable_media's frame shape
