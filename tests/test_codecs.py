"""Pure-stdlib media codecs + the real multimodal decode path.

Independence of the oracles here matters: the PNG test FORWARD-filters
scanlines with spec formulas implemented in the test (the module only
implements the inverse), the WAV test writes files with the stdlib
``wave`` module (the codec hand-parses RIFF), and the BMP test checks a
hand-packed golden byte string — so encoder and decoder bugs cannot
cancel out.
"""

import struct
import wave
import zlib
from io import BytesIO

import numpy as np
import pytest

from communitydetection_jl_spark.functions import codecs
from communitydetection_jl_spark.operators.multimodal import (
    decode_features,
    decode_media,
    resize_images,
    sample_frames,
    synth_media,
    synth_media_real,
    synth_media_video,
)

# ------------------------------------------------------------------ PPM --


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


def test_ppm_header_comments():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = b"P6\n# a comment\n3 # widths\n 2\n# more\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_ppm(data), img)


# ------------------------------------------------------------------ BMP --


def test_bmp_golden_bytes():
    # 2x2 24bpp bottom-up BMP packed by hand per the spec:
    # rows are BGR, padded to 4 bytes (2*3=6 → pad 2), bottom row first.
    # image (top-down RGB): [[red, green], [blue, white]]
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    bottom_row = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # blue, white (BGR)
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"        # red, green (BGR)
    pixel_data = bottom_row + top_row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data),
                       2835, 2835, 0, 0)
    assert np.array_equal(codecs.decode_bmp(header + info + pixel_data), img)


def test_bmp_roundtrip_with_padding():
    rng = np.random.default_rng(11)
    for w in (1, 2, 3, 4, 7):  # exercise every row-padding residue
        img = rng.integers(0, 256, (3, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


# ------------------------------------------------------------------ PNG --


def _png_filter_forward(img: np.ndarray, filter_types: list[int]) -> bytes:
    """Test-side PNG scanline filtering straight from the spec — the
    module only implements the inverse, so this is an independent oracle."""
    h, w, ch = img.shape
    prev = np.zeros(w * ch, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        ft = filter_types[y]
        line = np.zeros(w * ch, dtype=np.int32)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (cur[i] - pred) & 0xFF
        out.append(ft)
        out += bytes(line.astype(np.uint8))
        prev = cur
    return bytes(out)


def _png_assemble(w, h, color_type, raw):
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_all_filter_types_decode():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    raw = _png_filter_forward(img, [0, 1, 2, 3, 4])
    data = _png_assemble(6, 5, 2, raw)
    assert np.array_equal(codecs.decode_png(data), img)


def test_png_roundtrip_rgb_rgba_gray():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (4, 7, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (3, 5, 4), dtype=np.uint8)
    gray = rng.integers(0, 256, (6, 2), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(rgb)), rgb)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(rgba)), rgba)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(gray)), gray)
    # decode_image drops alpha / expands gray
    assert codecs.decode_image(codecs.encode_png(rgba)).shape == (3, 5, 3)
    assert codecs.decode_image(codecs.encode_png(gray)).shape == (6, 2, 3)


def test_png_rejects_interlace():
    raw = _png_filter_forward(np.zeros((1, 1, 3), np.uint8), [0])

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        codecs.decode_png(data)


# ------------------------------------------------------------------ WAV --


def test_wav_stdlib_writer_is_decodable():
    rate, samples = 16000, (np.sin(np.arange(800) / 20.0) * 12000).astype(np.int16)
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:  # independent writer (stdlib)
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        stereo = np.column_stack([samples, -samples]).reshape(-1)
        wf.writeframes(stereo.tobytes())
    got_rate, got_ch, pcm = codecs.decode_wav(buf.getvalue())
    assert (got_rate, got_ch, pcm.shape) == (rate, 2, (800, 2))
    assert np.array_equal(pcm[:, 0], samples)
    assert np.array_equal(pcm[:, 1], -samples)


def test_wav_roundtrip_and_odd_chunk_padding():
    samples = np.arange(-50, 51, dtype=np.int16)
    data = codecs.encode_wav(samples, 8000)
    rate, ch, pcm = codecs.decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(pcm[:, 0], samples)
    # insert a LIST chunk with odd length before data: walker must
    # word-align past it
    fmt_end = data.index(b"data")
    padded = (data[:fmt_end] + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
              + data[fmt_end:])
    padded = padded[:4] + struct.pack("<I", len(padded) - 8) + padded[8:]
    rate2, _, pcm2 = codecs.decode_wav(padded)
    assert rate2 == 8000 and np.array_equal(pcm2, pcm)


# ------------------------------------------------------------- sniffing --


def test_sniff_format():
    img = np.zeros((2, 2, 3), np.uint8)
    assert codecs.sniff_format(codecs.encode_ppm(img)) == "ppm"
    assert codecs.sniff_format(codecs.encode_bmp(img)) == "bmp"
    assert codecs.sniff_format(codecs.encode_png(img)) == "png"
    assert codecs.sniff_format(codecs.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
    assert codecs.sniff_format(b"\x00\x01garbage") == "unknown"


def test_resize_nearest_exact_downscale():
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    half = codecs.resize_nearest(img, 4, 4)
    assert half.shape == (4, 4, 3)
    assert np.array_equal(half, img[::2, ::2])


# ----------------------------------------------------- Spark operators --


def test_decode_media_real_payloads(spark):
    media = synth_media_real(spark, n=24)
    rows = {r.media_id: r for r in decode_media(media).collect()}
    assert len(rows) == 24
    assert all(r.decoded for r in rows.values())
    for i, r in rows.items():
        if r.kind == "image":
            assert (r.height, r.width) == (12 + i % 9, 16 + i % 13)
            assert r.format in ("ppm", "bmp", "png")
            assert len(r.feature) == 48 and all(0.0 <= f <= 1.0 for f in r.feature)
            # red channel is a deterministic gradient: mean over x of (7x+i)%256
            w = r.width
            exp_r = float(np.mean([(x * 7 + i) % 256 for x in range(w)]))
            assert abs(r.mean_rgb[0] - exp_r) < 1e-9
        else:
            assert r.format == "wav" and r.sample_rate == 8000
            assert abs(r.duration - r.n_frames / 8000) < 1e-12
            # sine mix RMS ≈ sqrt((9000² + 3000²)/2)/32768 ≈ 0.2047
            assert 0.15 < r.rms < 0.25


def test_decode_media_quarantines_undecodable(spark):
    media = synth_media(spark, n=9)  # random-byte payloads, no real format
    rows = decode_media(media).collect()
    assert len(rows) == 9
    assert all(not r.decoded and r.width is None for r in rows)


def test_decode_features_real_mode(spark):
    media = synth_media_real(spark, n=8)
    rows = decode_features(media, feat_dim=48, deterministic_fake=False).collect()
    assert len(rows) == 8
    imgs = [r for r in rows if r.kind == "image"]
    assert imgs and all(r.n_frames == 1 for r in imgs)
    auds = [r for r in rows if r.kind == "audio"]
    assert auds and all(r.width == 8000 and r.n_frames > 0 for r in auds)


def test_decode_features_video_still_stubbed(spark):
    media = synth_media(spark, n=3)  # includes kind=video random bytes
    with pytest.raises(Exception, match="NotImplementedError|no pure-stdlib codec"):
        decode_features(media, deterministic_fake=False).collect()


def test_resize_images_real_pixels(spark):
    media = synth_media_real(spark, n=12)
    out = {r.media_id: r for r in resize_images(media, max_side=8).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()
           if r.kind == "image"}
    assert set(out) == set(src)
    for mid, r in out.items():
        assert max(r.width, r.height) <= 8
        small = codecs.decode_ppm(bytes(r.payload))
        assert small.shape == (r.height, r.width, 3)
        big = codecs.decode_image(src[mid])
        # nearest-neighbor: every output pixel exists in the source
        flat_src = {tuple(p) for p in big.reshape(-1, 3)}
        assert all(tuple(p) in flat_src for p in small.reshape(-1, 3))


# ------------------------------------------------------------------ AVI --


def test_avi_roundtrip_and_header_fields():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (7, 9, 14, 3), dtype=np.uint8)
    data = codecs.encode_avi(frames, fps=12)
    assert codecs.sniff_format(data) == "avi"
    fps, out = codecs.decode_avi(data)
    assert fps == 12
    assert np.array_equal(out, frames)
    # independent structural check: hand-walk the RIFF container with
    # struct (no codec code) and verify the public-spec header fields
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
    assert data[24:28] == b"avih"
    (us_per_frame, _mbps, _pad, flags, total, _init, n_streams,
     _buf, w, h) = struct.unpack_from("<10I", data, 32)
    assert us_per_frame == 1_000_000 // 12
    assert flags & 0x10  # AVIF_HASINDEX
    assert (total, n_streams, w, h) == (7, 1, 14, 9)
    # each 00db chunk carries one bottom-up padded-BGR DIB raster,
    # reconstructed here with test-local math (independent of _undib)
    row_len = (14 * 3 + 3) & ~3
    first = data.index(b"00db") + 8
    raster = np.frombuffer(data, np.uint8, 9 * row_len, first)
    rows = raster.reshape(9, row_len)[:, : 14 * 3].reshape(9, 14, 3)
    assert np.array_equal(rows[::-1, :, ::-1], frames[0])


def test_avi_rejects_compressed_and_truncated():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        codecs.decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    data = bytearray(codecs.encode_avi(frames))
    strf = bytes(data).index(b"strf") + 8
    # flip biCompression (offset 16 in BITMAPINFOHEADER) to MJPG
    data[strf + 16 : strf + 20] = b"MJPG"
    with pytest.raises(ValueError, match="only uncompressed"):
        codecs.decode_avi(bytes(data))


def test_decode_media_real_video(spark):
    media = synth_media_video(spark, n=10)
    rows = {r.media_id: r for r in decode_media(media).collect()}
    assert len(rows) == 10
    for i, r in rows.items():
        assert r.decoded and r.format == "avi" and r.kind == "video"
        assert (r.width, r.height) == (8 + i % 9, 8 + i % 7)
        assert r.n_frames == 4 + i % 13
        assert r.sample_rate == 5 + i % 7  # fps for video
        assert abs(r.duration - r.n_frames / r.sample_rate) < 1e-12
        # closed-form pixel formula: mean_r = mean over (x,y,t) of
        # (7x+13y+5t+i)%256 — recomputed here without touching bytes
        w, h, nf = r.width, r.height, r.n_frames
        tt, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
        assert abs(r.mean_rgb[0] - ((7 * xx + 13 * yy + 5 * tt + i) % 256).mean()) < 1e-9
        assert len(r.feature) == 24 and all(0.0 <= f <= 1.0 for f in r.feature)


def test_sample_frames_real_pixels(spark):
    media = synth_media_video(spark, n=8)
    out = sample_frames(media, every_n=3).collect()
    # every AVI contributes ceil(n_frames/3) PPM rows with exact pixels
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    for i in range(8):
        nf = 4 + i % 13
        got = sorted(by_id[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == list(range(0, nf, 3))
        w, h = 8 + i % 9, 8 + i % 7
        for r in got:
            img = codecs.decode_ppm(bytes(r.payload))
            assert img.shape == (h, w, 3)
            t = r.frame_idx
            yy, xx = np.mgrid[0:h, 0:w]
            exp = np.stack([(7 * xx + 13 * yy + 5 * t + i) % 256,
                            (3 * xx + 5 * yy + 11 * t + 2 * i) % 256,
                            (11 * xx + yy + 7 * t + 3 * i) % 256],
                           axis=2).astype(np.uint8)
            assert np.array_equal(img, exp)


def test_frame_sample_real_counts(spark):
    media = synth_media_video(spark, n=6)
    from communitydetection_jl_spark.operators.multimodal import frame_sample

    rows = frame_sample(media, every_n=4, deterministic_fake=False).collect()
    want = {(i, t) for i in range(6) for t in range(0, 4 + i % 13, 4)}
    assert {(r.media_id, r.frame_idx) for r in rows} == want


def test_sample_frames_max_side_resizes(spark):
    media = synth_media_video(spark, n=4)
    out = sample_frames(media, every_n=4, max_side=6).collect()
    assert out
    for r in out:
        assert max(r.width, r.height) <= 6
        img = codecs.decode_ppm(bytes(r.payload))
        assert img.shape == (r.height, r.width, 3)


def test_avi_malformed_payloads_raise_value_error_not_recursion():
    # 5000 nested LIST headers: must hit the depth bound as ValueError
    # (catchable by decode_media's quarantine), never RecursionError
    body = b"AVI " + b"LIST" + struct.pack("<I", 0xFFFFFF) * 0  # placeholder
    nested = b""
    for _ in range(5000):
        nested = b"LIST" + struct.pack("<I", 4 + len(nested)) + b"hdrl" + nested
    data = b"RIFF" + struct.pack("<I", 4 + len(nested)) + b"AVI " + nested
    with pytest.raises(ValueError, match="nesting too deep"):
        codecs.decode_avi(data)
    # truncated frame chunk → ValueError too
    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    good = codecs.encode_avi(frames)
    cut = good[: good.index(b"00db") + 8 + 5]
    with pytest.raises(ValueError):
        codecs.decode_avi(cut)


def test_avi_top_down_dib_and_fractional_fps():
    frames = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    data = bytearray(codecs.encode_avi(frames, fps=10))
    # flip biHeight negative (top-down) and re-pack rows accordingly:
    # encoder wrote bottom-up rasters, so a top-down header over the
    # same bytes must decode as the vertical mirror
    strf = bytes(data).index(b"strf") + 8
    w, h = struct.unpack_from("<ii", bytes(data), strf + 4)
    struct.pack_into("<i", data, strf + 8, -h)
    fps, out = codecs.decode_avi(bytes(data))
    assert np.array_equal(out, frames[:, ::-1, :, :])
    # NTSC timing: scale=1001, rate=30000 → fps rounds to 30
    strh = bytes(data).index(b"strh") + 8
    struct.pack_into("<II", data, strh + 20, 1001, 30000)
    fps2, _ = codecs.decode_avi(bytes(data))
    assert fps2 == 30


def test_sample_frames_skips_malformed_avi(spark):
    import pandas as pd

    good_frames, fps = __import__(
        "communitydetection_jl_spark.operators.multimodal",
        fromlist=["formula_frames"],
    ).formula_frames(1)
    good = codecs.encode_avi(good_frames, fps=fps)
    bad = good[:40]  # sniffs as avi, fails to decode
    rows = [
        (1, "video", bytearray(good), None),
        (2, "video", bytearray(bad), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    out = sample_frames(media, every_n=2).collect()
    assert {r.media_id for r in out} == {1}
