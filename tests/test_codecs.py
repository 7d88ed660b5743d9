"""Real stdlib-only multimodal codecs (analytics/codecs.py): PNG and
WAV decode are exact — pinned by bit-for-bit round-trips across every
PNG filter type and channel count, plus malformed-input refusals."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mysql_cdc_spark.analytics.codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _img(h, w, ch=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [None, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(filter_type, ch):
    img = _img(13, 17, ch, seed=filter_type * 10 + (ch or 1))
    blob = encode_png(img, filter_type=filter_type)
    assert blob.startswith(PNG_SIG)
    got = decode_png(blob)
    assert got.shape == img.shape and got.dtype == np.uint8
    assert np.array_equal(got, img)


def test_png_roundtrip_edge_shapes():
    for img in [_img(1, 1), _img(1, 64), _img(64, 1), _img(16, 250, 3)]:
        assert np.array_equal(decode_png(encode_png(img, 4)), img)


def test_png_mixed_filters_decode():
    """Real encoders pick a filter per row: splice rows encoded with
    different filters into one IDAT and decode."""
    img = _img(5, 9, 3, seed=7)
    # build scanlines by encoding row-windows with varying filters and
    # re-splicing their raw (filtered) scanline bytes
    raws = []
    prev = np.zeros(9 * 3, dtype=np.int64)
    for y in range(5):
        ft = y % 5
        # encode a 2-row image (prev row + this row) with filter ft and
        # take its SECOND scanline, whose "up" references prev correctly
        two = np.stack([prev.reshape(9, 3).astype(np.uint8), img[y]])
        blob = encode_png(two, filter_type=ft)
        # extract the IDAT, decompress, take the second scanline
        pos = len(PNG_SIG)
        idat = bytearray()
        while pos + 8 <= len(blob):
            (ln,) = struct.unpack_from(">I", blob, pos)
            tag = blob[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += blob[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(bytes(idat))
        stride = 9 * 3 + 1
        raws.append(raw[stride:])
        prev = img[y].reshape(-1).astype(np.int64)
    body = zlib.compress(b"".join(raws))
    ihdr = struct.pack(">IIBBBBB", 9, 5, 8, 2, 0, 0, 0)

    def chunk(tag, b):
        return (
            struct.pack(">I", len(b)) + tag + b
            + struct.pack(">I", zlib.crc32(tag + b) & 0xFFFFFFFF)
        )

    blob = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body) + chunk(b"IEND", b"")
    assert np.array_equal(decode_png(blob), img)


def test_png_refusals():
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"JFIF....")
    img = _img(4, 4)
    blob = bytearray(encode_png(img))
    blob[len(PNG_SIG) + 8 + 8] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(blob))


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, size=500, dtype=np.int16)
    rate, got = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and np.array_equal(got, mono)
    stereo = rng.integers(-32768, 32767, size=(300, 2), dtype=np.int16)
    rate, got = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and got.shape == (300, 2)
    assert np.array_equal(got, stereo)


def test_resize_nearest_matches_naive():
    img = _img(16, 10, 3, seed=11)
    from mysql_cdc_spark.analytics.codecs import resize_nearest

    for oh, ow in [(8, 5), (4, 4), (16, 10), (32, 20), (1, 1), (5, 7)]:
        out = resize_nearest(img, oh, ow)
        assert out.shape == (oh, ow, 3)
        for i in range(oh):
            for j in range(ow):
                assert np.array_equal(
                    out[i, j], img[(i * 16) // oh, (j * 10) // ow]
                )


def test_resize_factor2_is_decimation():
    from mysql_cdc_spark.analytics.codecs import resize_nearest

    img = _img(16, 8, seed=5)
    assert np.array_equal(resize_nearest(img, 8, 4), img[::2, ::2])


def test_frame_sample_energy():
    from mysql_cdc_spark.analytics.codecs import frame_sample

    s = np.array([1, 2, 3, 4, 5], dtype=np.int16)
    got = frame_sample(s, 2)
    assert got.tolist() == [1 + 4, 9 + 16, 25]
    with pytest.raises(ValueError):
        frame_sample(s, 0)


def test_bmp_roundtrip():
    from mysql_cdc_spark.analytics.codecs import decode_bmp, encode_bmp

    for h, w in [(1, 1), (7, 5), (16, 31), (3, 4)]:  # odd widths hit padding
        img = _img(h, w, 3, seed=h * 100 + w)
        blob = encode_bmp(img)
        assert blob[:2] == b"BM"
        got = decode_bmp(blob)
        assert got.shape == img.shape
        assert np.array_equal(got, img)


def test_bmp_refusals():
    from mysql_cdc_spark.analytics.codecs import decode_bmp, encode_bmp

    with pytest.raises(ValueError, match="bad signature"):
        decode_bmp(b"PNG?")
    with pytest.raises(ValueError, match="RGB"):
        encode_bmp(np.zeros((4, 4), dtype=np.uint8))
