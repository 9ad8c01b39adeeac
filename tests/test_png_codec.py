"""Dependency-free PNG codec (round-3 item #7) — crafted-image pins.

Round-trips crafted images through png_encode → png_decode for every
supported color type and every scanline filter, checks the palette
path, and pins the loud-failure contract on malformed/unsupported
streams. Spark-side wiring (decode_image fallback, image_pixel_features
stats) is pinned against the same crafted bytes; end-to-end value
parity lives in the `image_features` oracle pair.
"""

import struct
import zlib

import numpy as np
import pytest

from search_engine_spark.operators.png_codec import (
    PNG_SIG,
    _chunk,
    png_decode,
    png_encode,
)


def _img(h, w, ch, seed=1):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.int64).astype(np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("ch,mode", [(1, "L"), (2, "LA"), (3, "RGB"), (4, "RGBA")])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_every_colortype_and_filter(ch, mode, ftype):
    src = _img(7, 11, ch, seed=ch * 10 + (5 if ftype == "cycle" else ftype))
    px, got_mode = png_decode(png_encode(src, filter_mode=ftype))
    assert got_mode == mode
    want = src[:, :, np.newaxis] if src.ndim == 2 else src
    assert px.shape == want.shape
    assert np.array_equal(px, want)


def test_palette_png_expands_through_plte():
    """A hand-built color-type-3 PNG: 2×2 indices into a 3-color PLTE."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    lines = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
    buf = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )
    px, mode = png_decode(buf)
    assert mode == "P"
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]]


def test_gradient_image_exact_pixels():
    """Non-random content where filters 1/3/4 actually compress: a
    horizontal gradient decodes to the exact arithmetic values."""
    w, h = 32, 9
    src = (np.arange(h)[:, None] * 8 + np.arange(w)[None, :] * 3) % 256
    src = src.astype(np.uint8)
    px, _ = png_decode(png_encode(src, filter_mode="cycle"))
    assert np.array_equal(px[:, :, 0], src)


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="bad signature"):
        png_decode(b"GIF89a" + b"\x00" * 32)


def test_crc_mismatch_rejected():
    buf = bytearray(png_encode(_img(4, 4, 1)))
    # flip one byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = buf.index(b"IDAT")
    buf[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        png_decode(bytes(buf))


def test_truncated_pixel_data_rejected():
    """A valid-CRC stream whose inflated data is short must fail loudly,
    never return a wrong-sized array (same contract as rle_decode)."""
    short = zlib.compress(b"\x00" + b"\x01\x02")  # 1 row of a claimed 4x4
    buf = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", short)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="pixel data length"):
        png_decode(buf)


def test_interlaced_and_16bit_raise_not_implemented():
    il = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        png_decode(il)
    deep = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(deep)


# --------------------------------------------------- Spark-side wiring


def test_decode_image_reads_real_png_without_pillow(spark):
    from search_engine_spark.operators.multimodal import decode_image

    src = _img(5, 9, 3, seed=7)
    rows = spark.createDataFrame(
        [(1, bytearray(png_encode(src))), (2, None)],
        "doc_id long, image binary",
    )
    got = {r["doc_id"]: r for r in decode_image(rows).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["mode"]) == (9, 5, "RGB")
    assert got[2]["width"] is None


def test_image_pixel_features_real_stats(spark):
    from search_engine_spark.operators.multimodal import image_pixel_features

    src = np.array([[0, 10], [20, 255]], dtype=np.uint8)
    rows = spark.createDataFrame(
        [
            (1, bytearray(png_encode(src))),
            (2, None),
            (3, bytearray(b"not a png at all")),
        ],
        "doc_id long, image binary",
    )
    got = {r["doc_id"]: r for r in image_pixel_features(rows).collect()}
    r1 = got[1]
    assert (r1["width"], r1["height"], r1["channels"]) == (2, 2, 1)
    assert r1["mean_px"] == round((0 + 10 + 20 + 255) / 4, 4)
    assert (r1["min_px"], r1["max_px"]) == (0, 255)
    assert got[2]["mean_px"] is None  # NULL payload → NULL features
    assert got[3]["mean_px"] is None  # garbage payload → NULL, not a kill


def test_synth_matches_pixel_law(spark):
    """The fixture generator obeys the shared law the oracle states."""
    from search_engine_spark.operators.multimodal import (
        PIXEL_PRIME,
        synth_png_images,
    )

    docs = spark.createDataFrame([(3,), (7,)], "doc_id long")
    for r in synth_png_images(docs).collect():
        d = r["doc_id"]
        w, h = 8 + d % 5, 8 + d % 3
        px, mode = png_decode(bytes(r["image"]))
        assert mode == "L" and px.shape == (h, w, 1)
        want = ((d * PIXEL_PRIME + np.arange(w * h)) % 256).reshape(h, w)
        assert np.array_equal(px[:, :, 0], want)
