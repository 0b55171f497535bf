"""LOSSLESS sequential JPEG (SOF3, T.81 Annex H — r15, VERDICT r14
item 7): predictive coding over the causal neighborhood, differences
mod 65536 Huffman-coded with SSSS categories. The defining contract is
decode ≡ source BIT-FOR-BIT at point transform 0."""

from __future__ import annotations

import numpy as np
import pytest

from fintech_lakehouse_spark.functions.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_lossless,
)

RNG = np.random.default_rng(20260817)


@pytest.mark.parametrize("predictor", range(1, 8))
def test_lossless_roundtrip_all_predictors_gray(predictor):
    img = RNG.integers(0, 256, (37, 53), dtype=np.uint8)
    got = decode_jpeg_pixels(encode_jpeg_lossless(img, predictor=predictor))
    assert got is not None and got.dtype == np.uint8
    assert np.array_equal(got, img)


def test_lossless_roundtrip_rgb_and_gradient():
    rgb = RNG.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg_lossless(rgb, predictor=4)), rgb
    )
    # smooth gradient: small diffs exercise the low SSSS categories
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    grad = ((xx + yy) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg_lossless(grad, predictor=7)), grad
    )


def test_lossless_16bit_and_extreme_diffs():
    """16-bit precision; a checkerboard of 0/65535 forces the largest
    difference categories (incl. the ±32768 escape, SSSS=16)."""
    im16 = RNG.integers(0, 65536, (15, 17), dtype=np.uint16)
    got = decode_jpeg_pixels(encode_jpeg_lossless(im16, predictor=1))
    assert got.dtype == np.uint16 and np.array_equal(got, im16)
    board = np.zeros((8, 8), dtype=np.uint16)
    board[::2, 1::2] = 65535
    board[1::2, ::2] = 65535
    # alternating ±65535 diffs wrap mod 65536 → exercises wraparound
    got = decode_jpeg_pixels(encode_jpeg_lossless(board, predictor=1))
    assert np.array_equal(got, board)
    # a constant-then-jump row hits the exact ±32768 escape
    esc = np.array([[0, 32768, 0, 32768]], dtype=np.uint16)
    got = decode_jpeg_pixels(encode_jpeg_lossless(esc, predictor=1))
    assert np.array_equal(got, esc)


def test_lossless_point_transform():
    img = RNG.integers(0, 256, (12, 9), dtype=np.uint8)
    for pt in (1, 2, 3):
        got = decode_jpeg_pixels(
            encode_jpeg_lossless(img, predictor=2, point_transform=pt)
        )
        assert np.array_equal(got, (img >> pt) << pt)


def test_lossless_single_pixel_and_single_row():
    one = np.array([[200]], dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg_lossless(one)), one
    )
    row = RNG.integers(0, 256, (1, 31), dtype=np.uint8)
    col = RNG.integers(0, 256, (29, 1), dtype=np.uint8)
    for img in (row, col):
        for pred in (1, 2, 4, 7):
            assert np.array_equal(
                decode_jpeg_pixels(
                    encode_jpeg_lossless(img, predictor=pred)
                ),
                img,
            )


def test_lossless_guards_and_quarantine():
    img = RNG.integers(0, 256, (10, 10), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(img, predictor=0)
    with pytest.raises(ValueError, match="point_transform"):
        encode_jpeg_lossless(img, point_transform=8)
    with pytest.raises(ValueError, match="uint8 or uint16"):
        encode_jpeg_lossless(img.astype(np.int32))
    payload = encode_jpeg_lossless(img)
    assert decode_jpeg_pixels(payload[: len(payload) // 2]) is None
    # flip the SOF3 marker to SOF7 (lossless-arithmetic): still refused
    sof7 = payload.replace(b"\xff\xc3", b"\xff\xc7", 1)
    assert decode_jpeg_pixels(sof7) is None


def test_lossless_stream_shape():
    """The stream is really SOF3: no DQT (no quantization exists in
    the mode), a DC-class DHT, Ss carries the predictor."""
    img = RNG.integers(0, 256, (6, 7), dtype=np.uint8)
    payload = encode_jpeg_lossless(img, predictor=5)
    assert b"\xff\xc3" in payload
    assert b"\xff\xdb" not in payload
    assert b"\xff\xc4" in payload
    sos = payload.index(b"\xff\xda")
    ns = payload[sos + 4]
    assert payload[sos + 5 + 2 * ns] == 5  # Ss = predictor


# ---------------------------------------------------------------------------
# SOF11 — lossless ARITHMETIC (QM coder over the same predictive front
# end; T.81 Annex H §H.1.2.3 two-dimensional contexts)


def test_lossless_arith_roundtrip_all_predictors():
    from fintech_lakehouse_spark.functions.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    img = RNG.integers(0, 256, (33, 29), dtype=np.uint8)
    for pred in range(1, 8):
        got = decode_jpeg_pixels(
            encode_jpeg_lossless_arith(img, predictor=pred)
        )
        assert got is not None and np.array_equal(got, img), pred


def test_lossless_arith_rgb_16bit_pt_and_extremes():
    from fintech_lakehouse_spark.functions.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    rgb = RNG.integers(0, 256, (14, 11, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg_lossless_arith(rgb, predictor=4)),
        rgb,
    )
    im16 = RNG.integers(0, 65536, (12, 13), dtype=np.uint16)
    got = decode_jpeg_pixels(encode_jpeg_lossless_arith(im16, predictor=7))
    assert got.dtype == np.uint16 and np.array_equal(got, im16)
    img = RNG.integers(0, 256, (10, 9), dtype=np.uint8)
    got = decode_jpeg_pixels(
        encode_jpeg_lossless_arith(img, predictor=2, point_transform=3)
    )
    assert np.array_equal(got, (img >> 3) << 3)
    board = np.zeros((8, 8), dtype=np.uint16)
    board[::2, 1::2] = 65535
    board[1::2, ::2] = 65535
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg_lossless_arith(board)), board
    )


def test_lossless_arith_stream_shape_and_quarantine():
    from fintech_lakehouse_spark.functions.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    img = RNG.integers(0, 256, (9, 8), dtype=np.uint8)
    payload = encode_jpeg_lossless_arith(img, predictor=6)
    # really SOF11: arithmetic conditioning present, no DHT, no DQT
    assert b"\xff\xcb" in payload
    assert b"\xff\xcc" in payload
    assert b"\xff\xc4" not in payload and b"\xff\xdb" not in payload
    # truncation: the QM decoder zero-feeds past the end (spec
    # behavior), so a cut stream may still decode — but never to the
    # original samples, and never crash
    trunc = decode_jpeg_pixels(payload[: len(payload) // 2])
    assert trunc is None or not np.array_equal(trunc, img)
    # SOF15 (differential lossless arithmetic) stays refused
    sof15 = payload.replace(b"\xff\xcb", b"\xff\xcf", 1)
    assert decode_jpeg_pixels(sof15) is None


def test_lossless_arith_matches_huffman_samples():
    """The two entropy layers over the identical predictive front end
    decode to identical samples — the seam-equivalence contract the
    sequential (SOF0≡SOF9) family pins."""
    from fintech_lakehouse_spark.functions.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    img = RNG.integers(0, 256, (25, 31), dtype=np.uint8)
    for pred in (1, 4, 7):
        a = decode_jpeg_pixels(encode_jpeg_lossless_arith(img, predictor=pred))
        hf = decode_jpeg_pixels(encode_jpeg_lossless(img, predictor=pred))
        assert np.array_equal(a, hf) and np.array_equal(a, img)
