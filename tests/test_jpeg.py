"""Baseline JPEG codec (operators/jpeg.py): round-trip fidelity,
marker/table structure, error contracts, and the Spark round-trip
stats operator.  JPEG is lossy, so fidelity is pinned with PSNR
floors rather than equality — a wrong quant table, Huffman drift, or
zigzag slip drops PSNR by tens of dB and crashes through them."""

from __future__ import annotations

import numpy as np
import pytest

from northwind_etl_spark.operators.jpeg import (
    _AC_CHR,
    _AC_LUM,
    _DC_CHR,
    _DC_LUM,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [yy * 255 // max(h - 1, 1), xx * 255 // max(w - 1, 1), (yy + xx) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_psnr_rgb_and_gray():
    img = _gradient(24, 40)
    for q, floor in ((90, 40.0), (75, 35.0), (50, 30.0)):
        assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=q))) > floor, q
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (17, 19)).astype(np.uint8)  # worst case
    assert _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=95))) > 35.0
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=75)) == flat).all()


def test_quality_monotone_in_size_and_fidelity():
    img = _gradient(32, 32)
    blobs = {q: encode_jpeg(img, quality=q) for q in (30, 60, 90)}
    assert len(blobs[30]) < len(blobs[60]) < len(blobs[90])
    psnrs = {q: _psnr(img, decode_jpeg(b)) for q, b in blobs.items()}
    assert psnrs[30] < psnrs[60] < psnrs[90]


def test_non_multiple_of_8_dims_roundtrip():
    for h, w in ((1, 1), (7, 9), (8, 8), (9, 17)):
        img = _gradient(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == (h, w, 3)


def test_marker_structure():
    blob = encode_jpeg(_gradient(8, 8), quality=75)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in blob  # DQT
    assert b"\xff\xc0" in blob  # SOF0 (baseline)
    assert b"\xff\xc4" in blob  # DHT
    assert b"\xff\xda" in blob  # SOS
    # grayscale emits a single component and only the luminance tables
    gray = encode_jpeg(np.zeros((8, 8), np.uint8))
    assert gray.count(b"\xff\xc4") == 2


def test_annex_k_table_consistency():
    for bits, values in (_DC_LUM, _DC_CHR, _AC_LUM, _AC_CHR):
        assert sum(bits) == len(values)
    assert sum(_AC_LUM[0]) == 162 and sum(_AC_CHR[0]) == 162
    assert sum(_DC_LUM[0]) == 12 and sum(_DC_CHR[0]) == 12


def test_decoder_error_contracts():
    img = _gradient(16, 16)
    blob = encode_jpeg(img, quality=80)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01" + blob)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])  # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg(blob[:20])  # truncated header
    # progressive (SOF2) must be refused, not mis-decoded
    prog = bytearray(blob)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))


def test_determinism():
    img = _gradient(20, 28)
    assert encode_jpeg(img, quality=85) == encode_jpeg(img, quality=85)


def test_dispatch_through_decode_image():
    from northwind_etl_spark.operators.multimodal import decode_image

    img = _gradient(16, 24)
    dec = decode_image(encode_jpeg(img, quality=90))
    assert dec.shape == (16, 24, 3)
    assert _psnr(img, dec) > 40.0


def test_jpeg_roundtrip_stats_operator(spark, sf_dir):
    from northwind_etl_spark.operators.multimodal import jpeg_roundtrip_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    rows = jpeg_roundtrip_stats(docs, quality=95).collect()
    assert len(rows) == 40
    for r in rows:
        from northwind_etl_spark.operators.multimodal import IMAGE_WIDTH

        assert r["width"] == IMAGE_WIDTH and r["height"] >= 1
        assert r["jpeg_bytes"] > 0
        # utf-8 text renders as near-noise — JPEG's worst case
        # (measured min 34.6 dB at q95 over the corpus) — so this
        # floor is conservative for any natural image
        assert r["psnr_db"] > 32.0, r
