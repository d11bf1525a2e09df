"""G.711 mu-law proofs (operators/multimodal.py): the SQL companding
formula (the oracle's) is bit-identical to stdlib audioop over the
ENTIRE int16 domain, the framed container enforces its error
contract, and quantization error is bounded by the top-segment step."""

from __future__ import annotations

import struct
import warnings

import numpy as np
import pytest

from northwind_etl_spark.operators.multimodal import (
    decode_ulaw,
    encode_ulaw,
    g711_roundtrip_stats,
)

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import audioop


def _formula_roundtrip(s: int) -> int:
    """Independent spec-derived companding roundtrip — the EXACT
    integer arithmetic the DuckDB oracle runs (oracles.py)."""
    p = s >> 2  # floor(s/4): 16-bit -> 14-bit domain
    mask = 0x7F if p < 0 else 0xFF
    p = min(abs(p), 8159) + 33
    seg = 8
    for i, t in enumerate((63, 127, 255, 511, 1023, 2047, 4095, 8191)):
        if p <= t:
            seg = i
            break
    uval = (0x7F ^ mask) if seg >= 8 else ((seg * 16 + ((p >> (seg + 1)) & 0x0F)) ^ mask)
    u2 = 255 - uval
    t = ((u2 % 16) * 8 + 132) * (1 << ((u2 // 16) % 8))
    return 132 - t if u2 >= 128 else t - 132


def test_formula_matches_audioop_full_domain():
    # every int16 once — the oracle formula IS audioop, bit for bit
    allv = np.arange(-32768, 32768, dtype="<i2")
    enc = audioop.lin2ulaw(allv.tobytes(), 2)
    dec = np.frombuffer(audioop.ulaw2lin(enc, 2), dtype="<i2")
    formula = np.array(
        [_formula_roundtrip(int(v)) for v in allv], dtype=np.int64
    )
    assert (dec.astype(np.int64) == formula).all()


def test_roundtrip_error_bound():
    allv = np.arange(-32768, 32768, dtype="<i2")
    enc = audioop.lin2ulaw(allv.tobytes(), 2)
    dec = np.frombuffer(audioop.ulaw2lin(enc, 2), dtype="<i2")
    err = np.abs(allv.astype(np.int64) - dec.astype(np.int64))
    # top segment step = 2^7 * 8 * 4 = 4096 in 16-bit units → half-step
    # plus clipping at the rails bounds the error well under one step
    assert int(err.max()) <= 4096
    # |s| <= 512 lands in segments 0-2 (14-bit p <= 161): step is at
    # most 2^3 in the 14-bit domain = 32 in 16-bit units
    small = err[32768 - 512 : 32768 + 512]
    assert int(small.max()) <= 32


def test_container_contract():
    s = np.array([0, 1000, -1000], dtype="<i2")
    blob = encode_ulaw(s, sample_rate=16000)
    dec, rate = decode_ulaw(blob)
    assert rate == 16000 and len(dec) == 3
    with pytest.raises(ValueError, match="magic"):
        decode_ulaw(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_ulaw(blob[:8])
    with pytest.raises(ValueError, match="payload"):
        decode_ulaw(blob[:-1])


def test_stats_on_planted_docs(spark):
    docs = spark.createDataFrame(
        [(1, "AB"), (2, ""), (3, "hello world!")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in g711_roundtrip_stats(docs).collect()}
    # 'AB' = 0x41 0x42 → sample 0x4241 = 16961; formula roundtrip:
    assert got[1].n_samples == 1
    assert got[1].sum_decoded == _formula_roundtrip(16961)
    assert got[2].n_samples == 0 and got[2].sum_decoded == 0
    assert got[2].max_abs_err == 0 and got[2].ulaw_bytes == 12
    assert got[3].n_samples == 6 and got[3].ulaw_bytes == 18
    s = np.frombuffer(b"hello world!", dtype="<i2")
    want = sum(_formula_roundtrip(int(v)) for v in s)
    assert got[3].sum_decoded == want


def _alaw_formula_roundtrip(s: int) -> int:
    """Independent A-law composite — the oracle's exact arithmetic."""
    p = s >> 3
    if p >= 0:
        mask, pm = 0xD5, p
    else:
        mask, pm = 0x55, -p - 1
    pm = min(pm, 4095)
    if pm < 32:
        uval = pm >> 1
    else:
        seg = pm.bit_length() - 5
        uval = (seg << 4) | ((pm >> seg) & 0x0F)
    a = (uval ^ mask) ^ 0x55
    segd, m = (a >> 4) & 0x07, a & 0x0F
    t = (2 * m + 1) if segd == 0 else ((2 * m + 33) << (segd - 1))
    v = t << 3
    return v if a & 0x80 else -v


def test_alaw_formula_matches_audioop_full_domain():
    allv = np.arange(-32768, 32768, dtype="<i2")
    enc = audioop.lin2alaw(allv.tobytes(), 2)
    dec = np.frombuffer(audioop.alaw2lin(enc, 2), dtype="<i2")
    formula = np.array(
        [_alaw_formula_roundtrip(int(v)) for v in allv], dtype=np.int64
    )
    assert (dec.astype(np.int64) == formula).all()


def test_alaw_container_and_stats(spark):
    from northwind_etl_spark.operators.multimodal import (
        alaw_roundtrip_stats,
        decode_alaw,
        encode_alaw,
    )

    s = np.array([0, 1000, -1000], dtype="<i2")
    blob = encode_alaw(s, sample_rate=16000)
    dec, rate = decode_alaw(blob)
    assert rate == 16000 and len(dec) == 3
    with pytest.raises(ValueError, match="magic"):
        decode_alaw(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_alaw(blob[:-1])

    docs = spark.createDataFrame([(1, "AB"), (2, "")], ["doc_id", "text"])
    got = {r.doc_id: r for r in alaw_roundtrip_stats(docs).collect()}
    assert got[1].sum_decoded == _alaw_formula_roundtrip(16961)
    assert got[2].n_samples == 0 and got[2].alaw_bytes == 12
