"""Perceptual-transform audio codec (MDCT) — closing the repo's last
declared multimodal stub with a REAL transform codec instead of a
NotImplementedError.

This is the architecture of the MP3 layer-3 / AAC family (Princen &
Bradley 1986/87 TDAC; Brandenburg 1999 overview), built from stdlib +
numpy only:

- 50%-overlapped frames of 2N samples under the SINE window, which
  satisfies the Princen-Bradley condition w[n]^2 + w[n+N]^2 = 1, so
  the lapped transform is perfectly reconstructing before
  quantization (pinned numerically in tests/test_mdct.py);
- the MDCT itself: X[k] = sum_n w[n] x[n] cos(pi/N (n + 0.5 + N/2)
  (k + 0.5)), k = 0..N-1 — 2N samples in, N coefficients out, critical
  sampling via time-domain alias cancellation across neighbours;
- scalefactor-band quantization: the N coefficients split into BANDS
  equal bands; each band stores one power-of-two scalefactor exponent
  (1 byte) and its coefficients as signed mantissas under a FIXED
  bit-allocation curve — 8-bit mantissas in the low half, 4-bit packed
  nibbles in the high half.  The fixed curve stands in for the
  psychoacoustic masking model (high bands get fewer bits, where both
  signal energy and hearing sensitivity are lower for the tonal
  fixtures this corpus carries): that model and the entropy coder are
  the two NAMED omissions — blob sizes here are pre-entropy-coding, a
  real encoder's Huffman stage would shrink them further without
  touching anything in this module;
- decode: dequantize (mantissa * 2^exponent, exact in doubles), IMDCT
  with the same window, overlap-add.

Everything is deterministic (no RNG, fixed frame walk, numpy IEEE
ops in a fixed order), so the Spark entry built on it yields stable
driver rows; the codec is LOSSY by construction, hence rows-only (no
SQL oracle can replay a float MDCT) with SNR floors, perfect-
reconstruction, container-error, and compression-ratio contracts
pinned in tests/test_mdct.py.

At 100 TB: the per-clip work is a handful of (frames x 2N) @ (2N x N)
matmuls inside Arrow-batched mapInPandas — embarrassingly parallel,
no shuffle; a production swap point is this module only (ffmpeg/
libfdk behind the same encode/decode signatures), exactly like the
PNG/JPEG/ADPCM codecs document.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MDCT_MAGIC = b"MDC1"
N_SUB = 128          # subbands (half-window); window length is 2*N_SUB
BANDS = 16           # scalefactor bands of N_SUB // BANDS coefficients
_BAND_W = N_SUB // BANDS
_LOW_BANDS = BANDS // 2  # 8-bit mantissas; the rest pack to 4 bits
_EXP_BIAS = 64       # stored exponent = e + bias, e in [-64, 191]
_FRAME_BYTES = BANDS + _LOW_BANDS * _BAND_W + (BANDS - _LOW_BANDS) * _BAND_W // 2


@lru_cache(maxsize=1)
def _window() -> "np.ndarray":
    n = np.arange(2 * N_SUB, dtype=np.float64)
    return np.sin(np.pi / (2 * N_SUB) * (n + 0.5))


@lru_cache(maxsize=1)
def _basis() -> "np.ndarray":
    """(2N, N) MDCT cosine basis; forward is frames @ basis, inverse is
    coeffs @ basis.T scaled by 2/N."""
    n = np.arange(2 * N_SUB, dtype=np.float64)[:, None]
    k = np.arange(N_SUB, dtype=np.float64)[None, :]
    return np.cos(np.pi / N_SUB * (n + 0.5 + N_SUB / 2.0) * (k + 0.5))


def _frame(x: "np.ndarray") -> "np.ndarray":
    """Pad with N zeros each side + up to a hop multiple, then stack
    50%-overlapped windows of 2N samples: (n_frames, 2N)."""
    pad_tail = (-len(x)) % N_SUB
    x = np.concatenate(
        [np.zeros(N_SUB), x.astype(np.float64), np.zeros(N_SUB + pad_tail)]
    )
    n_frames = len(x) // N_SUB - 1
    idx = np.arange(2 * N_SUB)[None, :] + N_SUB * np.arange(n_frames)[:, None]
    return x[idx]


def mdct(x: "np.ndarray") -> "np.ndarray":
    """Forward lapped transform: (n_frames, N) coefficients."""
    return (_frame(x) * _window()[None, :]) @ _basis()


def imdct(coeffs: "np.ndarray", n_samples: int) -> "np.ndarray":
    """Inverse + overlap-add back to n_samples (float64)."""
    frames = (coeffs @ _basis().T) * (2.0 / N_SUB) * _window()[None, :]
    n_frames = frames.shape[0]
    out = np.zeros((n_frames + 1) * N_SUB)
    for i in range(n_frames):  # bounded: n_frames ~ n_samples / 128
        out[i * N_SUB : i * N_SUB + 2 * N_SUB] += frames[i]
    return out[N_SUB : N_SUB + n_samples]


def _quantize(coeffs: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """Per-(frame, band) power-of-two scalefactors + integer mantissas.
    Returns (exps uint8 (F, BANDS), mant int16 (F, N)) with mantissas
    already clipped to each band's allocation."""
    f = coeffs.shape[0]
    bands = coeffs.reshape(f, BANDS, _BAND_W)
    peak = np.abs(bands).max(axis=2)  # (F, BANDS)
    caps = np.where(np.arange(BANDS) < _LOW_BANDS, 127.0, 7.0)[None, :]
    # smallest integer e with peak / 2^e <= cap (e floor at -_EXP_BIAS)
    with np.errstate(divide="ignore"):
        e = np.ceil(np.log2(np.maximum(peak, 1e-300) / caps)).astype(np.int64)
    e = np.clip(e, -_EXP_BIAS, 255 - _EXP_BIAS)
    step = np.exp2(e.astype(np.float64))[:, :, None]
    mant = np.rint(bands / step).astype(np.int64)
    mant = np.clip(mant, -np.rint(caps)[:, :, None], np.rint(caps)[:, :, None])
    return (e + _EXP_BIAS).astype(np.uint8), mant.reshape(f, N_SUB).astype(np.int16)


def _pack_frames(exps: "np.ndarray", mant: "np.ndarray") -> bytes:
    f = exps.shape[0]
    low = mant[:, : _LOW_BANDS * _BAND_W].astype(np.int8)
    high = mant[:, _LOW_BANDS * _BAND_W :] + 8  # [-7,7] -> [1,15], nibbles
    hi = high.reshape(f, -1, 2).astype(np.uint8)
    packed = (hi[:, :, 0] << 4 | hi[:, :, 1]).astype(np.uint8)
    return np.concatenate(
        [exps, low.view(np.uint8), packed], axis=1
    ).tobytes()


def _unpack_frames(payload: bytes, n_frames: int) -> "np.ndarray":
    raw = np.frombuffer(payload, dtype=np.uint8).reshape(n_frames, _FRAME_BYTES)
    exps = raw[:, :BANDS].astype(np.int64) - _EXP_BIAS
    low = raw[:, BANDS : BANDS + _LOW_BANDS * _BAND_W].view(np.int8)
    packed = raw[:, BANDS + _LOW_BANDS * _BAND_W :]
    hi = np.empty((n_frames, (BANDS - _LOW_BANDS) * _BAND_W), dtype=np.int64)
    hi[:, 0::2] = (packed >> 4).astype(np.int64) - 8
    hi[:, 1::2] = (packed & 0x0F).astype(np.int64) - 8
    mant = np.concatenate([low.astype(np.int64), hi], axis=1)
    step = np.exp2(
        np.repeat(exps, _BAND_W, axis=1).astype(np.float64)
    )
    return mant.astype(np.float64) * step


def encode_mdct(samples: "np.ndarray", *, sample_rate: int = 8000) -> bytes:
    """int16 mono -> framed MDCT blob: magic + rate + n_samples +
    n_frames + fixed-size frame payloads."""
    s = np.ascontiguousarray(samples, dtype="<i2").astype(np.float64)
    coeffs = mdct(s)
    exps, mant = _quantize(coeffs)
    head = MDCT_MAGIC + struct.pack("<III", sample_rate, len(s), coeffs.shape[0])
    return head + _pack_frames(exps, mant)


def decode_mdct(blob: bytes) -> tuple["np.ndarray", int]:
    """Framed MDCT blob -> (int16 samples, sample_rate); ValueError on
    bad magic / truncation (the decode_wav/png/jpeg contract)."""
    if blob[:4] != MDCT_MAGIC:
        raise ValueError("not an MDC1 blob (bad magic)")
    if len(blob) < 16:
        raise ValueError("truncated MDCT header")
    rate, n_samples, n_frames = struct.unpack_from("<III", blob, 4)
    payload = blob[16:]
    if len(payload) < n_frames * _FRAME_BYTES:
        raise ValueError("truncated MDCT payload")
    coeffs = _unpack_frames(payload[: n_frames * _FRAME_BYTES], n_frames)
    y = imdct(coeffs, n_samples)
    return np.clip(np.rint(y), -32768, 32767).astype("<i2"), rate


MDCT_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, mdct_bytes int,"
    " compression_ratio double, snr_db double"
)


def mdct_roundtrip_stats(
    documents: DataFrame, *, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic per-doc tone (the adpcm_roundtrip_stats fixture
    rule: frequency keyed on doc_id, length on n_chars) through the
    real MDCT codec and back; compression ratio vs 16-bit PCM and
    roundtrip SNR per doc.  Rows-only by design (lossy float
    transform); SNR floors and codec contracts pinned in
    tests/test_mdct.py."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_samples", "mdct_bytes",
                    "compression_ratio", "snr_db",
                )
            }
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                n = max(256, 4 * len(t or ""))
                freq = 50.0 + (int(doc_id) * 37) % 200
                tt = np.arange(n, dtype=np.float64) / sample_rate
                samples = (12000.0 * np.sin(2 * np.pi * freq * tt)).astype("<i2")
                blob = encode_mdct(samples, sample_rate=sample_rate)
                dec, rate = decode_mdct(blob)
                ref = samples.astype(np.float64)
                err = dec.astype(np.float64) - ref
                sig = float((ref**2).mean())
                mse = float((err**2).mean())
                snr = 99.0 if mse == 0 else 10.0 * np.log10(sig / mse)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["mdct_bytes"].append(len(blob))
                rows["compression_ratio"].append(round(2.0 * n / len(blob), 3))
                rows["snr_db"].append(round(snr, 3))
            yield pd.DataFrame(rows)

    return documents.select("doc_id", "text").mapInPandas(stats, MDCT_STATS_SCHEMA)
