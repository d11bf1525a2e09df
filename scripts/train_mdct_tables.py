#!/usr/bin/env python
"""Freeze the MDC2 static (default) Huffman tables.

The per-blob Huffman table costs ~260 bytes — 30% of a short clip's
container — so small blobs want JPEG's Annex-K move: DEFAULT tables
frozen into the format.  The MDC2 payload has three statistically
distinct sections (band exponents ~3.7 bits/byte; 8-bit mantissas
~7.8; packed 4-bit mantissa nibbles ~7.2), so each gets its own table,
trained here over a deterministic sweep of tones, two-tone sums and
chirps spanning the codec's operating range, with +1 Laplace smoothing
so EVERY byte value stays codable.  Output: the frozen
northwind_etl_spark/functions/mdct_tables.py.  Deterministic —
re-running reproduces the committed tables bit-for-bit.
"""
import sys, os
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from northwind_etl_spark.operators.mdct import (  # noqa: E402
    BANDS, _BAND_W, _LOW_BANDS, _FRAME_BYTES,
    _huffman_bits_values, _pack_frames, _quantize, mdct,
)

RATE = 8000


def payload(x: np.ndarray) -> np.ndarray:
    c = mdct(x.astype("<i2").astype(np.float64))
    e, m = _quantize(c)
    return np.frombuffer(_pack_frames(e, m), np.uint8).reshape(-1, _FRAME_BYTES)


def corpus() -> list[np.ndarray]:
    out = []
    for i in range(60):
        n = 256 + 97 * i
        t = np.arange(n) / RATE
        f1 = 30.0 + (i * 41) % 240
        out.append(payload(12000.0 * np.sin(2 * np.pi * f1 * t)))
        f2 = 45.0 + (i * 29) % 200
        out.append(payload(8000.0 * np.sin(2 * np.pi * f1 * t)
                           + 4000.0 * np.sin(2 * np.pi * f2 * t)))
        out.append(payload(10000.0 * np.sin(2 * np.pi * (f1 + 15.0 * t) * t)))
    return out


def main() -> None:
    frames = np.concatenate(corpus())
    lo_end = BANDS + _LOW_BANDS * _BAND_W
    sections = {
        "EXP": frames[:, :BANDS].ravel(),
        "LOW": frames[:, BANDS:lo_end].ravel(),
        "HI": frames[:, lo_end:].ravel(),
    }
    print("# frozen by scripts/train_mdct_tables.py — do not hand-edit")
    print('"""Frozen MDC2 default Huffman tables (per payload section).')
    print()
    print("See scripts/train_mdct_tables.py for provenance; +1-smoothed")
    print("histograms over a deterministic tone/chirp sweep, so every")
    print('byte value has a code.  (bits, values) in the JPEG DHT form."""')
    print()
    for name, data in sections.items():
        freq = np.bincount(data, minlength=256) + 1  # Laplace: all codable
        bits, values = _huffman_bits_values(freq)
        print(f"MDCT_{name}_TABLE = (")
        print(f"    {tuple(bits)},")
        print(f"    {tuple(values)},")
        print(")")


if __name__ == "__main__":
    main()
