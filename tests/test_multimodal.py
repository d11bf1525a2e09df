

def test_png_codec_roundtrip_and_filters(spark):
    """Pure-stdlib PNG: encode→decode is identity for RGB and gray;
    decode handles all five scanline filters; CRC corruption raises."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from northwind_etl_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(5, 16, 3), (1, 16, 3), (40, 3, 3), (7, 9)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a), shape

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    # hand-encode one image using every filter type (0,1,2,3,4)
    a = rng.integers(0, 256, size=(5, 8, 3), dtype=np.uint8)
    bpp, stride = 3, 8 * 3
    raster = a.reshape(5, stride).astype(np.int32)
    lines, prev = bytearray(), np.zeros(stride, dtype=np.int32)

    def paeth(x, y, z):
        p = x + y - z
        pa, pb, pc = abs(p - x), abs(p - y), abs(p - z)
        return x if pa <= pb and pa <= pc else (y if pb <= pc else z)

    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = raster[y]
        enc = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            left = cur[x - bpp] if x >= bpp else 0
            ul = prev[x - bpp] if x >= bpp else 0
            pred = {0: 0, 1: left, 2: prev[x],
                    3: (left + prev[x]) >> 1,
                    4: paeth(int(left), int(prev[x]), int(ul))}[ft]
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(ft)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), a)

    bad = bytearray(encode_png(a))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_path_matches_ppm_path(spark, sf_dir):
    """Compressed and uncompressed renders of the same documents must
    decode to identical per-channel sums (one render, two codecs)."""
    from northwind_etl_spark.operators import multimodal as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    ppm = {r.doc_id: (r.sum_r, r.sum_g, r.sum_b)
           for r in M.image_stats(M.make_image_table(docs)).collect()}
    png = {r.doc_id: (r.sum_r, r.sum_g, r.sum_b)
           for r in M.image_stats(M.make_image_table(docs, codec="png")).collect()}
    assert ppm == png and len(ppm) == 50
