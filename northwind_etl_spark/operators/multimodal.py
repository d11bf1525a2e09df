"""Multimodal columns (north-star §2b): opaque binary payloads + typed
metadata, processed by Arrow-batched Python over mapInPandas.

Design (the part that must be right at 100 TB):
- blobs are `binary` columns with a sibling metadata struct — parquet
  stores them page-compressed, scans prune them unless projected;
- per-blob work (decode/resize/feature-extract) is mapInPandas: Arrow
  ships each partition to Python in columnar batches, numpy processes
  them vectorized, results stream back — no driver involvement, no
  collect, partition-parallel;
- batch size is bounded via spark.sql.execution.arrow.maxRecordsPerBatch
  when blobs are large (set by callers; default fine for test blobs).

`decode_image` is a REAL decoder for the uncompressed netpbm formats
(PPM/P6 RGB and PGM/P5 grayscale): pure header parse + numpy reshape, no
codec libraries needed.  `make_image_table` renders each document's
utf-8 bytes into a genuine image (fixed width, zero-padded final row),
so decode → per-channel stats flow end-to-end and are oracle-checkable
byte arithmetic.  PNG is a REAL compressed codec too — encode_png /
decode_png below implement it on stdlib zlib (CRC-verified chunks, all
five scanline filters on decode), so the compressed path runs without
any codec library.  Baseline JPEG is real as well (operators/jpeg.py:
stdlib+numpy DCT/quantization/Huffman).  Audio is real for PCM WAV
(encode_wav/decode_wav on the stdlib `wave` module) AND for compressed
audio via IMA ADPCM (encode_adpcm/decode_adpcm on stdlib audioop,
4 bits/sample).  Perceptual-TRANSFORM audio is real too — operators/
mdct.py implements the MP3/AAC family's architecture (sine-window MDCT
+ scalefactor-band quantization); only standards-exact MP3/AAC
bitstream parsing stays ffmpeg-gated.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_FEATURES_SCHEMA = "doc_id long, n_bytes int, byte_sum long, byte_entropy_q double"


def make_blob_table(documents: DataFrame) -> DataFrame:
    """Build a multimodal-shaped table from documents: text→utf-8 blob +
    typed metadata struct (what a real pipeline carries next to images)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("int").alias("declared_len"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def _ppm_header(blob: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a netpbm binary header (magic, width, height, maxval) and
    return (magic, width, height, maxval, data_offset).  Tolerates
    arbitrary whitespace and `#` comments between tokens, per the spec;
    exactly one whitespace byte separates maxval from raster data."""
    magic = blob[:2]
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if pos < len(blob) and blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        tokens.append(int(blob[start:pos]))
    return magic, tokens[0], tokens[1], tokens[2], pos + 1


def decode_image(blob: bytes) -> "np.ndarray":
    """Decode an uncompressed netpbm image: P6 (binary RGB) → uint8
    array shaped (height, width, 3); P5 (binary grayscale) → (height,
    width).  Pure numpy — header parse + frombuffer + reshape."""
    if blob[:2] not in (b"P6", b"P5"):
        return _decode_compressed(blob)
    magic, w, h, maxval, off = _ppm_header(blob)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval} (2-byte samples)")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    data = np.frombuffer(blob, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3) if channels == 3 else data.reshape(h, w)


def encode_ppm(arr: "np.ndarray") -> bytes:
    """Encode a uint8 array — (h, w, 3) → P6, (h, w) → P5."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w,3) or (h,w), got shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + a.tobytes()


# Module-level import alias, NOT a runtime `from .jpeg import ...`
# inside the dispatch: this function runs INSIDE python workers that
# cannot import the package (the mdct r08 lesson) — a runtime relative
# import there raises ModuleNotFoundError on the first JPEG blob.  A
# module-global function reference ships by value with the closure.
from .jpeg import decode_jpeg as _decode_jpeg_blob  # noqa: E402


def _decode_compressed(blob: bytes) -> "np.ndarray":
    """Compressed-IMAGE dispatch.  PNG is decoded for real (stdlib
    zlib — see decode_png below) and so is baseline JPEG (stdlib+numpy
    DCT/Huffman — operators/jpeg.py).  Audio never routes here
    (decode_wav / decode_adpcm / operators/mdct.py::decode_mdct for the
    perceptual-transform path); standards-exact MP3/AAC bitstream
    parsing stays out of scope in this container (the MDCT codec covers
    the family's architecture) — swap in ffmpeg where this raises; the
    mapInPandas plumbing above is unchanged either way."""
    if blob[:8] == _PNG_SIG:
        return decode_png(blob)
    if blob[:3] == b"\xff\xd8\xff":
        return _decode_jpeg_blob(blob)
    raise NotImplementedError(
        "unrecognized blob format (PNG: decode_png; JPEG:"
        " operators/jpeg.py; PCM WAV: decode_wav; ADPCM: decode_adpcm;"
        " MDCT transform audio: operators/mdct.py; standards-exact"
        " MP3/AAC parsing requires ffmpeg, unavailable here)"
    )


# ------------------------------------------------------ PNG codec (stdlib)
# A real compressed-image path with zero external codec libraries: PNG
# IS zlib (RFC 1950) over per-scanline-filtered raster bytes, and zlib
# + struct ship with CPython.  Supports 8-bit grayscale (color type 0)
# and RGB (type 2), no interlace; all five scanline filters on decode;
# CRCs verified.  Small images defilter in pure Python per scanline —
# fine for the fixture sizes; a 100 TB image corpus would swap this
# function (only) for a C codec while every operator above stays put.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: "np.ndarray") -> bytes:
    """Encode a uint8 array — (h, w, 3) → RGB PNG, (h, w) → grayscale
    PNG.  Filter 0 (None) per scanline, one zlib-deflated IDAT."""
    import struct
    import zlib as _z

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
    elif a.ndim == 2:
        color_type = 0
    else:
        raise ValueError(f"expected (h,w,3) or (h,w), got shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    raster = a.reshape(h, -1)
    # prepend the filter byte (0 = None) to every scanline
    lines = np.concatenate([np.zeros((h, 1), dtype=np.uint8), raster], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(lines.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> "np.ndarray":
    """Decode an 8-bit gray/RGB non-interlaced PNG: chunk walk with CRC
    verification → zlib inflate → per-scanline defilter (all five
    standard filters) → numpy reshape."""
    import struct
    import zlib as _z

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    saw_iend = False
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        # a blob cut mid-chunk must fail the codec's ValueError contract,
        # not leak struct.error from an undersized CRC/IHDR slice
        if pos + 12 + length > len(blob):
            raise ValueError("truncated PNG chunk")
        payload = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if _z.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if not saw_iend:
        raise ValueError("truncated PNG (no IEND chunk)")
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, interlace={interlace})"
        )
    bpp = 3 if color_type == 2 else 1
    stride = w * bpp
    raw = _z.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    rawa = np.frombuffer(raw, dtype=np.uint8)
    # fast path (r08): a raster whose every scanline uses filter 0
    # (None) — all of THIS repo's encoder output — needs no defilter
    # at all: one reshape + column drop, no per-row loop (measured 6x
    # on fixture-size blobs, see PLANS.md "UDF codecs")
    if not rawa[:: stride + 1].any():
        out = rawa.reshape(h, stride + 1)[:, 1:]
        return (
            out.reshape(h, w, 3) if color_type == 2 else out.reshape(h, w)
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, data = line[0], np.frombuffer(line, dtype=np.uint8, offset=1).astype(np.int32)
        if ftype == 0:  # None
            cur = data
        elif ftype == 2:  # Up — vectorized
            cur = (data + prev) & 0xFF
        elif ftype == 1:
            # Sub — recon[x] = (raw[x] + recon[x-bpp]) mod 256 is a
            # per-byte-lane prefix sum, and mod distributes over
            # addition, so one cumsum per lane replaces the x loop
            cur = (
                np.cumsum(data.reshape(-1, bpp), axis=0, dtype=np.int64) & 0xFF
            ).reshape(-1).astype(np.int32)
        elif ftype in (3, 4):  # Average / Paeth: inherently sequential
            # in x.  Sub vectorizes because mod-256 addition is
            # associative (a prefix SUM); Average's floor((left+up)/2)
            # and Paeth's argmin both make recon[x] a NON-AFFINE
            # function of recon[x-bpp], so the scan has no
            # parallel-prefix form — these two stay per-byte (the
            # residual path a C codec would replace; this repo's own
            # encoder emits only filter 0, which takes the reshape
            # fast path above)
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                if ftype == 3:
                    cur[x] = (data[x] + ((left + prev[x]) >> 1)) & 0xFF
                else:
                    ul = prev[x - bpp] if x >= bpp else 0
                    cur[x] = (data[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, 3) if color_type == 2 else out.reshape(h, w)


RESIZE_SCHEMA = "doc_id long, blob binary, n_bytes int"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_bytes int"


def resize_blobs(blobs: DataFrame, *, target_bytes: int = 64) -> DataFrame:
    """'Resize' plumbing: deterministic stand-in for image resize —
    truncate/keep each blob to `target_bytes` via mapInPandas.  A real
    implementation swaps the numpy slice for PIL/cv2 resize; the Spark
    contract (schema, batching, per-row transform) is identical."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [bytes(b[:target_bytes]) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(do_resize, RESIZE_SCHEMA)


def sample_frames(blobs: DataFrame, *, frame_bytes: int = 32, every_n: int = 4) -> DataFrame:
    """'Frame-sample' plumbing: one input blob → many frame rows (every
    n-th fixed-size chunk), the 1→N row shape video frame sampling
    needs.  mapInPandas lets a batch yield more rows than it received —
    no explode of a pre-materialized array, frames stream out."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = max(1, len(blob) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    chunks.append(bytes(blob[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": chunks,
                    "frame_bytes": [len(c) for c in chunks],
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(frames, FRAMES_SCHEMA)


def extract_blob_features(blobs: DataFrame) -> DataFrame:
    """Deterministic per-blob features via mapInPandas (the decode
    stand-in): byte length, byte sum, quantized byte entropy."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["blob"]]
            n_bytes = np.array([a.size for a in arrs], dtype=np.int32)
            byte_sum = np.array([int(a.sum()) for a in arrs], dtype=np.int64)
            ent = []
            for a in arrs:
                if a.size == 0:
                    ent.append(0.0)
                    continue
                counts = np.bincount(a, minlength=256).astype(np.float64)
                p = counts[counts > 0] / a.size
                ent.append(round(float(-(p * np.log2(p)).sum()), 4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "byte_sum": byte_sum,
                    "byte_entropy_q": ent,
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(features, BLOB_FEATURES_SCHEMA)


# ------------------------------------------------------- real decode path

IMAGE_TABLE_SCHEMA = "doc_id long, image binary, mime string, width int, height int"
IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "sum_r long, sum_g long, sum_b long"
)
IMAGE_WIDTH = 16  # fixed render width; row stride = 48 bytes (RGB)


def make_image_table(
    documents: DataFrame, *, width: int = IMAGE_WIDTH, codec: str = "ppm"
) -> DataFrame:
    """Render each document's utf-8 bytes into a real RGB image: fixed
    width, height = ceil(n_bytes / (width*3)), final row zero-padded.
    Deterministic, so a SQL oracle can reproduce every pixel from the
    text bytes alone.  codec='ppm' emits uncompressed P6; codec='png'
    emits genuine zlib-compressed PNG (the compressed-codec path)."""
    if codec not in ("ppm", "png"):
        raise ValueError(f"make_image_table: codec must be ppm/png, got {codec!r}")
    row_bytes = width * 3
    enc = encode_ppm if codec == "ppm" else encode_png
    mime = "image/x-portable-pixmap" if codec == "ppm" else "image/png"

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, heights = [], []
            for t in pdf["text"]:
                data = (t or "").encode("utf-8")
                h = max(1, -(-len(data) // row_bytes))
                buf = data + b"\x00" * (h * row_bytes - len(data))
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, width, 3)
                blobs.append(enc(arr))
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "image": blobs,
                    "mime": mime,
                    "width": np.int32(width),
                    "height": np.array(heights, dtype=np.int32),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(render, IMAGE_TABLE_SCHEMA)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode each netpbm blob (real header parse + reshape) and emit
    per-channel pixel sums — the feature-extraction step of an image
    pipeline, Arrow-batched and partition-parallel."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", "width", "height", "channels",
                                      "sum_r", "sum_g", "sum_b")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                a = decode_image(bytes(blob))
                if a.ndim == 2:
                    a = a[:, :, None].repeat(3, axis=2)
                sums = a.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows["doc_id"].append(doc_id)
                rows["width"].append(a.shape[1])
                rows["height"].append(a.shape[0])
                rows["channels"].append(3)
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    return images.select("doc_id", "image").mapInPandas(stats, IMAGE_STATS_SCHEMA)


def image_dhash(images: DataFrame, *, hash_size: int = 8) -> DataFrame:
    """Perceptual difference-hash per image — the standard 64-bit
    dHash an image-dedup pipeline keys on: decode → ITU-R 601 luma →
    box-mean downsample to (hash_size+1) × hash_size → horizontal
    gradient sign bits packed into one long.

    Near-identical images (re-encodes, small appends, minor noise)
    land on the same or a ≤2-bit-distant hash, so image dedup becomes
    an exact groupBy on a LONG — the same shuffle-a-digest-not-the-
    payload discipline as the text dedup family, and at 100 TB of
    images the only state per image is 8 bytes.  Hamming-radius
    candidate banding, if needed, reuses the SimHash pigeonhole
    machinery (operators/dedup.py) unchanged — dHash IS a SimHash-
    shaped fingerprint with image gradients as features.

    Output: (doc_id long, dhash long) — Arrow-batched, map-only.
    """

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                a = decode_image(bytes(blob))
                if a.ndim == 3:
                    # integer ITU-R 601 luma — deterministic, no floats
                    luma = (
                        299 * a[:, :, 0].astype(np.int64)
                        + 587 * a[:, :, 1].astype(np.int64)
                        + 114 * a[:, :, 2].astype(np.int64)
                    )
                else:
                    luma = a.astype(np.int64) * 1000
                h, w = luma.shape
                # box-MEAN to (hash_size, hash_size+1) via reduceat on
                # integer-spaced bin edges (works for any h, w).  The
                # sums must be divided by each box's area: with uneven
                # box widths (e.g. w=16 over 9 columns) comparing raw
                # sums encodes the GEOMETRY, not the pixels — measured
                # 24 of 64 bits near-constant corpus-wide before the fix
                r_edges = (np.arange(hash_size) * h) // hash_size
                c_edges = (np.arange(hash_size + 1) * w) // (hash_size + 1)
                sums = np.add.reduceat(
                    np.add.reduceat(luma, r_edges, axis=0), c_edges, axis=1
                )
                r_sizes = np.diff(np.append(r_edges, h))
                c_sizes = np.diff(np.append(c_edges, w))
                areas = np.maximum(np.outer(r_sizes, c_sizes), 1)
                means = sums / areas
                bits = (means[:, 1:] > means[:, :-1]).ravel()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # two's-complement into a signed long column
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(doc_id)
                out.append(val)
            yield pd.DataFrame({"doc_id": ids, "dhash": out})

    return images.select("doc_id", "image").mapInPandas(
        hashes, "doc_id long, dhash long"
    )


def resize_images(images: DataFrame, *, factor: int = 2) -> DataFrame:
    """Real image resize: decode → nearest-neighbor subsample (every
    `factor`-th pixel in both axes) → re-encode P6.  Same mapInPandas
    contract a PIL/cv2-backed resize would use."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, ws, hs = [], [], []
            for blob in pdf["image"]:
                a = decode_image(bytes(blob))
                small = a[::factor, ::factor]
                blobs.append(encode_ppm(small))
                ws.append(small.shape[1])
                hs.append(small.shape[0])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "image": blobs,
                    "mime": "image/x-portable-pixmap",
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                }
            )

    return images.select("doc_id", "image").mapInPandas(do_resize, IMAGE_TABLE_SCHEMA)


# ------------------------------------------------- WAV/PCM codec (stdlib)
# Audio needs no codec library either for uncompressed PCM: the
# stdlib `wave` module handles RIFF framing; only the numpy int16 view
# is ours.  16-bit mono PCM covers the decode/feature-extract plumbing
# a real audio pipeline runs; compressed audio (MP3/AAC) stays a
# declared stub in _decode_compressed.

def encode_wav(samples: "np.ndarray", *, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono PCM samples as a canonical WAV via the stdlib
    `wave` module (RIFF framing is its job; only the numpy↔bytes view
    is ours)."""
    import io
    import wave

    s = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes) -> tuple["np.ndarray", int]:
    """Decode a PCM WAV via stdlib `wave` → (int16 samples, rate).
    Only uncompressed 16-bit mono PCM is supported; the stdlib parser
    rejects non-PCM/malformed RIFF, and we reject stereo/other widths
    rather than silently mixing channels down."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(blob), "rb") as w:
            channels, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            if channels != 1 or width != 2:
                raise ValueError(
                    f"unsupported WAV (channels={channels}, sample_width={width})"
                )
            data = w.readframes(w.getnframes())
    except wave.Error as ex:  # malformed RIFF / non-PCM formats
        raise ValueError(f"not a decodable PCM WAV: {ex}") from ex
    return np.frombuffer(data, dtype="<i2"), rate


AUDIO_TABLE_SCHEMA = "doc_id long, audio binary, mime string, sample_rate int, n_samples int"
AUDIO_STATS_SCHEMA = "doc_id long, sample_rate int, n_samples int, sum_abs long, max_abs int"


def make_audio_table(documents: DataFrame, *, sample_rate: int = 8000) -> DataFrame:
    """Render each document's utf-8 bytes as genuine 16-bit mono PCM WAV
    (consecutive byte pairs → little-endian int16; an odd trailing byte
    is dropped).  Deterministic, so a SQL oracle reproduces every sample
    from the text bytes."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, counts = [], []
            for t in pdf["text"]:
                data = (t or "").encode("utf-8")
                n = len(data) // 2
                samples = np.frombuffer(data, dtype="<i2", count=n)
                blobs.append(encode_wav(samples, sample_rate=sample_rate))
                counts.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "audio": blobs,
                    "mime": "audio/wav",
                    "sample_rate": np.int32(sample_rate),
                    "n_samples": np.array(counts, dtype=np.int32),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(render, AUDIO_TABLE_SCHEMA)


def audio_stats(audio: DataFrame) -> DataFrame:
    """Decode each WAV (real RIFF parse) and emit amplitude stats —
    the feature-extraction step of an audio pipeline, Arrow-batched."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", "sample_rate", "n_samples",
                                      "sum_abs", "max_abs")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                s, rate = decode_wav(bytes(blob))
                a = np.abs(s.astype(np.int64))
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(s.size)
                rows["sum_abs"].append(int(a.sum()) if s.size else 0)
                rows["max_abs"].append(int(a.max()) if s.size else 0)
            yield pd.DataFrame(rows)

    return audio.select("doc_id", "audio").mapInPandas(stats, AUDIO_STATS_SCHEMA)


def scene_changes(frames: DataFrame, *, threshold: int = 200) -> DataFrame:
    """Scene-change detection over a sampled frame table — the shot-
    boundary step of a video pipeline: per-frame integer byte sum (one
    Arrow-batched pandas_udf; with a real codec this is where a frame
    histogram would go), then ONE keyed window per doc ordered by
    frame_idx: |Δ feature| > threshold marks a cut.

    Everything after feature extraction is integer arithmetic inside
    Catalyst, so the whole operator is SQL-oracle-checkable
    (plans/oracles.py::multimodal_scene_changes rebuilds every frame
    sum from hex-recovered bytes and replays the lag).  Per-key window
    state is bounded by frames-per-video.

    Output: (doc_id, n_frames int, n_scene_changes int).
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def byte_sum(fr: pd.Series) -> pd.Series:
        return fr.map(
            lambda b: int(np.frombuffer(bytes(b), dtype=np.uint8).sum())
            if b is not None
            else 0
        )

    feat = frames.withColumn("f_sum", byte_sum("frame"))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.abs(F.col("f_sum") - F.lag("f_sum").over(w))
    flagged = feat.withColumn(
        "is_cut",
        F.when(delta > threshold, F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.sum("is_cut").cast("int").alias("n_scene_changes"),
    )


def append_twin_docs(
    docs: DataFrame,
    *,
    every: int = 10,
    suffix: str = " ",
    id_offset: int = 1_000_000,
) -> DataFrame:
    """Plant a near-duplicate for every `every`-th document by
    appending one byte to its text (→ a last-row pixel change once
    rendered), id shifted by `id_offset`.  The ONE definition of the
    image twin fixture — shared by the registered query and its tests."""
    twins = docs.where(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        F.concat("text", F.lit(suffix)).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(twins)


def gain_twin_corpus(
    wavs: DataFrame,
    *,
    every: int = 10,
    gain: float = 0.9,
    id_offset: int = 1_000_000,
) -> DataFrame:
    """Plant a volume-scaled near-duplicate for every `every`-th clip:
    decode → ×gain → int16 re-round → re-encode, id shifted by
    `id_offset`.  The ONE definition of the audio twin fixture — used
    by both the registered query and its pinning tests so the planted
    semantics cannot drift apart."""

    def scale(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for blob in pdf["audio"]:
                s, rate = decode_wav(bytes(blob))
                s2 = np.clip(
                    np.round(s.astype(np.float64) * gain), -32768, 32767
                ).astype(np.int16)
                blobs.append(encode_wav(s2, sample_rate=rate))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"] + id_offset, "audio": blobs}
            )

    twins = (
        wavs.where(F.col("doc_id") % every == 0)
        .select("doc_id", "audio")
        .mapInPandas(scale, "doc_id long, audio binary")
    )
    return wavs.select("doc_id", "audio").unionByName(twins)


def audio_fingerprint(
    audio: DataFrame,
    *,
    frame: int = 32,
    max_frames: int = 15,
) -> DataFrame:
    """Spectral audio BLOCKING key — the constellation idea (Shazam /
    Chromaprint) reduced to its robust core: decode PCM →
    non-overlapping `frame`-sample windows → per-window |rFFT| peak
    bin (bins 1..16; DC skipped; 4 bits) → the first `max_frames`
    window codes packed into one long.

    The peak-bin index is invariant under volume gain (FFT is linear;
    argmax survives any positive scale) and robust to the rounding
    noise of a re-encode — re-gained/re-encoded audio lands on the
    SAME long (measured: 50/50 planted 0.9×-gain twins collide
    exactly).  Like every bucketing key in this repo it is a CANDIDATE
    generator, not a verdict: distinct clips with similar spectra can
    share a key (measured ~20% on the text-rendered corpus), so dup
    groups get a cheap verification pass (gain-normalized time-domain
    cosine — tests/test_multimodal.py shows it rejecting every false
    merge).  Grouping shuffles 8 bytes per clip, never samples — the
    image_dhash / text-digest discipline.

    Output: (doc_id long, fingerprint long, n_frames int).  Map-only,
    Arrow-batched; per-clip cost is one vectorized rFFT over a
    (frames × frame) matrix.
    """
    nbits = 4
    if max_frames * nbits > 63:
        raise ValueError(
            f"max_frames={max_frames} × {nbits} bits exceeds a signed long"
        )
    if frame < 2 * (1 << nbits):
        raise ValueError(f"frame={frame} too small for {1 << nbits} usable bins")

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, nfs = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                s, _rate = decode_wav(bytes(blob))
                n = (s.size // frame) * frame
                ids.append(doc_id)
                if n == 0:
                    fps.append(0)
                    nfs.append(0)
                    continue
                frames = s[:n].astype(np.float64).reshape(-1, frame)
                frames = frames[:max_frames]
                mag = np.abs(np.fft.rfft(frames, axis=1))
                codes = np.argmax(mag[:, 1 : 1 + (1 << nbits)], axis=1)
                val = 0
                for c in codes:
                    val = (val << nbits) | int(c)
                fps.append(val)
                nfs.append(len(frames))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "fingerprint": np.array(fps, dtype=np.int64),
                    "n_frames": np.array(nfs, dtype=np.int32),
                }
            )

    return audio.select("doc_id", "audio").mapInPandas(
        fp, "doc_id long, fingerprint long, n_frames int"
    )


# ---------------------------------------------------- JPEG round-trip
JPEG_STATS_SCHEMA = (
    "doc_id long, width int, height int, jpeg_bytes int, psnr_db double"
)


def jpeg_roundtrip_stats(
    documents: DataFrame, *, width: int = IMAGE_WIDTH, quality: int = 90
) -> DataFrame:
    """Render each document's utf-8 bytes as the deterministic RGB
    image (same raster as make_image_table), push it through the REAL
    baseline JPEG codec (operators/jpeg.py: DCT, Annex-K quantization,
    Huffman, byte stuffing) and report per-doc compressed size and
    round-trip PSNR — the fidelity report an image-ingest pipeline
    monitors.

    JPEG is lossy, so unlike the PNG path there is no pixel-exact SQL
    oracle; instead the whole pipeline is deterministic (render, DCT,
    quantizer, canonical Huffman), making the driver's rows-only check
    stable, and tests pin a PSNR floor that any real codec defect
    (wrong quant table, Huffman drift, zigzag slip) crashes through.
    Text bytes render as near-noise — JPEG's worst case — so the pinned
    floor is conservative for natural images.
    """
    from .jpeg import decode_jpeg, encode_jpeg

    row_bytes = width * 3

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in ("doc_id", "width", "height", "jpeg_bytes", "psnr_db")
            }
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                data = (t or "").encode("utf-8")
                h = max(1, -(-len(data) // row_bytes))
                buf = data + b"\x00" * (h * row_bytes - len(data))
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, width, 3)
                blob = encode_jpeg(arr, quality=quality)
                dec = decode_jpeg(blob)
                mse = float(
                    ((dec.astype(np.float64) - arr.astype(np.float64)) ** 2).mean()
                )
                psnr = 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec.shape[1])
                rows["height"].append(dec.shape[0])
                rows["jpeg_bytes"].append(len(blob))
                rows["psnr_db"].append(round(psnr, 3))
            yield pd.DataFrame(rows)

    return documents.select("doc_id", "text").mapInPandas(stats, JPEG_STATS_SCHEMA)


# ------------------------------------------- IMA-ADPCM compressed audio
# The COMPRESSED audio path on the stdlib: IMA ADPCM (4 bits/sample,
# 4:1 vs 16-bit PCM) via the `audioop` module that ships with this
# CPython (deprecated upstream; the import is gated so a future
# interpreter degrades this back to a declared stub instead of
# breaking the module).  Perceptual codecs (MP3/AAC) stay out of scope
# without ffmpeg — ADPCM is the honest stdlib-only compressed-audio
# representative, exactly as PNG/JPEG are for images.

ADPCM_MAGIC = b"ADP1"
ADPCM_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, adpcm_bytes int,"
    " compression_ratio double, snr_db double"
)


def _audioop():
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        return audioop
    except ImportError as ex:  # pragma: no cover - future interpreters
        raise NotImplementedError(
            "IMA-ADPCM needs the stdlib audioop module (removed in"
            " Python 3.13+); swap in an external codec here"
        ) from ex


def encode_adpcm(samples: "np.ndarray", *, sample_rate: int = 8000) -> bytes:
    """Compress int16 mono samples to IMA ADPCM in a small framed
    container: magic + rate + sample count + nibble stream."""
    import struct

    au = _audioop()
    s = np.ascontiguousarray(samples, dtype="<i2")
    data, _state = au.lin2adpcm(s.tobytes(), 2, None)
    return ADPCM_MAGIC + struct.pack("<II", sample_rate, len(s)) + data


def decode_adpcm(blob: bytes) -> tuple["np.ndarray", int]:
    """Decode the framed ADPCM blob back to int16 samples; ValueError
    on bad magic or truncation (same contract as decode_wav/png/jpeg)."""
    import struct

    au = _audioop()
    if blob[:4] != ADPCM_MAGIC:
        raise ValueError("not an ADP1 blob (bad magic)")
    if len(blob) < 12:
        raise ValueError("truncated ADPCM header")
    rate, n = struct.unpack_from("<II", blob, 4)
    payload = blob[12:]
    if len(payload) < -(-n // 2):
        raise ValueError("truncated ADPCM payload")
    pcm, _state = au.adpcm2lin(payload, 2, None)
    samples = np.frombuffer(pcm, dtype="<i2")[:n]
    if len(samples) < n:
        raise ValueError("truncated ADPCM payload")
    return samples, rate


def adpcm_roundtrip_stats(
    documents: DataFrame, *, sample_rate: int = 8000
) -> DataFrame:
    """Synthesize a deterministic tone per document (frequency keyed on
    doc_id, length on n_chars — the tonal regime ADPCM is built for),
    push it through the real IMA-ADPCM codec and report compression
    ratio + SNR.  Lossy ⇒ rows-only (no SQL oracle can reproduce the
    nibble predictor), but fully deterministic, with SNR floors pinned
    in tests."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_samples", "adpcm_bytes",
                    "compression_ratio", "snr_db",
                )
            }
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                n = max(256, 4 * len(t or ""))
                # 50-250 Hz: the band where a 4-bit delta codec holds
                # ~30-45 dB SNR (it degrades ~6 dB/octave above that)
                freq = 50.0 + (int(doc_id) * 37) % 200
                tt = np.arange(n, dtype=np.float64) / sample_rate
                samples = (12000.0 * np.sin(2 * np.pi * freq * tt)).astype("<i2")
                blob = encode_adpcm(samples, sample_rate=sample_rate)
                dec, rate = decode_adpcm(blob)
                # measure steady-state fidelity: the delta predictor
                # ramps from zero over the first few dozen samples, so
                # SNR excludes the standard warm-up window
                warm = 64
                ref = samples[warm:].astype(np.float64)
                err = dec[warm:].astype(np.float64) - ref
                sig = float((ref**2).mean())
                mse = float((err**2).mean())
                snr = 99.0 if mse == 0 else 10.0 * np.log10(sig / mse)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["adpcm_bytes"].append(len(blob))
                rows["compression_ratio"].append(
                    round(2.0 * n / max(len(blob) - 12, 1), 3)
                )
                rows["snr_db"].append(round(snr, 3))
            yield pd.DataFrame(rows)

    return documents.select("doc_id", "text").mapInPandas(stats, ADPCM_STATS_SCHEMA)


# --------------------------------------------- G.711 mu-law codec (stdlib)
# Telephony companding (CCITT G.711): 16-bit PCM -> 8 bits/sample via a
# logarithmic segment code.  Unlike ADPCM there is NO predictor state —
# the roundtrip is a pure per-sample quantization function, which makes
# this the one LOSSY codec whose decoded output a SQL oracle can
# reproduce bit-for-bit (the companding formula is integer arithmetic;
# verified identical to audioop for all 65536 int16 inputs in
# tests/test_g711.py).

ULAW_MAGIC = b"ULW1"
G711_STATS_SCHEMA = (
    "doc_id long, n_samples int, ulaw_bytes int,"
    " sum_decoded long, max_abs_err int"
)


def _frame_g711(
    magic: bytes, samples: "np.ndarray", conv, sample_rate: int
) -> bytes:
    """Shared companded-audio container: magic + rate + count + bytes."""
    import struct

    s = np.ascontiguousarray(samples, dtype="<i2")
    return magic + struct.pack("<II", sample_rate, len(s)) + conv(s.tobytes(), 2)


def _parse_g711(
    magic: bytes, blob: bytes, conv, label: str
) -> tuple["np.ndarray", int]:
    """Shared companded-audio parser; ValueError on bad magic or
    truncation (the decode_wav/png/jpeg contract)."""
    import struct

    if blob[:4] != magic:
        raise ValueError(f"not a {magic.decode()} blob (bad magic)")
    if len(blob) < 12:
        raise ValueError(f"truncated {label} header")
    rate, n = struct.unpack_from("<II", blob, 4)
    payload = blob[12:]
    if len(payload) < n:
        raise ValueError(f"truncated {label} payload")
    return np.frombuffer(conv(payload[:n], 2), dtype="<i2"), rate


def encode_ulaw(samples: "np.ndarray", *, sample_rate: int = 8000) -> bytes:
    """Compress int16 mono samples to G.711 mu-law (8 bits/sample) in
    the same framed container style as ADPCM: magic + rate + count."""
    return _frame_g711(ULAW_MAGIC, samples, _audioop().lin2ulaw, sample_rate)


def decode_ulaw(blob: bytes) -> tuple["np.ndarray", int]:
    """Decode a framed mu-law blob back to int16 samples."""
    return _parse_g711(ULAW_MAGIC, blob, _audioop().ulaw2lin, "mu-law")


def _companded_roundtrip_stats(
    documents: DataFrame,
    *,
    encode,
    decode,
    bytes_col: str,
    sample_rate: int,
) -> DataFrame:
    """Shared mu-law/A-law stats pass: samples from the document's
    utf-8 byte pairs (the make_audio_table rule), through the REAL
    codec and back, with per-doc decoded-sum and worst quantization
    error.  Because companding is stateless, the DuckDB oracles
    recover every sample from hex(text) and replay the exact integer
    formulas — hash-matched checks of lossy codecs (ADPCM's predictor
    state forces rows-only)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "n_samples", bytes_col,
                    "sum_decoded", "max_abs_err",
                )
            }
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                data = (t or "").encode("utf-8")
                n = len(data) // 2
                samples = np.frombuffer(data, dtype="<i2", count=n)
                blob = encode(samples, sample_rate=sample_rate)
                dec, _rate = decode(blob)
                err = np.abs(
                    samples.astype(np.int64) - dec.astype(np.int64)
                )
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out[bytes_col].append(len(blob))
                out["sum_decoded"].append(int(dec.astype(np.int64).sum()))
                out["max_abs_err"].append(int(err.max()) if n else 0)
            yield pd.DataFrame(out)

    schema = (
        f"doc_id long, n_samples int, {bytes_col} int,"
        " sum_decoded long, max_abs_err int"
    )
    return documents.select("doc_id", "text").mapInPandas(stats, schema)


def g711_roundtrip_stats(
    documents: DataFrame, *, sample_rate: int = 8000
) -> DataFrame:
    """Mu-law roundtrip stats — see _companded_roundtrip_stats."""
    return _companded_roundtrip_stats(
        documents,
        encode=encode_ulaw,
        decode=decode_ulaw,
        bytes_col="ulaw_bytes",
        sample_rate=sample_rate,
    )


# ------------------------------------------------ G.711 A-law (stdlib)
# The European companding twin: 13-bit domain (s >> 3), even-bit
# inversion mask 0x55, linear first segment.  Stateless like mu-law,
# so the roundtrip is again a pure integer function and the oracle
# replays it bit-for-bit (verified over all 65536 int16 inputs in
# tests/test_g711.py).

ALAW_MAGIC = b"ALW1"


def encode_alaw(samples: "np.ndarray", *, sample_rate: int = 8000) -> bytes:
    """Compress int16 mono samples to G.711 A-law (8 bits/sample)."""
    return _frame_g711(ALAW_MAGIC, samples, _audioop().lin2alaw, sample_rate)


def decode_alaw(blob: bytes) -> tuple["np.ndarray", int]:
    """Decode a framed A-law blob."""
    return _parse_g711(ALAW_MAGIC, blob, _audioop().alaw2lin, "A-law")


def alaw_roundtrip_stats(
    documents: DataFrame, *, sample_rate: int = 8000
) -> DataFrame:
    """A-law roundtrip stats — see _companded_roundtrip_stats."""
    return _companded_roundtrip_stats(
        documents,
        encode=encode_alaw,
        decode=decode_alaw,
        bytes_col="alaw_bytes",
        sample_rate=sample_rate,
    )


# ------------------------------------------------ energy VAD (numpy)
VAD_SCHEMA = (
    "doc_id long, n_frames int, active_frames int,"
    " n_segments int, longest_segment int"
)


def vad_segments(
    documents: DataFrame,
    *,
    frame: int = 80,
    energy_threshold: int = 40_000_000_000,
    mute_mod: int = 4,
) -> DataFrame:
    """Energy-based voice-activity detection — the speech-corpus
    pre-segmentation step (frame the clip, integer energy per frame,
    threshold, then gaps-and-islands into contiguous ACTIVE segments).

    Audio follows the make_audio_table rule (samples = the document's
    utf-8 byte pairs as int16), with PLANTED SILENCE: frame f of doc d
    is muted iff (d + f·2654435761) % mute_mod == 0 — a deterministic
    integer formula both engines replay, so segmentation is
    data-dependent but exactly reproducible.  Only full frames count
    (the tail partial frame is dropped, mirroring fixed-frame DSP).

    All arithmetic is integer (s² sums fit 2^37 per frame), so the
    DuckDB oracle recovers every sample from hex(text) — the
    multimodal_g711_stats discipline — and replays energy, threshold,
    and the island arithmetic bit-for-bit: a HASH-CHECKED segmentation
    of a lossy-domain operator.  Per-clip work is one reshape + one
    vectorized reduction in Arrow batches; no shuffle."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "n_frames", "active_frames",
                    "n_segments", "longest_segment",
                )
            }
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                data = (t or "").encode("utf-8")
                n = len(data) // 2
                n_frames = n // frame
                if n_frames == 0:
                    vals = (0, 0, 0, 0)
                else:
                    s = (
                        np.frombuffer(data, dtype="<i2", count=n_frames * frame)
                        .astype(np.int64)
                        .reshape(n_frames, frame)
                    )
                    f_idx = np.arange(n_frames, dtype=np.int64)
                    muted = (int(doc_id) + f_idx * 2654435761) % mute_mod == 0
                    energy = np.where(muted, 0, (s * s).sum(axis=1))
                    active = energy > energy_threshold
                    if not active.any():
                        vals = (n_frames, 0, 0, 0)
                    else:
                        idx = np.flatnonzero(active)
                        breaks = np.flatnonzero(np.diff(idx) > 1)
                        runs = np.split(idx, breaks + 1)
                        vals = (
                            n_frames,
                            int(active.sum()),
                            len(runs),
                            max(len(r) for r in runs),
                        )
                out["doc_id"].append(doc_id)
                for k, v in zip(
                    ("n_frames", "active_frames", "n_segments",
                     "longest_segment"),
                    vals,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return documents.select("doc_id", "text").mapInPandas(stats, VAD_SCHEMA)
