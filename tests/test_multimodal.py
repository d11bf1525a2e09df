

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

    # a blob cut mid-chunk must stay inside the ValueError contract
    # (not leak struct.error from an undersized CRC slice)
    whole = encode_png(a)
    for cut in (len(whole) - 7, len(whole) // 2, 20):
        with pytest.raises(ValueError, match="truncated|missing"):
            decode_png(whole[:cut])


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


def test_wav_codec_roundtrip_and_guards(spark):
    import numpy as np
    import pytest

    from northwind_etl_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    d, rate = decode_wav(encode_wav(s, sample_rate=16000))
    assert np.array_equal(d, s) and rate == 16000
    d0, _ = decode_wav(encode_wav(np.zeros(0, dtype=np.int16)))
    assert d0.size == 0
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x04mp3-ish-bytes")
    # stereo/8-bit formats fail loudly, not silently mono-ified
    import struct

    bad_fmt = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="channels=2"):
        decode_wav(bad_fmt)


def test_audio_stats_planted(spark):
    import numpy as np

    from northwind_etl_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "AB"), (2, "ABC"), (3, ""), (4, "é")],  # é = 2 utf-8 bytes
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in M.audio_stats(M.make_audio_table(docs)).collect()}
    # "AB" = 0x41 0x42 -> int16 LE 0x4241 = 16961
    assert rows[1].n_samples == 1 and rows[1].sum_abs == 16961
    # "ABC": odd tail byte dropped -> same single sample
    assert rows[2].n_samples == 1 and rows[2].sum_abs == 16961
    assert rows[3].n_samples == 0 and rows[3].sum_abs == 0 and rows[3].max_abs == 0
    # é = 0xC3 0xA9 -> 0xA9C3 = 43459 -> signed -22077
    assert rows[4].sum_abs == 22077 and rows[4].max_abs == 22077


def test_codec_roundtrip_property(spark):
    """Property-based: any uint8 image / int16 PCM array survives its
    codec round-trip bit-for-bit."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from northwind_etl_spark.operators.multimodal import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        gray=st.booleans(),
        seed=st.integers(0, 2**32 - 1),
    )
    def png_prop(h, w, gray, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a)

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(0, 500), rate=st.sampled_from([8000, 16000, 44100]),
           seed=st.integers(0, 2**32 - 1))
    def wav_prop(n, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        d, r = decode_wav(encode_wav(s, sample_rate=rate))
        assert r == rate and np.array_equal(d, s)

    png_prop()
    wav_prop()


def test_adpcm_codec_roundtrip_and_contracts():
    """IMA-ADPCM (stdlib audioop): 4:1 compression, high SNR on tonal
    input, framing error contracts matching the other codecs."""
    import numpy as np
    import pytest

    from northwind_etl_spark.operators.multimodal import (
        decode_adpcm,
        encode_adpcm,
    )

    t = np.arange(4000) / 8000.0
    s = (8000 * np.sin(2 * np.pi * 100 * t)).astype("<i2")
    blob = encode_adpcm(s, sample_rate=8000)
    assert len(blob) - 12 == 2000  # 4 bits/sample vs 16
    dec, rate = decode_adpcm(blob)
    assert rate == 8000 and len(dec) == 4000
    err = dec.astype(float) - s.astype(float)
    snr = 10 * np.log10((s.astype(float) ** 2).mean() / (err**2).mean())
    assert snr > 32.0  # measured 38.1 dB at 100 Hz
    with pytest.raises(ValueError, match="magic"):
        decode_adpcm(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm(blob[:8])
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm(blob[: len(blob) // 2])


def test_adpcm_roundtrip_stats_operator(spark, sf_dir):
    from northwind_etl_spark.operators.multimodal import adpcm_roundtrip_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    rows = adpcm_roundtrip_stats(docs).collect()
    assert len(rows) == 30
    for r in rows:
        assert 3.5 < r["compression_ratio"] <= 4.5, r
        assert r["snr_db"] > 25.0, r  # tonal regime; floor is generous


def test_image_dhash_twins_collide_and_originals_separate(spark, sf_dir):
    from northwind_etl_spark.operators import multimodal as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    h = {
        r["doc_id"]: r["dhash"]
        for r in M.image_dhash(
            M.make_image_table(M.append_twin_docs(docs))
        ).collect()
    }
    twin_ids = [k for k in h if k >= 1000000]
    assert twin_ids
    dists = [
        bin((h[t] ^ h[t - 1000000]) & ((1 << 64) - 1)).count("1")
        for t in twin_ids
    ]
    # a one-byte append is a near-identical image: always within 2 bits,
    # almost always an exact collision
    assert max(dists) <= 2
    assert sum(1 for d in dists if d == 0) >= 0.9 * len(dists)
    # distinct documents must NOT collapse: ≥95% distinct hashes
    originals = [v for k, v in h.items() if k < 1000000]
    assert len(set(originals)) >= 0.95 * len(originals)


def test_image_dhash_deterministic_and_signed_packing(spark, sf_dir):
    from northwind_etl_spark.operators import multimodal as M

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(30)
    )
    a = sorted(map(tuple, M.image_dhash(M.make_image_table(docs)).collect()))
    b = sorted(map(tuple, M.image_dhash(M.make_image_table(docs)).collect()))
    assert a == b
    # packing fits the signed long column (two's complement applied)
    assert all(-(1 << 63) <= v < (1 << 63) for _, v in a)


def _gain_twins(spark, sf_dir):
    # the ONE twin fixture definition lives in the operator module —
    # the test pins exactly what the registered query runs
    from northwind_etl_spark.operators import multimodal as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return M.gain_twin_corpus(M.make_audio_table(docs))


def test_audio_fingerprint_gain_invariant_blocking(spark, sf_dir):
    from northwind_etl_spark.operators import multimodal as M

    corpus = _gain_twins(spark, sf_dir)
    h = {
        r["doc_id"]: r["fingerprint"]
        for r in M.audio_fingerprint(corpus).collect()
    }
    twin_ids = [k for k in h if k >= 1000000]
    assert twin_ids
    # gain invariance: every volume-scaled twin shares its source's key
    assert all(h[t] == h[t - 1000000] for t in twin_ids)
    # blocking selectivity: the key separates most distinct clips
    originals = [v for k, v in h.items() if k < 1000000]
    assert len(set(originals)) >= 0.7 * len(originals)


def test_audio_fingerprint_verification_rejects_false_merges(spark, sf_dir):
    """The fingerprint is a blocking key; a gain-normalized time-domain
    cosine inside each collided group separates planted twins (≈1.0)
    from spectrally-similar but distinct clips."""
    import collections

    import numpy as np

    from northwind_etl_spark.operators import multimodal as M

    corpus = _gain_twins(spark, sf_dir)
    rows = corpus.collect()
    samples = {}
    for r in rows:
        s, _ = M.decode_wav(bytes(r["audio"]))
        v = s.astype(np.float64)
        samples[r["doc_id"]] = v / (np.linalg.norm(v) or 1.0)
    fps = {
        r["doc_id"]: r["fingerprint"]
        for r in M.audio_fingerprint(corpus).collect()
    }
    groups = collections.defaultdict(list)
    for did, f in fps.items():
        groups[f].append(did)
    true_pairs, false_pairs = 0, 0
    for members in groups.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = samples[members[i]], samples[members[j]]
                n = min(a.size, b.size)
                cos = float(a[:n] @ b[:n]) if n else 0.0
                is_twin = abs(members[i] - members[j]) == 1000000
                if cos >= 0.999:
                    assert is_twin, "false merge survived verification"
                    true_pairs += 1
                else:
                    assert not is_twin, "twin failed verification"
                    false_pairs += 1
    assert true_pairs == 50  # every planted twin verified
    assert false_pairs > 0  # the corpus DOES produce false merges — the
    # verification step is load-bearing, not decorative


def test_vad_segments_edges(spark):
    """Planted VAD fixtures: short docs (zero full frames) emit a zero
    row; a known 3-frame doc segments per the mute formula."""
    from northwind_etl_spark.operators.multimodal import vad_segments

    # 'a'*480 -> 240 samples -> 3 full frames, all same loud sample
    rows = [(0, "x"), (1, ""), (2, "a" * 480)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in vad_segments(df).collect()}
    assert (out[0].n_frames, out[0].n_segments) == (0, 0)
    assert (out[1].n_frames, out[1].n_segments) == (0, 0)
    r2 = out[2]
    assert r2.n_frames == 3
    # mute iff (2 + f*2654435761) % 4 == 0: f=2 muted (2+2*...=even..)
    muted = [(2 + f * 2654435761) % 4 == 0 for f in range(3)]
    assert r2.active_frames == 3 - sum(muted)
    assert r2.longest_segment >= 1
