"""Real netpbm decode path: pure-numpy P6/P5 codec round-trips, plus
the Spark render → decode → stats pipeline checked against hand-computed
numpy on planted fixtures (the oracle cross-checks it again at scale)."""

from __future__ import annotations

import numpy as np
import pytest

from northwind_etl_spark.operators import multimodal as M

# ----------------------------------------------------------- pure codec


def test_p6_round_trip():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    out = M.decode_image(M.encode_ppm(arr))
    assert out.shape == (5, 4, 3)
    assert np.array_equal(out, arr)


def test_p5_round_trip():
    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = M.decode_image(M.encode_ppm(arr))
    assert out.shape == (4, 6)
    assert np.array_equal(out, arr)


def test_header_comments_and_whitespace():
    arr = np.full((2, 2, 3), 9, dtype=np.uint8)
    blob = b"P6\n# a comment\n  2\t2 # trailing\n255\n" + arr.tobytes()
    assert np.array_equal(M.decode_image(blob), arr)


def test_rejects_16bit_maxval():
    blob = b"P6\n2 2\n65535\n" + bytes(24)
    with pytest.raises(ValueError, match="maxval"):
        M.decode_image(blob)


def test_truncated_header_raises():
    with pytest.raises(ValueError):
        M.decode_image(b"P6\n2 ")


def test_compressed_format_dispatch():
    # PNG and JPEG both dispatch to real decoders (truncated input
    # fails loudly, not silently); only compressed audio remains a
    # declared stub
    with pytest.raises(ValueError, match="IEND|IHDR|truncated"):
        M.decode_image(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(ValueError, match="truncated|marker"):
        M.decode_image(b"\xff\xd8\xff\xe0rest-of-jpeg")
    with pytest.raises(NotImplementedError, match="audio"):
        M.decode_image(b"ID3\x04unsupported-mp3")


# ------------------------------------------------------- spark pipeline


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        (1, "abc"),                      # 3 bytes -> 1 row, heavy padding
        (2, "x" * 48),                   # exactly one full row
        (3, "hello world " * 11),        # 132 bytes -> 3 rows
        (4, ""),                         # empty -> all-zero 16x1 image
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_render_decode_round_trip(planted_docs):
    imgs = {r.doc_id: r for r in M.make_image_table(planted_docs).collect()}
    for doc_id, text in [(1, "abc"), (2, "x" * 48), (3, "hello world " * 11), (4, "")]:
        a = M.decode_image(bytes(imgs[doc_id].image))
        data = text.encode()
        h = max(1, -(-len(data) // 48))
        assert a.shape == (h, 16, 3) == (imgs[doc_id].height, imgs[doc_id].width, 3)
        flat = a.reshape(-1)
        assert bytes(flat[: len(data)]) == data
        assert not flat[len(data):].any()  # zero padding


def test_image_stats_match_numpy(planted_docs):
    stats = {r.doc_id: r for r in M.image_stats(M.make_image_table(planted_docs)).collect()}
    for doc_id, text in [(1, "abc"), (2, "x" * 48), (3, "hello world " * 11), (4, "")]:
        data = np.frombuffer(text.encode(), dtype=np.uint8)
        expected = np.zeros(3, dtype=np.int64)
        for ch in range(3):
            expected[ch] = int(data[ch::3].sum())
        r = stats[doc_id]
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(expected), doc_id
        assert r.channels == 3


def test_resize_images_nearest_neighbor(spark):
    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_ppm(arr)), "image/x-portable-pixmap", 4, 4)],
        M.IMAGE_TABLE_SCHEMA,
    )
    out = M.resize_images(df, factor=2).collect()[0]
    small = M.decode_image(bytes(out.image))
    assert out.width == 2 and out.height == 2
    assert np.array_equal(small, arr[::2, ::2])


def test_blob_dispatch_survives_worker_without_repo_on_path(tmp_path):
    """decode_image's compressed dispatch (PNG + JPEG branches) must
    run in a process that cannot import the package — the runtime
    `from .jpeg import ...` that used to sit inside the JPEG branch
    was exactly the mdct-class worker killer, just on a branch no
    registry fixture happened to exercise."""
    import subprocess
    import sys as _sys

    import numpy as np
    import pyspark.cloudpickle as cp

    def outer():
        from northwind_etl_spark.operators.jpeg import encode_jpeg
        from northwind_etl_spark.operators.multimodal import (
            decode_image,
            encode_png,
        )

        def run():
            import numpy as _np

            y, x = _np.mgrid[0:16, 0:16]
            img = _np.stack([x, y, x], -1).astype(_np.uint8) * 8
            png = decode_image(encode_png(img))
            jpg = decode_image(encode_jpeg(img, quality=90))
            return f"png={png.shape} jpgerr={int(_np.abs(jpg.astype(int) - img.astype(int)).mean())}"

        return run

    pkl = tmp_path / "dispatch.bin"
    pkl.write_bytes(cp.dumps(outer()))
    r = subprocess.run(
        [
            _sys.executable,
            "-c",
            "import sys, pyspark.cloudpickle as cp;"
            "sys.path = [p for p in sys.path if 'repo' not in p];"
            f"f = cp.loads(open({str(pkl)!r}, 'rb').read()); print(f())",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "png=(16, 16, 3)" in r.stdout
