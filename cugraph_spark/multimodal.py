"""Multimodal columns — image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels.

Image decoding is REAL (pure numpy) for the formats this container can
generate — binary PPM (P6) and uncompressed 24-bit BMP — so
``image_features``/``resize_images`` run end-to-end with no codec
dependency.  Codec formats (jpeg/png/video) still dispatch to the stub:
``decode_stub="fake"`` produces a deterministic pure function of the bytes
(so tests pin exact outputs), ``decode_stub="error"`` raises
NotImplementedError at the decode call site; a real deployment swaps in
PIL/turbojpeg/pyav without touching the Spark plumbing.  That plumbing is
what matters for the 100 TB pipeline: binary
payloads stay in Arrow record batches executor-side, are never collected,
and flow through column-pruned scans (select the binary column ONLY into
the kernel stage, exactly like the ``html`` column in ingest.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURE_DIM = 8

image_meta_schema = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _decode_ppm(data: bytes) -> np.ndarray:
    """Pure-numpy decoder for binary PPM (P6, maxval ≤ 255) — handles the
    standard header grammar (whitespace-separated tokens, ``#`` comments)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6) bytes — fixture/test encoder."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, np.uint8).tobytes()


def _decode_bmp(data: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BI_RGB): bottom-up BGR rows padded to 4 bytes → HxWx3 RGB."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, count=stride * h, offset=off).reshape(
        h, stride
    )[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → uncompressed 24-bit BMP bytes (bottom-up, padded)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, flip
    raster = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + raster


def _decode_image(data: bytes, stub: str) -> np.ndarray:
    """Decoder with REAL pure-numpy paths for the container-generatable
    formats (binary PPM, uncompressed 24-bit BMP) and a stub for codec
    formats (jpeg/png need libjpeg/zlib bindings a real deployment adds;
    the Spark-side contract — bytes in → HxWx3 uint8 out — is unchanged)."""
    if data[:2] == b"P6":
        return _decode_ppm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if stub == "error":
        raise NotImplementedError(
            "payload is not PPM/BMP; codec formats (jpeg/png) require an "
            "image codec (PIL/turbojpeg) not present in this container"
        )
    # deterministic fake: pixels seeded from a digest of the payload
    digest = hashlib.sha256(data).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)


def image_features(
    assets: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """[asset_id, feature: array<double>] — decode → per-channel mean/std +
    2-bin histogram (IMAGE_FEATURE_DIM values), one Arrow batch at a time.

    Only (id, payload) enter the kernel — project before calling so the
    scan is pruned to those columns.
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def _kernel(batches):
        for pdf in batches:
            ids, feats = [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_image(bytes(payload), decode_stub).astype(np.float64)
                per_chan = img.reshape(-1, 3)
                feat = np.concatenate(
                    [
                        per_chan.mean(axis=0),
                        per_chan.std(axis=0),
                        [float((img < 128).mean()), float((img >= 128).mean())],
                    ]
                )
                ids.append(int(aid))
                feats.append(feat.tolist())
            yield pd.DataFrame({id_col: ids, "feature": feats})

    return assets.select(id_col, payload_col).mapInPandas(_kernel, schema)


def resize_images(
    assets: DataFrame,
    target: tuple = (8, 8),
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """[asset_id, width, height, pixels: binary] — decode → nearest-neighbor
    resize → re-emit raw pixel bytes. Same kernel/batch contract."""
    th, tw = target
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def _kernel(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_image(bytes(payload), decode_stub)
                ys = (np.arange(th) * img.shape[0] // th).astype(int)
                xs = (np.arange(tw) * img.shape[1] // tw).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append((int(aid), tw, th, small.tobytes()))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "pixels"])

    return assets.select(id_col, payload_col).mapInPandas(_kernel, schema)


def sample_video_frames(
    assets: DataFrame,
    every_nth: int = 10,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """[asset_id, frame_idx, frame: binary] — frame sampling plumbing: the
    stub treats the payload as a concatenation of fixed-size 'frames' and
    emits every n-th; a real build swaps the splitter for pyav/ffmpeg."""
    if decode_stub == "error":
        raise NotImplementedError(
            "video decoding requires ffmpeg/pyav, not present in this container"
        )
    frame_bytes = 64
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _kernel(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                n_frames = max(len(raw) // frame_bytes, 1)
                for fi in range(0, n_frames, every_nth):
                    rows.append(
                        (int(aid), fi, raw[fi * frame_bytes : (fi + 1) * frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return assets.select(id_col, payload_col).mapInPandas(_kernel, schema)


def gradient_image_assets(
    spark, n: int = 64, width: int = 16, height: int = 16, fmt: str = "ppm"
) -> DataFrame:
    """Deterministic REAL-format image table [asset_id, payload, width,
    height, format]: flat RGB byte ``i`` of asset ``a`` is
    ``(7·a + i) mod 256`` — a closed form any engine can mirror in SQL, so
    decoded per-channel stats are exactly oracle-able."""
    npx = width * height * 3

    def _gen(batches):
        for pdf in batches:
            rows = []
            for a in pdf["id"].to_numpy():
                flat = ((7 * int(a) + np.arange(npx)) % 256).astype(np.uint8)
                img = flat.reshape(height, width, 3)
                payload = encode_ppm(img) if fmt == "ppm" else encode_bmp(img)
                rows.append((int(a), payload, width, height, fmt))
            yield pd.DataFrame(
                rows, columns=["asset_id", "payload", "width", "height", "format"]
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("format", T.StringType()),
        ]
    )
    return spark.range(n).mapInPandas(_gen, schema)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table [asset_id, payload, width, height,
    format] for tests — payload is a seeded byte string per id."""
    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(int(i) + 1)
                payload = rng.integers(0, 256, size=640, dtype=np.uint8).tobytes()
                rows.append((int(i), payload, 16, 16, "fake"))
            yield pd.DataFrame(
                rows, columns=["asset_id", "payload", "width", "height", "format"]
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("format", T.StringType()),
        ]
    )
    return spark.range(n).mapInPandas(_gen, schema)
