"""Multimodal columns — image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the DECODE step is stubbed:
``decode_stub="fake"`` produces a deterministic pure function of the bytes
(so tests pin exact outputs), ``decode_stub="error"`` raises
NotImplementedError at the decode call site. Everything around the stub —
schema handling, partitioning, the mapInPandas batch shape, metadata
propagation — is real and is what matters for the 100 TB pipeline: binary
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


def _decode_image(data: bytes, stub: str) -> np.ndarray:
    """Stubbed decoder. A real deployment swaps this for PIL/libjpeg; the
    Spark-side contract (bytes in → HxWx3 uint8 out) is unchanged."""
    if stub == "error":
        raise NotImplementedError(
            "image decoding requires an image codec (PIL/turbojpeg) not "
            "present in this container"
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
