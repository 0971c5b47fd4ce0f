"""Multimodal columns — image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels.

Decoding is REAL (pure numpy) for the formats this container can
generate — binary PPM (P6) and uncompressed 24-bit BMP images,
RIFF/WAVE PCM16 audio, and YUV4MPEG2 (Y4M) video — so
``image_features``/``resize_images``/``audio_features``/
``video_features``/``sample_video_frames`` run end-to-end with no codec
dependency.  Codec formats (jpeg/png/mp3/mp4) still dispatch to the stub:
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
    """[asset_id, frame_idx, frame: binary] — every n-th frame per asset.

    REAL path for Y4M payloads (``encode_y4m``/``_decode_y4m`` below):
    frames are the decoded luma planes.  Codec containers (mp4/webm) keep
    the honest splitter stub (``decode_stub="fake"`` treats the payload as
    fixed-size chunks; ``"error"`` raises), so a real build swaps in
    pyav/ffmpeg without touching the Spark plumbing."""
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
                if raw[:9] == b"YUV4MPEG2":
                    _, _, _, fr = _decode_y4m(raw)
                    for fi in range(0, len(fr), every_nth):
                        rows.append((int(aid), fi, fr[fi].tobytes()))
                    continue
                if decode_stub == "error":
                    raise NotImplementedError(
                        "payload is not Y4M; codec containers require "
                        "ffmpeg/pyav, not present in this container"
                    )
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

# ---------------------------------------------------------------------------
# Audio — REAL pure-numpy WAV (RIFF PCM16) path, same contract as images:
# binary payloads stay in Arrow batches executor-side, only (id, payload)
# enter the kernel, all arithmetic is integer-exact so stats are oracle-able.
# Compressed formats (mp3/flac/ogg) dispatch to the stub exactly like
# jpeg/png on the image side.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 1-D array → mono RIFF/WAVE PCM16 bytes — fixture/test encoder."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    hdr = (
        b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits/sample
        + b"data" + n.to_bytes(4, "little")
    )
    return hdr + pcm


def _decode_wav(data: bytes):
    """RIFF/WAVE PCM16 mono → (sample_rate, int16 array). Walks the chunk
    list (handles extra chunks like LIST before data)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, bits, channels = 12, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16 or channels != 1:
                raise NotImplementedError(
                    f"only PCM16 mono WAV supported (fmt={fmt}, bits={bits}, "
                    f"channels={channels})"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, samples


def _decode_audio(data: bytes, stub: str):
    """(sample_rate, int16 samples) with a REAL path for RIFF/WAVE PCM16 and
    a stub for codec formats (mp3/flac need decoder libs a real deployment
    adds; the Spark-side contract — bytes in, samples out — is unchanged)."""
    if data[:4] == b"RIFF":
        return _decode_wav(data)
    if stub == "error":
        raise NotImplementedError(
            "payload is not PCM WAV; codec formats (mp3/flac/ogg) require an "
            "audio codec (ffmpeg/soundfile) not present in this container"
        )
    digest = hashlib.sha256(data).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return 16000, rng.integers(-2048, 2048, size=256).astype(np.int16)


def audio_features(
    assets: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """[asset_id, sample_rate, n_samples, duration_sec, rms, zcr, peak] —
    decode → integer-exact stats, one Arrow batch at a time.

    All accumulations are int64 (sum of squares, crossing count, max |v|)
    with a single float division/sqrt at the end, so an engine mirroring the
    sample law reproduces every value bit-identically.  Only (id, payload)
    enter the kernel — project before calling so the scan is pruned.
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
            T.StructField("peak", T.LongType()),
        ]
    )

    def _kernel(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                sr, s = _decode_audio(bytes(payload), decode_stub)
                v = s.astype(np.int64)
                n = len(v)
                sum_sq = int((v * v).sum())
                # zero-crossing: strict sign product < 0 between neighbors
                crossings = int(((v[:-1] * v[1:]) < 0).sum()) if n > 1 else 0
                rows.append(
                    (
                        int(aid),
                        int(sr),
                        n,
                        n / sr,
                        float(np.sqrt(sum_sq / n)) if n else 0.0,
                        crossings / (n - 1) if n > 1 else 0.0,
                        int(np.abs(v).max()) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_samples", "duration_sec",
                    "rms", "zcr", "peak",
                ],
            )

    return assets.select(id_col, payload_col).mapInPandas(_kernel, schema)


def resample_audio(
    assets: DataFrame,
    target_rate: int = 8000,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """[asset_id, sample_rate, payload] — decode → nearest-neighbor resample
    → re-encode WAV. Same kernel/batch contract as resize_images."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _kernel(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                sr, s = _decode_audio(bytes(payload), decode_stub)
                m = max(int(round(len(s) * target_rate / sr)), 1)
                idx = (np.arange(m) * len(s) // m).astype(int)
                rows.append((int(aid), target_rate, encode_wav(s[idx], target_rate)))
            yield pd.DataFrame(rows, columns=[id_col, "sample_rate", "payload"])

    return assets.select(id_col, payload_col).mapInPandas(_kernel, schema)


def chirp_audio_assets(
    spark, n: int = 32, sample_rate: int = 16000, n_samples: int = 2048
) -> DataFrame:
    """Deterministic REAL-format audio table [asset_id, payload,
    sample_rate, n_samples]: sample i of asset a is
    ``((137·a + 31·i) mod 4001) − 2000`` (int16) — a closed integer form
    any engine can mirror in SQL, so rms/zcr/peak are exactly oracle-able."""

    def _gen(batches):
        for pdf in batches:
            rows = []
            for a in pdf["id"].to_numpy():
                i = np.arange(n_samples, dtype=np.int64)
                s = ((137 * int(a) + 31 * i) % 4001 - 2000).astype(np.int16)
                rows.append(
                    (int(a), encode_wav(s, sample_rate), sample_rate, n_samples)
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "payload", "sample_rate", "n_samples"]
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
        ]
    )
    return spark.range(n).mapInPandas(_gen, schema)


# ---------------------------------------------------------------------------
# Video — REAL pure-numpy Y4M (YUV4MPEG2, Cmono) path.  Y4M is ffmpeg's
# uncompressed interchange format: an ASCII stream header, then per frame
# an ASCII "FRAME" marker followed by raw planes — decodable with nothing
# but byte slicing, yet bit-compatible with real tooling.  Codec containers
# (mp4/webm) dispatch to the splitter stub exactly like jpeg on the image
# side.  Frame pixels stay uint8 in Arrow batches; stats accumulate in
# int64 with one final division so every value is exactly oracle-able.
# ---------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n_frames, h, w) uint8 luma array → YUV4MPEG2 Cmono bytes —
    fixture/test encoder. ffmpeg reads the result as-is."""
    n, h, w = frames.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    body = b"".join(
        b"FRAME\n" + np.ascontiguousarray(frames[i], dtype=np.uint8).tobytes()
        for i in range(n)
    )
    return hdr + body


def _decode_y4m(data: bytes):
    """YUV4MPEG2 → (width, height, fps, (n,h,w) uint8 luma frames).
    Supports Cmono (luma-only) and C420* (chroma planes skipped)."""
    nl = data.index(b"\n")
    head = data[:nl].decode("ascii", "strict")
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    chroma = "420"
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C":
            chroma = tok[1:]
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    luma = w * h
    if chroma.startswith("mono"):
        fsize = luma
    elif chroma.startswith("420"):
        fsize = luma + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("444"):
        fsize = 3 * luma
    else:
        raise NotImplementedError(f"Y4M chroma {chroma} unsupported")
    frames, pos = [], nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        body = data[fnl + 1 : fnl + 1 + fsize]
        if len(body) < fsize:
            raise ValueError("Y4M truncated frame")
        frames.append(
            np.frombuffer(body[:luma], dtype=np.uint8).reshape(h, w)
        )
        pos = fnl + 1 + fsize
    return w, h, (fps or 25), np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)


def video_features(
    assets: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """[asset_id, width, height, n_frames, fps, duration_sec, mean_luma,
    max_luma, motion] — Y4M decode → integer-exact per-asset stats.

    ``motion`` is the mean absolute luma difference between consecutive
    frames — the standard cheap scene-activity proxy — accumulated in
    int64, divided once.  Non-Y4M payloads use the stub (fake/error),
    matching the image/audio dispatch contract.
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("mean_luma", T.DoubleType()),
            T.StructField("max_luma", T.LongType()),
            T.StructField("motion", T.DoubleType()),
        ]
    )

    def _decode(data: bytes):
        if data[:9] == b"YUV4MPEG2":
            return _decode_y4m(data)
        if decode_stub == "error":
            raise NotImplementedError(
                "payload is not Y4M; codec containers (mp4/webm) require "
                "ffmpeg/pyav, not present in this container"
            )
        digest = hashlib.sha256(data).digest()
        seed = int.from_bytes(digest[:8], "big") % (2**32)
        rng = np.random.default_rng(seed)
        return 8, 8, 25, rng.integers(0, 256, size=(4, 8, 8)).astype(np.uint8)

    def _kernel(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, fps, fr = _decode(bytes(payload))
                v = fr.astype(np.int64)
                n, npx = len(v), w * h
                tot = int(v.sum())
                diff = (
                    int(np.abs(v[1:] - v[:-1]).sum()) if n > 1 else 0
                )
                rows.append(
                    (
                        int(aid), w, h, n, fps,
                        n / fps,
                        tot / (n * npx) if n else 0.0,
                        int(v.max()) if n else 0,
                        diff / ((n - 1) * npx) if n > 1 else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "n_frames", "fps",
                    "duration_sec", "mean_luma", "max_luma", "motion",
                ],
            )

    return assets.select(id_col, payload_col).mapInPandas(_kernel, schema)


def checker_video_assets(
    spark, n: int = 16, w: int = 16, h: int = 16, n_frames: int = 24,
    fps: int = 25,
) -> DataFrame:
    """Deterministic REAL-format video table [asset_id, payload, width,
    height, n_frames]: luma of pixel p in frame f of asset a is
    ``(11·a + 5·f + 3·p) mod 251`` — a closed integer form any engine can
    mirror in SQL, so mean/max/motion are exactly oracle-able."""

    def _gen(batches):
        for pdf in batches:
            rows = []
            for a in pdf["id"].to_numpy():
                f_idx = np.arange(n_frames, dtype=np.int64)[:, None]
                p_idx = np.arange(w * h, dtype=np.int64)[None, :]
                fr = ((11 * int(a) + 5 * f_idx + 3 * p_idx) % 251).astype(
                    np.uint8
                ).reshape(n_frames, h, w)
                rows.append((int(a), encode_y4m(fr, fps), w, h, n_frames))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "payload", "width", "height", "n_frames"],
            )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    return spark.range(n).mapInPandas(_gen, schema)
