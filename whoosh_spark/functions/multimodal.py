"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.

Decoders:
  "stdlib" (default) — a REAL decode path with no external libraries:
      image/png  -> full PNG decode (chunk parse, zlib inflate, scanline
                    unfilter) implemented here in pure Python
      audio/wav  -> PCM decode via the stdlib ``wave`` module
      video/*    -> no stdlib codec exists; falls back to the deterministic
                    payload-hash features (documented stub)
  "fake"    — deterministic synthetic features from payload bytes (plumbing
              tests, any media kind)
  "pillow"/"librosa" — gated on the library actually importing; raise
              NotImplementedError with a capability message otherwise.

``synth_media`` generates REAL minimal PNG and WAV payloads so the stdlib
decode path is exercised end-to-end (decoded dimensions are asserted against
the generator's metadata in tests/test_functions.py).
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        # True only when a real codec decoded the payload; the video/unknown
        # hash-fallback (and decoder="fake") sets False, so a caller can
        # always tell real features from the documented stub per-row.
        T.StructField("decoded", T.BooleanType()),
    ]
)

FEATURE_DIM = 16


# ------------------------------------------------------------ PNG encode/decode
# Pure-python PNG support for 8-bit grayscale (what synth_media generates) —
# the decoder handles all five standard scanline filters and any IDAT split.

def png_encode_gray(pixels: np.ndarray) -> bytes:
    """Minimal real PNG writer: 8-bit grayscale, filter 0 scanlines."""
    h, w = pixels.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    raw = b"".join(b"\x00" + pixels[r].astype(np.uint8).tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real PNG decode for 8-bit grayscale/RGB(A): returns (w, h, pixels)
    with pixels shaped (h, w*channels)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = None
    channels = 1
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * channels
    bpp = channels  # bytes per pixel at depth 8
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for r in range(h):
        ftype = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], dtype=np.uint8).astype(np.int32)
        p += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return w, h, out


def wav_encode_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal real WAV writer: 16-bit PCM mono."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Real WAV decode via the stdlib wave module: (sample_rate, samples)."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = wf.readframes(n)
        width = wf.getsampwidth()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return rate, samples


# ---------------------------------------------------------------- synth table

def synth_media_row(i: int, seed: int = 42) -> dict:
    """One deterministic synthetic media row (pure function of (i, seed) —
    shared by the distributed generator below and the committed DuckDB
    fixture in tests/fixtures/, so the oracle can cross-check live payloads
    against the committed snapshot byte-for-byte)."""
    kinds = ["image", "audio", "video"]
    kind = kinds[i % 3]
    rng = np.random.default_rng(seed * 1_000_003 + i)
    if kind == "image":
        w = 8 + (i % 4) * 4
        h = 8 + (i % 3) * 4
        payload = png_encode_gray(rng.integers(0, 256, size=(h, w), dtype=np.uint8))
        meta = {"width": w, "height": h, "duration_ms": None, "sample_rate": None}
    elif kind == "audio":
        rate = 8000
        dur_ms = 10 + (i % 20) * 5
        ns = rate * dur_ms // 1000
        samples = (rng.standard_normal(ns) * 8000).clip(-32768, 32767)
        payload = wav_encode_pcm16(samples, rate)
        meta = {"width": None, "height": None, "duration_ms": dur_ms, "sample_rate": rate}
    else:
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        meta = {"width": 64, "height": 64, "duration_ms": 1000 + i % 9000, "sample_rate": None}
    return {
        "media_id": i,
        "kind": kind,
        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        "payload": payload,
        "meta": meta,
    }


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads: actual PNG
    images and WAV audio (stdlib-decodable); video payloads are opaque
    seeded bytes (no stdlib video codec exists)."""
    base = spark.range(0, n)

    def gen(batches):
        for pdf in batches:
            rows = [synth_media_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


# -------------------------------------------------------------------- decode

def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in features: 16 floats from sha256."""
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0)


def _capability_check(decoder: str) -> None:
    """Raise a clear NotImplementedError when an optional decoder library is
    absent — the capability gate for pillow/librosa paths."""
    mod = {"pillow": "PIL", "librosa": "librosa"}[decoder]
    try:
        __import__(mod)
    except ImportError as e:
        raise NotImplementedError(
            f"decoder {decoder!r} requires the {mod} library, which is not "
            f"installed in this environment; use decoder='stdlib' (real "
            f"PNG/WAV decode, no dependencies) or 'fake'"
        ) from e


def _stdlib_features(kind: str, mime: str, payload: bytes):
    """(feature[16], width, height, sample_rate, n_samples, decoded) via
    real stdlib decode; decoded=False marks the hash-fallback stub."""
    if kind == "image" and mime == "image/png":
        w, h, px = png_decode(payload)
        f = np.zeros(FEATURE_DIM, dtype=np.float32)
        f[0], f[1] = w, h
        f[2] = px.mean() / 255.0
        f[3] = px.std() / 255.0
        f[4] = px.min() / 255.0
        f[5] = px.max() / 255.0
        # 10-bin histogram of pixel intensity
        hist, _ = np.histogram(px, bins=10, range=(0, 256))
        f[6:16] = hist / max(px.size, 1)
        return f, w, h, None, None, True
    if kind == "audio" and mime == "audio/wav":
        rate, s = wav_decode(payload)
        f = np.zeros(FEATURE_DIM, dtype=np.float32)
        f[0] = rate
        f[1] = len(s)
        if len(s):
            f[2] = float(np.sqrt(np.mean(s * s)))  # rms
            f[3] = float(np.abs(s).max())
            f[4] = float(s.mean())
            f[5] = float((np.diff(np.signbit(s)) != 0).sum()) / max(len(s) - 1, 1)  # zero-cross rate
            hist, _ = np.histogram(s, bins=10, range=(-1.0, 1.0))
            f[6:16] = hist / len(s)
        return f, None, None, rate, len(s), True
    # no stdlib codec (video / unknown mime): deterministic fallback stub
    return _fake_decode(payload), None, None, None, None, False


def extract_features(media: DataFrame, decoder: str = "stdlib") -> DataFrame:
    """Decode + feature-extract as an Arrow-batched kernel.

    'stdlib' really decodes PNG/WAV payloads (video falls back to payload-
    hash features); 'fake' hashes everything; 'pillow'/'librosa' are gated
    on the libraries existing."""
    if decoder not in ("stdlib", "fake", "pillow", "librosa"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder in ("pillow", "librosa"):
        _capability_check(decoder)

    def kernel(batches):
        for pdf in batches:
            feats, shas, nb, ws, hs, rates, nsamp, dec = [], [], [], [], [], [], [], []
            for kind, mime, payload in zip(pdf["kind"], pdf["mime"], pdf["payload"]):
                b = bytes(payload)
                if decoder == "stdlib":
                    f, w, h, rate, ns, ok = _stdlib_features(kind, mime, b)
                else:  # fake (pillow/librosa never reach here in-sandbox)
                    f, w, h, rate, ns, ok = _fake_decode(b), None, None, None, None, False
                feats.append(np.asarray(f, dtype=np.float32).tolist())
                shas.append(hashlib.sha256(b).hexdigest())
                nb.append(len(b))
                ws.append(w)
                hs.append(h)
                rates.append(rate)
                nsamp.append(ns)
                dec.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": shas,
                    "feature": feats,
                    "n_bytes": nb,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(nsamp, dtype="Int32"),
                    "decoded": dec,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    frame decode itself needs a video codec (not in stdlib); the
    distribution plan (explode by timestamp, repartition by media) is real."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    return vids.select("media_id", F.explode(ts).alias("frame_ts_ms")).repartition("media_id")
