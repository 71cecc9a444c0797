"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The DECODE step is REAL for still images: a pure numpy+zlib codec reads
PNG (8-bit gray/RGB/RGBA, non-interlaced), binary netpbm (P5/P6) and
uncompressed 24-bit BMP — no external imaging library needed.  Payloads
in any other format fall back to a deterministic stub feature (clearly
marked per-row via ``decoded`` = false) so the pipeline shape stays
total.  Everything Spark-side is real and tested: the binary column
schema, the metadata struct, the ``mapInPandas`` batch plumbing (Arrow
batches in/out, schema declared up front), and the partitioning story
(decode is a narrow per-partition map — no shuffle; at 100 TB you size
``spark.sql.files.maxPartitionBytes`` so one batch of payloads fits
executor memory).  AUDIO decode is REAL for RIFF/WAV PCM16 (a pure
struct+numpy chunk-walker: header fields plus integer-exact signal
stats, see ``decode_wav`` / ``audio_features``).  VIDEO decode is REAL
for RIFF/AVI with uncompressed 24-bit DIB frames (the same struct+numpy
chunk-walker family: ``decode_avi`` / ``video_features``, and
``video_frames`` for real keyframe sampling); compressed codecs
(H.264-class work) stay out of scope — ``frame_sample`` keeps the
byte-stride explode shape for opaque payloads.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("checksum", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def with_binary_payload(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """Treat a column's UTF-8 bytes as an opaque media payload with typed
    metadata — the ingestion shape for real image/audio bytes."""
    payload = F.encode(F.col(data_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.octet_length(F.col(data_col)).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, dim: int) -> list[float]:
    """Fallback for UNRECOGNIZED payload formats (audio/video/UTF-8
    fakes): a deterministic feature from the payload bytes so the
    pipeline stays total.  Recognized image formats never reach this —
    they go through the real codec below."""
    h = hashlib.sha256(payload).digest()
    return [h[i % 32] / 255.0 for i in range(dim)]


# --------------------------------------------------------------------------
# real still-image codec (pure numpy + stdlib zlib — no imaging library)
# --------------------------------------------------------------------------

def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal real PNG encoder: 8-bit, non-interlaced, filter 0 rows.
    ``pixels`` is (h, w) grayscale or (h, w, c) with c in {3, 4}."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, c, color_type = *arr.shape, 1, 0
        raw = arr[:, :, None]
    else:
        h, w, c = arr.shape
        color_type = {1: 0, 3: 2, 4: 6}[c]
        raw = arr

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = b"".join(b"\x00" + raw[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode: 8-bit depth, color types 0/2/6, non-interlaced.
    Returns (h, w, channels) uint8."""
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in (0, 2, 6) or interlace:
                raise ValueError(f"unsupported PNG (depth={depth} type={ctype})")
            nch = {0: 1, 2: 3, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                up = int(prev[x])
                ul = int(prev[x - nch]) if x >= nch else 0
                if ft == 1:
                    cur[x] = (line[x] + left) % 256
                elif ft == 3:
                    cur[x] = (line[x] + (left + up) // 2) % 256
                else:
                    cur[x] = (line[x] + _paeth(int(left), up, ul)) % 256
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[r] = cur.astype(np.uint8)
        prev = out[r]
    return out.reshape(h, w, nch)


def _decode_netpbm(data: bytes) -> np.ndarray:
    """Binary netpbm: P5 (gray) / P6 (RGB), maxval ≤ 255."""
    toks: list[bytes] = []
    pos = 2
    while len(toks) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        toks.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    nch = 1 if data[:2] == b"P5" else 3
    return (
        np.frombuffer(data, dtype=np.uint8, count=h * w * nch, offset=pos)
        .reshape(h, w, nch)
        .copy()
    )


def encode_netpbm(pixels: np.ndarray) -> bytes:
    """P5/P6 binary netpbm from (h, w[, c]) uint8, c in {1, 3} — netpbm
    has no alpha channel; callers must drop alpha first (resize does)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"netpbm supports 1 or 3 channels, got {c}")
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def _decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER)."""
    (off,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={comp})")
    stride = (w * 3 + 3) & ~3
    rows = []
    flip = h > 0
    h = abs(h)
    for r in range(h):
        line = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=off + r * stride)
        rows.append(line.reshape(w, 3)[:, ::-1])  # BGR → RGB
    img = np.stack(rows)
    return img[::-1].copy() if flip else img.copy()


def decode_image(payload: bytes) -> np.ndarray | None:
    """Dispatch on magic bytes; (h, w, channels) uint8, or None if the
    payload is not a recognized still image."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_netpbm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    return None


def _image_features(img: np.ndarray, dim: int) -> list[float]:
    """Deterministic real features from decoded pixels: [width, height,
    channels, mean intensity] then a coarse row-major intensity grid.
    All sums are integer (order-independent) before ONE double division
    each — bit-stable across engines, so an oracle can recompute them."""
    h, w, c = img.shape
    gray = img.astype(np.int64).sum(axis=2)  # per-pixel channel sum
    feats = [
        float(w),
        float(h),
        float(c),
        (int(gray.sum()) / (h * w * c)) / 255.0,
    ]
    if dim > 4:
        # grid cells: split rows into up to (dim-4) bands, mean of each;
        # short images repeat their global mean so the feature vector is
        # ALWAYS exactly ``dim`` long (ragged vectors would break
        # rectangular consumers like the embedding dedup matmul)
        bands = np.array_split(gray, min(dim - 4, h), axis=0)
        feats += [
            (int(b.sum()) / (b.shape[0] * w * c)) / 255.0 for b in bands
        ]
        feats += [feats[3]] * (dim - len(feats))
    return feats[:dim]


def decode_features(media: DataFrame, dim: int = 8, fail_real: bool = False) -> DataFrame:
    """Batch decode via mapInPandas: Arrow batches of (payload, meta) in,
    feature rows out.  Recognized still images (PNG / netpbm / BMP) are
    REALLY decoded (``decoded`` = true, dimensions filled, features from
    pixels); unrecognized payloads take the deterministic stub
    (``decoded`` = false).  ``fail_real=True`` raises instead of
    stubbing, for callers that must not silently get fake features."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "checksum": [m["checksum"] for m in pdf["meta"]],
                "decoded": [],
                "width": [],
                "height": [],
                "n_channels": [],
                "feature": [],
            }
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                img = decode_image(raw) if raw else None
                if img is not None:
                    h, w, c = img.shape
                    out["decoded"].append(True)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(c)
                    out["feature"].append(_image_features(img, dim))
                else:
                    if fail_real:
                        raise NotImplementedError(
                            "payload is not a decodable image (PNG/netpbm/BMP) "
                            "and fail_real=True forbids the stub path; wire a "
                            "codec for this format into decode_features()"
                        )
                    out["decoded"].append(False)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_channels"].append(None)
                    out["feature"].append(_decode_stub(raw, dim))
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# real audio codec (RIFF/WAVE PCM — pure struct+numpy, no audio library)
# --------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
    ]
)


def encode_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """Minimal real RIFF/WAVE writer: PCM signed 16-bit little-endian,
    frames interleaved.  ``samples`` is the FLAT int16 sample stream
    (length = n_frames * channels)."""
    arr = np.asarray(samples, dtype="<i2")
    data = arr.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks pad to even
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict | None:
    """Real RIFF chunk-walker for PCM WAV.  Returns per-clip metadata and
    integer-exact signal stats, or None when the payload is not a valid
    PCM 16-bit WAV (wrong magic, non-PCM format tag, truncated data, or
    a sample stream that doesn't divide into whole frames).  All stats
    are INTEGER (peak = max |sample|, sum_sq = Σ sample², both exact in
    int64) so an oracle can recompute them without touching the bytes."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > end:
            return None  # truncated chunk
        if tag == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif tag == b"data":
            data = payload[pos + 8 : body_end]
        pos = body_end + (size % 2)  # chunks pad to even
    if fmt is None or data is None:
        return None
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16 or channels < 1 or rate <= 0:
        return None  # only uncompressed PCM16 — anything else is not ours
    if len(data) % (2 * channels):
        return None  # partial frame
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n_frames = len(samples) // channels
    return {
        "n_channels": int(channels),
        "sample_rate": int(rate),
        "bits_per_sample": int(bits),
        "n_frames": int(n_frames),
        # integer floor division — Python's round() is half-to-even while
        # SQL ROUND is half-away-from-zero, so a .5 duration would differ
        # across engines; floor is exact and identical everywhere
        "duration_ms": n_frames * 1000 // rate,
        "peak": int(np.abs(samples).max()) if len(samples) else 0,
        "sum_sq": int((samples * samples).sum()),
    }


def audio_features(media: DataFrame, fail_real: bool = False) -> DataFrame:
    """Batch audio decode via mapInPandas — the audio twin of
    :func:`decode_features`: Arrow batches of (media_id, payload, meta)
    in, one typed metadata/stats row per clip out.  RIFF/WAV PCM16
    payloads are REALLY decoded (``decoded`` = true, header fields and
    integer signal stats filled); unrecognized payloads keep NULL fields
    with ``decoded`` = false, or raise under ``fail_real=True``.  A
    narrow per-partition map — no shuffle at any scale; at 100 TB size
    ``spark.sql.files.maxPartitionBytes`` so a batch of clips fits
    executor memory."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "n_channels", "sample_rate", "bits_per_sample",
            "n_frames", "duration_ms", "peak", "sum_sq",
        )
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": pdf["media_id"],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "checksum": [m["checksum"] for m in pdf["meta"]],
                "decoded": [],
                **{c: [] for c in cols},
            }
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                meta = decode_wav(raw) if raw else None
                if meta is None and fail_real:
                    raise NotImplementedError(
                        "payload is not a decodable PCM16 RIFF/WAV clip and "
                        "fail_real=True forbids the stub path; wire a codec "
                        "for this format into audio_features()"
                    )
                out["decoded"].append(meta is not None)
                for c in cols:
                    out[c].append(None if meta is None else meta[c])
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=AUDIO_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Resize via mapInPandas.  Recognized images are REALLY resampled
    (nearest-neighbor pixel grid in numpy) and re-encoded as binary
    netpbm; unrecognized payloads take a deterministic byte-stream
    nearest-neighbor stand-in so the op stays total.  Per-row and
    stateless: a narrow map, no shuffle at any scale."""

    n_out = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                src = bytes(p) if p is not None else b""
                img = decode_image(src) if src else None
                if img is not None:
                    h, w, c = img.shape
                    if c == 4:  # netpbm has no alpha: drop it
                        img = img[:, :, :3]
                    ri = (np.arange(height) * h // height).clip(0, h - 1)
                    ci = (np.arange(width) * w // width).clip(0, w - 1)
                    out.append(encode_netpbm(img[ri][:, ci]))
                    continue
                if not src:
                    out.append(bytes(n_out))
                    continue
                # byte-stream nearest-neighbor: deterministic, size-exact
                step = max(1, len(src) // n_out)
                out.append(bytes(src[min(i * step, len(src) - 1)] for i in range(n_out)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled
    offset (JVM-side posexplode — the real video analogue would sample
    keyframes; the partitioning/explode shape is identical)."""
    # last frame index is (n_bytes - 1) div every_n_bytes: an exact
    # multiple must NOT emit a trailing empty frame, and an empty payload
    # yields zero frames (posexplode of an empty array drops the row)
    frames = (
        f"CASE WHEN meta.n_bytes <= 0 THEN cast(array() AS array<binary>) "
        f"ELSE transform(sequence(0, least((meta.n_bytes - 1) div {every_n_bytes}, "
        f"{max_frames - 1})), "
        f"i -> substring(payload, i * {every_n_bytes} + 1, {every_n_bytes})) END"
    )
    return media.select(
        "media_id",
        F.posexplode(F.expr(frames)).alias("frame_no", "frame_bytes"),
    ).withColumn("frame_checksum", F.md5(F.col("frame_bytes")))


# --------------------------------------------------------------------------
# real video codec (RIFF/AVI, uncompressed 24-bit DIB frames — pure
# struct+numpy, no video library)
# --------------------------------------------------------------------------

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("fps_num", T.IntegerType(), True),
        T.StructField("fps_den", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("pix_sum", T.LongType(), True),
        T.StructField("pix_sum_sq", T.LongType(), True),
    ]
)


def encode_avi(frames: np.ndarray, rate: int = 30, scale: int = 1) -> bytes:
    """Minimal real RIFF/AVI writer: uncompressed 24-bit DIB ('00db')
    frames, bottom-up BGR rows padded to 4 bytes, with the standard
    hdrl (avih + one 'vids' strl) and an idx1 index.  ``frames`` is
    (n_frames, height, width, 3) uint8 RGB; ``rate``/``scale`` is the
    AVI fps fraction (fps = rate/scale)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8 RGB")
    n, h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = (1_000_000 * scale) // rate if rate else 0
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, frame_size * rate // max(scale, 1), 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, scale, rate, 0, n,
        frame_size, 0, frame_size, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for f in range(n):
        # bottom-up rows, RGB → BGR, right-padded to the DIB stride
        dib = np.zeros((h, stride), dtype=np.uint8)
        dib[:, : w * 3] = arr[f, ::-1, :, ::-1].reshape(h, w * 3)
        offset = len(movi_body)  # idx1 offsets are relative to 'movi'
        movi_body += chunk(b"00db", dib.tobytes())
        idx += struct.pack("<4sIII", b"00db", 0x10, offset, frame_size)
    body = b"AVI " + hdrl + chunk(b"LIST", movi_body) + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_size) walking a RIFF chunk run;
    stops (rather than raising) at a truncated header so callers can
    decide whether partial parses are fatal."""
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > end:
            yield (b"", pos + 8, -1)  # truncated chunk sentinel
            return
        yield (tag, pos + 8, size)
        pos += 8 + size + (size % 2)


def decode_avi(payload: bytes) -> dict | None:
    """Real RIFF/AVI chunk-walker for uncompressed 24-bit DIB video.
    Returns per-clip metadata plus integer-exact pixel stats (pix_sum =
    Σ byte, pix_sum_sq = Σ byte² over every RGB sample of every frame,
    both exact in int64), or None when the payload is not a decodable
    DIB AVI (wrong magic, compressed fourcc, non-24-bit frames,
    truncated chunks, or a frame whose size doesn't match the header).
    duration_ms is floor(n_frames * 1000 * scale / rate) — floor
    division so every engine reproduces it exactly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    dims = None       # (w, h) from strf BITMAPINFOHEADER
    fps = None        # (rate, scale) from the vids strh
    frames = []       # decoded (h, w, 3) RGB arrays

    def walk(pos: int, end: int) -> bool:
        nonlocal dims, fps
        in_vids = False
        for tag, start, size in _riff_chunks(payload, pos, end):
            if size < 0:
                return False  # truncated chunk
            if tag == b"LIST":
                if not walk(start + 4, start + size):
                    return False
                continue
            if tag == b"strh" and size >= 48:
                fcc_type, _handler = struct.unpack_from("<4s4s", payload, start)
                in_vids = fcc_type == b"vids"
                if in_vids:
                    scale, rate = struct.unpack_from("<II", payload, start + 20)
                    fps = (rate, scale)
            elif tag == b"strf" and in_vids and size >= 40:
                _bisize, w, h, _planes, bpp, comp = struct.unpack_from(
                    "<IiiHHI", payload, start
                )
                if bpp != 24 or comp != 0:
                    return False  # only uncompressed 24-bit DIB is ours
                dims = (w, h)
            elif tag[2:4] in (b"db", b"dc") and tag[:2].isdigit():
                if tag[2:4] == b"dc" or dims is None:
                    return False  # compressed frame, or frame before header
                w, h = dims
                flip = h > 0
                h = abs(h)
                stride = (w * 3 + 3) & ~3
                if size != stride * h:
                    return False  # frame size doesn't match the header
                rows = np.frombuffer(
                    payload, dtype=np.uint8, count=stride * h, offset=start
                ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
                frames.append(rows[::-1] if flip else rows)
        return True

    if not walk(12, len(payload)) or dims is None or fps is None or fps[0] <= 0:
        return None
    w, h = dims
    h = abs(h)
    rate, scale = fps
    stack = (
        np.stack(frames).astype(np.int64)
        if frames
        else np.zeros((0, h, w, 3), dtype=np.int64)
    )
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
        "fps_num": int(rate),
        "fps_den": int(max(scale, 1)),
        "duration_ms": len(frames) * 1000 * max(scale, 1) // rate,
        "pix_sum": int(stack.sum()),
        "pix_sum_sq": int((stack * stack).sum()),
        "frames": stack,
    }


def video_features(media: DataFrame, fail_real: bool = False) -> DataFrame:
    """Batch video decode via mapInPandas — the video twin of
    :func:`decode_features` / :func:`audio_features`: Arrow batches of
    (media_id, payload, meta) in, one typed metadata/stats row per clip
    out.  RIFF/AVI DIB payloads are REALLY decoded (``decoded`` = true,
    header fields and integer pixel stats filled); unrecognized payloads
    keep NULL fields with ``decoded`` = false, or raise under
    ``fail_real=True``.  A narrow per-partition map — no shuffle at any
    scale; at 100 TB size ``spark.sql.files.maxPartitionBytes`` so a
    batch of clips fits executor memory."""

    cols = ("width", "height", "n_frames", "fps_num", "fps_den",
            "duration_ms", "pix_sum", "pix_sum_sq")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": pdf["media_id"],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "checksum": [m["checksum"] for m in pdf["meta"]],
                "decoded": [],
                **{c: [] for c in cols},
            }
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                meta = decode_avi(raw) if raw else None
                if meta is None and fail_real:
                    raise NotImplementedError(
                        "payload is not a decodable DIB RIFF/AVI clip and "
                        "fail_real=True forbids the stub path; wire a codec "
                        "for this format into video_features()"
                    )
                out["decoded"].append(meta is not None)
                for c in cols:
                    out[c].append(None if meta is None else meta[c])
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=VIDEO_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("frame_sum", T.LongType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def video_frames(
    media: DataFrame, every_n: int = 1, max_frames: int = 8, fail_real: bool = False
) -> DataFrame:
    """REAL keyframe sampling (supersedes the byte-stride model in
    :func:`frame_sample` for AVI payloads): decode each clip, keep every
    ``every_n``-th frame up to ``max_frames``, and emit one row per kept
    frame with its integer-exact pixel sum and the frame re-encoded as
    binary netpbm (P6) so downstream image ops (:func:`decode_features`,
    :func:`resize`) compose directly.  The explode happens INSIDE the
    mapInPandas batch — a narrow map, no shuffle; undecodable payloads
    emit no rows (or raise under ``fail_real=True``)."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c.name: [] for c in VIDEO_FRAME_SCHEMA}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                meta = decode_avi(raw) if raw else None
                if meta is None:
                    if fail_real:
                        raise NotImplementedError(
                            "payload is not a decodable DIB RIFF/AVI clip and "
                            "fail_real=True forbids skipping it; wire a codec "
                            "for this format into video_frames()"
                        )
                    continue
                frames = meta["frames"]
                for k in range(min(max_frames, (len(frames) + every_n - 1) // every_n)):
                    f = k * every_n
                    frame = frames[f]
                    out["media_id"].append(int(mid))
                    out["frame_no"].append(f)
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["frame_sum"].append(int(frame.sum()))
                    out["frame_bytes"].append(
                        encode_netpbm(frame.astype(np.uint8))
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(sample_batches, schema=VIDEO_FRAME_SCHEMA)
