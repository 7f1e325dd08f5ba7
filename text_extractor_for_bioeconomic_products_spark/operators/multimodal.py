"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Graft requirement: image/audio/video as ``binary`` columns with typed
metadata, processed through ``mapInPandas`` in Arrow batches.

Round 3 upgrade — **real decode where the standard library suffices**:

* **image/BMP** — uncompressed 24-bit BI_RGB bitmaps are decoded and
  re-encoded with ``struct``+numpy (public format, no codec lib needed):
  real dimensions, real per-pixel mean level, real nearest-neighbor
  resize.
* **audio/WAV** — PCM WAV through the stdlib ``wave`` module: real
  sample rate / frame count, real mean |amplitude|.
* **image/PNG** (round 4) — real zlib inflate of IDAT + reconstruction
  of all five scanline filters (None/Sub/Up/Average/Paeth), CRC-checked
  chunks; 8-bit truecolor non-interlaced scope.
* **video/AVI** — real uncompressed RIFF container walk (round 3).

``decode_media`` on any remaining compressed format (JPEG/MP4/H.264…)
raises ``NotImplementedError`` — the single integration point where
PIL/pyav would slot in (reference analog
`src/core/text_extractor.py:157-245`); those codecs genuinely are not
in this container.

Fake payload format (video stub, produced by synthesize_media):
    bytes 0-3   magic  b'FAKE'
    byte  4     kind   (0=image, 1=audio, 2=video)
    bytes 5-8   width / sample-rate   (uint32 BE)
    bytes 9-12  height / n-frames     (uint32 BE)
    bytes 13..  payload (sha256-derived deterministic noise)
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType(), True),
        T.StructField("mime", T.StringType(), True),
    ]), True),
])

KINDS = ["image", "audio", "video"]
_MAGIC = b"FAKE"


# ---------------------------------------------------------------------------
# Real codecs (stdlib-only): BMP and PCM WAV
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw BGR bytes (len = width*height*3, rows top-down) as an
    uncompressed 24-bit BI_RGB BMP (bottom-up rows, 4-byte row padding)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    row_raw = width * 3
    pad = (-row_raw) % 4
    rows = [
        pixels[r * row_raw:(r + 1) * row_raw] + b"\x00" * pad
        for r in range(height - 1, -1, -1)  # bottom-up storage
    ]
    pixel_array = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_array),
        2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_array), 0, 0, 54)
    return header + info + pixel_array


def decode_bmp(payload: bytes) -> Tuple[int, int, float, np.ndarray]:
    """Parse an uncompressed 24-bit BMP → (width, height, mean_level,
    pixels[h,w,3] top-down).  Real pixel access, not a header echo."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    top_down = height < 0
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + ((-row_raw) % 4)
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, :row_raw]
    pixels = arr.reshape(height, width, 3)
    if not top_down:
        pixels = pixels[::-1]
    mean_level = round(float(pixels.astype(np.float64).mean()), 4)
    return width, height, mean_level, pixels


def encode_wav(sample_rate: int, frames: bytes, n_channels: int = 1,
               sampwidth: int = 2) -> bytes:
    """PCM WAV via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav(payload: bytes) -> Tuple[int, int, float]:
    """PCM WAV → (sample_rate, n_frames, mean |amplitude| of the real
    samples, normalized to [0,1] for 16-bit)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, n, width = w.getframerate(), w.getnframes(), w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        mean_level = round(float(np.abs(samples).mean()) / 32768.0, 4) if len(samples) else 0.0
    else:  # 8-bit PCM is unsigned
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        mean_level = round(float(np.abs(samples - 128).mean()) / 128.0, 4) if len(samples) else 0.0
    return rate, n, mean_level


# --- PNG (stdlib zlib) — closes the compressed-IMAGE half of the codec
# stub: PNG is IDAT = zlib-deflated scanlines, each prefixed by one of 5
# filter bytes (None/Sub/Up/Average/Paeth), wrapped in CRC-checked
# chunks.  Everything needed ships in the stdlib (zlib both deflates and
# CRCs), so this is a REAL decode of the web's most common lossless
# format — pixels reconstructed through the actual filter algebra, not a
# header echo.  Scope: 8-bit truecolor (color type 2) non-interlaced,
# the shape the encoder below emits; other color types / interlacing
# raise NotImplementedError, and JPEG/MP4 remain the documented
# environmental boundary (no PIL/pyav in the container).
# Reference analog: `src/core/text_extractor.py:157-245` (real image
# extraction from documents).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw RGB bytes (len = width*height*3, rows top-down) as an
    8-bit truecolor PNG.  Row r uses filter (r % 5), so any image ≥5
    rows exercises every scanline filter on a decode roundtrip."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    bpp = 3
    raw = np.frombuffer(pixels, np.uint8).reshape(height, width * 3)
    zeros = np.zeros(bpp, np.int64)
    out = bytearray()
    prev = np.zeros(width * 3, np.int64)
    for r in range(height):
        row = raw[r].astype(np.int64)
        left = np.concatenate([zeros, row[:-bpp]]) if width else row
        ul = np.concatenate([zeros, prev[:-bpp]]) if width else prev
        ft = r % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = (row - left) % 256
        elif ft == 2:  # Up
            filt = (row - prev) % 256
        elif ft == 3:  # Average
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            filt = (row - _paeth_vec(left, prev, ul)) % 256
        out.append(ft)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> Tuple[int, int, float, np.ndarray]:
    """Parse a PNG → (width, height, mean_level, pixels[h,w,3] top-down).
    Real decode: chunk CRCs verified, IDAT inflated with zlib, all five
    scanline filters reconstructed.  8-bit truecolor non-interlaced only;
    other PNG flavors raise NotImplementedError."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or color_type != 2 or interlace != 0:
        raise NotImplementedError(
            "only 8-bit truecolor non-interlaced PNG is decoded here"
        )
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data size mismatch")
    pixels = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    zeros = np.zeros(bpp, np.int64)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, r * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            recon = line
        elif ft == 2:  # Up: depends only on the prior row — vectorized
            recon = (line + prev) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth depend on the reconstructed LEFT pixel,
            # so reconstruction is sequential within the row (bounded:
            # synthetic/bench images are small; a production decoder
            # would drop to C here — which is exactly what PIL is)
            recon = np.zeros(stride, np.int64)
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    val = line[x] + left
                elif ft == 3:
                    val = line[x] + (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (
                        up if pb <= pc else ul
                    )
                    val = line[x] + pred
                recon[x] = val % 256
        else:
            raise ValueError(f"invalid PNG scanline filter {ft}")
        pixels[r] = recon.astype(np.uint8)
        prev = recon
    px = pixels.reshape(height, width, 3)
    mean_level = round(float(px.astype(np.float64).mean()), 4)
    return width, height, mean_level, px


# --- Minimal uncompressed AVI (RIFF) — the video twin of the BMP/WAV
# codecs: a real container written and parsed with nothing but struct
# (the same RIFF chunk grammar the stdlib wave module reads).  Frames
# are raw top-down RGB24 in '00db' chunks; chunks pad to even length per
# the RIFF spec.  This shrinks the video stub boundary the same way
# round 3 shrank image/audio: real frames, real per-frame statistics,
# real frame sampling — only compressed codecs (MP4/H.264…) remain at
# the NotImplementedError integration point.

_AVI_FPS = 10


def encode_avi(width: int, height: int, frames: list, fps: int = _AVI_FPS) -> bytes:
    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,          # microseconds per frame
        width * height * 3 * fps,  # max bytes/sec
        0, 0,
        len(frames), 0, 1,
        width * height * 3,
        width, height,
        0, 0, 0, 0,
    )
    hdrl_body = b"hdrl" + chunk(b"avih", avih)
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi" + b"".join(chunk(b"00db", f) for f in frames)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes):
    """→ (width, height, n_frames, fps, mean_level, frame_means).
    Walks the RIFF chunk tree for real; malformed chunk sizes raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = n_frames_hdr = 0
    fps = 0
    frames: list = []
    pos = 12
    end = 8 + struct.unpack("<I", payload[4:8])[0]

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, n_frames_hdr, fps
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
            data_start = pos + 8
            if data_start + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(data_start + 4, data_start + size)
            elif cid == b"avih":
                vals = struct.unpack("<14I", payload[data_start:data_start + 56])
                fps = 1_000_000 // max(vals[0], 1)
                n_frames_hdr = vals[4]
                width, height = vals[8], vals[9]
            elif cid == b"00db":
                frames.append(payload[data_start:data_start + size])
            pos = data_start + size + (size % 2)

    walk(pos, end)
    if width == 0 or height == 0:
        raise ValueError("AVI missing/degenerate avih header")
    if len(frames) != n_frames_hdr:
        raise ValueError(
            f"AVI header declares {n_frames_hdr} frames, found {len(frames)}"
        )
    frame_means = []
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame size != width*height*3")
        arr = np.frombuffer(f, dtype=np.uint8)
        frame_means.append(round(float(arr.mean()), 4))
    mean_level = (
        round(float(np.mean(frame_means)), 4) if frame_means else 0.0
    )
    return width, height, len(frames), fps, mean_level, frame_means


# ---------------------------------------------------------------------------
# Synthetic media table (deterministic; real BMP/WAV/AVI payloads)
# ---------------------------------------------------------------------------


def _noise(seed: int, i: int, n: int) -> bytes:
    """n deterministic bytes from a sha256 chain (no RNG state)."""
    out = bytearray()
    block = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    while len(out) < n:
        out.extend(block)
        block = hashlib.sha256(block).digest()
    return bytes(out[:n])


def synthesize_media(spark: SparkSession, n: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL BMP/PNG images (alternating),
    REAL PCM WAV audio, REAL uncompressed AVI video."""
    rows = []
    for i in range(n):
        kind_i = i % 3
        if kind_i == 0:  # image: real 24-bit BMP / real zlib PNG, alternating
            w = 16 + (i * 7) % 48
            h = 16 + (i * 13) % 48
            if (i // 3) % 2 == 0:
                payload = encode_bmp(w, h, _noise(seed, i, w * h * 3))
                mime = "image/bmp"
            else:
                payload = encode_png(w, h, _noise(seed, i, w * h * 3))
                mime = "image/png"
        elif kind_i == 1:  # audio: real 16-bit mono WAV
            rate = 8000 + (i * 37) % 8000
            n_frames = 500 + (i * 11) % 2000
            payload = encode_wav(rate, _noise(seed, i, n_frames * 2))
            mime = "audio/wav"
        else:  # video: real uncompressed AVI (RIFF container)
            w = 8 + (i * 7) % 24
            h = 8 + (i * 13) % 24
            n_frames = 3 + i % 6
            frames = [
                _noise(seed, i * 1000 + f, w * h * 3) for f in range(n_frames)
            ]
            payload = encode_avi(w, h, frames)
            mime = "video/avi"
        rows.append((i, KINDS[kind_i], payload, (f"src{i % 10}", mime)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Decode dispatch + feature extraction
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "codec string, width int, height int, mean_level double, valid boolean"
)


def decode_media(payload: bytes) -> Tuple[str, int, int, Optional[float]]:
    """Dispatch by magic → (codec, width, height, mean_level).

    BMP, PNG, WAV, and AVI are REAL decodes (pixels/samples are read);
    FAKE is the deterministic legacy video stub (mean_level None — no
    frames to read).  Any other magic (JPEG/MP4…) raises
    NotImplementedError: that is the single integration point where
    PIL/librosa/pyav would slot in; the container ships none of them."""
    if payload[:2] == b"BM":
        w, h, mean_level, _ = decode_bmp(payload)
        return "bmp", w, h, mean_level
    if payload[:8] == _PNG_SIG:
        w, h, mean_level, _ = decode_png(payload)
        return "png", w, h, mean_level
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, n_frames, mean_level = decode_wav(payload)
        return "wav", rate, n_frames, mean_level
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        w, h, _n, _fps, mean_level, _ = decode_avi(payload)
        return "avi", w, h, mean_level
    if payload[:4] == _MAGIC:
        _, w, h = struct.unpack(">BII", payload[4:13])
        return "fake", w, h, None
    raise NotImplementedError(
        "real media decode for this format requires codec libraries "
        "not present here (JPEG → PIL, MP4/H.264 → pyav)"
    )


def decode_stub(payload: bytes) -> Tuple[int, int, bool]:
    """Back-compat shim for the FAKE header (video stub path)."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decode requires codec libraries not present here"
        )
    _, w, h = struct.unpack(">BII", payload[4:13])
    return w, h, True


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per-Arrow-batch iteration, binary
    payloads never leave the executor, output is narrow typed columns.

    At 100 TB: payloads dominate size, so this stage projects them away
    as early as possible; downstream ops see only (id, features).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_safe_decode)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
                "codec": decoded.map(lambda d: d[0]),
                "width": decoded.map(lambda d: d[1]).astype("int32"),
                "height": decoded.map(lambda d: d[2]).astype("int32"),
                "mean_level": decoded.map(lambda d: d[3]),
                "valid": decoded.map(lambda d: d[4]),
            })

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def _safe_decode(payload: bytes):
    try:
        codec, w, h, mean_level = decode_media(payload)
        return (codec, w, h, mean_level, True)
    except Exception:
        # quarantine semantics — row kept, flagged, job never fails
        return (None, 0, 0, None, False)


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """REAL nearest-neighbor resize for BMP and PNG images (decode
    pixels → index-subsample → re-encode in the same format); non-image
    payloads pass through unchanged (resizing audio/video is a different
    operation).  Binary-in/binary-out mapInPandas with bounded Arrow
    batches."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(b: bytes) -> bytes:
                is_bmp = b[:2] == b"BM"
                is_png = b[:8] == _PNG_SIG
                if not (is_bmp or is_png):
                    return b
                try:
                    w, h, _, pixels = (
                        decode_bmp(b) if is_bmp else decode_png(b)
                    )
                except Exception:
                    return b
                if max(w, h) <= max_dim:
                    return b
                scale = max(w, h) / max_dim
                nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
                xs = (np.arange(nw) * (w / nw)).astype(np.int64)
                ys = (np.arange(nh) * (h / nh)).astype(np.int64)
                out = pixels[ys][:, xs]
                enc = encode_bmp if is_bmp else encode_png
                return enc(nw, nh, out.tobytes())
            pdf = pdf.assign(payload=pdf["payload"].map(shrink))
            yield pdf

    return media.mapInPandas(op, schema=media.schema)


# kept name for earlier-round callers; images resize for real now
resize_stub = resize_media


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling for video rows (round 3 closed this stub):
    decode the AVI container, emit one row per every_n-th frame with its
    actual pixel mean and content hash (UDTF shape: 1 row in → N rows
    out via mapInPandas).  Legacy FAKE-header payloads fall back to the
    old index-only stub rows so the boundary stays visible."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                payload = bytes(payload)
                if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                    w, h, n_frames, _fps, _m, frame_means = decode_avi(payload)
                    for f in range(0, n_frames, every_n):
                        rows.append(
                            (mid, f, frame_means[f],
                             hashlib.sha256(
                                 payload + struct.pack(">I", f)
                             ).hexdigest())
                        )
                    continue
                try:
                    w, h, _ = decode_stub(payload)
                except Exception:
                    continue
                n_frames = max(1, (w * h) // 4096)
                for f in range(0, n_frames, every_n):
                    rows.append((mid, f, None, hashlib.sha256(
                        payload[13:] + struct.pack(">I", f)
                    ).hexdigest()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_mean", "frame_hash"],
            )

    return media.mapInPandas(
        op,
        schema="media_id long, frame_idx int, frame_mean double, "
        "frame_hash string",
    )


# back-compat name (pre-round-3 callers); the AVI path is real now
frame_sample_stub = frame_sample


def q_multimodal_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-surface window into the multimodal plumbing (rows-only —
    input is the deterministic synthetic media table, not an sf table):
    synthesize → mapInPandas feature extraction → per-kind census.
    BMP/WAV rows carry REAL decoded dimensions and mean levels; byte
    behavior is pinned by tests/test_pipeline.py."""
    media = synthesize_media(spark, n=300, seed=42)
    feats = extract_media_features(media)
    return (
        feats.groupBy("kind", "codec")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
            F.round(F.avg("mean_level"), 4).alias("avg_mean_level"),
            F.sum(F.when(F.col("valid"), 0).otherwise(1)).alias("n_invalid"),
        )
        .orderBy("kind")
    )


QUERIES = {
    "multimodal_census": q_multimodal_census,
}
