"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode support is two-tier (r9): UNCOMPRESSED formats decode for REAL
with pure byte arithmetic — ``decode_wav_real`` (RIFF/PCM 8/16/32-bit,
multi-channel), ``decode_image_real`` (PPM P6 + 24-bit BI_RGB BMP) —
and plug into the same feature extractors via their ``decoder=``
parameter.  Compressed codecs (JPEG/PNG/MP3/H.264) still need a codec
library the container lacks, so those kernels are STUBBED (clearly
marked).  Round 3 replaces the earlier RNG-seeded fakes
with *modular-ramp* fakes: pixel / sample ``k`` of an asset is
``(seed + k*STEP) % M`` — a pure-integer recurrence that any engine can
regenerate.  That choice is deliberate: the driver's DuckDB oracle can
rebuild the exact same fake media with ``generate_series`` and verify the
whole distributed pipeline (filter -> mapInPandas decode -> feature math)
value-for-value, which an RNG stub cannot offer.  Every feature below is
derived from exact integer sums (then divided/rooted once, in the same
operation order the oracle uses) so Spark and DuckDB produce bit-identical
doubles.  Swapping in PIL / soundfile / ffmpeg is a kernel change only;
the plumbing — schema, partition-preserving mapInPandas, batch shapes,
metadata structs — is the real deliverable.

Scale notes: binary payloads ride in parquet as-is; mapInPandas streams
Arrow record batches so peak memory is one batch, not one partition.
Feature extraction emits fixed-width vectors -> downstream joins/agg are
columnar.  Frame sampling explodes to (asset_id, frame_no) keyed rows —
the natural partitioning for distributed decode.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = "asset_id long, media_type string, width int, height int, n_bytes int"

# Ramp strides: odd -> coprime with 256, so the fake pixel stream cycles
# through every intensity value (non-degenerate means/histograms).
_PIXEL_STEP = 7       # per flattened channel value
_AUDIO_STEP = 7       # per sample, modulus 2001 -> amplitude in [-1, 1]
_FRAME_STEP = 13      # per-frame seed offset for video


# Decode kernels are CPU-bound: when the source has FEWER partitions
# than the session width (small test files read as one split),
# repartition so the mapInPandas decode saturates the cluster instead
# of running in one task. Shared guarded implementation (r12): see
# llm/_spread.py for the streaming / plan-shape / conf-parse guards.
from ._spread import spread as _spread


def synth_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake media table from documents: binary
    payload = utf8 bytes of the text, metadata struct alongside.
    Stands in for a real (asset_id, bytes, meta) ingest at 100 TB."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.encode(t, "utf-8").alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("media_type"),
            (F.length(t) % 640 + 16).cast("int").alias("width"),
            (F.length(t) % 480 + 16).cast("int").alias("height"),
            F.length(F.encode(t, "utf-8")).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def _seed_of(payload: bytes) -> int:
    """Fake-decode seed: (first byte + payload length) mod 256.  The
    oracle recomputes it as (ord(substr(text,1,1)) + length(text)) % 256
    — valid because the test corpus is ASCII (byte == code point)."""
    b0 = payload[0] if len(payload) else 0
    return (int(b0) + len(payload)) % 256


def _decode_image_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: a real build calls PIL/turbojpeg here.  The fake is a
    deterministic modular ramp over the flattened (H, W, 3) array:
    ``value[j] = (seed + j*7) % 256`` — cross-engine reproducible (see
    module docstring).  Raises for absurd sizes like a real decoder."""
    if width <= 0 or height <= 0:
        raise NotImplementedError("real decoder required for degenerate dims")
    s0 = _seed_of(payload)
    flat = _ramp(s0, height * width * 3, _PIXEL_STEP, 256)
    return flat.reshape(height, width, 3)


def _ramp(s0: int, n: int, step: int, mod: int) -> np.ndarray:
    """(s0 + j*step) % mod for j in [0, n) as uint8/int32 — int32 ramp
    arithmetic (half the memory traffic of int64) unless n*step would
    overflow it (absurd-dimension safety, not a realistic media size)."""
    dt = np.int32 if n * step + mod < 2**31 else np.int64
    j = np.arange(n, dtype=dt)
    out = (s0 + j * step) % mod
    return out.astype(np.uint8) if mod <= 256 else out


# ---- REAL decoders for uncompressed container formats (r9) --------
# PIL / soundfile / ffmpeg remain absent from this container, but the
# UNCOMPRESSED formats need only byte arithmetic: WAV (RIFF + PCM),
# PPM (P6) and BMP (24-bit, BI_RGB) parse exactly with numpy alone.
# Compressed codecs (JPEG/PNG/MP3/H.264) still raise a clear
# NotImplementedError until a codec library lands — the stubs above
# remain the oracle-checkable path for the driver contracts.


def decode_image_real(payload: bytes) -> np.ndarray:
    """REAL image decode for uncompressed formats -> (H, W, 3) uint8.

    Supports PPM ``P6`` (maxval <= 255) and BMP (24-bit, BI_RGB,
    bottom-up or top-down). PNG/JPEG payloads raise
    NotImplementedError naming the missing codec; anything else raises
    ValueError."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "PNG/JPEG need a codec library (PIL absent from this build); "
            "uncompressed PPM/BMP decode natively"
        )
    raise ValueError("unrecognized image payload (not PPM/BMP/PNG/JPEG)")


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6): ASCII header tokens (with # comments), one
    whitespace byte, then raw RGB rows."""
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM needs a wide decoder")
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP: BITMAPFILEHEADER (pixel offset at 10),
    BITMAPINFOHEADER (w/h/bpp/compression), 4-byte-padded BGR rows,
    bottom-up when height > 0."""

    def le(off, sz, signed=False):
        return int.from_bytes(payload[off : off + sz], "little", signed=signed)

    data_off = le(10, 4)
    w, h = le(18, 4, signed=True), le(22, 4, signed=True)
    bpp, compression = le(28, 2), le(30, 4)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decodes natively (got bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up, h = h > 0, abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_wav_real(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL WAV decode -> (sample_rate, mono float64 samples in
    [-1, 1]). PCM 8/16/32-bit via RIFF chunk walk; multi-channel input
    averages to mono. Non-PCM (compressed) WAV raises
    NotImplementedError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    # a truncated/odd-length data chunk would otherwise surface as
    # np.frombuffer's opaque "buffer size must be a multiple of
    # element size" — trim to whole samples, like the channel fold
    # already trims to whole frames (applies to every PCM branch)
    width = max(bits // 8, 1)
    if len(data) % width:
        data = data[: len(data) - (len(data) % width)]
    if audio_format == 3:
        # IEEE-float PCM: uncompressed, same byte arithmetic as int PCM
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit IEEE-float WAV is nonstandard")
        if channels > 1:
            x = (
                x[: (x.size // channels) * channels]
                .reshape(-1, channels)
                .mean(axis=1)
            )
        return rate, x
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format {audio_format} (not integer/float PCM) needs a "
            "codec library"
        )
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM needs a wide decoder")
    if channels > 1:
        x = x[: (x.size // channels) * channels].reshape(-1, channels).mean(axis=1)
    return rate, x


def image_features(
    media: DataFrame,
    batch_hint: int = 0,
    decoder=None,
    media_type: str = "image/png",
) -> DataFrame:
    """Decode + extract per-image features (mean per channel, luma std,
    8-bin luma histogram) via mapInPandas.  Output schema is fixed-width.

    All statistics are computed from exact integer sums and divided /
    square-rooted in a fixed operation order so the DuckDB oracle (same
    formulas over ``generate_series``) reproduces identical doubles.

    ``decoder`` swaps the stub for a REAL bytes->(H,W,3) decoder —
    ``decode_image_real`` handles uncompressed PPM/BMP natively (r9);
    pass a PIL-backed callable for PNG/JPEG once codecs exist. The
    feature math is identical either way. ``media_type`` selects which
    assets this extractor claims.
    """
    out_schema = (
        "asset_id long, mean_r double, mean_g double, mean_b double, "
        "std_luma double, hist array<double>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                # feature math stays on the decoded uint8 array with
                # int64 ACCUMULATORS (sum dtype) instead of widening the
                # whole image to int64 first — same exact integer sums,
                # ~1.5x less memory traffic per image
                if decoder is None:
                    img = _decode_image_bytes(
                        row["payload"], int(row["width"]), int(row["height"])
                    )
                else:
                    img = decoder(row["payload"])
                n = img.shape[0] * img.shape[1]
                luma3 = img.sum(axis=2, dtype=np.int32)  # r+g+b, 0..765
                s1 = int(luma3.sum(dtype=np.int64))
                s2 = int((luma3 * luma3).sum(dtype=np.int64))
                # var(luma) with luma = luma3/3, via exact integer sums
                var = s2 / (n * 9.0) - (s1 / (n * 3.0)) * (s1 / (n * 3.0))
                counts = np.bincount((luma3 // 96).ravel(), minlength=8)
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "mean_r": int(img[:, :, 0].sum(dtype=np.int64)) / n,
                        "mean_g": int(img[:, :, 1].sum(dtype=np.int64)) / n,
                        "mean_b": int(img[:, :, 2].sum(dtype=np.int64)) / n,
                        "std_luma": math.sqrt(max(var, 0.0)),
                        "hist": [int(c) / n for c in counts],
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "mean_r", "mean_g", "mean_b", "std_luma", "hist"])

    flat = media.filter(F.col("meta.media_type") == media_type).select(
        "asset_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return _spread(flat).mapInPandas(kernel, schema=out_schema)


def _decode_audio_bytes(payload: bytes, n_bytes: int) -> np.ndarray:
    """STUB decode: a real build calls soundfile/ffmpeg here.  Fake mono
    waveform, one sample per 2 payload bytes (16-bit PCM shape):
    ``sample[i] = ((seed + i*7) % 2001 - 1000) / 1000`` — a deterministic
    integer ramp in [-1, 1] the oracle can regenerate."""
    if n_bytes <= 0:
        raise NotImplementedError("real decoder required for empty payloads")
    s0 = _seed_of(payload)
    u = _ramp(s0, max(1, n_bytes // 2), _AUDIO_STEP, 2001) - 1000
    return (u / 1000.0).astype(np.float32)


def _audio_ints(payload: bytes, n_bytes: int) -> np.ndarray:
    """Integer milli-amplitudes behind ``_decode_audio_bytes`` — feature
    math runs on these exact ints so sums carry no float error."""
    s0 = _seed_of(payload)
    return _ramp(s0, max(1, n_bytes // 2), _AUDIO_STEP, 2001) - 1000


def audio_features(
    media: DataFrame,
    sample_rate: int = 16000,
    decoder=None,
    media_type: str = "audio/wav",
) -> DataFrame:
    """Decode + extract per-clip waveform features (duration, RMS,
    zero-crossing rate, peak) via mapInPandas — the audio sibling of
    ``image_features``.

    ``decoder`` swaps the stub for a REAL bytes->(rate, samples)
    decoder — ``decode_wav_real`` parses PCM WAV natively (r9), and
    the clip's own sample rate drives duration; compressed audio needs
    a codec-backed callable. The stub path keeps the exact-integer
    oracle math."""
    out_schema = (
        "asset_id long, n_samples long, duration_s double, rms double, "
        "zcr double, peak double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if decoder is None:
                    u = _audio_ints(row["payload"], int(row["n_bytes"]))
                    n = int(u.size)
                    s2 = int((u * u).sum(dtype=np.int64))
                    neg = u < 0
                    zc = int(np.count_nonzero(neg[:-1] != neg[1:]))
                    feats = {
                        "n_samples": n,
                        "duration_s": n / (sample_rate * 1.0),
                        "rms": math.sqrt(s2 / (n * 1000000.0)),
                        "zcr": zc / (n - 1.0) if n > 1 else 0.0,
                        "peak": int(np.abs(u).max()) / 1000.0,
                    }
                else:
                    rate, x = decoder(row["payload"])
                    n = int(x.size)
                    neg = x < 0
                    zc = int(np.count_nonzero(neg[:-1] != neg[1:]))
                    feats = {
                        "n_samples": n,
                        "duration_s": n / float(rate),
                        "rms": math.sqrt(float((x * x).sum()) / n) if n else 0.0,
                        "zcr": zc / (n - 1.0) if n > 1 else 0.0,
                        "peak": float(np.abs(x).max()) if n else 0.0,
                    }
                rows.append({"asset_id": row["asset_id"], **feats})
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_samples", "duration_s", "rms", "zcr", "peak"],
            )

    flat = media.filter(F.col("meta.media_type") == media_type).select(
        "asset_id", "payload", F.col("meta.n_bytes").alias("n_bytes")
    )
    return _spread(flat).mapInPandas(kernel, schema=out_schema)


def _decode_video_frame(payload: bytes, frame_no: int, width: int, height: int) -> np.ndarray:
    """STUB frame decode: a real build seeks + decodes via ffmpeg.  Same
    modular-ramp fake as images with a per-frame seed offset
    (``seed + 13*frame_no``) so frames of one video differ."""
    if width <= 0 or height <= 0:
        raise NotImplementedError("real decoder required for degenerate dims")
    s0 = (_seed_of(payload) + _FRAME_STEP * frame_no) % 256
    flat = _ramp(s0, height * width * 3, _PIXEL_STEP, 256)
    return flat.reshape(height, width, 3)


def video_frame_features(
    media: DataFrame, every_n: int = 10, max_frames: int = 5
) -> DataFrame:
    """Sampled-frame features: explode videos to (asset_id, frame_no)
    rows WITH the payload (each decode task needs the bytes — the same
    rows a cluster would shuffle to frame-decode executors), then decode
    each sampled frame and emit per-frame luma stats via mapInPandas."""
    vids = media.filter(F.col("meta.media_type") == "video/mp4")
    n_frames = (F.col("meta.n_bytes") / 100 + 1).cast("int")
    idx = F.slice(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)), 1, max_frames)
    flat = vids.select(
        "asset_id",
        F.explode(idx).alias("frame_no"),
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    out_schema = "asset_id long, frame_no int, mean_luma double, std_luma double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = _decode_video_frame(
                    row["payload"], int(row["frame_no"]),
                    int(row["width"]), int(row["height"]),
                )
                n = img.shape[0] * img.shape[1]
                luma3 = img.sum(axis=2, dtype=np.int32)
                s1 = int(luma3.sum(dtype=np.int64))
                s2 = int((luma3 * luma3).sum(dtype=np.int64))
                var = s2 / (n * 9.0) - (s1 / (n * 3.0)) * (s1 / (n * 3.0))
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "frame_no": int(row["frame_no"]),
                        "mean_luma": s1 / (n * 3.0),
                        "std_luma": math.sqrt(max(var, 0.0)),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "mean_luma", "std_luma"]
            )

    return _spread(flat).mapInPandas(kernel, schema=out_schema)


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Sample frame indices from video assets: explode to one row per
    sampled frame — pure JVM explode; the decode of each frame is the
    same stubbed kernel downstream."""
    vids = media.filter(F.col("meta.media_type") == "video/mp4")
    n_frames = (F.col("meta.n_bytes") / 100 + 1).cast("int")  # fake frame count
    idx = F.slice(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)), 1, max_frames)
    return vids.select(
        "asset_id",
        F.explode(idx).alias("frame_no"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def resize_plan(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize planning (scale factors + output dims) as pure column math;
    the pixel resample itself is the stubbed decode kernel's job."""
    return media.select(
        "asset_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
        F.lit(target_w).alias("dst_w"),
        F.lit(target_h).alias("dst_h"),
        F.round(F.lit(target_w) / F.col("meta.width"), 6).alias("scale_x"),
        F.round(F.lit(target_h) / F.col("meta.height"), 6).alias("scale_y"),
    )
