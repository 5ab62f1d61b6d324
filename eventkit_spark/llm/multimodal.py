"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernels are
STUBBED behind ``_decode_image_bytes`` (deterministic fake derived from
the payload hash, clearly marked). Everything Spark-side — schema,
partition-preserving mapInPandas plumbing, batch shapes, metadata structs
— is real and tested; swapping the stub for PIL/libsndfile is a kernel
change only.

Scale notes: binary payloads ride in parquet as-is; mapInPandas streams
Arrow record batches so peak memory is one batch, not one partition.
Feature extraction emits fixed-width vectors -> downstream joins/agg are
columnar. Frame sampling explodes to (asset_id, frame_no) keyed rows —
the natural partitioning for distributed decode.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = "asset_id long, media_type string, width int, height int, n_bytes int"


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


def _decode_image_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: a real build calls PIL/turbojpeg here. The fake is a
    deterministic pseudo-image seeded by the payload hash so tests and
    plumbing are stable. Raises for absurd sizes like a real decoder."""
    if width <= 0 or height <= 0:
        raise NotImplementedError("real decoder required for degenerate dims")
    seed = int.from_bytes(bytes(payload[:8]).ljust(8, b"\0"), "little", signed=False)
    rng = np.random.default_rng(seed % (2**63))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def image_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Decode + extract per-image features (mean/std per channel, 8-bin
    luma histogram) via mapInPandas. Output schema is fixed-width."""
    out_schema = (
        "asset_id long, mean_r double, mean_g double, mean_b double, "
        "std_luma double, hist array<double>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = _decode_image_bytes(
                    row["payload"], int(row["width"]), int(row["height"])
                )
                luma = img.mean(axis=2)
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std_luma": float(luma.std()),
                        "hist": (hist / hist.sum()).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "mean_r", "mean_g", "mean_b", "std_luma", "hist"])

    flat = media.filter(F.col("meta.media_type") == "image/png").select(
        "asset_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return flat.mapInPandas(kernel, schema=out_schema)


def _decode_audio_bytes(payload: bytes, n_bytes: int) -> np.ndarray:
    """STUB decode: a real build calls soundfile/ffmpeg here. Fake mono
    float32 waveform, one sample per 2 payload bytes (16-bit PCM shape),
    seeded by the payload hash so the plumbing is deterministic."""
    if n_bytes <= 0:
        raise NotImplementedError("real decoder required for empty payloads")
    seed = int.from_bytes(bytes(payload[:8]).ljust(8, b"\0"), "little", signed=False)
    rng = np.random.default_rng(seed % (2**63))
    return rng.uniform(-1.0, 1.0, size=max(1, n_bytes // 2)).astype(np.float32)


def audio_features(media: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Decode + extract per-clip waveform features (duration, RMS,
    zero-crossing rate, peak) via mapInPandas — the audio sibling of
    ``image_features``; swapping the stub for a real decoder changes
    only the kernel."""
    out_schema = (
        "asset_id long, n_samples long, duration_s double, rms double, "
        "zcr double, peak double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                wav = _decode_audio_bytes(row["payload"], int(row["n_bytes"]))
                zc = np.count_nonzero(np.diff(np.signbit(wav))) / max(1, wav.size - 1)
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "n_samples": int(wav.size),
                        "duration_s": float(wav.size / sample_rate),
                        "rms": float(np.sqrt((wav.astype(np.float64) ** 2).mean())),
                        "zcr": float(zc),
                        "peak": float(np.abs(wav).max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_samples", "duration_s", "rms", "zcr", "peak"],
            )

    flat = media.filter(F.col("meta.media_type") == "audio/wav").select(
        "asset_id", "payload", F.col("meta.n_bytes").alias("n_bytes")
    )
    return flat.mapInPandas(kernel, schema=out_schema)


def _decode_video_frame(payload: bytes, frame_no: int, width: int, height: int) -> np.ndarray:
    """STUB frame decode: a real build seeks + decodes via ffmpeg. The
    fake varies the image seed by frame number so frames differ."""
    if width <= 0 or height <= 0:
        raise NotImplementedError("real decoder required for degenerate dims")
    seed = int.from_bytes(bytes(payload[:8]).ljust(8, b"\0"), "little", signed=False)
    rng = np.random.default_rng((seed ^ (frame_no * 0x9E3779B97F4A7C15)) % (2**63))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


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
                luma = img.mean(axis=2)
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "frame_no": int(row["frame_no"]),
                        "mean_luma": float(luma.mean()),
                        "std_luma": float(luma.std()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "mean_luma", "std_luma"]
            )

    return flat.mapInPandas(kernel, schema=out_schema)


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
