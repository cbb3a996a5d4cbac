"""Multimodal column plumbing: opaque binary media columns with typed
metadata, decoded/resized/feature-extracted in actor-pool map_batches stages.

Real image/audio codecs are unavailable in this container (no PIL/ffmpeg), so
the codec is a DETERMINISTIC FAKE ("SIMG": a 16-byte header + raw uint8 HxWxC
payload) — but every piece of Ray-side plumbing is real and tested: binary
Arrow columns, schema, batch sizing for large payloads, actor signature,
vectorized numpy decode/resize/feature kernels, output layout. Swapping in a
real codec changes ONE function (`decode_simg`).
"""

from __future__ import annotations

import os
import struct
from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.tables import read_parquet_nometa

MAGIC = b"SIMG"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
    ]
)


def encode_simg(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return MAGIC + struct.pack("<III", h, w, c) + arr.astype(np.uint8).tobytes()


def decode_simg(payload: bytes) -> np.ndarray:
    """The stub decode step: parses the deterministic fake format. A real
    deployment replaces this body with e.g. PIL.Image.open — the stage
    signature and everything around it is unchanged."""
    if payload[:4] != MAGIC:
        raise NotImplementedError(
            "real image codecs are unavailable in this environment; "
            "only the deterministic SIMG fake format is supported"
        )
    h, w, c = struct.unpack("<III", payload[4:16])
    return np.frombuffer(payload[16:], dtype=np.uint8).reshape(h, w, c)


def resize_nearest(arr: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    th, tw = size
    h, w, _ = arr.shape
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :], :]


def synth_media_table(sf_dir: str, out_path: str, rows_per_doc: int = 1) -> str:
    """Deterministic media fixture derived from documents: media_id = doc_id,
    pixel payload seeded by doc_id. Idempotent."""
    if os.path.exists(out_path):
        return out_path
    doc_ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    rows = []
    for doc_id in doc_ids:
        rng = np.random.RandomState(doc_id % (2**31))
        h, w = 8 + doc_id % 25, 8 + (doc_id * 7) % 25
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append(
            {"media_id": doc_id, "kind": "image", "payload": encode_simg(arr)}
        )
    pq.write_table(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA), out_path)
    return out_path


class MediaFeatureStage:
    """Actor-pool stage: decode → resize → feature extract. Large binary
    payloads need SMALL batch sizes (set at the map_batches call site) so a
    batch × concurrency fits in the worker heap."""

    def __init__(self, thumb: Tuple[int, int] = (8, 8)):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, means, thumbs = [], [], [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            arr = decode_simg(payload)
            small = resize_nearest(arr, self.thumb)
            ids.append(media_id)
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            means.append([round(float(m), 4) for m in arr.mean(axis=(0, 1))])
            thumbs.append(small.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "channel_means": pa.array(means, pa.list_(pa.float64())),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


def media_features(sf_dir: str, media_path: str = None) -> "rd.Dataset":
    """documents-derived media table → decoded metadata + features."""
    if media_path is None:
        import hashlib

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        media_path = synth_media_table(sf_dir, f"/tmp/scr_media_{tag}.parquet")
    return read_parquet_nometa(media_path).map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=64,  # small batches: rows carry binary payloads
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------- audio/video
# Same honest-fake pattern as SIMG: deterministic formats ("SAUD" = 12-byte
# header + int16 mono PCM; "SVID" = 20-byte header + F raw uint8 HxWx3
# frames). The Ray-side plumbing — binary columns, small batches, actor
# stages, vectorized kernels, output schema — is real; a deployment swaps
# decode_saud/decode_svid for soundfile/ffmpeg.

AUDIO_MAGIC = b"SAUD"
VIDEO_MAGIC = b"SVID"


def encode_saud(samples: np.ndarray, rate: int = 16000) -> bytes:
    return AUDIO_MAGIC + struct.pack("<II", rate, len(samples)) \
        + samples.astype(np.int16).tobytes()


def decode_saud(payload: bytes) -> Tuple[np.ndarray, int]:
    if payload[:4] != AUDIO_MAGIC:
        raise NotImplementedError(
            "real audio codecs are unavailable in this environment; "
            "only the deterministic SAUD fake format is supported"
        )
    rate, n = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload[12:], dtype=np.int16)[:n], rate


def encode_svid(frames: np.ndarray) -> bytes:
    f, h, w, c = frames.shape
    return VIDEO_MAGIC + struct.pack("<IIII", f, h, w, c) \
        + frames.astype(np.uint8).tobytes()


def decode_svid(payload: bytes) -> np.ndarray:
    if payload[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            "real video codecs are unavailable in this environment; "
            "only the deterministic SVID fake format is supported"
        )
    f, h, w, c = struct.unpack("<IIII", payload[4:20])
    return np.frombuffer(payload[20:], dtype=np.uint8).reshape(f, h, w, c)


def synth_audio_table(sf_dir: str, out_path: str) -> str:
    """Deterministic audio fixture: media_id = doc_id, sine+noise PCM seeded
    by doc_id, 0.05–0.3 s at 16 kHz. Idempotent."""
    if os.path.exists(out_path):
        return out_path
    doc_ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    rows = []
    for doc_id in doc_ids:
        rng = np.random.RandomState(doc_id % (2**31))
        n = 800 + (doc_id * 37) % 4000
        t = np.arange(n)
        freq = 100 + doc_id % 400
        wave = 6000 * np.sin(2 * np.pi * freq * t / 16000) \
            + rng.normal(0, 500, n)
        rows.append({"media_id": doc_id, "kind": "audio",
                     "payload": encode_saud(wave)})
    pq.write_table(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA), out_path)
    return out_path


def synth_video_table(sf_dir: str, out_path: str) -> str:
    """Deterministic video fixture: 6–29 frames of 8×8 RGB per doc."""
    if os.path.exists(out_path):
        return out_path
    doc_ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    rows = []
    for doc_id in doc_ids:
        rng = np.random.RandomState((doc_id * 13 + 1) % (2**31))
        f = 6 + doc_id % 24
        frames = rng.randint(0, 256, size=(f, 8, 8, 3), dtype=np.uint8)
        rows.append({"media_id": doc_id, "kind": "video",
                     "payload": encode_svid(frames)})
    pq.write_table(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA), out_path)
    return out_path


class AudioFeatureStage:
    """Actor-pool stage: decode → vectorized loudness/zero-crossing/duration
    features per clip."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, rmss, zcrs, peaks = [], [], [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            samples, rate = decode_saud(payload)
            x = samples.astype(np.float64) / 32768.0
            ids.append(media_id)
            durs.append(round(len(x) / rate, 6))
            rmss.append(round(float(np.sqrt(np.mean(x * x))), 6)
                        if len(x) else 0.0)
            zcrs.append(round(float(np.mean(np.abs(np.diff(np.sign(x))) > 0)),
                              6) if len(x) > 1 else 0.0)
            peaks.append(round(float(np.max(np.abs(x))), 6) if len(x) else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "duration_s": pa.array(durs, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "zero_cross_rate": pa.array(zcrs, pa.float64()),
                "peak": pa.array(peaks, pa.float64()),
            }
        )


class VideoFrameSampleStage:
    """Actor-pool stage: uniform frame sampling (the standard pre-embedding
    step) → per-sampled-frame channel means + thumb bytes, one output row per
    (video, sampled frame)."""

    def __init__(self, n_frames: int = 4, thumb: Tuple[int, int] = (4, 4)):
        self.n_frames = n_frames
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, means, thumbs = [], [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            frames = decode_svid(payload)
            f = frames.shape[0]
            take = np.unique(
                (np.arange(self.n_frames) * f // self.n_frames).clip(0, f - 1)
            )
            for i in take:
                ids.append(media_id)
                fidx.append(int(i))
                means.append(
                    [round(float(m), 4) for m in frames[i].mean(axis=(0, 1))]
                )
                thumbs.append(resize_nearest(frames[i], self.thumb).tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "channel_means": pa.array(means, pa.list_(pa.float64())),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


def _fixture_path(sf_dir: str, tag: str) -> str:
    import hashlib

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/scr_media_{tag}_{h}.parquet"


def audio_features(sf_dir: str, media_path: str = None) -> "rd.Dataset":
    if media_path is None:
        media_path = synth_audio_table(sf_dir, _fixture_path(sf_dir, "aud"))
    return read_parquet_nometa(media_path).map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


def video_frame_sample(sf_dir: str, media_path: str = None) -> "rd.Dataset":
    if media_path is None:
        media_path = synth_video_table(sf_dir, _fixture_path(sf_dir, "vid"))
    return read_parquet_nometa(media_path).map_batches(
        VideoFrameSampleStage,
        batch_format="pyarrow",
        batch_size=32,  # video payloads are the largest rows
        concurrency=(1, 4),
    )
