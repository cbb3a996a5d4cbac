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
    return rd.read_parquet(media_path).map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=64,  # small batches: rows carry binary payloads
        concurrency=(1, 4),
    )
