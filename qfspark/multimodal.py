"""Multimodal column plumbing: opaque binary media + typed metadata.

Training-data pipelines carry images/audio/video as opaque ``binary``
columns with typed metadata and run decode / feature-extract / resize /
frame-sample as Arrow-batched Pandas functions over ``mapInPandas``. This
container has no media libraries, so the *decode* step is stubbed: real
decoders raise NotImplementedError behind an import guard, and a
deterministic fake featurizer (byte histogram + moments) stands in so the
Spark-side plumbing — schema, batch shape, partitioning, UDF signature —
is real and tested end-to-end.

Scale notes: media bytes never pass through a shuffle (features are
extracted in the scan stage's partitions via ``mapInPandas``); only the
small feature vectors move. ``spark.sql.files.maxPartitionBytes`` bounds
per-task memory for wide binary scans.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: schema of the media feature output (stable contract for downstream)
MEDIA_FEATURE_SCHEMA = (
    "media_id string, n_bytes long, kind string, features array<float>"
)

FEATURE_DIM = 16  # histogram buckets + moments


def _try_real_decoder(kind: str):
    """Return a real decoder callable when one is wired in; None means
    "use the deterministic fake featurizer".

    A production decoder is intentionally NOT shipped in this build (the
    media libraries are absent from the target container); the probe must
    therefore NEVER raise — merely having PIL/soundfile installed on a
    cluster node does not mean a decoder exists, and raising from a probe
    inside mapInPandas would fail the whole stage. Plug a real decoder in
    by returning a ``bytes -> np.ndarray[FEATURE_DIM]`` callable here."""
    try:  # pragma: no cover - libs absent in this container
        if kind == "image":
            import PIL.Image  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
        else:
            return None
    except ImportError:
        return None
    # libs importable, but no production decoder is wired in this build:
    # fall back to the deterministic featurizer
    return None


def fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in featurizer: 12-bucket byte histogram
    (normalized) + length, mean, std, entropy-ish moment. Pure function
    of the bytes — stable across runs/hosts."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16)[:12].astype(np.float64)
    hist = hist / len(arr)
    mean = float(arr.mean()) / 255.0
    std = float(arr.std()) / 255.0
    p = hist[hist > 0]
    ent = float(-(p * np.log2(p)).sum()) if p.size else 0.0
    out = np.concatenate([hist, [len(arr) / 1e6, mean, std, ent]])
    return out.astype(np.float32)


def extract_media_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    kind: str = "image",
    batch_limit: int = 1024,
) -> DataFrame:
    """(media_id, n_bytes, kind, features) for every media row.

    Runs in the scan partitions (mapInPandas): media bytes are consumed
    where they are read and only FEATURE_DIM floats leave the stage."""
    src = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _try_real_decoder(kind)
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                payloads = [
                    bytes(p) if p is not None else b"" for p in chunk["payload"]
                ]
                if decoder is not None:  # pragma: no cover
                    feats = [decoder(p) for p in payloads]
                else:
                    feats = [fake_features(p) for p in payloads]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "n_bytes": [len(p) for p in payloads],
                        "kind": kind,
                        "features": [f.tolist() for f in feats],
                    }
                )

    return src.mapInPandas(_extract, schema=MEDIA_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: split each media payload into up to
    ``max_frames`` fixed-size byte windows (stand-in for video frame
    extraction; a real impl would decode containers). Output one row per
    frame: (media_id, frame_no, frame binary)."""
    src = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                for i in range(min(max_frames, max(1, (len(p) + frame_bytes - 1) // frame_bytes))):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(p[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return src.mapInPandas(_frames, schema="media_id string, frame_no int, frame binary")
