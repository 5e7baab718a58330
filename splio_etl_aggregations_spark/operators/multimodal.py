"""Multimodal columns (SURVEY.md §2-J tail; BASELINE.json north-star).

Images/audio/video are opaque ``binary`` columns + typed metadata. The
Spark-side plumbing — binaryFile source, schema, Arrow batch shape,
``mapInPandas`` decode stage — is real and tested; the actual codec call
is stubbed behind a deterministic fake (no image/audio libs in this
container), clearly marked where a real decoder would plug in.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..registry import register


def _write_blobs(n: int = 24) -> str:
    """Deterministic fake media blobs (seeded bytes + a tiny header)."""
    root = os.path.join(tempfile.mkdtemp(prefix="mm_blobs_"), "blobs")
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        seed = hashlib.sha256(f"blob-{i}".encode()).digest()
        body = (seed * 64)[: 512 + 97 * i]
        with open(os.path.join(root, f"img_{i:04d}.bin"), "wb") as fh:
            fh.write(b"FAKEIMG1" + bytes([i % 256, (i * 7) % 256]) + body)
    return root


@register("multimodal_binary_ingest", oracle=None, tier="P3")  # rows-only
def multimodal_binary_ingest(spark, t):
    """Ingest a directory of binary blobs via the binaryFile source into
    (name, byte length, sha256) — the canonical media-manifest table."""
    root = _write_blobs()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bin")
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.length(F.col("content")).alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )


@register("multimodal_decode_features", oracle=None, tier="P3")  # rows-only
def multimodal_decode_features(spark, t):
    """Decode + feature-extract stage over binary media via mapInPandas.

    The decode is a deterministic fake (header parse + byte statistics)
    standing in for e.g. PIL/libvips/ffmpeg — swap ``_fake_decode`` for a
    real codec and the schema, batching and partitioning stay unchanged.
    Arrow moves the binary column in columnar batches; one Python worker
    per core processes whole batches (never per-row pickling).
    """
    root = _write_blobs()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bin")

    def _fake_decode(content: bytes) -> dict:
        # STUB: a real implementation would decode pixels/samples here.
        # Deterministic stand-in: header fields + byte histogram moments.
        if not content.startswith(b"FAKEIMG1"):
            raise NotImplementedError(
                "real codec not available in this environment"
            )
        body = content[10:]
        mean = sum(body) / len(body)
        return {
            "width": 16 * (content[8] + 1),
            "height": 9 * (content[9] + 1),
            "byte_mean": round(mean, 4),
        }

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(c) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(
                0, "file_name", pdf["path"].str.split("/").str[-1].to_numpy()
            )
            yield out

    return raw.select("path", "content").mapInPandas(
        decode, schema="file_name string, width int, height int, byte_mean double"
    )


@register("multimodal_frame_sample", oracle=None, tier="P3")  # rows-only
def multimodal_frame_sample(spark, t):
    """Frame-sampling + resize stage over binary 'video' blobs: every
    k-th fixed-size frame is extracted and 'resized' (strided byte
    downsample standing in for a real scaler), one output row per
    sampled frame.

    The Spark-side plumbing is the real thing — binaryFile scan,
    mapInPandas with a 1→N row fan-out per blob (the batch shape a
    video pipeline needs: output rows ≫ input rows, still
    Arrow-batched), deterministic frame indexing — while the codec is
    the documented fake (a real one would wrap pyav/ffmpeg in
    ``_frames``). Partitioning note: each blob expands independently,
    so files parallelize perfectly and output skew follows blob size —
    at scale, repartition on (file, frame bucket) before any heavy
    per-frame model stage.
    """
    frame_bytes, every_k, resize_stride = 64, 4, 8
    root = _write_blobs()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bin")

    def _frames(content: bytes):
        # STUB codec: fixed-size byte windows as 'frames'; a real
        # implementation would decode containers/codecs here.
        body = content[10:]
        for i in range(0, len(body) - frame_bytes + 1, frame_bytes):
            yield i // frame_bytes, body[i : i + frame_bytes]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"file_name": [], "frame_idx": [], "resized_len": [], "frame_sha": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                for idx, frame in _frames(content):
                    if idx % every_k:
                        continue
                    resized = frame[::resize_stride]  # stand-in scaler
                    out["file_name"].append(name)
                    out["frame_idx"].append(idx)
                    out["resized_len"].append(len(resized))
                    out["frame_sha"].append(
                        hashlib.sha256(resized).hexdigest()
                    )
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        sample,
        schema="file_name string, frame_idx int, resized_len int, frame_sha string",
    )
