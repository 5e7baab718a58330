"""Multimodal columns (SURVEY.md §2-J tail; BASELINE.json north-star).

Images/audio/video are opaque ``binary`` columns + typed metadata. The
Spark-side plumbing — binaryFile source, schema, Arrow batch shape,
``mapInPandas`` decode stage — is real and tested; the actual codec call
is stubbed behind a deterministic fake (no image/audio libs in this
container), clearly marked where a real decoder would plug in.

Hash-checked since round 3 (rows-only through r2): the fake blobs are
pure functions of their index (sha256-seeded bytes), so DuckDB can
regenerate every blob AS HEX and recompute the manifest/decode/frame
outputs — which makes the oracle a byte-exactness proof of the whole
binaryFile → Arrow → pandas transport. One accommodation: DuckDB 1.0's
``sha256`` accepts only VARCHAR, so content fingerprints are computed
over the UPPERCASE HEX of the bytes (injective, cross-engine) rather
than the raw bytes.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..registry import register

#: DuckDB CTE regenerating the blob corpus as (i, file_name, hexdata) —
#: the exact hex of what _write_blobs() puts on disk.
_BLOBS_SQL = """
    ids AS (SELECT range AS i FROM range(24)),
    blobs AS (SELECT i,
      'img_' || lpad(i::VARCHAR, 4, '0') || '.bin' AS file_name,
      '46414b45494d4731' || printf('%02x', i % 256)
        || printf('%02x', (i * 7) % 256)
        || substr(repeat(sha256('blob-' || i), 64), 1, 2 * (512 + 97 * i))
        AS hexdata
    FROM ids)
"""


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


@register(
    "multimodal_binary_ingest",
    oracle=f"""
    WITH {_BLOBS_SQL}
    SELECT file_name,
           octet_length(unhex(hexdata)) AS n_bytes,
           sha256(upper(hexdata)) AS content_sha256
    FROM blobs
    """,
    tier="P3",
)
def multimodal_binary_ingest(spark, t):
    """Ingest a directory of binary blobs via the binaryFile source into
    (name, byte length, content fingerprint) — the canonical
    media-manifest table. The fingerprint is sha256 of the blob's
    uppercase hex (module docstring explains why), computed JVM-side
    (``sha2(hex(content))``) so the scan never leaves the executor."""
    root = _write_blobs()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bin")
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.length(F.col("content")).alias("n_bytes"),
        F.sha2(F.hex(F.col("content")), 256).alias("content_sha256"),
    )


@register(
    "multimodal_decode_features",
    oracle=f"""
    WITH {_BLOBS_SQL},
    body AS (SELECT file_name, hexdata, substr(hexdata, 21) AS bh FROM blobs),
    bytes AS (
      SELECT b.file_name, ('0x' || substr(b.bh, 2 * g.p + 1, 2))::INT AS v
      FROM body b CROSS JOIN (SELECT range AS p FROM range(3000)) g
      WHERE g.p < length(b.bh) / 2
    )
    SELECT b.file_name,
           16 * (('0x' || substr(b.hexdata, 17, 2))::INT + 1) AS width,
           9 * (('0x' || substr(b.hexdata, 19, 2))::INT + 1) AS height,
           round(s.byte_sum / s.n_body, 4) AS byte_mean
    FROM body b JOIN (
      SELECT file_name, SUM(v)::DOUBLE AS byte_sum,
             COUNT(*)::DOUBLE AS n_body
      FROM bytes GROUP BY file_name
    ) s USING (file_name)
    """,
    tier="P3",
)
def multimodal_decode_features(spark, t):
    """Decode + feature-extract stage over binary media via mapInPandas.

    The decode is a deterministic fake (header parse + byte statistics)
    standing in for e.g. PIL/libvips/ffmpeg — swap ``_fake_decode`` for a
    real codec and the schema, batching and partitioning stay unchanged.
    Arrow moves the binary column in columnar batches; one Python worker
    per core processes whole batches (never per-row pickling). The UDF
    emits EXACT integer byte sums; the mean + 4-dp rounding fold happens
    JVM-side with ``F.round`` so the float path matches the oracle's
    (the repo-wide r4 cross-engine rounding convention).
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
        return {
            "width": 16 * (content[8] + 1),
            "height": 9 * (content[9] + 1),
            "byte_sum": sum(body),
            "n_body": len(body),
        }

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(c) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(
                0, "file_name", pdf["path"].str.split("/").str[-1].to_numpy()
            )
            yield out

    decoded = raw.select("path", "content").mapInPandas(
        decode,
        schema="file_name string, width int, height int, "
        "byte_sum long, n_body long",
    )
    return decoded.select(
        "file_name",
        "width",
        "height",
        F.round(
            F.col("byte_sum").cast("double") / F.col("n_body").cast("double"),
            4,
        ).alias("byte_mean"),
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH {_BLOBS_SQL},
    body AS (SELECT file_name, substr(hexdata, 21) AS bh,
                    length(hexdata) / 2 - 10 AS n_body
             FROM blobs),
    frames AS (
      SELECT b.file_name, g.f AS frame_idx, b.bh
      FROM body b CROSS JOIN (SELECT range AS f FROM range(64)) g
      WHERE 64 * g.f + 64 <= b.n_body AND g.f % 4 = 0
    )
    SELECT file_name, CAST(frame_idx AS INT) AS frame_idx,
           8 AS resized_len,
           sha256(upper(
             substr(bh, 128 * frame_idx + 1, 2)
             || substr(bh, 128 * frame_idx + 17, 2)
             || substr(bh, 128 * frame_idx + 33, 2)
             || substr(bh, 128 * frame_idx + 49, 2)
             || substr(bh, 128 * frame_idx + 65, 2)
             || substr(bh, 128 * frame_idx + 81, 2)
             || substr(bh, 128 * frame_idx + 97, 2)
             || substr(bh, 128 * frame_idx + 113, 2)
           )) AS frame_sha
    FROM frames
    """,
    tier="P3",
)
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
                    # fingerprint over uppercase hex (module docstring)
                    out["frame_sha"].append(
                        hashlib.sha256(
                            resized.hex().upper().encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        sample,
        schema="file_name string, frame_idx int, resized_len int, frame_sha string",
    )
