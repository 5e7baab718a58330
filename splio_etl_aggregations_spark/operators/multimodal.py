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
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tmpdirs import memoized_asset_dir, tracked_mkdtemp

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


def _write_blobs_impl(n: int = 24) -> str:
    """Deterministic fake media blobs (seeded bytes + a tiny header)."""
    root = os.path.join(tracked_mkdtemp(prefix="mm_blobs_"), "blobs")
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


def _write_blobs_with_variants(n: int = 24) -> str:
    """Memoized front door for ``_write_blobs_with_variants_impl`` —
    must NOT share the plain ``_write_blobs`` directory (adding the
    variant files there would poison every other blob consumer)."""
    return memoized_asset_dir(
        ("blobs_variants", n), lambda: _write_blobs_with_variants_impl(n)
    )


def _write_blobs_with_variants_impl(n: int = 24) -> str:
    """The ``_write_blobs`` corpus plus a near-duplicate VARIANT of
    every third blob: identical bytes except three body positions
    (100/200/300) overwritten with fixed values — the 'same image,
    re-encoded/watermarked' case perceptual dedup exists to catch."""
    root = _write_blobs_impl(n)  # fresh un-memoized copy — mutated below
    for i in range(0, n, 3):
        with open(os.path.join(root, f"img_{i:04d}.bin"), "rb") as fh:
            raw = bytearray(fh.read())
        body_off = 10
        for pos, val in ((100, 0xFF), (200, 0x00), (300, 0xAA)):
            raw[body_off + pos] = val
        with open(os.path.join(root, f"img_{i:04d}_v.bin"), "wb") as fh:
            fh.write(bytes(raw))
    return root


#: variant splice in hex space: body byte p lives at hex chars
#: [21 + 2p, 21 + 2p + 1] (1-based; 20 header chars precede the body)
_VARIANT_SQL = """
    variants AS (
      SELECT i,
        'img_' || lpad(i::VARCHAR, 4, '0') || '_v.bin' AS file_name,
        substr(hexdata, 1, 20 + 200) || 'ff'
          || substr(hexdata, 20 + 203, 200 - 2) || '00'
          || substr(hexdata, 20 + 403, 200 - 2) || 'aa'
          || substr(hexdata, 20 + 603) AS hexdata
      FROM blobs WHERE i % 3 = 0
    ),
    corpus AS (
      SELECT file_name, hexdata FROM blobs
      UNION ALL SELECT file_name, hexdata FROM variants
    )
"""


@register(
    "multimodal_dedup_phash",
    oracle=f"""
    WITH {_BLOBS_SQL},
    {_VARIANT_SQL},
    body AS (SELECT file_name, substr(hexdata, 21) AS bh FROM corpus),
    bytes AS (
      SELECT b.file_name, g.p AS p,
             ('0x' || substr(b.bh, 2 * g.p + 1, 2))::INT AS v
      FROM body b CROSS JOIN (SELECT range AS p FROM range(3000)) g
      WHERE g.p < length(b.bh) / 2
    ),
    strides AS (
      SELECT file_name, p % 64 AS s,
             SUM(v) AS ssum, COUNT(*) AS scnt
      FROM bytes GROUP BY 1, 2
    ),
    tot AS (
      SELECT file_name, SUM(v) AS tsum, COUNT(*) AS tcnt
      FROM bytes GROUP BY 1
    ),
    bits AS (
      SELECT s.file_name, s.s,
             CASE WHEN s.ssum * t.tcnt > t.tsum * s.scnt
                  THEN 1 ELSE 0 END AS b
      FROM strides s JOIN tot t USING (file_name)
    ),
    bands AS (
      SELECT file_name, s // 16 AS band,
             string_agg(b::VARCHAR, '' ORDER BY s) AS sig
      FROM bits GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.file_name AS file_a, b.file_name AS file_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig
       AND a.file_name < b.file_name
    ),
    ham AS (
      SELECT c.file_a, c.file_b,
             CAST(SUM(CASE WHEN x.b <> y.b THEN 1 ELSE 0 END) AS BIGINT)
               AS hamming
      FROM cand c
      JOIN bits x ON x.file_name = c.file_a
      JOIN bits y ON y.file_name = c.file_b AND y.s = x.s
      GROUP BY 1, 2
    )
    SELECT file_a, file_b, hamming FROM ham WHERE hamming <= 8
    """,
    tier="P3",
)
def multimodal_dedup_phash(spark, t):
    """Perceptual-hash NEAR-DUP detection for binary media — the
    multimodal pipeline's analogue of MinHash: decode each blob (the
    documented stub; a real deployment computes aHash/pHash over
    decoded pixels), derive a 64-bit perceptual fingerprint (bit s =
    whether byte-stride s's mean exceeds the blob's global mean, as an
    EXACT integer cross-multiply so no float seam exists), then find
    near-duplicates by Hamming ≤ 8 — never all-pairs: the fingerprint
    splits into 4×16-bit LSH bands and only band-collision candidates
    are verified, the same candidates-only discipline as
    ``dedup_near_minhash``. The oracle mirrors the banding exactly
    (band signatures, candidate join, Hamming verify), so engine and
    oracle agree bit-for-bit including the banding's own recall
    behavior; the corpus plants a 3-byte-perturbed variant of every
    third blob (re-encode/watermark stand-in), and the unit test
    asserts the planted pairs are the pairs found.

    Scale: fingerprints are 64 bits/asset — the band join shuffles
    8-byte signatures, verification touches only collision groups, and
    the decode stage is the same Arrow-batched mapInPandas as
    ``multimodal_decode_features``. At a billion images this is the
    standard dedup tier between exact-bytes (``multimodal_binary_
    ingest``'s sha256) and embedding cosine.
    """
    import numpy as np

    root = _write_blobs_with_variants()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bin")

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, bit_strs = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                if not content.startswith(b"FAKEIMG1"):
                    raise NotImplementedError(
                        "real codec not available in this environment"
                    )
                body = np.frombuffer(content[10:], dtype=np.uint8)
                idx = np.arange(len(body)) % 64
                ssum = np.bincount(idx, weights=body, minlength=64)
                scnt = np.bincount(idx, minlength=64)
                # exact integer cross-multiply (see docstring)
                bits = (
                    ssum.astype(np.int64) * len(body)
                    > int(body.sum()) * scnt.astype(np.int64)
                ).astype(int)
                names.append(path.rsplit("/", 1)[-1])
                bit_strs.append("".join(map(str, bits)))
            yield pd.DataFrame({"file_name": names, "bits": bit_strs})

    fps = raw.select("path", "content").mapInPandas(
        fingerprint, schema="file_name string, bits string"
    )
    bands = fps.select(
        "file_name",
        "bits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("bits", 16 * b + 1, 16).alias("sig"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bs"),
    ).select("file_name", "bits", "bs.band", "bs.sig")
    a = bands.select(
        F.col("file_name").alias("file_a"),
        F.col("bits").alias("bits_a"),
        "band",
        "sig",
    )
    b = bands.select(
        F.col("file_name").alias("file_b"),
        F.col("bits").alias("bits_b"),
        "band",
        "sig",
    )
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("file_a") < F.col("file_b"))
        .select("file_a", "file_b", "bits_a", "bits_b")
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split("bits_a", ""),
                F.split("bits_b", ""),
                lambda x, y: x != y,
            ),
            lambda d: d,
        )
    ).cast("bigint")
    return (
        cand.select("file_a", "file_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 8)
    )


# ---------------------------------------------------------------------------
# REAL codecs (round 5): BMP and WAV are uncompressed container formats
# decodable with stdlib + numpy alone — no PIL/ffmpeg needed — so for
# these two the decode stage is NOT the documented stub: the operators
# below write genuine .bmp / .wav files and parse them back
# byte-for-byte (BITMAPINFOHEADER + bottom-up BGR rows + 4-byte row
# padding; RIFF chunk walk + little-endian PCM16). The oracle
# regenerates the PIXEL/SAMPLE values from their generative formula —
# never touching the container bytes — so a hash match proves the whole
# encode → binaryFile → Arrow → numpy-decode path reconstructs the
# exact image/signal, padding, row flip, channel order and all.
# Compressed formats (JPEG/PNG/MP4) remain the documented
# NotImplementedError guard above until a codec lib is available.
# ---------------------------------------------------------------------------

_N_BMP = 18


def _bmp_dims(i: int) -> tuple[int, int]:
    # widths 13..19 cycle all four 4-byte row paddings (3w % 4 = 3,2,1,0);
    # heights 8..23 vary the bottom-up flip depth
    return 13 + i % 7, 8 + (i % 4) * 5


def _write_bmps_impl(n: int = _N_BMP) -> str:
    """Write n REAL 24-bit uncompressed BMP files whose pixel (x, y)
    (y from top) has channels r=(31i+7x+13y)%256, g=(17i+3x+5y)%256,
    b=(29i+11x+2y)%256 — the formula the oracle regenerates."""
    import struct

    root = os.path.join(tracked_mkdtemp(prefix="mm_bmp_"), "bmps")
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        w, h = _bmp_dims(i)
        row_sz = (3 * w + 3) // 4 * 4
        img_sz = row_sz * h
        hdr = struct.pack("<2sIHHI", b"BM", 54 + img_sz, 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_sz, 2835, 2835, 0, 0
        )
        rows = bytearray()
        for yf in range(h):  # file rows run bottom-up
            y = h - 1 - yf
            for x in range(w):  # pixel order within a row is B, G, R
                rows += bytes(
                    (
                        (29 * i + 11 * x + 2 * y) % 256,
                        (17 * i + 3 * x + 5 * y) % 256,
                        (31 * i + 7 * x + 13 * y) % 256,
                    )
                )
            rows += b"\x00" * (row_sz - 3 * w)
        with open(os.path.join(root, f"img_{i:04d}.bmp"), "wb") as fh:
            fh.write(hdr + info + bytes(rows))
    return root


def decode_bmp(content: bytes):
    """REAL 24-bit BMP decoder (numpy, no imaging libs): returns an
    (h, w, 3) uint8 array in RGB order with y running top-down —
    undoing the format's bottom-up row storage, BGR channel order and
    4-byte row padding. Raises on compressed/paletted variants."""
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", content, 10)[0]
    w, h = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    comp = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    if h <= 0:  # top-down BMPs (negative height) are legal but rare
        raise NotImplementedError("top-down BMP not supported")
    row_sz = (3 * w + 3) // 4 * 4
    buf = np.frombuffer(content, np.uint8, count=row_sz * h, offset=data_off)
    rows = buf.reshape(h, row_sz)[:, : 3 * w].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB


@register(
    "multimodal_decode_bmp",
    oracle="""
    WITH imgs AS (
      SELECT range AS i, 13 + range % 7 AS w, 8 + (range % 4) * 5 AS h
      FROM range(18)
    ),
    px AS (
      SELECT i, w, h, gx.x AS x, gy.y AS y,
             (31 * i + 7 * gx.x + 13 * gy.y) % 256 AS r,
             (17 * i + 3 * gx.x + 5 * gy.y) % 256 AS g,
             (29 * i + 11 * gx.x + 2 * gy.y) % 256 AS b
      FROM imgs
      CROSS JOIN (SELECT range AS x FROM range(19)) gx
      CROSS JOIN (SELECT range AS y FROM range(23)) gy
      WHERE gx.x < w AND gy.y < h
    )
    SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.bmp' AS file_name,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           round(SUM(r)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_r,
           round(SUM(g)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_g,
           round(SUM(b)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_b,
           CAST(SUM(CASE WHEN (2 * r + 5 * g + b) // 8 > 127
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bright,
           CAST(SUM(CASE WHEN y < h // 2 THEN r ELSE 0 END) AS BIGINT)
             AS top_half_r_sum
    FROM px GROUP BY 1
    """,
    tier="P3",
)
def multimodal_decode_bmp(spark, t):
    """Image decode + feature extraction over REAL BMP files — the
    first multimodal operator whose codec is not a stub: ``decode_bmp``
    parses the actual container (header offsets, bottom-up row order,
    BGR→RGB, per-row 4-byte padding) with numpy alone, inside the same
    Arrow-batched ``mapInPandas`` stage the stubbed operators use.

    The oracle regenerates each pixel from the generative formula and
    never sees the file bytes, so a value-hash match proves the decoder
    reconstructs the exact image: ``top_half_r_sum`` is deliberately
    asymmetric in y (catches a missed vertical flip), the channel means
    are asymmetric across r/g/b (catch BGR confusion), and the width
    cycle 13..19 exercises every row-padding remainder. Float
    discipline: the UDF emits EXACT integer channel sums; the mean +
    4-dp round happens JVM-side (``F.round``), mirroring the oracle —
    the repo's standard cross-engine float convention.

    Scale: identical posture to ``multimodal_decode_features`` — one
    binaryFile scan, whole-batch numpy decode per Arrow batch, output
    one row per asset; a real deployment swaps nothing but the codec
    set (PIL/libvips for compressed formats, this parser for BMP).
    """
    import numpy as np

    root = _write_bmps()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bmp")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "n_bright": [], "top_half_r_sum": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                im = decode_bmp(content)  # (h, w, 3) RGB, y top-down
                h, w = im.shape[:2]
                px = im.astype(np.int64)
                luma = (2 * px[:, :, 0] + 5 * px[:, :, 1] + px[:, :, 2]) // 8
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(int(px[:, :, 0].sum()))
                out["sum_g"].append(int(px[:, :, 1].sum()))
                out["sum_b"].append(int(px[:, :, 2].sum()))
                out["n_bright"].append(int((luma > 127).sum()))
                out["top_half_r_sum"].append(
                    int(px[: h // 2, :, 0].sum())
                )
            yield pd.DataFrame(out)

    decoded = raw.select("path", "content").mapInPandas(
        feats,
        schema="file_name string, width int, height int, sum_r long, "
        "sum_g long, sum_b long, n_bright long, top_half_r_sum long",
    )
    npx = (F.col("width") * F.col("height")).cast("double")
    return decoded.select(
        "file_name",
        "width",
        "height",
        F.round(F.col("sum_r") / npx, 4).alias("mean_r"),
        F.round(F.col("sum_g") / npx, 4).alias("mean_g"),
        F.round(F.col("sum_b") / npx, 4).alias("mean_b"),
        "n_bright",
        "top_half_r_sum",
    )


_N_WAV = 16


def _wav_samples(i: int):
    """Generative PCM16 signal for file i: s(t) = ((7919i + 2027t)
    % 65536) - 32768, length 240 + 97i — the formula the oracle
    regenerates."""
    import numpy as np

    n = 240 + 97 * i
    t_idx = np.arange(n, dtype=np.int64)
    return ((7919 * i + 2027 * t_idx) % 65536 - 32768).astype(np.int16)


def _write_wavs_impl(n: int = _N_WAV) -> str:
    """Write n REAL RIFF/WAVE files (PCM16 mono 8 kHz) via the stdlib
    ``wave`` encoder — so encode and decode are independent code
    paths."""
    import wave

    root = os.path.join(tracked_mkdtemp(prefix="mm_wav_"), "wavs")
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        with wave.open(os.path.join(root, f"clip_{i:04d}.wav"), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(_wav_samples(i).tobytes())
    return root


def decode_wav_pcm16(content: bytes):
    """REAL RIFF/WAVE decoder (manual chunk walk + numpy, independent
    of the stdlib encoder): returns (sample_rate, int16 sample array).
    Handles arbitrary chunk order/extra chunks; raises on non-PCM16."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(content):
        cid, sz = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or n_ch != 1 or bits != 16:
                raise NotImplementedError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


@register(
    "multimodal_decode_wav",
    oracle="""
    WITH clips AS (
      SELECT range AS i, 240 + 97 * range AS n FROM range(16)
    ),
    s AS (
      SELECT i, n, g.t AS t,
             (7919 * i + 2027 * g.t) % 65536 - 32768 AS v
      FROM clips
      CROSS JOIN (SELECT range AS t FROM range(1696)) g
      WHERE g.t < n
    ),
    lagged AS (
      SELECT i, n, v,
             lag(v) OVER (PARTITION BY i ORDER BY t) AS pv
      FROM s
    )
    SELECT 'clip_' || lpad(i::VARCHAR, 4, '0') || '.wav' AS file_name,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           8000 AS sample_rate,
           CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
           CAST(MAX(abs(v)) AS INT) AS peak_abs,
           CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_cross
    FROM lagged GROUP BY i
    """,
    tier="P3",
)
def multimodal_decode_wav(spark, t):
    """Audio decode + signal features over REAL WAV files — the audio
    counterpart of ``multimodal_decode_bmp``: the stdlib ``wave``
    module ENCODES PCM16 clips, an independent manual RIFF chunk-walk +
    numpy parser (``decode_wav_pcm16``) DECODES them inside
    ``mapInPandas``, and the oracle regenerates the signal from its
    generative formula without ever reading the files — a hash match
    proves header parse, chunk alignment, little-endian int16
    interpretation and sample count all round-trip exactly.

    Features are the standard audio-curation screen, all EXACT
    integers (no float seam): total |amplitude|, peak, and
    zero-crossing count (sign products via lag — the engine computes
    it vectorized as ``s[:-1] * s[1:] < 0`` in int64, the oracle via a
    window lag; both count strict sign flips). Scale posture: one
    binaryFile scan, per-batch numpy, one row per clip — decode cost
    is linear in audio bytes and embarrassingly parallel across files;
    a real deployment swaps the parser for soundfile/ffmpeg on
    compressed codecs and keeps every other line.
    """
    import numpy as np

    root = _write_wavs()
    raw = spark.read.format("binaryFile").load(f"{root}/*.wav")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "n_samples": [], "sample_rate": [],
                "sum_abs": [], "peak_abs": [], "n_zero_cross": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                rate, s = decode_wav_pcm16(content)
                v = s.astype(np.int64)
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["n_samples"].append(len(v))
                out["sample_rate"].append(rate)
                out["sum_abs"].append(int(np.abs(v).sum()))
                out["peak_abs"].append(int(np.abs(v).max()))
                out["n_zero_cross"].append(int((v[:-1] * v[1:] < 0).sum()))
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        feats,
        schema="file_name string, n_samples long, sample_rate int, "
        "sum_abs long, peak_abs int, n_zero_cross long",
    )


@register(
    "multimodal_audio_frames",
    oracle="""
    WITH clips AS (
      SELECT range AS i, 240 + 97 * range AS n FROM range(16)
    ),
    s AS (
      SELECT i, g.t // 256 AS frame_idx,
             (7919 * i + 2027 * g.t) % 65536 - 32768 AS v
      FROM clips
      CROSS JOIN (SELECT range AS t FROM range(1696)) g
      WHERE g.t < n
    )
    SELECT 'clip_' || lpad(i::VARCHAR, 4, '0') || '.wav' AS file_name,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(COUNT(*) AS INT) AS n_in_frame,
           CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
           CAST(MAX(abs(v)) AS INT) AS peak_abs
    FROM s GROUP BY i, frame_idx
    """,
    tier="P3",
)
def multimodal_audio_frames(spark, t):
    """Frame-level audio feature fan-out: decode each REAL WAV clip
    (same independent RIFF chunk-walk parser as
    ``multimodal_decode_wav``) and emit one row per 256-sample frame
    with exact-integer energy features — the 1→N fan-out shape every
    audio curation pipeline needs (VAD windows, per-frame loudness
    screens, silence trimming) where ``multimodal_decode_wav`` is the
    1→1 clip-summary shape and ``multimodal_frame_sample`` is the video
    analogue.

    The trailing partial frame is kept (n_in_frame < 256) — dropping it
    silently biases tail-loudness stats. All features are integer-exact
    (sum |v|, peak |v|), so the oracle regenerates the signal from its
    generative formula and groups by ``t // 256``; a hash match proves
    the decode AND the frame bucketing round-trip exactly. Scale
    posture: one binaryFile scan, per-batch numpy reshape, ≤⌈n/256⌉
    output rows per clip — fan-out is bounded by audio length, the
    stage stays embarrassingly parallel across files, and no shuffle
    exists in the plan at all.
    """
    return _wav_frames_frame(spark, _write_wavs())


def _wav_frames_frame(spark, root: str):
    """The frame-feature stage of ``multimodal_audio_frames``, shared
    with the scaling probe (`tools/scaling.py`) so the probe times the
    registered operator's exact decode/fan-out path."""
    import numpy as np

    frame_len = 256
    raw = spark.read.format("binaryFile").load(f"{root}/*.wav")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "frame_idx": [], "n_in_frame": [],
                "sum_abs": [], "peak_abs": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                _, s = decode_wav_pcm16(content)
                v = np.abs(s.astype(np.int64))
                name = path.rsplit("/", 1)[-1]
                for fi in range(-(-len(v) // frame_len)):
                    w = v[fi * frame_len : (fi + 1) * frame_len]
                    out["file_name"].append(name)
                    out["frame_idx"].append(fi)
                    out["n_in_frame"].append(len(w))
                    out["sum_abs"].append(int(w.sum()))
                    out["peak_abs"].append(int(w.max()))
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        frames,
        schema="file_name string, frame_idx int, n_in_frame int, "
        "sum_abs long, peak_abs int",
    )


@register(
    "multimodal_image_histogram",
    oracle="""
    WITH imgs AS (
      SELECT range AS i, 13 + range % 7 AS w, 8 + (range % 4) * 5 AS h
      FROM range(18)
    ),
    px AS (
      SELECT i,
             (31 * i + 7 * gx.x + 13 * gy.y) % 256 AS r,
             (17 * i + 3 * gx.x + 5 * gy.y) % 256 AS g,
             (29 * i + 11 * gx.x + 2 * gy.y) % 256 AS b
      FROM imgs
      CROSS JOIN (SELECT range AS x FROM range(19)) gx
      CROSS JOIN (SELECT range AS y FROM range(23)) gy
      WHERE gx.x < w AND gy.y < h
    ),
    chan AS (
      SELECT i, 'r' AS channel, r AS v FROM px
      UNION ALL SELECT i, 'g', g FROM px
      UNION ALL SELECT i, 'b', b FROM px
    )
    SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.bmp' AS file_name,
           channel, CAST(v // 64 AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_px
    FROM chan GROUP BY i, channel, bin
    """,
    tier="P3",
)
def multimodal_image_histogram(spark, t):
    """Per-channel 4-bin intensity histograms over the REAL BMP decode
    — the long-format (file × channel × bin) statistics shape image
    curation filters run on (exposure screens, solid-color/banner
    detection, channel-balance checks), where
    ``multimodal_decode_bmp`` emits one wide summary row per file.

    Counts are exact integers from ``np.bincount`` over ``v // 64``, so
    the formula-regenerating oracle proves decode AND binning: a
    missed BGR swap moves mass between the r/b histograms, an
    off-by-one in the bin edge shifts whole buckets — neither can
    hash-match. Bins with zero pixels are absent in BOTH engines
    (bincount output is filtered, SQL GROUP BY never manufactures
    empty groups). Scale posture: identical to every codec stage —
    per-file-independent mapInPandas over a binaryFile scan, ≤12
    output rows per file, no shuffle.
    """
    import numpy as np

    root = _write_bmps()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bmp")

    def hists(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"file_name": [], "channel": [], "bin": [], "n_px": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                img = decode_bmp(content)
                name = path.rsplit("/", 1)[-1]
                for ci, cname in enumerate("rgb"):
                    counts = np.bincount(
                        (img[:, :, ci] // 64).ravel(), minlength=4
                    )
                    for b in range(4):
                        if counts[b]:
                            out["file_name"].append(name)
                            out["channel"].append(cname)
                            out["bin"].append(b)
                            out["n_px"].append(int(counts[b]))
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        hists,
        schema="file_name string, channel string, bin int, n_px long",
    )


@register(
    "multimodal_resize_bmp",
    oracle="""
    WITH imgs AS (
      SELECT range AS i, 13 + range % 7 AS w, 8 + (range % 4) * 5 AS h
      FROM range(18)
    ),
    thumb AS (
      -- nearest-neighbor sample grid: output (u, v) reads source pixel
      -- (u*w//8, v*h//8) — the same integer floor map the engine's
      -- numpy indexer uses
      SELECT i, w, h, gu.u AS u, gv.v AS v,
             (gu.u * w) // 8 AS sx, (gv.v * h) // 8 AS sy
      FROM imgs
      CROSS JOIN (SELECT range AS u FROM range(8)) gu
      CROSS JOIN (SELECT range AS v FROM range(8)) gv
    ),
    px AS (
      SELECT i, u, v,
             (31 * i + 7 * sx + 13 * sy) % 256 AS r,
             (17 * i + 3 * sx + 5 * sy) % 256 AS g,
             (29 * i + 11 * sx + 2 * sy) % 256 AS b
      FROM thumb
    )
    SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.bmp' AS file_name,
           64 AS thumb_px,
           sha256(upper(string_agg(
             printf('%02x', r) || printf('%02x', g) || printf('%02x', b),
             '' ORDER BY v, u))) AS thumb_sha256,
           CAST(SUM((2 * r + 5 * g + b) // 8) AS BIGINT) AS luma_sum
    FROM px GROUP BY i
    """,
    tier="P3",
)
def multimodal_resize_bmp(spark, t):
    """REAL image RESIZE stage (no stub): decode genuine BMPs with
    ``decode_bmp`` and produce an 8×8 nearest-neighbor RGB thumbnail —
    the canonical pHash/preview prep — inside the standard Arrow
    ``mapInPandas`` stage. The sample map is the integer floor grid
    ``src = (dst · size) // 8`` in both engines, so the oracle can
    regenerate every sampled pixel from the generative formula without
    reading a file: the thumbnail's sha256 (over uppercase hex, repo
    fingerprint convention) proves decode + row flip + channel order +
    the exact resize index map end-to-end, byte for byte. ``luma_sum``
    is an exact integer fold over the same 64 pixels.

    Scale: identical posture to the other decode stages — one
    binaryFile scan, whole-batch numpy gather per asset (the resize is
    two integer index arrays, no interpolation arithmetic), one
    192-byte thumbnail row out per asset. A production variant swaps
    the gather for cv2/PIL Lanczos on compressed inputs; every
    Spark-side contract stays unchanged.
    """
    import hashlib

    import numpy as np

    root = _write_bmps()
    raw = spark.read.format("binaryFile").load(f"{root}/*.bmp")
    T = 8

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "thumb_px": [],
                "thumb_sha256": [], "luma_sum": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                im = decode_bmp(content)  # (h, w, 3) RGB, y top-down
                h, w = im.shape[:2]
                sx = (np.arange(T) * w) // T
                sy = (np.arange(T) * h) // T
                thumb = im[np.ix_(sy, sx)]  # (8, 8, 3) gather
                px = thumb.astype(np.int64)
                luma = (
                    2 * px[:, :, 0] + 5 * px[:, :, 1] + px[:, :, 2]
                ) // 8
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["thumb_px"].append(T * T)
                out["thumb_sha256"].append(
                    hashlib.sha256(
                        thumb.tobytes().hex().upper().encode()
                    ).hexdigest()
                )
                out["luma_sum"].append(int(luma.sum()))
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        resize,
        schema="file_name string, thumb_px int, thumb_sha256 string, "
        "luma_sum long",
    )


_N_PNG = 20


def _png_dims(i: int) -> tuple[int, int]:
    # widths 9..16, heights 6..18 — every height >= 6 so the per-row
    # filter cycle y % 5 exercises ALL FIVE PNG filter types per image
    return 9 + i % 8, 6 + (i % 5) * 3


def _png_pixels(i: int):
    """Generative RGB image for file i: channels r=(23i+5x+11y)%256,
    g=(13i+7x+3y)%256, b=(37i+2x+9y)%256 — the formula the oracle
    regenerates. Returns (h, w, 3) uint8, y top-down."""
    import numpy as np

    w, h = _png_dims(i)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return np.stack(
        [
            (23 * i + 5 * x + 11 * y) % 256,
            (13 * i + 7 * x + 3 * y) % 256,
            (37 * i + 2 * x + 9 * y) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG spec's Paeth predictor (left, up, upper-left) — the one
    shared spec function between encode filter and decode unfilter."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _write_pngs_impl(n: int = _N_PNG) -> str:
    """Write n REAL PNG files (8-bit truecolor, zlib-compressed): the
    encoder APPLIES the spec filters — row y uses filter type y % 5,
    so None/Sub/Up/Average/Paeth all appear in every image — then
    deflates the filtered stream and emits it as multiple <=256-byte
    IDAT chunks (exercising IDAT reassembly in the decoder). Filtering
    and unfiltering are inverse algorithms implemented separately, so
    encode and decode are independent code paths."""
    import zlib

    root = os.path.join(tracked_mkdtemp(prefix="mm_png_"), "pngs")
    os.makedirs(root, exist_ok=True)
    bpp = 3
    for i in range(n):
        im = _png_pixels(i)
        h, w = im.shape[:2]
        raw_rows = [bytes(im[y].tobytes()) for y in range(h)]
        filtered = bytearray()
        prior = bytes(bpp * w)
        for y, row in enumerate(raw_rows):
            f = y % 5
            filtered.append(f)
            for k in range(bpp * w):
                left = row[k - bpp] if k >= bpp else 0
                up = prior[k]
                ul = prior[k - bpp] if k >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = left
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                filtered.append((row[k] - pred) & 0xFF)
            prior = row
        import struct

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        comp = zlib.compress(bytes(filtered), 6)
        idats = b"".join(
            _png_chunk(b"IDAT", comp[o : o + 256])
            for o in range(0, len(comp), 256)
        )
        with open(os.path.join(root, f"img_{i:04d}.png"), "wb") as fh:
            fh.write(
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + idats
                + _png_chunk(b"IEND", b"")
            )
    return root


def _write_pngs(n: int = _N_PNG) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("pngs", n), lambda: _write_pngs_impl(n))


def decode_png(content: bytes):
    """REAL PNG decoder (stdlib zlib + numpy, no imaging libs): chunk
    walk with CRC verification, IDAT reassembly, inflate, and full
    unfiltering of all five spec filter types (None/Sub/Up/Average/
    Paeth). Returns an (h, w, 3) uint8 RGB array, y top-down. Raises
    on interlaced / non-8-bit / non-truecolor variants."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_id, comp, filt, interlace = ihdr
    if depth != 8 or ctype_id != 2 or comp != 0 or filt != 0:
        raise NotImplementedError("only 8-bit truecolor PNG supported")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    bpp = 3
    stride = bpp * w
    stream = zlib.decompress(bytes(idat))
    if len(stream) != h * (stride + 1):
        raise ValueError("decompressed stream length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = bytes(stride)
    for y in range(h):
        f = stream[y * (stride + 1)]
        raw = stream[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        if f == 0:
            recon = bytearray(raw)
        elif f == 2:  # Up: whole-row vector add
            recon = bytearray(
                (np.frombuffer(raw, np.uint8) + np.frombuffer(prior, np.uint8)).tobytes()
            )
        else:  # Sub/Average/Paeth carry a left-pixel dependency
            recon = bytearray(stride)
            for k in range(stride):
                left = recon[k - bpp] if k >= bpp else 0
                up = prior[k]
                ul = prior[k - bpp] if k >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                elif f == 4:
                    pred = _paeth(left, up, ul)
                else:
                    raise ValueError(f"bad filter type {f}")
                recon[k] = (raw[k] + pred) & 0xFF
        out[y] = np.frombuffer(bytes(recon), np.uint8)
        prior = bytes(recon)
    return out.reshape(h, w, bpp)


@register(
    "multimodal_decode_png",
    oracle="""
    WITH imgs AS (
      SELECT range AS i, 9 + range % 8 AS w, 6 + (range % 5) * 3 AS h
      FROM range(20)
    ),
    px AS (
      SELECT i, w, h, gx.x AS x, gy.y AS y,
             (23 * i + 5 * gx.x + 11 * gy.y) % 256 AS r,
             (13 * i + 7 * gx.x + 3 * gy.y) % 256 AS g,
             (37 * i + 2 * gx.x + 9 * gy.y) % 256 AS b
      FROM imgs
      CROSS JOIN (SELECT range AS x FROM range(16)) gx
      CROSS JOIN (SELECT range AS y FROM range(18)) gy
      WHERE gx.x < w AND gy.y < h
    )
    SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.png' AS file_name,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           round(SUM(r)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_r,
           round(SUM(g)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_g,
           round(SUM(b)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_b,
           CAST(SUM(CASE WHEN (2 * r + 5 * g + b) // 8 > 127
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bright,
           CAST(SUM((x + 2 * y) * g) AS BIGINT) AS xy_weighted_g
    FROM px GROUP BY 1
    """,
    tier="P3",
)
def multimodal_decode_png(spark, t):
    """Image decode over REAL COMPRESSED PNG files — retires the
    "compressed decode is always a stub" boundary (VERDICT r5 #4):
    ``decode_png`` walks the actual container (CRC-verified chunk
    stream, multi-chunk IDAT reassembly, zlib inflate) and reverses
    all five spec scanline filters; the encoder deliberately cycles
    filter type y % 5, so a single mis-implemented filter corrupts a
    fifth of every image's rows and every downstream aggregate.

    The oracle regenerates each pixel from the generative formula and
    never sees the file bytes, so a value-hash match proves the decoder
    reconstructs the exact image: ``xy_weighted_g`` is asymmetric in x
    and y (catches transposition and row-order mistakes), the channel
    means catch channel-order confusion, and the width cycle 9..16
    varies stride alignment. Float discipline: the UDF emits EXACT
    integer channel sums; the mean + 4-dp round happens JVM-side
    (``F.round``), mirroring the oracle.

    Scale: identical posture to ``multimodal_decode_bmp`` — one
    binaryFile scan, per-asset decode inside the Arrow-batched
    ``mapInPandas`` stage, one feature row out per asset. The
    per-scanline unfilter loop is spec-exact rather than vectorized; a
    production deployment swaps the codec body for libpng/PIL while
    every Spark-side contract (schema, partitioning, batch shape)
    stays unchanged.
    """
    return _png_features_frame(spark, _write_pngs())


def _png_features_frame(spark, root: str):
    """The decode+features stage of ``multimodal_decode_png`` over any
    PNG directory — shared with tools/scaling.py's K-probe so the
    measured plan is the registered operator's plan."""
    import numpy as np

    raw = spark.read.format("binaryFile").load(f"{root}/*.png")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "n_bright": [], "xy_weighted_g": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                im = decode_png(content)  # (h, w, 3) RGB, y top-down
                h, w = im.shape[:2]
                px = im.astype(np.int64)
                luma = (2 * px[:, :, 0] + 5 * px[:, :, 1] + px[:, :, 2]) // 8
                xw = np.arange(w, dtype=np.int64)[None, :]
                yw = np.arange(h, dtype=np.int64)[:, None]
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(int(px[:, :, 0].sum()))
                out["sum_g"].append(int(px[:, :, 1].sum()))
                out["sum_b"].append(int(px[:, :, 2].sum()))
                out["n_bright"].append(int((luma > 127).sum()))
                out["xy_weighted_g"].append(
                    int(((xw + 2 * yw) * px[:, :, 1]).sum())
                )
            yield pd.DataFrame(out)

    decoded = raw.select("path", "content").mapInPandas(
        feats,
        schema="file_name string, width int, height int, sum_r long, "
        "sum_g long, sum_b long, n_bright long, xy_weighted_g long",
    )
    npx = (F.col("width") * F.col("height")).cast("double")
    return decoded.select(
        "file_name",
        "width",
        "height",
        F.round(F.col("sum_r") / npx, 4).alias("mean_r"),
        F.round(F.col("sum_g") / npx, 4).alias("mean_g"),
        F.round(F.col("sum_b") / npx, 4).alias("mean_b"),
        "n_bright",
        "xy_weighted_g",
    )


_N_GIF = 12


def _gif_dims(i: int) -> tuple[int, int]:
    # up to 96x80 = 7680 px: large enough that the LZW code width grows
    # past 9 bits and (on the noisier images) the 4096-entry table fills
    # and the encoder must emit a mid-stream CLEAR
    return 24 + (i % 5) * 18, 20 + (i % 4) * 20


def _gif_indices(i: int):
    """Generative palette-index image for file i: idx = (19i+3x+7y)%256
    — the formula the oracle regenerates. Returns (h, w) uint8."""
    import numpy as np

    w, h = _gif_dims(i)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return ((19 * i + 3 * x + 7 * y) % 256).astype(np.uint8)


def _gif_palette():
    """Generative 256-entry RGB palette: entry c is ((7c+31)%256,
    (11c+17)%256, (5c+89)%256)."""
    import numpy as np

    c = np.arange(256, dtype=np.int64)
    return np.stack(
        [(7 * c + 31) % 256, (11 * c + 17) % 256, (5 * c + 89) % 256],
        axis=1,
    ).astype(np.uint8)


def _lzw_encode(seq: bytes, min_code_size: int = 8) -> bytes:
    """REAL GIF-variant LZW compressor: greedy longest-match dictionary,
    LSB-first variable-width codes (9→12 bits, growth when
    next_code == 2^width + 1 — the giflib lockstep rule), CLEAR-code
    table reset when the 4096-entry dictionary fills. Returns the
    packed code stream (no sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for ch in seq:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset so the decoder's table stays in sync
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8):
    """REAL GIF-variant LZW decompressor, written independently of the
    compressor: LSB-first bit reader, the code-not-yet-in-table case
    (cScSc), width growth when the table reaches 2^width, CLEAR
    resets. Returns (bytes, stats) where stats carries the clear count
    and the maximum code width reached — so tests can assert the hard
    paths actually ran."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int | None:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    # code space: 0..255 literals, 256 CLEAR, 257 EOI, 258+ dictionary —
    # the two placeholder slots keep list index == code value
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    out = bytearray()
    stats = {"clears": -1, "max_width": width}  # first CLEAR is mandatory
    while True:
        code = read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            stats["clears"] += 1
            continue
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the cScSc self-reference case
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
                stats["max_width"] = max(stats["max_width"], width)
        prev = entry
    return bytes(out), stats


def _write_gifs_impl(n: int = _N_GIF) -> str:
    """Write n REAL GIF87a files: logical screen descriptor, a 256-entry
    global color table from the generative palette formula, one image
    block whose pixel indices come through the real LZW compressor,
    framed in <=255-byte data sub-blocks."""
    import struct

    root = os.path.join(tracked_mkdtemp(prefix="mm_gif_"), "gifs")
    os.makedirs(root, exist_ok=True)
    pal = _gif_palette().tobytes()
    for i in range(n):
        idx = _gif_indices(i)
        h, w = idx.shape
        # packed: GCT present | color resolution 7 | GCT size 7 (256)
        screen = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        lzw = _lzw_encode(idx.tobytes())
        blocks = b"".join(
            bytes([len(lzw[o : o + 255])]) + lzw[o : o + 255]
            for o in range(0, len(lzw), 255)
        )
        with open(os.path.join(root, f"anim_{i:04d}.gif"), "wb") as fh:
            fh.write(
                b"GIF87a" + screen + pal + img_desc
                + bytes([8]) + blocks + b"\x00" + b"\x3b"
            )
    return root


def _write_gifs(n: int = _N_GIF) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("gifs", n), lambda: _write_gifs_impl(n))


def decode_gif(content: bytes):
    """REAL GIF87a/89a decoder (stdlib + numpy, no imaging libs):
    parses the screen descriptor and global color table, skips 89a
    extension blocks, reassembles the image's LZW sub-blocks, inflates
    them with the independent ``_lzw_decode``, and maps indices through
    the palette. Returns an (h, w, 3) uint8 RGB array, y top-down.
    Raises on interlaced / local-color-table / multi-image variants."""
    import struct

    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_n = 2 << (packed & 0x07)
    pal = np.frombuffer(content, np.uint8, count=3 * gct_n, offset=pos)
    pal = pal.reshape(gct_n, 3)
    pos += 3 * gct_n
    while pos < len(content):
        b0 = content[pos]
        if b0 == 0x21:  # 89a extension: label + sub-blocks
            pos += 2
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
        elif b0 == 0x2C:
            _, _, w, h, ipacked = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            if ipacked & 0x80:
                raise NotImplementedError("local color table not supported")
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            min_code = content[pos]
            pos += 1
            lzw = bytearray()
            while content[pos]:
                sz = content[pos]
                lzw += content[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            pos += 1
            idx_bytes, _stats = _lzw_decode(bytes(lzw), min_code)
            if len(idx_bytes) != w * h:
                raise ValueError("LZW stream decoded to wrong pixel count")
            idx = np.frombuffer(idx_bytes, np.uint8).reshape(h, w)
            if idx.max() >= gct_n:
                raise ValueError("palette index out of range")
            return pal[idx]
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("no image block found")


@register(
    "multimodal_decode_gif",
    oracle="""
    WITH imgs AS (
      SELECT range AS i, 24 + (range % 5) * 18 AS w,
             20 + (range % 4) * 20 AS h
      FROM range(12)
    ),
    px AS (
      SELECT i, w, h, gx.x AS x, gy.y AS y,
             (19 * i + 3 * gx.x + 7 * gy.y) % 256 AS c
      FROM imgs
      CROSS JOIN (SELECT range AS x FROM range(96)) gx
      CROSS JOIN (SELECT range AS y FROM range(80)) gy
      WHERE gx.x < w AND gy.y < h
    ),
    rgb AS (
      SELECT i, w, h, x, y,
             (7 * c + 31) % 256 AS r,
             (11 * c + 17) % 256 AS g,
             (5 * c + 89) % 256 AS b
      FROM px
    )
    SELECT 'anim_' || lpad(i::VARCHAR, 4, '0') || '.gif' AS file_name,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           round(SUM(r)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_r,
           round(SUM(g)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_g,
           round(SUM(b)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_b,
           CAST(SUM(CASE WHEN (2 * r + 5 * g + b) // 8 > 127
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bright,
           CAST(SUM((2 * x + y) * b) AS BIGINT) AS xy_weighted_b
    FROM rgb GROUP BY 1
    """,
    tier="P3",
)
def multimodal_decode_gif(spark, t):
    """Image decode over REAL LZW-COMPRESSED GIF files — the second
    genuinely compressed codec after ``multimodal_decode_png``, and a
    different compression family entirely (dictionary LZW with
    variable-width codes vs deflate): the encoder is a real greedy
    longest-match LZW compressor whose 4096-entry table FILLS on the
    larger fixtures (mid-stream CLEAR reset), and the independent
    decoder implements the LSB-first bit reader, code-not-yet-in-table
    (cScSc) case, width growth, and reset handling, then maps palette
    indices through the 256-entry global color table.

    The oracle regenerates every pixel from the index + palette
    formulas and never sees the file bytes, so a value-hash match
    proves the whole chain (sub-block reassembly, LZW inflate, palette
    lookup): one wrong code anywhere desynchronizes the dictionary and
    corrupts the rest of the image. ``xy_weighted_b`` is asymmetric in
    x/y; exact integer sums in the UDF, 4-dp mean JVM-side — the
    repo's standard cross-engine float convention.

    Scale: identical posture to the other decode stages — one
    binaryFile scan, per-asset decode inside the Arrow-batched
    ``mapInPandas`` stage, one feature row out per asset.
    """
    return _gif_features_frame(spark, _write_gifs())


def _gif_features_frame(spark, root: str):
    """The decode+features stage of ``multimodal_decode_gif`` over any
    GIF directory — shared with tools/scaling.py's K-probe so the
    measured plan is the registered operator's plan."""
    import numpy as np

    raw = spark.read.format("binaryFile").load(f"{root}/*.gif")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "n_bright": [], "xy_weighted_b": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                im = decode_gif(content)  # (h, w, 3) RGB, y top-down
                h, w = im.shape[:2]
                px = im.astype(np.int64)
                luma = (2 * px[:, :, 0] + 5 * px[:, :, 1] + px[:, :, 2]) // 8
                xw = np.arange(w, dtype=np.int64)[None, :]
                yw = np.arange(h, dtype=np.int64)[:, None]
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(int(px[:, :, 0].sum()))
                out["sum_g"].append(int(px[:, :, 1].sum()))
                out["sum_b"].append(int(px[:, :, 2].sum()))
                out["n_bright"].append(int((luma > 127).sum()))
                out["xy_weighted_b"].append(
                    int(((2 * xw + yw) * px[:, :, 2]).sum())
                )
            yield pd.DataFrame(out)

    decoded = raw.select("path", "content").mapInPandas(
        feats,
        schema="file_name string, width int, height int, sum_r long, "
        "sum_g long, sum_b long, n_bright long, xy_weighted_b long",
    )
    npx = (F.col("width") * F.col("height")).cast("double")
    return decoded.select(
        "file_name",
        "width",
        "height",
        F.round(F.col("sum_r") / npx, 4).alias("mean_r"),
        F.round(F.col("sum_g") / npx, 4).alias("mean_g"),
        F.round(F.col("sum_b") / npx, 4).alias("mean_b"),
        "n_bright",
        "xy_weighted_b",
    )


def _write_blobs(n: int = 24) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("blobs", n), lambda: _write_blobs_impl(n))


def _write_bmps(n: int = _N_BMP) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("bmps", n), lambda: _write_bmps_impl(n))


def _write_wavs(n: int = _N_WAV) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("wavs", n), lambda: _write_wavs_impl(n))
