"""Multimodal columns (SURVEY.md §2-J tail; BASELINE.json north-star).

Images/audio/video are opaque ``binary`` columns + typed metadata,
decoded inside Arrow-batched ``mapInPandas`` stages. Since r7 every
registered decode path runs a REAL codec written here from the public
format specs (no imaging libs in this container): 24-bit BMP, PNG
(zlib + all five scanline filters), GIF87a/89a single- and multi-frame
(real variable-width LZW), PCM16 WAV — the r3 ``_fake_decode`` /
``_frames`` stubs are fully retired. The opaque seeded-byte blob corpus
survives only where opacity IS the semantics (binary ingest manifest,
perceptual-hash dedup over raw bytes).

Hash-checked since round 3 (rows-only through r2): every corpus is a
pure function of the file index — seeded bytes for the opaque blobs,
generative pixel/sample formulas for the media files — so DuckDB can
regenerate every asset and recompute the manifest/decode/frame outputs
— which makes the oracle a byte-exactness proof of the whole
binaryFile → Arrow → pandas transport AND of each decoder. One
accommodation: DuckDB 1.0's ``sha256`` accepts only VARCHAR, so content
fingerprints are computed over the UPPERCASE HEX of the bytes
(injective, cross-engine) rather than the raw bytes.
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
    oracle="""
    WITH bmp AS (
      SELECT range AS i, 13 + range % 7 AS w, 8 + (range % 4) * 5 AS h
      FROM range(18)
    ),
    png AS (
      SELECT range AS i, 9 + range % 8 AS w, 6 + (range % 5) * 3 AS h
      FROM range(20)
    ),
    gif AS (
      SELECT range AS i, 24 + (range % 5) * 18 AS w,
             20 + (range % 4) * 20 AS h
      FROM range(12)
    ),
    allpx AS (
      SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.bmp' AS file_name,
             'bmp' AS fmt, w, h,
             (31 * i + 7 * gx.x + 13 * gy.y) % 256 AS r,
             (17 * i + 3 * gx.x + 5 * gy.y) % 256 AS g,
             (29 * i + 11 * gx.x + 2 * gy.y) % 256 AS b
      FROM bmp
      CROSS JOIN (SELECT range AS x FROM range(19)) gx
      CROSS JOIN (SELECT range AS y FROM range(23)) gy
      WHERE gx.x < w AND gy.y < h
      UNION ALL
      SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.png', 'png', w, h,
             (23 * i + 5 * gx.x + 11 * gy.y) % 256,
             (13 * i + 7 * gx.x + 3 * gy.y) % 256,
             (37 * i + 2 * gx.x + 9 * gy.y) % 256
      FROM png
      CROSS JOIN (SELECT range AS x FROM range(16)) gx
      CROSS JOIN (SELECT range AS y FROM range(18)) gy
      WHERE gx.x < w AND gy.y < h
      UNION ALL
      SELECT 'anim_' || lpad(i::VARCHAR, 4, '0') || '.gif', 'gif', w, h,
             (7 * ((19 * i + 3 * gx.x + 7 * gy.y) % 256) + 31) % 256,
             (11 * ((19 * i + 3 * gx.x + 7 * gy.y) % 256) + 17) % 256,
             (5 * ((19 * i + 3 * gx.x + 7 * gy.y) % 256) + 89) % 256
      FROM gif
      CROSS JOIN (SELECT range AS x FROM range(96)) gx
      CROSS JOIN (SELECT range AS y FROM range(80)) gy
      WHERE gx.x < w AND gy.y < h
    )
    SELECT file_name, fmt,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           round(SUM(r + g + b)::DOUBLE / (3 * MAX(w) * MAX(h)), 4)
             AS mean_rgb,
           CAST(SUM(CASE WHEN (2 * r + 5 * g + b) // 8 > 127
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bright
    FROM allpx GROUP BY 1, 2
    """,
    tier="P3",
)
def multimodal_decode_features(spark, t):
    """GENERIC image decode + feature stage over a MIXED-format corpus
    — one binaryFile scan across the BMP, PNG and GIF asset
    directories, with per-file codec dispatch on magic bytes inside a
    single Arrow-batched ``mapInPandas`` stage. This is the shape of a
    real scraped-media pipeline (formats arrive interleaved; the
    decode stage must route each blob), and since r7 every branch is a
    REAL decoder: ``decode_bmp`` (padding/BGR/bottom-up),
    ``decode_png`` (zlib inflate + all five scanline filters),
    ``decode_gif`` (variable-width LZW + palette) — the r3
    ``_fake_decode`` stub is retired.

    The oracle regenerates all three corpora from their generative
    pixel formulas (GIF through the palette formula composition) and
    never sees a file byte, so the value-hash match proves each
    format's full container walk. Exact integer RGB sums in the UDF;
    the 4-dp mean division happens JVM-side (``F.round``) — the
    repo-wide cross-engine float convention.

    Scale posture: one scan, one Python stage, one output row per
    asset; files parallelize perfectly and per-batch cost is bounded
    by decoded image size. At 100 TB the only change is swapping the
    pure-Python codec bodies for libpng/giflib bindings — schema,
    dispatch, batching and partitioning are already the real thing.
    """
    import numpy as np

    roots = [_write_bmps(), _write_pngs(), _write_gifs()]
    raw = spark.read.format("binaryFile").load([f"{r}/*" for r in roots])

    def decode_any(content: bytes):
        if content[:2] == b"BM":
            return "bmp", decode_bmp(content)
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            return "png", decode_png(content)
        if content[:6] in (b"GIF87a", b"GIF89a"):
            return "gif", decode_gif(content)
        raise ValueError(f"unsupported media format: {content[:8]!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "fmt": [], "width": [], "height": [],
                "sum_rgb": [], "n_bright": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                fmt, im = decode_any(content)
                h, w = im.shape[:2]
                px = im.astype(np.int64)
                luma = (2 * px[:, :, 0] + 5 * px[:, :, 1] + px[:, :, 2]) // 8
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["sum_rgb"].append(int(px.sum()))
                out["n_bright"].append(int((luma > 127).sum()))
            yield pd.DataFrame(out)

    decoded = raw.select("path", "content").mapInPandas(
        decode,
        schema="file_name string, fmt string, width int, height int, "
        "sum_rgb long, n_bright long",
    )
    n_samples = (3 * F.col("width") * F.col("height")).cast("double")
    return decoded.select(
        "file_name",
        "fmt",
        "width",
        "height",
        F.round(F.col("sum_rgb") / n_samples, 4).alias("mean_rgb"),
        "n_bright",
    )


_N_AGIF = 12


def _agif_dims(i: int) -> tuple[int, int]:
    # small frames (16..40 x 12..32): many frames per file matter more
    # than pixels per frame for the 1->N fan-out this op exercises
    return 16 + (i % 4) * 8, 12 + (i % 3) * 10


def _agif_n_frames(i: int) -> int:
    return 8 + i % 5  # 8..12 frames; every-4th sampling keeps 2 or 3


def _agif_indices(i: int, f: int):
    """Generative palette-index frame f of file i:
    idx = (19i + 29f + 3x + 7y) % 256 — the same index formula family
    as the still-GIF corpus with a per-frame term, so the oracle
    regenerates any frame without decoding."""
    import numpy as np

    w, h = _agif_dims(i)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return ((19 * i + 29 * f + 3 * x + 7 * y) % 256).astype(np.uint8)


def _write_agifs_impl(n: int = _N_AGIF) -> str:
    """Write n REAL multi-frame (animated) GIF89a files: global color
    table from the shared palette formula, then per frame a Graphics
    Control Extension (the decoder must skip extensions), an image
    descriptor, and the frame's indices through the real LZW
    compressor in <=255-byte sub-blocks."""
    import struct

    root = os.path.join(tracked_mkdtemp(prefix="mm_agif_"), "agifs")
    os.makedirs(root, exist_ok=True)
    pal = _gif_palette().tobytes()
    for i in range(n):
        w, h = _agif_dims(i)
        screen = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        parts = [b"GIF89a", screen, pal]
        for f in range(_agif_n_frames(i)):
            # GCE: 4-byte block, 2-centisecond delay, no transparency
            parts.append(b"\x21\xf9\x04\x00\x02\x00\x00\x00")
            parts.append(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
            lzw = _lzw_encode(_agif_indices(i, f).tobytes())
            parts.append(bytes([8]))
            parts.append(
                b"".join(
                    bytes([len(lzw[o : o + 255])]) + lzw[o : o + 255]
                    for o in range(0, len(lzw), 255)
                )
            )
            parts.append(b"\x00")
        parts.append(b"\x3b")
        with open(os.path.join(root, f"vid_{i:04d}.gif"), "wb") as fh:
            fh.write(b"".join(parts))
    return root


def _write_agifs(n: int = _N_AGIF) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("agifs", n), lambda: _write_agifs_impl(n))


def gif_frames(content: bytes):
    """REAL multi-frame GIF walker: yields (frame_idx, (h, w, 3) RGB)
    for EVERY image block in an animated GIF — the multi-image case
    the single-image ``decode_gif`` deliberately rejects. Shares the
    independent ``_lzw_decode``; skips 89a extension blocks; raises on
    interlace/local-palette variants (same envelope as decode_gif)."""
    import struct

    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_n = 2 << (packed & 0x07)
    pal = np.frombuffer(content, np.uint8, count=3 * gct_n, offset=pos)
    pal = pal.reshape(gct_n, 3)
    pos += 3 * gct_n
    frame_idx = 0
    while pos < len(content):
        b0 = content[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
        elif b0 == 0x2C:
            _, _, w, h, ipacked = struct.unpack_from(
                "<HHHHB", content, pos + 1
            )
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
            yield frame_idx, pal[idx]
            frame_idx += 1
        elif b0 == 0x3B:
            return
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT range AS i, 16 + (range % 4) * 8 AS w,
             12 + (range % 3) * 10 AS h, 8 + range % 5 AS nf
      FROM range(12)
    ),
    fr AS (
      SELECT i, w, h, gf.f AS f FROM vids
      CROSS JOIN (SELECT range AS f FROM range(12)) gf
      WHERE gf.f < nf AND gf.f % 4 = 0
    ),
    thumb AS (
      SELECT i, f, gu.u AS u, gv.v AS v,
             (gu.u * w) // 8 AS sx, (gv.v * h) // 8 AS sy
      FROM fr
      CROSS JOIN (SELECT range AS u FROM range(8)) gu
      CROSS JOIN (SELECT range AS v FROM range(8)) gv
    ),
    px AS (
      SELECT i, f, u, v,
             (19 * i + 29 * f + 3 * sx + 7 * sy) % 256 AS c
      FROM thumb
    ),
    rgb AS (
      SELECT i, f, u, v,
             (7 * c + 31) % 256 AS r,
             (11 * c + 17) % 256 AS g,
             (5 * c + 89) % 256 AS b
      FROM px
    )
    SELECT 'vid_' || lpad(i::VARCHAR, 4, '0') || '.gif' AS file_name,
           CAST(f AS INT) AS frame_idx,
           CAST(SUM(r + g + b) AS BIGINT) AS thumb_rgb_sum,
           CAST(SUM((u + 2 * v) * g) AS BIGINT) AS uv_weighted_g
    FROM rgb GROUP BY 1, 2
    """,
    tier="P3",
)
def multimodal_frame_sample(spark, t):
    """Frame-sampling + resize over REAL animated GIFs: every 4th frame
    of each multi-frame GIF89a file is LZW-decoded (``gif_frames``
    walks GCE extensions + every image descriptor), nearest-neighbor
    resized to an 8x8 RGB thumbnail (floor index mapping — a real
    scaler, not a byte stride), one output row per sampled frame. The
    r3 byte-window ``_frames`` stub is retired; the 1->N mapInPandas
    fan-out shape (output rows >> input rows, still Arrow-batched) is
    unchanged.

    The oracle regenerates each sampled frame's thumbnail from the
    generative index+palette formulas and the same floor mapping
    ``src = (dst * dim) // 8``, never touching file bytes — a hash
    match proves sub-block reassembly, per-frame LZW, palette lookup
    AND the resize arithmetic. All features are exact integer sums
    (no float path at all).

    Partitioning note: each file expands independently, so files
    parallelize perfectly and output skew follows frame count; at
    scale, repartition on (file, frame bucket) before any heavy
    per-frame model stage.
    """
    import numpy as np

    every_k, thumb = 4, 8
    root = _write_agifs()
    raw = spark.read.format("binaryFile").load(f"{root}/*.gif")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "frame_idx": [],
                "thumb_rgb_sum": [], "uv_weighted_g": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                for idx, im in gif_frames(content):
                    if idx % every_k:
                        continue
                    h, w = im.shape[:2]
                    sy = (np.arange(thumb) * h) // thumb
                    sx = (np.arange(thumb) * w) // thumb
                    th = im[sy][:, sx].astype(np.int64)  # NN resize
                    u = np.arange(thumb, dtype=np.int64)[None, :]
                    v = np.arange(thumb, dtype=np.int64)[:, None]
                    out["file_name"].append(name)
                    out["frame_idx"].append(idx)
                    out["thumb_rgb_sum"].append(int(th.sum()))
                    out["uv_weighted_g"].append(
                        int(((u + 2 * v) * th[:, :, 1]).sum())
                    )
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        sample,
        schema="file_name string, frame_idx int, thumb_rgb_sum long, "
        "uv_weighted_g long",
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


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT + Huffman (ITU-T T.81), the dominant
# real-world image interchange format and the third compressed codec
# implemented here (deflate/PNG, LZW/GIF, now DCT+Huffman/JPEG).
#
# JPEG is LOSSY, which usually makes a formula-regenerating oracle
# impossible. The corpus dodges that honestly: every 8x8 block of the
# generative images lies in the span of the four DCT basis functions
# (0,0), (4,0), (0,4), (4,4) — the only basis functions whose IDCT
# contributions are EXACT EIGHTHS (cos((2x+1)*4*pi/16) = ±sqrt(2)/2 and
# the sqrt(2)s cancel against the C(u) normalizers) — with coefficient
# amplitudes that are exact multiples of the quant step at those four
# positions. The ENTIRE real pipeline still runs: forward 2-D DCT from
# pixels, quantization against a full 64-entry table, per-file optimal
# Huffman code construction, (RUN,SIZE) run-length + DC-difference
# entropy coding with 0xFF byte stuffing — and on the way back, marker
# walk, DHT/DQT parsing, canonical Huffman rebuild, entropy decode,
# dequant, dezigzag, float IDCT, level shift, round, clamp. The
# round-trip is bit-exact BY CONSTRUCTION of the corpus, so the DuckDB
# oracle regenerates decoded pixels from the closed-form block formula
# pixel(x,y) = 128 + a + b*s4(x) + c*s4(y) + d*s4(x)*s4(y), where
# s4(t) = +1 for t%8 in {0,3,4,7} else -1 (the sign pattern of the
# u=4 cosine), and a,b,c,d are per-block index formulas.

_N_JPG = 16


def _jpg_dims(i: int) -> tuple[int, int]:
    # multiples of 8 (baseline MCU size, no partial-block padding):
    # widths 16/24/32, heights 16..40
    return 8 * (2 + i % 3), 8 * (2 + i % 4)


def _jpg_block_coefs(i: int, bx: int, by: int) -> tuple[int, int, int, int]:
    """Per-block generative amplitudes (a=flat, b=horizontal u=4,
    c=vertical v=4, d=checker): |a|<=32, |b|,|c|<=8, |d|<=4 keeps every
    pixel inside [76, 176] — no clamp ever fires, so the decoder's
    clamp can't silently absorb an arithmetic bug."""
    a = (5 * i + 3 * bx + 2 * by) % 64 - 32
    b = (7 * i + bx + 3 * by) % 16 - 8
    c = (11 * i + 2 * bx + by) % 16 - 8
    d = (3 * i + bx + by) % 8 - 4
    return a, b, c, d


def _jpg_pixels(i: int):
    """Generative grayscale image for file i (see block comment above).
    Returns (h, w) uint8, y top-down."""
    import numpy as np

    w, h = _jpg_dims(i)
    s4 = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    im = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            a, b, c, d = _jpg_block_coefs(i, bx, by)
            blk = (
                128
                + a
                + b * s4[None, :]
                + c * s4[:, None]
                + d * s4[:, None] * s4[None, :]
            )
            im[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = blk
    return im


def _jpg_qtable():
    """Full 64-entry luminance quant table: step 8 at the four corpus
    basis positions (so amplitudes quantize losslessly), a varying
    formula elsewhere (so DQT parsing and dequant of arbitrary steps
    are still exercised — those positions carry only float-noise
    coefficients that quantize to 0)."""
    import numpy as np

    v = np.arange(8)[:, None]
    u = np.arange(8)[None, :]
    q = 16 + (3 * v + 5 * u) % 12
    for pos in ((0, 0), (0, 4), (4, 0), (4, 4)):
        q[pos] = 8
    return q.astype(np.int64)


def _jpg_zigzag():
    """The spec zigzag as (row, col) pairs, generated by the diagonal
    walk (even diagonals run bottom-left -> top-right): index 0 is DC,
    1 is (0,1), 2 is (1,0), ... — anchored against hand-transcribed
    spec values in tests."""
    order = []
    for s in range(15):
        diag = [(s - k, k) for k in range(s + 1) if s - k < 8 and k < 8]
        order.extend(diag[::-1] if s % 2 else diag)
    return order


def _dct_mat():
    """Orthonormal 8-point DCT-II matrix M: forward F = M B M^T,
    inverse B = M^T F M (both used below; the spec's C(u)/2 scaling)."""
    import numpy as np

    u = np.arange(8, dtype=np.float64)[:, None]
    x = np.arange(8, dtype=np.float64)[None, :]
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m


def _huff_lengths(freq: dict[int, int]) -> dict[int, int]:
    """Optimal Huffman code lengths via the classic two-least merge,
    with a freq-1 DUMMY symbol included so no REAL symbol can receive
    the all-ones code (the T.81 Annex K.2 reservation). Our alphabets
    are tiny, so depths stay far under the 16-bit JPEG cap (asserted)."""
    import heapq

    heap = [(f, k, (sym,)) for k, (sym, f) in enumerate(sorted(freq.items()))]
    heap.append((1, len(heap), (None,)))  # the reserved-codepoint dummy
    tie = len(heap)  # deterministic heap tiebreaker (symbols aren't <-able)
    heapq.heapify(heap)
    depth: dict[int | None, int] = {s: 0 for _, _, grp in heap for s in grp}
    while len(heap) > 1:
        fa, _, ga = heapq.heappop(heap)
        fb, _, gb = heapq.heappop(heap)
        for s in ga + gb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, tie, ga + gb))
        tie += 1
    depth.pop(None, None)
    if not depth:
        raise ValueError("empty Huffman alphabet")
    if len(depth) == 1:  # single real symbol still needs 1 bit
        depth = {s: max(1, d) for s, d in depth.items()}
    assert max(depth.values()) <= 16, "alphabet too deep for JPEG"
    return depth


def _huff_spec(depth: dict[int, int]):
    """(BITS[16], HUFFVAL) in canonical order: by length, then symbol
    value — the exact layout DHT carries and both codecs rebuild."""
    huffval = sorted(depth, key=lambda s: (depth[s], s))
    bits = [0] * 16
    for s in huffval:
        bits[depth[s] - 1] += 1
    return bits, huffval


def _canonical_codes(bits, huffval):
    """Canonical (code, length) per symbol from BITS/HUFFVAL — the
    T.81 Annex C generation both encoder and decoder share."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


def _jpg_mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category: (size, appended-bits) — negative
    values are stored as v + 2^size - 1 (the spec's reflected code)."""
    size = 0
    a = abs(v)
    while a:
        size += 1
        a >>= 1
    return size, (v if v >= 0 else v + (1 << size) - 1)


class _JpgBitWriter:
    """MSB-first bit packer with the entropy-segment 0xFF -> 0xFF 0x00
    byte stuffing; flush pads the final byte with 1-bits (spec)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _jpg_block_tokens(i: int):
    """Quantize every block of file i through the REAL forward path
    (pixels -> level shift -> float DCT -> /qtable -> round) and
    serialize to (dc_diff, [(run, ac_value), ...]) token lists in
    raster block order — shared by the frequency pass and the emit
    pass so the two can never disagree."""
    import numpy as np

    m = _dct_mat()
    q = _jpg_qtable()
    zz = _jpg_zigzag()
    im = _jpg_pixels(i).astype(np.float64)
    h, w = im.shape
    prev_dc = 0
    blocks = []
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = im[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] - 128.0
            coef = m @ blk @ m.T
            qc = np.round(coef / q).astype(np.int64)
            seq = [int(qc[r, c]) for r, c in zz]
            dc_diff = seq[0] - prev_dc
            prev_dc = seq[0]
            acs = []
            run = 0
            for v in seq[1:]:
                if v == 0:
                    run += 1
                else:
                    acs.append((run, v))
                    run = 0
            blocks.append((dc_diff, acs))
    return blocks


def _write_jpgs_impl(n: int = _N_JPG) -> str:
    """Write n REAL baseline JFIF-less JPEG files (SOI, DQT, SOF0, DHT,
    SOS, entropy-coded scan, EOI): per-file OPTIMAL Huffman tables
    built from actual symbol frequencies (carried in DHT), full
    (RUN,SIZE) AC coding with ZRL for >15-zero gaps (the zigzag gap
    between (0,4) and (4,0) is 16+ when intermediate formula noise
    quantizes away, so ZRL genuinely occurs), DC difference coding,
    and 0xFF byte stuffing."""
    import struct

    root = os.path.join(tracked_mkdtemp(prefix="mm_jpg_"), "jpgs")
    os.makedirs(root, exist_ok=True)
    q = _jpg_qtable()
    zz = _jpg_zigzag()
    for i in range(n):
        w, h = _jpg_dims(i)
        blocks = _jpg_block_tokens(i)
        dc_freq: dict[int, int] = {}
        ac_freq: dict[int, int] = {}
        for dc_diff, acs in blocks:
            size, _ = _jpg_mag_bits(dc_diff)
            dc_freq[size] = dc_freq.get(size, 0) + 1
            for run, v in acs:
                while run > 15:
                    ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1  # ZRL
                    run -= 16
                size, _ = _jpg_mag_bits(v)
                sym = (run << 4) | size
                ac_freq[sym] = ac_freq.get(sym, 0) + 1
            ac_freq[0x00] = ac_freq.get(0x00, 0) + 1  # EOB every block
        dc_bits, dc_vals = _huff_spec(_huff_lengths(dc_freq))
        ac_bits, ac_vals = _huff_spec(_huff_lengths(ac_freq))
        dc_codes = _canonical_codes(dc_bits, dc_vals)
        ac_codes = _canonical_codes(ac_bits, ac_vals)

        bw = _JpgBitWriter()
        for dc_diff, acs in blocks:
            size, mag = _jpg_mag_bits(dc_diff)
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(mag, size)
            for run, v in acs:
                while run > 15:
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                size, mag = _jpg_mag_bits(v)
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(mag, size)
            code, length = ac_codes[0x00]
            bw.write(code, length)
        scan = bw.flush()

        dqt = b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes(
            int(q[r, c]) for r, c in zz
        )
        sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes(
            (1, 0x11, 0)
        )
        dht = (
            b"\xff\xc4"
            + struct.pack(
                ">H", 2 + (1 + 16 + len(dc_vals)) + (1 + 16 + len(ac_vals))
            )
            + bytes([0x00])
            + bytes(dc_bits)
            + bytes(dc_vals)
            + bytes([0x10])
            + bytes(ac_bits)
            + bytes(ac_vals)
        )
        sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            (1, 0x00, 0, 63, 0)
        )
        with open(os.path.join(root, f"img_{i:04d}.jpg"), "wb") as fh:
            fh.write(
                b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
            )
    return root


def _write_jpgs(n: int = _N_JPG) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("jpgs", n), lambda: _write_jpgs_impl(n))


class _JpgBitReader:
    """MSB-first bit reader over the entropy segment, undoing the
    0xFF 0x00 stuffing — written independently of the writer."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if not self.n:
            if self.pos >= len(self.data):
                raise ValueError("entropy segment exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(reader: _JpgBitReader, codes: dict[int, tuple[int, int]]):
    """Walk the canonical code bit-by-bit (tiny alphabets — a lookup
    table would be the production move, linear probe is fine here)."""
    code = 0
    length = 0
    by_len: dict[tuple[int, int], int] = {
        (c, ln): sym for sym, (c, ln) in codes.items()
    }
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = by_len.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(content: bytes):
    """REAL baseline JPEG decoder (stdlib struct + numpy, no imaging
    libs): marker walk (skips APPn/COM), DQT (zigzag-stored) and DHT
    (canonical BITS/HUFFVAL) parsing, single-component SOF0, entropy
    decode with DC prediction / (RUN,SIZE) / ZRL / EOB and byte
    unstuffing, dequantization, dezigzag, float IDCT, +128 level
    shift, round, clamp. Returns (h, w) uint8 grayscale, y top-down.
    Raises on progressive (SOF2), multi-component, or 16-bit variants.
    """
    import struct

    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    dims = None
    comp_tables = None
    scan_start = None
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = content[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", content, pos + 2)[0]
        body = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables")
                qtables[pq_tq & 15] = list(body[off + 1 : off + 65])
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                huff[(tc_th >> 4, tc_th & 15)] = _canonical_codes(bits, vals)
                off += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nf != 1:
                raise NotImplementedError("only 8-bit single-component")
            if body[6] != 1 or body[7] != 0x11:
                raise NotImplementedError("subsampled components")
            dims = (h, w, body[8])
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline SOF0 supported")
        elif marker == 0xDA:
            if body[0] != 1:
                raise NotImplementedError("multi-component scan")
            comp_tables = (body[2] >> 4, body[2] & 15)
            scan_start = pos + 2 + seg_len
            break
        # APPn / COM / anything else: skip via its length field
        pos += 2 + seg_len
    if dims is None or scan_start is None:
        raise ValueError("missing SOF0/SOS")
    h, w, tq = dims
    if h % 8 or w % 8:
        raise NotImplementedError("partial-MCU dimensions")
    eoi = content.rindex(b"\xff\xd9")
    reader = _JpgBitReader(content[scan_start:eoi])
    dc_codes = huff[(0, comp_tables[0])]
    ac_codes = huff[(1, comp_tables[1])]
    q_zz = qtables[tq]
    zz = _jpg_zigzag()
    m = _dct_mat()
    out = np.zeros((h, w), dtype=np.uint8)
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            size = _huff_decode(reader, dc_codes)
            diff = reader.bits(size) if size else 0
            if size and diff < (1 << (size - 1)):
                diff += 1 - (1 << size)
            prev_dc += diff
            seq = [0] * 64
            seq[0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_decode(reader, ac_codes)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 15
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run overflows block")
                v = reader.bits(size)
                if v < (1 << (size - 1)):
                    v += 1 - (1 << size)
                seq[k] = v
                k += 1
            coef = np.zeros((8, 8), dtype=np.float64)
            for idx, (r, c) in enumerate(zz):
                coef[r, c] = seq[idx] * q_zz[idx]
            blk = m.T @ coef @ m + 128.0
            out[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = np.clip(
                np.round(blk), 0, 255
            ).astype(np.uint8)
    return out


@register(
    "multimodal_decode_jpeg",
    oracle="""
    WITH imgs AS (
      SELECT range AS i, 8 * (2 + range % 3) AS w,
             8 * (2 + range % 4) AS h
      FROM range(16)
    ),
    px AS (
      SELECT i, w, h, gx.x AS x, gy.y AS y,
             128
             + ((5 * i + 3 * (gx.x // 8) + 2 * (gy.y // 8)) % 64 - 32)
             + (CASE WHEN (gx.x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
               * ((7 * i + (gx.x // 8) + 3 * (gy.y // 8)) % 16 - 8)
             + (CASE WHEN (gy.y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
               * ((11 * i + 2 * (gx.x // 8) + (gy.y // 8)) % 16 - 8)
             + (CASE WHEN (gx.x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
               * (CASE WHEN (gy.y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
               * ((3 * i + (gx.x // 8) + (gy.y // 8)) % 8 - 4)
               AS v
      FROM imgs
      CROSS JOIN (SELECT range AS x FROM range(32)) gx
      CROSS JOIN (SELECT range AS y FROM range(40)) gy
      WHERE gx.x < w AND gy.y < h
    )
    SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.jpg' AS file_name,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           round(SUM(v)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_px,
           CAST(SUM(CASE WHEN v > 127 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bright,
           CAST(SUM((x + 2 * y) * v) AS BIGINT) AS xy_weighted
    FROM px GROUP BY 1
    """,
    tier="P3",
)
def multimodal_decode_jpeg(spark, t):
    """Image decode over REAL baseline JPEGs — DCT + Huffman, the
    format real image corpora actually ship in, and a third
    compression family after deflate (PNG) and LZW (GIF). See the
    section comment above for how a lossy codec gets an EXACT
    formula-regenerating oracle (corpus blocks live in the span of the
    four rational-IDCT basis functions); the decode path is the full
    real thing — marker walk, DHT canonical Huffman rebuild, DC
    prediction, (RUN,SIZE)/ZRL/EOB entropy decode, byte unstuffing,
    dequant, dezigzag, float IDCT — so one wrong bit anywhere
    desynchronizes the stream and corrupts every downstream sum.

    ``xy_weighted`` is asymmetric in x and y (catches transposition);
    exact integer sums in the UDF, 4-dp mean JVM-side (``F.round``) —
    the repo's standard cross-engine float convention.

    Scale: identical posture to the other decode stages — one
    binaryFile scan, per-asset decode inside the Arrow-batched
    ``mapInPandas`` stage, one feature row per asset; swap the codec
    body for libjpeg-turbo bindings at production scale, everything
    Spark-side stays.
    """
    return _jpg_features_frame(spark, _write_jpgs())


def _jpg_features_frame(spark, root: str):
    """The decode+features stage of ``multimodal_decode_jpeg`` over any
    JPEG directory — split out so tools/scaling.py's K-probe measures
    the registered operator's exact plan."""
    import numpy as np

    raw = spark.read.format("binaryFile").load(f"{root}/*.jpg")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "width": [], "height": [],
                "px_sum": [], "n_bright": [], "xy_weighted": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                im = decode_jpeg(content).astype(np.int64)
                h, w = im.shape
                xw = np.arange(w, dtype=np.int64)[None, :]
                yw = np.arange(h, dtype=np.int64)[:, None]
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(int(im.sum()))
                out["n_bright"].append(int((im > 127).sum()))
                out["xy_weighted"].append(int(((xw + 2 * yw) * im).sum()))
            yield pd.DataFrame(out)

    decoded = raw.select("path", "content").mapInPandas(
        feats,
        schema="file_name string, width int, height int, px_sum long, "
        "n_bright long, xy_weighted long",
    )
    npx = (F.col("width") * F.col("height")).cast("double")
    return decoded.select(
        "file_name",
        "width",
        "height",
        F.round(F.col("px_sum") / npx, 4).alias("mean_px"),
        "n_bright",
        "xy_weighted",
    )


# ---------------------------------------------------------------------------
# Color JPEG with 4:2:0 chroma subsampling — the second JPEG rung after
# the grayscale baseline above: 3 components (Y full-res, Cb/Cr at half
# resolution), interleaved 16x16 MCUs (4 Y blocks + Cb + Cr), separate
# luma/chroma quant + Huffman tables, per-component DC prediction, and
# chroma upsampling + YCbCr->RGB conversion on decode. The exactness
# trick is per-PLANE: each plane's 8x8 blocks live in the span of the
# rational-IDCT basis functions (see the grayscale section), and the
# color convert is a fixed scalar formula both engines evaluate
# identically (FLOOR(x + 0.5) — no banker's/away ambiguity), so the
# decoded RGB is a closed form DuckDB regenerates.

_N_JPG420 = 12


def _jpg420_dims(i: int) -> tuple[int, int]:
    # multiples of 16 (the 4:2:0 MCU size): 16/32 x 16/32/48
    return 16 * (1 + i % 2), 16 * (1 + i % 3)


def _jpg420_block_coefs(
    i: int, p: int, bx: int, by: int
) -> tuple[int, int, int, int]:
    """Per-(plane, block) basis amplitudes; p = 0 Y, 1 Cb, 2 Cr."""
    a = (5 * i + 3 * bx + 2 * by + 11 * p) % 64 - 32
    b = (7 * i + bx + 3 * by + 5 * p) % 16 - 8
    c = (11 * i + 2 * bx + by + 3 * p) % 16 - 8
    d = (3 * i + bx + by + p) % 8 - 4
    return a, b, c, d


def _jpg420_plane(i: int, p: int, w: int, h: int):
    """Generative plane (h, w) uint8 built block-wise from the basis
    amplitudes — Y at full res (p=0), Cb/Cr called at half res."""
    import numpy as np

    s4 = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    out = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            a, b, c, d = _jpg420_block_coefs(i, p, bx, by)
            blk = (
                128
                + a
                + b * s4[None, :]
                + c * s4[:, None]
                + d * s4[:, None] * s4[None, :]
            )
            out[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = blk
    return out


def _jpg420_rgb(i: int):
    """The decoded-RGB ground truth: planes by formula, chroma
    replicated 2x2, JFIF YCbCr->RGB with FLOOR(x + 0.5). Amplitude
    bounds keep every channel inside [0, 255], so the decoder's clamp
    can't mask arithmetic bugs."""
    import numpy as np

    w, h = _jpg420_dims(i)
    y = _jpg420_plane(i, 0, w, h).astype(np.float64)
    cb = _jpg420_plane(i, 1, w // 2, h // 2).repeat(2, 0).repeat(2, 1)
    cr = _jpg420_plane(i, 2, w // 2, h // 2).repeat(2, 0).repeat(2, 1)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = np.floor(y + 1.402 * cr + 0.5)
    g = np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5)
    b = np.floor(y + 1.772 * cb + 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _jpg_chroma_qtable():
    """Chroma quant table: same basis positions pinned to step 8, a
    different formula elsewhere so the two DQT tables really differ."""
    import numpy as np

    v = np.arange(8)[:, None]
    u = np.arange(8)[None, :]
    q = 24 + (5 * v + 7 * u) % 16
    for pos in ((0, 0), (0, 4), (4, 0), (4, 4)):
        q[pos] = 8
    return q.astype(np.int64)


def _jpg420_component_tokens(i: int):
    """Tokenize file i into interleaved-MCU order: per MCU the 4 Y
    blocks (2x2 raster), then Cb, then Cr — each component with its
    own DC predictor; returns [(comp, dc_diff, [(run, val), ...])]."""
    import numpy as np

    m = _dct_mat()
    zz = _jpg_zigzag()
    w, h = _jpg420_dims(i)
    planes = [
        _jpg420_plane(i, 0, w, h).astype(np.float64),
        _jpg420_plane(i, 1, w // 2, h // 2).astype(np.float64),
        _jpg420_plane(i, 2, w // 2, h // 2).astype(np.float64),
    ]
    qt = [_jpg_qtable(), _jpg_chroma_qtable(), _jpg_chroma_qtable()]
    prev_dc = [0, 0, 0]
    tokens = []

    def emit(comp: int, bx: int, by: int):
        pl = planes[comp]
        blk = pl[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] - 128.0
        qc = np.round((m @ blk @ m.T) / qt[comp]).astype(np.int64)
        seq = [int(qc[r, c]) for r, c in zz]
        dc_diff = seq[0] - prev_dc[comp]
        prev_dc[comp] = seq[0]
        acs = []
        run = 0
        for v in seq[1:]:
            if v == 0:
                run += 1
            else:
                acs.append((run, v))
                run = 0
        tokens.append((comp, dc_diff, acs))

    for my in range(h // 16):
        for mx in range(w // 16):
            for dy in (0, 1):
                for dx in (0, 1):
                    emit(0, 2 * mx + dx, 2 * my + dy)
            emit(1, mx, my)
            emit(2, mx, my)
    return tokens


def _write_jpg420s_impl(n: int = _N_JPG420) -> str:
    """Write n REAL 4:2:0 color JPEGs: two DQT tables, a 3-component
    SOF0 (Y sampling 2x2, chroma 1x1), four DHT tables (DC/AC x
    luma/chroma, per-file optimal), and the interleaved MCU scan."""
    import struct

    root = os.path.join(tracked_mkdtemp(prefix="mm_jpg420_"), "jpgs")
    os.makedirs(root, exist_ok=True)
    zz = _jpg_zigzag()
    ql, qc = _jpg_qtable(), _jpg_chroma_qtable()
    for i in range(n):
        w, h = _jpg420_dims(i)
        tokens = _jpg420_component_tokens(i)
        freqs = {  # (class, table): frequency dict
            (0, 0): {}, (1, 0): {}, (0, 1): {}, (1, 1): {}
        }
        for comp, dc_diff, acs in tokens:
            tb = 0 if comp == 0 else 1
            size, _ = _jpg_mag_bits(dc_diff)
            freqs[(0, tb)][size] = freqs[(0, tb)].get(size, 0) + 1
            for run, v in acs:
                while run > 15:
                    freqs[(1, tb)][0xF0] = freqs[(1, tb)].get(0xF0, 0) + 1
                    run -= 16
                size, _ = _jpg_mag_bits(v)
                sym = (run << 4) | size
                freqs[(1, tb)][sym] = freqs[(1, tb)].get(sym, 0) + 1
            freqs[(1, tb)][0x00] = freqs[(1, tb)].get(0x00, 0) + 1
        specs = {
            k: _huff_spec(_huff_lengths(f)) for k, f in freqs.items()
        }
        codes = {
            k: _canonical_codes(bits, vals)
            for k, (bits, vals) in specs.items()
        }
        bw = _JpgBitWriter()
        for comp, dc_diff, acs in tokens:
            tb = 0 if comp == 0 else 1
            size, mag = _jpg_mag_bits(dc_diff)
            code, length = codes[(0, tb)][size]
            bw.write(code, length)
            if size:
                bw.write(mag, size)
            for run, v in acs:
                while run > 15:
                    code, length = codes[(1, tb)][0xF0]
                    bw.write(code, length)
                    run -= 16
                size, mag = _jpg_mag_bits(v)
                code, length = codes[(1, tb)][(run << 4) | size]
                bw.write(code, length)
                bw.write(mag, size)
            code, length = codes[(1, tb)][0x00]
            bw.write(code, length)
        scan = bw.flush()

        dqt = (
            b"\xff\xdb"
            + struct.pack(">H", 2 + 65 + 65)
            + bytes([0x00])
            + bytes(int(ql[r, c]) for r, c in zz)
            + bytes([0x01])
            + bytes(int(qc[r, c]) for r, c in zz)
        )
        sof = (
            b"\xff\xc0"
            + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + bytes((1, 0x22, 0))  # Y: 2x2 sampling, quant table 0
            + bytes((2, 0x11, 1))  # Cb
            + bytes((3, 0x11, 1))  # Cr
        )
        dht_parts = []
        for (cls, tb), (bits, vals) in sorted(specs.items()):
            dht_parts.append(
                bytes([(cls << 4) | tb]) + bytes(bits) + bytes(vals)
            )
        dht_body = b"".join(dht_parts)
        dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dht_body)) + dht_body
        sos = (
            b"\xff\xda"
            + struct.pack(">HB", 12, 3)
            + bytes((1, 0x00, 2, 0x11, 3, 0x11))
            + bytes((0, 63, 0))
        )
        with open(os.path.join(root, f"img_{i:04d}.jpg"), "wb") as fh:
            fh.write(
                b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
            )
    return root


def _write_jpg420s(n: int = _N_JPG420) -> str:
    """Memoized per process — the corpus is a pure function of n."""
    return memoized_asset_dir(("jpg420s", n), lambda: _write_jpg420s_impl(n))


def decode_jpeg420(content: bytes):
    """REAL 4:2:0 color JPEG decoder: 3-component SOF0 with 2x2/1x1
    sampling, two DQT tables, four DHT tables, interleaved MCU entropy
    decode with per-component DC prediction, dequant + dezigzag +
    float IDCT per block, chroma 2x2 replication upsample, and JFIF
    YCbCr->RGB with FLOOR(x + 0.5). Returns (h, w, 3) uint8 RGB.
    Raises on progressive or other sampling layouts."""
    import struct

    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    sof = None
    scan_comp = None
    scan_start = None
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = content[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", content, pos + 2)[0]
        body = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables")
                qtables[pq_tq & 15] = list(body[off + 1 : off + 65])
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                huff[(tc_th >> 4, tc_th & 15)] = _canonical_codes(bits, vals)
                off += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nf != 3:
                raise NotImplementedError("only 8-bit 3-component")
            comps = []
            for k in range(3):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 15, tq))
            if comps[0][1:3] != (2, 2) or any(
                c[1:3] != (1, 1) for c in comps[1:]
            ):
                raise NotImplementedError("only 4:2:0 sampling")
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline SOF0 supported")
        elif marker == 0xDA:
            ns = body[0]
            if ns != 3:
                raise NotImplementedError("expected 3-component scan")
            scan_comp = {
                body[1 + 2 * k]: (
                    body[2 + 2 * k] >> 4,
                    body[2 + 2 * k] & 15,
                )
                for k in range(ns)
            }
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if sof is None or scan_start is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    if h % 16 or w % 16:
        raise NotImplementedError("partial-MCU dimensions")
    eoi = content.rindex(b"\xff\xd9")
    reader = _JpgBitReader(content[scan_start:eoi])
    zz = _jpg_zigzag()
    m = _dct_mat()
    planes = [
        np.zeros((h, w), dtype=np.float64),
        np.zeros((h // 2, w // 2), dtype=np.float64),
        np.zeros((h // 2, w // 2), dtype=np.float64),
    ]
    prev_dc = [0, 0, 0]

    def read_block(ci: int, bx: int, by: int):
        cid, _hs, _vs, tq = comps[ci]
        dc_codes = huff[(0, scan_comp[cid][0])]
        ac_codes = huff[(1, scan_comp[cid][1])]
        q_zz = qtables[tq]
        size = _huff_decode(reader, dc_codes)
        diff = reader.bits(size) if size else 0
        if size and diff < (1 << (size - 1)):
            diff += 1 - (1 << size)
        prev_dc[ci] += diff
        seq = [0] * 64
        seq[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = _huff_decode(reader, ac_codes)
            if sym == 0x00:
                break
            run, size = sym >> 4, sym & 15
            if size == 0:
                if run != 15:
                    raise ValueError("invalid AC symbol")
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("AC run overflows block")
            v = reader.bits(size)
            if v < (1 << (size - 1)):
                v += 1 - (1 << size)
            seq[k] = v
            k += 1
        coef = np.zeros((8, 8), dtype=np.float64)
        for idx, (r, c) in enumerate(zz):
            coef[r, c] = seq[idx] * q_zz[idx]
        planes[ci][
            8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8
        ] = m.T @ coef @ m + 128.0

    for my in range(h // 16):
        for mx in range(w // 16):
            for dy in (0, 1):
                for dx in (0, 1):
                    read_block(0, 2 * mx + dx, 2 * my + dy)
            read_block(1, mx, my)
            read_block(2, mx, my)
    y = planes[0]
    cb = planes[1].repeat(2, 0).repeat(2, 1) - 128.0
    cr = planes[2].repeat(2, 0).repeat(2, 1) - 128.0
    r = np.floor(y + 1.402 * cr + 0.5)
    g = np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5)
    b = np.floor(y + 1.772 * cb + 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _jpg420_oracle_sql() -> str:
    """Generate the closed-form oracle: per pixel, the three plane
    values from the block-basis formulas (chroma at half-res
    coordinates), then the same JFIF FLOOR(x+0.5) color convert the
    decoder applies — the SQL expression tree mirrors the numpy one
    left-associatively so every double op is bit-identical."""

    def s4(expr: str) -> str:
        return f"(CASE WHEN ({expr}) % 8 IN (0, 3, 4, 7) THEN 1 ELSE -1 END)"

    def plane(p: int, xe: str, ye: str) -> str:
        bx, by = f"(({xe}) // 8)", f"(({ye}) // 8)"
        return (
            f"(128 + ((5 * i + 3 * {bx} + 2 * {by} + {11 * p}) % 64 - 32)"
            f" + {s4(xe)} * ((7 * i + {bx} + 3 * {by} + {5 * p}) % 16 - 8)"
            f" + {s4(ye)} * ((11 * i + 2 * {bx} + {by} + {3 * p}) % 16 - 8)"
            f" + {s4(xe)} * {s4(ye)}"
            f" * ((3 * i + {bx} + {by} + {p}) % 8 - 4))"
        )

    yv = plane(0, "x", "y")
    cb = plane(1, "x // 2", "y // 2")
    cr = plane(2, "x // 2", "y // 2")
    return f"""
    WITH imgs AS (
      SELECT range AS i, 16 * (1 + range % 2) AS w,
             16 * (1 + range % 3) AS h
      FROM range(12)
    ),
    px AS (
      SELECT i, w, h, gx.x AS x, gy.y AS y
      FROM imgs
      CROSS JOIN (SELECT range AS x FROM range(32)) gx
      CROSS JOIN (SELECT range AS y FROM range(48)) gy
      WHERE gx.x < w AND gy.y < h
    ),
    rgb AS (
      SELECT i, w, h, x, y,
        CAST(FLOOR({yv} + 1.402 * ({cr} - 128) + 0.5) AS BIGINT) AS r,
        CAST(FLOOR({yv} - 0.344136 * ({cb} - 128)
                   - 0.714136 * ({cr} - 128) + 0.5) AS BIGINT) AS g,
        CAST(FLOOR({yv} + 1.772 * ({cb} - 128) + 0.5) AS BIGINT) AS b
      FROM px
    )
    SELECT 'img_' || lpad(i::VARCHAR, 4, '0') || '.jpg' AS file_name,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           round(SUM(r)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_r,
           round(SUM(g)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_g,
           round(SUM(b)::DOUBLE / (MAX(w) * MAX(h)), 4) AS mean_b,
           CAST(SUM(CASE WHEN (2 * r + 5 * g + b) // 8 > 127
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bright,
           CAST(SUM((x + 2 * y) * g) AS BIGINT) AS xy_weighted_g
    FROM rgb GROUP BY 1
    """


@register(
    "multimodal_decode_jpeg420",
    oracle=_jpg420_oracle_sql(),
    tier="P3",
)
def multimodal_decode_jpeg420(spark, t):
    """Color image decode over REAL 4:2:0 chroma-subsampled JPEGs —
    the full production JPEG shape on top of the grayscale baseline:
    interleaved 16x16 MCUs (4 Y + Cb + Cr blocks), separate
    luma/chroma quant and Huffman tables, per-component DC predictors,
    chroma replication upsample, and the JFIF YCbCr->RGB convert. The
    per-plane rational-basis corpus keeps the lossy pipeline bit-exact
    (grayscale section comment), and the color convert is pinned to
    FLOOR(x + 0.5) so no rounding-mode seam exists; the oracle
    regenerates decoded RGB from the closed-form plane formulas.

    One wrong bit anywhere — a swapped chroma table, a DC predictor
    shared across components, an MCU ordered Cb-before-Y — corrupts
    the stream or the colors and cannot hash-match. ``xy_weighted_g``
    is asymmetric in x/y; exact integer channel sums in the UDF, 4-dp
    means JVM-side.

    Scale: identical posture to every decode stage — one binaryFile
    scan, per-asset decode in Arrow-batched ``mapInPandas``, one row
    per asset; libjpeg-turbo swaps in at production scale with the
    Spark plumbing unchanged.
    """
    return _jpg420_features_frame(spark, _write_jpg420s())


def _jpg420_features_frame(spark, root: str):
    """The decode+features stage of ``multimodal_decode_jpeg420`` over
    any 4:2:0 JPEG directory — split out so tools/scaling.py's K-probe
    measures the registered operator's exact plan."""
    import numpy as np

    raw = spark.read.format("binaryFile").load(f"{root}/*.jpg")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "n_bright": [], "xy_weighted_g": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                im = decode_jpeg420(content)
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


#: VAD frame size (samples) and the energy gate: a frame is "voiced"
#: when its mean square >= 65536^2/12 (the uniform-amplitude
#: expectation), i.e. 12*sum_sq >= n_in_frame * 4294967296 — an exact
#: integer comparison on both engines.
_VAD_FRAME = 256
_VAD_GATE = 4294967296  # 65536^2


@register(
    "multimodal_audio_rms_vad",
    oracle=f"""
    WITH clips AS (
      SELECT range AS i, 240 + 97 * range AS n FROM range(16)
    ),
    s AS (
      SELECT i, g.t // {_VAD_FRAME} AS frame_idx,
             (7919 * i + 2027 * g.t) % 65536 - 32768 AS v
      FROM clips
      CROSS JOIN (SELECT range AS t FROM range(1696)) g
      WHERE g.t < n
    ),
    fr AS (
      SELECT i, frame_idx, COUNT(*) AS nf, SUM(v * v) AS ssq
      FROM s GROUP BY i, frame_idx
    ),
    vd AS (
      SELECT i, frame_idx, ssq,
             CASE WHEN 12 * ssq >= nf * {_VAD_GATE}
                  THEN 1 ELSE 0 END AS voiced
      FROM fr
    ),
    runs AS (
      SELECT i,
             frame_idx - row_number() OVER (PARTITION BY i
                                            ORDER BY frame_idx) AS grp
      FROM vd WHERE voiced = 1
    ),
    longest AS (
      SELECT i, MAX(cnt) AS longest_run FROM (
        SELECT i, grp, COUNT(*) AS cnt FROM runs GROUP BY i, grp
      ) GROUP BY i
    )
    SELECT 'clip_' || lpad(c.i::VARCHAR, 4, '0') || '.wav' AS file_name,
           CAST(COUNT(vd.frame_idx) AS INT) AS n_frames,
           CAST(SUM(vd.voiced) AS INT) AS n_voiced,
           CAST(COALESCE(MAX(l.longest_run), 0) AS INT) AS longest_run,
           CAST(SUM(vd.ssq) AS BIGINT) AS total_energy
    FROM clips c
    JOIN vd ON vd.i = c.i
    LEFT JOIN longest l ON l.i = c.i
    GROUP BY c.i
    """,
    tier="P3",
)
def multimodal_audio_rms_vad(spark, t):
    """RMS-energy VOICE-ACTIVITY DETECTION over real WAV files — the
    speech-data curation screen (how much of this clip is signal vs
    silence?) run entirely on exact integers: the independent RIFF
    parser (``decode_wav_pcm16``, same decoder the other audio ops
    trust) splits each clip into 256-sample frames, a frame is voiced
    when its mean-square energy clears the uniform-amplitude gate
    (12*sum_sq >= n*65536^2 — integer algebra, no float RMS), and each
    file reports frame/voiced counts, the LONGEST voiced run
    (gaps-and-islands over frame flags — the segment a speech pipeline
    would keep) and total energy. Extends ``multimodal_audio_frames``
    (per-frame features) with the decision layer on top.

    The oracle regenerates the PCM signal from its generative formula
    and replays frame grouping + the run-length window in SQL — a hash
    match proves decode, framing, the energy gate and the island
    arithmetic all agree bit-exactly. Scale: one binaryFile scan,
    per-batch numpy, one output row per clip.
    """
    import numpy as np

    root = _write_wavs()
    raw = spark.read.format("binaryFile").load(f"{root}/*.wav")

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [], "n_frames": [], "n_voiced": [],
                "longest_run": [], "total_energy": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                _, s = decode_wav_pcm16(content)
                v = s.astype(np.int64)
                nfr = (len(v) + _VAD_FRAME - 1) // _VAD_FRAME
                flags, total = [], 0
                for k in range(nfr):
                    fr = v[k * _VAD_FRAME:(k + 1) * _VAD_FRAME]
                    ssq = int((fr * fr).sum())
                    total += ssq
                    flags.append(12 * ssq >= len(fr) * _VAD_GATE)
                longest = cur = 0
                for fl in flags:
                    cur = cur + 1 if fl else 0
                    longest = max(longest, cur)
                out["file_name"].append(path.rsplit("/", 1)[-1])
                out["n_frames"].append(nfr)
                out["n_voiced"].append(int(sum(flags)))
                out["longest_run"].append(longest)
                out["total_energy"].append(total)
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(
        vad,
        schema="file_name string, n_frames int, n_voiced int, "
        "longest_run int, total_energy long",
    )
