"""Versioned-table (lakehouse) operators — transaction log, CoW MERGE,
time travel, zone-map file skipping (SURVEY.md §2-L, round-3 wave).

The sandbox ships no Delta/Iceberg package (VERDICT r2 "What's missing"
#1: a real splio-style ETL hits table-format MERGE first), so this
module implements the *mechanism* those formats provide on plain
parquet + a JSON transaction log — the same architecture at miniature
scale:

- ``_log/{N:08d}.json`` — one commit per version: ``adds`` (relative
  file path, row count, per-column min/max zone maps) and ``removes``.
  A snapshot at version V is the replay of commits 0..V. Commits are
  atomic via write-to-temp + ``os.replace``; a pre-existing target
  version file raises (optimistic concurrency — the put-if-absent
  primitive real formats get from HDFS/ABFS rename or an S3 lock
  service).
- Zone maps come from the **parquet footers** (pyarrow metadata), not
  an extra Spark job — exactly how production formats collect file
  stats, O(files) driver-side footer reads and zero data scan.
- Copy-on-write MERGE rewrites ONLY the files whose key zone map
  overlaps the changed-key range; untouched files survive by reference.
  At 100 TB this is the difference between rewriting ~1/N of the table
  and all of it.
- All money flows as integer cents (``o_cents`` BIGINT); sums are exact
  bigints cross-engine, so the hash checks carry zero float risk.

Scale notes: the log is O(files) JSON on the driver — real formats
checkpoint it (Delta's _last_checkpoint / Iceberg manifests) once file
counts reach millions; the snapshot replay and pruning logic below is
the same shape. Data is never collected to the driver: commits write
with Spark, stats come from footers, reads are ``spark.read.parquet``
over the pruned live-file list.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import uuid

from pyspark.sql import functions as F

from ..registry import register
from ..sources.tmpdirs import tracked_mkdtemp

# ---------------------------------------------------------------- core


class ConcurrentCommit(RuntimeError):
    """Raised when the target log version already exists (lost race)."""


def _log_dir(root: str) -> str:
    return os.path.join(root, "_log")


def _commit(
    root: str,
    version: int,
    adds: list[dict],
    removes: list[str],
    txn: dict | None = None,
) -> None:
    """Atomically publish a commit: temp file + rename, put-if-absent.
    ``txn`` is optional application-transaction metadata (Delta's
    ``txn`` action: {"appId": ..., "batchId": ...}) letting idempotent
    writers ask "did MY write land?" independently of the version
    number it landed at."""
    os.makedirs(_log_dir(root), exist_ok=True)
    target = os.path.join(_log_dir(root), f"{version:08d}.json")
    entry = {"version": version, "adds": adds, "removes": removes}
    if txn is not None:
        entry["txn"] = txn
    # Unique tmp per writer: a shared `target + ".tmp"` lets two racing
    # writers clobber each other's staging file before either publishes.
    fd, tmp = tempfile.mkstemp(
        dir=_log_dir(root), prefix=f"{version:08d}.", suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(entry, fh)
        # os.link is the atomic put-if-absent: it fails (never
        # overwrites) when the target exists, unlike os.replace —
        # check-then-replace would let the loser silently clobber the
        # winner's committed JSON. This is the single primitive the OCC
        # layer and the exactly-once streaming sink both stand on.
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise ConcurrentCommit(
                f"version {version} already committed"
            ) from None
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


def _txn_committed(root: str, app_id: str, batch_id: int) -> bool:
    """True if this (appId, batchId) txn action already landed. Two
    sources, matching Delta's contract: the newest checkpoint's
    carried-forward ``txns`` map (highest batchId per appId — batch ids
    are monotonic per writer, so ``batch_id <= last`` means replayed),
    then the retained log tail's per-commit txn actions. Carrying the
    map through checkpoints means archiving pre-checkpoint segments
    (lake_log_checkpoint) can never make a delayed replay look new and
    double-commit its rows. O(log segments) JSON reads, no data
    access."""
    d = _log_dir(root)
    if not os.path.isdir(d):
        return False
    cks = _checkpoints(root)
    if cks:
        with open(
            os.path.join(d, f"{cks[-1]:08d}.checkpoint.json")
        ) as fh:
            last = json.load(fh).get("txns", {}).get(app_id)
        if last is not None and batch_id <= last:
            return True
    for v in _versions(root):
        with open(os.path.join(d, f"{v:08d}.json")) as fh:
            txn = json.load(fh).get("txn")
        if txn and txn.get("appId") == app_id and txn.get("batchId") == batch_id:
            return True
    return False


def sink_commit(
    root: str, app_id: str, batch_id: int, df, stat_cols: list[str]
) -> int | None:
    """Idempotent streaming commit for foreachBatch sinks, safe on a
    table SHARED with other writers: skip (before writing anything — a
    replay overwrite would wipe the committed files) when this
    (appId, batchId) already landed, else publish version-independent
    data files and claim the next free version, carrying the txn
    action. A competing commit between the version probe and the
    rename just moves the claim forward — batch ids and versions are
    decoupled, unlike the version==batchId scheme, which corrupts the
    mapping the moment an interleaved writer takes a version number.
    Each ATTEMPT writes to its own directory (the miniature of Delta's
    UUID part names): a duplicate attempt that loses can never clobber
    the winner's committed files — its directory just becomes an
    unreferenced orphan, exactly what lake_vacuum_retention reclaims.
    Returns the committed version, or None for a replayed no-op."""
    if _txn_committed(root, app_id, batch_id):
        return None
    # Collision-free by construction (uuid suffix), not probed: two
    # concurrent replays of the same (appId, batchId) could both find
    # the same "next free" index and overwrite each other's files
    # mid-write — the committed winner would then reference files the
    # loser clobbered.
    attempt = uuid.uuid4().hex[:12]
    adds = _write_files(
        df, root, f"txn-{app_id}-{batch_id}-a{attempt}", stat_cols
    )
    version = _latest_version(root) + 1
    while True:
        try:
            _commit(
                root, version, adds, [],
                txn={"appId": app_id, "batchId": batch_id},
            )
            return version
        except ConcurrentCommit:
            if _txn_committed(root, app_id, batch_id):
                return None  # a parallel replay of this very batch won
            version = _latest_version(root) + 1


_COMMIT_RE = re.compile(r"^(\d{8})\.json$")


def _versions(root: str) -> list[int]:
    d = _log_dir(root)
    if not os.path.isdir(d):  # no commits yet: an empty table, not an error
        return []
    # Strict name match: foreign markers a tool may drop in _log (e.g. a
    # _last_checkpoint.json) and leftover *.tmp staging files must not
    # break every snapshot read with a ValueError.
    return sorted(
        int(m.group(1))
        for f in os.listdir(d)
        if (m := _COMMIT_RE.match(f))
    )


def _latest_version(root: str) -> int:
    """Newest version the log knows about: the retained commit files OR
    a checkpoint whose source segments were archived — whichever is
    higher. Allocating the next version from commit files alone would,
    after log truncation, re-issue version 0 *below* the checkpoint and
    corrupt history (caught by
    test_lake_checkpoint_carries_txn_map_past_truncation). -1 when the
    table is empty."""
    vs = _versions(root)
    cks = _checkpoints(root)
    return max(vs[-1] if vs else -1, cks[-1] if cks else -1)


_CHECKPOINT_RE = re.compile(r"^(\d{8})\.checkpoint\.json$")


def _checkpoints(root: str) -> list[int]:
    d = _log_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(m.group(1))
        for f in os.listdir(d)
        if (m := _CHECKPOINT_RE.match(f))
    )


def _txn_map(root: str, version: int) -> dict[str, int]:
    """Highest batchId per appId over commits 0..version, seeded from
    the newest prior checkpoint's map (whose source segments may
    already be archived)."""
    txns: dict[str, int] = {}
    start = 0
    usable = [c for c in _checkpoints(root) if c <= version]
    if usable:
        with open(
            os.path.join(_log_dir(root), f"{usable[-1]:08d}.checkpoint.json")
        ) as fh:
            txns = dict(json.load(fh).get("txns", {}))
        start = usable[-1] + 1
    for v in _versions(root):
        if v < start or v > version:
            continue
        with open(os.path.join(_log_dir(root), f"{v:08d}.json")) as fh:
            txn = json.load(fh).get("txn")
        if txn:
            app = txn["appId"]
            txns[app] = max(txns.get(app, -1), txn["batchId"])
    return txns


def _write_checkpoint(root: str, version: int) -> None:
    """Consolidate the live set as of ``version`` into one file, so
    later snapshot resolution replays only the commits AFTER it — the
    O(commits) → O(commits-since-checkpoint) fix real formats ship
    (Delta's _last_checkpoint, Iceberg's manifest lists). Also carries
    the accumulated {appId: max batchId} txn map forward, as Delta
    checkpoints carry setTransaction actions — without it, archiving
    pre-checkpoint segments would erase idempotence history and let a
    delayed batch replay double-commit (see _txn_committed)."""
    live = _snapshot(root, version)
    txns = _txn_map(root, version)
    target = os.path.join(_log_dir(root), f"{version:08d}.checkpoint.json")
    fd, tmp = tempfile.mkstemp(dir=_log_dir(root), suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump({"version": version, "live": live, "txns": txns}, fh)
    os.replace(tmp, target)


def _snapshot(root: str, version: int | None = None) -> list[dict]:
    """Resolve the live adds at ``version`` (default latest): start from
    the newest checkpoint at or before it, then replay only the later
    commits."""
    live: dict[str, dict] = {}
    start = 0
    usable = [
        c for c in _checkpoints(root) if version is None or c <= version
    ]
    if usable:
        ck = usable[-1]
        with open(
            os.path.join(_log_dir(root), f"{ck:08d}.checkpoint.json")
        ) as fh:
            live = {a["path"]: a for a in json.load(fh)["live"]}
        start = ck + 1
    for v in _versions(root):
        if v < start:
            continue
        if version is not None and v > version:
            break
        with open(os.path.join(_log_dir(root), f"{v:08d}.json")) as fh:
            entry = json.load(fh)
        for rel in entry["removes"]:
            live.pop(rel, None)
        for add in entry["adds"]:
            live[add["path"]] = add
    return list(live.values())


def _footer_stats(path: str, stat_cols: list[str]) -> tuple[int, dict]:
    """Row count + per-column [min, max] from the parquet footer only."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if name not in stat_cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            if name not in mins or st.min < mins[name]:
                mins[name] = st.min
            if name not in maxs or st.max > maxs[name]:
                maxs[name] = st.max

    def _plain(v):
        return v if isinstance(v, (int, float, str)) else str(v)

    stats = {
        c: [_plain(mins[c]), _plain(maxs[c])] for c in stat_cols if c in mins
    }
    return md.num_rows, stats


def _write_files(
    df, root: str, version: int | str, stat_cols: list[str]
) -> list[dict]:
    """Write a commit's data files under data/v{N}/ (or data/{label}/ for
    version-independent transactional writes) and footer-scan them."""
    rel_dir = os.path.join(
        "data", version if isinstance(version, str) else f"v{version:06d}"
    )
    out = os.path.join(root, rel_dir)
    df.write.mode("overwrite").parquet(out)
    adds = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        rows, stats = _footer_stats(os.path.join(out, f), stat_cols)
        adds.append(
            {"path": os.path.join(rel_dir, f), "rows": rows, "stats": stats}
        )
    return adds


def _read_version(spark, root: str, version: int | None = None, **opts):
    paths = [os.path.join(root, a["path"]) for a in _snapshot(root, version)]
    reader = spark.read
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.parquet(*paths)


def _prune_files(adds: list[dict], key: str, lo, hi) -> list[dict]:
    """Zone-map pruning: keep files whose [min,max] overlaps [lo,hi]."""
    kept = []
    for a in adds:
        st = a["stats"].get(key)
        if st is None:  # no stats → cannot skip, must read
            kept.append(a)
            continue
        if not (st[1] < lo or st[0] > hi):
            kept.append(a)
    return kept


def _key_bounds(adds: list[dict], key: str) -> tuple[int, int]:
    mins = [a["stats"][key][0] for a in adds if key in a["stats"]]
    maxs = [a["stats"][key][1] for a in adds if key in a["stats"]]
    return min(mins), max(maxs)


# --------------------------------------- optimistic transactions (OCC)


class CommitConflict(RuntimeError):
    """A concurrent commit invalidated this transaction's read set —
    the caller must re-run its logic on a fresh snapshot (Delta's
    ConcurrentAppend / ConcurrentDeleteRead semantics)."""


class Txn:
    """Optimistic-concurrency transaction over the JSON log: snapshot
    isolation while reading, write-serializable validation at commit.

    The transaction records its READ SET — the key-predicate ranges it
    scanned plus the concrete files zone-map pruning handed it — and
    its intended ``adds``/``removes``. ``commit()`` validates every
    commit that landed after the transaction's snapshot:

    - a later commit REMOVED a file this txn read or also removes →
      ``CommitConflict`` (concurrent-delete-read / write-write: the
      computation consumed data that no longer exists);
    - a later commit ADDED a file whose key zone map overlaps any read
      range → ``CommitConflict`` (phantom append: "no rows in my
      range" was observed, then rows appeared — the anomaly
      serializability forbids);
    - otherwise the intervening commits are disjoint from everything
      this txn depends on, and the commit REBASES: it retries at
      ``latest+1`` until the put-if-absent rename wins.

    This is the same validation real formats run driver-side: O(log
    entries since snapshot) JSON reads against O(read set) ranges — no
    data is scanned to decide a conflict, so validation cost is
    independent of table size.
    """

    def __init__(self, root: str):
        self.root = root
        self.read_version = _latest_version(root)
        self.read_files: set[str] = set()
        self.read_ranges: list[tuple[int, int]] = []
        self.adds: list[dict] = []
        self.removes: list[str] = []

    def read_range(self, spark, lo: int, hi: int):
        """Zone-map-pruned read of ``[lo, hi]`` at the txn's snapshot.
        Records the predicate range even when pruning yields no files:
        the *absence* of rows is an observation later appends can
        invalidate. Returns None for the empty-by-pruning case."""
        live = _snapshot(self.root, self.read_version)
        files = _prune_files(live, _KEY, lo, hi)
        self.read_ranges.append((lo, hi))
        self.read_files |= {a["path"] for a in files}
        if not files:
            return None
        return spark.read.parquet(
            *[os.path.join(self.root, a["path"]) for a in files]
        ).filter((F.col(_KEY) >= lo) & (F.col(_KEY) <= hi))

    def write(self, df, tag: str) -> None:
        """Stage a data write under ``data/txn-{tag}/`` — file names are
        version-independent (like Delta's GUID part files), so a rebase
        republishes the same files under a later version untouched."""
        self.adds.extend(_write_files(df, self.root, f"txn-{tag}", [_KEY]))

    def commit(self) -> int:
        """Validate against intervening commits, then publish atomically.
        Returns the committed version; raises CommitConflict if any
        intervening commit intersects the read set."""
        while True:
            latest = _latest_version(self.root)
            for v in range(self.read_version + 1, latest + 1):
                with open(
                    os.path.join(_log_dir(self.root), f"{v:08d}.json")
                ) as fh:
                    entry = json.load(fh)
                clash = set(entry["removes"]) & (
                    set(self.removes) | self.read_files
                )
                if clash:
                    raise CommitConflict(
                        f"v{v} removed file(s) this txn read or rewrites: "
                        f"{sorted(clash)[:3]}"
                    )
                for a in entry["adds"]:
                    st = a["stats"].get(_KEY)
                    for lo, hi in self.read_ranges:
                        # no stats → cannot prove disjoint → conflict
                        if st is None or not (st[1] < lo or st[0] > hi):
                            raise CommitConflict(
                                f"v{v} added {a['path']} into read range "
                                f"[{lo}, {hi}]"
                            )
            try:
                _commit(self.root, latest + 1, self.adds, self.removes)
                return latest + 1
            except ConcurrentCommit:
                continue  # lost the rename race; re-validate and retry


# ------------------------------------------------------ the demo lake
#
# One shared builder so every operator exercises the same commit path.
# v0: orders (o_orderkey, o_orderpriority, o_cents, src='base'), 8 files
#     range-partitioned on o_orderkey — disjoint zone maps.
# v1: one copy-on-write MERGE commit:
#       DELETE  keys in the top decile   (o_orderkey >  hicut)
#       UPDATE  keys in the bottom decile (o_orderkey <= locut):
#               cents += cents div 10 (+10 % floored to the cent), src='updated'
#       INSERT  shifted keys (o_orderkey + mx) for o_orderkey % 97 = 0,
#               src='inserted'
#     Only files overlapping the two touched deciles are rewritten; the
#     middle ~3/4 of the files carry over by log reference.

_KEY = "o_orderkey"


def _base_frame(t):
    return t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("o_cents"),
        F.lit("base").alias("src"),
    )


def _build_v0(spark, t, root: str, n_files: int = 8):
    df = _base_frame(t).repartitionByRange(n_files, F.col(_KEY))
    adds = _write_files(df, root, 0, [_KEY])
    _commit(root, 0, adds, [])


def _merge_v1(spark, root: str):
    """The CoW MERGE commit described above, run as an OCC transaction
    (read set: the two modified deciles plus the insert-source full
    span; removes: the decile-overlapping files) — so a writer that
    raced this merge into the log would surface as CommitConflict
    instead of silently merging over a stale snapshot. Returns
    (locut, hicut, mx)."""
    txn = Txn(root)
    live = _snapshot(root, txn.read_version)
    mn, mx = _key_bounds(live, _KEY)
    locut = mn + (mx - mn) // 10
    hicut = mx - (mx - mn) // 10

    # files whose key range touches either modified decile — recorded
    # as the txn's read ranges so the conflict check guards them
    touched = {
        a["path"]
        for a in _prune_files(live, _KEY, mn, locut)
        + _prune_files(live, _KEY, hicut + 1, mx)
    }
    txn.read_ranges += [(mn, locut), (hicut + 1, mx)]
    txn.read_files |= touched
    untouched = [a for a in live if a["path"] not in touched]
    touched_paths = [os.path.join(root, p) for p in sorted(touched)]

    spark_df = spark.read.parquet(*touched_paths)
    rewritten = (
        spark_df.filter(F.col(_KEY) <= F.lit(hicut))  # DELETE top decile
        .withColumn(
            "src",
            F.when(F.col(_KEY) <= F.lit(locut), F.lit("updated")).otherwise(
                F.col("src")
            ),
        )
        .withColumn(
            "o_cents",
            F.when(
                F.col(_KEY) <= F.lit(locut),
                F.col("o_cents") + F.expr("o_cents div 10"),
            ).otherwise(F.col("o_cents")),
        )
    )
    inserts = (
        _read_version(spark, root, 0)
        .filter(F.col(_KEY) % 97 == 0)
        .select(
            (F.col(_KEY) + F.lit(mx)).alias(_KEY),
            "o_orderpriority",
            "o_cents",
            F.lit("inserted").alias("src"),
        )
    )
    txn.read_ranges.append((mn, mx))  # the insert-source full-span read
    adds = _write_files(rewritten.unionByName(inserts), root, 1, [_KEY])
    txn.adds = adds
    txn.removes = sorted(touched)
    committed = txn.commit()
    assert committed == 1, f"merge expected v1, got v{committed}"
    assert untouched, "CoW degenerated to full rewrite on this layout"
    return locut, hicut, mx


def _demo_lake(spark, t) -> str:
    root = tracked_mkdtemp(prefix="lake_")
    _build_v0(spark, t, root)
    _merge_v1(spark, root)
    return root


# SQL fragment shared by the oracles: the v1 final state, reconstructed
# relationally (DuckDB // is floor division; keys are positive).
_V1_SQL = """
    bounds AS (
      SELECT min(o_orderkey) + (max(o_orderkey) - min(o_orderkey)) // 10
               AS locut,
             max(o_orderkey) - (max(o_orderkey) - min(o_orderkey)) // 10
               AS hicut,
             max(o_orderkey) AS mx
      FROM orders
    ),
    base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
      FROM orders
    ),
    v1 AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey <= (SELECT locut FROM bounds)
                  THEN o_cents + o_cents // 10 ELSE o_cents END AS o_cents,
             CASE WHEN o_orderkey <= (SELECT locut FROM bounds)
                  THEN 'updated' ELSE 'base' END AS src
      FROM base
      WHERE o_orderkey <= (SELECT hicut FROM bounds)
      UNION ALL
      SELECT o_orderkey + (SELECT mx FROM bounds), o_orderpriority,
             o_cents, 'inserted'
      FROM base WHERE o_orderkey % 97 = 0
    )
"""


# ------------------------------------------------------------ operators


@register(
    "lake_merge_upsert",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT src, o_orderpriority, COUNT(*) AS n_rows,
           CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM v1 GROUP BY src, o_orderpriority
    """,
    tier="P1",
)
def lake_merge_upsert(spark, t):
    """MERGE INTO on a transaction-logged parquet table, copy-on-write:
    one commit deletes the top key decile, updates the bottom decile
    (+10 % floored to the cent), and inserts key-shifted rows — and
    rewrites ONLY the data files whose footer zone maps overlap the two
    touched deciles (the middle files survive as log references,
    verified in tests/test_units.py). This is the table-format MERGE
    the sandbox's missing Delta/Iceberg would provide, rebuilt on plain
    parquet + an atomic JSON log (module docstring).

    The hash check reads the post-merge snapshot and folds it per
    (src, priority): a dropped untouched file collapses 'base' counts, a
    missed rewrite leaves 'updated' rows absent, a non-atomic commit
    double-counts — every failure mode lands in the aggregate.
    """
    root = _demo_lake(spark, t)
    return (
        _read_version(spark, root)
        .groupBy("src", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_time_travel_read",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT 0 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    UNION ALL
    SELECT 1, COUNT(*), CAST(SUM(o_cents) AS BIGINT) FROM v1
    """,
    tier="P2",
)
def lake_time_travel_read(spark, t):
    """Time travel: the same table read AS OF version 0 and version 1 in
    one query — the log replay stops at the requested version, so the
    pre-merge snapshot stays byte-identical after the merge commits
    (snapshot isolation without copying data). One row per version with
    exact integer-cent totals; the v0 row must equal the raw ``orders``
    fold even though v1 has since deleted/updated/inserted.
    """
    root = _demo_lake(spark, t)

    def fold(version):
        return _read_version(spark, root, version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        ).select("version", "n_rows", "revenue_cents")

    return fold(0).unionByName(fold(1))


@register(
    "lake_change_feed",
    oracle=f"""
    WITH {_V1_SQL},
    v0 AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
      FROM orders
    ),
    cdf AS (
      SELECT CASE WHEN v0.o_orderkey IS NULL THEN 'insert'
                  WHEN v1.o_orderkey IS NULL THEN 'delete'
                  WHEN v1.o_cents <> v0.o_cents THEN 'update'
                  ELSE 'none' END AS change_type,
             COALESCE(v1.o_cents, 0) - COALESCE(v0.o_cents, 0) AS delta
      FROM v0 FULL OUTER JOIN v1 ON v0.o_orderkey = v1.o_orderkey
    )
    SELECT change_type, COUNT(*) AS n_rows,
           CAST(SUM(delta) AS BIGINT) AS delta_cents
    FROM cdf GROUP BY change_type
    """,
    tier="P2",
)
def lake_change_feed(spark, t):
    """Change data feed between two table versions, derived from the
    snapshots themselves: full-outer-join v0 and v1 on the key and
    classify each row insert / delete / update / none, with the exact
    integer-cent revenue delta per class. Formats with a native CDF
    persist this per commit; deriving it from snapshots is the portable
    fallback and costs one key-partitioned shuffle join — scale-safe,
    and the classification totals reconcile the merge end-to-end.
    """
    root = _demo_lake(spark, t)
    v0 = _read_version(spark, root, 0).select(
        _KEY, F.col("o_cents").alias("old_cents")
    )
    v1 = _read_version(spark, root, 1).select(
        _KEY, F.col("o_cents").alias("new_cents")
    )
    joined = v0.join(v1, _KEY, "full_outer")
    return (
        joined.select(
            F.when(F.col("old_cents").isNull(), F.lit("insert"))
            .when(F.col("new_cents").isNull(), F.lit("delete"))
            .when(F.col("new_cents") != F.col("old_cents"), F.lit("update"))
            .otherwise(F.lit("none"))
            .alias("change_type"),
            (
                F.coalesce(F.col("new_cents"), F.lit(0))
                - F.coalesce(F.col("old_cents"), F.lit(0))
            ).alias("delta"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("delta").alias("delta_cents"),
        )
    )


@register(
    "lake_snapshot_rollback",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders GROUP BY o_orderpriority
    """,
    tier="P3",
)
def lake_snapshot_rollback(spark, t):
    """RESTORE TABLE ... TO VERSION 0 as a metadata-only commit: v2
    re-adds v0's file entries and removes v1's — no data file is read,
    copied, or rewritten (asserted in tests/test_units.py), because the
    merge's copy-on-write left v0's files on disk, merely dereferenced.
    The latest-version read must then equal the raw ``orders`` fold
    exactly, erasing the merge from the visible history while keeping
    it in the log (an auditable undo, the operational save that makes
    log-structured tables worth their bookkeeping).
    """
    root = _demo_lake(spark, t)
    v0_adds = _snapshot(root, 0)
    v1_adds = _snapshot(root, 1)
    _commit(root, 2, v0_adds, [a["path"] for a in v1_adds])
    return (
        _read_version(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_zone_map_skip_scan",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM v1
    WHERE o_orderkey BETWEEN
            (SELECT locut FROM bounds) * 3 AND (SELECT locut FROM bounds) * 5
    GROUP BY o_orderpriority
    """,
    tier="P1",
)
def lake_zone_map_skip_scan(spark, t):
    """Zone-map file skipping: a key-range predicate is resolved against
    the log's per-file footer min/max BEFORE Spark plans the scan, so
    the reader opens only the files whose range overlaps the predicate
    (tests assert strictly fewer files than the snapshot holds). This is
    the log-level half of pruning — it removes files from the plan
    entirely, on top of the row-group/page skipping the parquet reader
    already does inside each opened file — and is what keeps a selective
    query on a 100 TB table from listing, opening, or footer-reading a
    million files. The predicate is re-applied in the plan (pruning is
    an overlap test, not an exact filter), and the hash check proves the
    pruned scan returns exactly the unpruned answer.
    """
    root = _demo_lake(spark, t)
    live = _snapshot(root)
    mn, mx = _key_bounds(_snapshot(root, 0), _KEY)
    locut = mn + (mx - mn) // 10
    lo, hi = locut * 3, locut * 5
    pruned = _prune_files(live, _KEY, lo, hi)
    paths = [os.path.join(root, a["path"]) for a in pruned]
    return (
        spark.read.parquet(*paths)
        .filter(F.col(_KEY).between(F.lit(lo), F.lit(hi)))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_compact_small_files",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders GROUP BY o_orderpriority
    """,
    tier="P2",
)
def lake_compact_small_files(spark, t):
    """OPTIMIZE (small-file compaction) as a data-identical commit: v0
    lands as 24 deliberately tiny files (the streaming-ingest pathology
    — every micro-batch a file, footer overhead and task-per-file
    scheduling eating the scan), then one bin-packing commit rewrites
    the table into 4 range-clustered files and removes the 24. The
    read-back fold must equal the raw ``orders`` fold exactly — a
    compaction that loses, duplicates, or reorders-with-collision rows
    lands in the hash. Tests additionally assert the file-count drop
    and that the orphaned 24 become vacuum candidates (unreferenced but
    still on disk until retention expires).
    """
    root = tracked_mkdtemp(prefix="lake_cmp_")
    _build_v0(spark, t, root, n_files=24)
    current = _read_version(spark, root, 0)
    packed = current.repartitionByRange(4, F.col(_KEY))
    adds = _write_files(packed, root, 1, [_KEY])
    _commit(root, 1, adds, [a["path"] for a in _snapshot(root, 0)])
    return (
        _read_version(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_schema_evolution",
    oracle="""
    WITH late AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents,
             CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END
               AS o_channel
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    early AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents,
             CAST(NULL AS VARCHAR) AS o_channel
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT COALESCE(o_channel, 'legacy') AS channel,
           COUNT(*) AS n_rows, CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM (SELECT * FROM early UNION ALL SELECT * FROM late)
    GROUP BY COALESCE(o_channel, 'legacy')
    """,
    tier="P2",
)
def lake_schema_evolution(spark, t):
    """Additive schema evolution: v0 commits the pre-1998 orders without
    a channel column; v1 appends the 1998 orders WITH ``o_channel`` —
    and the snapshot read merges the two physical schemas, null-filling
    the old files (``mergeSchema``, the reader-side half of what a
    format's schema registry would enforce centrally). Additive-only is
    the discipline that stays cheap at scale: old files are never
    rewritten, the new column materializes lazily as NULL. The fold
    groups by channel with the legacy rows surfacing as their own
    bucket, so a reader that dropped either generation or misaligned
    columns fails the hash.
    """
    root = tracked_mkdtemp(prefix="lake_evo_")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    base = t["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("o_cents"),
        "o_orderdate",
    )
    early = base.filter(F.col("o_orderdate") < cut).drop("o_orderdate")
    late = (
        base.filter(F.col("o_orderdate") >= cut)
        .drop("o_orderdate")
        .withColumn(
            "o_channel",
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("web")).otherwise(
                F.lit("store")
            ),
        )
    )
    adds0 = _write_files(
        early.repartitionByRange(4, F.col(_KEY)), root, 0, [_KEY]
    )
    _commit(root, 0, adds0, [])
    adds1 = _write_files(
        late.repartitionByRange(2, F.col(_KEY)), root, 1, [_KEY]
    )
    _commit(root, 1, adds1, [])
    return (
        _read_version(spark, root, mergeSchema="true")
        .select(
            F.coalesce(F.col("o_channel"), F.lit("legacy")).alias("channel"),
            "o_cents",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_merge_on_read",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT src, o_orderpriority, COUNT(*) AS n_rows,
           CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM v1 GROUP BY src, o_orderpriority
    """,
    tier="P2",
)
def lake_merge_on_read(spark, t):
    """The SAME merge as ``lake_merge_upsert``, executed merge-on-read:
    instead of rewriting the overlapping base files (copy-on-write), the
    commit writes a deletion-vector file (the deleted + superseded keys)
    scoped to the base files it covers, plus one new data file carrying
    the updated row versions and the inserts — zero base-file rewrites,
    so the write is O(changes) regardless of how wide the touched files
    are. The reader pays instead: covered base files anti-join the DV
    before unioning the new file (real formats compact DVs back into
    data on a schedule; that path is ``lake_compact_small_files``).

    Both strategies must produce the identical table, so this op shares
    ``lake_merge_upsert``'s oracle verbatim — the hash check IS the
    CoW ≡ MoR equivalence proof. Write-heavy streams want MoR, read-
    heavy analytics want CoW; an engine needs both.
    """
    root = tracked_mkdtemp(prefix="lake_mor_")
    _build_v0(spark, t, root)
    live = _snapshot(root, 0)
    mn, mx = _key_bounds(live, _KEY)
    locut = mn + (mx - mn) // 10
    hicut = mx - (mx - mn) // 10

    covered = sorted(
        {
            a["path"]
            for a in _prune_files(live, _KEY, mn, locut)
            + _prune_files(live, _KEY, hicut + 1, mx)
        }
    )
    base0 = _read_version(spark, root, 0)
    # DV = keys whose base row version must disappear (deleted ∪ updated)
    dv = base0.filter(
        (F.col(_KEY) > F.lit(hicut)) | (F.col(_KEY) <= F.lit(locut))
    ).select(_KEY)
    new_rows = base0.filter(F.col(_KEY) <= F.lit(locut)).select(
        _KEY,
        "o_orderpriority",
        (F.col("o_cents") + F.expr("o_cents div 10")).alias("o_cents"),
        F.lit("updated").alias("src"),
    )
    inserts = base0.filter(F.col(_KEY) % 97 == 0).select(
        (F.col(_KEY) + F.lit(mx)).alias(_KEY),
        "o_orderpriority",
        "o_cents",
        F.lit("inserted").alias("src"),
    )
    dv_adds = _write_files(dv.coalesce(1), root, 1, [_KEY])
    for a in dv_adds:
        a["kind"] = "dv"
        a["applies_to"] = covered
    # the new data rides in its own commit dir (v2 namespace, same commit)
    data_adds = _write_files(new_rows.unionByName(inserts), root, 2, [_KEY])
    _commit(root, 1, dv_adds + data_adds, [])

    # merge-on-read: anti-join the DV into its covered files only
    snap = _snapshot(root)
    dv_paths = [
        os.path.join(root, a["path"]) for a in snap if a.get("kind") == "dv"
    ]
    applies = {
        p for a in snap if a.get("kind") == "dv" for p in a["applies_to"]
    }
    plain = [
        a["path"]
        for a in snap
        if a.get("kind") != "dv" and a["path"] not in applies
    ]
    dv_df = spark.read.parquet(*dv_paths).select(_KEY)
    covered_df = spark.read.parquet(
        *[os.path.join(root, p) for p in sorted(applies)]
    ).join(F.broadcast(dv_df), _KEY, "left_anti")
    rest_df = spark.read.parquet(
        *[os.path.join(root, p) for p in sorted(plain)]
    )
    return (
        covered_df.unionByName(rest_df)
        .groupBy("src", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_zorder_cluster",
    oracle="""
    WITH b AS (
      SELECT min(l_orderkey) AS amn, max(l_orderkey) AS amx,
             min(l_partkey) AS bmn, max(l_partkey) AS bmx
      FROM lineitem
    ),
    boxed AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem, b
      WHERE l_orderkey BETWEEN amn + (amx - amn) * 3 // 8
                           AND amn + (amx - amn) * 4 // 8
        AND l_partkey  BETWEEN bmn + (bmx - bmn) * 2 // 8
                           AND bmn + (bmx - bmn) * 3 // 8
    )
    SELECT l_returnflag, COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM boxed GROUP BY l_returnflag
    """,
    tier="P2",
)
def lake_zorder_cluster(spark, t):
    """Z-order clustering: lineitem written as 16 files clustered by the
    bit-interleave of its two query dimensions (order key × part key),
    so the parquet footers carry TIGHT zone maps on BOTH columns at
    once — a range layout on one key gives perfect pruning on that key
    and none on the other; the Z-curve trades a little of each for
    useful pruning on both. The two-dimensional box query below then
    skips every file whose (order, part) zone maps miss the box
    (tests assert the separation where it actually shows: a predicate
    on the NON-sort dimension prunes nothing under a range layout and
    substantially under Z). At 100 TB this is OPTIMIZE ZORDER
    BY: the one layout decision that serves multi-dimension dashboards
    without duplicating the table per sort key.

    The Z-value is a pure JVM bit expression (scale each key to 8 bits
    over its min-max span, interleave with shifts/ors); the hash check
    proves the clustered+pruned scan returns exactly the plain WHERE
    answer.
    """
    root = tracked_mkdtemp(prefix="lake_z_")
    li = t["lineitem"].select(
        "l_orderkey",
        "l_partkey",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    b = li.agg(
        F.min("l_orderkey").alias("amn"),
        F.max("l_orderkey").alias("amx"),
        F.min("l_partkey").alias("bmn"),
        F.max("l_partkey").alias("bmx"),
    ).first()
    amn, amx, bmn, bmx = b["amn"], b["amx"], b["bmn"], b["bmx"]

    def _bucket(col, mn, mx):
        # 0..255 range bucket, exact integer arithmetic
        return (
            (F.col(col) - F.lit(mn)) * 256 / F.lit(mx - mn + 1)
        ).cast("bigint")

    za = _bucket("l_orderkey", amn, amx)
    zb = _bucket("l_partkey", bmn, bmx)
    zexpr = F.lit(0)
    for i in range(8):
        zexpr = (
            zexpr
            + F.shiftleft(F.shiftright(za, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(zb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    clustered = li.withColumn("zval", zexpr).repartitionByRange(
        16, F.col("zval")
    ).drop("zval")
    adds = _write_files(clustered, root, 0, ["l_orderkey", "l_partkey"])
    _commit(root, 0, adds, [])

    alo, ahi = amn + (amx - amn) * 3 // 8, amn + (amx - amn) * 4 // 8
    blo, bhi = bmn + (bmx - bmn) * 2 // 8, bmn + (bmx - bmn) * 3 // 8
    pruned = _prune_files(
        _prune_files(_snapshot(root), "l_orderkey", alo, ahi),
        "l_partkey",
        blo,
        bhi,
    )
    paths = [os.path.join(root, a["path"]) for a in pruned]
    return (
        spark.read.parquet(*paths)
        .filter(
            F.col("l_orderkey").between(F.lit(alo), F.lit(ahi))
            & F.col("l_partkey").between(F.lit(blo), F.lit(bhi))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_stats_only_query",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT COUNT(*) AS n_rows,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM v1
    """,
    tier="P2",
)
def lake_stats_only_query(spark, t):
    """Metadata-only query answering: COUNT(*) / MIN / MAX over the
    post-merge table computed purely from the transaction log — per-file
    row counts summed, zone maps folded — without opening a single data
    file. This is how table formats answer `SELECT count(*)` on a
    100 TB table in milliseconds: the log already paid for the stats at
    write time. The hash check against DuckDB actually *scanning* the
    reconstructed table proves the log's bookkeeping is exact (any
    commit that lost a file, double-added one, or mis-footered a count
    lands here). Works because removes/adds keep the live set exact and
    the merge's rewrite regenerated stats for every touched file.
    """
    root = _demo_lake(spark, t)
    live = _snapshot(root)
    n_rows = sum(a["rows"] for a in live)
    mn, mx = _key_bounds(live, _KEY)
    return spark.createDataFrame(
        [(n_rows, mn, mx)], "n_rows bigint, min_key bigint, max_key bigint"
    )


@register(
    "lake_hidden_partitioning",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
      AND CAST(ts AS DATE) <  DATE '2024-01-15'
    GROUP BY event_type
    """,
    tier="P2",
)
def lake_hidden_partitioning(spark, t):
    """Hidden partitioning (the Iceberg model): the table is clustered
    by a TRANSFORM of a physical column — day(ts) — that exists only in
    the layout metadata, never as a data column or a directory name the
    user must know. The query filters on the *transform* (a week of
    days); the reader resolves it back to a raw-``ts`` range and prunes
    via the ordinary zone maps. Contrast with Hive-style partitioning
    (``sink_parquet_partitioned``): there the user must filter on the
    physical partition column or read everything — here the engine owns
    the mapping, so queries stay written against the logical schema and
    the layout can evolve underneath them. tests assert the pruned file
    count; the hash check proves the transform→range resolution loses
    and invents nothing (a boundary error lands in the counts).
    """
    import calendar

    root = tracked_mkdtemp(prefix="lake_hp_")
    # physical layout: the event time is stored as int64 epoch
    # MICROSECONDS (what Iceberg stores physically; Spark's session
    # default here writes timestamps as INT96, which carries NO parquet
    # min/max stats — int64 micros restores exact zone maps)
    ev = t["events"].select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_micros"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    # day(ts) clustering: time-range files, ts_micros zone maps in the
    # log. (The transform spec itself would live in table metadata; here
    # it is the operator's contract.)
    adds = _write_files(
        ev.repartitionByRange(12, F.col("ts_micros")), root, 0, ["ts_micros"]
    )
    _commit(root, 0, adds, [])
    # user-level predicate: day(ts) in [2024-01-08, 2024-01-15) —
    # resolved to the raw micros range [lo_day 00:00, hi_day 00:00)
    # (session timezone is pinned UTC, so day boundaries are UTC epochs)
    lo = calendar.timegm((2024, 1, 8, 0, 0, 0)) * 1_000_000
    hi = calendar.timegm((2024, 1, 15, 0, 0, 0)) * 1_000_000
    pruned = _prune_files(_snapshot(root), "ts_micros", lo, hi - 1)
    paths = [os.path.join(root, a["path"]) for a in pruned]
    return (
        spark.read.parquet(*paths)
        .filter(
            (F.col("ts_micros") >= F.lit(lo)) & (F.col("ts_micros") < F.lit(hi))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


@register(
    "lake_log_checkpoint",
    oracle=f"""
    WITH {_V1_SQL}
    , v2 AS (
      SELECT * FROM v1
      UNION ALL
      SELECT o_orderkey + 2 * (SELECT mx FROM bounds), o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT), 'late'
      FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT src, COUNT(*) AS n_rows, CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM v2 GROUP BY src
    """,
    tier="P3",
)
def lake_log_checkpoint(spark, t):
    """Log checkpointing — the O(commits) → O(commits-since-checkpoint)
    fix that keeps snapshot resolution constant-time as a table ages
    (Delta's _last_checkpoint, Iceberg's manifest list): after the merge
    commit, the live file set consolidates into one checkpoint file, a
    later append commits on top, and the final read resolves from
    checkpoint + 1 commit instead of replaying the whole history.
    tests/test_units.py proves the independence claim hard: with the
    pre-checkpoint log segments archived away entirely, the snapshot
    still resolves byte-identically. The hash check covers the
    end-to-end state: merge ∪ post-checkpoint append.
    """
    root = _demo_lake(spark, t)
    _write_checkpoint(root, 1)
    live = _snapshot(root, 0)
    mn, mx = _key_bounds(live, _KEY)
    late = (
        _read_version(spark, root, 0)
        .filter(F.col(_KEY) % 101 == 0)
        .select(
            (F.col(_KEY) + 2 * mx).alias(_KEY),
            "o_orderpriority",
            "o_cents",
            F.lit("late").alias("src"),
        )
    )
    adds = _write_files(late, root, 2, [_KEY])
    _commit(root, 2, adds, [])
    return (
        _read_version(spark, root)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


# ------------------------------------------------- per-file bloom index

_BLOOM_BITS = 16384  # 2 KB per file
# k=3 independent multiplicative hashes (Knuth/splitmix-style odd
# constants): position_i = top-14 bits of value * M_i mod 2^64. Chosen
# over the r7 per-value md5 because the bloom is an ENGINE-INTERNAL
# index (candidate files re-filter exactly, so the hash family is
# observable only through performance) and the multiplicative form
# vectorizes: the r7 build looped hashlib.md5 three times per key on
# the driver (~450k digests per build at sf0.1); this one is three
# numpy uint64 multiplies over the whole column (r9, guide §1.2
# per-task work). Same 2 KB / k=3 false-positive math.
_BLOOM_K = 3
_BLOOM_MULTS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0xD6E8FEB86659FD93,
)
_BLOOM_SHIFT = 64 - 14  # 2^14 = _BLOOM_BITS positions


def _bloom_positions(value: int) -> list[int]:
    return [
        ((value * m) % (1 << 64)) >> _BLOOM_SHIFT for m in _BLOOM_MULTS
    ]


def _file_bloom(path: str, key: str) -> str:
    """Build the file's key bloom at write time from the parquet data
    (one column read, driver-side — real formats do this in the writer
    task and ship the bits home in the commit message). numpy-vectorized
    with the same positions as ``_bloom_positions``; bit ``pos`` lives
    at ``bits[pos // 8] & (1 << (pos % 8))`` (little-endian packbits)."""
    import numpy as np
    import pyarrow.parquet as pq

    vals = (
        pq.read_table(path, columns=[key])
        .column(key)
        .to_numpy()
        .astype(np.uint64)
    )
    bits = np.zeros(_BLOOM_BITS, dtype=bool)
    for m in _BLOOM_MULTS:
        bits[(vals * np.uint64(m)) >> np.uint64(_BLOOM_SHIFT)] = True
    return np.packbits(bits, bitorder="little").tobytes().hex()


def _bloom_might_contain(bloom_hex: str, value: int) -> bool:
    bits = bytes.fromhex(bloom_hex)
    return all(
        bits[pos // 8] & (1 << (pos % 8)) for pos in _bloom_positions(value)
    )


@register(
    "lake_point_lookup_bloom",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT o_orderkey, o_orderpriority, o_cents, src
    FROM v1
    WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders
                        WHERE o_orderkey % 97 = 0)
                       + (SELECT mx FROM bounds)
    """,
    tier="P3",
)
def lake_point_lookup_bloom(spark, t):
    """Point lookup through a per-file bloom index: each commit stores a
    2 KB key bloom per data file in the log (built at write time from
    the file's own column — the index real formats persist as bloom
    filter indexes / puffin files), and a key-equality query consults
    the blooms BEFORE the zone maps open anything: with range-clustered
    keys the zone maps alone already narrow to one file, but after a
    merge the inserts live in an unclustered file whose key RANGE spans
    everything — the bloom still excludes it unless the key is probably
    there. Candidate files re-filter exactly (blooms have false
    positives, never false negatives), so the hash check proves the
    index loses nothing. At 100 TB this is the difference between a
    key lookup opening 1-2 files and scanning a partition.
    """
    root = _demo_lake(spark, t)
    live = _snapshot(root)
    for a in live:
        a["bloom"] = _file_bloom(os.path.join(root, a["path"]), _KEY)
    mn, mx = _key_bounds(_snapshot(root, 0), _KEY)
    # deterministic probe: the highest inserted key (exists by
    # construction: inserts are key+mx for key % 97 == 0)
    base_max97 = max(
        r[_KEY]
        for r in _read_version(spark, root, 0)
        .filter(F.col(_KEY) % 97 == 0)
        .agg(F.max(_KEY).alias(_KEY))
        .collect()
    )
    probe = base_max97  # oracle probes v1 where this key exists as insert+mx
    probe_key = probe + mx
    candidates = [
        a for a in live if _bloom_might_contain(a["bloom"], probe_key)
    ]
    assert candidates, "bloom index lost the probe key (false negative)"
    paths = [os.path.join(root, a["path"]) for a in candidates]
    return spark.read.parquet(*paths).filter(
        F.col(_KEY) == F.lit(probe_key)
    ).select(_KEY, "o_orderpriority", "o_cents", "src")


@register(
    "lake_incremental_rollup",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM v1 GROUP BY o_orderpriority
    """,
    tier="P3",
)
def lake_incremental_rollup(spark, t):
    """Incremental materialized-view maintenance from the commit log:
    a per-priority rollup bootstrapped once at v0 is advanced to v1 by
    reading ONLY the files commit 1 touched — removed files contribute
    with sign -1, added files with sign +1 — and folding the signed
    partial aggregates into the materialized state. No row of the
    untouched ~3/4 of the table flows through the maintenance job
    (asserted in tests/test_units.py by path inspection), which is the
    Materialize/DLT-style cost model: refresh ∝ |changed files| +
    |rollup|, not |table|. Works for any abelian aggregate (count, sum);
    the hash check proves the maintained state equals a full v1
    recompute. All money is integer cents, so the signed fold is exact.
    """
    root = _demo_lake(spark, t)
    state = (
        _read_version(spark, root, 0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )
    with open(os.path.join(_log_dir(root), f"{1:08d}.json")) as fh:
        entry = json.load(fh)
    removed = [os.path.join(root, p) for p in entry["removes"]]
    added = [os.path.join(root, a["path"]) for a in entry["adds"]]

    def signed(paths: list[str], sign: int):
        return spark.read.parquet(*paths).select(
            "o_orderpriority", F.lit(sign).alias("sign"), "o_cents"
        )

    delta = (
        signed(removed, -1)
        .unionByName(signed(added, 1))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("sign").alias("n_rows"),
            F.sum(F.col("sign") * F.col("o_cents")).alias("revenue_cents"),
        )
    )
    return (
        state.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
        .filter(F.col("n_rows") > 0)  # drop groups the delta emptied
    )


def _vacuum(root: str, retain_versions: list[int]) -> list[str]:
    """Delete every data file not referenced by any retained snapshot.
    Returns the deleted relative paths. The log itself is kept (history
    stays auditable); only the storage behind expired versions goes."""
    referenced: set[str] = set()
    for v in retain_versions:
        referenced |= {a["path"] for a in _snapshot(root, v)}
    deleted = []
    data_dir = os.path.join(root, "data")
    for dirpath, _dirs, files in os.walk(data_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, f), root)
            if rel not in referenced:
                os.remove(os.path.join(dirpath, f))
                deleted.append(rel)
    return sorted(deleted)


@register(
    "lake_vacuum_retention",
    oracle=f"""
    WITH {_V1_SQL}
    SELECT src, COUNT(*) AS n_rows, CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM v1 GROUP BY src
    """,
    tier="P3",
)
def lake_vacuum_retention(spark, t):
    """VACUUM with a retention horizon: copy-on-write leaves the files
    of expired versions on disk (that is what makes time travel and
    rollback metadata-only), so storage grows with churn until a vacuum
    reclaims files no retained snapshot references. Retaining only the
    latest version here deletes exactly the v0 files the merge rewrote
    (a strict subset — carried-over files are still referenced and MUST
    survive; tests/test_units.py asserts the deleted set equals commit
    1's removes and that v0 reads fail afterwards while v1 reads do
    not). The hash check proves the post-vacuum latest read is intact.
    Scale: reference resolution is log-only; deletion is O(expired
    files) storage calls, no data scan — same cost model as Delta's
    VACUUM.
    """
    root = _demo_lake(spark, t)
    latest = _versions(root)[-1]
    deleted = _vacuum(root, [latest])
    assert deleted, "vacuum found nothing to reclaim after a CoW merge"
    live = {a["path"] for a in _snapshot(root, latest)}
    assert not (set(deleted) & live), "vacuum deleted a live file"
    return (
        _read_version(spark, root, latest)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


@register(
    "lake_concurrent_txn_rebase",
    oracle=f"""
    WITH {_V1_SQL},
    final AS (
      SELECT * FROM v1
      UNION ALL
      SELECT o_orderkey + 3 * (SELECT mx FROM bounds), o_orderpriority,
             o_cents, 'a' AS src
      FROM v1
      WHERE o_orderkey % 103 = 0 AND o_orderkey > 0
        AND o_orderkey <= (SELECT hicut FROM bounds)
      UNION ALL
      SELECT o_orderkey + 2 * (SELECT mx FROM bounds), o_orderpriority,
             o_cents * 2, 'c' AS src
      FROM v1
      WHERE o_orderkey % 101 = 0 AND o_orderkey > 0
        AND o_orderkey <= (SELECT hicut FROM bounds)
    )
    SELECT src, COUNT(*) AS n_rows, CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM final GROUP BY src
    """,
    tier="P3",
)
def lake_concurrent_txn_rebase(spark, t):
    """Optimistic concurrency on the transaction log: three writers all
    begin at the post-merge snapshot v1 and race.

    - B appends rows keyed into (2mx, 3mx) and commits first → v2.
    - A appends rows keyed into (3mx, 4mx) after reading the full v1
      span. Its commit finds B's intervening v2, proves disjointness
      (B's adds sit entirely above A's read range, no remove clashes)
      and REBASES to v3 — the same files publish under a later version,
      no recompute, which is what lets many appenders share a table.
    - C read the (then-empty) region (2mx, 3mx] at v1 intending an
      idempotent fix-up there. Its commit detects B's phantom append
      into that range and raises CommitConflict — committing would have
      silently ignored B's rows, the exact anomaly serializability
      forbids. C re-runs on the fresh snapshot, now sees B's rows,
      rewrites them (cents doubled, src='c', CoW-removing exactly B's
      files) → v4.

    The final state is therefore the SERIAL order B → A → C, which the
    oracle reconstructs relationally; the conflict/rebase decisions are
    structurally asserted here and in tests/test_units.py. Validation
    is log-only (O(intervening commits) JSON reads, no data scan), so
    at 100 TB its cost tracks commit rate, not table size.
    """
    root = _demo_lake(spark, t)
    live0 = _snapshot(root, 0)
    mn, mx = _key_bounds(live0, _KEY)
    hicut = mx - (mx - mn) // 10

    txa, txb, txc = Txn(root), Txn(root), Txn(root)
    assert (txa.read_version, txb.read_version, txc.read_version) == (1, 1, 1)

    def appended(txn, modulus: int, shift: int, src: str):
        span = txn.read_range(spark, mn, 2 * mx)
        return span.filter(
            (F.col(_KEY) % modulus == 0)
            & (F.col(_KEY) > 0)
            & (F.col(_KEY) <= F.lit(hicut))
        ).select(
            (F.col(_KEY) + F.lit(shift * mx)).alias(_KEY),
            "o_orderpriority",
            "o_cents",
            F.lit(src).alias("src"),
        )

    txb.write(appended(txb, 101, 2, "b"), "b")
    vb = txb.commit()
    assert vb == 2, f"B expected v2, got v{vb}"

    txa.write(appended(txa, 103, 3, "a"), "a")
    va = txa.commit()  # validates past B's v2: disjoint → rebase
    assert va == 3, f"A expected rebase to v3, got v{va}"

    assert txc.read_range(spark, 2 * mx + 1, 3 * mx) is None  # empty region
    try:
        txc.commit()
        raise AssertionError("phantom append went undetected")
    except CommitConflict:
        pass

    txc2 = Txn(root)
    region = txc2.read_range(spark, 2 * mx + 1, 3 * mx)
    with open(os.path.join(_log_dir(root), f"{2:08d}.json")) as fh:
        b_files = {a["path"] for a in json.load(fh)["adds"]}
    assert txc2.read_files == b_files, "C's pruned read set is not exactly B's files"
    txc2.write(
        region.select(
            _KEY,
            "o_orderpriority",
            (F.col("o_cents") * 2).alias("o_cents"),
            F.lit("c").alias("src"),
        ),
        "c",
    )
    txc2.removes = sorted(txc2.read_files)
    vc = txc2.commit()
    assert vc == 4, f"C expected v4, got v{vc}"

    return (
        _read_version(spark, root, 4)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_cents").alias("revenue_cents"),
        )
    )


# --------------------------------------- round-4 wave: DV / spec / WAP


@register(
    "lake_deletion_vectors",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderpriority
    """,
    tier="P3",
)
def lake_deletion_vectors(spark, t):
    """Row-level DELETE via POSITION-based deletion vectors — the
    modern merge-on-read delete (Delta DVs, Iceberg v2 position
    deletes), distinct from ``lake_merge_on_read``'s key-based delta:
    the commit stores (file, row position) pairs, so applying a delete
    never re-evaluates the original predicate and works for tables
    whose rows have no usable key at all.

    Write path: the DELETE predicate runs ONCE over the v0 snapshot
    with the parquet reader's ``_metadata.file_path``/``row_index``
    virtual columns (exposed by Spark's FileFormat, no extra bookkeeping
    column in the data) and materializes the matching positions as
    parquet DV files — written by Spark, O(deleted rows), never
    collected to the driver. Base files are untouched: the delete
    commit is O(changes) like every merge-on-read write.

    Read path: the covered base files anti-join the DV on
    (file, position) — a pure position match, zero business-column
    comparisons. At 100 TB a real format compresses each file's
    positions into a roaring bitmap applied inside the scan operator;
    the anti-join below is the same algebra with the bitmap lookup
    expressed relationally, and it shuffles on the file path — i.e.
    partition-aligned with the scan, not with any data key, so delete
    skew cannot concentrate on hot business keys.

    The oracle re-runs the original predicate (``o_orderkey % 7 <> 0``)
    that the engine has FORGOTTEN by read time — the hash match proves
    positions alone reconstruct the predicate delete exactly.
    """
    root = tracked_mkdtemp(prefix="lake_dv_")
    _build_v0(spark, t, root)
    base0 = _read_version(spark, root, 0)
    dv = base0.filter(F.col(_KEY) % 7 == 0).select(
        F.col("_metadata.file_path").alias("dv_path"),
        F.col("_metadata.row_index").alias("dv_pos"),
    )
    dv_adds = _write_files(dv, root, "dv-pos-v1", ["dv_pos"])
    for a in dv_adds:
        a["kind"] = "posdv"
    _commit(root, 1, dv_adds, [])

    snap = _snapshot(root)
    dv_paths = [
        os.path.join(root, a["path"])
        for a in snap
        if a.get("kind") == "posdv"
    ]
    data_paths = [
        os.path.join(root, a["path"])
        for a in snap
        if a.get("kind") != "posdv"
    ]
    dv_df = spark.read.parquet(*dv_paths)
    # Pin the base side's virtual columns into real ones BEFORE joining:
    # the DV read has its own `_metadata`, so the raw reference would be
    # ambiguous across the join.
    base = spark.read.parquet(*data_paths).withColumns(
        {
            "__file": F.col("_metadata.file_path"),
            "__pos": F.col("_metadata.row_index"),
        }
    )
    live = base.join(
        dv_df,
        (F.col("__file") == F.col("dv_path"))
        & (F.col("__pos") == F.col("dv_pos")),
        "left_anti",
    )
    return live.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_cents").alias("revenue_cents"),
    )


def _write_partitioned(
    df, root: str, label: str, part_col: str, stat_cols: list[str]
) -> list[dict]:
    """Write one commit's files hive-partitioned by ``part_col`` and
    record each file's partition tuple in its add entry (the log is the
    source of truth for partition values, as in Iceberg manifests — the
    directory layout is just a convenience)."""
    from urllib.parse import unquote

    rel_dir = os.path.join("data", label)
    out = os.path.join(root, rel_dir)
    df.write.mode("overwrite").partitionBy(part_col).parquet(out)
    adds = []
    for d in sorted(os.listdir(out)):
        if not d.startswith(f"{part_col}="):
            continue
        raw = unquote(d.split("=", 1)[1])
        val: object = int(raw) if raw.lstrip("-").isdigit() else raw
        for f in sorted(os.listdir(os.path.join(out, d))):
            if not f.endswith(".parquet"):
                continue
            rows, stats = _footer_stats(os.path.join(out, d, f), stat_cols)
            adds.append(
                {
                    "path": os.path.join(rel_dir, d, f),
                    "rows": rows,
                    "stats": stats,
                    "partition": {part_col: val},
                }
            )
    return adds


def _prune_spec_aware(
    adds: list[dict], col: str, lo, hi, transform=None
) -> list[dict]:
    """File pruning that understands PARTITION EVOLUTION: a file whose
    add entry carries a partition value for ``col`` (under the given
    transform) is pruned by exact partition matching; files written
    under an OLDER spec that never partitioned by ``col`` fall back to
    their footer zone maps. One predicate, two pruning strategies —
    the reader never needs to know which spec era a file belongs to."""
    kept = []
    for a in adds:
        part = a.get("partition", {})
        if col in part:
            v = part[col]
            if not (lo <= v <= hi):
                continue
            kept.append(a)
            continue
        st = a["stats"].get(col)
        if st is not None and (st[1] < lo or st[0] > hi):
            continue
        kept.append(a)
    return kept


@register(
    "lake_partition_evolution",
    oracle="""
    WITH b AS (SELECT max(o_orderkey) AS mx FROM orders),
    base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
      FROM orders
    ),
    unioned AS (
      SELECT o_orderkey, o_orderpriority, o_cents, 'spec_a' AS era
      FROM base
      UNION ALL
      SELECT o_orderkey + (SELECT mx FROM b), o_orderpriority, o_cents,
             'spec_b'
      FROM base
    )
    SELECT era, COUNT(*) AS n_rows,
           CAST(SUM(o_cents) AS BIGINT) AS revenue_cents
    FROM unioned, b
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderkey BETWEEN 4 * mx // 5 + 1 AND 6 * mx // 5
    GROUP BY era
    """,
    tier="P3",
)
def lake_partition_evolution(spark, t):
    """Partition-spec EVOLUTION on one logical table: commit 0 writes
    under spec A (hive-partitioned by ``o_orderpriority`` — right for a
    priority-sliced workload), commit 1 appends key-shifted rows under
    spec B (range-bucketed by ``o_orderkey`` — right for key-range
    scans) after the workload shifted. Real tables cannot rewrite
    history to re-partition 100 TB, so both eras coexist forever and
    every reader must plan across them — the capability Iceberg calls
    partition evolution, rebuilt on this module's JSON log by recording
    each file's partition tuple in its add entry.

    The probe query filters on BOTH columns, so each era prunes by a
    different mechanism: spec-A files match the priority partition
    value exactly and zone-map the key range; spec-B files match the
    key-bucket partition exactly and zone-map the priority. The builder
    asserts both directions actually skipped files — pruning across
    specs is the entire point, not an optimization afterthought. Reads
    restore partition columns with the parquet reader's ``basePath``
    option, one read per era root (two jobs, same logical plan shape at
    any scale: partition listing is O(live files) from the log, zero
    data scanned to plan).
    """
    root = tracked_mkdtemp(prefix="lake_spec_")
    base = _base_frame(t).drop("src")
    mx = base.agg(F.max(_KEY)).collect()[0][0]  # 1 scalar: spec math
    adds_a = _write_partitioned(
        base.repartition(4, F.col(_KEY)),
        root,
        "spec-a",
        "o_orderpriority",
        [_KEY],
    )
    _commit(root, 0, adds_a, [])
    bucket_w = max(mx // 8, 1)
    evolved = base.select(
        (F.col(_KEY) + F.lit(mx)).alias(_KEY),
        "o_orderpriority",
        "o_cents",
    ).withColumn("k_bucket", (F.col(_KEY) / F.lit(bucket_w)).cast("bigint"))
    adds_b = _write_partitioned(
        evolved, root, "spec-b", "k_bucket", [_KEY, "o_orderpriority"]
    )
    _commit(root, 1, adds_b, [])

    lo, hi = 4 * mx // 5 + 1, 6 * mx // 5
    live = _snapshot(root)
    # key predicate: spec-B prunes by k_bucket partition, spec-A by
    # zone maps; priority predicate: spec-A prunes by partition value,
    # spec-B by (non-selective) string zone maps.
    kept = _prune_spec_aware(
        live, "k_bucket", lo // bucket_w, hi // bucket_w
    )
    kept = [
        a
        for a in kept
        if a.get("partition", {}).get("o_orderpriority", "1-URGENT")
        == "1-URGENT"
    ]
    kept = _prune_spec_aware(kept, _KEY, lo, hi)
    n_a = sum(1 for a in live if "o_orderpriority" in a.get("partition", {}))
    n_b = len(live) - n_a
    k_a = sum(1 for a in kept if "o_orderpriority" in a.get("partition", {}))
    k_b = len(kept) - k_a
    assert k_a < n_a, "spec-A partition pruning skipped nothing"
    assert k_b < n_b, "spec-B partition pruning skipped nothing"

    def _read_era(label: str, era: str):
        paths = [
            os.path.join(root, a["path"])
            for a in kept
            if a["path"].startswith(os.path.join("data", label))
        ]
        if not paths:
            return None
        df = (
            spark.read.option(
                "basePath", os.path.join(root, "data", label)
            )
            .parquet(*paths)
            .filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & F.col(_KEY).between(lo, hi)
            )
        )
        return df.select(
            _KEY, "o_orderpriority", "o_cents", F.lit(era).alias("era")
        )
    parts = [
        d
        for d in (_read_era("spec-a", "spec_a"), _read_era("spec-b", "spec_b"))
        if d is not None
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("era").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_cents").alias("revenue_cents"),
    )


def _stage_branch(root: str, branch: str, version: int, adds: list[dict]):
    """Stage a commit on an isolated branch: same entry format, written
    under ``_log/branches/<name>/`` where no main-table reader ever
    looks. Data files land in the table's data area immediately (they
    are inert until referenced by a main-log commit), so publishing is
    a pure metadata move."""
    bdir = os.path.join(_log_dir(root), "branches", branch)
    os.makedirs(bdir, exist_ok=True)
    with open(os.path.join(bdir, f"{version:08d}.json"), "w") as fh:
        json.dump({"version": version, "adds": adds, "removes": []}, fh)


def _branch_adds(root: str, branch: str) -> list[dict]:
    bdir = os.path.join(_log_dir(root), "branches", branch)
    adds: list[dict] = []
    for f in sorted(os.listdir(bdir)):
        if m := _COMMIT_RE.match(f):
            del m
            with open(os.path.join(bdir, f)) as fh:
                adds += json.load(fh)["adds"]
    return adds


@register(
    "lake_wap_publish",
    oracle="""
    WITH b AS (SELECT max(o_orderkey) AS mx FROM orders),
    base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
      FROM orders
    ),
    bad AS (
      SELECT o_orderkey + (SELECT mx FROM b) AS o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN -o_cents ELSE o_cents END
               AS o_cents
      FROM base WHERE o_orderkey % 5 = 0
    ),
    good AS (
      SELECT o_orderkey + 2 * (SELECT mx FROM b) AS o_orderkey, o_cents
      FROM base WHERE o_orderkey % 11 = 0
    )
    SELECT 'main_before' AS step, COUNT(*) AS n_rows,
           CAST(SUM(o_cents) AS BIGINT) AS cents
    FROM base
    UNION ALL
    SELECT 'audit_rejected', COUNT(*), CAST(SUM(o_cents) AS BIGINT)
    FROM bad WHERE o_cents < 0
    UNION ALL
    SELECT 'main_after', COUNT(*), CAST(SUM(o_cents) AS BIGINT)
    FROM (SELECT o_cents FROM base UNION ALL SELECT o_cents FROM good)
    """,
    tier="P3",
)
def lake_wap_publish(spark, t):
    """Write-Audit-Publish on the transaction log: producers stage
    commits on an invisible branch, a gate audits the WOULD-BE table
    state, and only audited commits move to the main log — the pattern
    Iceberg/LakeFS ship for keeping bad loads out of consumer queries
    without ever blocking them.

    Two candidate loads stage here: one carrying corrupted rows
    (negated cents on a key slice — think an upstream sign bug) and one
    clean. The audit — a constraint scan over main ∪ staged, the same
    zero-copy metadata union a branch read costs — REJECTS the first
    (branch dropped, its files become vacuum-able orphans; the main log
    is never touched, asserted structurally) and PUBLISHES the second
    by linking its staged adds into the next main version through the
    same atomic put-if-absent every writer uses.

    Output is the three-step audit trail (before / rejected-violation
    fold / after). The oracle recomputes all three relationally, so the
    hash proves both directions: corrupted rows are absent from the
    final state AND every clean staged row arrived exactly once. Audit
    cost at 100 TB: the constraint scan is one aggregate over the
    staged files only (main-side violations are impossible by
    induction — they were audited before publishing), O(staged data),
    driver work O(branch log entries).
    """
    root = tracked_mkdtemp(prefix="lake_wap_")
    _build_v0(spark, t, root)
    base0 = _read_version(spark, root, 0)
    mx = base0.agg(F.max(_KEY)).collect()[0][0]

    bad = base0.filter(F.col(_KEY) % 5 == 0).select(
        (F.col(_KEY) + F.lit(mx)).alias(_KEY),
        "o_orderpriority",
        F.when(F.col(_KEY) % 13 == 0, -F.col("o_cents"))
        .otherwise(F.col("o_cents"))
        .alias("o_cents"),
        F.lit("staged").alias("src"),
    )
    good = base0.filter(F.col(_KEY) % 11 == 0).select(
        (F.col(_KEY) + F.lit(2 * mx)).alias(_KEY),
        "o_orderpriority",
        "o_cents",
        F.lit("staged").alias("src"),
    )
    _stage_branch(root, "load-bad", 1, _write_files(bad, root, "wap-bad", [_KEY]))
    _stage_branch(
        root, "load-good", 1, _write_files(good, root, "wap-good", [_KEY])
    )

    def _audit_and_publish(branch: str):
        """Violations in the staged files (audit); publish iff zero."""
        adds = _branch_adds(root, branch)
        staged = spark.read.parquet(
            *[os.path.join(root, a["path"]) for a in adds]
        )
        viol = staged.filter(F.col("o_cents") < 0).agg(
            F.count(F.lit(1)).alias("n"), F.sum("o_cents").alias("c")
        ).collect()[0]
        if viol["n"] == 0:
            _commit(root, _latest_version(root) + 1, adds, [])
            return None
        return int(viol["n"]), int(viol["c"])

    rejected = _audit_and_publish("load-bad")
    assert rejected is not None, "corrupt branch passed the audit"
    assert _latest_version(root) == 0, "rejected branch leaked into main"
    assert _audit_and_publish("load-good") is None, "clean branch rejected"
    assert _latest_version(root) == 1, "clean branch failed to publish"

    final = _read_version(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("o_cents").alias("cents")
    )
    before = base0.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("o_cents").alias("cents")
    )
    rej = spark.createDataFrame(
        [("audit_rejected", rejected[0], rejected[1])],
        "step string, n_rows bigint, cents bigint",
    )
    return (
        before.select(F.lit("main_before").alias("step"), "n_rows", "cents")
        .unionByName(rej)
        .unionByName(
            final.select(F.lit("main_after").alias("step"), "n_rows", "cents")
        )
    )


@register(
    "lake_row_lineage",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
      FROM orders
    ),
    final AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 9 = 0 THEN o_cents * 2 ELSE o_cents END
               AS o_cents,
             CASE WHEN o_orderkey % 9 = 0 THEN 2 ELSE 0 END
               AS last_updated_seq
      FROM base
    )
    SELECT last_updated_seq,
           COUNT(*) AS n_rows,
           COUNT(*) AS n_distinct_ids,
           CAST(SUM(o_cents) AS BIGINT) AS cents
    FROM final GROUP BY last_updated_seq
    """,
    tier="P3",
)
def lake_row_lineage(spark, t):
    """Row LINEAGE on the transaction log (the Iceberg v3 row-lineage
    design): every row gets a stable ``_row_id`` at its FIRST commit —
    assigned as ``first_row_id(file) + row position``, where each
    file's ``first_row_id`` is allocated from a running counter in the
    commit metadata, so id assignment costs zero data writes — plus a
    ``_last_updated_seq`` recording the commit that last modified it.
    Rewrites must CARRY both: compaction repacks 24 small files into 4
    (ids ride along as explicit columns from then on), and an UPDATE
    commit doubles cents for a key slice, bumping only that slice's
    ``_last_updated_seq``.

    The builder asserts the invariant that makes lineage lineage: the
    multiset of row ids is IDENTICAL before and after both rewrites
    (``exceptAll`` both ways — a compaction that drops, duplicates, or
    re-mints ids fails structurally). The oracle can't see physical row
    ids (they depend on file layout), so the hash checks the
    layout-independent projection: per-last-updated-commit row counts,
    id-uniqueness (distinct ids == rows), and exact cents — which is
    what downstream CDC/incremental consumers actually key on.

    Scale: id assignment is metadata-only at ingest (Iceberg's trick —
    no id column is ever written for append files; readers derive it
    from first_row_id + position); ids materialize as data only when a
    rewrite first touches the file. The update is the CoW zone-map
    path of ``lake_merge_upsert``; nothing here is O(table) beyond the
    rewrites themselves.
    """
    root = tracked_mkdtemp(prefix="lake_lin_")
    base = _base_frame(t).drop("src")
    adds = _write_files(
        base.repartitionByRange(24, F.col(_KEY)), root, 0, [_KEY]
    )
    nxt = 0  # running first_row_id allocator, recorded per file
    for a in adds:
        a["first_row_id"] = nxt
        nxt += a["rows"]
    _commit(root, 0, adds, [])

    def _with_ids(version: int):
        """Read a snapshot deriving virtual ids for append-era files
        (first_row_id + position) and passing through materialized
        ``_row_id`` columns for rewrite-era files."""
        snap = _snapshot(root, version)
        virt = [a for a in snap if "first_row_id" in a]
        mat = [a for a in snap if "first_row_id" not in a]
        parts = []
        if virt:
            bases = {
                "file:" + os.path.join(root, a["path"]): a["first_row_id"]
                for a in virt
            }
            mapping = F.create_map(
                *[x for kv in bases.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
            )
            parts.append(
                spark.read.parquet(*[os.path.join(root, a["path"]) for a in virt])
                .withColumn(
                    "_row_id",
                    mapping[F.col("_metadata.file_path")]
                    + F.col("_metadata.row_index"),
                )
                .withColumn("_last_updated_seq", F.lit(0))
            )
        if mat:
            parts.append(
                spark.read.parquet(*[os.path.join(root, a["path"]) for a in mat])
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # commit 1: compaction — ids become explicit columns, values carried
    v0 = _with_ids(0)
    compacted = v0.repartitionByRange(4, F.col(_KEY))
    adds1 = _write_files(compacted, root, 1, [_KEY])
    _commit(root, 1, adds1, [a["path"] for a in _snapshot(root, 0)])

    # commit 2: CoW UPDATE of the key slice, bumping its lineage seq
    v1 = _with_ids(1)
    updated = v1.select(
        _KEY,
        "o_orderpriority",
        F.when(F.col(_KEY) % 9 == 0, F.col("o_cents") * 2)
        .otherwise(F.col("o_cents"))
        .alias("o_cents"),
        "_row_id",
        F.when(F.col(_KEY) % 9 == 0, F.lit(2))
        .otherwise(F.col("_last_updated_seq"))
        .alias("_last_updated_seq"),
    )
    adds2 = _write_files(updated, root, 2, [_KEY])
    _commit(root, 2, adds2, [a["path"] for a in _snapshot(root, 1)])

    final = _with_ids(None)
    # lineage invariant: the id multiset survived BOTH rewrites intact.
    # One-sided multiset difference + row-count equality is equivalent
    # to (and r9-cheaper than) the r8 two-sided exceptAll: a dropped id
    # changes the count; a duplicated or re-minted id puts the extra
    # copy in final∖v0 (multiset semantics) even when the count is
    # preserved. The second anti-join shuffle is replaced by two
    # column-pruned counts.
    assert final.count() == v0.count() and (
        final.select("_row_id").exceptAll(v0.select("_row_id")).isEmpty()
    ), "row ids dropped, duplicated, or re-minted by a rewrite"

    return final.groupBy("_last_updated_seq").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("_row_id").alias("n_distinct_ids"),
        F.sum("o_cents").alias("cents"),
    ).select(
        F.col("_last_updated_seq").alias("last_updated_seq"),
        "n_rows",
        "n_distinct_ids",
        "cents",
    )


@register(
    "lake_clone_zero_copy",
    oracle=f"""
    WITH {_V1_SQL},
    src_extra AS (
      SELECT o_orderkey + 2 * (SELECT mx FROM bounds) AS o_orderkey,
             o_orderpriority, o_cents, 'src_extra' AS src
      FROM v1 WHERE o_orderkey % 41 = 0
    ),
    clone_extra AS (
      SELECT o_orderkey + 3 * (SELECT mx FROM bounds) AS o_orderkey,
             o_orderpriority, o_cents, 'clone_extra' AS src
      FROM v1 WHERE o_orderkey % 43 = 0
    )
    SELECT 'source' AS side, COUNT(*) AS n_rows,
           CAST(SUM(o_cents) AS BIGINT) AS cents
    FROM (SELECT o_cents FROM v1 UNION ALL SELECT o_cents FROM src_extra)
    UNION ALL
    SELECT 'clone', COUNT(*), CAST(SUM(o_cents) AS BIGINT)
    FROM (SELECT o_cents FROM v1 UNION ALL SELECT o_cents FROM clone_extra)
    """,
    tier="P3",
)
def lake_clone_zero_copy(spark, t):
    """Zero-copy SHALLOW CLONE (Delta's CLONE, Iceberg snapshot refs):
    a new table whose first commit REFERENCES the source's live data
    files by absolute path — no byte of data moves, the clone costs
    O(live files) JSON. From then on the tables diverge independently:
    the clone appends without touching the source's log, the source
    appends without appearing in the clone (snapshot independence both
    ways, asserted structurally below — the clone's data directory must
    contain only its OWN post-clone files, and the source log must end
    where it ended before the clone committed anything).

    This is the dev/test-against-prod-data primitive: a 100 TB table
    clones in milliseconds, experiments write only their deltas, and
    vacuum on either side must (and here does, via reference counting
    scoped per log) leave the shared files alone while any live log
    references them. The hash folds both sides' full contents, so a
    clone that deep-copied (double counts), leaked a source append into
    the clone, or wrote through to the source lands in the mismatch.
    """
    src_root = _demo_lake(spark, t)
    live0 = _snapshot(src_root, 0)
    mn, mx = _key_bounds(live0, _KEY)

    clone_root = tracked_mkdtemp(prefix="lake_clone_")
    cloned_adds = [
        # absolute path → _read_version's os.path.join passes it through
        {**a, "path": os.path.join(src_root, a["path"])}
        for a in _snapshot(src_root)
    ]
    _commit(clone_root, 0, cloned_adds, [])

    v1 = _read_version(spark, src_root)
    src_extra = v1.filter(F.col(_KEY) % 41 == 0).select(
        (F.col(_KEY) + F.lit(2 * mx)).alias(_KEY),
        "o_orderpriority",
        "o_cents",
        F.lit("src_extra").alias("src"),
    )
    clone_extra = v1.filter(F.col(_KEY) % 43 == 0).select(
        (F.col(_KEY) + F.lit(3 * mx)).alias(_KEY),
        "o_orderpriority",
        "o_cents",
        F.lit("clone_extra").alias("src"),
    )
    src_log_end = _latest_version(src_root)
    _commit(clone_root, 1, _write_files(clone_extra, clone_root, 1, [_KEY]), [])
    _commit(
        src_root,
        src_log_end + 1,
        _write_files(src_extra, src_root, src_log_end + 1, [_KEY]),
        [],
    )
    # structural independence: the clone wrote nothing into the source
    # tree, and only post-clone files live under the clone's data dir
    assert _latest_version(src_root) == src_log_end + 1
    clone_data = os.path.join(clone_root, "data")
    assert sorted(os.listdir(clone_data)) == ["v000001"], (
        "shallow clone materialized source data"
    )

    def _fold(root: str, side: str):
        return (
            _read_version(spark, root)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_cents").alias("cents"),
            )
            .select(F.lit(side).alias("side"), "n_rows", "cents")
        )

    return _fold(src_root, "source").unionByName(_fold(clone_root, "clone"))
