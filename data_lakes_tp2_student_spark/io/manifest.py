"""Snapshot-isolated table commits: a minimal manifest log over parquet.

The reference's only "transaction" is whole-file CSV clobbering (e.g.
/root/reference/build/unpack_to_raw.py:57 re-uploads the entire zone
object); the plain-parquet zones this repo writes (`io/sinks.py`,
`streaming/jobs.py:stream_upsert_partitions`) improved that to dynamic
partition overwrite — but an overwrite is still not atomic ACROSS
partitions: a driver that dies mid-write leaves some partitions replaced
and others not, and a concurrent reader can see the mix.

This module closes that gap with the public Delta/Iceberg log design,
reduced to its load-bearing core:

- **Data files are immutable.** Every commit writes its parquet files into
  a fresh `data/txn=<uuid>/` directory; nothing ever rewrites or deletes a
  live file. (The `txn=` spelling makes every path segment a `k=v` pair,
  so Spark's own partition discovery parses the layout — the reader is a
  vanilla `spark.read.option("basePath", root).parquet(*files)`, no custom
  relation needed; the synthetic `txn` column is dropped after read.)
- **A manifest pins a version.** `_manifest/v{N}.json` lists exactly the
  data files (+ their partition values, + the schema) visible at version
  N. Readers resolve a version (latest by default), then read only its
  files — a half-written version N+1 is INVISIBLE because its manifest
  does not exist yet and its data files are in txn dirs no manifest
  references.
- **Commit = atomic put-if-absent of the next manifest.** The manifest is
  staged to a temp name and published with `os.link` (hard link), which
  fails with EEXIST if some other writer won the version — the HDFS-style
  rename-no-overwrite primitive. Losers rebase on the new latest and
  retry (optimistic concurrency); append/replace commits re-derive their
  file list against the winner's snapshot, so no lost updates. (On S3
  proper this single primitive is what a DynamoDB/conditional-put
  LogStore supplies; everything else is unchanged.)
- **Crash recovery is structural.** A writer that dies after the data
  write but before the manifest link leaves only an orphan txn dir;
  readers never see it, and `vacuum()` removes any txn dir no manifest
  references once a later commit (or none) lands.

Scale notes: the manifest lists file PATHS and partition values, not data
— O(files), the same contract as a Delta JSON commit; at 100 TB the log
compacts to checkpoints, which this minimal layer leaves out (versions
here are full snapshots, so every manifest IS a checkpoint — simpler, at
the cost of O(files) per commit, acceptable up to ~10^5 files). Partition
pruning still works: `read()` can prune by partition value against the
manifest before Spark ever lists a file.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _json_safe(v):
    """Parquet-footer statistic → JSON-storable canonical value."""
    import datetime as _dt

    import numpy as _np

    if v is None or isinstance(v, (bool, str)):
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, _np.integer):
        return int(v)
    if isinstance(v, _np.floating):
        return float(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (int, float)):
        return v
    return str(v)


def _file_stats(path: str, cols: list[str]) -> dict[str, list]:
    """Per-file [min, max] for `cols`, read from the parquet FOOTER the
    write just produced (pyarrow metadata — no data pages touched).
    Columns without usable stats (all-null, missing, unsupported type)
    are omitted; readers treat missing stats as 'cannot skip'."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, list] = {}
    for c in cols:
        if c not in idx:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        if lo is not None:
            out[c] = [_json_safe(lo), _json_safe(hi)]
    return out


def _path_value(v) -> str | None:
    """A partition-filter value → the string Spark renders in the path
    segment (review r6: Python ``str(True)`` is ``'True'`` but Spark
    writes ``flag=true`` — the mismatch silently returned 0 rows)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _parse_partition(rel_path: str) -> dict[str, str | None]:
    """Partition values from a relative file path's `k=v` dir segments
    (Hive layout; `txn` is the commit id, not a table partition)."""
    out: dict[str, str | None] = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        if k == "txn":
            continue
        out[k] = None if v == HIVE_NULL else unquote(v)
    return out


class ManifestTable:
    """A versioned parquet table at `root` with snapshot-isolated commits.

    With `stats_cols`, every commit also records per-FILE min/max for
    those columns in the manifest (read from the parquet footers the
    write just produced — no extra data pass), enabling
    `read(range_filter=...)` to skip files from the manifest alone: the
    Delta/Iceberg data-skipping design. Pair with `optimize_zorder` so
    the min/max boxes are actually tight."""

    def __init__(self, root: str, stats_cols: list[str] | None = None) -> None:
        self.root = root
        self.log_dir = os.path.join(root, "_manifest")
        self.data_dir = os.path.join(root, "data")
        self.stats_cols = list(stats_cols or [])

    # ---------- log primitives ----------

    def _version_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:020d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        with open(self._version_path(version)) as f:
            return json.load(f)

    def _publish(self, manifest: dict) -> bool:
        """Atomic put-if-absent of `manifest` as its version file. Returns
        False if another writer already published that version number."""
        os.makedirs(self.log_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            prefix=".commit-", suffix=".json", dir=self.log_dir
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
            try:
                # hard link = atomic create-if-absent on POSIX/HDFS-likes
                os.link(tmp, self._version_path(manifest["version"]))
                return True
            except FileExistsError:
                return False
        finally:
            os.unlink(tmp)

    # ---------- data write ----------

    def _write_txn(
        self, df: DataFrame, partition_by: list[str] | None
    ) -> tuple[str, list[dict]]:
        """Write `df`'s parquet files into a fresh txn dir; return
        (txn id, file entries with table-relative paths + partition
        values). Immutable: a crash after this leaves only an orphan."""
        if "txn" in df.columns:
            # reserved: the commit-id path segment is spelled txn=<id> so
            # partition discovery parses the layout; a data column of the
            # same name would collide on read (review r6)
            raise ValueError(
                "column name 'txn' is reserved by the manifest layout"
            )
        txn = uuid.uuid4().hex
        txn_dir = os.path.join(self.data_dir, f"txn={txn}")
        w = df.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(txn_dir)
        entries = []
        for dirpath, _dirs, names in os.walk(txn_dir):
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.root)
                entry = {"path": rel, "partition": _parse_partition(rel)}
                if self.stats_cols:
                    entry["stats"] = _file_stats(full, self.stats_cols)
                entries.append(entry)
        return txn, entries

    # ---------- commits ----------

    def _commit(
        self,
        df: DataFrame,
        partition_by: list[str] | None,
        action: str,
        keep_factory,  # (new_files) -> ((entry) -> bool) over parent files
        max_attempts: int = 20,
    ) -> int:
        """The ONE commit loop (review r6: replace_partitions used to
        duplicate it and the copies had already drifted). The data write
        happens once — files are immutable and version-independent; only
        the manifest derivation rebases when a concurrent writer wins the
        version race."""
        schema_json = df.schema.json()
        _txn, new_files = self._write_txn(df, partition_by)
        keep = keep_factory(new_files)
        for _ in range(max_attempts):
            parent = self.latest_version()
            if parent is None:
                parent_files: list[dict] = []
            else:
                parent_files = self.manifest(parent)["files"]
            files = [e for e in parent_files if keep(e)] + new_files
            # A snapshot mixing partition LAYOUTS is unreadable (Spark:
            # CONFLICTING_PARTITION_COLUMN_NAMES) — catch the forgotten
            # partition_by at COMMIT time, not at every later read
            # (review r6: commit_append with the default None into a
            # day-partitioned table bricked the table).
            layouts = {frozenset(e["partition"]) for e in files}
            if len(layouts) > 1:
                raise ValueError(
                    f"commit would mix partition layouts "
                    f"{sorted(sorted(s) for s in layouts)} — pass the "
                    f"table's partition_by (parent has "
                    f"{self.manifest(parent)['partition_by'] if parent is not None else []})"
                )
            manifest = {
                "version": (parent if parent is not None else -1) + 1,
                "parent": parent,
                "action": action,
                "partition_by": partition_by or [],
                "schema": schema_json,
                "files": files,
                "committed_at": time.time(),
            }
            if self._publish(manifest):
                return manifest["version"]
        raise RuntimeError(
            f"manifest commit lost the version race {max_attempts} times"
        )

    def commit_overwrite(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        """Full-table replace: the new version lists only this commit's
        files. Old versions stay readable until vacuum."""
        return self._commit(
            df, partition_by, "overwrite", lambda nf: (lambda e: False)
        )

    def commit_append(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        """Append: new version = parent's files + this commit's files."""
        return self._commit(
            df, partition_by, "append", lambda nf: (lambda e: True)
        )

    def commit_replace_partitions(
        self, df: DataFrame, partition_by: list[str]
    ) -> int:
        """Atomic dynamic-partition overwrite: parent files in partitions
        `df` writes are dropped from the snapshot, all other partitions
        carry over untouched — the `overwrite_partitions` semantics
        (io/sinks.py) but atomic across ALL touched partitions: readers
        see every partition pre-commit or every partition post-commit,
        never a mix."""

        def factory(new_files):
            touched = {
                tuple(sorted(e["partition"].items())) for e in new_files
            }
            return (
                lambda e: tuple(sorted(e["partition"].items())) not in touched
            )

        return self._commit(df, partition_by, "replace_partitions", factory)

    # ---------- read ----------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        partition_filter=None,
        range_filter=None,
    ) -> DataFrame:
        """Snapshot read. `version=None` pins the CURRENT latest at call
        time (later commits don't change this DataFrame's file list —
        that IS the isolation). `partition_filter` ({col: value-or-list})
        prunes files against the MANIFEST, before Spark lists anything.
        `range_filter` ({col: (lo, hi) inclusive}) additionally skips
        every file whose recorded [min, max] does not overlap — manifest
        data skipping; files without stats for the column are kept
        (skipping is an optimization, never a filter). Bounds are compared
        in the stats' canonical domain (numbers as numbers, dates and
        timestamps as ISO strings — pass either the native value or its
        isoformat). NOTE: range_filter prunes FILES only — apply the
        row-level predicate on the returned DataFrame too (surviving
        files still contain non-matching rows)."""
        if version is None:
            version = self.latest_version()
        if version is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        m = self.manifest(version)
        files = m["files"]
        if range_filter:
            for c, (lo, hi) in range_filter.items():
                # canonicalize to the stats' stored domain (review r6:
                # a date bound against ISO-string stats raised TypeError)
                lo, hi = _json_safe(lo), _json_safe(hi)
                files = [
                    e
                    for e in files
                    if "stats" not in e
                    or c not in e["stats"]
                    or (e["stats"][c][0] <= hi and e["stats"][c][1] >= lo)
                ]
        if partition_filter:
            unknown = set(partition_filter) - set(m["partition_by"])
            if unknown:
                # a typo'd key would otherwise prune EVERY file and read
                # as an empty table (review r6) — fail loud instead
                raise ValueError(
                    f"partition_filter keys {sorted(unknown)} are not "
                    f"partition columns {m['partition_by']} of version {version}"
                )
            want = {
                k: {_path_value(v) for v in (vs if isinstance(vs, (list, set, tuple)) else [vs])}
                for k, vs in partition_filter.items()
            }
            files = [
                e
                for e in files
                if all(e["partition"].get(k) in vs for k, vs in want.items())
            ]
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, e["path"]) for e in files]
        # mergeSchema: a snapshot may span commits with evolved schemas
        # (commit_append with a new column); the select-cast below then
        # projects the union down to exactly THIS version's schema, with
        # pre-evolution rows null-filled — the public Delta/Iceberg
        # schema-evolution read semantics.
        df = (
            spark.read.option("basePath", self.root)
            .option("mergeSchema", "true")
            .parquet(*paths)
        )
        out = df.drop("txn")
        # Normalize to the committed schema: partition discovery appends
        # partition cols at the END and type-INFERS them from the path
        # string (a "2024-01-01" day would come back DATE even if the
        # committed column is string) — the cast pins the committed type.
        return out.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )

    # ---------- table services over the log ----------

    def history(self, spark: SparkSession) -> DataFrame:
        """The commit log as a DataFrame: (version, parent, action,
        n_files, n_partition_cols, committed_at) — Delta's DESCRIBE
        HISTORY. Driver-side log read: O(versions), no data touched."""
        rows = []
        for v in self.versions():
            m = self.manifest(v)
            rows.append(
                (
                    v,
                    m["parent"],
                    m["action"],
                    len(m["files"]),
                    len(m["partition_by"]),
                    float(m["committed_at"]),
                )
            )
        return spark.createDataFrame(
            rows,
            "version int, parent int, action string, n_files int, "
            "n_partition_cols int, committed_at double",
        )

    def snapshot_diff(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int,
        key_cols: list[str],
        include_preimage: bool = False,
    ) -> DataFrame:
        """Change data feed between two committed versions: one row per
        changed key with `change_type` ∈ insert / delete /
        update_postimage, carrying the post-change values (pre-change for
        deletes) — the Delta CDF contract, derived from the two immutable
        snapshots instead of per-commit change files. With
        `include_preimage`, updates additionally emit an
        `update_preimage` row carrying the OLD values (what incremental
        aggregate maintenance needs to retract — see x55).

        Plan shape: ONE full outer join on the key; value comparison is a
        null-safe struct equality on the non-key columns (single
        expression, no per-column shuffle). At scale both sides are the
        same table two versions apart, so the join keys are co-partitioned
        by the same hash — AQE handles the rest. Unchanged keys are
        filtered out BEFORE any downstream work."""
        old = self.read(spark, version=v_from)
        new = self.read(spark, version=v_to)
        # Value columns span BOTH schemas (review r6: diffing across a
        # schema-evolution boundary used to throw on the column only one
        # side has); the missing side contributes typed nulls — an added
        # column therefore reads as an update for rows whose new value is
        # non-null, exactly the Delta CDF behavior.
        new_types = {f.name: f.dataType for f in new.schema.fields}
        old_types = {f.name: f.dataType for f in old.schema.fields}
        val_cols = [c for c in new.columns if c not in key_cols] + [
            c for c in old.columns if c not in key_cols and c not in new.columns
        ]

        def side_struct(df, types):
            # key-only table: no values to compare → insert/delete only
            vals = [
                (
                    F.col(c)
                    if c in types
                    else F.lit(None).cast(new_types.get(c) or old_types[c])
                ).alias(c)
                for c in val_cols
            ] or [F.lit(0).alias("_sentinel")]
            return F.struct(*vals)

        o = old.select(
            *[F.col(c).alias(f"_k_{c}") for c in key_cols],
            side_struct(old, old_types).alias("_old_vals"),
        )
        n = new.select(
            *[F.col(c).alias(f"_k_{c}") for c in key_cols],
            side_struct(new, new_types).alias("_new_vals"),
        )
        cond = [o[f"_k_{c}"].eqNullSafe(n[f"_k_{c}"]) for c in key_cols]
        j = o.join(n, cond, "full_outer")
        change = (
            F.when(o["_old_vals"].isNull(), F.lit("insert"))
            .when(n["_new_vals"].isNull(), F.lit("delete"))
            .when(
                ~o["_old_vals"].eqNullSafe(n["_new_vals"]),
                F.lit("update_postimage"),
            )
        )
        keys = [
            F.coalesce(n[f"_k_{c}"], o[f"_k_{c}"]).alias(c) for c in key_cols
        ]
        changed = j.select(
            *keys,
            change.alias("change_type"),
            o["_old_vals"].alias("_old_vals"),
            n["_new_vals"].alias("_new_vals"),
        ).filter(F.col("change_type").isNotNull())
        # Single pass for both images (review r6: the preimage branch
        # used to re-run the whole join): each changed row explodes into
        # its image rows — one for inserts/deletes/post, plus the
        # preimage for updates when requested.
        post = F.struct(
            F.col("change_type").alias("_ct"),
            F.coalesce(F.col("_new_vals"), F.col("_old_vals")).alias("_v"),
        )
        if include_preimage:
            pre = F.struct(
                F.lit("update_preimage").alias("_ct"),
                F.col("_old_vals").alias("_v"),
            )
            imgs = F.when(
                F.col("change_type") == "update_postimage", F.array(post, pre)
            ).otherwise(F.array(post))
        else:
            imgs = F.array(post)
        return changed.select(
            *key_cols, F.explode(imgs).alias("_img")
        ).select(
            *key_cols,
            F.col("_img._ct").alias("change_type"),
            *[F.col("_img._v")[c].alias(c) for c in val_cols],
        )

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
    ) -> int:
        """MERGE INTO as a committed version: source rows upsert into the
        latest snapshot on `key_cols` (matched → replaced by source, not
        matched → inserted; `operators/merge.py` semantics) and the
        result commits atomically — the convenience wrapper around the
        read→merge→commit_overwrite dance x52 spells out. Returns the new
        version; the pre-merge snapshot stays time-travelable."""
        from ..operators.merge import merge_upsert

        if len(key_cols) != 1:
            raise ValueError("merge_into currently supports a single key column")
        merged = merge_upsert(self.read(spark), source, key_cols[0])
        part_by = self.manifest(self.latest_version())["partition_by"] or None
        return self.commit_overwrite(merged, partition_by=part_by)

    def changes_since(
        self,
        spark: SparkSession,
        version: int,
        key_cols: list[str],
        include_preimage: bool = False,
    ) -> DataFrame:
        """Incremental-consumer sugar: the net change feed from
        `version` to the current latest (snapshot_diff against latest).
        A consumer stores the version it last processed and calls this
        each cycle — the polling form of a CDC subscription; per-commit
        granularity is `snapshot_diff(v, v+1)` over `history()`."""
        return self.snapshot_diff(
            spark,
            version,
            self.latest_version(),
            key_cols,
            include_preimage=include_preimage,
        )

    def compact(
        self, spark: SparkSession, target_file_bytes: int = 128 * 1024 * 1024
    ) -> int:
        """Small-files compaction THROUGH the commit log: rewrite the
        latest snapshot into ~target-size files and commit as a new
        version (action visible in history; old versions still
        time-travel until vacuum). The streaming sink's many per-batch
        txn dirs fold into one — readers switch atomically. Returns the
        new version. Maintenance op: assumes no concurrent writer (a
        commit landing between the snapshot read and the publish would be
        clobbered — run it like VACUUM, from the table owner)."""
        import math

        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        m = self.manifest(latest)
        total = sum(
            os.path.getsize(os.path.join(self.root, e["path"]))
            for e in m["files"]
        )
        n = max(1, math.ceil(total / target_file_bytes))
        part_by = m["partition_by"] or None
        df = self.read(spark)
        # On a partitioned table, hash-distribute BY the partition columns
        # so each value lands in one task → ~one file per partition; a
        # plain repartition(n) scatters every partition's rows across all
        # n tasks and the partitionBy write then emits up to n×values
        # files — compaction MULTIPLYING small files (review r6).
        df = df.repartition(n, *part_by) if part_by else df.repartition(n)
        return self._commit(
            df, part_by, "compact", lambda nf: (lambda e: False)
        )

    def optimize_zorder(
        self,
        spark: SparkSession,
        cols: list[str],
        n_files: int,
        bits: int = 16,
    ) -> int:
        """OPTIMIZE ZORDER BY through the commit log: rewrite the latest
        snapshot Morton-clustered on `cols` (operators/layout.py — one
        range exchange + local sort) into `n_files` files and commit as a
        new version. With `stats_cols` covering the z-columns, every
        rewritten file gets a tight multi-dim min/max box in the manifest,
        so `read(range_filter=...)` skips most files for ANY predicate on
        a subset of the z-columns — the Delta OPTIMIZE ZORDER + data-
        skipping pair. Maintenance op like `compact`: single writer."""
        from ..operators.layout import zorder_by

        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        # Preserve the table's partition spec (review r6: committing
        # unpartitioned erased partition metadata, so a later
        # partition_filter read silently returned 0 rows and the
        # streaming sink's next replace_partitions double-counted).
        part_by = self.manifest(latest)["partition_by"] or None
        df = zorder_by(self.read(spark), cols, n_files, bits)
        return self._commit(
            df, part_by, "optimize", lambda nf: (lambda e: False)
        )

    # ---------- maintenance ----------

    def vacuum(
        self, keep_versions: int = 1, min_age_seconds: float = 3600.0
    ) -> list[str]:
        """Remove txn dirs referenced by NO retained manifest — orphans
        from crashed commits and files superseded past the retention
        window. Retains the newest `keep_versions` manifests (≥1; readers
        of vacuumed history get a loud FileNotFoundError, same contract
        as Delta's VACUUM). Returns removed txn dir names.

        `min_age_seconds` is the in-flight-writer guard (review r6): an
        unreferenced txn dir younger than this is indistinguishable from
        a commit BETWEEN its data write and its manifest publish —
        deleting it would let the writer publish a manifest listing
        deleted files. Delta's retention window serves the same purpose;
        lower it only when no writer can be active (tests, sole owner)."""
        import shutil

        vs = self.versions()
        keep = vs[-max(1, keep_versions):] if vs else []
        live: set[str] = set()
        for v in keep:
            for e in self.manifest(v)["files"]:
                first = e["path"].split("/")[1] if "/" in e["path"] else ""
                live.add(first)  # "txn=<id>"
        removed = []
        now = time.time()
        if os.path.isdir(self.data_dir):
            for name in os.listdir(self.data_dir):
                if name.startswith("txn=") and name not in live:
                    path = os.path.join(self.data_dir, name)
                    try:
                        age = now - os.path.getmtime(path)
                    except OSError:
                        continue  # concurrently removed
                    if age < min_age_seconds:
                        continue  # possible commit-in-progress
                    shutil.rmtree(path)
                    removed.append(name)
        for v in vs:
            if v not in keep:
                os.unlink(self._version_path(v))
        return removed
