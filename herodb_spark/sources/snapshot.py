"""Copy-on-write snapshot tables: a minimal lakehouse commit protocol
in plain parquet + a JSON manifest — the executable form of the
reference's durability surface (Rewrite.md: ordered log of updates,
replay on recovery; draft:132-150 `set/update/remove` statements).
Delta/Iceberg jars are absent from this image, so the mechanism they
implement is built here directly:

- A table is a MANIFEST (versioned JSON) pointing at immutable parquet
  partition directories. Readers resolve the manifest, never a live
  directory listing — writers can work ahead without breaking them.
- Commits are copy-on-write: a mutation writes NEW directories for the
  partitions it touches and re-links every untouched partition from
  the previous version — file-level reuse, exactly how snapshot
  formats make MERGE affordable at 100 TB (rewrite ∝ touched
  partitions, not table size).
- The commit point is an atomic manifest rename (os.replace): a crash
  before it leaves the previous version intact. Writers race through
  optimistic concurrency: a commit re-validates under a lock file
  (O_CREAT|O_EXCL) that the version it read is still current and
  raises ConcurrentWriteError otherwise — the same
  validate-then-swap protocol lakehouse logs implement with CAS.
- Old versions stay readable: time travel = resolving an older
  manifest entry.

Operations mirror operators/mutation.py's oracle-checked semantics:
`merge_upsert` (set = MERGE INTO), `update_where` (update :- pred),
`delete_where` (remove :- pred).
"""

from __future__ import annotations

import contextlib
import datetime
import json
import os
import shutil
import time
import urllib.parse
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"
_UNPARTITIONED = "_all"


def _enc_stat(v):
    """Canonical JSON-safe, ORDER-ISOMORPHIC encoding of a zone-map
    scalar (r14: extends stats to date/timestamp keys, r13 verdict #6).
    date/datetime values become FIXED-WIDTH ISO strings — zero-padded
    via explicit formatting, not strftime, whose %Y is not fixed-width
    for years < 1000 — so lexicographic order on the encodings equals
    temporal order on the values. Every producer of manifest stats /
    key hulls encodes through here and every consumer that compares
    caller-supplied bounds against recorded stats (`_skippable`,
    database._hull_avoids_ranges) encodes the bounds the same way, so
    all comparisons are same-type and exact. int/float/str/None pass
    through unchanged — existing manifests are byte-identical.

    Why not decimal: there is no order-preserving JSON-scalar encoding
    that is also safe under the consumers' duck-typed comparisons
    (str(Decimal) breaks lexicographic order; an unscaled int would
    silently compare NUMERICALLY against a caller's Decimal bound at
    the wrong scale — a wrong-skip trap, not a TypeError). Decimal
    keys therefore stay out of `_STAT_TYPES`."""
    if isinstance(v, datetime.datetime):
        return (
            f"{v.year:04d}-{v.month:02d}-{v.day:02d} "
            f"{v.hour:02d}:{v.minute:02d}:{v.second:02d}.{v.microsecond:06d}"
        )
    if isinstance(v, datetime.date):
        return f"{v.year:04d}-{v.month:02d}-{v.day:02d}"
    return v


def _parse_type(spark: SparkSession, typ: str):
    """Spark SQL type string -> DataType (e.g. "double", "array<int>")."""
    from pyspark.sql import types as T

    try:
        return T.DataType.fromDDL(typ)
    except AttributeError:  # older PySpark
        return T._parse_datatype_string(typ)


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this mutation's read and its
    commit — re-read and retry (optimistic concurrency)."""


class SnapshotTable:
    """Handle to a snapshot table rooted at `path`."""

    # overridable so SnapshotDatabase (sources/database.py) can reuse
    # the exact same validated OCC commit protocol for its own
    # manifest-of-manifests without duplicating the critical section
    _manifest_name = _MANIFEST

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, self._manifest_name)

    def _load(self) -> dict:
        with open(self._manifest_path()) as f:
            return json.load(f)

    @staticmethod
    def _seq(m: dict) -> int:
        """Monotone commit counter. Distinct from `current`: VACUUM
        rewrites the manifest WITHOUT producing a new data version, so
        OCC must fence on commits, not on versions — otherwise a
        mutation that read pre-vacuum could commit a manifest that
        resurrects dropped versions whose files are gone. Defaults to
        `current` for manifests written before the counter existed."""
        return int(m.get("seq", m["current"]))

    @contextlib.contextmanager
    def _commit_critical(self):
        """The commit-lock critical section, reusable outside _commit:
        acquire `_commit.lock` (O_EXCL create, 60s stale-break), yield,
        release. Besides manifest installs, SnapshotDatabase serializes
        its vacuum directory sweep and create_table's name-publish
        rename under this SAME lock — that mutual exclusion is what
        closes the sweep-vs-create TOCTOU (a sweep that snapshotted
        live names can never interleave a deletion between another
        writer's name-check and its directory publish)."""
        lock = os.path.join(self.path, "_commit.lock")
        fd = None
        lock_ino = None
        try:
            for _ in range(2000):  # ~20s of 10ms retries
                try:
                    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    lock_ino = os.fstat(fd).st_ino
                    break
                except FileExistsError:
                    # a writer killed inside its critical section (the
                    # section is manifest-swap only, sub-second) would
                    # wedge every future commit — treat a lock older
                    # than 60s as abandoned and break it. The break is
                    # an atomic rename-aside: of N waiters that all see
                    # the lock as stale, exactly ONE wins the rename
                    # (the rest get ENOENT), so no waiter can ever
                    # delete a lock a new writer just created.
                    try:
                        if time.time() - os.path.getmtime(lock) > 60:
                            aside = lock + f".stale-{uuid.uuid4().hex[:8]}"
                            try:
                                os.rename(lock, aside)
                                os.unlink(aside)
                            except OSError:
                                pass  # another breaker won the rename
                            continue
                    except OSError:
                        continue
                    time.sleep(0.01)
            if fd is None:
                raise ConcurrentWriteError(f"{self.path}: commit lock held too long")
            yield
        finally:
            if fd is not None:
                os.close(fd)
                # unlink only if we still OWN the lock path: a stale-
                # breaker may have renamed ours aside while we were
                # (slowly) inside the critical section, and the path may
                # now be another writer's lock
                try:
                    if os.stat(lock).st_ino == lock_ino:
                        os.unlink(lock)
                except OSError:
                    pass

    def _commit(self, manifest: dict, expected_current: int | None = None,
                expected_seq: int | None = None,
                pre_install=None) -> None:
        """Atomic commit; with `expected_current`, an optimistic-
        concurrency commit: under a short-lived lock file, re-validate
        that the version AND the commit counter this mutation read are
        still current, else raise ConcurrentWriteError (the caller's
        writes land in version-scoped directories no reader resolves,
        so an aborted commit leaks only unreferenced files). Every OCC
        commit bumps `seq`, so ANY intervening manifest rewrite —
        including vacuum — fences out stale writers.

        `pre_install` (optional, OCC commits only) runs INSIDE the
        critical section, after validation and before the manifest
        install — a raise aborts the commit with nothing published.
        create_table uses it to atomically publish its staged data
        directory with the manifest pin, under the same lock the
        vacuum sweep holds."""
        # writer-UNIQUE tmp name: with a shared fixed name, two racing
        # writers could overwrite each other's serialized manifest
        # before either reached the lock, making the lock-holder
        # install the loser's manifest (silent lost update)
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        if expected_current is None:
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1, sort_keys=True)
            os.replace(tmp, self._manifest_path())  # atomic commit point
            return
        try:
            with self._commit_critical():
                on_disk = self._load()
                if on_disk["current"] != expected_current or (
                    expected_seq is not None and self._seq(on_disk) != expected_seq
                ):
                    raise ConcurrentWriteError(
                        f"{self.path}: manifest advanced past (version {expected_current}, "
                        f"seq {expected_seq}) during this mutation"
                    )
                if pre_install is not None:
                    pre_install()
                manifest["seq"] = self._seq(on_disk) + 1
                # serialize INSIDE the critical section, after validation,
                # to the writer-private file — nothing outside the lock can
                # replace these bytes between write and install
                with open(tmp, "w") as f:
                    json.dump(manifest, f, indent=1, sort_keys=True)
                os.replace(tmp, self._manifest_path())
        finally:
            try:  # failed/aborted commit: drop the private tmp file
                os.unlink(tmp)
            except OSError:
                pass

    # -- creation ----------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key_cols: list[str],
        partition_col: str | None = None,
    ) -> "SnapshotTable":
        """Write version 0. `partition_col` bounds every future
        mutation's rewrite to the touched partitions."""
        t = cls(spark, path)
        os.makedirs(path, exist_ok=True)
        if partition_col is None:
            # single-job create (r13): the write observes its own stats
            parts, files, stats, _kr, _n = t._write_unpartitioned_observed(
                df, 0, t._stat_cols(df, key_cols)
            )
        else:
            parts, files = t._write_partitions(df, 0, partition_col)
            stats = t._partition_stats(
                parts, df.schema, t._stat_cols(df, key_cols, partition_col)
            )
        t._commit(
            {
                "key_cols": key_cols,
                "partition_col": partition_col,
                "current": 0,
                # schema is MANIFEST metadata (like real table formats):
                # reads of an all-partitions-deleted version and schema
                # checks never need to open a data file
                "schema": df.schema.json(),
                "versions": {
                    "0": {
                        "op": "create",
                        "partitions": parts,
                        "files": files,
                        "stats": stats,
                        "schema": df.schema.json(),
                    }
                },
            }
        )
        return t

    #: parquet row-group (block) size for snapshot data files. 16 MB
    #: instead of the 128 MB JVM default: row groups are the only
    #: sub-file split unit any reader has, so monolithic row groups
    #: cap scan parallelism at one task per file — both for the
    #: Python-data-source connector (which bins row groups into
    #: right-sized tasks, see pyds._SnapshotReader.partitions) and
    #: for the JVM scan of a file that compact() grew past
    #: maxPartitionBytes. 16 MB keeps per-task decode memory bounded
    #: while costing ~nothing in compression at typical column widths
    #: (lakehouse engines ship comparable defaults, e.g. DuckDB's
    #: ~122k-row groups).
    PARQUET_BLOCK_BYTES = 16 * 1024 * 1024

    def _writer(self, df: DataFrame):
        return (
            df.write.mode("overwrite")
            .option("parquet.block.size", str(self.PARQUET_BLOCK_BYTES))
        )

    def _write_partitions(
        self, df: DataFrame, version: int, partition_col: str | None, only: set | None = None
    ) -> dict:
        """Write `df` under data/v=<version>-<token>/, one directory
        per partition value (or one directory for unpartitioned
        tables), in ONE Spark job: a `partitionBy` dynamic-partition
        write on a shadow string column, with the manifest entries
        derived from the produced directory listing afterwards (the
        manifest-from-written-files pattern real lakehouse commits
        use). The previous shape — collect distinct values, then one
        `df.where(p==v).write` job per value — paid O(partitions)
        scheduler round-trips and re-evaluated the mutation plan per
        partition; a 5,000-partition MERGE at 100 TB would launch
        5,000 jobs. The shadow column keeps the REAL partition column
        inside the data files, so manifest-resolved leaf-directory
        reads see the full original schema with zero partition-
        discovery dependence.

        The version token is WRITER-UNIQUE: two racing mutations that
        both compute the same next version write disjoint directories,
        so the OCC loser's files can never alias into the winner's
        committed snapshot (they become unreferenced garbage).
        Returns ({partition_value_str: relative_dir},
        {partition_value_str: n_parquet_files}) — the file counts are
        recorded in the manifest at write time so fragmentation checks
        (compact()) never need to list directories on the read path
        (one listing per commit here vs N listings per compact() call
        on object storage). `only` restricts the write to those
        partition values."""
        vdir = f"v={version}-{uuid.uuid4().hex[:8]}"

        def _count(reldir: str) -> int:
            d = os.path.join(self.path, reldir)
            return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

        if partition_col is None:
            rel = f"data/{vdir}/{_UNPARTITIONED}"
            self._writer(df).parquet(os.path.join(self.path, rel))
            return {_UNPARTITIONED: rel}, {_UNPARTITIONED: _count(rel)}
        pstr = F.col(partition_col).cast("string")
        if only is not None:
            df = df.where(pstr.isin(*only) if only else F.lit(False))
        base = os.path.join(self.path, "data", vdir)
        self._writer(df.withColumn("__p", pstr)).partitionBy("__p").parquet(base)
        out: dict[str, str] = {}
        nfiles: dict[str, int] = {}
        for d in sorted(os.listdir(base)):
            if not d.startswith("__p="):
                continue
            val = urllib.parse.unquote(d[len("__p="):])
            if val == "__HIVE_DEFAULT_PARTITION__":
                # Spark's dynamic-partition writer routes BOTH NULL and
                # empty-string values here, so neither can round-trip
                # through directory names — say so precisely
                raise ValueError(
                    f"{self.path}: NULL or empty-string {partition_col!r} values are "
                    "not supported as snapshot partition keys (the dynamic-partition "
                    "layout cannot represent them distinctly)"
                )
            out[val] = f"data/{vdir}/{d}"
            nfiles[val] = _count(out[val])
        return out, nfiles

    # zone-map stat columns: scalar types with a JSON-safe,
    # order-isomorphic manifest encoding (`_enc_stat`). date/timestamp
    # joined in r14 (r13 verdict #6) — their stats are recorded as
    # fixed-width ISO strings; decimal stays out, see _enc_stat's note.
    _STAT_TYPES = (
        "int", "bigint", "smallint", "tinyint", "float", "double",
        "string", "date", "timestamp",
    )

    def _stat_cols(
        self, df: DataFrame, cols: list[str], partition_col: str | None = None
    ) -> list[str]:
        """Key columns + the partition column (whose per-partition
        min == max == the value, giving typed equality/range pruning
        through the same zone-map path the directory layout can't
        offer for non-string comparisons), filtered to stat-able
        types."""
        dtypes = dict(df.dtypes)
        want = list(cols)
        if partition_col and partition_col not in want:
            want.append(partition_col)
        return [c for c in want if dtypes.get(c) in self._STAT_TYPES]

    def _write_unpartitioned_observed(
        self, df: DataFrame, version: int, stat_cols: list[str],
        upd_flag: str | None = None,
    ) -> tuple:
        """Single-job unpartitioned write (r13 fixed-cost cut): the
        parquet write carries an observe() node computing the
        version's zone-map stats in the SAME pass — no stats read-back
        job. When `upd_flag` names a boolean tag column, the
        observation additionally yields the update-key hulls and the
        update-row count (merge_upsert's emptiness + key_ranges), and
        the tag column is dropped before writing. min/max observations
        are idempotent under task retries; the count is used only as a
        zero/nonzero emptiness signal, which retries cannot corrupt.
        Returns (parts, files, stats, key_ranges|None, n_upd|None)."""
        from pyspark.sql import Observation

        aggs = []
        if upd_flag is not None:
            aggs.append(F.sum(F.col(upd_flag).cast("long")).alias("n_upd"))
        for c in stat_cols:
            aggs.append(F.min(c).alias(f"amn_{c}"))
            aggs.append(F.max(c).alias(f"amx_{c}"))
            if upd_flag is not None:
                aggs.append(F.min(F.when(F.col(upd_flag), F.col(c))).alias(f"umn_{c}"))
                aggs.append(F.max(F.when(F.col(upd_flag), F.col(c))).alias(f"umx_{c}"))
        obs = None
        if aggs:
            obs = Observation()
            df = df.observe(obs, *aggs)
        if upd_flag is not None:
            df = df.drop(upd_flag)
        parts, files = self._write_partitions(df, version, None)
        got = obs.get if obs is not None else {}
        stats = (
            {_UNPARTITIONED: {
                c: [_enc_stat(got[f"amn_{c}"]), _enc_stat(got[f"amx_{c}"])]
                for c in stat_cols
            }}
            if stat_cols
            else {}
        )
        key_ranges = None
        n_upd = None
        if upd_flag is not None:
            n_upd = int(got.get("n_upd") or 0)
            key_ranges = {
                _UNPARTITIONED: {
                    c: [_enc_stat(got[f"umn_{c}"]), _enc_stat(got[f"umx_{c}"])]
                    for c in stat_cols
                }
            }
        return parts, files, stats, key_ranges, n_upd

    #: per-partition observed stats are expressed as |touched| ×
    #: |stat_cols| × 2 conditional aggregates riding the write job;
    #: past this partition count the expression fan-out stops paying
    #: for itself and the one-job stats read-back takes over
    _OBSERVED_STATS_MAX_PARTS = 64

    def _write_partitions_stats(
        self, df: DataFrame, version: int, pcol: str, touched: set,
        stat_cols: list[str], schema,
    ) -> tuple:
        """Partitioned write + per-partition zone-map stats in ONE
        Spark job (the r13-optimization partitioned twin of
        `_write_unpartitioned_observed`): when the touched-partition
        set is known and small, the write carries an observe() node
        computing min/max of every stat column CONDITIONED on each
        touched partition value — no stats read-back scan of the
        freshly written files. Falls back to write + `_partition_stats`
        (one read-back job) when the fan-out would exceed
        `_OBSERVED_STATS_MAX_PARTS` partitions. min/max observations
        are idempotent under task retries. Stats are keyed off the
        DIRECTORIES the write actually produced, so a touched
        partition whose rows all vanished (e.g. a delete emptying it)
        gets no stats entry — identical to the read-back behavior.
        Returns (parts, files, stats)."""
        from pyspark.sql import Observation

        # `not touched` rides the fallback too (r13 ADVICE): an empty
        # touched set would make `aggs` empty and observe() raise —
        # both current callers return before that, but the function
        # must not half-handle the case for future ones
        if not stat_cols or not touched or len(touched) > self._OBSERVED_STATS_MAX_PARTS:
            parts, files = self._write_partitions(df, version, pcol, only=touched)
            return parts, files, self._partition_stats(parts, schema, stat_cols)
        pstr = F.col(pcol).cast("string")
        # restrict BEFORE observing so the aggregates see exactly the
        # written rows (the only= filter inside _write_partitions would
        # otherwise sit above the observe node)
        df = df.where(pstr.isin(*touched) if touched else F.lit(False))
        vals = sorted(touched)
        aggs = []
        for i, v in enumerate(vals):
            hit = pstr == F.lit(v)
            for c in stat_cols:
                aggs.append(F.min(F.when(hit, F.col(c))).alias(f"mn_{i}_{c}"))
                aggs.append(F.max(F.when(hit, F.col(c))).alias(f"mx_{i}_{c}"))
        obs = Observation()
        parts, files = self._write_partitions(
            df.observe(obs, *aggs), version, pcol
        )
        got = obs.get
        stats = {
            v: {
                c: [_enc_stat(got[f"mn_{i}_{c}"]), _enc_stat(got[f"mx_{i}_{c}"])]
                for c in stat_cols
            }
            for i, v in enumerate(vals)
            if v in parts
        }
        return parts, files, stats

    def _abandon_version_dir(self, parts: dict) -> None:
        """Remove a freshly staged (never-committed) version directory
        — the write-then-skip path of an empty/no-op mutation."""
        for rel in parts.values():
            vdir = os.path.dirname(os.path.join(self.path, rel))
            shutil.rmtree(vdir, ignore_errors=True)

    def _union_hulls(self, dfs: list, pcol: str | None, stat_keys: list[str]) -> dict:
        """{partition_value_str: {key_col: [min, max]}} over the UNION
        of the given frames' rows, in ONE Spark job — the shared
        key-hull primitive of merge_upsert and _rewrite_touched.
        Unioning before grouping min/max-merges the sides per
        partition (identical to folding per-side hulls elementwise),
        the produced partition set is the mutation's `touched` set,
        and an empty dict means no side had a row. With no stat-able
        key columns the hulls are empty dicts (partition list only)."""
        grp = F.lit(_UNPARTITIONED) if pcol is None else F.col(pcol).cast("string")
        cols = [grp.alias("_p")] + [F.col(c) for c in stat_keys]
        df = dfs[0].select(cols)
        for d in dfs[1:]:
            df = df.unionByName(d.select(cols))
        if not stat_keys:
            return {r["_p"]: {} for r in df.select("_p").distinct().collect()}
        aggs = []
        for c in stat_keys:
            aggs.append(F.min(c).alias(f"mn_{c}"))
            aggs.append(F.max(c).alias(f"mx_{c}"))
        rows = df.groupBy("_p").agg(*aggs).collect()
        return {
            r["_p"]: {
                c: [_enc_stat(r[f"mn_{c}"]), _enc_stat(r[f"mx_{c}"])]
                for c in stat_keys
            }
            for r in rows
        }

    #: driver-side literal-hull path: collect() bail-out row cap
    _LITERAL_HULL_MAX_ROWS = 10_000
    #: declared types whose driver-side comparisons provably match
    #: Spark's ordering (ints: numeric order; strings: Python compares
    #: by code point, UTF-8 binary order preserves code-point order,
    #: and Spark's string ordering is the UTF-8 binary order — equal).
    #: float/double stay EXCLUDED: ±0.0 and NaN ordering diverge.
    _DRIVER_CMP_TYPES = ("tinyint", "smallint", "int", "bigint", "string")

    @staticmethod
    def _local_rows(df: DataFrame, cap: int):
        """`df`'s rows when its optimized plan is a pure LocalRelation
        — collect() is then driver-side (LocalTableScanExec returns
        its in-memory rows; NO Spark job) — else None. Also None past
        `cap` rows: the driver-side hull fold must stay trivial."""
        try:
            plan = df._jdf.queryExecution().optimizedPlan()
            if plan.getClass().getSimpleName() != "LocalRelation":
                return None
        except Exception:
            return None
        rows = df.collect()
        return None if len(rows) > cap else rows

    def _insert_only_hulls(
        self, m: dict, at_version: int, updates: DataFrame,
        keys: list[str], pcol: str, stat_keys: list[str],
    ):
        """merge_upsert's union key hulls computed DRIVER-SIDE with NO
        Spark job (r14 opt, guide §1.2 "remove passes" / §6 trust the
        recorded metadata), exactly when provable:

        - `updates` is a literal LocalRelation (seeds, audit rows,
          config facts — the literal_df pattern), so its rows are
          driver-resident;
        - the current version's zone maps PROVE every update key tuple
          is absent from EVERY partition (some stat key column's value
          falls strictly outside that partition's recorded [min, max],
          or the partition's values for that column are all NULL) —
          i.e. the merge is a pure INSERT, so the matched-target side
          of `_union_hulls` is provably empty;
        - every stat key column and the partition column have a
          declared type whose driver-side comparison provably matches
          Spark's ordering (`_DRIVER_CMP_TYPES`), every compared value
          is non-null and of the matching Python type, and the
          manifest bounds are of the matching JSON type.

        The result is then EXACTLY what the one-job union-hull scan
        would return — per-partition [min, max] of the update rows'
        keys, keyed by the partition value's string cast (int → str(v)
        is Spark's cast; string → identity) — so the committed
        manifest is identical. Any unprovable case returns None and
        the caller runs the scan. At 100 TB this removes the pre-write
        pass of every bounded literal insert (the hot path of control
        tables, audit logs and metadata commits)."""
        if not stat_keys:
            return None  # nothing to prove absence with
        schema = self._schema_at(m, at_version)
        if schema is None:
            return None
        dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
        if dtypes.get(pcol) not in self._DRIVER_CMP_TYPES:
            return None
        if any(dtypes.get(c) not in self._DRIVER_CMP_TYPES for c in stat_keys):
            return None
        rows = self._local_rows(updates, self._LITERAL_HULL_MAX_ROWS)
        if rows is None:
            return None

        def _typed(v, t):
            # the declared-type ↔ Python-type pairing both the update
            # values and the JSON manifest bounds must satisfy
            if t == "string":
                return isinstance(v, str)
            return isinstance(v, int) and not isinstance(v, bool)

        for r in rows:
            pv = r[pcol]
            if pv is None or not _typed(pv, dtypes[pcol]):
                return None
            if any(
                r[c] is None or not _typed(r[c], dtypes[c]) for c in stat_keys
            ):
                return None
        entry = m["versions"].get(str(at_version)) or {}
        parts_now = entry.get("partitions") or {}
        stats_now = entry.get("stats") or {}
        for part in parts_now:
            st = stats_now.get(part)
            if st is None:
                return None
            for r in rows:
                proven = False
                for c in stat_keys:
                    b = st.get(c)
                    if not isinstance(b, (list, tuple)) or len(b) != 2:
                        continue
                    mn, mx = b
                    if mn is None and mx is None:
                        # no non-null values of c in this partition —
                        # a non-null key can never match (join equality
                        # is never true against NULL)
                        proven = True
                        break
                    if mn is None or mx is None:
                        continue  # malformed bounds: not usable
                    t = dtypes[c]
                    if not _typed(mn, t) or not _typed(mx, t):
                        continue
                    if r[c] < mn or r[c] > mx:
                        proven = True
                        break
                if not proven:
                    return None
        hulls: dict = {}
        for r in rows:
            pv = r[pcol]
            pv_str = pv if isinstance(pv, str) else str(pv)
            h = hulls.setdefault(pv_str, {})
            for c in stat_keys:
                v = r[c]
                if c in h:
                    lo, hi = h[c]
                    h[c] = [v if v < lo else lo, v if v > hi else hi]
                else:
                    h[c] = [v, v]
        return hulls

    #: declared column type → the parquet physical type its footer
    #: statistics must carry for `_footer_stats` to trust them.
    #: date (r14): INT32 days-since-epoch, signed order = date order;
    #: `_footer_file_minmax` additionally requires pyarrow to have
    #: decoded the bounds AS dates (positive proof the chunk's logical
    #: type is DATE, since a plain int32 column shares the physical
    #: type). timestamp is deliberately ABSENT: Spark's default
    #: outputTimestampType writes INT96 (whose footer min/max the
    #: parquet spec deprecates), and an INT64-micros chunk's bounds
    #: would still need the isAdjustedToUTC → session-timezone
    #: conversion the scan applies — not provably exact across writer
    #: configs, so timestamp stat columns always take the scan/observed
    #: paths.
    _FOOTER_PHYS = {
        "int": "INT32", "smallint": "INT32", "tinyint": "INT32",
        "bigint": "INT64", "float": "FLOAT", "double": "DOUBLE",
        "string": "BYTE_ARRAY", "date": "INT32",
    }
    #: string footer stats at/over this many UTF-8 bytes are not
    #: trusted: a truncating writer configuration would yield inexact
    #: bounds, and values this short can never have been truncated
    _FOOTER_STR_MAX = 64

    def _footer_file_minmax(self, path: str, want: dict):
        """({col: (mn, mx)}, n_rows) for one parquet file from its
        FOOTER column-chunk statistics (`want` = {col:
        declared_type}), or None when any cell cannot be proven
        EXACTLY equal to what a scan's F.min/F.max would compute:
        missing/withheld min-max on a chunk with non-null values
        (writers omit stats for NaN-bearing doubles or oversized
        binary), physical type not matching the declared type, string
        bounds at/over _FOOTER_STR_MAX bytes, or float/double bounds
        equal to 0.0 (the spec lets writers normalize the sign of
        zero). All-null chunks contribute nothing, like F.min/F.max;
        a column all-null everywhere yields (None, None)."""
        import math

        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        acc: dict[str, tuple] = {c: (None, None) for c in want}
        for gi in range(md.num_row_groups):
            rg = md.row_group(gi)
            cols = {}
            for ci in range(rg.num_columns):
                cc = rg.column(ci)
                if cc.path_in_schema in want:
                    cols[cc.path_in_schema] = cc
            for c, typ in want.items():
                cc = cols.get(c)
                if cc is None:
                    return None
                st = cc.statistics
                n_vals = cc.num_values
                if n_vals == 0:
                    continue
                if st is None or not getattr(st, "has_null_count", True):
                    return None
                if st.null_count is None:
                    return None
                if st.null_count == n_vals:
                    continue  # all-null chunk: nothing to fold in
                if not st.has_min_max:
                    return None
                if cc.physical_type != self._FOOTER_PHYS.get(typ):
                    return None
                mn, mx = st.min, st.max
                if typ == "string":
                    if not isinstance(mn, str) or not isinstance(mx, str):
                        return None
                    if (
                        len(mn.encode("utf-8")) >= self._FOOTER_STR_MAX
                        or len(mx.encode("utf-8")) >= self._FOOTER_STR_MAX
                    ):
                        return None
                elif typ in ("float", "double"):
                    if math.isnan(mn) or math.isnan(mx) or mn == 0.0 or mx == 0.0:
                        return None
                elif typ == "date":
                    # positive proof the chunk is logical DATE: pyarrow
                    # decodes DATE stats to datetime.date; a plain int32
                    # chunk yields ints (physical type alone can't tell
                    # them apart). datetime subclasses date — exclude it.
                    if not all(
                        isinstance(b, datetime.date)
                        and not isinstance(b, datetime.datetime)
                        for b in (mn, mx)
                    ):
                        return None
                    # encode here so the fold below and both callers see
                    # the canonical manifest form (order-isomorphic, so
                    # folding encodings == encoding the fold)
                    mn, mx = _enc_stat(mn), _enc_stat(mx)
                amn, amx = acc[c]
                acc[c] = (
                    mn if amn is None or mn < amn else amn,
                    mx if amx is None or mx > amx else amx,
                )
        return acc, md.num_rows

    def _footer_stats(self, parts: dict, schema, stat_cols: list[str]):
        """Per-partition [min, max] zone maps read from the parquet
        FOOTERS of freshly written directories — pure driver file I/O,
        NO Spark job (guide §1.2 "remove passes" / §6: trust the file
        metadata lakehouse formats trust). Returns None (caller falls
        back to the one-job scan) unless EVERY cell is provably exact
        — see `_footer_file_minmax` for the gates. At 100 TB this
        turns the post-write stats pass of a wide MERGE from a full
        re-scan of everything just written into O(files) footer
        reads."""
        if not stat_cols or not parts:
            return {}
        if schema is None:
            return None  # legacy manifest: declared types unknown
        dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
        want = {c: dtypes.get(c) for c in stat_cols}
        if any(t not in self._FOOTER_PHYS for t in want.values()):
            return None
        stats: dict = {}
        for pv, rel in parts.items():
            d = os.path.join(self.path, rel)
            acc: dict[str, tuple] = {c: (None, None) for c in stat_cols}
            total_rows = 0
            try:
                names = [f for f in os.listdir(d) if f.endswith(".parquet")]
                for fname in names:
                    got = self._footer_file_minmax(os.path.join(d, fname), want)
                    if got is None:
                        return None
                    got, nrows = got
                    total_rows += nrows
                    if nrows == 0:
                        # mirror the scan fallback (r13 ADVICE): a
                        # row-less file contributes no group rows there,
                        # so it must fold nothing here either
                        continue
                    for c, (mn, mx) in got.items():
                        amn, amx = acc[c]
                        if mn is not None:
                            amn = mn if amn is None or mn < amn else amn
                            amx = mx if amx is None or mx > amx else amx
                        acc[c] = (amn, amx)
            except (OSError, ValueError):
                return None
            if total_rows == 0:
                # a partition dir whose every file is row-less yields no
                # groupBy row in the scan fallback — record no entry,
                # keeping the two paths shape-identical by construction
                continue
            stats[pv] = {c: [mn, mx] for c, (mn, mx) in acc.items()}
        return stats

    def _partition_stats(
        self, parts: dict, schema, stat_cols: list[str]
    ) -> dict:
        """ZONE MAPS: per-written-partition [min, max] of `stat_cols`,
        recorded in the manifest at commit time — the durable-layer
        analog of the reference's `index Ordered(...)` (draft:28-47)
        and of lakehouse file statistics. Since the r13 optimization
        pass the stats come from the written files' parquet FOOTERS
        (`_footer_stats` — no Spark job) whenever every cell is
        provably exact; otherwise ONE Spark job over the freshly
        written directories (column-pruned scan of the stat columns
        only), grouped by the source directory via input_file_name —
        no per-partition job fan-out. Read-side: `read(ranges=...)`
        skips partitions whose recorded interval cannot intersect the
        predicate. Returns {pv: {col: [min, max]}} (values may be
        None for all-NULL)."""
        if not stat_cols or not parts:
            return {}
        footer = self._footer_stats(parts, schema, stat_cols)
        if footer is not None:
            return footer
        dirs = {os.path.join(self.path, rel): pv for pv, rel in parts.items()}
        reader = self.spark.read if schema is None else self.spark.read.schema(schema)
        df = reader.parquet(*dirs).select(
            F.input_file_name().alias("_f"), *stat_cols
        )
        aggs = []
        for c in stat_cols:
            aggs.append(F.min(c).alias(f"mn_{c}"))
            aggs.append(F.max(c).alias(f"mx_{c}"))
        rows = df.withColumn("_d", F.expr("substring_index(_f, '/', size(split(_f, '/')) - 1)")).groupBy(
            "_d"
        ).agg(*aggs).collect()
        # map each produced directory back to its partition value;
        # normalize the file:// scheme the scan may prepend
        by_dir = {}
        for full, pv in dirs.items():
            by_dir[os.path.abspath(full)] = pv
        stats: dict = {}
        for r in rows:
            d = r["_d"]
            if d.startswith("file:"):
                d = d[len("file:"):]
            pv = by_dir.get(os.path.abspath(d))
            if pv is None:
                continue
            stats[pv] = {
                c: [_enc_stat(r[f"mn_{c}"]), _enc_stat(r[f"mx_{c}"])]
                for c in stat_cols
            }
        return stats

    # -- reads -------------------------------------------------------------
    @staticmethod
    def _schema_at(m: dict, v: int):
        """StructType in effect at version `v`: the newest
        version-entry schema at or below v (schema-changing commits —
        create, add_columns — record one), falling back to the
        manifest-level schema, or None for manifests that pre-date
        schema tracking (those read by file inference). Static — the
        pyds connector resolves schemas through this same rule."""
        from pyspark.sql import types as T

        js = None
        for vv in sorted((int(k) for k in m["versions"]), reverse=True):
            if vv <= v and "schema" in m["versions"][str(vv)]:
                js = m["versions"][str(vv)]["schema"]
                break
        if js is None:
            js = m.get("schema")
        return None if js is None else T.StructType.fromJson(json.loads(js))

    @staticmethod
    def _skippable(pstats: dict, ranges: dict) -> bool:
        """True when a partition's zone maps PROVE no row can satisfy
        the conjunction of `ranges` ({col: (lo, hi)}, inclusive, either
        bound None for unbounded). Unknown columns/partitions are never
        skippable; an all-NULL column (min is None) is skippable for
        any range on it — NULL never satisfies a range predicate.
        A bound whose Python type doesn't order against the recorded
        stats (e.g. a string constant against a numeric key) proves
        nothing — such partitions are scanned, and the engine's own
        cast semantics decide the comparison. date/datetime bounds are
        encoded to the same fixed-width ISO form the manifest records
        (`_enc_stat`), so range pruning on date/timestamp keys is a
        same-type string comparison."""
        for col, (lo, hi) in ranges.items():
            if col not in pstats:
                continue
            lo, hi = _enc_stat(lo), _enc_stat(hi)
            mn, mx = pstats[col]
            if mn is None:
                return True
            try:
                if hi is not None and mn > hi:
                    return True
                if lo is not None and mx < lo:
                    return True
            except TypeError:
                continue  # incomparable bound: never skip on it
        return False

    def read(self, version: int | None = None, ranges: dict | None = None) -> DataFrame:
        """Current snapshot, or time travel to `version`. Resolves the
        manifest to concrete directories; the scan itself is ordinary
        parquet (pushdown/pruning intact), and listing only manifest
        dirs doubles as partition pruning bookkeeping. The scan uses
        the MANIFEST schema in effect at the version (real table
        formats do the same): files written before an `add_columns`
        evolution simply surface NULL for the added columns, and a
        pre-evolution version read returns exactly its old columns.

        `ranges` ({col: (lo, hi)} inclusive; None bound = unbounded)
        enables ZONE-MAP SKIPPING: partitions whose recorded per-
        partition [min, max] (written at commit time for the table's
        key columns) cannot intersect the ranges are not scanned at
        all — the `index Ordered(...)` read path (draft:28-47) at the
        durable layer, same mechanics as lakehouse file skipping. The
        result still needs the caller's own row-level filter (pruning
        is an IO optimization, not a predicate); partitions lacking
        stats (legacy manifests, non-stat-typed columns) are always
        scanned, so skipping never loses a qualifying row."""
        m = self._load()
        v = m["current"] if version is None else version
        entry = m["versions"].get(str(v))
        if entry is None:
            raise ValueError(
                f"{self.path}: no version {v}"
                + (" (vacuumed)" if v < m["current"] else "")
            )
        schema = self._schema_at(m, v)
        parts = entry["partitions"]
        if ranges:
            stats = entry.get("stats", {})
            parts = {
                pv: rel
                for pv, rel in parts.items()
                if not self._skippable(stats.get(pv, {}), ranges)
            }
        # FILE-level skipping below the partition level: cluster()
        # records per-file zone maps keyed by the (immutable,
        # copy-on-write) data directory at the MANIFEST level, so a
        # clustered partition resolves to just the files whose
        # [min, max] can intersect; directories without file stats
        # (ordinary commits) scan whole as before
        paths: list[str] = []
        fstats = m.get("file_stats", {}) if ranges else {}
        for rel in parts.values():
            per_file = fstats.get(rel)
            if per_file is None:
                paths.append(os.path.join(self.path, rel))
            else:
                paths.extend(
                    os.path.join(self.path, rel, f)
                    for f, st in sorted(per_file.items())
                    if not self._skippable(st, ranges)
                )
        if not paths:
            # a mutation can delete every partition (or pruning can
            # exclude all partitions/files); the manifest schema keeps
            # such reads working as empty tables
            if schema is None:
                raise ValueError(f"{self.path}: version {v} is empty and pre-dates manifest schemas")
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read if schema is None else self.spark.read.schema(schema)
        return reader.parquet(*paths)

    def rollback(self, version: int) -> None:
        """Reset `current` to an existing older version and drop every
        newer version from the manifest — their data directories
        become unreferenced and the next vacuum's orphan sweep
        collects them. This is the recovery primitive SnapshotDatabase
        uses to discard table commits left behind by a transaction
        that died before its database-level pointer swap. OCC-fenced
        like any commit (seq bumps), so an in-flight writer that read
        the pre-rollback state can never land its commit afterwards."""
        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        if str(version) not in m["versions"]:
            raise ValueError(f"{self.path}: cannot rollback to unknown version {version}")
        if version == read_version:
            return
        m["versions"] = {v: e for v, e in m["versions"].items() if int(v) <= version}
        m["current"] = version
        self._commit(m, expected_current=read_version, expected_seq=read_seq)

    def vacuum(self, keep_last: int = 1, also_keep: set | None = None) -> dict:
        """Garbage-collect old versions: keep the newest `keep_last`
        versions (always including current), drop the rest from the
        manifest, then delete data directories no kept version
        references — rewrite ∝ dropped files, exactly the
        VACUUM/expire-snapshots operation of real table formats.

        Ordering is crash-safe: the pruned manifest commits FIRST
        (atomic replace under the OCC lock, bumping the commit seq so
        every concurrent in-flight mutation fences out and retries),
        and only then files are deleted — a crash in between leaves
        unreferenced files, which the NEXT vacuum collects: the
        physical sweep runs even when no versions are droppable, and
        that orphan-only pass still commits a seq bump first, because
        deleting unreferenced directories without fencing could race a
        writer whose fresh (not-yet-committed) directories look like
        orphans. Time travel to dropped versions becomes an error
        (named as vacuumed). `also_keep` pins extra versions that must
        survive regardless of age — SnapshotDatabase passes the union
        of versions still referenced by any kept database version, so
        a table-level vacuum can never break database time travel.
        Returns {dropped_versions, removed_dirs}."""
        import shutil

        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        versions = sorted(int(v) for v in m["versions"])
        keep = set(versions[-max(1, keep_last):]) | {m["current"]}
        if also_keep:
            keep |= {int(v) for v in also_keep if str(v) in m["versions"]}
        dropped = [v for v in versions if v not in keep]
        kept_dirs = {
            rel for v in keep for rel in m["versions"][str(v)]["partitions"].values()
        }
        m["versions"] = {str(v): m["versions"][str(v)] for v in sorted(keep)}
        if "file_stats" in m:
            # per-file zone maps of dropped directories go with them
            m["file_stats"] = {
                rel: st for rel, st in m["file_stats"].items() if rel in kept_dirs
            }
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        removed: list[str] = []
        data_root = os.path.join(self.path, "data")
        for vdir in sorted(os.listdir(data_root)):
            vpath = os.path.join(data_root, vdir)
            if not os.path.isdir(vpath):
                continue
            # _SUCCESS/.crc marker FILES belong to the version dir as a
            # whole: keep them while any leaf of this dir is still
            # referenced, drop them with the last leaf
            kept_here = any(rel.startswith(f"data/{vdir}/") for rel in kept_dirs)
            for leaf in sorted(os.listdir(vpath)):
                full = os.path.join(vpath, leaf)
                rel = f"data/{vdir}/{leaf}"
                if rel in kept_dirs:
                    continue
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(rel)
                elif not kept_here:
                    os.remove(full)
            if not os.listdir(vpath):
                os.rmdir(vpath)
        return {"dropped_versions": dropped, "removed_dirs": removed}

    def compact(self, max_files_per_partition: int = 4) -> dict:
        """Small-file compaction (the OPTIMIZE / bin-packing operation
        of real table formats): every streaming upsert or parallel
        mutation leaves one parquet file per write task, and a table
        fed by a micro-batch sink accumulates thousands of tiny files
        whose open/footer costs dominate scans long before data volume
        does. This rewrites ONLY partitions holding more than
        `max_files_per_partition` data files — one coalesced file per
        partition — as a normal copy-on-write commit (op "compact"):
        content is bit-identical (oracle-tested), untouched partitions
        re-link for free, old versions stay time-travelable, and the
        OCC seq fences concurrent writers. Cost ∝ fragmented
        partitions, never table size.

        Fragmentation is decided from the MANIFEST's per-partition
        file counts (recorded by every commit at write time) — the
        read path makes no directory listings, so on object storage a
        compaction check costs one manifest read, not N LISTs
        (round-6 verdict note #3). Manifests written before file
        tracking fall back to one listing per partition. Returns
        {compacted: [partition values], files_before, files_after}."""
        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        pcol = m["partition_col"]
        entry0 = m["versions"][str(read_version)]
        cur = entry0["partitions"]
        known = entry0.get("files", {})

        def _n_files(pv: str) -> int:
            if pv in known:
                return int(known[pv])
            d = os.path.join(self.path, cur[pv])  # legacy manifest fallback
            return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

        frag = {pv: rel for pv, rel in cur.items() if _n_files(pv) > max_files_per_partition}
        if not frag:
            return {"compacted": [], "files_before": 0, "files_after": 0}
        files_before = sum(_n_files(pv) for pv in frag)
        schema = self._schema_at(m, read_version)
        reader = self.spark.read if schema is None else self.spark.read.schema(schema)
        df = reader.parquet(*[os.path.join(self.path, rel) for rel in frag.values()])
        # one output file per fragmented partition: hash-repartition on
        # the partition column routes each value to one task (coalesce(1)
        # for unpartitioned tables)
        to_write = (
            df.coalesce(1) if pcol is None else df.repartition(len(frag), F.col(pcol))
        )
        version = self._next(m)
        parts, files = self._write_partitions(to_write, version, pcol, only=set(frag))
        # compaction is content-identical: the rewritten partitions'
        # zone maps carry over from the current entry unchanged
        cur_stats = entry0.get("stats", {})
        new_parts, new_files, new_stats = self._carry_forward(m, set(frag))
        new_parts.update(parts)
        new_files.update(files)
        new_stats.update({pv: cur_stats[pv] for pv in frag if pv in cur_stats})
        m["versions"][str(version)] = {
            "op": "compact",
            "partitions": new_parts,
            "files": new_files,
            "stats": new_stats,
        }
        m["current"] = version
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        return {
            "compacted": sorted(frag),
            "files_before": files_before,
            "files_after": sum(files.values()),
        }

    # how many quantile buckets each cluster column contributes to the
    # z-value: 16 buckets = 4 interleaved bits per column
    _ZBITS = 4

    def cluster(self, cluster_by: list[str], files_per_partition: int = 4) -> dict:
        """OPTIMIZE ZORDER BY: rewrite the current version so rows
        that are close in the `cluster_by` value space land in the
        same files, and record PER-FILE zone maps so `read(ranges=
        ...)` skips at file granularity below the partition level —
        the multi-dimensional data-skipping layout lakehouse formats
        pair with their file statistics (draft:28-47 `index
        Ordered(...)` generalized to several columns at once).

        Mechanics (all scale-honest):
        - per column, 15 approximate quantile cutpoints (ONE aggregate
          row collected — metadata-sized) map each value to a 4-bit
          rank; quantiles, not min/max scaling, so skew cannot
          collapse the buckets;
        - the z-value interleaves the rank bits of all columns, so a
          range on ANY clustered column maps to a bounded set of
          z-runs (a lexicographic sort would only serve the first);
        - ONE `repartitionByRange` over (partition value, z) +
          in-task sort: each output file covers a contiguous z-run
          within its partition value; `files_per_partition` sizes the
          range partitioner (at 100 TB this is the file-size knob);
        - per-file [min, max] of key + cluster + partition columns
          are computed in ONE column-pruned job grouped by
          input_file_name and stored at the MANIFEST level keyed by
          the immutable data directory — later mutations that rewrite
          a partition simply produce dirs with no file stats (scanned
          whole, always correct), so no other commit path changes.

        Content is bit-identical (a pure reorder); the rewrite is a
        normal copy-on-write commit (op "cluster"), OCC-fenced, with
        partition-level stats carried over unchanged. Cluster columns
        must be numeric (quantile-rankable); raises otherwise.
        Returns {files: {pv: n}, cutpoints: {col: [...]}}."""
        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        pcol = m["partition_col"]
        entry0 = m["versions"][str(read_version)]
        parts0 = entry0["partitions"]
        if not parts0:
            return {"files": {}, "cutpoints": {}}
        schema = self._schema_at(m, read_version)
        if schema is None:
            # same descriptive error the read path uses — a legacy
            # manifest without schema tracking can't be clustered
            raise ValueError(
                f"{self.path}: version {read_version} pre-dates manifest schemas "
                "and cannot be clustered"
            )
        dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
        numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
        bad = [c for c in cluster_by if dtypes.get(c) not in numeric]
        if not cluster_by or bad:
            raise ValueError(
                f"{self.path}: cluster_by needs numeric columns; got {bad or cluster_by}"
            )
        reader = self.spark.read.schema(schema)
        df = reader.parquet(*[os.path.join(self.path, rel) for rel in parts0.values()])

        # quantile cutpoints: one metadata-sized driver row
        n_buckets = 1 << self._ZBITS
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cut_row = df.select(
            *[F.percentile_approx(c, qs, 10_000).alias(c) for c in cluster_by]
        ).collect()[0]
        cutpoints = {c: [x for x in (cut_row[c] or [])] for c in cluster_by}

        def rank(c: str) -> Column:
            b = F.lit(0)
            for cut in cutpoints[c]:
                b = b + F.when(F.col(c) >= F.lit(cut), 1).otherwise(0)
            return b.cast("long")  # NULLs rank 0 (nulls-first)

        # interleave: target bit positions are disjoint, so summing the
        # shifted single bits IS the bitwise OR (no bit ops needed)
        z = F.lit(0).cast("long")
        for bit in range(self._ZBITS):
            for j, c in enumerate(cluster_by):
                single = F.shiftright(rank(c), bit) % 2
                z = z + F.shiftleft(single, bit * len(cluster_by) + j)
        n_tasks = max(1, len(parts0) * max(1, files_per_partition))
        range_cols = ([F.col(pcol).cast("string")] if pcol else []) + [F.col("__z")]
        to_write = (
            df.withColumn("__z", z)
            .repartitionByRange(n_tasks, *range_cols)
            .sortWithinPartitions(*range_cols)
            .drop("__z")
        )
        version = self._next(m)
        parts, files = self._write_partitions(to_write, version, pcol)
        stat_cols = self._stat_cols(df, list(dict.fromkeys(m["key_cols"] + cluster_by)), pcol)
        fstats = self._file_stats(parts, schema, stat_cols)
        new_parts, new_files, new_stats = self._carry_forward(m, set(parts0))
        new_parts.update(parts)
        new_files.update(files)
        # a reorder is content-identical per partition value: carry the
        # partition-level zone maps for every partition that persists
        cur_stats = entry0.get("stats", {})
        new_stats.update({pv: cur_stats[pv] for pv in parts if pv in cur_stats})
        m["versions"][str(version)] = {
            "op": "cluster",
            "partitions": new_parts,
            "files": new_files,
            "stats": new_stats,
            "cluster_by": list(cluster_by),
        }
        m["current"] = version
        m.setdefault("file_stats", {}).update(fstats)
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        return {"files": files, "cutpoints": cutpoints}

    def _file_stats(self, parts: dict, schema, stat_cols: list[str]) -> dict:
        """Per-FILE [min, max] zone maps over freshly written dirs:
        {rel_dir: {file_name: {col: [mn, mx]}}}. Footer statistics
        first (`_footer_file_minmax`, exactness-gated, no Spark job —
        r13 optimization pass); fallback is ONE column-pruned job
        grouped by input_file_name."""
        if not stat_cols or not parts:
            return {}
        if schema is not None:
            dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
            want = {c: dtypes.get(c) for c in stat_cols}
            if all(t in self._FOOTER_PHYS for t in want.values()):
                out: dict = {}
                ok = True
                try:
                    for rel in parts.values():
                        d = os.path.join(self.path, rel)
                        for fname in os.listdir(d):
                            if not fname.endswith(".parquet"):
                                continue
                            got = self._footer_file_minmax(
                                os.path.join(d, fname), want
                            )
                            if got is None:
                                ok = False
                                break
                            got, nrows = got
                            if nrows == 0:
                                # the scan path emits no group for a
                                # row-less file — mirror that
                                continue
                            out.setdefault(rel, {})[fname] = {
                                c: [mn, mx] for c, (mn, mx) in got.items()
                            }
                        if not ok:
                            break
                except (OSError, ValueError):
                    ok = False
                if ok:
                    return out
        dirs = [os.path.join(self.path, rel) for rel in parts.values()]
        by_dir = {os.path.abspath(os.path.join(self.path, rel)): rel for rel in parts.values()}
        aggs = []
        for c in stat_cols:
            aggs.append(F.min(c).alias(f"mn_{c}"))
            aggs.append(F.max(c).alias(f"mx_{c}"))
        rows = (
            self.spark.read.schema(schema)
            .parquet(*dirs)
            .select(F.input_file_name().alias("_f"), *stat_cols)
            .groupBy("_f")
            .agg(*aggs)
            .collect()
        )
        out: dict = {}
        for r in rows:
            f = r["_f"]
            if f.startswith("file:"):
                f = f[len("file:"):]
            d, name = os.path.split(f)
            rel = by_dir.get(os.path.abspath(d))
            if rel is None:
                continue
            out.setdefault(rel, {})[name] = {
                c: [_enc_stat(r[f"mn_{c}"]), _enc_stat(r[f"mx_{c}"])]
                for c in stat_cols
            }
        return out

    def add_columns(self, new_cols: dict[str, str]) -> int:
        """Schema evolution as a METADATA-ONLY commit (Rewrite.md:17-18
        — the reference must take the database offline to "change
        schema"; table formats make it a manifest edit): append
        nullable columns to the schema, re-link every existing
        partition untouched. No data file is read or written — the
        commit costs one manifest swap at any table size; old files
        surface NULL for the new columns, and time travel to
        pre-evolution versions still returns exactly the old columns.
        `new_cols` maps name -> Spark SQL type string (e.g. "double",
        "array<int>"). Only ADDITIVE evolution is supported: existing
        columns cannot be dropped, renamed, retyped, or narrowed —
        such a request raises rather than silently corrupting old
        files' reads. Key and partition columns keep their meaning."""
        from pyspark.sql import types as T

        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        schema = self._schema_at(m, read_version)
        if schema is None:
            raise ValueError(f"{self.path}: pre-schema manifest cannot evolve")
        existing = {f.name for f in schema.fields}
        clash = sorted(set(new_cols) & existing)
        if clash:
            raise ValueError(
                f"{self.path}: add_columns cannot redefine existing column(s) {clash} "
                "(only additive evolution is supported)"
            )
        fields = list(schema.fields) + [
            T.StructField(name, _parse_type(self.spark, typ), nullable=True)
            for name, typ in new_cols.items()
        ]
        new_schema = T.StructType(fields)
        version = self._next(m)
        carried_parts, carried_files, carried_stats = self._carry_forward(m, set())
        m["versions"][str(version)] = {
            "op": "add_columns",
            "partitions": carried_parts,
            "files": carried_files,
            "stats": carried_stats,
            "schema": new_schema.json(),
        }
        m["current"] = version
        m["schema"] = new_schema.json()
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        return version

    def migrate(
        self,
        columns: dict,
        key_cols: list[str] | None = None,
        partition_col: str | None | object = "__keep__",
        program: str | None = None,
    ) -> int:
        """UPDATE SCHEMA with a DATA-MOVING procedure — the reference's
        "Upload a new data package definition with data moving
        procedures" (Kernel/README.md ADMINISTRATION): ONE committed
        version whose rows are the current content transformed by
        `columns`, an ORDERED mapping of new column name → expression
        over the OLD columns (pyspark Column or SQL string), whose
        manifest entry records the NEW schema + key/partition columns,
        and whose program text persists in the log like any mutation.

        This is the NON-ADDITIVE path add_columns refuses: rename
        (`{"b": F.col("a")}`), retype (`{"v": "CAST(v AS DOUBLE)"}`),
        drop (omit the column), backfill (any expression of the old
        row) — all ride one full-rewrite commit. Rewrite ∝ table size
        by construction (the honest cost of moving data; additive
        changes should keep using add_columns' metadata-only commit).

        Time travel across the boundary returns each version at its
        RECORDED schema. CDC (read_changes) across the boundary keeps
        the to-version-schema rule while the key SET is unchanged —
        renamed/introduced columns surface as NULL on the pre side —
        and is refused (ValueError) across a key-set change, where row
        identity itself was redefined. `key_cols`/`partition_col`
        default to the surviving old ones (a dropped partition column
        leaves the table unpartitioned)."""
        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        if not columns:
            raise ValueError(f"{self.path}: migrate needs at least one column")
        cur = self.read()
        exprs = []
        for name, e in columns.items():
            col = F.expr(e) if isinstance(e, str) else e
            exprs.append(col.alias(name))
        out = cur.select(*exprs)
        new_names = list(out.columns)
        new_keys = (
            list(key_cols)
            if key_cols is not None
            else [k for k in m["key_cols"] if k in new_names]
        )
        bad = [k for k in new_keys if k not in new_names]
        if not new_keys or bad:
            raise ValueError(
                f"{self.path}: migrate needs key column(s) in the new schema "
                f"(missing {bad or m['key_cols']})"
            )
        if partition_col == "__keep__":
            pc = m["partition_col"] if m["partition_col"] in new_names else None
        else:
            pc = partition_col
        if pc is not None and pc not in new_names:
            raise ValueError(f"{self.path}: partition column {pc!r} not in the new schema")
        version = self._next(m)
        if pc is None:
            parts, files, stats, _kr, _n = self._write_unpartitioned_observed(
                out, version, self._stat_cols(out, new_keys)
            )
        else:
            parts, files = self._write_partitions(out, version, pc)
            stats = self._partition_stats(
                parts, out.schema, self._stat_cols(out, new_keys, pc)
            )
        entry = {
            "op": "migrate",
            "partitions": parts,
            "files": files,
            "stats": stats,
            "schema": out.schema.json(),
            "key_cols": list(new_keys),
            "partition_col": pc,
        }
        if program is not None:
            entry["program"] = program
        if new_keys != list(m["key_cols"]) and "key_cols_v0" not in m:
            # preserve the pre-migration key set for _keys_at's default
            # (versions older than the first key-changing migrate)
            m["key_cols_v0"] = list(m["key_cols"])
        if pc != m["partition_col"] and "partition_col_v0" not in m:
            # same preservation for _pcol_at (export of a pre-migration
            # database pin needs the partitioning in effect AT the pin)
            m["partition_col_v0"] = m["partition_col"]
        m["versions"][str(version)] = entry
        m["current"] = version
        m["schema"] = out.schema.json()
        m["key_cols"] = list(new_keys)
        m["partition_col"] = pc
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        return version

    @staticmethod
    def _keys_at(m: dict, v: int) -> list:
        """Key columns in effect at version `v` — the newest migrate
        entry at or below v that recorded key_cols, else the
        pre-migration set (key_cols_v0 when any key-changing migrate
        happened, else the manifest's)."""
        for vv in sorted((int(k) for k in m["versions"]), reverse=True):
            if vv <= v and "key_cols" in m["versions"][str(vv)]:
                return list(m["versions"][str(vv)]["key_cols"])
        return list(m.get("key_cols_v0", m["key_cols"]))

    @staticmethod
    def _pcol_at(m: dict, v: int) -> str | None:
        """Partition column in effect at version `v` — the newest
        migrate entry at or below v that recorded partition_col, else
        the pre-migration one (partition_col_v0 when any
        partition-changing migrate happened, else the manifest's)."""
        for vv in sorted((int(k) for k in m["versions"]), reverse=True):
            if vv <= v and "partition_col" in m["versions"][str(vv)]:
                return m["versions"][str(vv)]["partition_col"]
        return m.get("partition_col_v0", m["partition_col"])

    def read_changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Change data feed between two snapshots: one row per changed
        key with `_change` ∈ {insert, delete, update_pre, update_post}
        — the CDC surface lakehouse formats expose, derived from the
        versions themselves (no log replay needed because versions are
        immutable). Implementation is a single full-outer join on the
        key columns, but ONLY over partitions whose directories differ
        between the two manifests — the copy-on-write layout makes
        unchanged partitions free to skip, so the diff costs ∝ changed
        data, not table size."""
        m = self._load()
        to_version = m["current"] if to_version is None else to_version
        for v in (from_version, to_version):
            if str(v) not in m["versions"]:
                raise ValueError(f"{self.path}: no version {v}"
                                 + (" (vacuumed)" if v < m["current"] else ""))
        k_from = self._keys_at(m, from_version)
        k_to = self._keys_at(m, to_version)
        if k_from != k_to:
            raise ValueError(
                f"{self.path}: change feed across a key-set migration "
                f"({k_from} -> {k_to}) is undefined — row identity was "
                "redefined; read each side at matched versions instead"
            )
        keys = k_to
        p_from = m["versions"][str(from_version)]["partitions"]
        p_to = m["versions"][str(to_version)]["partitions"]
        # partition pruning from the manifests: identical directory ⇒
        # identical bytes ⇒ no changes possible
        changed = {pv for pv in set(p_from) | set(p_to) if p_from.get(pv) != p_to.get(pv)}

        # BOTH sides surface at the schema in effect at `to_version`,
        # but each side's files are READ at that side's own recorded
        # schema and then CONFORMED by explicit Catalyst casts: across
        # an add_columns/rename boundary the old side surfaces typed
        # NULL for introduced columns, and across a RETYPE migration
        # the cast handles conversions the parquet reader refuses
        # (e.g. INT32 files under a to-version string column fail the
        # vectorized scan with PARQUET_COLUMN_DATA_TYPE_MISMATCH —
        # only widenings are readable in-place)
        cdc_schema = self._schema_at(m, to_version)

        def _side(parts: dict, at_version: int) -> DataFrame:
            sch = self._schema_at(m, at_version)
            dirs = [os.path.join(self.path, parts[pv]) for pv in changed if pv in parts]
            if not dirs:
                if cdc_schema is None:
                    raise ValueError(
                        f"{self.path}: change feed needs a manifest schema for an "
                        "empty side and this table pre-dates manifest schemas"
                    )
                return self.spark.createDataFrame([], cdc_schema)
            reader = self.spark.read if sch is None else self.spark.read.schema(sch)
            df = reader.parquet(*dirs)
            if cdc_schema is None:
                return df
            return df.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name in df.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in cdc_schema.fields
                ]
            )

        old = _side(p_from, from_version)
        new = _side(p_to, to_version)
        data_cols = [c for c in old.columns if c not in keys]
        o = old.select(*keys, F.struct(*data_cols).alias("_old"))
        n = new.select(*keys, F.struct(*data_cols).alias("_new"))
        j = o.join(n, keys, "full_outer")
        inserted = j.where(F.col("_old").isNull()).select(
            *keys, F.col("_new").alias("_row"), F.lit("insert").alias("_change")
        )
        deleted = j.where(F.col("_new").isNull()).select(
            *keys, F.col("_old").alias("_row"), F.lit("delete").alias("_change")
        )
        # eqNullSafe: plain struct != returns NULL when a field is NULL
        # on both sides, silently dropping real updates
        upd = j.where(
            F.col("_old").isNotNull()
            & F.col("_new").isNotNull()
            & ~F.col("_old").eqNullSafe(F.col("_new"))
        )
        pre = upd.select(*keys, F.col("_old").alias("_row"), F.lit("update_pre").alias("_change"))
        post = upd.select(*keys, F.col("_new").alias("_row"), F.lit("update_post").alias("_change"))
        flat = inserted.unionByName(deleted).unionByName(pre).unionByName(post)
        return flat.select(*keys, *[F.col(f"_row.{c}").alias(c) for c in data_cols], "_change")

    def history(self) -> list[dict]:
        """Version log incl. the persisted mutation program (the
        statement text that produced each commit, when the writer
        supplied one — Rewrite.md:6 "save query to log"); None for
        commits with no program (create/compact/raw-DataFrame API)."""
        m = self._load()
        return [
            {
                "version": int(v),
                "op": e["op"],
                "n_partitions": len(e["partitions"]),
                "program": e.get("program"),
            }
            for v, e in sorted(m["versions"].items(), key=lambda kv: int(kv[0]))
        ]

    # -- mutations (each = one copy-on-write commit) ------------------------
    def _next(self, m: dict) -> int:
        return m["current"] + 1

    def _carry_forward(self, m: dict, touched: set) -> tuple[dict, dict, dict]:
        """Re-link every untouched partition of the current version —
        the file-reuse half of copy-on-write. Returns (partitions,
        file_counts, zone_map_stats); counts for manifests that
        pre-date file tracking are backfilled by one listing (legacy
        upgrade path only), stats only carry where recorded (pruning
        treats missing stats as unskippable, so legacy partitions stay
        correct)."""
        entry = m["versions"][str(m["current"])]
        cur = entry["partitions"]
        known = entry.get("files", {})
        known_stats = entry.get("stats", {})
        parts = {pv: rel for pv, rel in cur.items() if pv not in touched}
        files = {
            pv: int(
                known.get(
                    pv,
                    sum(
                        1
                        for f in os.listdir(os.path.join(self.path, rel))
                        if f.endswith(".parquet")
                    ),
                )
            )
            for pv, rel in parts.items()
        }
        stats = {pv: known_stats[pv] for pv in parts if pv in known_stats}
        return parts, files, stats

    def last_txn(self, sink_id: str) -> int:
        """Highest batch id committed by `sink_id`, or -1. The txn
        watermark lives in the manifest, so it commits atomically WITH
        the data it covers — the exactly-once invariant for streaming
        sinks (streaming/sink.py)."""
        return int(self._load().get("txns", {}).get(sink_id, -1))

    def merge_upsert(
        self,
        updates: DataFrame,
        txn: tuple[str, int] | None = None,
        program: str | None = None,
    ) -> int:
        """MERGE INTO this USING updates ON key_cols
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *.
        Only partitions holding an updated key (plus new-key
        partitions) are rewritten. Update rows must carry the full
        schema (SET *), and — like real MERGE — a key may appear at
        most once in `updates`.

        `txn=(sink_id, batch_id)` makes the merge IDEMPOTENT per sink:
        a batch id at or below the sink's committed watermark is
        skipped (the replay a streaming engine performs after a crash
        between sink write and checkpoint commit), and the watermark
        advances in the same atomic manifest commit as the data.

        `program` persists the source statement (e.g. the HeroQL text
        that produced this mutation) in the manifest version entry —
        the reference's "save query to log" (Rewrite.md:6); history()
        then carries an audit/replay record of PROGRAMS alongside the
        data versions."""
        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        if txn is not None and txn[1] <= int(m.get("txns", {}).get(txn[0], -1)):
            return m["current"]
        keys = m["key_cols"]
        pcol = m["partition_col"]
        target = self.read()
        # per-partition [min, max] hulls of the UPDATE KEYS — the keys
        # this commit LOGICALLY wrote, as opposed to the whole-partition
        # physical copy-on-write. Recorded in the version entry as
        # `key_ranges` so the transaction layer can prove two
        # same-partition interleaves touched disjoint key sets (the
        # Row level of the reference's lock targets, Lock.h:22-27
        # Table/Page/Row — partition = Page, key range = Row).
        # ONE job computes everything pre-write needs (r13 fixed-cost
        # cut — was three: isEmpty + update hulls + moved-key old
        # locations): the hulls of `updates` UNIONED with the matched
        # target rows (a matched key may live in a partition the
        # update row moves it OUT of — those source partitions rewrite
        # too); grouping the union min/max-merges the two sides
        # exactly as the old per-partition fold did, the produced
        # partition set IS `touched`, and an empty result IS the
        # empty-updates fast path.
        stat_keys = self._stat_cols(updates, keys)
        version = self._next(m)
        schema_now = self._schema_at(m, read_version)
        if pcol is None:
            # unpartitioned: ONE Spark job total (r13) — the write
            # itself observes the new version's stats, the update-key
            # hulls, and the update-row count; empty updates abandon
            # the staged directory and commit only the txn watermark
            touched = {_UNPARTITIONED}
            merged = (
                target.join(updates.select(*keys), keys, "left_anti")
                .withColumn("_u", F.lit(False))
                .unionByName(updates.withColumn("_u", F.lit(True)))
            )
            parts, files, stats, key_ranges, n_upd = (
                self._write_unpartitioned_observed(
                    merged, version, stat_keys, upd_flag="_u"
                )
            )
            if not n_upd:  # empty updates — nothing logically written
                self._abandon_version_dir(parts)
                if txn is not None:
                    m.setdefault("txns", {})[txn[0]] = int(txn[1])
                    self._commit(
                        m, expected_current=read_version, expected_seq=read_seq
                    )
                return m["current"]
        else:
            # provably-insert-only literal updates skip the hull job
            # entirely (r14 opt): the zone maps prove the matched side
            # empty and the hulls fold driver-side — same manifest,
            # one less Spark pass per bounded literal insert
            key_ranges = self._insert_only_hulls(
                m, read_version, updates, keys, pcol, stat_keys
            )
            if key_ranges is None:
                sides = [
                    updates,
                    target.join(updates.select(*keys), keys, "left_semi"),
                ]
                key_ranges = self._union_hulls(sides, pcol, stat_keys)
            if not key_ranges:  # empty updates
                if txn is not None:
                    m.setdefault("txns", {})[txn[0]] = int(txn[1])
                    self._commit(
                        m, expected_current=read_version, expected_seq=read_seq
                    )
                return m["current"]
            touched = set(key_ranges)
            affected_target = target.where(
                F.col(pcol).cast("string").isin(*touched) if touched else F.lit(False)
            )
            merged = affected_target.join(
                updates.select(*keys), keys, "left_anti"
            ).unionByName(updates)
            parts, files, stats = self._write_partitions_stats(
                merged, version, pcol, touched,
                self._stat_cols(target, keys, pcol), schema_now,
            )
        new_parts, new_files, new_stats = self._carry_forward(m, touched)
        new_parts.update(parts)
        new_files.update(files)
        new_stats.update(stats)
        entry = {
            "op": "merge_upsert",
            "partitions": new_parts,
            "files": new_files,
            "stats": new_stats,
        }
        if stat_keys:
            entry["key_ranges"] = key_ranges
        if program is not None:
            entry["program"] = program
        m["versions"][str(version)] = entry
        m["current"] = version
        if txn is not None:
            m.setdefault("txns", {})[txn[0]] = int(txn[1])
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        return version

    def overwrite(self, df: DataFrame, program: str | None = None) -> int:
        """Replace the whole table content in ONE commit (INSERT
        OVERWRITE): every partition of the new frame is written fresh;
        partitions absent from `df` disappear. Previous versions stay
        time-travelable. This is the full-rewrite escape hatch — the
        targeted merge/update/delete paths bound rewrite to touched
        partitions and are what mutations should use; HeroQL's
        action-dialect programs (whole-frame rewrites by construction)
        commit through here so durability is never silently dropped."""
        m = self._load()
        read_version = m["current"]
        read_seq = self._seq(m)
        schema = self._schema_at(m, read_version)
        if schema is not None:
            want = {f.name: f.dataType for f in schema.fields}
            got = {f.name: f.dataType for f in df.schema.fields}
            if set(got) != set(want):
                raise ValueError(
                    f"{self.path}: overwrite frame columns {sorted(got)} != table "
                    f"schema {sorted(want)} (use add_columns to evolve)"
                )
            bad = sorted(n for n in want if got[n] != want[n])
            if bad:
                # catch it at commit time — a mistyped file would
                # otherwise only fail (or silently coerce) at read time
                raise ValueError(
                    f"{self.path}: overwrite column type mismatch for {bad}: "
                    + ", ".join(f"{n}: {got[n].simpleString()}!={want[n].simpleString()}" for n in bad)
                )
        version = self._next(m)
        parts, files = self._write_partitions(df, version, m["partition_col"])
        stats = self._partition_stats(
            parts, schema, self._stat_cols(df, m["key_cols"], m["partition_col"])
        )
        entry = {"op": "overwrite", "partitions": parts, "files": files, "stats": stats}
        if program is not None:
            entry["program"] = program
        m["versions"][str(version)] = entry
        m["current"] = version
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        return version

    def update_where(
        self,
        predicate: Column,
        assignments: dict[str, Column],
        program: str | None = None,
    ) -> int:
        """`update T(...) :- pred` (draft:135): CASE projection over
        the pre-image, copy-on-write. The whole table is scanned to
        evaluate the predicate, but only partitions containing a
        matching row (or receiving a moved row, when the partition
        column itself is assigned) are rewritten. Assignments must not
        change key columns — keys identify rows across the rewrite.
        A predicate matching NO row commits nothing (the table version
        is unchanged — uniform since r10 across partitioned and
        unpartitioned tables)."""
        m = self._load()
        target = self.read()
        matched = F.coalesce(predicate, F.lit(False))
        base_cols = list(target.columns)

        def transform(df: DataFrame) -> DataFrame:
            extra = [c for c in df.columns if c not in base_cols]
            return df.select(
                *[
                    (F.when(F.col("_m"), assignments[c]).otherwise(F.col(c)).alias(c)
                     if c in assignments else F.col(c))
                    for c in base_cols
                ],
                *[F.col(c) for c in extra],
            )

        return self._rewrite_touched(m, target, matched, transform, "update_where", program)

    def delete_where(self, predicate: Column, program: str | None = None) -> int:
        """`remove T(...) :- pred` (draft:136-138): anti-filter,
        copy-on-write on the touched partitions."""
        m = self._load()
        target = self.read()
        matched = F.coalesce(predicate, F.lit(False))
        return self._rewrite_touched(
            m, target, matched, lambda df: df.where(~F.col("_m")),
            "delete_where", program,
        )

    def _rewrite_touched(
        self,
        m: dict,
        target: DataFrame,
        matched: Column,
        transform,
        op: str,
        program: str | None = None,
    ) -> int:
        """Commit `transform` applied to the matched-tagged pre-image.
        `transform(df)` consumes a frame carrying target's columns plus
        a boolean `_m` tag (the matched predicate, evaluated ONCE) and
        returns the post-image rows, preserving any extra columns.

        Per-partition [min, max] hulls of the MATCHED rows' keys — the
        keys this predicate mutation LOGICALLY wrote/removed — are
        recorded as `key_ranges` exactly like merge_upsert's, so the
        transaction layer's _keys_disjoint can exonerate a
        same-partition interleave between a predicate mutation and an
        upsert of provably different keys (the remaining write-side
        case of the reference's Row lock target, Lock.h:22-27).

        Job shape (r13 fixed-cost cut): UNPARTITIONED tables run ONE
        Spark job — the write observes the matched-row count + hulls
        (pre-transform node) and the new version's stats (the written
        rows) in the same pass; a no-op abandons the staged directory.
        PARTITIONED tables run one union-hull job (pre-image matched
        partitions ∪ post-image partitions of the result's matched
        rows — an update assigning the partition column moves rows
        between partitions and both ends must rewrite), the write, and
        the stats read-back."""
        read_version = m["current"]
        read_seq = self._seq(m)
        pcol = m["partition_col"]
        keys = m["key_cols"]
        stat_keys = self._stat_cols(target, keys)
        version = self._next(m)
        t2 = target.withColumn("_m", matched)
        if pcol is None:
            from pyspark.sql import Observation

            aggs = [F.sum(F.col("_m").cast("long")).alias("n_m")]
            for c in stat_keys:
                aggs.append(F.min(F.when(F.col("_m"), F.col(c))).alias(f"umn_{c}"))
                aggs.append(F.max(F.when(F.col("_m"), F.col(c))).alias(f"umx_{c}"))
            obs = Observation()
            result = transform(t2.observe(obs, *aggs)).drop("_m")
            parts, files, stats, _kr, _n = self._write_unpartitioned_observed(
                result, version, stat_keys
            )
            got = obs.get
            if not int(got.get("n_m") or 0):  # no-op: commit nothing new
                self._abandon_version_dir(parts)
                return m["current"]
            touched = {_UNPARTITIONED}
            key_ranges = {
                _UNPARTITIONED: {
                    c: [got[f"umn_{c}"], got[f"umx_{c}"]] for c in stat_keys
                }
            }
        else:
            matched_rows = t2.where(F.col("_m")).drop("_m")
            result = transform(t2).drop("_m")
            sides = [
                matched_rows,
                result.join(matched_rows.select(*keys), keys, "left_semi"),
            ]
            key_ranges = self._union_hulls(sides, pcol, stat_keys)
            if not key_ranges:  # no-op mutation: commit nothing new
                return m["current"]
            touched = set(key_ranges)
            parts, files, stats = self._write_partitions_stats(
                result, version, pcol, touched,
                self._stat_cols(target, m["key_cols"], pcol),
                self._schema_at(m, read_version),
            )
        new_parts, new_files, new_stats = self._carry_forward(m, touched)
        new_parts.update(parts)
        new_files.update(files)
        new_stats.update(stats)
        entry = {"op": op, "partitions": new_parts, "files": new_files, "stats": new_stats}
        if stat_keys:
            entry["key_ranges"] = key_ranges
        if program is not None:
            entry["program"] = program
        m["versions"][str(version)] = entry
        m["current"] = version
        self._commit(m, expected_current=read_version, expected_seq=read_seq)
        return version
