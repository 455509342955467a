"""Multi-table atomic transactions over snapshot tables — the
database scope of the reference's durability design (Rewrite.md:3-16:
queue transaction updates in parallel, single-threaded apply, conflict
cancellation, "recovering when the database is shutdown at any
timing"). The reference plans MVCC over paged files; the lakehouse
re-expression is a MANIFEST-OF-MANIFESTS:

- A `SnapshotDatabase` is a directory of member `SnapshotTable`s plus
  one database manifest whose versions each pin an exact
  {table name -> table version} set. READERS RESOLVE THROUGH THE PIN,
  never through a member table's own `current` pointer.
- A transaction applies its mutations eagerly to the member tables
  (each one a normal OCC copy-on-write table commit — the
  "parallel queueing" half), then publishes ALL of them with ONE
  atomic database-manifest swap (the "single-threaded apply" half).
  A crash after table A's commit but before the database swap leaves
  every reader on the previous pin set: table A's orphaned version is
  invisible, cross-table consistency holds.
- Recovery (`recover()`, run automatically when a new transaction
  starts) rolls any member table whose `current` ran ahead of the
  database pin back to the pin — discarding half-applied transaction
  leftovers — and bumps the database commit seq so a still-live
  writer from before recovery can never publish (its pointer swap
  fences out on seq, mirroring the reference's conflict-cancel rule).
- Database-level OCC with COST ARBITRATION (Rewrite.md:9-13): the
  pointer swap validates the database seq read at transaction start;
  each transaction carries a cost (partitions rewritten) recorded in
  the version it publishes. A swap lost to a DISJOINT-table commit
  rebases and retries (bounded backoff) instead of cancelling — the
  expensive transaction survives cheap interleaved commits; genuine
  same-table conflicts cancel (ConcurrentWriteError reporting both
  costs), and abandoned table versions are healed by the next
  recovery. Same-table races already cancel at the member-table OCC
  layer.
- Database time travel: `read(name, db_version=k)` resolves table
  versions through database version k; `vacuum()` prunes old database
  versions and passes every still-pinned table version as
  `also_keep`, so table GC can never break a readable database
  version.

The commit critical section is inherited from SnapshotTable (same
lock-file OCC protocol, different manifest file), not re-implemented.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession

from herodb_spark.sources.snapshot import ConcurrentWriteError, SnapshotTable

_DB_MANIFEST = "_db_manifest.json"


class _DbManifest(SnapshotTable):
    """Reuses SnapshotTable's atomic-replace + lock-file OCC commit
    verbatim for the database manifest; no data-path methods are used."""

    _manifest_name = _DB_MANIFEST


class SnapshotDatabase:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._mf = _DbManifest(spark, path)

    # -- manifest ----------------------------------------------------------
    def _load(self) -> dict:
        return self._mf._load()

    @classmethod
    def create(cls, spark: SparkSession, path: str) -> "SnapshotDatabase":
        db = cls(spark, path)
        # creating over a live database would silently reset its pin
        # history (member data dirs survive but become unreachable
        # through pins) — refuse; open with SnapshotDatabase(spark,
        # path) instead
        if os.path.exists(db._mf._manifest_path()):
            raise ValueError(f"{path}: database already exists (open it instead of create)")
        os.makedirs(os.path.join(path, "tables"), exist_ok=True)
        db._mf._commit(
            {"current": 0, "versions": {"0": {"op": "create", "tables": {}}}}
        )
        return db

    def _table_path(self, name: str) -> str:
        if "/" in name or name.startswith("_") or name.startswith("."):
            raise ValueError(f"invalid table name {name!r}")
        return os.path.join(self.path, "tables", name)

    def table(self, name: str) -> SnapshotTable:
        """Raw member-table handle. For consistent reads use `read()`,
        which resolves through the database pin."""
        return SnapshotTable(self.spark, self._table_path(name))

    def _pins(self, m: dict, db_version: int | None = None) -> dict:
        v = m["current"] if db_version is None else db_version
        entry = m["versions"].get(str(v))
        if entry is None:
            raise ValueError(
                f"{self.path}: no database version {v}"
                + (" (vacuumed)" if v < m["current"] else "")
            )
        return entry["tables"]

    # -- reads -------------------------------------------------------------
    def tables(self, db_version: int | None = None) -> dict:
        return dict(self._pins(self._load(), db_version))

    def read(
        self, name: str, db_version: int | None = None, ranges: dict | None = None
    ) -> DataFrame:
        """Snapshot-consistent read: the table version is the one the
        (current or time-traveled) database version pins — a
        half-applied transaction's table commits are never visible.
        `ranges` forwards to SnapshotTable.read's zone-map skipping."""
        pins = self._pins(self._load(), db_version)
        if name not in pins:
            raise ValueError(f"{self.path}: no table {name!r} in database version")
        return self.table(name).read(version=pins[name], ranges=ranges)

    def history(self) -> list[dict]:
        m = self._load()
        return [
            {"version": int(v), "op": e["op"], "tables": dict(e["tables"])}
            for v, e in sorted(m["versions"].items(), key=lambda kv: int(kv[0]))
        ]

    # -- DDL (its own single-table atomic commit) ---------------------------
    def create_table(
        self,
        name: str,
        df: DataFrame,
        key_cols: list[str],
        partition_col: str | None = None,
    ) -> SnapshotTable:
        m = self._load()
        read_version, read_seq = m["current"], self._mf._seq(m)
        if name in self._pins(m):
            raise ValueError(f"{self.path}: table {name!r} already exists")
        t = SnapshotTable.create(self.spark, self._table_path(name), df, key_cols, partition_col)
        pins = dict(self._pins(m))
        pins[name] = 0
        version = m["current"] + 1
        m["versions"][str(version)] = {"op": f"create_table:{name}", "tables": pins}
        m["current"] = version
        self._mf._commit(m, expected_current=read_version, expected_seq=read_seq)
        return t

    # -- recovery ----------------------------------------------------------
    def recover(self, stale_after: float | None = None) -> dict:
        """Discard member-table commits that never made it into a
        database version: roll every table whose `current` is ahead of
        the current pin back to the pin. When anything was healed (or
        a table manifest is simply ahead), bump the database seq so a
        transaction that started before recovery can no longer publish.

        `stale_after` (seconds) distinguishes CRASH LEFTOVERS from
        LIVE IN-FLIGHT TRANSACTIONS: a diverged table whose manifest
        was written within the window is treated as an active writer's
        private version and left alone. Explicit recovery (no
        argument) heals unconditionally; Transaction.__enter__ passes
        a grace window so overlapping writers no longer cancel each
        other at start (the round-6 livelock note) — a table that
        stays diverged past the window is, by definition, a crash.
        Returns {table: rolled_back_from_version}."""
        import time as _time

        m = self._load()
        read_version, read_seq = m["current"], self._mf._seq(m)
        pins = self._pins(m)
        healed: dict[str, int] = {}
        for name, pinned in pins.items():
            t = self.table(name)
            tm = t._load()
            if tm["current"] > pinned:
                if stale_after is not None:
                    try:
                        age = _time.time() - os.path.getmtime(t._manifest_path())
                    except OSError:
                        age = float("inf")
                    if age <= stale_after:
                        continue  # plausibly a live writer — skip
                healed[name] = tm["current"]
                t.rollback(pinned)
        if healed:
            # content-identical manifest; the commit exists only to
            # bump seq and fence out pre-recovery writers
            self._mf._commit(m, expected_current=read_version, expected_seq=read_seq)
        return healed

    # -- transactions ------------------------------------------------------
    def transaction(
        self,
        txn: tuple[str, int] | None = None,
        isolation: str = "write_serializable",
    ) -> "Transaction":
        """`txn=(sink_id, batch_id)` stamps the commit with a
        streaming watermark IN the atomic pointer swap — the database-
        scope analog of SnapshotTable.merge_upsert's txn parameter,
        used by streaming/sink.DatabaseTxnSink for exactly-once
        multi-table micro-batch writes. See Transaction for the
        `isolation` levels (write_serializable default ↔ rebase
        arbitration; serializable ↔ cancel on any interleave)."""
        return Transaction(self, txn=txn, isolation=isolation)

    def last_txn(self, sink_id: str) -> int:
        """Highest batch id committed by `sink_id` at database scope,
        or -1. Lives in the database manifest, so it advances in the
        same atomic swap that publishes the batch's table versions."""
        return int(self._load().get("txns", {}).get(sink_id, -1))

    # -- maintenance -------------------------------------------------------
    def compact(
        self, names: list[str] | None = None, max_files_per_partition: int = 4
    ) -> dict:
        """Database-scope small-file compaction: compact fragmented
        member tables AND publish the compacted versions in one
        transaction (pin swap). This is the only correct shape under a
        database — a bare table-level compact() commits a version the
        database pin never references, so readers keep resolving the
        fragmented version and the next recovery rolls the compacted
        one back as a crash leftover. Content is bit-identical, so the
        published db version changes no query result. Returns
        {table: compact report} for the touched tables."""
        reports: dict[str, dict] = {}
        with self.transaction() as t:
            for name in names if names is not None else sorted(self.tables()):
                rep = t.compact(name, max_files_per_partition=max_files_per_partition)
                if rep["compacted"]:
                    reports[name] = rep
        return reports

    def cluster(
        self, name: str, cluster_by: list[str], files_per_partition: int = 4
    ) -> dict:
        """Database-scope OPTIMIZE ZORDER of one member table,
        published through the pin swap (same reasoning as compact():
        a bare table-level cluster() commits a version the database
        pin never references). Content is a pure reorder, so the
        published version changes no query result — only the file
        layout and the per-file zone maps."""
        with self.transaction() as t:
            return t.cluster(name, cluster_by, files_per_partition=files_per_partition)

    # -- GC ----------------------------------------------------------------
    def vacuum(self, keep_last: int = 1) -> dict:
        """Prune database versions (keep newest `keep_last`, always
        including current), then vacuum each member table keeping
        exactly the versions still pinned by a kept database version —
        plus the table's own current — so database time travel and
        table reads both survive GC."""
        m = self._load()
        read_version, read_seq = m["current"], self._mf._seq(m)
        versions = sorted(int(v) for v in m["versions"])
        keep = set(versions[-max(1, keep_last):]) | {m["current"]}
        dropped = [v for v in versions if v not in keep]
        m["versions"] = {str(v): m["versions"][str(v)] for v in sorted(keep)}
        self._mf._commit(m, expected_current=read_version, expected_seq=read_seq)
        table_report: dict[str, dict] = {}
        pinned: dict[str, set] = {}
        for v in keep:
            for name, tv in m["versions"][str(v)]["tables"].items():
                pinned.setdefault(name, set()).add(int(tv))
        for name, tvs in pinned.items():
            table_report[name] = self.table(name).vacuum(keep_last=1, also_keep=tvs)
        return {"dropped_db_versions": dropped, "tables": table_report}


class Transaction:
    """Multi-table atomic transaction: eager member-table commits,
    one database pointer swap at exit. Use as a context manager; an
    exception inside the block abandons the transaction (no database
    commit — the next recovery sweeps the orphaned table versions).

    CONFLICT ARBITRATION (Rewrite.md:9-13 — the reference queues
    transactions and submits the highest-cost one, rolling back all
    conflicted transactions; with sum-of-costs as the refinement).
    Under OCC the committed winner is physical, so the arbitration
    maps to the loser's side:

    - every transaction carries a COST (partitions rewritten across
      its member-table commits — the copy-on-write work metric that
      needs no extra Spark job), recorded in the database version
      entry it publishes;
    - a transaction that loses the pointer swap to an interleaved
      commit on DISJOINT tables does not cancel: it REBASES (adopts
      the new pin set, re-validates that its own tables and private
      versions are untouched) and retries with bounded backoff — a
      6-hour batch mutation survives any number of cheap disjoint
      commits instead of losing its work to a 1-minute one;
    - on a genuine same-table conflict the transaction cancels
      (ConcurrentWriteError reporting both costs): its member-table
      versions were built on a superseded snapshot, and rebasing
      would silently drop the winner's writes. This is the only case
      the reference's arbiter would also have to cancel one side.

    ISOLATION. The default, `isolation="write_serializable"`, checks
    WRITE-WRITE conflicts only — the same level lakehouse formats
    default to — which admits the classic write-skew anomaly: a
    transaction that READ table X and wrote Y = f(X) can rebase over
    an interleaved commit to X and publish a Y derived from the old
    X. Two escapes:
    - call `t.read(name)` for in-transaction reads: read tables join
      the rebase conflict check (an interleaved commit to a READ
      table cancels the transaction), giving serializable behavior
      for declared read sets with the arbitration benefit intact;
    - `isolation="serializable"` disables rebasing entirely — any
      interleaved commit cancels, exactly the pre-arbitration
      first-committer-wins behavior.
    """

    #: diverged member tables whose manifest mtime is younger than
    #: this are presumed to be a live concurrent writer's private
    #: versions, not crash leftovers. Every _apply refreshes the
    #: mtime of ALL of this transaction's previously committed member
    #: manifests (a progress heartbeat), so a long multi-statement
    #: transaction stays live as long as it keeps committing; only an
    #: IDLE gap longer than the grace (no statement for 30 min)
    #: exposes its early commits to another transaction's start-time
    #: healing — explicit recover() remains the unconditional path
    #: for known crashes.
    RECOVER_GRACE_S = 1800.0
    #: bounded rebase-retry budget for disjoint-table pointer races
    MAX_REBASES = 5

    def __init__(
        self,
        db: SnapshotDatabase,
        txn: tuple[str, int] | None = None,
        isolation: str = "write_serializable",
    ):
        if isolation not in ("write_serializable", "serializable"):
            raise ValueError(f"unknown isolation level {isolation!r}")
        self.db = db
        self._txn_mark = txn
        self._new_pins: dict[str, int] = {}
        self._read_tables: set[str] = set()
        self._entered = False
        self.isolation = isolation
        self.cost = 0

    def read(self, name: str):
        """Pin-consistent in-transaction read with read-your-writes
        (a table this transaction already committed resolves to its
        private version). Reading through this method also DECLARES
        the table in the transaction's read set, so an interleaved
        commit to it cancels the transaction instead of silently
        rebasing over it (see the class docstring's isolation note)."""
        if not self._entered:
            raise RuntimeError("transaction used outside its with-block")
        if name not in self._base_pins and name not in self._new_pins:
            raise ValueError(f"no table {name!r} in this database")
        self._read_tables.add(name)
        v = self._new_pins.get(name, self._base_pins.get(name))
        return self.db.table(name).read(version=v)

    def __enter__(self) -> "Transaction":
        # heal STALE crashed predecessors before reading seq; live
        # in-flight writers (fresh manifests) are left alone so
        # overlapping transactions no longer cancel each other here
        self.db.recover(stale_after=self.RECOVER_GRACE_S)
        m = self.db._load()
        self._read_version = m["current"]
        self._read_seq = self.db._mf._seq(m)
        self._base_pins = dict(self.db._pins(m))
        self._entered = True
        return self

    # each mutation is a normal OCC table commit; the version it
    # produces stays private (no reader resolves it) until commit()
    def _apply(self, name: str, fn) -> int:
        if not self._entered:
            raise RuntimeError("transaction used outside its with-block")
        if name not in self._base_pins:
            raise ValueError(f"no table {name!r} in this database")
        t = self.db.table(name)
        # expected current = our own last commit in this transaction,
        # else the pin read at __enter__. This pre-check is LOAD-
        # BEARING, not redundant with the table's own OCC: a
        # concurrent writer that already advanced the table would
        # otherwise be silently built upon (write skew) — the table
        # commit itself reads current fresh and wouldn't object.
        expected = self._new_pins.get(name, self._base_pins[name])
        if t._load()["current"] != expected:
            raise ConcurrentWriteError(
                f"{t.path}: table advanced past this transaction's snapshot"
            )
        version = fn(t)
        if version != expected:  # no-op mutations don't dirty the txn
            self._new_pins[name] = version
        # progress heartbeat: refresh the mtime of every member
        # manifest this transaction already committed so a sibling
        # transaction's grace-window recovery keeps treating them as
        # live (see RECOVER_GRACE_S)
        for other in self._new_pins:
            try:
                os.utime(self.db.table(other)._manifest_path())
            except OSError:
                pass
        # cost = copy-on-write work: partitions this commit physically
        # rewrote (manifest metadata — no extra Spark job). A no-op
        # mutation (version unchanged) adds nothing.
        if version != expected:
            entry = t._load()["versions"].get(str(version), {})
            prefix = f"data/v={version}-"
            self.cost += sum(
                1 for rel in entry.get("partitions", {}).values() if rel.startswith(prefix)
            )
        return version

    def merge_upsert(self, name: str, updates: DataFrame, program: str | None = None) -> int:
        return self._apply(name, lambda t: t.merge_upsert(updates, program=program))

    def update_where(
        self, name: str, predicate: Column, assignments: dict, program: str | None = None
    ) -> int:
        return self._apply(name, lambda t: t.update_where(predicate, assignments, program=program))

    def delete_where(self, name: str, predicate: Column, program: str | None = None) -> int:
        return self._apply(name, lambda t: t.delete_where(predicate, program=program))

    def overwrite(self, name: str, df: DataFrame, program: str | None = None) -> int:
        return self._apply(name, lambda t: t.overwrite(df, program=program))

    def add_columns(self, name: str, new_cols: dict) -> int:
        return self._apply(name, lambda t: t.add_columns(new_cols))

    def compact(self, name: str, max_files_per_partition: int = 4) -> dict:
        """Compact one member table inside this transaction (see
        SnapshotDatabase.compact for why compaction must go through
        the pin swap). Returns the table-level compact report."""
        report: dict = {}

        def fn(t):
            report.update(t.compact(max_files_per_partition=max_files_per_partition))
            return t._load()["current"]

        self._apply(name, fn)
        return report

    def cluster(
        self, name: str, cluster_by: list[str], files_per_partition: int = 4
    ) -> dict:
        """Z-order one member table inside this transaction (see
        SnapshotDatabase.cluster). Returns the table-level report."""
        report: dict = {}

        def fn(t):
            report.update(t.cluster(cluster_by, files_per_partition=files_per_partition))
            return t._load()["current"]

        self._apply(name, fn)
        return report

    def _try_swap(self) -> int:
        m = self.db._load()
        pins = dict(self._base_pins)
        pins.update(self._new_pins)
        version = self._read_version + 1
        m["versions"][str(version)] = {"op": "txn", "tables": pins, "cost": self.cost}
        m["current"] = version
        if self._txn_mark is not None:
            m.setdefault("txns", {})[self._txn_mark[0]] = int(self._txn_mark[1])
        self.db._mf._commit(
            m, expected_current=self._read_version, expected_seq=self._read_seq
        )
        return version

    def _rebase(self) -> None:
        """Adopt the advanced database state after losing the pointer
        swap to a DISJOINT interleaved commit. Safe iff (a) no table
        this transaction touched — WROTE, or READ through t.read() —
        changed pins under it, (b) serializable isolation was not
        requested, and (c) its own private member-table versions are
        still each table's current (an unconditional recover() would
        have rolled them back — that seq fence must keep cancelling
        us). Raises ConcurrentWriteError (with both costs)
        otherwise."""
        m = self.db._load()
        new_pins = dict(self.db._pins(m))
        winner_cost = m["versions"][str(m["current"])].get("cost", "?")
        if self.isolation == "serializable":
            raise ConcurrentWriteError(
                f"{self.db.path}: database advanced under a serializable "
                f"transaction (cost {self.cost}; interleaved cost {winner_cost}) "
                "— cancelling (rebase disabled at this isolation level)"
            )
        touched = set(self._new_pins) | self._read_tables
        overlap = sorted(
            n for n in touched if new_pins.get(n) != self._base_pins.get(n)
        )
        if overlap:
            raise ConcurrentWriteError(
                f"{self.db.path}: tables {overlap} (in this transaction's "
                f"read/write set, cost {self.cost}) were committed by an "
                f"interleaved transaction (cost {winner_cost}); its member-table "
                "versions supersede this snapshot — cancelling (overlapping "
                "conflict is not rebasable)"
            )
        for name, v in self._new_pins.items():
            if self.db.table(name)._load()["current"] != v:
                raise ConcurrentWriteError(
                    f"{self.db.path}: table {name!r} private version {v} was "
                    "rolled back by recovery — this transaction is fenced out"
                )
        self._read_version = m["current"]
        self._read_seq = self.db._mf._seq(m)
        self._base_pins = new_pins

    def commit(self) -> int:
        """The atomic publish: one database-manifest swap pinning every
        mutated table's new version together, OCC-validated against the
        seq read at __enter__ (or the last rebase). A lost swap against
        a DISJOINT interleaved commit rebases and retries with bounded
        backoff (MAX_REBASES) — the cost-arbitration contract in the
        class docstring; same-table conflicts and recovery fences
        cancel the transaction."""
        import time as _time

        for attempt in range(self.MAX_REBASES + 1):
            try:
                return self._try_swap()
            except ConcurrentWriteError:
                if attempt == self.MAX_REBASES:
                    raise
                self._rebase()  # raises on genuine conflict
                _time.sleep(0.01 * (2**attempt))
        raise AssertionError("unreachable")

    def __exit__(self, exc_type, exc, tb) -> bool:
        self._entered = False
        # a watermarked (streaming) transaction commits even when the
        # batch produced no row changes — the watermark must advance
        # or the batch would replay forever
        if exc_type is None and (self._new_pins or self._txn_mark is not None):
            self.commit()
        return False
