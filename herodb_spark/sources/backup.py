"""Backup ring — the reference's "Auto Backup to file group ring
(maintain diff bitmaps for all file groups)" (Kernel/README.md
HIGH-LEVEL FEATURES) re-expressed for the snapshot lakehouse.

The reference rotates backups through a fixed ring of file groups and
keeps per-filegroup DIFF BITMAPS so each backup copies only what
changed. The lakehouse analog is cheaper and exact, because snapshot
storage is COPY-ON-WRITE: a partition directory is immutable once
written, so "changed since the last backup" is simply "a directory the
ring has not seen" — the manifest IS the diff bitmap. Mechanics:

- `BackupRing(target_dir, slots=N)` rotates through N slots; each
  `backup(db)` captures the database manifest + every member-table
  manifest + the pin-reachable partition directories.
- Directories land in a content-addressed POOL shared by all slots
  (`pool/<table>/<reldir>`), copied ONLY if absent — an unchanged
  100-partition table contributes zero copy work to the next backup;
  a mutation that rewrote 2 partitions costs exactly those 2
  directories (the diff-bitmap economy, pinned by file-count
  assertions in tests).
- Overwriting a slot on ring wrap GARBAGE-COLLECTS pool directories no
  remaining slot references.
- `restore(slot, dest)` materializes a fully functional database
  directory (manifests + data) at `dest` — time travel, reads, and new
  transactions all work on the restored copy; restoring is a pin swap
  plus directory re-link, no recomputation.
- Scope: a backup captures the PARENT package (every table any kept
  database version pins). Branch workspaces (<db>/branches/) are
  deliberately not captured — merge a branch to persist its state, the
  same discipline as the reference's package-instance lifecycle.

Crash safety: slot content is staged under a hidden name and published
by one atomic ring-manifest replace — a backup killed mid-copy leaves
the previous ring state intact (stale stage dirs are swept by the next
backup). Concurrent VACUUM on the source can delete a directory
between manifest snapshot and copy; backup detects the missing dir and
raises ConcurrentWriteError (retry) rather than writing a slot whose
manifest points at holes. At 100 TB the copies are per-partition
directory moves of immutable files — work ∝ data written since the
ring last saw the table, never ∝ table size.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from herodb_spark.sources.snapshot import ConcurrentWriteError

_RING_MANIFEST = "_ring.json"


class BackupRing:
    def __init__(self, target_dir: str, slots: int = 3):
        if slots < 1:
            raise ValueError("a ring needs at least one slot")
        self.path = target_dir
        self.slots = slots
        os.makedirs(os.path.join(self.path, "pool"), exist_ok=True)
        if not os.path.exists(self._manifest_path()):
            self._write_manifest({"slots": slots, "next": 0, "entries": {}})
        else:
            m = self._load()
            if m["slots"] != slots:
                raise ValueError(
                    f"{target_dir}: existing ring has {m['slots']} slots, not {slots}"
                )

    # -- ring manifest --------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, _RING_MANIFEST)

    def _load(self) -> dict:
        with open(self._manifest_path()) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    def entries(self) -> dict:
        """{slot: {db_version, seq, copied}} for populated slots."""
        return {int(k): dict(v) for k, v in self._load()["entries"].items()}

    # -- backup ---------------------------------------------------------------
    def _pool_dir(self, table: str, rel: str) -> str:
        return os.path.join(self.path, "pool", table, rel)

    def backup(self, db) -> dict:
        """Capture `db` into the next ring slot. Copies only partition
        directories the pool has not seen (immutable copy-on-write dirs
        — presence IS the diff bitmap). Returns {slot, copied, reused,
        db_version}."""
        ring = self._load()
        slot = int(ring["next"])
        dbm = db._load()
        stage = os.path.join(self.path, f".stage-{uuid.uuid4().hex[:8]}")
        os.makedirs(os.path.join(stage, "tables"))
        copied = 0
        reused = 0
        refs: dict[str, list[str]] = {}
        try:
            with open(os.path.join(stage, "_db_manifest.json"), "w") as f:
                json.dump(dbm, f, indent=1, sort_keys=True)
            names = sorted({n for e in dbm["versions"].values() for n in e["tables"]})
            for name in names:
                t = db.table(name)
                tm = t._load()
                # concurrent-vacuum check beyond vanished DIRECTORIES:
                # a db.vacuum between the db-manifest snapshot and this
                # table-manifest read may have pruned a table VERSION
                # the snapshotted db manifest pins (whose dirs are all
                # shared with surviving versions, so no rel goes
                # missing below) — a slot published from that pair
                # would restore a database raising 'no version N'.
                # Verify every pinned version survived; mismatch is a
                # retriable race, exactly like a vanished directory.
                pinned = {
                    int(e["tables"][name])
                    for e in dbm["versions"].values()
                    if name in e.get("tables", {})
                }
                gone = sorted(v for v in pinned if str(v) not in tm["versions"])
                if gone:
                    raise ConcurrentWriteError(
                        f"{db.path}: version(s) {gone} of {name!r} vacuumed "
                        "during backup (db-manifest pin no longer resolvable) "
                        "— retry"
                    )
                tdir = os.path.join(stage, "tables", name)
                os.makedirs(tdir)
                with open(os.path.join(tdir, "_manifest.json"), "w") as f:
                    json.dump(tm, f, indent=1, sort_keys=True)
                rels = sorted(
                    {
                        rel
                        for e in tm["versions"].values()
                        for rel in e["partitions"].values()
                    }
                )
                refs[name] = rels
                for rel in rels:
                    dst = self._pool_dir(name, rel)
                    if os.path.isdir(dst):
                        reused += 1
                        continue
                    src = os.path.join(t.path, rel)
                    if not os.path.isdir(src):
                        raise ConcurrentWriteError(
                            f"{db.path}: {name}/{rel} vanished during backup "
                            "(concurrent vacuum) — retry"
                        )
                    tmp_dst = dst + f".tmp-{uuid.uuid4().hex[:8]}"
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copytree(src, tmp_dst)
                    os.rename(tmp_dst, dst)
                    copied += 1
            # publish: retire the slot's previous stage, install ours,
            # then ONE atomic ring-manifest replace
            final = os.path.join(self.path, f"slot-{slot}-{uuid.uuid4().hex[:8]}")
            os.rename(stage, final)
            old = ring["entries"].get(str(slot), {}).get("dir")
            ring["entries"][str(slot)] = {
                "dir": os.path.basename(final),
                "db_version": int(dbm["current"]),
                "seq": int(dbm.get("seq", dbm["current"])),
                "tables": refs,
                "copied": copied,
                "reused": reused,
            }
            ring["next"] = (slot + 1) % self.slots
            self._write_manifest(ring)
            if old:
                shutil.rmtree(os.path.join(self.path, old), ignore_errors=True)
            self._gc(ring)
            self._sweep_stale_stages()
        except BaseException:
            shutil.rmtree(stage, ignore_errors=True)
            raise
        return {"slot": slot, "copied": copied, "reused": reused,
                "db_version": int(dbm["current"])}

    def _gc(self, ring: dict) -> None:
        """Drop pool directories no remaining slot references (the
        rotation's reclaim — a wrapped slot's exclusive diffs die with
        it)."""
        live: dict[str, set] = {}
        for e in ring["entries"].values():
            for name, rels in e.get("tables", {}).items():
                live.setdefault(name, set()).update(rels)
        pool = os.path.join(self.path, "pool")
        for name in sorted(os.listdir(pool)):
            keep = live.get(name, set())
            tpool = os.path.join(pool, name)
            # pool layout mirrors data/<vdir>/<leaf>; walk two levels
            for vdir in sorted(os.listdir(os.path.join(tpool, "data"))) if os.path.isdir(os.path.join(tpool, "data")) else []:
                vpath = os.path.join(tpool, "data", vdir)
                for leaf in sorted(os.listdir(vpath)):
                    rel = f"data/{vdir}/{leaf}"
                    if rel not in keep and os.path.isdir(os.path.join(vpath, leaf)):
                        shutil.rmtree(os.path.join(vpath, leaf), ignore_errors=True)
                if not os.listdir(vpath):
                    os.rmdir(vpath)
            if not live.get(name) and os.path.isdir(tpool):
                shutil.rmtree(tpool, ignore_errors=True)

    def _sweep_stale_stages(self) -> None:
        """Reclaim crash leftovers: hidden stages (killed mid-copy) AND
        renamed-but-never-published slot directories — a crash between
        os.rename(stage, final) and the ring-manifest write leaves a
        'slot-N-<uuid>' dir no manifest entry references; without this
        sweep it would leak forever (the pool GC only walks pool/).
        Safe under the single-writer ring discipline: callers sweep
        AFTER their own manifest write, so their fresh slot is always
        referenced by the time this runs."""
        live = {e["dir"] for e in self._load()["entries"].values()}
        for d in os.listdir(self.path):
            stale = d.startswith(".stage-") or (
                d.startswith("slot-") and d not in live
            )
            if stale:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    # -- restore ----------------------------------------------------------------
    def restore(self, slot: int, dest: str):
        """Materialize the slot's database at `dest` — manifests
        installed (the pin swap), pool directories copied back to their
        recorded locations. The result is a fully functional
        SnapshotDatabase: reads, time travel, and new transactions all
        work. Refuses a populated dest. Returns `dest` (open with
        SnapshotDatabase(spark, dest) or use open_restored)."""
        ring = self._load()
        e = ring["entries"].get(str(slot))
        if e is None:
            raise ValueError(f"{self.path}: slot {slot} holds no backup")
        if os.path.exists(dest) and os.listdir(dest):
            raise ValueError(f"{dest}: refusing to restore into a non-empty directory")
        sdir = os.path.join(self.path, e["dir"])
        os.makedirs(os.path.join(dest, "tables"), exist_ok=True)
        shutil.copy2(
            os.path.join(sdir, "_db_manifest.json"),
            os.path.join(dest, "_db_manifest.json"),
        )
        for name, rels in e["tables"].items():
            tdir = os.path.join(dest, "tables", name)
            os.makedirs(tdir, exist_ok=True)
            shutil.copy2(
                os.path.join(sdir, "tables", name, "_manifest.json"),
                os.path.join(tdir, "_manifest.json"),
            )
            for rel in rels:
                shutil.copytree(self._pool_dir(name, rel), os.path.join(tdir, rel))
        return dest

    def open_restored(self, spark, slot: int, dest: str):
        """restore() + open: the one-call form."""
        from herodb_spark.sources.database import SnapshotDatabase

        self.restore(slot, dest)
        return SnapshotDatabase(spark, dest)
