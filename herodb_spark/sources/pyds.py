"""Python Data Source (Spark 4 `pyspark.sql.datasource` API) for
snapshot tables: `spark.read.format("herodb")` batch scans with time
travel, batch change-feed reads, and `spark.readStream.format(
"herodb")` — the TABLE-AS-A-STREAM pattern lakehouse formats expose
(a durable table's commit history consumed as a structured stream).

Why a data source and not just `SnapshotTable.read()`: the reader API
is the integration surface OTHER tools speak. Registering the format
makes snapshot tables consumable by plain `spark.read`/`readStream`
pipelines (SQL `CREATE TABLE ... USING` style workflows, streaming
joins against live tables) with no herodb imports at the call site —
the reference's storage engine is similarly reachable through its
generic query interface rather than only through internal handles
(reference: Kernel/Source interface split).

Scale notes:
- batch scans plan ONE InputPartition PER PARQUET FILE of the pinned
  version — the natural parallel unit of the copy-on-write layout
  (compact() governs file granularity, so task sizing is a storage-
  maintenance knob exactly as in lakehouse formats). Workers stream
  Arrow RECORD BATCHES (pyarrow scan → zero-copy into Spark), never
  python rows.
- the change feed plans one InputPartition per (commit, changed
  partition-value): the copy-on-write layout proves unchanged
  partition values identical from the MANIFEST alone, so stream work
  is ∝ changed data per commit, not table size. Each task diffs one
  partition value of one commit — bounded by what that commit
  actually rewrote.
- offsets are manifest versions: resuming a checkpointed stream is a
  pure manifest lookup; `commit()` needs no bookkeeping because
  versions are immutable.

Semantics (documented deltas from `SnapshotTable.read_changes`, which
remains the JVM-side batch CDC joiner):
- a key whose PARTITION COLUMN value changes between commits surfaces
  as delete (old partition) + insert (new partition) instead of
  update_pre/update_post — a valid CDC encoding of the same
  transition; within one partition value updates keep pre/post form.
- the stream's schema is fixed at query start (the version-`current`
  schema). Columns added later by `add_columns` appear after a
  restart, matching lakehouse CDF streaming behavior.
- vacuumed versions cannot be replayed; starting (or resuming) below
  the oldest retained version raises with the retained range.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_CHANGE_COLS = (("_change", "string"), ("_commit_version", "long"))


# -- manifest helpers (driver side; plain filesystem + json) -------------
def _load_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)


def _schema_at(m: dict, v: int) -> StructType:
    js = None
    for vv in sorted((int(k) for k in m["versions"]), reverse=True):
        if vv <= v and "schema" in m["versions"][str(vv)]:
            js = m["versions"][str(vv)]["schema"]
            break
    if js is None:
        js = m.get("schema")
    if js is None:
        raise ValueError("snapshot table pre-dates manifest schemas; cannot infer")
    return StructType.fromJson(json.loads(js))


def _version_entry(m: dict, v: int, path: str) -> dict:
    entry = m["versions"].get(str(v))
    if entry is None:
        have = sorted(int(k) for k in m["versions"])
        raise ValueError(
            f"{path}: no version {v}"
            + (f" (vacuumed; retained versions {have[0]}..{have[-1]})" if have and v < have[0] else "")
        )
    return entry


def _cdc_struct(base: StructType) -> StructType:
    out = StructType.fromJson(base.jsonValue())
    for name, typ in _CHANGE_COLS:
        out = out.add(name, typ)
    return out


# -- worker-side arrow plumbing ------------------------------------------
def _arrow_schema(schema_json: str):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(StructType.fromJson(json.loads(schema_json)))


def _conform(table, target):
    """Project/cast an arrow table onto the target schema: files
    written before a schema evolution lack the added columns (surface
    NULL), and physical types (e.g. int32 stats-less writers) cast to
    the manifest type — the same conformance `SnapshotTable.read`
    gets from Spark's schema-applied parquet scan."""
    import pyarrow as pa

    cols = {}
    for field in target:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols[field.name] = col
        else:
            cols[field.name] = pa.nulls(table.num_rows, field.type)
    return pa.table(cols, schema=target)


def _read_dir(path: str, target) -> "pa.Table":  # noqa: F821
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    import pyarrow as pa

    if not files:
        return pa.table({f.name: pa.nulls(0, f.type) for f in target}, schema=target)
    return _conform(pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive"), target)


# -- batch snapshot scan ---------------------------------------------------
class _FilePartition(InputPartition):
    def __init__(self, file_path: str, schema_json: str):
        self.file_path = file_path
        self.schema_json = schema_json


class _SnapshotReader(DataSourceReader):
    def __init__(self, path: str, version: int | None):
        self.path = path
        m = _load_manifest(path)
        self.version = m["current"] if version is None else version
        self.entry = _version_entry(m, self.version, path)
        self.schema_json = _schema_at(m, self.version).json()

    def partitions(self) -> Sequence[InputPartition]:
        out = []
        for rel in self.entry["partitions"].values():
            d = os.path.join(self.path, rel)
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    out.append(_FilePartition(os.path.join(d, f), self.schema_json))
        return out

    def read(self, partition: _FilePartition) -> Iterator:
        if partition is None:  # empty partitions() → one task, no split
            return
        import pyarrow.parquet as pq

        target = _arrow_schema(partition.schema_json)
        for batch in pq.ParquetFile(partition.file_path).iter_batches():
            import pyarrow as pa

            yield from _conform(pa.Table.from_batches([batch]), target).to_batches()


# -- change-feed diff (shared by batch CDC + streaming) -------------------
class _ChangesPartition(InputPartition):
    def __init__(
        self,
        old_dir: str | None,
        new_dir: str | None,
        keys: list[str],
        schema_json: str,
        commit_version: int,
    ):
        self.old_dir = old_dir
        self.new_dir = new_dir
        self.keys = keys
        self.schema_json = schema_json
        self.commit_version = commit_version


def _changed_partition_values(m: dict, v_from: int, v_to: int, path: str) -> dict:
    """{partition_value: (old_rel_dir | None, new_rel_dir | None)} for
    partition values whose directories differ — identical directory ⇒
    identical bytes ⇒ no change possible (manifest-only pruning)."""
    p_from = {} if v_from < 0 else _version_entry(m, v_from, path)["partitions"]
    p_to = _version_entry(m, v_to, path)["partitions"]
    return {
        pv: (p_from.get(pv), p_to.get(pv))
        for pv in sorted(set(p_from) | set(p_to))
        if p_from.get(pv) != p_to.get(pv)
    }


def _diff_batches(partition: _ChangesPartition | None) -> Iterator:
    """Worker-side diff of ONE partition value across one commit:
    key-indexed row maps → insert/delete/update_pre/update_post rows,
    emitted as arrow batches on the CDC schema. Python-dict granularity
    is bounded by what the commit rewrote in this partition value (the
    copy-on-write unit), not by table size."""
    if partition is None:  # empty partitions() → one task, no split
        return
    import pyarrow as pa

    base = StructType.fromJson(json.loads(partition.schema_json))
    target = _arrow_schema(_cdc_struct(base).json())
    data_target = _arrow_schema(partition.schema_json)

    def side(d):
        if d is None:
            return {}
        tbl = _read_dir(d, data_target)
        rows = tbl.to_pylist()
        return {tuple(r[k] for k in partition.keys): r for r in rows}

    old, new = side(partition.old_dir), side(partition.new_dir)
    out: list[dict] = []

    def emit(row: dict, change: str):
        r = dict(row)
        r["_change"] = change
        r["_commit_version"] = partition.commit_version
        out.append(r)

    for k, row in new.items():
        if k not in old:
            emit(row, "insert")
        elif old[k] != row:
            emit(old[k], "update_pre")
            emit(row, "update_post")
    for k, row in old.items():
        if k not in new:
            emit(row, "delete")
    if out:
        yield from pa.Table.from_pylist(out, schema=target).to_batches()


class _ChangesReader(DataSourceReader):
    """Batch form: all changes between two pinned versions, one task
    per (commit, changed partition value)."""

    def __init__(self, path: str, v_from: int, v_to: int | None):
        self.path = path
        m = self._m = _load_manifest(path)
        self.v_from = v_from
        self.v_to = m["current"] if v_to is None else v_to
        self.keys = m["key_cols"]
        self.schema_json = _schema_at(m, self.v_to).json()

    def partitions(self) -> Sequence[InputPartition]:
        out = []
        for v in range(self.v_from + 1, self.v_to + 1):
            for pv, (od, nd) in _changed_partition_values(self._m, v - 1, v, self.path).items():
                out.append(
                    _ChangesPartition(
                        None if od is None else os.path.join(self.path, od),
                        None if nd is None else os.path.join(self.path, nd),
                        self.keys,
                        self.schema_json,
                        v,
                    )
                )
        return out

    def read(self, partition: _ChangesPartition) -> Iterator:
        yield from _diff_batches(partition)


class _ChangesStreamReader(DataSourceStreamReader):
    """Streaming form: offsets are manifest versions; each micro-batch
    covers the commits between two manifest reads."""

    def __init__(self, path: str, starting: str | None):
        self.path = path
        m = _load_manifest(path)
        self.keys = m["key_cols"]
        self.schema_json = _schema_at(m, m["current"]).json()
        if starting is None:
            self._initial = -1  # full history: v0 arrives as inserts
        elif starting == "latest":
            self._initial = m["current"]
        else:
            self._initial = int(starting)

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        return {"version": _load_manifest(self.path)["current"]}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        v0, v1 = start["version"], end["version"]
        if v1 <= v0:
            return []
        m = _load_manifest(self.path)
        out = []
        for v in range(v0 + 1, v1 + 1):
            for pv, (od, nd) in _changed_partition_values(m, v - 1, v, self.path).items():
                out.append(
                    _ChangesPartition(
                        None if od is None else os.path.join(self.path, od),
                        None if nd is None else os.path.join(self.path, nd),
                        self.keys,
                        self.schema_json,
                        v,
                    )
                )
        return out

    def read(self, partition: _ChangesPartition) -> Iterator:
        yield from _diff_batches(partition)

    def commit(self, end: dict) -> None:
        pass  # versions are immutable; nothing to acknowledge

    def stop(self) -> None:
        pass


# -- the format ------------------------------------------------------------
class HerodbDataSource(DataSource):
    """`spark.read.format("herodb")` over a snapshot table path.

    Options:
    - `path` (required): snapshot table directory.
    - `version`: time travel to a pinned version (batch snapshot mode).
    - `mode`: `snapshot` (default) | `changes` (batch CDC between
      `changesFrom` (required) and `changesTo` (default current)).
    - streaming (`spark.readStream.format("herodb")`): requires
      `mode=changes` (a stream of this source IS the change feed);
      starts from `startingVersion` (int; `latest`; default -1 = full
      history, version 0 arriving as inserts).

    Register once per session:
        spark.dataSource.register(HerodbDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "herodb"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("herodb: option 'path' (snapshot table directory) is required")
        return p

    def schema(self) -> StructType:
        # schema() serves BOTH read and readStream, which cannot be
        # told apart here — so the change-feed shape (the only stream
        # this source offers) is selected explicitly by mode=changes,
        # for batch CDC and streams alike; streamReader() enforces it
        m = _load_manifest(self._path())
        mode = self.options.get("mode", "snapshot")
        if mode == "changes":
            # note: a missing changesFrom can only raise in reader()
            # (action time), because schema() cannot tell a batch CDC
            # read from a readStream, which has no changesFrom
            v_to = int(self.options.get("changesto", m["current"]))
            _version_entry(m, v_to, self._path())  # fail fast at load()
            return _cdc_struct(_schema_at(m, v_to))
        if mode != "snapshot":
            raise ValueError(f"herodb: unknown mode {mode!r} (snapshot | changes)")
        v = self.options.get("version")
        v = m["current"] if v is None else int(v)
        _version_entry(m, v, self._path())  # fail fast at load()
        return _schema_at(m, v)

    def reader(self, schema: StructType) -> DataSourceReader:
        mode = self.options.get("mode", "snapshot")
        if mode == "changes":
            if "changesfrom" not in self.options:
                raise ValueError("herodb: mode=changes requires option 'changesFrom'")
            v_to = self.options.get("changesto")
            return _ChangesReader(
                self._path(),
                int(self.options["changesfrom"]),
                None if v_to is None else int(v_to),
            )
        v = self.options.get("version")
        return _SnapshotReader(self._path(), None if v is None else int(v))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self.options.get("mode") != "changes":
            raise ValueError(
                "herodb: streaming reads are the change feed — pass "
                ".option('mode', 'changes') so the declared schema is the CDC shape"
            )
        return _ChangesStreamReader(self._path(), self.options.get("startingversion"))


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(HerodbDataSource)
