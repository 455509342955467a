"""Namespace / database / module organization — the reference's
symbol-organization layer (Kernel/Drafts/draft:168-197):

- namespaces nest (`namespace Nodes { class Node }`), symbols resolve
  by qualified name (`Nodes::Node`) or through `using namespace`
  search paths;
- a database is a group of files (here: a group of named DataFrames);
  if a database references another database, all PUBLIC symbols of
  the referenced database are usable;
- a module hosts a group of database instances; modules cannot
  exchange data between each other (assembly/appdomain analogy).

Spark mapping: symbols are lazy DataFrames (a "class/table" = a
parquet-backed or derived DataFrame), so organization is pure
metadata — resolution returns the DataFrame unevaluated and Catalyst
still sees the full plan. `Database.sql()` materializes a module-safe
temp-view namespace (qualified names mangled to legal view names) so
`spark.sql` queries work against organized symbols.

Also here: the cached-computed-table statements `uncache Table` and
`uncache Table(...) :- pred` (draft:135-136) — `cache` pins a derived
table (persist + symbol registration), `uncache` drops it entirely or
invalidates the rows matching a predicate (filter + re-pin), the
batch analog of partial cache invalidation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "::"


def _validate_component(name: str, what: str) -> None:
    """Database and module names participate in `__`-separated view
    mangling; a name containing `__` or touching the separator with
    its own `_` would let distinct (module, database, symbol) triples
    collide on one temp-view name."""
    if not name or "__" in name or name.startswith("_") or name.endswith("_"):
        raise ValueError(
            f"invalid {what} {name!r}: must be non-empty, contain no '__', "
            "and not start/end with '_' (view-name mangling safety)"
        )


class SymbolNotFound(KeyError):
    pass


class ModuleIsolationError(RuntimeError):
    pass


class CacheCalculatingError(RuntimeError):
    """Computing a cache entry that is ALREADY in 'calculating' status —
    the reference's recursion stop (Kernel/README.md "Cached Query":
    "Adding an existing calculating index will cause an error (stop),
    which is not a failure" — e.g. a query recursive on the same index
    value)."""


class QueryCache:
    """Index-keyed result caching of a parameterized query — the
    reference's Cached Query protocol (Kernel/README.md "Cached Query"):

    - `indexes` declares the cache keys (the `index GrandParents {
      Hash(grandParent) }` declaration): each entry is a column list;
    - `submit(**bound)` resolves the provided values against the
      declared indexes ("the index for caching is used to see if the
      result has been calculated"):
      * COVERED by one or more indexes ("provided value covered by
        multiple index"): the chosen cover is an index already holding
        a computed entry for its key — the cheapest cached cover —
        else the most specific declared cover (most columns; then
        declaration order). Residual bound columns outside the cover
        apply as filters on the cached result;
      * NOT covered by any index ("provide value not covered by any
        index"): computed directly, nothing cached;
    - a miss inserts the key with the "calculating" status, computes,
      then flips to done ("if not, insert an index with the
      'calculating' status"); re-entering submit for a key that is
      calculating raises CacheCalculatingError — the recursion STOP,
      not a failure; a failed compute retracts the calculating mark so
      a later submit retries.

    Results are pinned EAGERLY (persist + count) like Database.cache —
    a cached entry must not silently recompute over mutated sources.
    `compute(**key_bound)` receives exactly the cover's columns."""

    def __init__(self, name: str, compute, indexes: list[list[str]]):
        if not indexes or any(not ix for ix in indexes):
            raise ValueError(f"{name}: declare at least one non-empty index")
        self.name = name
        self._compute = compute
        self.indexes = [list(ix) for ix in indexes]
        #: key -> ("calculating", None) | ("done", DataFrame)
        self._entries: dict[tuple, tuple] = {}
        #: observability for tests / tuning
        self.stats = {"hits": 0, "misses": 0, "uncovered": 0}

    @staticmethod
    def _key(cols: list[str], bound: dict) -> tuple:
        return tuple(cols), tuple(bound[c] for c in cols)

    def _resolve_cover(self, bound: dict) -> list[str] | None:
        covered = [ix for ix in self.indexes if set(ix) <= set(bound)]
        if not covered:
            return None
        for ix in covered:  # cheapest cached cover first
            ent = self._entries.get(self._key(ix, bound))
            if ent is not None and ent[0] == "done":
                return ix
        return max(covered, key=lambda ix: (len(ix), -self.indexes.index(ix)))

    def submit(self, **bound) -> DataFrame:
        cover = self._resolve_cover(bound)
        if cover is None:
            self.stats["uncovered"] += 1
            return self._compute(**bound)
        key = self._key(cover, bound)
        ent = self._entries.get(key)
        if ent is not None:
            status, df = ent
            if status == "calculating":
                raise CacheCalculatingError(
                    f"{self.name}: cache entry {key} is already calculating "
                    "(recursive submit on the same index value)"
                )
            self.stats["hits"] += 1
        else:
            self.stats["misses"] += 1
            self._entries[key] = ("calculating", None)
            try:
                df = self._compute(**{c: bound[c] for c in cover})
                pinned = df.persist()
                pinned.count()
                df = pinned
            except BaseException:
                del self._entries[key]  # retriable, unlike the recursion stop
                raise
            self._entries[key] = ("done", df)
        residual = [c for c in bound if c not in cover]
        for c in residual:
            df = df.where(F.col(c) == F.lit(bound[c]))
        return df

    def status(self) -> dict:
        return {k: s for k, (s, _df) in self._entries.items()}

    def invalidate(self, **bound) -> int:
        """Drop cached entries — all of them, or only those whose key
        matches every provided column value. Calculating entries are
        left alone (their computing submit owns them)."""
        doomed = []
        for (cols, vals), (status, df) in self._entries.items():
            if status != "done":
                continue
            kv = dict(zip(cols, vals))
            if all(kv.get(c) == v for c, v in bound.items()):
                doomed.append(((cols, vals), df))
        for key, df in doomed:
            df.unpersist()
            del self._entries[key]
        return len(doomed)


class Database:
    """A group of named symbols organized in nested namespaces.
    Qualified names use `::`; `public=False` symbols are invisible to
    referencing databases (draft:191: "all public symbol is usable")."""

    def __init__(self, name: str):
        _validate_component(name, "database name")
        self.name = name
        self._symbols: dict[str, DataFrame] = {}
        self._private: set[str] = set()
        self._references: list[Database] = []
        self._cached: dict[str, DataFrame] = {}
        self._query_caches: dict[str, QueryCache] = {}
        self._module: "ModuleInstance | None" = None  # set by ModuleInstance.install

    # -- symbol organization ------------------------------------------------
    def register(self, qualified: str, df: DataFrame, public: bool = True) -> None:
        """Register `df` under a (possibly nested) qualified name,
        e.g. "tpch::fact::lineitem". Segments may not contain `__`:
        the SQL-surface mangling maps `::` to `__`, and allowing both
        would let two distinct symbols collide on one view name."""
        self._validate_name(qualified)
        self._symbols[qualified] = df
        if public:
            # re-registering publicly lifts an earlier private marking
            self._private.discard(qualified)
        else:
            self._private.add(qualified)

    def _validate_name(self, qualified: str) -> None:
        if "__" in qualified or "__" in self.name:
            raise ValueError(
                f"'__' is reserved for view-name mangling: {self.name!r}/{qualified!r}"
            )
        # empty segments or '_'-adjacent separators would still mangle
        # two distinct names onto one view ('a_::_b' vs 'a::::b')
        for seg in qualified.split(SEP):
            if not seg or seg.startswith("_") or seg.endswith("_"):
                raise ValueError(
                    f"invalid namespace segment {seg!r} in {qualified!r}: segments "
                    "must be non-empty and not start/end with '_' (mangling safety)"
                )

    def reference(self, other: "Database") -> None:
        """Use another database's public symbols (draft:189-191).
        Module isolation (draft:193-197) is ENFORCED here and re-
        checked at resolve time (a module may be assigned after the
        reference is taken): two databases installed in different
        modules cannot exchange data."""
        self._check_isolation(other)
        self._references.append(other)

    def _check_isolation(self, other: "Database") -> None:
        if (
            self._module is not None
            and other._module is not None
            and other._module is not self._module
        ):
            raise ModuleIsolationError(
                f"{self.name!r} (module {self._module.name!r}) cannot reference "
                f"{other.name!r} (module {other._module.name!r}): modules cannot "
                "exchange data"
            )

    def resolve(self, name: str, using: list[str] | None = None) -> DataFrame:
        """Resolve a symbol: exact qualified name first, then each
        `using namespace` prefix (draft:177 `using namespace Nodes`),
        then referenced databases' public symbols (same order)."""
        candidates = [name] + [f"{ns}{SEP}{name}" for ns in (using or [])]
        for cand in candidates:
            if cand in self._symbols:
                return self._symbols[cand]
        for ref in self._references:
            self._check_isolation(ref)
            for cand in candidates:
                if cand in ref._symbols and cand not in ref._private:
                    return ref._symbols[cand]
        raise SymbolNotFound(f"{self.name}: no symbol {name!r} (using={using or []})")

    def namespace(self, prefix: str) -> list[str]:
        """List the symbols under a namespace prefix."""
        p = prefix + SEP
        return sorted(k for k in self._symbols if k.startswith(p))

    # -- cached computed tables (draft:67-72, 135-136) ----------------------
    def cache(self, qualified: str, df: DataFrame) -> DataFrame:
        """`index ... Cache(...)`: pin a derived table. The DataFrame
        is persisted (memory-and-disk on a cluster) and registered as
        a symbol; consumers resolve it like any table.

        Name validation runs BEFORE persist — a bad name must not
        leave an orphaned pinned DataFrame behind. The pin is EAGER
        (persist + count): `index Cache(...)` snapshots the derived
        table at cache time, so later source mutations cannot leak
        into supposedly-pinned rows (persist alone is lazy)."""
        self._validate_name(qualified)
        pinned = df.persist()
        pinned.count()
        self._cached[qualified] = pinned
        self.register(qualified, pinned)
        return pinned

    def cache_query(
        self, qualified: str, compute, indexes: list[list[str]]
    ) -> QueryCache:
        """Declare a CACHED QUERY (Kernel/README.md "Cached Query"):
        index-keyed memoization of a parameterized query with the
        calculating-status recursion stop. Returns the QueryCache;
        subsequent declarations under the same name replace it (and
        drop its pinned entries)."""
        self._validate_name(qualified)
        old = self._query_caches.get(qualified)
        if old is not None:
            old.invalidate()
        qc = QueryCache(f"{self.name}::{qualified}", compute, indexes)
        self._query_caches[qualified] = qc
        return qc

    def query_cache(self, qualified: str) -> QueryCache:
        if qualified not in self._query_caches:
            raise SymbolNotFound(f"{self.name}: no cached query {qualified!r}")
        return self._query_caches[qualified]

    def uncache(self, qualified: str, predicate: Column | None = None) -> None:
        """`uncache Table` drops the cached table entirely;
        `uncache Table(...) :- pred` invalidates only the rows
        matching `pred` (the rest stay pinned)."""
        if qualified not in self._cached:
            raise SymbolNotFound(f"{self.name}: {qualified!r} is not cached")
        old = self._cached[qualified]
        if predicate is None:
            old.unpersist()
            del self._cached[qualified]
            del self._symbols[qualified]
            return
        # keep every row NOT definitively matching: a NULL predicate
        # result means "did not match", so ~coalesce(pred, false) —
        # plain ~pred would silently drop NULL-evaluating rows
        kept = old.where(~F.coalesce(predicate, F.lit(False))).persist()
        # materialize the kept rows BEFORE releasing the old cache:
        # persist() is lazy, so unpersisting first would leave the
        # "still pinned" rows to be recomputed from original lineage —
        # over a mutated source they would change value or resurrect
        kept.count()
        old.unpersist()
        self._cached[qualified] = kept
        self._symbols[qualified] = kept

    # -- sql surface --------------------------------------------------------
    def view_name(self, qualified: str, module: str | None = None) -> str:
        """Mangle a qualified symbol to a legal temp-view name,
        prefixed with the database — and the owning module when given,
        since temp views are session-global and two modules may host
        same-named databases (draft:193-197 isolation)."""
        prefix = f"{module}__" if module else ""
        return f"{prefix}{self.name}__{qualified.replace(SEP, '__')}"

    def sql_register(self, module: str | None = None, include_private: bool = False) -> None:
        """Register symbols as temp views under their mangled
        qualified names so `spark.sql` works against the catalog.
        Private symbols are skipped by default — a session-global view
        would bypass the public/private distinction `resolve`
        enforces. Pass the owning module's name when databases live in
        modules, so same-named databases don't overwrite each other's
        views."""
        if module is None and self._module is not None:
            # the owning module recorded by install() is the default
            # disambiguator — same-named databases in different
            # modules must not overwrite each other's views
            module = self._module.name
        for qualified, df in self._symbols.items():
            if not include_private and qualified in self._private:
                continue
            df.createOrReplaceTempView(self.view_name(qualified, module))


class ModuleInstance:
    """Hosts database instances; each database has at most one
    instance per module, and modules cannot exchange data
    (draft:193-197)."""

    def __init__(self, name: str):
        _validate_component(name, "module name")
        self.name = name
        self._databases: dict[str, Database] = {}

    def install(self, db: Database) -> Database:
        if db.name in self._databases:
            raise ValueError(f"module {self.name}: database {db.name!r} already installed")
        owner = getattr(db, "_module", None)
        if owner is not None and owner is not self:
            raise ModuleIsolationError(
                f"database {db.name!r} is already installed in module "
                f"{owner.name!r}; modules cannot share database instances"
            )
        db._module = self
        self._databases[db.name] = db
        return db

    def database(self, name: str) -> Database:
        if name not in self._databases:
            raise SymbolNotFound(f"module {self.name}: no database {name!r}")
        return self._databases[name]

    def resolve(self, db_name: str, symbol: str, using: list[str] | None = None) -> DataFrame:
        return self.database(db_name).resolve(symbol, using)

    def check_same_module(self, db: Database) -> None:
        """Guard used by cross-database operations: both ends must be
        installed in THIS module (modules cannot exchange data)."""
        if db.name not in self._databases or self._databases[db.name] is not db:
            raise ModuleIsolationError(
                f"database {db.name!r} is not installed in module {self.name!r}"
            )
