"""HeroQL program runner.

    python -m herodb_spark.heroql program.hql --data /root/testdata/sf0.01
    python -m herodb_spark.heroql program.hql --table Person=people.parquet

Every `*.parquet` under --data registers as a base table under its
file stem (the full testdata catalog by default); --table adds or
overrides individual bindings, with `name=path[:class:keycol]` marking
a `data class` table. Each `query` / `collection_query` in the program
prints its first --max-rows rows; derived tables stay lazy unless
queried.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m herodb_spark.heroql", description=__doc__)
    ap.add_argument("program", help="HeroQL source file")
    ap.add_argument("--data", help="directory of <name>.parquet base tables")
    ap.add_argument(
        "--table", action="append", default=[],
        metavar="NAME=PATH[:class:KEY]",
        help="bind one table; ':class:KEY' registers a data class row table",
    )
    ap.add_argument("--max-rows", type=int, default=20)
    ap.add_argument("--max-iters", type=int, default=32, help="recursion round cap")
    ap.add_argument(
        "--snapshot", action="append", default=[], metavar="NAME=PATH",
        help="bind a DURABLE snapshot table (sources/snapshot.py); the "
        "program's set/update/remove statements commit to it",
    )
    ap.add_argument(
        "--database", metavar="PATH",
        help="bind every member table of a SnapshotDatabase (durable, "
        "database-scope commits)",
    )
    ap.add_argument(
        "--transactional", action="store_true",
        help="with --database: run the whole program as ONE multi-table "
        "atomic transaction (a failure leaves the database untouched)",
    )
    ap.add_argument(
        "--at-version", type=int, metavar="K",
        help="time travel: resolve --database tables through database "
        "version K's pin set (and --snapshot tables at table version K). "
        "Bindings are READ-ONLY plain tables — mutation statements in the "
        "program stay in-memory and nothing commits",
    )
    args = ap.parse_args(argv)

    from herodb_spark.heroql import HeroQL

    if spark is None:
        from herodb_spark.session import get_spark

        spark = get_spark("heroql")
        spark.sparkContext.setLogLevel("ERROR")
    hql = HeroQL(spark, max_iters=args.max_iters)

    if args.data:
        from herodb_spark.catalog import TABLE_NAMES, load_table

        for path in sorted(glob.glob(os.path.join(args.data, "*.parquet"))):
            name = os.path.splitext(os.path.basename(path))[0]
            if name in TABLE_NAMES:
                hql.register(name, load_table(spark, args.data, name))
            else:
                hql.register(name, spark.read.parquet(path))
    for spec in args.table:
        name, _, rest = spec.partition("=")
        if not rest:
            ap.error(f"--table needs NAME=PATH, got {spec!r}")
        # the class marker is anchored to the END of the spec, so URI
        # paths (s3a://, hdfs://) and even paths that happen to contain
        # the literal ':class' (data:classes/x.parquet) survive intact
        is_class, key = False, None
        path = rest
        m = re.match(r"^(.*?):class(?::(.+))?$", rest)
        if m:
            path, key = m.group(1), m.group(2)
            is_class = True
        hql.register(name, spark.read.parquet(path), is_class=is_class, key=key)

    if args.transactional and not args.database:
        ap.error("--transactional requires --database")
    if args.transactional and args.at_version is not None:
        ap.error("--at-version bindings are read-only; drop --transactional")
    if args.database:
        from herodb_spark.sources.database import SnapshotDatabase

        db = SnapshotDatabase(spark, args.database)
        if args.at_version is not None:
            # historical pin set, read-only: every member table at the
            # version database version K pinned for it
            for name in sorted(db.tables(db_version=args.at_version)):
                hql.register(name, db.read(name, db_version=args.at_version))
        else:
            hql.register_database(db)
    for spec in args.snapshot:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"--snapshot needs NAME=PATH, got {spec!r}")
        from herodb_spark.sources.snapshot import SnapshotTable

        snap = SnapshotTable(spark, path)
        if args.at_version is not None:
            hql.register(name, snap.read(version=args.at_version))
        else:
            hql.register_snapshot(name, snap)

    with open(args.program) as f:
        text = f.read()
    res = hql.run_transactional(text) if args.transactional else hql.run(text)
    for i, df in enumerate(res.queries):
        name = next((n for n, d in res.named.items() if d is df), f"query {i + 1}")
        print(f"-- {name} ({', '.join(df.columns)})")
        for row in df.limit(args.max_rows).collect():
            print("   " + " | ".join(str(v) for v in row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
