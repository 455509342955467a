"""Source/sink registry: the reference's storage engine
(Kernel/Source/Utility/Buffer.h — page sources over files and memory;
FileBuffer.h / InMemoryBuffer.h) maps onto Spark's datasource API.
Where herodb pages + WAL give durability and buffer management, Spark
delegates to columnar files + the commit protocol; what remains *our*
responsibility is physical layout — the analog of herodb's declared
indexes (draft:44-47):

  index Hash(k)     → partitionBy(k) directory layout (partition
                      pruning = hash-index lookup)
  index Ordered(k)  → sortWithinPartitions(k) (+ parquet min/max row-
                      group stats = range-index scan)
  index Unique(k)   → dedup-on-write enforcement

Readers return lazy DataFrames so Catalyst pushes filters/projection
into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

READ_FORMATS = ("parquet", "csv", "json", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Read a table from any supported format. CSV/JSON get explicit
    schemas in production paths — runtime inference reads the data
    twice and can drift between runs."""
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READ_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        # write_table always writes headers — the header option must be
        # set on BOTH branches or the explicit-schema (production) path
        # parses the header line as a data row
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    sort_within_by: list[str] | None = None,
    unique_key: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with declared-index layout semantics.

    - partition_by → `index Hash(...)`: directory partitioning; scans
      filtered on these columns prune whole directories.
    - sort_within_by → `index Ordered(...)`: rows sorted inside each
      file so parquet row-group min/max stats skip pages on range
      predicates.
    - unique_key → `index Unique(...)`: keep one row per key
      (deterministically: the min of a total ordering over remaining
      columns), enforcing the constraint on write like herodb's
      unique index does on insert.
    """
    if unique_key:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        others = [c for c in df.columns if c not in unique_key]
        if not others:
            # key covers every column: plain full-row dedup (an empty
            # window ordering would make row_number() unresolvable)
            df = df.dropDuplicates(unique_key)
        else:
            rn = "_rn"
            while rn in df.columns:  # never clobber a user column
                rn += "_"
            w = Window.partitionBy(*unique_key).orderBy(
                *[F.col(c).asc_nulls_last() for c in others]
            )
            df = df.withColumn(rn, F.row_number().over(w)).where(F.col(rn) == 1).drop(rn)
    if sort_within_by:
        if partition_by:
            df = df.repartition(*[df[c] for c in partition_by])
        df = df.sortWithinPartitions(*sort_within_by)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table — the CO-LOCATION half of `index
    Hash(k)` (draft:44-47): two tables bucketed the same way join with
    NO shuffle on either side (tests assert zero Exchange in the
    plan), which at 100 TB turns every fact-fact equi-join on the
    bucket key from the dominant shuffle into a local merge. Bucketing
    requires the session catalog (saveAsTable); directory-layout
    `partitionBy` (write_table) remains the pruning half."""
    spark = df.sparkSession
    if mode == "overwrite":
        # an in-memory catalog forgets managed tables between sessions
        # but their warehouse directories persist — drop both, or
        # saveAsTable fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import shutil
        from urllib.parse import unquote, urlparse

        wh = unquote(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
        if "." in table:  # qualified names live under <db>.db/<table>
            db, _, t = table.rpartition(".")
            shutil.rmtree(f"{wh}/{db.lower()}.db/{t.lower()}", ignore_errors=True)
        else:
            shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — preserves the bucket spec, so Catalyst plans
    bucket-aware scans (`spark.sql.sources.bucketing.enabled`)."""
    return spark.table(table)


def auto_increment_ids(
    df: DataFrame,
    id_col: str = "id",
    order_by: list[str] | None = None,
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """``index AutoIncresed(id)`` (Kernel/Drafts/draft_type:127-129,
    155-160): surrogate-key assignment for appended rows — the
    reference's UnknownType.id / LambdaType.id allocator ("id : int
    # for printing").

    Two modes, both collision-free:

    - `order_by` given → DENSE DETERMINISTIC ids `start, start+1, …`
      in that order. Implemented as a per-partition count + driver-
      side offset fold (the classic scalable zipWithIndex shape): one
      pass counts rows per sorted partition, a tiny collect folds the
      running offsets, and a second pass stamps `offset +
      row_number_within_partition`. Work per executor is O(partition);
      the only driver data is one count per partition — NOT a global
      single-partition window, which would serialize the whole table
      through one task at 100 TB.
    - `order_by=None` → `monotonically_increasing_id() + start`:
      unique, one pass, no shuffle at all; ids are sparse
      (partition-encoded), the right default when "unique and stable"
      is all the index promises.

    For APPEND on an existing table, pass ``start = current_max + 1``
    (the max is manifest/statistics metadata in a snapshot table).
    ``num_partitions`` pins the range-shuffle width (otherwise AQE
    sizes it); ids are correct either way — the partition id is
    captured as a column on the materialized rows, so the offset map
    and the window agree by construction."""
    from pyspark.sql import Window

    if order_by is None:
        return df.withColumn(id_col, F.monotonically_increasing_id() + F.lit(start))
    # materialize the range partitioning ONCE so the count pass and the
    # stamp pass see identical partitions (zipWithIndex's contract);
    # `order_by` must be a unique key for ids to be deterministic.
    # CRITICAL: the partition id must be captured as a REAL COLUMN on
    # the materialized rows — a bare spark_partition_id() in the final
    # projection evaluates ABOVE the window's Exchange and reads the
    # post-shuffle pid, while the offsets are keyed by pre-shuffle
    # pids (confirmed id collisions at multi-partition sizes; unit
    # tests alone missed it because AQE coalesces tiny data to one
    # partition).
    parted = df.repartitionByRange(*order_by) if num_partitions is None else df.repartitionByRange(
        num_partitions, *order_by
    )
    parted = parted.sortWithinPartitions(*order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    parted = parted.localCheckpoint(eager=True)
    counts = dict(
        (r.p, r.c)
        for r in parted.groupBy(F.col("__pid").alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    offsets, acc = {}, start
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return parted.withColumn(
        id_col, (off_map[F.col("__pid")] + F.row_number().over(w) - 1).cast("long")
    ).drop("__pid")
