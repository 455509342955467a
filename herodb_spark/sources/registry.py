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
