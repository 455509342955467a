from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from herodb_spark.catalog import load_table
from herodb_spark.sources import registry as SR


def test_partitioned_write_prunes(spark, sf_dir):
    """`index Hash(priority)` analog: partitionBy layout must produce
    partition-pruned scans."""
    orders = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "orders_part")
        SR.write_table(orders, path, partition_by=["o_orderpriority"], sort_within_by=["o_orderdate"])
        back = SR.read_source(spark, path).where(F.col("o_orderpriority") == "1-URGENT")
        want = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
        assert back.count() == want
        plan = back._jdf.queryExecution().executedPlan().toString()
        # partition filter present → directory pruning, not a full scan
        assert "PartitionFilters: [" in plan and "o_orderpriority" in plan.split("PartitionFilters:")[1][:200], plan[:1500]


def test_unique_key_write_dedups(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    doubled = cust.unionByName(cust)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "cust_unique")
        SR.write_table(doubled, path, unique_key=["c_custkey"])
        back = SR.read_source(spark, path)
        assert back.count() == cust.count()
        assert back.select("c_custkey").distinct().count() == cust.count()


def test_csv_json_roundtrip(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as tmp:
        for fmt in ("csv", "json", "orc"):
            path = os.path.join(tmp, f"nation_{fmt}")
            SR.write_table(nation, path, fmt=fmt)
            back = SR.read_source(spark, path, fmt=fmt)
            assert back.count() == 25
            got = {tuple(r) for r in back.select("n_nationkey", "n_name", "n_regionkey").collect()}
            want = {tuple(r) for r in nation.collect()}
            assert got == want
