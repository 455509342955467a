"""DuckDB-oracle comparison harness, replicating the driver's
correctness gate: row count + schema (column names) + order-insensitive
value hash. Used by unit tests at small SF so driver runs hold no
surprises.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from herodb_spark.catalog import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — the contract is bit-identical doubles
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i]) for i in order))
    out.sort(key=repr)
    return out


def compare(spark_df, oracle_sql: str, con) -> dict:
    """Compare a Spark DataFrame against a DuckDB oracle query.

    Returns dict with keys ok/rows/schema/detail.
    """
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(oracle_sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    result = {
        "ok": True,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "detail": [],
    }
    if sorted(s_cols) != sorted(d_cols):
        result["ok"] = False
        result["detail"].append(f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return result
    if len(s_rows) != len(d_rows):
        result["ok"] = False
        result["detail"].append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")
    ns = _norm_rows(s_cols, s_rows)
    nd = _norm_rows(d_cols, d_rows)
    if ns != nd:
        result["ok"] = False
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        only_s = [r for r in ns if r not in set(nd)][:3]
        only_d = [r for r in nd if r not in set(ns)][:3]
        result["detail"].append(f"value mismatch; first_pair_diffs={diffs}")
        result["detail"].append(f"spark_only={only_s} duck_only={only_d}")
    return result
