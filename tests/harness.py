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
        # the driver's hasher is TYPE-sensitive: DuckDB HUGEINT/DECIMAL
        # results must not silently compare equal to Spark LONG/DOUBLE
        # (round-1 graph_degree hash mismatch). Tag the type so any
        # Decimal-vs-number skew fails here the way it fails there.
        return ("decimal", str(v))
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
        # the driver canonicalizes through pandas sort_values, which
        # raises "unhashable type: 'list'" on array cells (round-1
        # agg_collect ERROR). Mimic the gate: array cells are a bug.
        # (PySpark Row is a tuple subclass — report struct cells by
        # their real name so nobody hunts a nonexistent array column.)
        kind = "struct (Row)" if type(v).__name__ == "Row" else "list"
        raise TypeError(
            f"unhashable cell type: {kind} — the official gate cannot hash "
            "non-scalar cells; emit deterministic scalars (e.g. concat_ws of "
            "sort_array, or flatten the struct to columns)"
        )
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

    Returns dict with keys ok / spark_rows / duck_rows / detail.
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
    # schema first: a renamed/missing column must be reported as a
    # schema mismatch, not as a nonsensical type skew against ''
    if sorted(s_cols) != sorted(d_cols):
        result["ok"] = False
        result["detail"].append(f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return result
    # Driver-fidelity type audit: DuckDB promotes integer SUMs to
    # HUGEINT/DECIMAL(38,0); fetchall() hides that as plain int but the
    # official gate's pandas canonicalization does not (round-1
    # graph_degree hash mismatch). Fail on any oracle column whose
    # declared type Spark cannot emit bit-identically.
    s_dtypes = dict(spark_df.dtypes)
    for col, dtype in zip(d_cols, rel.types):
        t = str(dtype).upper()
        s_t = s_dtypes.get(col, "")
        if t in ("HUGEINT", "INT128", "UHUGEINT"):
            result["ok"] = False
            result["detail"].append(
                f"oracle type skew: {col} is {t} (DuckDB integer-SUM promotion); "
                f"CAST(... AS BIGINT) in the oracle"
            )
        elif t.startswith("DECIMAL") and not s_t.startswith("decimal"):
            result["ok"] = False
            result["detail"].append(
                f"oracle type skew: {col} is {t} but Spark emits {s_t}; "
                f"cast both sides identically"
            )
    if not result["ok"]:
        return result
    if len(s_rows) != len(d_rows):
        result["ok"] = False
        result["detail"].append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")
    ns = _norm_rows(s_cols, s_rows)
    nd = _norm_rows(d_cols, d_rows)
    if ns != nd:
        result["ok"] = False
        # set differences are the meaningful signal (positional pairing
        # of two sorted lists misaligns after one extra row); sets are
        # hoisted so the diagnostic stays O(n), not O(n*m)
        snd, sns = set(nd), set(ns)
        only_s = [r for r in ns if r not in snd][:3]
        only_d = [r for r in nd if r not in sns][:3]
        result["detail"].append(f"value mismatch; spark_only={only_s} duck_only={only_d}")
    return result
