"""Hash-family expressions for sketching (MinHash, SimHash) — built on
Spark's JVM-side xxhash64; no Python in the loop.

These back the rows-only-checked dedup operators (DuckDB has no
xxhash64, so no SQL oracle), but every step is deterministic given the
seed so results are stable across runs/partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minhash_aggs(shingle_col: Column, num_perm: int = 64) -> list[Column]:
    """MinHash as plain aggregates over an *exploded* shingle column:
    sig[i] = MIN(xxhash64(i, shingle)).

    Deliberately NOT a higher-order-function fold over the shingle
    array: Spark evaluates HOF lambdas interpreted (outside
    whole-stage codegen), which measured ~10× slower. Exploded
    min-aggregates are codegen'd, get map-side partial aggregation,
    and scale linearly with corpus size."""
    return [F.min(F.xxhash64(F.lit(i), shingle_col)).alias(f"mh{i}") for i in range(num_perm)]


def lsh_band_structs(num_perm: int = 64, bands: int = 32) -> Column:
    """Band keys from the mh0..mh{num_perm-1} signature columns of
    minhash_aggs: array of (band_id, band_key) structs where band_key
    hashes that band's signature slots. Explode + groupBy
    (band_id, band_key) gives LSH buckets — key cardinality scales
    with the corpus, so buckets stay small at any scale (no global
    structure, no driver state)."""
    if num_perm % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm}: integer division "
            "would silently drop the top signature slots and degrade recall"
        )
    rows = num_perm // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(F.lit(b), *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def simhash_vote_aggs(token_col: Column) -> list[Column]:
    """SimHash bit votes as plain aggregates over an *exploded* token
    column: vote[j] = SUM(bit_j(xxhash64(token)) ? +1 : -1). Same
    explode-not-HOF rationale as minhash_aggs (codegen + map-side
    combine)."""
    h = F.xxhash64(token_col)
    return [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"v{j}")
        for j in range(64)
    ]


def simhash_from_votes() -> Column:
    """Recombine the v0..v63 vote columns into the 64-bit signature."""
    out = F.lit(0).cast("long")
    for j in range(64):
        out = out.bitwiseOR(
            F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
