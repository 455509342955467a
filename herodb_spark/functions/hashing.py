"""Hash-family expressions for sketching (MinHash, SimHash) — built on
Spark's JVM-side xxhash64; no Python in the loop.

These back the rows-only-checked dedup operators (DuckDB has no
xxhash64, so no SQL oracle), but every step is deterministic given the
seed so results are stable across runs/partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_shingles(tokens_col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from a token array (JVM-side)."""
    n = F.size(tokens_col)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(F.array())


def minhash_signature(shingles_col: Column, num_perm: int = 64) -> Column:
    """num_perm-wide MinHash signature: sig[i] = min over shingles of
    xxhash64(i, shingle). One pass over the shingle array per perm,
    all inside codegen."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(shingles_col, lambda s: F.xxhash64(i, s))),
    )


def lsh_bands(sig_col: Column, bands: int = 16, rows: int = 4) -> Column:
    """Split a signature into `bands` keys: array of structs
    (band_id, band_key) where band_key hashes `rows` signature slots.
    Explode + groupBy(band_id, band_key) gives LSH buckets — the join
    key cardinality scales with corpus size, so bucketing is shuffle-
    friendly at any scale (no global structure, no driver state)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.xxhash64(b, F.concat_ws(",", F.slice(sig_col, b * rows + 1, rows))).alias("band_key"),
        ),
    )


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token multiset: per bit j, sum +1/-1 votes
    of xxhash64(token) bit j, weighted by token multiplicity; bit set
    when the vote is positive. One fold over the token array carrying
    a 64-wide counter array — all JVM-side. (Bit positions are Python
    ints because shiftleft/shiftright take a literal bit count.)"""
    counters = F.aggregate(
        tokens_col,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for j in range(64)
                ]
            ),
            lambda a, v: a + v.cast("long"),
        ),
    )
    bit_terms = [
        F.when(F.element_at(counters, j + 1) > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(64)
    ]
    out = bit_terms[0]
    for term in bit_terms[1:]:
        out = out.bitwiseOR(term)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
