"""Scale-technique operators: the patterns that matter at 100 TB,
each demonstrated as a real operator on the test tables.

- `ann_ivf_topk`: IVF (inverted-file) ANN — KMeans-partition the
  corpus once, probe only the nearest N_PROBE partitions per query,
  exact rerank inside. The standard billion-vector layout: centroids
  broadcast, buckets are co-located partitions.
- `skew_join_salted`: hot-key join with deterministic salting —
  results hash-identical to the plain join (oracle-checked); the
  salt spreads the hot key across SALT_BUCKETS reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table
from herodb_spark.functions import vector as V

IVF_K = 16          # floor, not the size: see ivf_k_for()
N_PROBE = 2         # floor; probes scale with k (constant probe fraction)
TOP_K = 5
N_QUERIES = 10
SALT_BUCKETS = 16
#: target expected cluster size — k grows linearly with the corpus so
#: per-cluster work stays bounded (the same auto-sizing contract as
#: dedup.emb_lsh_dims, which derives LSH geometry from a corpus count)
TARGET_CLUSTER = 128


def ivf_k_for(n_vectors: int) -> int:
    """k-means k for a corpus of `n_vectors`: k ≈ n / TARGET_CLUSTER
    (floored at IVF_K) so the EXPECTED cluster size never exceeds
    TARGET_CLUSTER no matter the corpus scale. For SemDeDup this is
    what makes Σ n_c² ≈ n · TARGET_CLUSTER ≪ n² (linear, not
    quadratic, in the corpus); for IVF it keeps probe selectivity
    constant as the corpus grows. Derived at plan-build time from one
    cheap count — identical knob to emb_lsh_dims (dedup.py), the r5
    fix for the same fixed-geometry disease."""
    import math

    return max(IVF_K, math.ceil(max(1, n_vectors) / TARGET_CLUSTER))


def ivf_probes_for(k: int) -> int:
    """Probes scale with k so the probed FRACTION of the corpus stays
    ~constant (N_PROBE/IVF_K = 1/8) as k grows with the corpus."""
    return max(N_PROBE, k * N_PROBE // IVF_K)


def _kmeans_centroids(spark: SparkSession, emb: DataFrame, k: int):
    """Fit KMeans(seed=42) on the embedding column (MLlib; one pass
    over the corpus at scale, centroids are tiny and broadcastable)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select("vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=42, maxIter=20).fit(train)
    return model


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign corpus to KMeans cells, probe the N_PROBE
    nearest cells per query, exact cosine rerank. Driver check is
    rows-only (KMeans has no SQL equivalent); determinism (fixed
    seed) and neighbor validity are pinned in tests.

    k and the probe count are corpus-derived (ivf_k_for /
    ivf_probes_for) so cluster sizes and probe selectivity stay
    constant as the corpus scales; the input is only spread when it
    has fewer partitions than cores (`_balance_partitions` — identity
    on a well-partitioned 100 TB scan, never a keyed shuffle)."""
    from pyspark.ml.functions import array_to_vector

    from herodb_spark.operators.similarity import _balance_partitions

    emb = _balance_partitions(load_table(spark, sf_dir, "embeddings"))
    k = ivf_k_for(emb.count())
    n_probe = ivf_probes_for(k)
    model = _kmeans_centroids(spark, emb, k)
    assigned = model.transform(
        emb.select(
            "vec_id",
            "embedding",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        )
    ).select("vec_id", "embedding", F.col("prediction").alias("cell"))

    # nearest N_PROBE cells per query = rank cells by cosine(query, centroid)
    centroids = [(int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cent_df = F.broadcast(
        spark.createDataFrame(centroids, "cell int, centroid array<double>")
    )
    q = F.broadcast(
        assigned.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    cell_rank = Window.partitionBy("q_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    probe = (
        q.crossJoin(cent_df)
        .select("q_id", "q_emb", "cell", V.cosine(F.col("q_emb"), F.col("centroid")).alias("cell_cos"))
        .withColumn("crk", F.row_number().over(cell_rank))
        .where(F.col("crk") <= n_probe)
        .select("q_id", "q_emb", "cell")
    )
    from herodb_spark.operators.similarity import _topk_per_query

    scored = (
        probe.join(assigned, "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", V.cosine_rounded(F.col("q_emb"), F.col("embedding"), 6).alias("cosine"))
    )
    return (
        _topk_per_query(scored, "cosine", TOP_K)
        .select("q_id", "rk", F.col("vec_id").alias("neighbor_id"), "cosine")
        .orderBy("q_id", "rk")
    )


def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join, salted. Key construction makes user_id<50 all
    collapse onto key 0 (a deliberate hot key ~25% of events). The
    small side is exploded ×SALT_BUCKETS; the big side salts by
    event_id — deterministic, no RNG. Result is semantically the
    plain join (oracle checks against the unsalted SQL)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.col("user_id") < 50, F.lit(0)).otherwise(F.col("user_id")).alias("k"),
    )
    dim = (
        load_table(spark, sf_dir, "events")
        .select(F.when(F.col("user_id") < 50, F.lit(0)).otherwise(F.col("user_id")).alias("k"))
        .distinct()
        .withColumn("k_label", F.concat(F.lit("grp_"), F.col("k")))
    )
    salted_dim = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))))
    salted_ev = ev.withColumn("salt", (F.col("event_id") % SALT_BUCKETS).cast("int"))
    return (
        salted_ev.join(salted_dim, ["k", "salt"])
        .groupBy("k", "k_label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("total_value"),
        )
        .orderBy("k")
    )


SKEW_JOIN_SALTED_SQL = """
WITH ev AS (
  SELECT event_id, value,
         CASE WHEN user_id < 50 THEN 0 ELSE user_id END AS k
  FROM events
),
dim AS (
  SELECT DISTINCT CASE WHEN user_id < 50 THEN 0 ELSE user_id END AS k FROM events
)
SELECT ev.k, 'grp_' || ev.k AS k_label,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM ev JOIN dim ON ev.k = dim.k
GROUP BY ev.k ORDER BY ev.k
"""


from herodb_spark.operators.dedup import COSINE_THRESHOLD as SEMDEDUP_TAU

#: within-cluster cosine at or above this marks a semantic duplicate —
#: BY CONSTRUCTION the same threshold the exact/LSH embedding dedup
#: uses (imported, so the two can never drift; r8 review)


def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (the public recipe:
    Abbas et al. 2023, "SemDeDup" — k-means the embedding space,
    search duplicates only WITHIN clusters, keep one representative
    per duplicate group): the embedding-space counterpart of the
    lexical dedup family, catching paraphrases with no shared n-grams.

    Deterministic keep rule (relational form of the paper's
    keep-the-centroid-farthest choice): within a cluster, a vector is
    DROPPED iff some τ-similar cluster-mate ranks better, where
    better = lower cosine-to-centroid (the outlier carries the most
    information), ties by lower vec_id. Among any τ-similar pair the
    worse-ranked member is always dropped, so no two kept vectors in
    one cluster are τ-similar (pinned in tests).

    Plan (100-TB shape):
    - one KMeans fit (seed-pinned; centroids broadcast);
    - pairwise cosine ONLY within clusters — k = ivf_k_for(count) is
      DERIVED from the corpus so the expected cluster size stays at
      TARGET_CLUSTER and Σ n_c² ≈ n·TARGET_CLUSTER ≪ n² (linear in
      the corpus; the whole point of the recipe — sizing-law-tested
      in test_scale.py);
    - the keep decision is one aggregate over directed in-cluster
      τ-pairs, no iteration;
    - the input is only spread when it has fewer partitions than
      cores (`_balance_partitions`, identity at scale — no
      full-corpus keyed pre-shuffle).

    Driver check is rows-only (KMeans has no SQL oracle — same
    contract as ann_ivf_topk); determinism + keep-rule laws are
    pinned in tests/test_scale.py."""
    from pyspark.ml.functions import array_to_vector

    from herodb_spark.operators.similarity import _balance_partitions

    emb = _balance_partitions(load_table(spark, sf_dir, "embeddings"))
    model = _kmeans_centroids(spark, emb, ivf_k_for(emb.count()))
    assigned = model.transform(
        emb.select(
            "vec_id",
            "embedding",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        )
    ).select("vec_id", "embedding", F.col("prediction").alias("cell"))
    centroids = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = F.broadcast(
        spark.createDataFrame(centroids, "cell int, centroid array<double>")
    )
    with_c = assigned.join(cent_df, "cell").select(
        "cell",
        "vec_id",
        "embedding",
        V.cosine_rounded(F.col("embedding"), F.col("centroid"), 6).alias("ccos"),
    ).localCheckpoint(eager=False)
    a = with_c.select(
        "cell",
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        F.col("ccos").alias("ca"),
    )
    b = with_c.select(
        "cell",
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("eb"),
        F.col("ccos").alias("cb"),
    )
    dropped = (
        a.join(b, "cell")
        .where(F.col("ida") != F.col("idb"))
        .where(V.cosine_rounded(F.col("ea"), F.col("eb"), 6) >= SEMDEDUP_TAU)
        .where(
            (F.col("cb") < F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("idb") < F.col("ida")))
        )
        .select(F.col("ida").alias("vec_id"))
        .distinct()
    )
    return (
        with_c.join(dropped.withColumn("k", F.lit(False)), "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "ccos",
            F.coalesce(F.col("k"), F.lit(True)).alias("keep"),
        )
        .orderBy("vec_id")
    )
