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


# ---------------------------------------------------------------- PQ ANN

PQ_M = 8          # subvector blocks (64-dim corpus → 8 dims per block)
PQ_CODES = 32     # centroids per block codebook
PQ_OVERFETCH = 16  # ADC candidates fetched per exact top-k slot


def _pq_dim_sub(emb: DataFrame) -> tuple[int, int]:
    dim = len(emb.select("embedding").first()[0])
    assert dim % PQ_M == 0, f"dim {dim} not divisible into {PQ_M} blocks"
    return dim, dim // PQ_M


def _pq_codebooks(emb: DataFrame) -> list:
    """Train the PQ codec: one small KMeans (pinned seed 42+m) per
    block on the block slice. Codebooks are codec METADATA — collected
    driver-side like any codec header and re-entering plans as
    literals."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    _dim, sub = _pq_dim_sub(emb)
    blocks = emb.select(
        "vec_id",
        *[
            array_to_vector(
                F.slice(F.col("embedding").cast("array<double>"), m * sub + 1, sub)
            ).alias(f"b{m}")
            for m in range(PQ_M)
        ],
    ).localCheckpoint(eager=True)  # one slice pass feeds all PQ_M fits
    codebooks: list = []
    for m in range(PQ_M):
        model = KMeans(k=PQ_CODES, seed=42 + m, maxIter=20, featuresCol=f"b{m}").fit(
            blocks.select("vec_id", f"b{m}")
        )
        codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
    return codebooks


def _pq_lit_arrays(codebooks: list):
    """Flat literal arrays (codec metadata re-entering the plan):
    cb_flat[m*PQ_CODES*sub + k*sub + d] = centroid coord,
    cbn[m*PQ_CODES + k] = ‖centroid‖²."""
    cb_flat = F.array(
        *[F.lit(x) for m in range(PQ_M) for c in codebooks[m] for x in c]
    )
    cbn = F.array(
        *[
            F.lit(sum(x * x for x in c))
            for m in range(PQ_M)
            for c in codebooks[m]
        ]
    )
    return cb_flat, cbn


def _pq_encode(emb: DataFrame, codebooks: list) -> DataFrame:
    """Encode the corpus: per block, argmin_k(‖x_m‖² − 2⟨x_m,c⟩ + ‖c‖²)
    — the ‖x_m‖² term is constant per block so argmin over
    (‖c‖² − 2⟨x_m,c⟩); ties take the FIRST (lowest) code id. Returns
    (vec_id, codes array<int>, dnorm) — PQ_M small ints + one double
    per vector, the 32×-compressed scan image. Pure codegen array
    expressions; no keyed shuffle."""
    _dim, sub = _pq_dim_sub(emb)
    cb_flat, cbn = _pq_lit_arrays(codebooks)

    def block_code(m: int):
        xm = F.slice(F.col("embedding").cast("array<double>"), m * sub + 1, sub)
        scores = F.transform(
            F.sequence(F.lit(0), F.lit(PQ_CODES - 1)),
            lambda k: F.element_at(cbn, m * PQ_CODES + k + 1)
            - 2.0
            * F.aggregate(
                F.zip_with(
                    xm,
                    F.sequence(F.lit(1), F.lit(sub)),
                    lambda x, d: x
                    * F.element_at(cb_flat, (m * PQ_CODES * sub) + (k * sub) + d),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        # ties take the FIRST (lowest) code id — array_position is 1-based
        return (F.array_position(scores, F.array_min(scores)) - 1).cast("int")

    codes_col = F.array(*[block_code(m) for m in range(PQ_M)])
    # decoded norm² = Σ_m ‖c_{m,code_m}‖² (blocks are disjoint dims)
    dn2 = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda code, m: F.element_at(cbn, m * PQ_CODES + code + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.select("vec_id", codes_col.alias("codes")).withColumn("dnorm", F.sqrt(dn2))


def _pq_adc_tables(spark: SparkSession, emb: DataFrame, codebooks: list) -> DataFrame:
    """Per-query ADC lookup tables: one PQ_M×PQ_CODES array of exact
    query-block · centroid dot products per query (collected query
    vectors are N_QUERIES rows of metadata), broadcast."""
    from herodb_spark.operators.similarity import _queries

    _dim, sub = _pq_dim_sub(emb)
    qrows = sorted(
        (int(r.q_id), [float(x) for x in r.q_emb])
        for r in _queries(emb).collect()
    )
    qtab_rows = []
    for q_id, qv in qrows:
        qn = sum(x * x for x in qv) ** 0.5
        tab = [
            sum(
                qv[m * sub + d] * codebooks[m][k][d]
                for d in range(sub)
            )
            for m in range(PQ_M)
            for k in range(PQ_CODES)
        ]
        qtab_rows.append((q_id, qn, tab))
    return F.broadcast(
        spark.createDataFrame(qtab_rows, "q_id long, qnorm double, tab array<double>")
    )


def _pq_adc_approx():
    """ADC cosine: PQ_M table lookups per corpus vector — no
    arithmetic on the original floats at all."""
    adc_dot = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda code, m: F.element_at(F.col("tab"), m * PQ_CODES + code + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(adc_dot / (F.col("qnorm") * F.col("dnorm")), 9)


def _pq_exact_rerank(emb: DataFrame, cands: DataFrame) -> DataFrame:
    """Rerank ADC candidates against the FULL-precision embedding
    (6dp rounded, doc-id tie-break) — same output contract as
    ann_bruteforce_topk. Touches ≤ |Q|·K·PQ_OVERFETCH rows."""
    from herodb_spark.operators.similarity import _queries

    q = F.broadcast(_queries(emb))
    exact = V.cosine_rounded(F.col("q_emb"), F.col("embedding"), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cands.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(q, "q_id")
        .select("q_id", "vec_id", exact.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("q_id", "rk", F.col("vec_id").alias("neighbor_id"), "cosine")
        .orderBy("q_id", "rk")
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN with exact rerank — the codec that
    actually carries billion-vector stores: each vector is split into
    PQ_M subvectors, each subvector replaced by the id of its nearest
    per-block KMeans centroid, so the corpus scans as PQ_M small ints
    per vector (64 float32 dims = 256 B → 8 codes = 32× compression —
    scalar int8 quantization manages only 4×). Query scoring is ADC
    (asymmetric distance computation): one PQ_M×PQ_CODES table of
    exact query-block · centroid dot products per query, after which
    every corpus vector scores via PQ_M table LOOKUPS. Top
    K×PQ_OVERFETCH ADC candidates then rerank against the
    FULL-precision embedding — same output contract as
    ann_bruteforce_topk. (Since r12 the codec stages are shared
    helpers — _pq_codebooks/_pq_encode/_pq_adc_tables — composed
    unchanged by ann_ivfpq_topk, the cell-probed variant.)

    Scale shape: codebooks are PQ_M KMeans fits on block slices (one
    pass each, centroids are driver-side codec metadata); encoding and
    ADC scoring are pure codegen array expressions over natural scan
    partitions (no keyed shuffle of the corpus); the rerank join
    touches ≤ |Q|·K·PQ_OVERFETCH rows (AQE broadcasts them).
    Determinism: KMeans seeds pinned per block; argmin ties take the
    lowest code id; rank ties take the lowest vec_id.

    Recall contract: rows-only DELIBERATELY (like ann_lsh/ann_ivf,
    unlike ann_quantized whose int8 error is tiny): PQ's decoded
    approximation of this corpus' near-random synthetic embeddings
    carries limited rank signal, so even a 16× overfetch measures
    recall@5 of 0.86/0.98 at sf0.001/sf0.01 (r11) — claiming the
    exact-top-k oracle would misstate the operator. Recall floor,
    determinism, and codec laws are pinned in tests; on real
    (clustered) embeddings PQ recall is far higher — the geometry
    knobs are PQ_M/PQ_CODES/PQ_OVERFETCH."""
    from herodb_spark.operators.similarity import _balance_partitions, _topk_per_query

    emb = _balance_partitions(load_table(spark, sf_dir, "embeddings"))
    codebooks = _pq_codebooks(emb)
    # the codec pass is the expensive stage; at scale this is the
    # PERSISTED index (like the minhash band table) — pin it so the
    # query side doesn't re-encode per reference
    encoded = _pq_encode(emb, codebooks).localCheckpoint(eager=True)
    qtab = _pq_adc_tables(spark, emb, codebooks)
    scored = (
        qtab.crossJoin(encoded)
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", _pq_adc_approx().alias("approx"))
    )
    cands = _topk_per_query(scored, "approx", TOP_K * PQ_OVERFETCH, rank_col="crk").select(
        "q_id", "vec_id"
    )
    return _pq_exact_rerank(emb, cands)


#: cells probed per query in the IVF-PQ composition, as a fraction of
#: the cell count (¼ — denser than plain IVF's ⅛ because the ADC
#: scoring inside a probed cell is ~free compared to exact cosines)
IVFPQ_PROBE_FRAC = 3  # r13: ceil(k/3) cells probed (was k/4) — recall ≥ 0.7


def _ivfpq_index(emb: DataFrame, assigned: DataFrame, codebooks: list) -> DataFrame:
    """THE IVF-PQ INDEX: (vec_id, cell, codes, dnorm) — cell ids + PQ
    codes + one double per vector, nothing full-precision. The shape
    law (no embedding column on the serving path) is pinned in
    tests/test_scale.py."""
    return (
        _pq_encode(emb, codebooks)
        .join(assigned, "vec_id")
        .select("vec_id", "cell", "codes", "dnorm")
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composition that actually runs billion-vector
    serving (Jégou et al.'s IVFADC layout, minus residual encoding —
    codes quantize the raw vectors, documented): the corpus is
    KMeans-partitioned into cells (the IVF half, corpus-derived k),
    every vector stored as (cell id, PQ codes, decoded norm) — the
    ENTIRE index is ints + one double per vector, no full-precision
    column on the serving path; a query ranks the broadcast centroids,
    probes only its nearest cells, ADC-scores ONLY the in-cell codes
    (table lookups), and the top ADC candidates rerank against the
    full-precision embeddings.

    vs plain PQ: the probe gate cuts scored codes to ~1/IVFPQ_PROBE_FRAC
    of the corpus; vs plain IVF: in-cell scoring reads 32×-compressed
    codes instead of raw floats. At 100 TB the index is the persisted
    artifact (here localCheckpoint), cells align with its partitioning,
    and only probed cells are scanned per query batch.

    Rows-only deliberately: recall ≤ plain PQ's by construction (the
    probe gate can drop true neighbors whose cells rank past the probe
    budget) — measured and floor-pinned in tests alongside the
    index-shape law (codes + cell ids only). RESIDUAL encoding (the
    full IVFADC: codes quantize x − centroid, per-cell dot folded into
    ADC) was prototyped and MEASURED at r12: identical 0.70/0.68
    recall on this near-random synthetic corpus — the probe gate, not
    quantization error, is the binding constraint here, so the simpler
    raw-vector codes stay (on real clustered embeddings residuals are
    the known win; the composition point is _pq_encode's input)."""
    from pyspark.ml.functions import array_to_vector

    from herodb_spark.operators.similarity import (
        _balance_partitions,
        _queries,
        _topk_per_query,
    )

    emb = _balance_partitions(load_table(spark, sf_dir, "embeddings"))
    k = ivf_k_for(emb.count())
    n_probe = max(N_PROBE, -(-k // IVFPQ_PROBE_FRAC))  # ceil(k/frac)
    model = _kmeans_centroids(spark, emb, k)
    assigned = model.transform(
        emb.select(
            "vec_id",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        )
    ).select("vec_id", F.col("prediction").alias("cell"))
    codebooks = _pq_codebooks(emb)
    index = _ivfpq_index(emb, assigned, codebooks).localCheckpoint(eager=True)

    # probe: rank broadcast centroids by cosine(query, centroid)
    centroids = [(int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cent_df = F.broadcast(
        spark.createDataFrame(centroids, "cell int, centroid array<double>")
    )
    q = F.broadcast(_queries(emb))
    cell_rank = Window.partitionBy("q_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    probe = (
        q.crossJoin(cent_df)
        .select(
            "q_id", "cell",
            V.cosine(F.col("q_emb"), F.col("centroid")).alias("cell_cos"),
        )
        .withColumn("crk", F.row_number().over(cell_rank))
        .where(F.col("crk") <= n_probe)
        .select("q_id", "cell")
    )

    qtab = _pq_adc_tables(spark, emb, codebooks)
    scored = (
        probe.join(qtab, "q_id")
        .join(index, "cell")  # ADC-score ONLY in-cell codes
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", _pq_adc_approx().alias("approx"))
    )
    cands = _topk_per_query(scored, "approx", TOP_K * PQ_OVERFETCH, rank_col="crk2").select(
        "q_id", "vec_id"
    )
    return _pq_exact_rerank(emb, cands)
