"""Property-based checks (hypothesis) for operator invariants on
generated inputs — the guarantees that must hold for ANY data, not
just the fixture tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from herodb_spark.functions import text as T

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # key
        st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(rows=ROWS)
def test_exact_dedup_keeps_one_per_key(spark_prop, rows):
    df = spark_prop.createDataFrame(rows, "k int, v double")
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("v")
    deduped = df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    got = deduped.groupBy("k").count().where(F.col("count") > 1).count()
    assert got == 0
    assert deduped.count() == len({k for k, _ in rows})


TEXTS = st.lists(
    st.text(alphabet=st.sampled_from("ab c.d!"), min_size=1, max_size=40),
    min_size=1,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(texts=TEXTS)
def test_fingerprint_invariant_under_whitespace(spark_prop, texts):
    """normalize→md5 fingerprint must be identical for a text and its
    double-spaced variant (the normalization contract)."""
    rows = [(i, t, t.replace(" ", "  ")) for i, t in enumerate(texts)]
    df = spark_prop.createDataFrame(rows, "i int, a string, b string")
    bad = df.where(T.fingerprint(F.col("a")) != T.fingerprint(F.col("b"))).count()
    assert bad == 0


EDGE_SETS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(edges=EDGE_SETS, seed=st.integers(min_value=0, max_value=7))
def test_closure_matches_python_transitive_closure(spark_prop, edges, seed):
    """The general closure operator must compute exactly the reachable
    set of ANY directed graph (cycles, self-loops, diamonds) from any
    seed — checked against a plain-Python BFS."""
    from herodb_spark.graph.algorithms import closure

    want = {seed}
    frontier = {seed}
    while frontier:
        nxt = {d for s, d in edges if s in frontier} - want
        want |= nxt
        frontier = nxt

    edf = spark_prop.createDataFrame(edges, "src int, dst int")
    init = spark_prop.createDataFrame([(seed,)], "node int").coalesce(1)

    def step(fr):
        return fr.join(edf, fr.node == edf.src).select(F.col("dst").alias("node"))

    got = {r.node for r in closure(step, init, key=["node"], max_iters=10).collect()}
    assert got == want


CC_EDGE_SETS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=24), st.integers(min_value=0, max_value=24)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(edges=CC_EDGE_SETS)
def test_twophase_cc_matches_union_find(spark_prop, edges):
    """connected_components_twophase == a driver-side union-find on
    arbitrary small graphs (self-loops and duplicates included)."""
    from pyspark.sql import functions as F

    from herodb_spark.graph.algorithms import connected_components_twophase

    df = spark_prop.createDataFrame(edges, "src int, dst int")
    und = df.unionByName(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {(r.node, r.comp) for r in connected_components_twophase(und).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {(n, find(n)) for n in nodes}
    assert got == want


# ---------------------------------------------------------------------------
# snapshot tables: model-based testing — random mutation sequences vs
# an in-memory dict model (the lakehouse commit protocol must agree
# with naive semantics at every step, and time travel must replay any
# historical version)
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("merge"), st.integers(1, 12), st.integers(0, 2), st.floats(0, 100)),
            st.tuples(st.just("update"), st.integers(1, 12), st.just(0), st.floats(0, 100)),
            st.tuples(st.just("delete"), st.integers(1, 12), st.just(0), st.just(0.0)),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_snapshot_mutations_match_dict_model(spark_prop, tmp_path_factory, ops):
    from pyspark.sql import functions as F

    from herodb_spark.sources.snapshot import SnapshotTable

    tmp = tmp_path_factory.mktemp("snapmodel")
    rows = [(i, i % 3, float(i)) for i in range(1, 6)]
    df = spark_prop.createDataFrame(rows, "id long, grp int, v double")
    t = SnapshotTable.create(spark_prop, str(tmp / "t"), df, ["id"], partition_col="grp")
    model = {i: (g, v) for i, g, v in rows}
    history = [dict(model)]

    for kind, key, grp, val in ops:
        if kind == "merge":
            up = spark_prop.createDataFrame([(key, grp, val)], "id long, grp int, v double")
            t.merge_upsert(up)
            model[key] = (grp, val)
        elif kind == "update":
            t.update_where(F.col("id") == key, {"v": F.lit(val)})
            if key in model:
                model[key] = (model[key][0], val)
        else:
            t.delete_where(F.col("id") == key)
            model.pop(key, None)
        history.append(dict(model))
        got = {r.id: (r.grp, r.v) for r in t.read().collect()}
        assert got == model, (kind, key, got, model)

    # time travel: every committed version replays its model snapshot.
    # no-op mutations commit nothing, so walk versions in order and
    # match them against the (possibly longer) model history.
    versions = [h["version"] for h in t.history()]
    hi = 0
    for v in versions:
        got = {r.id: (r.grp, r.v) for r in t.read(version=v).collect()}
        while hi < len(history) and history[hi] != got:
            hi += 1
        assert hi < len(history), (v, got)


PCM = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200
)


@settings(max_examples=30, deadline=None)
@given(samples=PCM, rate=st.sampled_from([8000, 16000, 44100]))
def test_wav_codec_roundtrip_property(samples, rate):
    """encode_wav → decode/featurize roundtrips ANY int16 sample list
    exactly: n_samples, rate, peak, Σs², and zero crossings all match
    a direct recompute (r11 audio codec; no Spark needed — pure
    codec)."""
    from herodb_spark.operators import multimodal as MM

    d = MM.wav_features(MM.encode_wav(samples, rate=rate))
    assert d["n_samples"] == len(samples)
    assert d["sample_rate"] == rate and d["channels"] == 1
    assert d["peak"] == max((abs(v) for v in samples), default=0)
    assert d["sum_sq"] == sum(v * v for v in samples)
    assert d["zcr"] == sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    )


INTERVALS = st.lists(
    st.tuples(
        st.floats(min_value=0.0, max_value=400.0, allow_nan=False),
        st.floats(min_value=0.1, max_value=150.0, allow_nan=False),  # length
    ),
    min_size=1,
    max_size=12,
)
POINTS = st.lists(
    st.floats(min_value=-50.0, max_value=500.0, allow_nan=False),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(intervals=INTERVALS, points=POINTS)
def test_range_join_bucket_expansion_lossless(spark_prop, intervals, points):
    """The coarse-bucket expansion finds EXACTLY the theta-join's
    matches for ARBITRARY (possibly overlapping, boundary-straddling)
    intervals and points — the r11 range-join recipe as a law, not
    just the fixture geometry."""
    W = 50.0
    ivs = [(i, float(lo), float(lo + ln)) for i, (lo, ln) in enumerate(intervals)]
    tiers = spark_prop.createDataFrame(ivs, "tier int, lo double, hi double")
    pts = spark_prop.createDataFrame(
        [(i, float(v)) for i, v in enumerate(points)], "pid int, v double"
    )
    tb = tiers.select(
        "tier", "lo", "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / W).cast("long"),
                F.floor((F.col("hi") - 1e-9) / W).cast("long"),
            )
        ).alias("bucket"),
    )
    got = {
        (r.pid, r.tier)
        for r in pts.withColumn("bucket", F.floor(F.col("v") / W).cast("long"))
        .join(tb, "bucket")
        .where((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .select("pid", "tier")
        .collect()
    }
    want = {
        (pid, tier)
        for pid, v in enumerate(points)
        for tier, lo, hi in ivs
        if lo <= v < hi
    }
    assert got == want
