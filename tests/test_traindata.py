"""Training-data export operators: exact span dedup, domain-mixture
sampling, shard manifests, token-budget sequence packing — oracle
hash-checked at sf0.001 AND sf0.01, plus semantic property tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from herodb_spark.operators import traindata as TD
from tests.harness import compare, duckdb_con

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

CASES = [
    (TD.dedup_span_exact, TD.DEDUP_SPAN_EXACT_SQL),
    (TD.dedup_span_maximal, TD.DEDUP_SPAN_MAXIMAL_SQL),
    (TD.mixture_sample_domains, TD.MIXTURE_SAMPLE_SQL),
    (TD.mixture_upsample_domains, TD.MIXTURE_UPSAMPLE_SQL),
    (TD.export_shard_manifest, TD.EXPORT_SHARD_MANIFEST_SQL),
    (TD.pack_sequences_budget, TD.PACK_SEQUENCES_SQL),
    (TD.export_global_shuffle, TD.EXPORT_GLOBAL_SHUFFLE_SQL),
    (TD.traindata_dsir_weights, TD.TRAINDATA_DSIR_SQL),
    (TD.traindata_pps_sample, TD.TRAINDATA_PPS_SQL),
    (TD.mixture_temperature, TD.MIXTURE_TEMPERATURE_SQL),
]


@pytest.fixture(scope="module", params=SF_DIRS, ids=["sf0.001", "sf0.01"])
def sf_and_duck(request):
    con = duckdb_con(request.param)
    yield request.param, con
    con.close()


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_traindata_oracle(spark, sf_and_duck, fn, sql):
    sfd, con = sf_and_duck
    res = compare(fn(spark, sfd), sql, con)
    assert res["ok"], res


def test_span_dup_flags_identical_docs(spark):
    """Two identical long docs must see EVERY span duplicated
    (dup_frac 1.0, dropped); a unique doc must see none."""
    words = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"u{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, words), (2, words), (3, other)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in TD.span_dup_stats(docs).collect()}
    assert rows[1].dup_frac == 1.0 and not rows[1].keep
    assert rows[2].dup_frac == 1.0 and not rows[2].keep
    assert rows[3].dup_frac == 0.0 and rows[3].keep
    # short doc: no spans, kept with zero counts
    short = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    r9 = TD.span_dup_stats(short).collect()[0]
    assert r9.n_spans == 0 and r9.keep


def test_mixture_rates_capped_and_deterministic(spark):
    sfd = SF_DIRS[1]
    a = TD.mixture_sample_domains(spark, sfd).collect()
    b = TD.mixture_sample_domains(spark, sfd).collect()
    assert a == b
    for r in a:
        assert 0.0 <= r.keep_rate <= 1.0
        assert r.n_kept <= r.n_total
        # hash-threshold keeps should land near the target rate
        if r.n_total >= 20:
            assert abs(r.n_kept / r.n_total - r.keep_rate) < 0.25


def test_shards_partition_corpus(spark):
    """Every document lands in exactly one shard; totals reconcile."""
    sfd = SF_DIRS[1]
    man = TD.export_shard_manifest(spark, sfd).collect()
    assert {r.shard for r in man} <= set(range(TD.N_SHARDS))
    from herodb_spark.catalog import load_table

    docs = load_table(spark, sfd, "documents")
    assert sum(r.n_docs for r in man) == docs.count()
    assert sum(r.n_chars for r in man) == docs.agg(F.sum("n_chars")).collect()[0][0]


def test_packing_conserves_tokens_and_docs(spark):
    """Bins per shard tile the shard: doc and token totals match the
    manifest, every bin holds >= 1 doc, and bin ids per shard are the
    contiguous prefix 0..max (concat-and-chunk leaves no gaps)."""
    sfd = SF_DIRS[1]
    bins = TD.pack_sequences_budget(spark, sfd).collect()
    man = {r.shard: r for r in TD.export_shard_manifest(spark, sfd).collect()}
    by_shard: dict[int, list] = {}
    for r in bins:
        assert r.n_docs >= 1
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(man)
    for shard, rows in by_shard.items():
        assert sum(r.n_docs for r in rows) == man[shard].n_docs
        assert sum(r.bin_tokens for r in rows) == man[shard].n_tokens
        got = sorted(r.bin for r in rows)
        assert got == list(range(len(rows))), f"shard {shard} bins not contiguous: {got}"


def test_mixture_upsample_expansion_laws(spark, sf_dir):
    """Upsampling invariants: sources with rate > 1 keep EVERY doc at
    least once and duplicate a deterministic fraction; expected output
    size tracks rate * n_total within the hash-threshold tolerance;
    the expansion is reproducible."""
    from herodb_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    report = {r.source: r for r in TD.mixture_upsample_domains(spark, sf_dir).collect()}
    assert any(r.rate > 1.0 for r in report.values()), "fixture should force upsampling"
    rows = TD.mixture_upsample_rows(docs)
    per_source_docs = {
        r.source: r.n for r in rows.groupBy("source").agg(
            F.count_distinct("doc_id").alias("n")).collect()
    }
    for src, r in report.items():
        if r.rate >= 1.0:
            # every doc appears: floor(rate) >= 1 copies guaranteed
            assert per_source_docs.get(src, 0) == r.n_total, src
        assert abs(r.n_out - r.rate * r.n_total) <= max(10, 0.15 * r.n_total), (src, r)
    again = {r.source: r.n_out for r in TD.mixture_upsample_domains(spark, sf_dir).collect()}
    assert again == {s: r.n_out for s, r in report.items()}


def test_span_maximal_laws(spark):
    """Maximality laws, checked against a pure-Python recomputation on
    a hand-built corpus: every reported longest span (a) has all its
    n-gram windows duplicated, and (b) cannot extend by one token on
    either side without the boundary n-gram becoming unique."""
    n = TD.SPAN_N
    shared = " ".join(f"s{i}" for i in range(25))          # 25-token shared block
    docs = spark.createDataFrame(
        [
            (1, "a b " + shared + " tail one two three"),
            (2, "x y z " + shared + " other suffix here now"),
            (3, " ".join(f"u{i}" for i in range(40))),     # fully unique
            (4, "p q " + shared[:40]),                     # short prefix only
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in TD.span_maximal_stats(docs, n).collect()}

    # python recomputation of anchors
    toks = {r.doc_id: r.text.split() for r in docs.collect()}
    from collections import Counter

    cnt = Counter(
        tuple(t[i : i + n]) for t in toks.values() for i in range(len(t) - n + 1)
    )
    for d, t in toks.items():
        anchors = [i for i in range(len(t) - n + 1) if cnt[tuple(t[i : i + n])] >= 2]
        r = got[d]
        if not anchors:
            assert (r.n_dup_runs, r.longest_span_tokens, r.longest_span_start) == (0, 0, None)
            continue
        # runs of consecutive anchors
        runs, start = [], anchors[0]
        for a, b in zip(anchors, anchors[1:] + [None]):
            if b != a + 1:
                runs.append((start, a))
                start = b
        spans = [(s, e - s + n) for s, e in runs]
        longest = max(l for _, l in spans)
        assert r.n_dup_runs == len(spans)
        assert r.longest_span_tokens == longest
        assert r.longest_span_start == min(s for s, l in spans if l == longest)
        # law (a): every window inside each span is duplicated
        for s, l in spans:
            for i in range(s, s + l - n + 1):
                assert cnt[tuple(t[i : i + n])] >= 2
        # law (b): maximality — the window just before/after is unique
        for s, e in runs:
            if s > 0:
                assert cnt[tuple(t[s - 1 : s - 1 + n])] < 2
            if e + 1 <= len(t) - n:
                assert cnt[tuple(t[e + 1 : e + 1 + n])] < 2
    # the shared 25-token block must surface as doc 1 and 2's longest span
    assert got[1].longest_span_tokens == 25 and got[2].longest_span_tokens == 25


def test_global_shuffle_is_a_uniform_permutation(spark):
    """(bucket, pos) must be a permutation of the corpus (every doc
    exactly once, positions dense per bucket), deterministic across
    runs, uniform across buckets, and genuinely shuffled (not doc_id
    order)."""
    sfd = "/root/testdata/sf0.01"
    a = TD.export_global_shuffle(spark, sfd).collect()
    n_docs = spark.read.parquet(f"{sfd}/documents.parquet").count()
    assert len(a) == n_docs
    assert len({r.doc_id for r in a}) == n_docs
    by_bucket: dict[int, list] = {}
    for r in a:
        by_bucket.setdefault(r.bucket, []).append(r.pos)
    for bucket, poss in by_bucket.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), bucket
    # uniformity: no bucket deviates wildly from n/B
    exp = n_docs / TD.SHUFFLE_BUCKETS
    assert all(0.5 * exp < len(p) < 1.5 * exp for p in by_bucket.values())
    # determinism
    b = TD.export_global_shuffle(spark, sfd).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # it's a shuffle: the first bucket's docs are not an id-contiguous run
    first = sorted(r.doc_id for r in a if r.bucket == min(by_bucket))
    assert first != list(range(first[0], first[0] + len(first)))


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_chunk_documents_oracle(spark, sf):
    from tests.harness import compare, duckdb_con

    res = compare(TD.chunk_documents(spark, sf), TD.CHUNK_DOCUMENTS_SQL, duckdb_con(sf))
    assert res["ok"], res


def test_chunk_documents_laws(spark):
    """Chunking invariants: chunk 0 starts at 0; consecutive chunks
    step by CHUNK−OVERLAP; every chunk except a tail is full-size;
    chunks COVER the document (last end == n for multi-chunk docs);
    every doc yields ≥ 1 chunk."""
    from herodb_spark.catalog import load_table
    from herodb_spark.functions import text as T

    sf = "/root/testdata/sf0.001"
    rows = TD.chunk_documents(spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    n_by_doc = {
        r.doc_id: r.n
        for r in docs.select("doc_id", F.size(T.tokens(F.col("text"))).alias("n")).collect()
    }
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(n_by_doc)  # every doc chunked
    step = TD.CHUNK_TOKENS - TD.CHUNK_OVERLAP
    for doc_id, ch in per_doc.items():
        ch.sort(key=lambda r: r.chunk_id)
        assert ch[0].start == 0 and ch[0].chunk_id == 0
        for a, b in zip(ch, ch[1:]):
            assert b.start == a.start + step  # fixed stride
            assert a.end - a.start == TD.CHUNK_TOKENS  # non-tail = full
        assert ch[-1].end == n_by_doc[doc_id]  # coverage to the end
        assert all(r.n_tokens == r.end - r.start for r in ch)


def test_dsir_selects_target_quota_and_prefers_target_lang(spark):
    """DSIR laws: the selected set is ~the configured quota (exact up
    to threshold ties), and English documents — the target slice — are
    enriched among the selected relative to the corpus rate (the whole
    point of importance resampling)."""
    from herodb_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    out = TD.traindata_dsir_weights(spark, sf)
    rows = out.collect()
    n = len(rows)
    k = sum(1 for r in rows if r.selected)
    assert abs(k / n - TD.DSIR_KEEP_FRACTION) < 0.05
    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, sf, "documents").select("doc_id", "lang").collect()
    }
    en_all = sum(1 for d in langs.values() if d == "en") / n
    en_sel = sum(1 for r in rows if r.selected and langs[r.doc_id] == "en") / k
    assert en_sel > en_all


def test_pps_sampling_laws(spark):
    """PPS inclusion laws: every doc at/over the target length is
    ALWAYS kept (threshold saturates at 2^32); the u32 draw is the
    stable md5 unit (re-run identical); realized inclusion tracks
    n_tokens/TARGET within a loose tolerance on the short side."""
    sfd = "/root/testdata/sf0.01"
    out = TD.traindata_pps_sample(spark, sfd).collect()
    assert all(r.sampled for r in out if r.n_tokens >= TD.PPS_TARGET_TOKENS)
    assert all(0 <= r.u32 < (1 << 32) for r in out)
    # deterministic re-run
    again = {r.doc_id: r.sampled for r in TD.traindata_pps_sample(spark, sfd).collect()}
    assert all(again[r.doc_id] == r.sampled for r in out)
    short = [r for r in out if r.n_tokens < TD.PPS_TARGET_TOKENS]
    if len(short) >= 100:
        expect = sum(r.n_tokens / TD.PPS_TARGET_TOKENS for r in short)
        got = sum(1 for r in short if r.sampled)
        assert abs(got - expect) < 6 * (expect ** 0.5) + 5, (got, expect)


def test_mixture_temperature_laws(spark):
    """Temperature mixture: rates in (0, 1]; a uniform corpus (equal
    domain sizes) gets a uniform rate ≈ budget fraction; the kept
    count is ≤ n_total and deterministic across runs; and with α = ½
    the IMPLIED share of a domain 4× the size of another is only 2×
    (√-scaling), not 4×."""
    sfd = "/root/testdata/sf0.001"
    a = TD.mixture_temperature(spark, sfd).collect()
    b = TD.mixture_temperature(spark, sfd).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        assert 0.0 < r.keep_rate <= 1.0
        assert 0 <= r.n_kept <= r.n_total
    # synthetic corpus: all sources equal-sized → every rate equals
    # the budget fraction exactly
    sizes = {r.n_total for r in a}
    if len(sizes) == 1:
        assert all(abs(r.keep_rate - TD.TEMP_BUDGET_FRAC) < 1e-9 for r in a)
    # α = ½ scaling law on a hand-built skewed corpus
    docs = spark.createDataFrame(
        [(i, "big" if i < 400 else "small", "t", "x", 1) for i in range(500)],
        "doc_id long, source string, lang string, text string, n_chars long",
    )
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    import math

    n = {r.source: r.n_total for r in per.collect()}
    assert n["big"] == 4 * n["small"]
    share_big = math.sqrt(n["big"]) / (math.sqrt(n["big"]) + math.sqrt(n["small"]))
    assert abs(share_big / (1 - share_big) - 2.0) < 1e-9
