#!/usr/bin/env python
"""Dump .explain("formatted") for the headline queries into
docs/PLANS.md — the plan-shape evidence (pushdown, broadcast,
partial aggregation) reviewed after each round. Explain only; no jobs
are executed. Usage: python scripts/explain_dump.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from herodb_spark.session import get_spark  # noqa: E402
from herodb_spark.operators import dedup as D  # noqa: E402
from herodb_spark.operators import matview as MV  # noqa: E402
from herodb_spark.operators import relational as R  # noqa: E402
from herodb_spark.operators import similarity as S  # noqa: E402
from herodb_spark.plans import tpch  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _adt_class_hierarchy(spark, sf_dir):
    from herodb_spark.operators import adt as ADT

    return ADT.class_hierarchy(spark, sf_dir)

QUERIES = {
    "tpch_q1 (scan-heavy agg: expect parquet PushedFilters + partial HashAggregate)": tpch.q1_pricing_summary,
    "tpch_q3 (expect BroadcastHashJoin on customer, shuffle join on orderkey)": tpch.q3_shipping_priority,
    "tpch_q5 (all dims broadcast; single fact-fact shuffle)": tpch.q5_local_supplier_volume,
    "rel_scan_filter_project (expect pushdown + pruned ReadSchema)": R.scan_filter_project,
    "dedup_minhash_lsh (expect exploded partial aggregation, no cross join)": D.minhash_lsh_pairs,
    "ann_bruteforce_topk (expect BroadcastNestedLoopJoin, corpus never shuffles)": S.ann_bruteforce_topk,
    "dedup_embedding_lsh_pairs (expect NO join and NO distinct: Arrow signature pass, pinned bucket exchange, in-bucket pandas verify; 3 exchanges total)": D.embedding_lsh_pairs,
    "incremental_mv_refresh (expect date PushedFilters on BOTH the MV and the delta scan)": MV.incremental_mv_refresh,
    "label_centroids (expect posexplode + two-phase HashAggregate on decimal sums; no pandas)": S.label_centroids,
    "class_hierarchy (expect BroadcastHashJoin of the subtype closure against the instance scan)": _adt_class_hierarchy,
}


def _span_maximal(spark, sf_dir):
    from herodb_spark.operators import traindata as TD

    return TD.dedup_span_maximal(spark, sf_dir)


def _unigram(spark, sf_dir):
    from herodb_spark.operators import textops as X

    return X.text_unigram_logprob(spark, sf_dir)


def _fuzzy(spark, sf_dir):
    from herodb_spark.operators import dedup as D2

    return D2.dedup_fuzzy_levenshtein(spark, sf_dir)


QUERIES.update(
    {
        "dedup_span_maximal (expect ONE gram-key exchange for the dup index + per-doc window; no docs-squared join)": _span_maximal,
        "text_unigram_logprob (expect ZERO parquet scans downstream: the checkpointed token frame feeds vocab AND scoring — corpus tokenized once)": _unigram,
        "dedup_fuzzy_levenshtein (expect equi-join on the block key + bounded levenshtein; no cartesian)": _fuzzy,
    }
)


def _heroql_rules(spark, sf_dir):
    from herodb_spark.operators import heroql_ops as HQ

    return HQ.heroql_rules(spark, sf_dir)


def _heroql_pipeline(spark, sf_dir):
    from herodb_spark.operators import heroql_ops as HQ

    return HQ.heroql_pipeline(spark, sf_dir)


def _symtab_resolve(spark, sf_dir):
    from herodb_spark.operators import symtab as SY

    return SY.symtab_resolve(spark, sf_dir)


def _tfidf(spark, sf_dir):
    from herodb_spark.operators import dedup as D3

    return D3.tfidf_cosine_pairs(spark, sf_dir)


def _nb(spark, sf_dir):
    from herodb_spark.operators import textops as X2

    return X2.text_nb_classifier(spark, sf_dir)


def _funnel(spark, sf_dir):
    from herodb_spark.operators import olap as O2

    return O2.events_funnel(spark, sf_dir)


def _chunks(spark, sf_dir):
    from herodb_spark.operators import traindata as TD2

    return TD2.chunk_documents(spark, sf_dir)


QUERIES.update(
    {
        "dedup_tfidf_cosine (expect token-key equi-join inverted index (a.t = b.t) + bigint partial aggregates; NO cartesian, NO float sums)": _tfidf,
        "text_nb_classifier (expect token-keyed model join — NOT broadcast — + decimal partial aggregates + a 5-row-per-doc window argmax)": _nb,
        "events_funnel (expect three user-keyed partial min-aggregates joined back; NO window over the raw event log)": _funnel,
        "export_chunk_documents (expect ONE tokenize + sequence-explode per row; work ∝ chunks, no token-row window)": _chunks,
    }
)


def _pps(spark, sf_dir):
    from herodb_spark.operators import traindata as TD3

    return TD3.traindata_pps_sample(spark, sf_dir)


def _bm25(spark, sf_dir):
    from herodb_spark.operators import textops as X

    return X.text_bm25_topk(spark, sf_dir)


def _cascade(spark, sf_dir):
    from herodb_spark.operators import textops as X

    return X.text_filter_cascade(spark, sf_dir)


def _attrib(spark, sf_dir):
    from herodb_spark.operators import olap as OL

    return OL.events_attribution(spark, sf_dir)


def _incr(spark, sf_dir):
    from herodb_spark.operators import dedup as D2

    return D2.dedup_incremental_minhash(spark, sf_dir)


QUERIES.update(
    {
        "traindata_pps_sample (expect ONE scan + codegen filter — exact-integer md5 threshold, no shuffle before the presentation sort)": _pps,
        "text_bm25_topk (expect scan-level term filter, broadcast df/stats, TakeOrderedAndProject — NO global sort, NO full-set window)": _bm25,
        "text_filter_cascade (expect zero-shuffle higher-order array signals; only the 4-row waterfall aggregates)": _cascade,
        "events_attribution (expect user-keyed time-bounded join + ONE purchase-keyed min/max-struct aggregate; no window over the raw log)": _attrib,
        "dedup_incremental_minhash (expect new-bands x old-bands band-bucket join — work ∝ the delta, no cross join)": _incr,
    }
)


def _range_join(spark, sf_dir):
    from herodb_spark.operators import extra as E2

    return E2.range_join_bucketed(spark, sf_dir)


def _domain_cap(spark, sf_dir):
    from herodb_spark.operators import corpus as CO2

    return CO2.corpus_domain_cap(spark, sf_dir)


def _anomaly(spark, sf_dir):
    from herodb_spark.operators import olap as OL2

    return OL2.events_anomaly(spark, sf_dir)


def _temp(spark, sf_dir):
    from herodb_spark.operators import traindata as TD4

    return TD4.mixture_temperature(spark, sf_dir)


def _actives(spark, sf_dir):
    from herodb_spark.operators import olap as OL3

    return OL3.events_rolling_actives(spark, sf_dir)


def _keywords(spark, sf_dir):
    from herodb_spark.operators import textops as X3

    return X3.text_keywords(spark, sf_dir)


def _leak(spark, sf_dir):
    from herodb_spark.operators import dedup as D4

    return D4.dedup_split_leakage(spark, sf_dir)


QUERIES.update(
    {
        "rel_range_join_bucketed (r11; expect BroadcastHashJoin ON THE BUCKET KEY with the range filter as join condition — NO BroadcastNestedLoopJoin)": _range_join,
        "corpus_domain_cap (r11; expect two-phase per-source rank: (source, partition-id) window then the global per-source window over survivors)": _domain_cap,
        "events_anomaly (r11; expect ONE map-side-combined (type, hour) aggregate, the rolling window only on the bucket relation)": _anomaly,
        "mixture_temperature (r11; expect one |sources|-row aggregate + broadcast rate join + codegen scan filter — no extra shuffle)": _temp,
        "events_rolling_actives (r11; expect (user, day) dedupe + explode onto <=7 buckets + map-side-combined counts; NO day-by-day self-join)": _actives,
        "text_keywords (r11; expect token-keyed tf/df aggregates + per-doc window over the doc's own terms; nothing quadratic)": _keywords,
        "dedup_split_leakage (r11; expect train-bands x val-bands band-bucket join — work ∝ the validation share, no cross join)": _leak,
    }
)


def _heroql_outquery(spark, sf_dir):
    from herodb_spark.operators import heroql_ops as HQ

    return HQ.heroql_outquery(spark, sf_dir)


def _heroql_at_dialect(spark, sf_dir):
    from herodb_spark.operators import heroql_ops as HQ

    return HQ.heroql_at_dialect(spark, sf_dir)


def _heroql_package(spark, sf_dir):
    from herodb_spark.operators import heroql_ops as HQ

    return HQ.heroql_package(spark, sf_dir)


def _ivfpq(spark, sf_dir):
    from herodb_spark.operators import scale as SC

    return SC.ann_ivfpq_topk(spark, sf_dir)


QUERIES.update({
    "heroql_outquery (r12; output-argument functions INLINED: expect Square/Quartic as pure Project expressions over the one nation scan — no UDF, no join, no extra exchange)": _heroql_outquery,
    "ann_ivfpq_topk (r12; expect broadcast centroid probe + cell-keyed join against the CODES-ONLY index + ADC as codegen array lookups; the full-precision column only in the final |Q|*K*overfetch rerank)": _ivfpq,
    "heroql_rules (compiled FROM HeroQL SOURCE; expect BroadcastHashJoin(LeftAnti) for `not`, nation broadcast for the deref, no Python nodes)": _heroql_rules,
    "heroql_pipeline (compiled FROM HeroQL SOURCE; expect one window pass for top-k, partial HashAggregate for group_by, single-partition window only for the final range_by)": _heroql_pipeline,
    "heroql_at_dialect (r13; README @-commands: the GLOBAL Top10 rank must show the SPARK_PARTITION_ID pre-prune window BEFORE the single-partition global window — the table never funnels through one task unpruned; per-student legs are ordinary partitioned windows)": _heroql_at_dialect,
    "heroql_package (r13; data packages: the SF-scaled hot leg is customer ⋈ semi(orders) ⋈ broadcast(nation) + partial HashAggregate per nation — the package/visibility layer adds ZERO plan nodes; inst/guard legs are constant-cardinality unions)": _heroql_package,
    "symtab_resolve (draft_type:115-341; expect the materialized scope-chain walk feeding two shuffled joins + min_by aggregation — no driver loops, no Python nodes)": _symtab_resolve,
})


def main() -> None:
    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# Headline query plans (auto-generated by scripts/explain_dump.py)\n"]
    for title, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {title}\n\n```\n{buf.getvalue().strip()}\n```\n")
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    path = os.path.join(REPO, "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
