"""Corpus-statistics / sampling operators: n-gram heavy hitters, grouped
quantile sketches, deterministic stratified sampling, repetition filter."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from informers_spark.operators.corpus_stats import (
    ngram_topk,
    quantile_sketch,
    repetition_filter,
    sample_bucket,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b a b a b", "en"),          # heavy bigram repetition
        (1, "one two three four five", "en"),
        (2, "uno dos tres cuatro", "es"),
        (3, "a b c d e f g h", "en"),
        (4, "x", "zh"),                     # single token -> one 1-shingle
        (5, "one two one two six", "es"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_ngram_topk_matches_naive_count(spark, docs):
    got = [(r.gram, r.cnt) for r in ngram_topk(docs, n=2, k=5).collect()]
    naive = Counter()
    for r in docs.collect():
        toks = r.text.split()
        grams = (
            [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            if len(toks) >= 2
            else [" ".join(toks)]
        )
        naive.update(grams)
    want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_repetition_filter_drops_heavy_docs(spark, docs):
    kept = {r.doc_id for r in repetition_filter(docs, max_ratio=0.3).collect()}
    # doc 0: grams [a b, b a, a b, b a, a b] -> 2 distinct / 5 -> ratio 0.6
    assert 0 not in kept
    assert {1, 2, 3, 4, 5} <= kept
    flagged = repetition_filter(docs, max_ratio=0.3, keep_flagged=True)
    ratios = {r.doc_id: r.rep_ratio for r in flagged.collect()}
    assert ratios[0] == pytest.approx(0.6)
    assert ratios[1] == 0.0
    assert ratios[4] == 0.0  # single-token doc: one shingle, no dup


def test_stratified_sample_is_partition_independent(spark):
    df = spark.range(0, 5000).withColumn(
        "lang", F.when(F.col("id") % 3 == 0, "en").otherwise("other")
    )
    rates = {"en": 0.2}
    a = {r.id for r in stratified_sample(df, "lang", rates, "id", default_rate=0.6).collect()}
    b = {
        r.id
        for r in stratified_sample(
            df.repartition(17), "lang", rates, "id", default_rate=0.6
        ).collect()
    }
    assert a == b and len(a) > 0
    # realized rates track the targets (md5 buckets are uniform)
    en_total = 5000 // 3 + 1
    en_kept = sum(1 for i in a if i % 3 == 0)
    other_kept = len(a) - en_kept
    assert abs(en_kept / en_total - 0.2) < 0.05
    assert abs(other_kept / (5000 - en_total) - 0.6) < 0.05


def test_sample_bucket_range_and_seed(spark):
    df = spark.range(0, 200).select(
        sample_bucket(F.col("id"), buckets=100).alias("b"),
        sample_bucket(F.col("id"), buckets=100, seed="s2").alias("b2"),
    )
    rows = df.collect()
    assert all(0 <= r.b < 100 for r in rows)
    assert any(r.b != r.b2 for r in rows)  # seed changes the assignment


def test_quantile_sketch_rank_error_bound(spark):
    # skewed values: sketch quantile must land within the rank window
    df = spark.range(0, 20000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * F.col("id") % 9973).alias("v"),
    )
    sk = {r.g: (r.n, r.q_0_5, r.q_0_9) for r in quantile_sketch(df, "v", "g", accuracy=1000).collect()}
    vals = {}
    for r in df.collect():
        vals.setdefault(r.g, []).append(r.v)
    for g, (n, q50, q90) in sk.items():
        s = sorted(vals[g])
        assert n == len(s)
        for p, q in ((0.5, q50), (0.9, q90)):
            lo = s[max(0, int((p - 0.02) * len(s)) - 1)]
            hi = s[min(len(s) - 1, int((p + 0.02) * len(s)) + 1)]
            assert lo <= q <= hi


def test_contamination_counts_distinct_gram_overlap(spark):
    rows = [
        (0, "alpha beta gamma delta"),        # benchmark doc
        (1, "alpha beta gamma delta epsilon"),  # shares 2 distinct 3-grams
        (2, "alpha beta gamma"),               # shares 1 (its only 3-gram)
        (3, "zeta eta theta iota"),            # shares none
        (4, "alpha beta gamma delta alpha beta gamma delta"),  # dup grams count once
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from informers_spark.operators.corpus_stats import contamination

    bench = df.filter(F.col("doc_id") == 0)
    corpus = df.filter(F.col("doc_id") != 0)
    got = {r.doc_id: r.overlap_cnt for r in contamination(corpus, bench, n=3).collect()}
    # doc 1: grams {a b g, b g d, g d e} vs bench {a b g, b g d} -> 2
    assert got[1] == 2
    assert got[2] == 1
    assert 3 not in got
    # doc 4's repeats collapse under array_distinct:
    # {a b g, b g d, g d a, d a b} ∩ bench {a b g, b g d} -> 2, not 4
    assert got[4] == 2
    # min_overlap filters
    got2 = {r.doc_id for r in contamination(corpus, bench, n=3, min_overlap=2).collect()}
    assert got2 == {1, 4}
    # clean mode: original rows minus flagged ids
    kept = {r.doc_id for r in contamination(corpus, bench, n=3, min_overlap=2, clean=True).collect()}
    assert kept == {2, 3}


def test_contamination_broadcasts_bench_grams(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)], ["doc_id", "text"]
    )
    from informers_spark.operators.corpus_stats import contamination

    plan = contamination(
        df.filter(F.col("doc_id") >= 5), df.filter(F.col("doc_id") < 5)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
