"""Corpus-curation operators: decontamination, repetition signals,
deterministic/stratified sampling, domain mixing
(osmgraft/operators/curation.py). Hand-built micro-corpora pin exact
values; the sf0.001 documents table pins distribution-level behavior;
plan assertions pin the broadcast/narrow shapes the 100-TB story
depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.curation import (
    contaminated_ids,
    decontaminate,
    hash_sample,
    mix_domains,
    repetition_features,
    sample_hash01,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


# --- decontamination -----------------------------------------------------------


def test_contaminated_ids_flags_planted_leak(spark):
    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps over nothing"),  # shares 13-grams? no — n=3 grams
            (2, "completely unrelated words about spark shuffles and joins"),
            (3, "quick brown fox appears here too"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["n_shared"]
        for r in contaminated_ids(docs, bench, n=3).collect()
    }
    # doc 1 shares 'the quick brown', 'quick brown fox', 'brown fox jumps',
    # 'fox jumps over'; doc 3 shares 'quick brown fox'; doc 2 shares none
    assert out[1] == 4
    assert out[3] == 1
    assert 2 not in out


def test_contaminated_ids_counts_distinct_grams_once(spark):
    # a doc repeating the leaked trigram 3x still counts it ONCE
    bench = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    docs = spark.createDataFrame([(1, "a b c a b c a b c")], "doc_id bigint, text string")
    out = contaminated_ids(docs, bench, n=3).collect()
    assert out[0]["n_shared"] == 1


def test_decontaminate_drops_only_flagged(spark):
    bench = spark.createDataFrame([(0, "x y z w q")], "doc_id bigint, text string")
    docs = spark.createDataFrame(
        [(1, "x y z and more"), (2, "clean document body"), (3, "w q alone")],
        "doc_id bigint, text string",
    )
    kept = sorted(r["doc_id"] for r in decontaminate(docs, bench, n=3).collect())
    # doc 1 shares 'x y z'; doc 3 is 3 words but its gram 'w q alone' is
    # not a bench gram; doc 2 clean
    assert kept == [2, 3]


def test_contamination_short_doc_whole_gram_semantics(spark):
    # docs shorter than n emit the whole doc as one gram — a 2-word doc
    # equal to a 2-word bench doc collides even at n=13
    bench = spark.createDataFrame([(0, "tiny doc")], "doc_id bigint, text string")
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny document")], "doc_id bigint, text string"
    )
    out = [r["doc_id"] for r in contaminated_ids(docs, bench, n=13).collect()]
    assert out == [1]


def test_contamination_plan_broadcasts_bench(spark, docs):
    bench = docs.where(F.col("doc_id") >= 50).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") < 50).select("doc_id", "text")
    plan = contaminated_ids(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# --- repetition features --------------------------------------------------------


def test_repetition_features_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "w x y z"), (3, "solo")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 4 and r1["n_distinct_words"] == 2
    assert r1["top_word_count"] == 3 and r1["top_word_frac"] == 0.75
    # bigrams of doc 1: 'a a','a a','a b' -> top 'a a' 2 of 3
    assert r1["top_bigram_count"] == 2 and r1["top_bigram_frac"] == round(2 / 3, 4)
    r2 = rows[2]
    assert r2["top_word_frac"] == 0.25 and r2["top_bigram_count"] == 1
    r3 = rows[3]  # single word: no bigram positions
    assert r3["n_words"] == 1 and r3["top_bigram_count"] == 0 and r3["top_bigram_frac"] == 0.0


def test_repetition_flags_looped_spam(spark, docs):
    spam = spark.createDataFrame(
        [(10_000, ("buy now " * 50).strip())], "doc_id bigint, text string"
    )
    feats = repetition_features(docs.select("doc_id", "text").unionByName(spam))
    top = feats.orderBy(F.desc("top_bigram_frac")).first()
    assert top["doc_id"] == 10_000 and top["top_bigram_frac"] > 0.49
    # natural synth docs stay far from the spam score
    assert (
        feats.where(F.col("doc_id") != 10_000)
        .agg(F.max("top_bigram_frac"))
        .first()[0]
        < 0.3
    )


# --- training-shard packing --------------------------------------------------------


def test_assign_shards_budget_and_determinism(spark, docs):
    from osmgraft.operators.curation import assign_shards

    d = docs.select("doc_id", F.col("n_chars").alias("n_tokens"))
    out = assign_shards(d, target_tokens=5000, n_buckets=4, seed=1).cache()
    assert out.count() == d.count()  # every doc dealt exactly once
    # per-(bucket, shard) token mass never exceeds budget + one doc, and
    # packing is tight at the bucket level: shard count <= floor(total/T)+1
    # (a single shard CAN close under budget when the previous doc spans
    # the boundary — greedy, not bin-repair)
    mass = out.groupBy("bucket", "shard_ix").agg(F.sum("n_tokens").alias("m"))
    max_doc = d.agg(F.max("n_tokens")).first()[0]
    for r in mass.collect():
        assert r["m"] < 5000 + max_doc
    per_bucket = {
        r["bucket"]: (r["n_shards"], r["total"])
        for r in out.groupBy("bucket")
        .agg(
            F.countDistinct("shard_ix").alias("n_shards"),
            F.sum("n_tokens").alias("total"),
        )
        .collect()
    }
    for n_shards, total in per_bucket.values():
        assert n_shards <= total // 5000 + 1
    # deterministic across reruns
    a = {(r["doc_id"], r["bucket"], r["shard_ix"]) for r in out.collect()}
    b = {
        (r["doc_id"], r["bucket"], r["shard_ix"])
        for r in assign_shards(d, target_tokens=5000, n_buckets=4, seed=1).collect()
    }
    assert a == b
    out.unpersist()


def test_assign_shards_greedy_semantics_exact(spark):
    from osmgraft.operators.curation import assign_shards

    # one bucket -> pure sequential greedy: tokens 4,4,4 at target 6 pack
    # as [4], [4+4 overshoots? no: shard = floor((cum-tok)/6)] -> 0,0,1
    d = spark.createDataFrame([(1, 4), (2, 4), (3, 4)], "doc_id bigint, n_tokens int")
    out = {r["doc_id"]: r["shard_ix"] for r in assign_shards(d, 6, n_buckets=1).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


# --- boilerplate line removal ----------------------------------------------------


def test_remove_duplicate_lines_corpus_count(spark):
    from osmgraft.operators.curation import remove_duplicate_lines

    df = spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one\ncookie banner"),
            (2, "cookie banner\nreal content two"),
            (3, "unique doc entirely"),
        ],
        "doc_id bigint, text string",
    )
    # 'cookie banner' occurs 3x corpus-wide -> removed everywhere at min_df=3
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(df, min_df=3).collect()}
    assert out == {
        1: "real content one",
        2: "real content two",
        3: "unique doc entirely",
    }
    # at min_df=4 nothing is hot; docs reassemble in original order
    out4 = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(df, min_df=4).collect()}
    assert out4[1] == "cookie banner\nreal content one\ncookie banner"


def test_remove_duplicate_lines_drops_fully_boilerplate_doc(spark):
    from osmgraft.operators.curation import remove_duplicate_lines

    df = spark.createDataFrame(
        [(1, "nav\nnav"), (2, "nav\nbody"), (3, "nav")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(df, min_df=2).collect()}
    assert out == {2: "body"}  # docs 1 and 3 were 100% boilerplate


# --- PII redaction -----------------------------------------------------------------


def test_redact_pii_kinds_and_counts(spark):
    from osmgraft.operators.curation import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@ex-a.org and 10.0.0.1 call +1 (555) 123-4567 end"),
            (2, "clean text only"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    r1 = rows[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (1, 1, 1)
    assert r1["text"] == "mail <email> and <ipv4> call <phone> end"
    r2 = rows[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)
    assert r2["text"] == "clean text only"


def test_redact_pii_is_narrow(spark, docs):
    from osmgraft.operators.curation import redact_pii

    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# --- deterministic sampling ------------------------------------------------------


def test_hash_sample_rate_determinism_and_complement(spark, docs):
    a = hash_sample(docs, 0.3, seed=7)
    b = hash_sample(docs, 0.3, seed=7)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # rerun-stable
    n = docs.count()
    assert abs(len(ids_a) / n - 0.3) < 0.08
    # complement is the exact held-out set
    held = docs.where(sample_hash01(F.col("doc_id"), 7) >= F.lit(0.3))
    assert held.count() + len(ids_a) == n
    # different seed -> different draw
    ids_c = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=8).select("doc_id").collect()}
    assert ids_c != ids_a


def test_hash_sample_is_narrow(spark, docs):
    plan = hash_sample(docs, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle: filter over the scan


def test_stratified_sample_rates(spark, docs):
    frac = {"en": 1.0, "de": 0.5, "fr": 0.0}
    out = stratified_sample(docs, frac, strata_col="lang", seed=3)
    got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    base = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got["en"] == base["en"]  # rate 1.0 keeps everything
    assert "fr" not in got and "es" not in got and "zh" not in got  # 0.0 + default 0.0
    assert 0 < got["de"] < base["de"]


def test_stratified_default_fraction_keeps_unlisted(spark, docs):
    out = stratified_sample(docs, {"en": 0.0}, strata_col="lang", default_fraction=1.0)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" not in langs and {"de", "fr"} <= langs


def test_mix_domains_hits_target_mixture(spark, docs):
    target = {"en": 0.5, "de": 0.3, "fr": 0.2}
    out = mix_domains(docs, target, domain_col="lang", seed=11).cache()
    got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    total = sum(got.values())
    base = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    feasible = min(base[d] / t for d, t in target.items())
    # the binding domain is kept (nearly) whole; proportions near target
    for d, t in target.items():
        assert abs(got.get(d, 0) / total - t) < 0.12
    assert total <= sum(base[d] for d in target)
    assert total > 0.5 * feasible
    out.unpersist()


def test_mix_domains_missing_domain_raises(spark, docs):
    with pytest.raises(ValueError, match="no rows"):
        mix_domains(docs, {"klingon": 1.0}, domain_col="lang")


def test_sql_exact_hash_matches_duckdb(spark):
    import duckdb

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]
        for r in hash_sample(df, 0.25, seed=5, sql_exact=True).collect()
    }
    want = {
        r[0]
        for r in duckdb.sql(
            "select i from range(0, 1000) t(i) where "
            "(((i % 2147483648) + 5) * 2654435761 % 4294967296) / 4294967296.0 < 0.25"
        ).fetchall()
    }
    assert got == want and 150 < len(got) < 350


def test_curation_pipeline_composed_stages(spark):
    from osmgraft.operators.curation import curation_pipeline

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 0
            (2, "lambda mu nu xi omicron pi rho sigma tau upsilon"),
            (3, "LEAK one two LEAK three four LEAK five six LEAK seven"),  # contaminated
            (4, "!!! ??? !!! ???"),  # fails quality (punct ratio, words)
            (5, "phi chi psi omega aleph beth gimel daleth he waw"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "LEAK one two LEAK three four LEAK five six LEAK seven")],
        "doc_id long, text string",
    )
    out = curation_pipeline(
        corpus,
        bench,
        sample_fraction=1.0,  # keep everything that survives the filters
        chunk_words=6,
        overlap=2,
        sql_exact=True,
    )
    rows = out.collect()
    kept_docs = {r["doc_id"] for r in rows}
    # dup (1), contaminated (3), low-quality (4) are gone; 0/2/5 survive
    assert kept_docs == {0, 2, 5}
    # 10-word docs, chunk 6 stride 4 -> starts 0, 4 per doc
    per_doc = sorted(
        (r["doc_id"], r["chunk_id"], r["start_word"], r["n_words"]) for r in rows
    )
    assert per_doc == [
        (0, 0, 0, 6), (0, 1, 4, 6),
        (2, 0, 0, 6), (2, 1, 4, 6),
        (5, 0, 0, 6), (5, 1, 4, 6),
    ]


def test_curation_pipeline_sampling_is_knuth_exact(spark):
    from osmgraft.operators.curation import curation_pipeline, sample_hash01
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"w{i} unique{i} text{i} body{i} tail{i} end{i}") for i in range(40)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(999, "zzz yyy xxx www vvv")], "doc_id long, text string")
    out = curation_pipeline(docs, bench, sample_fraction=0.5, seed=5, sql_exact=True)
    got = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    expect = {
        r["doc_id"]
        for r in docs.where(
            sample_hash01(F.col("doc_id"), seed=5, sql_exact=True) < 0.5
        ).collect()
    }
    assert got == expect and 0 < len(got) < 40


def test_remove_duplicate_lines_metachar_separator_roundtrip(spark):
    """line_sep is a LITERAL in both split and join: a separator that is a
    regex metacharacter ('|', '.') must round-trip, not split per-char."""
    from osmgraft.operators.curation import remove_duplicate_lines

    df = spark.createDataFrame(
        [(1, "ad unit|keep me|ad unit"), (2, "ad unit|other text")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(df, min_df=2, line_sep="|").collect()
    }
    assert out == {1: "keep me", 2: "other text"}
    # nothing hot at min_df=4 ('ad unit' occurs 3x): byte-identical roundtrip
    out4 = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(df, min_df=4, line_sep="|").collect()
    }
    assert out4 == {1: "ad unit|keep me|ad unit", 2: "ad unit|other text"}


# ---------------------------------------------------------------------------
# weighted sampling + percentile gate
# ---------------------------------------------------------------------------


def test_weighted_sample_proportional_and_deterministic(spark):
    """Row 'heavy' (weight 50) must win far more often than weight-1 rows
    across seeds, and the same seed must pick the same rows every time."""
    from osmgraft.operators.curation import weighted_sample

    import pyspark.sql.functions as F2

    rows = [(i, 50.0 if i == 0 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy_wins = 0
    for seed in range(30):
        got = {r["doc_id"] for r in weighted_sample(df, k=10, weight_col="w", seed=seed).collect()}
        assert len(got) == 10
        heavy_wins += 0 in got
    # P(heavy in top-10 of 100 with w=50 vs 99x w=1) is ~1; allow slack
    assert heavy_wins >= 27

    a = sorted(r["doc_id"] for r in weighted_sample(df, k=10, weight_col="w", seed=3).collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, k=10, weight_col="w", seed=3).collect())
    assert a == b

    # zero/null weights never win
    df2 = spark.createDataFrame([(1, 0.0), (2, None), (3, 1.0)], "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df2, k=3, weight_col="w").collect()}
    assert got == {3}
    import pytest as pt

    with pt.raises(ValueError):
        weighted_sample(df, k=0, weight_col="w")


def test_weighted_sample_strata_and_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.curation import weighted_sample, weighted_sample_oracle_sql

    rows = [(i, f"s{i % 4}", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string, w double")
    got = sorted(
        (r["doc_id"], r["stratum"])
        for r in weighted_sample(
            df, k=5, weight_col="w", strata_cols=["stratum"], seed=1
        ).collect()
    )
    assert len(got) == 20  # 4 strata x 5
    con = duckdb.connect()
    con.execute("create table rows_t(doc_id bigint, stratum varchar, w double)")
    con.executemany("insert into rows_t values (?, ?, ?)", rows)
    sql = weighted_sample_oracle_sql(
        "select * from rows_t", k=5, weight_col="w", strata_cols=["stratum"], seed=1
    )
    want = sorted((d, st) for d, st, _ in con.execute(sql).fetchall())
    assert got == want


def test_quantile_gate_partitions_corpus(spark):
    from osmgraft.operators.curation import quantile_gate

    rows = [(i, float((i * 37) % 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    above = quantile_gate(df, "score", q=0.9, lo=0.0, hi=1000.0)
    below = quantile_gate(df, "score", q=0.9, lo=0.0, hi=1000.0, keep="below")
    na, nb = above.count(), below.count()
    assert na + nb == 4000  # exact partition
    # threshold is one-sided: at least ceil(0.9*n) values <= it, so the
    # kept-above side holds at most ~10% plus one bin's width of mass
    assert na <= 0.1 * 4000 + 4000 * (1000.0 / 256) / 1000.0 + 1
    assert na >= 200  # and it's not degenerate
    vals_above = [r["score"] for r in above.collect()]
    vals_below = [r["score"] for r in below.collect()]
    assert min(vals_above) > max(vals_below) - 1e-9
    import pytest as pt

    with pt.raises(ValueError):
        quantile_gate(df, "score", 0.5, 0.0, 1.0, keep="middle")
