"""Keyword retrieval over the document corpus: BM25 scoring and top-k.

The missing retrieval modality next to the embedding ANN paths
(:mod:`osmgraft.operators.simsearch`): given a bag of query terms, score
every document with Okapi BM25 (Robertson et al., public) and return the
top-k. A curation pipeline uses this to pull topic slices out of a
100-TB corpus, audit dedup clusters, or build weak labels — and it is the
classic inverted-index shape, so it doubles as the engine's demonstration
that posting-list retrieval maps onto DataFrame ops without an index:

- the corpus-stats pass (N, avgdl) is ONE aggregate over a single
  tokenize projection — a scalar, broadcast into the scoring plan;
- the posting lists are built by filtering the exploded token stream to
  the query terms BEFORE any shuffle: the groupBy that computes term
  frequencies only ever shuffles rows whose token is one of the |Q|
  query terms, so shuffle volume is O(matching postings), not O(corpus
  tokens) — the same asymptotic a real inverted index gives for a scan
  engine (the tokenize scan itself is the unavoidable floor without a
  prebuilt index; at 10^12 docs you materialize the exploded token
  table once, bucketed by token, and this operator's plan is then a
  bucket-pruned scan);
- document frequencies and the (n_docs, avgdl) scalar are both tiny
  (<= |Q| rows) and broadcast — the per-doc score aggregation is the
  only real shuffle, keyed on doc id.

Determinism / oracle parity: BM25 is a sum of per-term double
contributions, and floating-point addition is not associative — a plain
SUM(double) can differ in the last ulp between engines (and between two
Spark runs with different partitionings). Each term contribution is
therefore floored to a fixed-point integer (1e-9 resolution) and the sum
runs over int64 — order-independent, bit-identical in any engine — then
scaled back to a double at the end. The quantization error is bounded by
|Q| * 1e-9, far below any ranking-relevant difference.

No reference analogue (krumpefp/osm_input has no text retrieval);
builder-brief training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.operators.dedup import tokens_expr

_SCALE = 1_000_000_000  # fixed-point resolution for the order-free score sum


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    corpus_stats: tuple[int, float] | None = None,
    materialize_postings: bool = True,
) -> DataFrame:
    """BM25 score per document for a bag of query terms.

    Returns ``(id_col, matched_terms, score)`` for every document that
    matches at least one query term. ``score`` uses the standard
    Robertson idf with the +1 shift (always positive):

        idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
        tfn(t,d)= tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
        score   = sum_t idf(t) * tfn(t,d)

    N and avgdl are computed over the FULL corpus (docs with no query
    term still shape the statistics), df_t over matching docs only.

    Scan accounting: the corpus is read twice by default — once for
    (N, avgdl), once for the postings. ``corpus_stats=(n_docs, avgdl)``
    skips the stats scan (a production deployment knows both from the
    ingest pipeline), leaving ONE corpus pass. ``materialize_postings``
    (default) lazily localCheckpoints the aggregated tf frame — already
    reduced to matching (doc, term) rows, tiny next to the corpus — so
    the document-frequency aggregation reuses it instead of re-running
    the corpus scan a third time.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    base = df.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("_w")
    ).withColumn("dl", F.size("_w"))
    if corpus_stats is not None:
        n_docs, avgdl = corpus_stats
        stats = df.sparkSession.range(1).select(
            F.lit(int(n_docs)).alias("n_docs"), F.lit(float(avgdl)).alias("avgdl")
        )
    else:
        stats = base.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # postings: filter to query terms BEFORE the explode leaves the stage —
    # the groupBy below shuffles only matching (id, term) rows
    tok = base.select(F.col(id_col), "dl", F.explode("_w").alias("term")).where(
        F.col("term").isin(list(query_terms))
    )
    tf = tok.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    if materialize_postings:
        tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.floor(idf * tfn * F.lit(float(_SCALE))).cast("long")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("matched_terms"),
            (F.sum(contrib) / F.lit(float(_SCALE))).alias("score"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    corpus_stats: tuple[int, float] | None = None,
    materialize_postings: bool = True,
) -> DataFrame:
    """Top-k documents by BM25 score, deterministic tie order (score desc,
    id asc). ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
    a per-partition top-k heap + single k-row merge, never a global sort.
    """
    s = bm25_scores(
        df, query_terms, text_col, id_col, k1, b, corpus_stats, materialize_postings
    )
    return s.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
