"""Training-corpus curation operators: benchmark decontamination,
within-document repetition signals, deterministic hash sampling,
stratified sampling and domain mixing.

These are the curation steps a pretraining pipeline runs between dedup
(:mod:`osmgraft.operators.dedup`) and the final shard write — each one
DataFrame-first and DuckDB-oracle-checkable value-for-value:

- decontamination: drop corpus documents that share word n-grams with a
  benchmark/eval set (the standard test-set-leakage guard). The
  benchmark side is SMALL by definition (eval suites are thousands of
  documents, the corpus is 10^12), so its distinct-gram table is
  BROADCAST: the 100-TB corpus side stays a narrow explode + broadcast
  semi-join + per-doc count — no all-corpus shuffle of gram strings.
- repetition signals: Gopher-style (Rae et al. 2021, public) fractions
  of the document covered by its most frequent word / word-bigram, plus
  the distinct-word ratio — the classic "looped generation" detectors.
  Explode + two-level groupBy keyed on (doc_id, gram): shuffle volume
  is proportional to corpus token count (the unavoidable floor for any
  exact per-doc mode computation) and the key includes doc_id, so
  hot-token skew cannot concentrate on one reducer.
- deterministic sampling: keep a row iff ``hash(id, seed)/2^32 <
  fraction``. Zero-shuffle, zero-RNG-state: reproducible across runs,
  retries and engines (the whole point at 10^12 rows — Spark's native
  ``df.sample`` is neither stable under task retry nor replayable in an
  external system). Stratified sampling is the same filter with the
  fraction looked up per-stratum from a literal map — still narrow.
- domain mixing: hit a target mixture (e.g. 50% web / 30% code / 20%
  books) by computing, from per-domain counts, the largest total corpus
  achievable without over-drawing any domain, then hash-sampling each
  domain at its implied rate. One tiny count aggregate (rows = number
  of domains) crosses the driver; the filter itself is narrow.

Hash replayability: the default id hash is Spark's ``xxhash64`` (JVM,
whole-stage codegen). For oracle parity with engines that lack xxhash64
(DuckDB), ``sql_exact=True`` switches to a Knuth multiplicative hash on
the integer id — ``((id mod 2^31) + seed) * 2654435761 mod 2^32`` —
pure int64 arithmetic that evaluates bit-identically in any ANSI SQL
engine (the ``mod 2^31`` pre-reduction keeps the product inside int64:
(2^31)(2654435761) < 2^63, so neither engine's overflow semantics is
ever exercised). Ids >= 2^31 alias pairwise under the pre-reduction;
fine for sampling tests, use the default xxhash64 path in production.

Reference scope note: the reference engine (krumpefp/osm_input) has no
curation analogue — these operators cover the builder-brief
training-data-pipeline surface, same as dedup.py/simsearch.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osmgraft.operators.dedup import tokens_expr, word_shingles_expr

_KNUTH = 2654435761  # Knuth's multiplicative-hash constant (2^32 / phi)
_MOD32 = 4294967296


# --- deterministic hash sampling ---------------------------------------------


def sample_hash01(id_col: Column, seed: int = 0, sql_exact: bool = False) -> Column:
    """Uniform-ish double in [0, 1), a pure function of (id, seed).

    Default: ``xxhash64`` (codegen, any input type). ``sql_exact``:
    the int64-safe Knuth hash documented in the module header —
    bit-replayable as ANSI SQL, integer ids only."""
    if sql_exact:
        h = F.pmod((F.pmod(id_col.cast("bigint"), F.lit(2**31)) + F.lit(seed)) * F.lit(_KNUTH), F.lit(_MOD32))
        return h / F.lit(float(_MOD32))
    # xxhash64 is signed; shift into [0, 2^64) as double then normalize
    return (F.xxhash64(id_col, F.lit(seed)).cast("double") + F.lit(float(2**63))) / F.lit(float(2**64))


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
    sql_exact: bool = False,
) -> DataFrame:
    """Deterministic ``fraction``-rate sample: keep iff hash01 < fraction.

    Narrow (no shuffle, no RNG state); stable under task retry and
    re-runs, and the complement (``>=``) is the exact held-out set."""
    return df.where(sample_hash01(F.col(id_col), seed, sql_exact) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
    sql_exact: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling in ONE narrow filter.

    ``fractions`` maps stratum value -> keep rate; strata absent from
    the map keep at ``default_fraction`` (0.0 = drop, the explicit-
    allowlist default). The map ships as a literal expression — no join,
    no shuffle, scales to any corpus size at scan speed."""
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs.extend([F.lit(k), F.lit(float(v))])
    frac = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)), F.lit(float(default_fraction))
    )
    return df.where(sample_hash01(F.col(id_col), seed, sql_exact) < frac)


def mix_domains(
    df: DataFrame,
    target: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    sql_exact: bool = False,
) -> DataFrame:
    """Resample to a target domain mixture, keeping as much data as the
    mixture allows.

    With per-domain counts ``c_d`` and target proportions ``t_d`` (must
    cover the domains to keep; others drop), the largest feasible total
    is ``T = min_d(c_d / t_d)`` — the binding domain is kept whole, every
    other domain downsamples to ``T * t_d`` rows (in expectation) via
    :func:`hash_sample` at rate ``T * t_d / c_d``.

    Cost: one count aggregate whose result has one row PER DOMAIN
    (collected to the driver — domains are O(10^1..10^3), never data-
    scale), then one narrow filter over the corpus."""
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(domain_col).isin(list(target)))
        .groupBy(domain_col)
        .count()
        .collect()
    }
    missing = [d for d in target if d not in counts]
    if missing:
        raise ValueError(f"mix_domains: no rows for target domains {missing}")
    feasible_total = min(counts[d] / t for d, t in target.items() if t > 0)
    rates = {d: min(feasible_total * t / counts[d], 1.0) for d, t in target.items()}
    return stratified_sample(
        df, rates, strata_col=domain_col, id_col=id_col, seed=seed, sql_exact=sql_exact
    )


# --- training-shard packing -----------------------------------------------------


def assign_shards(
    df: DataFrame,
    target_tokens: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: int = 0,
    sql_exact: bool = False,
) -> DataFrame:
    """Assign every document to a training shard with a ~``target_tokens``
    token budget, deterministically.

    Writers of tokenized pretraining data want shards of roughly equal
    token mass, stable across reruns (a retry must not re-deal documents
    into different shards). Exact global bin-packing is inherently
    sequential, so this uses the standard scalable compromise: documents
    hash into ``n_buckets`` independent streams (narrow), each stream is
    packed greedily in id order — ``shard_ix = floor((cumsum(tokens) -
    tokens) / target_tokens)`` — and the shard key is ``(bucket,
    shard_ix)``. Each bucket's running sum is one window over a
    ~corpus/n_buckets partition; size ``n_buckets`` to the cluster (it
    bounds both parallelism and the window partition size). Shards
    overshoot the budget by at most one document — the same guarantee a
    sequential greedy packer gives.

    Output: input columns + ``bucket``, ``shard_ix``. Deterministic in
    (id, seed); ``sql_exact`` selects the ANSI-replayable Knuth id hash
    (see module header) instead of xxhash64."""
    if sql_exact:
        b = F.pmod(
            (F.pmod(F.col(id_col).cast("bigint"), F.lit(2**31)) + F.lit(seed)) * F.lit(_KNUTH),
            F.lit(n_buckets),
        )
    else:
        b = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_buckets))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("bucket", b.cast("int"))
    cum = F.sum(F.col(tokens_col)).over(w)
    return out.withColumn(
        "shard_ix",
        F.floor((cum - F.col(tokens_col)) / F.lit(float(target_tokens))).cast("int"),
    )


# --- benchmark decontamination ------------------------------------------------


def contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """``(id_col, n_shared)`` for every corpus document sharing at least
    ``min_shared`` DISTINCT word ``n``-grams with the benchmark set.

    Shape for 10^12 docs: the benchmark's distinct grams (small by
    definition — eval suites, not corpora) are globally deduped and
    BROADCAST; the corpus side is a narrow distinct-gram explode feeding
    a broadcast inner join, then one groupBy(``id_col``) count. The only
    corpus-wide shuffle is that final per-doc count, carrying ONLY the
    contaminated (doc, gram-hit) rows — in a healthy corpus a tiny
    fraction of the input. ``n=13`` is the conventional leakage window;
    both sides tokenize identically to :func:`osmgraft.operators.dedup
    .word_shingles_expr` (docs shorter than ``n`` words contribute one
    whole-document gram)."""
    bench_text = bench_text_col or text_col
    bgrams = bench.select(
        F.explode(word_shingles_expr(F.col(bench_text), n)).alias("_g")
    ).distinct()
    dgrams = docs.select(
        F.col(id_col), F.explode(word_shingles_expr(F.col(text_col), n)).alias("_g")
    )
    hits = dgrams.join(F.broadcast(bgrams), "_g")
    out = hits.groupBy(id_col).agg(F.count("*").alias("n_shared"))
    return out.where(F.col("n_shared") >= min_shared)


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Corpus minus contaminated documents (left-anti on the flagged id
    set). Same cost shape as :func:`contaminated_ids` plus one semi-join
    keyed on the id — the flagged side is small, so it broadcasts."""
    flagged = contaminated_ids(docs, bench, n, min_shared, text_col, id_col, bench_text_col)
    return docs.join(F.broadcast(flagged.select(id_col)), id_col, "left_anti")


# --- corpus-level boilerplate line removal (C4 rule) ---------------------------


def remove_duplicate_lines(
    df: DataFrame,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """C4-style boilerplate scrub: delete every line occurring at least
    ``min_df`` times ACROSS THE CORPUS (all occurrences removed), then
    reassemble documents in original line order. Documents whose every
    line was boilerplate drop from the output (C4 drops empty docs).

    Shape at 10^12 docs: posexplode lines (narrow), one groupBy(line)
    count shuffle, then an anti-join against ONLY the hot lines — in a
    healthy corpus the boilerplate set (cookie banners, nav bars) is
    tiny relative to the corpus, so AQE plans that side broadcast; a
    pathological corpus degrades to a shuffled anti-join that AQE's
    skew-join splits. Reassembly is one groupBy(``id_col``) packing
    (pos, line) structs — array_sort on doc-bounded groups, no window
    over an unbounded key."""
    # \Q..\E quotes the separator so split sees the same LITERAL string
    # array_join reassembles with — an unquoted "|" or "." separator
    # would split as a regex but join as text, garbling the round-trip
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\\Q" + line_sep + "\\E")).alias("_pos", "_line"),
    )
    hot = (
        lines.groupBy("_line")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") >= min_df)
        .select("_line")
    )
    kept = lines.join(hot, "_line", "left_anti")
    packed = kept.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("_pos", "_line"))).alias("_ls")
    )
    return packed.select(
        F.col(id_col),
        F.array_join(F.transform("_ls", lambda s: s["_line"]), line_sep).alias(text_col),
    )


# --- PII redaction ---------------------------------------------------------------

# deliberately simple patterns that parse identically under Java regex
# (Spark) and RE2 (DuckDB/others): no backrefs, no lookaround, no \b
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "phone": r"\+[0-9][0-9() -]{6,}[0-9]",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    replacement: str = "<{kind}>",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Replace PII spans with ``<kind>`` tokens and report per-kind match
    counts (counted on the ORIGINAL text; kinds are applied in the given
    order, so an email's host part is never double-matched as a host-less
    pattern later in the chain — email first by default).

    Pure Catalyst ``regexp_replace``/``regexp_count`` chain: narrow,
    whole-stage codegen, zero shuffle — the redaction pass is scan-speed
    at any corpus size."""
    out = F.col(text_col)
    cols = [F.col(id_col)]
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{kind}"))
        out = F.regexp_replace(out, pat, replacement.format(kind=kind))
    return df.select(*cols, out.alias(text_col))


# --- within-doc repetition signals (Gopher rules) -----------------------------


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition signals: ``n_words``, ``n_distinct_words``,
    ``distinct_frac``, ``top_word_count``, ``top_word_frac``,
    ``top_bigram_count``, ``top_bigram_frac``.

    ``top_word_frac`` / ``top_bigram_frac`` are the fraction of the
    document's word (bigram) positions occupied by its single most
    frequent word (bigram) — the Gopher "repetition" family's cheapest
    members; looped-generation spam scores near 1.0, natural text well
    below 0.2. Single-word documents have no bigram: count 0, frac 0.

    Execution: explode words/bigrams, count per (doc, gram), then reduce
    per doc — both shuffles are keyed by (doc_id, gram) then doc_id, so
    planet-frequency tokens spread across docs rather than piling on one
    reducer, and the second shuffle carries one row per DISTINCT gram
    per doc. Exact (no sketch); shuffle volume ~ token count, the floor
    for exact per-doc modes."""
    words = tokens_expr(F.col(text_col))
    bigrams = F.zip_with(
        words,
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b)),
    )
    base = df.select(
        F.col(id_col), words.alias("_ws"), F.filter(bigrams, lambda x: x.isNotNull()).alias("_bs")
    )

    def mode_stats(col: str, out_prefix: str) -> DataFrame:
        g = base.select(F.col(id_col), F.explode(col).alias("_g"))
        per = g.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
        return per.groupBy(id_col).agg(
            F.sum("_c").alias(f"{out_prefix}_total"),
            F.count("*").alias(f"{out_prefix}_distinct"),
            F.max("_c").alias(f"{out_prefix}_top"),
        )
    w = mode_stats("_ws", "w")
    b = mode_stats("_bs", "b")
    out = w.join(b, id_col, "left")
    return out.select(
        F.col(id_col),
        F.col("w_total").alias("n_words"),
        F.col("w_distinct").alias("n_distinct_words"),
        F.round(F.col("w_distinct") / F.col("w_total"), 4).alias("distinct_frac"),
        F.col("w_top").alias("top_word_count"),
        F.round(F.col("w_top") / F.col("w_total"), 4).alias("top_word_frac"),
        F.coalesce(F.col("b_top"), F.lit(0)).alias("top_bigram_count"),
        F.round(
            F.coalesce(F.col("b_top") / F.col("b_total"), F.lit(0.0)), 4
        ).alias("top_bigram_frac"),
    )


# --- context-window chunking ---------------------------------------------------


def chunk_docs(
    df: DataFrame,
    chunk_words: int = 100,
    overlap: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-width word windows — the
    context-length chunking step that feeds tokenization / shard packing
    (:func:`assign_shards`) when raw documents exceed the model's window.

    Chunk i starts at word ``i * (chunk_words - overlap)``; starts are
    emitted while ``start < max(n_words - overlap, 1)``, so the tail is
    always covered, the last chunk may be short, and no chunk is wholly
    contained in its predecessor. A document shorter than ``chunk_words``
    yields exactly one chunk (itself).

    Pure Catalyst (sequence -> explode -> slice/array_join): narrow
    per-row work, zero shuffle, zero UDF — at 100 TB this is a map-only
    stage whose output is ~(1 + overlap/stride)x the input bytes.

    Returns ``(id_col, chunk_id, start_word, n_words, chunk_text)``;
    ``chunk_id`` counts from 0 per document.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    words = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), words.alias("_w")).withColumn("_n", F.size("_w"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - overlap, F.lit(1)) - 1, F.lit(stride)
    )
    exp = base.select(
        F.col(id_col), "_w", "_n", F.posexplode(starts).alias("chunk_id", "start_word")
    )
    return exp.select(
        F.col(id_col),
        "chunk_id",
        "start_word",
        F.least(F.lit(chunk_words), F.col("_n") - F.col("start_word")).alias("n_words"),
        F.array_join(F.slice("_w", F.col("start_word") + 1, F.lit(chunk_words)), " ").alias(
            "chunk_text"
        ),
    )


# --- composed end-to-end curation pipeline --------------------------------------


def curation_pipeline(
    docs: DataFrame,
    bench: DataFrame,
    sample_fraction: float = 0.5,
    seed: int = 5,
    chunk_words: int = 40,
    overlap: int = 10,
    min_words: int = 5,
    max_punct_ratio: float = 0.2,
    min_alpha_ratio: float = 0.5,
    decontam_n: int = 3,
    decontam_min_shared: int = 2,
    sql_exact: bool = False,
) -> DataFrame:
    """The standard pretraining curation chain as ONE composed plan:

        exact dedup -> quality filter -> benchmark decontamination ->
        deterministic hash sample -> context-window chunking

    Composability is the point: every stage is the already-tested
    operator, Catalyst fuses the narrow stages (quality predicate,
    sample filter, chunking) into the scans around the two genuine
    shuffles (the dedup hash groupBy and the decontamination per-doc
    count), and the whole chain stays value-replayable in SQL — the
    driver oracle runs the five stages as chained CTEs and matches
    chunk-for-chunk. Order follows practice: dedup before quality
    (cheapest mass reduction first), decontaminate after quality (the
    gram explode runs on fewer docs), sample last so the kept fraction
    applies to the clean pool, chunk at the very end (never chunk a
    document you might drop).

    Returns the chunk frame of :func:`chunk_docs` over the surviving
    documents."""
    from osmgraft.operators.dedup import exact_dedup
    from osmgraft.operators.textstats import quality_filter

    d = exact_dedup(docs)
    d = quality_filter(
        d,
        min_words=min_words,
        max_punct_ratio=max_punct_ratio,
        min_alpha_ratio=min_alpha_ratio,
    )
    flagged = contaminated_ids(d, bench, n=decontam_n, min_shared=decontam_min_shared)
    d = d.join(flagged.select("doc_id"), "doc_id", "left_anti")
    d = hash_sample(d, sample_fraction, seed=seed, sql_exact=sql_exact)
    return chunk_docs(d, chunk_words=chunk_words, overlap=overlap)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the ``k``
    rows (per stratum, if ``strata_cols``) whose Efraimidis-Spirakis keys
    win — each row's inclusion probability is proportional to its weight,
    exactly the "sample documents by quality score" curation primitive.

    Efraimidis & Spirakis 2006 (public): draw u ~ U(0,1) per row, rank by
    u^(1/w) descending, take the top k. Implemented rank-equivalently as
    ``ln(u)/w`` descending (one ln + one divide instead of pow; the
    monotone map preserves the selection), with u derived from the
    engine's REPLAYABLE md5-low-64 hash of ``(seed| id)`` — u = (53
    hash bits + 0.5) / 2^53, never 0 or 1 — so the very same rows win in
    any engine. Deterministic under retries; ties broken by id.

    Scale shape: the key is a narrow codegen expression; selection is a
    per-stratum window (rows-per-stratum bounded like any keyed top-k).
    With no strata the window is global — fine for modest k via
    TakeOrdered semantics, but prefer strata at corpus scale. Rows with
    weight <= 0 or NULL never win (dropped before ranking)."""
    from osmgraft.operators.sketch import md5_low64_expr

    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    h = md5_low64_expr(F.concat(F.lit(f"ws{seed}|"), F.col(id_col).cast("string")))
    u = (h.bitwiseAND(F.lit((1 << 53) - 1)).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 53)
    )
    key = F.log(u) / w
    strata = strata_cols or []
    win = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(
        key.desc(), F.col(id_col).asc()
    )
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("_ws_rank", F.row_number().over(win))
        .where(F.col("_ws_rank") <= k)
        .drop("_ws_rank")
    )


def weighted_sample_oracle_sql(
    rows_cte: str,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_cols: list[str] | None = None,
    seed: int = 0,
) -> str:
    """DuckDB replica of :func:`weighted_sample` over ``rows_cte``:
    identical md5-derived u, identical ln(u)/w key, identical tie-break."""
    if k < 1:
        raise ValueError("k must be >= 1")
    strata = strata_cols or []
    part = f"partition by {', '.join(strata)} " if strata else ""
    u = (
        f"(cast(md5_number_lower('ws{seed}|' || cast({id_col} as varchar)) "
        f"& {(1 << 53) - 1} as double) + 0.5) / {float(1 << 53)!r}"
    )
    return (
        f"with ws_r as (select * from ({rows_cte}) "
        f"where {weight_col} is not null and {weight_col} > 0), "
        f"ws_k as (select *, ln({u}) / cast({weight_col} as double) as _key "
        "from ws_r), "
        f"ws_n as (select *, row_number() over ({part}order by _key desc, "
        f"{id_col} asc) as _rk from ws_k) "
        "select * exclude (_key, _rk) from ws_n where _rk <= "
        f"{k}"
    )


def quantile_gate(
    df: DataFrame,
    value_col: str,
    q: float,
    lo: float,
    hi: float,
    nbins: int = 256,
    keep: str = "above",
) -> DataFrame:
    """Corpus-percentile quality gate: keep the rows whose ``value_col``
    clears the q-th percentile of the WHOLE corpus — e.g. drop the
    bottom decile by quality score. The threshold comes from the
    mergeable fixed-bin histogram sketch (deterministic, unlike
    ``approx_percentile``), so the gate costs one bounded-shuffle sketch
    pass plus a broadcast of the single threshold row — never a global
    sort.

    ``keep='above'`` keeps ``value >= threshold`` (threshold = the
    sketch's one-sided upper-edge estimate: at least ceil(q*n) values lie
    at or below it); ``'below'`` keeps the complement ``value <
    threshold``. The two outputs partition the corpus exactly."""
    from osmgraft.operators.sketch import hist_bins, hist_quantiles

    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    bins = hist_bins(df, value_col, lo, hi, nbins)
    thr = hist_quantiles(bins, [q], lo, hi, nbins).select(
        F.col("value_est").alias("_thr")
    )
    gated = df.crossJoin(F.broadcast(thr))
    pred = F.col(value_col).cast("double") >= F.col("_thr")
    return gated.where(pred if keep == "above" else ~pred).drop("_thr")
