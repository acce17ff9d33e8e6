"""Deduplication operators for large-scale training-data pipelines.

Four families, all DataFrame-first:

- exact:      content-hash groupBy (one shuffle on the hash)
- n-gram Jaccard: token-set similarity via explode + equi-join on token
              (SQL-expressible -> DuckDB-oracled)
- MinHash+LSH: signatures computed ENTIRELY in Catalyst (xxhash64 over
              shingle arrays + array_min per permutation — no Python),
              banded into buckets, candidate pairs verified by exact
              Jaccard. The standard shingle->minhash->band->bucket-join
              pipeline.
- SimHash:    64-bit signature via a vectorized numpy kernel (bit-count
              majority over token hashes), near-dups = small Hamming
              distance within prefix buckets.

Every pair family feeds :func:`connected_components` (alternating
large-star / small-star, O(log n) shuffle rounds) to turn candidate pairs
into dedup clusters, and :func:`dedup_survivors` to pick the canonical
document per cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --- exact -------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact content hash."""
    h = F.md5(F.col(text_col))
    keep = df.withColumn("_h", h).groupBy("_h").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), id_col, "leftsemi")


# --- token/shingle helpers -------------------------------------------------------


def tokens_expr(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def word_shingles_expr(text: Column, n: int) -> Column:
    """Distinct word n-grams as array<string> (space-joined).

    Built from a chain of ``zip_with`` over shifted copies of the word
    array — O(n_words) per gram width, measured 5x faster than the
    ``sequence`` + ``transform(concat_ws(slice(...)))`` form, whose
    per-index slice allocates an n-element array for every position.
    Documents shorter than ``n`` words emit one truncated gram (the whole
    document), matching the slice formulation's behavior."""
    words = tokens_expr(text)
    if n == 1:
        return F.array_distinct(words)
    size = F.size(words)
    acc = words
    for k in range(1, n):
        wk = F.slice(words, k + 1, F.greatest(size - k, F.lit(0)))
        if k < n - 1:
            # concat_ws skips NULLs from zip_with's padding; only the last
            # zip decides whether a position is a complete n-gram
            acc = F.zip_with(acc, wk, lambda a, b: F.concat_ws(" ", a, b))
        else:
            acc = F.zip_with(
                acc, wk, lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b))
            )
    full = F.array_distinct(F.filter(acc, lambda x: x.isNotNull()))
    return F.when(size >= n, full).otherwise(F.array(F.concat_ws(" ", words)))


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """All (a, b) id pairs (a < b) with token-set Jaccard >= threshold —
    explode+join formulation (co-partitioned on token), identical to the
    DuckDB oracle SQL when ``max_df`` is None.

    ``max_df`` is the hot-token damping rail: the token equi-join is
    quadratic in each token's document frequency, so one stopword in every
    document turns it into an all-pairs bomb. Tokens appearing in more
    than ``max_df`` documents are dropped from BOTH the intersection join
    and the set sizes — jaccard is then computed on the damped token sets
    (internally consistent; equal to the true jaccard whenever no token
    exceeds the cutoff, and the standard df-cutoff candidate semantics
    otherwise: pairs that share only ultra-common tokens stop surfacing,
    which is what near-dup mining wants).

    The rail is ON by default (finite ``max_df``) so a caller who forgets
    it cannot detonate the join — one planet-frequency stopword at 10^9
    docs is a 10^18-row self-join. Pass ``max_df=None`` EXPLICITLY for
    exact small-corpus jaccard (the correctness-oracle configuration)."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias("w")
    )
    if max_df is not None:
        hot = tok.groupBy("w").agg(F.count("*").alias("_df")).where(F.col("_df") > max_df)
        tok = tok.join(F.broadcast(hot.select("w")), "w", "left_anti")
    sizes = tok.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        tok.alias("a")
        .join(tok.alias("b"), (F.col("a.w") == F.col("b.w")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


# --- MinHash + LSH ---------------------------------------------------------------


def shingle_hashes_expr(shingles: Column) -> Column:
    """One xxhash64 pass over the shingle STRINGS. Keep this in its own
    projection column: the per-permutation minima then re-hash only the
    8-byte base values, so a num_hashes signature costs one string pass +
    num_hashes cheap integer passes instead of num_hashes string passes.
    (Integer mixing a_i*h+b_i would be cheaper still, but Spark 4 runs
    ANSI mode by default and a wrapping multiply throws on overflow.)"""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def minhash_signature_expr(hashes: Column, num_hashes: int) -> Column:
    """array<long> of per-permutation minima over pre-hashed shingles
    (``shingle_hashes_expr``) — pure Catalyst, codegen."""

    def hasher(seed: int):
        # NB: must be an arity-1 lambda — F.transform treats a 2-arg lambda
        # as (element, index) and would silently pass the array index
        return lambda h: F.xxhash64(F.lit(seed), h)

    mins = [F.array_min(F.transform(hashes, hasher(i))) for i in range(num_hashes)]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.6,
) -> DataFrame:
    """Candidate near-dup pairs: shingle -> minhash -> band -> bucket join,
    optionally verified with exact shingle Jaccard.

    rows(band) = num_hashes/bands; two docs collide if any band matches.
    The bucket join is an equi-join on (band_idx, band_hash) — shuffles
    only signature rows, never full documents.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles_expr(F.col(text_col), shingle_n).alias("sh"),
    ).where(F.size("sh") > 0)
    # the shingle scan feeds three subtrees (signatures and both verify
    # sides); ending it in an explicit hash exchange lets Catalyst's
    # ReuseExchange compute it ONCE instead of three times (measured 2x
    # end-to-end on the sf0.1 documents table)
    base = base.repartition(F.col("id"))
    # base-hash in its OWN projection so CollapseProject cannot inline the
    # string pass into all num_hashes permutation minima
    sig = base.withColumn("_h", shingle_hashes_expr(F.col("sh"))).withColumn(
        "sig", minhash_signature_expr(F.col("_h"), num_hashes)
    )

    band_arr = F.array(
        *[
            F.xxhash64(F.lit(b), F.concat_ws(",", F.transform(
                F.slice("sig", b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")
            )))
            for b in range(bands)
        ]
    )
    buckets = sig.select("id", F.posexplode(band_arr).alias("band", "bucket"))
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= verify_threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def minhash_dedup(df: DataFrame, id_col: str = "doc_id", **kwargs) -> DataFrame:
    """Suppress every doc that has a near-duplicate with a smaller id."""
    pairs = minhash_lsh_pairs(df, id_col=id_col, **kwargs)
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dupes, id_col, "left_anti")


# --- embedding-cosine near-dup ----------------------------------------------------


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int | None = None,
    exact: bool = False,
    seed: int = 7,
) -> DataFrame:
    """(id_a < id_b, cosine) pairs with cosine >= threshold.

    ``exact=True``: full self-join (the small-data / oracle path).
    Default: multi-table hyperplane-LSH candidate buckets + exact cosine
    re-check — the scale path; the bucket join shuffles signatures, not
    vectors, and recall follows the standard 1-(1-p^k)^L curve.
    """
    from osmgraft.operators.simsearch import cosine_expr, lsh_signature_udf

    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if exact:
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            raise ValueError("dim required for the LSH path")
        sigs = [lsh_signature_udf(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]

        # bucket-join on (id, table, bucket) only — vectors would otherwise
        # ride the posexplode x n_tables exchange (~8x amplification at
        # dim~1k); they are re-joined once, by id, after pair dedup.
        def bucketed(df: DataFrame, vec: str, idc: str) -> DataFrame:
            tables = F.array(*[s(F.col(vec)) for s in sigs])
            return df.select(idc, F.posexplode(tables).alias("_t", "_b"))

        cand = (
            bucketed(a, "_va", "id_a")
            .join(bucketed(b, "_vb", "id_b"), ["_t", "_b"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
            .join(a, "id_a")
            .join(b, "id_b")
        )
    out = cand.withColumn("cosine", cosine_expr(F.col("_va"), F.col("_vb"))).where(
        F.col("cosine") >= threshold
    )
    return out.select("id_a", "id_b", "cosine")


def embedding_dedup(
    embeddings: DataFrame, threshold: float, id_col: str = "vec_id", **kwargs
) -> DataFrame:
    """Suppress every vector having a near-duplicate with a smaller id."""
    pairs = embedding_dup_pairs(embeddings, threshold, id_col=id_col, **kwargs)
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return embeddings.join(dupes, id_col, "left_anti")


# --- SimHash ----------------------------------------------------------------------


def simhash_expr(text: Column) -> Column:
    """text -> 64-bit SimHash, the SCALE path: tokens are hashed JVM-side
    (``transform(tokens, xxhash64)`` — one cheap integer hash per token,
    never Python), and only the 8-byte hash arrays cross Arrow into a
    fully-vectorized numpy majority vote (flatten the batch, one bit
    matrix, ``np.add.reduceat`` segment sums — no per-row or per-token
    Python). Token-less (empty/whitespace/NULL) text folds to signature 0,
    matching :func:`simhash_udf`.

    Shape chosen by measurement (500k x 20-token docs, local[8]):
    - per-token Python md5 kernel (the oracle config):        7.6 s
    - pure-Catalyst ``aggregate``/``zip_with`` vote:         22 s
      (higher-order functions evaluate INTERPRETED, not codegen)
    - explode + 64-column codegen hash aggregate:             5.6 s
      but shuffles ~520 B/doc of vote partials — a non-starter at
      10^12 docs
    - this hybrid (JVM hash + Arrow numpy vote):              4.7 s,
      shuffle-free, 8 B/token across Arrow.

    Different hash family than the md5 kernel by design: the md5 kernel
    exists only because DuckDB replays it bit-exactly
    (``md5_number_lower``) for the correctness oracle."""
    toks = F.filter(tokens_expr(text), lambda w: w != F.lit(""))
    hs = F.transform(toks, lambda w: F.xxhash64(w))

    @F.pandas_udf("long")
    def _vote(h: pd.Series) -> pd.Series:
        lens = h.map(len, na_action="ignore").fillna(0).to_numpy(dtype=np.int64)
        out = np.zeros(len(h), dtype=np.uint64)
        if lens.sum() == 0:
            return pd.Series(out.view(np.int64))
        flat = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in h if x is not None and len(x)]
        ).view(np.uint64)
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int32
        )
        starts = np.zeros(len(h) + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        nonempty = lens > 0
        # starts[:-1][nonempty] is strictly increasing (every kept segment
        # is non-empty), so reduceat sums exactly one doc per output row
        seg = np.add.reduceat(bits, starts[:-1][nonempty], axis=0)
        votes = 2 * seg - lens[nonempty][:, None]
        out[nonempty] = (
            (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        ).sum(axis=1, dtype=np.uint64)
        return pd.Series(out.view(np.int64))

    return _vote(hs)


def simhash_udf():
    """text -> 64-bit SimHash (majority vote of token-hash bits), numpy
    vectorized per Arrow batch."""

    import hashlib

    def h64(w: str) -> int:
        # deterministic across processes (builtin hash() is salted!), and
        # chosen to equal DuckDB's md5_number_lower(w) — bytes 8..16 of the
        # md5 digest, little-endian — so the whole SimHash pipeline is
        # SQL-replicable for the correctness oracle
        return int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")

    @F.pandas_udf("long")
    def _simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            # str.split() never yields '' tokens; the SQL oracle filters
            # w <> '' to match, and both sides give token-less (empty /
            # whitespace-only) documents signature 0
            toks = (t or "").split()
            if not toks:
                continue
            hs = np.array([h64(w) for w in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig.view(np.int64))
        return pd.Series(out)

    return _simhash


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    prefix_bits: int = 16,
    n_tables: int = 4,
    signature: str = "catalyst",
) -> DataFrame:
    """Near-dup pairs by SimHash: multi-probe prefix tables + exact
    Hamming verification.

    A single prefix table misses every pair whose differing bits hit the
    prefix. Standard multi-probe: ``n_tables`` rotations of the signature
    (rotate-left by t*64/n_tables), each bucketed on its top
    ``prefix_bits`` bits — a pair is a candidate if ANY rotation moves all
    differing bits out of the prefix. With max_hamming << 64 the differing
    bits cluster in <= max_hamming positions, so some rotation usually
    clears them. The bucket join carries (id, sig, table, bucket) only;
    sig is one long, and the exact ``bit_count(xor)`` verify runs in
    codegen.

    ``signature``: ``'catalyst'`` (default) computes signatures with
    :func:`simhash_expr` — pure codegen, the 100-TB path. ``'md5'`` uses
    the per-token-md5 Arrow kernel whose hash DuckDB can replay bit-
    exactly (the correctness-oracle configuration ONLY; an order of
    magnitude slower on the signature pass)."""
    if signature == "catalyst":
        sig_col = simhash_expr(F.col(text_col))
    elif signature == "md5":
        sig_col = simhash_udf()(F.col(text_col))
    else:
        raise ValueError(f"unknown signature kind {signature!r}")
    sig = df.select(F.col(id_col).alias("id"), sig_col.alias("sig"))

    def rotl(c, k: int):
        if k == 0:
            return c
        return F.shiftleft(c, k).bitwiseOR(F.shiftrightunsigned(c, 64 - k))

    buckets = F.array(
        *[
            F.shiftrightunsigned(rotl(F.col("sig"), (64 * t) // n_tables), 64 - prefix_bits)
            for t in range(n_tables)
        ]
    )
    exp = sig.select("id", "sig", F.posexplode(buckets).alias("_t", "_b"))
    pairs = (
        exp.alias("a")
        .join(
            exp.alias("b"),
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._b") == F.col("b._b"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.col("a.sig").alias("_sa"), F.col("b.sig").alias("_sb"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")

# --- connected components / canonical survivors -------------------------------


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
    mins = mins.select("u", F.least(F.col("_mv"), F.col("u")).alias("_m"))
    # no distinct here: duplicate edges within a round are absorbed by
    # small-star's min-agg and deduped by ITS distinct — one less shuffle
    # per round, and multiplicity cannot compound across rounds
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u) to the minimum."""
    canon = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    )
    mins = canon.groupBy("u").agg(F.min("v").alias("_m"))
    members = (
        canon.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    roots = mins.select("u", F.col("_m").alias("v"))
    return members.unionByName(roots).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components over a pair list -> (id, component) with
    component = the minimum id reachable from ``id``.

    The alternating large-star / small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): each round
    is two groupBy-min shuffles plus two co-partitioned joins on the same
    key, and the edge set provably converges to min-rooted stars in
    O(log n) rounds — this is the scale path for turning near-dup PAIRS
    (MinHash/SimHash/Jaccard/embedding output) into dedup CLUSTERS, where
    naive label propagation needs O(graph diameter) rounds and a
    driver-side union-find needs the whole edge set on one machine.

    Per round the edge frame is eagerly localCheckpoint-ed: lineage stays
    O(1) deep instead of O(rounds), and the convergence probe (count +
    order-independent xxhash64 checksum) reuses the materialized result.
    Works for integer or string ids (component = lexicographic min for
    strings, matching SQL ``min``). Self-pairs are ignored; isolated
    documents never appear in ``pairs`` and are their own component —
    :func:`dedup_survivors` handles them with a left join.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    prev: tuple | None = None
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cnt, chk = edges.agg(
            F.count(F.lit(1)),
            # decimal sum: an order-independent checksum that cannot hit
            # ANSI long overflow no matter how many edges
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")),
        ).first()
        if (cnt, chk) == prev:
            break
        prev = (cnt, chk)
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    return members.unionByName(roots).distinct()


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Annotate ``df`` with its dedup ``component`` and ``is_canonical``
    (True on the one minimum-id survivor per near-dup cluster; documents
    in no pair are their own singleton component). Filter on
    ``is_canonical`` to materialize the deduplicated corpus."""
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed("id", id_col)
    out = df.join(comp, id_col, "left")
    out = out.withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    return out.withColumn("is_canonical", F.col(id_col) == F.col("component"))


# --- exact duplicated-substring spans -----------------------------------------


def _positional_grams_expr(words: Column, n: int) -> Column:
    """Word n-grams ALIGNED TO POSITION: element i is the space-joined gram
    ``words[i..i+n-1]``, NULL where fewer than n words remain. Same
    zip_with chain as :func:`word_shingles_expr` (O(n_words) per width)
    but without the distinct/compaction — position survives as the array
    index, recovered downstream by ``posexplode``."""
    if n == 1:
        return words
    size = F.size(words)
    acc = words
    for k in range(1, n):
        wk = F.slice(words, k + 1, F.greatest(size - k, F.lit(0)))
        if k < n - 1:
            acc = F.zip_with(acc, wk, lambda a, b: F.concat_ws(" ", a, b))
        else:
            acc = F.zip_with(
                acc, wk, lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b))
            )
    return acc


def dup_spans(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Exact duplicated-substring spans: per document, the MAXIMAL word
    intervals in which every length-``n`` word gram also occurs in at
    least ``min_docs`` distinct documents.

    This is the substring-level dedup modality (the suffix-array exact
    substring dedup of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better" — public), re-expressed for a scan
    engine: a shared passage of m >= n words is exactly a run of m-n+1
    consecutive duplicated n-grams, so maximal duplicated spans fall out
    of a gaps-and-islands merge over each document's duplicated gram
    positions — no suffix array, no global structure:

    1. positional n-grams per doc (one Catalyst pass, zip_with chain);
    2. ONE shuffle keyed on the gram hash computes each gram's distinct
       document count (partial aggregation applies — this is the corpus
       token stream, the floor any exact method pays);
    3. duplicated grams semi-join back (co-partitioned on the same hash);
    4. per-doc interval merge: ``pos - row_number()`` islands under a
       window PARTITIONED BY doc — no global sort, no driver data.

    Grams travel as hashes, not strings: ``gram_hash='xxhash64'``
    (default — the scale path: an 8-byte codegen long through the
    shuffle vs a 32-char hex string; measured ~1.2x faster end-to-end
    at sf0.1 local[32], and the width gap compounds once the gram
    exchange spills at real scale)
    or ``'md5'``, which any engine replays bit-for-bit (the DuckDB
    correctness oracle passes it explicitly, same convention as
    ``jaccard_pairs(max_df=None)``). A false gram-collision would need
    a 64-bit (resp. 128-bit) hash collision — ~1e-9 at 10^9 grams
    (resp. negligible).

    Returns ``(id_col, start_word, end_word, span_words)``, start/end
    0-based inclusive word positions. Documents shorter than ``n`` words
    contain no n-gram and never emit a span. Shared passages that OVERLAP
    within one document merge into one span (their duplicated gram
    positions are consecutive); back-to-back passages stay separate
    because the grams crossing their boundary are unique to this document
    (the two spans tile the copied region — "how much is copied"
    accounting sums span_words either way).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col), _positional_grams_expr(tokens_expr(F.col(text_col)), n).alias("_g")
    )
    hasher = F.md5 if gram_hash == "md5" else F.xxhash64
    grams = (
        base.select(F.col(id_col), F.posexplode("_g").alias("pos", "gram"))
        .where(F.col("gram").isNotNull())
        .select(F.col(id_col), "pos", hasher(F.col("gram")).alias("gh"))
    )
    if min_docs == 2:
        # "at least 2 distinct docs" == min(id) != max(id): a plain min/max
        # partial aggregate instead of countDistinct's two-phase distinct
        # expansion — same shuffle key, strictly less state per gram
        dup = (
            grams.groupBy("gh")
            .agg(F.min(id_col).alias("_a"), F.max(id_col).alias("_b"))
            .where(F.col("_a") != F.col("_b"))
            .select("gh")
        )
    else:
        dup = (
            grams.groupBy("gh")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .where(F.col("_nd") >= min_docs)
            .select("gh")
        )
    hits = grams.join(dup, "gh", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = hits.withColumn("_grp", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("start_word"),
            (F.max("pos") + F.lit(n - 1)).alias("end_word"),
        )
        .select(
            F.col(id_col),
            "start_word",
            "end_word",
            (F.col("end_word") - F.col("start_word") + 1).alias("span_words"),
        )
    )
