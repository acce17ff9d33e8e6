"""Text analysis for training-data curation — all pure Catalyst (every
expression here also exists in ANSI/DuckDB SQL, so each operator is
oracle-checkable value-for-value).

- token counting: whitespace tokens + a BPE-ish regex token count
- quality scoring: length / punctuation / stopword / alpha ratios
- language id: stopword-hit heuristic over a small per-language table
- document fingerprint: md5 of whitespace-normalized lowercased text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
DE_STOP = ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "ich")
FR_STOP = ("le", "la", "les", "et", "un", "une", "est", "que", "pour", "dans")

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def regex_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def _stop_hits(words: Column, stops: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*[F.lit(s) for s in stops])))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features; downstream filters threshold these."""
    text = F.col(text_col)
    words = F.split(F.trim(F.lower(text)), r"\s+")
    n_chars = F.length(text)
    n_words = F.size(words)
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    n_alpha = F.regexp_count(text, F.lit(r"[A-Za-z]"))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        regex_token_count(text).alias("n_tokens"),
        (n_chars / n_words).alias("avg_word_len"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        (_stop_hits(words, EN_STOP) / n_words).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram-free heuristic language id: argmax of stopword hits with a
    deterministic tie order (en > de > fr > unknown).

    The split is materialized ONCE in a lower projection (`_w`): Catalyst's
    CollapseProject will not inline a non-cheap alias referenced more than
    once, so the three counters share a single regex-split pass instead of
    re-splitting per counter (subexpression elimination does not reliably
    dedupe higher-order-function trees)."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), words.alias("_w"))
    w = F.col("_w")
    en = _stop_hits(w, EN_STOP)
    de = _stop_hits(w, DE_STOP)
    fr = _stop_hits(w, FR_STOP)
    lang = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return base.select(F.col(id_col), en.alias("en_hits"), de.alias("de_hits"), fr.alias("fr_hits"), lang.alias("lang_guess"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable content fingerprint: md5 over lowercased, whitespace-collapsed
    text (same value in any engine)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """The curation filter composed from the features (kept as one Catalyst
    predicate so it pushes into the scan where possible)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_words = F.size(F.split(F.trim(text), r"\s+"))
    return df.where(
        (n_words >= min_words)
        & ((F.regexp_count(text, F.lit(r"[^\w\s]")) / n_chars) <= max_punct_ratio)
        & ((F.regexp_count(text, F.lit(r"[A-Za-z]")) / n_chars) >= min_alpha_ratio)
    )
