"""Text-analysis queries over ``documents`` (SURVEY.md §7 M6:
token counting, quality scoring, language-ID, fingerprinting).

All scan-local (no shuffle except the final tiny aggregation), pure
Catalyst expressions — the 100 TB shape is "one pass over the corpus,
columnar in, columnar out".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    fingerprint,
    lang_guess,
    punct_ratio,
    stopword_ratio,
    tokens,
)
from ..registry import register
from ..tables import load

_STOPLIST_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '\\w+'))) AS BIGINT)
             AS n_distinct_tokens,
           ROUND(len(list_distinct(regexp_extract_all(text, '\\w+')))
                 / len(regexp_extract_all(text, '\\w+')), 6) AS ttr,
           CAST(len(list_filter(regexp_extract_all(text, '\\w+'),
                                t -> lower(t) IN {_STOPLIST_SQL})) AS BIGINT)
             AS n_stopwords
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type-token ratio + stopword counts per doc."""
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        F.size(
            F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
        ).cast("long").alias("n_stopwords"),
    )


@register(
    "text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             len(regexp_extract_all(text, '\\w+')) AS n_tok,
             (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
               / CAST(length(text) AS DOUBLE) AS p_ratio,
             len(list_filter(regexp_extract_all(text, '\\w+'),
                             x -> lower(x) IN {_STOPLIST_SQL}))
               / CAST(len(regexp_extract_all(text, '\\w+')) AS DOUBLE) AS s_ratio
      FROM documents
    )
    SELECT doc_id,
           ROUND(p_ratio, 6) AS punct_ratio,
           ROUND(s_ratio, 6) AS stopword_ratio,
           ROUND(0.4 * least(n_tok / 100.0, 1.0)
                 + 0.3 * (1 - p_ratio) + 0.3 * (1 - s_ratio), 6) AS quality
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring (length/punctuation/stopword mix).

    Single-pass shape: the tokenizer/regex intermediates are computed
    once in a first projection and combined in a second (the naive
    form re-runs regexp_extract_all four times per row)."""
    d = load(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id",
        tokens(F.col("text")).alias("toks"),  # one regexp pass
        punct_ratio(F.col("text")).alias("p_ratio"),
    )
    base = toked.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        "p_ratio",
        (
            F.size(F.filter("toks", lambda t: F.lower(t).isin(*STOPWORDS)))
            / F.size("toks")
        ).alias("s_ratio"),
    )
    return base.select(
        "doc_id",
        F.round(F.col("p_ratio"), 6).alias("punct_ratio"),
        F.round(F.col("s_ratio"), 6).alias("stopword_ratio"),
        F.round(
            0.4 * F.least(F.col("n_tok") / F.lit(100.0), F.lit(1.0))
            + 0.3 * (1 - F.col("p_ratio"))
            + 0.3 * (1 - F.col("s_ratio")),
            6,
        ).alias("quality"),
    )


@register(
    "text_langid",
    r"""
    WITH g AS (
      SELECT lang,
             CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
                  WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
                  WHEN regexp_matches(text, '[äöüß]') THEN 'de'
                  WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
                  WHEN regexp_matches(text, '[àâçèêëîïôùû]') THEN 'fr'
                  ELSE 'en' END AS lang_pred
      FROM documents
    )
    SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM g GROUP BY lang, lang_pred
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled ``lang`` column (confusion
    counts). The fixture text is ASCII so the heuristic degenerates to
    'en' — the operator (and its oracle twin) is what's under test."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_guess(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# GPT-2-style pretokenizer, minus the \s+(?!\S) lookahead (RE2 —
# DuckDB's engine — has no lookahead; the difference only moves which
# side of a space run a token claims). Single-quote escaped for SQL.
_BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


@register(
    "text_bpe_token_estimate",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens_chars4,
           ROUND(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))
                 / CAST(len(regexp_extract_all(text, '\\w+')) AS DOUBLE), 6)
             AS pieces_per_word
    FROM documents
    """,
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation: a BPE-ish pretokenizer piece count
    (the GPT-2 split pattern) alongside the chars/4 rule of thumb —
    the two estimators pipelines use to budget context windows before
    a real tokenizer runs. Pure regex expressions, scan-local."""
    d = load(spark, sf_dir, "documents")
    words = tokens(F.col("text"))
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("est_tokens_chars4"),
        F.round(F.size(pieces) / F.size(words).cast("double"), 6)
          .alias("pieces_per_word"),
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                   '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form md5 fingerprint per document (dedup key)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
