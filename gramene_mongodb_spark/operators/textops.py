"""Text analysis operators for training-data pipelines.

Extension surface (BASELINE.json north_star): language ID, quality
scoring, token counting, fingerprinting — all pure column expressions
(JVM-side, codegen'd; zero Python in the hot path), so they run at scan
speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword lists for the n-gram/stopword language heuristic;
# deterministic and dependency-free (a real deployment would swap in
# fastText lid — the operator shape is identical: score per language, argmax)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "para"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "nicht"],
}


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(text)), r"[^\p{L}\p{N}']+"), lambda t: t != ""
    )


def token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Token counting + basic shape stats.

    Adds: n_chars_calc, n_tokens (whitespace/punct split), n_alpha_tokens
    (BPE-ish word regex), avg_token_len, punct_ratio.
    """
    toks = _tokens(F.col(text))
    bpe_ish = F.filter(
        F.split(F.col(text), r"\s+"),
        lambda t: t.rlike(r"^[A-Za-z']+$"),
    )
    n_punct = F.length(F.regexp_replace(F.col(text), r"[^\p{Punct}]", ""))
    return (
        df.withColumn("n_chars_calc", F.length(F.col(text)))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("n_alpha_tokens", F.size(bpe_ish))
        .withColumn(
            "avg_token_len",
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t).cast("double")),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                F.length(F.col(text)) > 0,
                n_punct.cast("double") / F.length(F.col(text)),
            ).otherwise(F.lit(0.0)),
        )
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1] — the Gopher/C4-style shape:
    penalize too-short/too-long docs, high punctuation density, low
    stopword ratio, low mean word length.

    Weights are fixed and documented so the score is deterministic and
    oracle-checkable; a production pipeline would tune them.
    """
    sdf = token_stats(df, text)
    toks = _tokens(F.col(text))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.when(
        F.size(toks) > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))).cast("double")
        / F.size(toks),
    ).otherwise(F.lit(0.0))
    len_score = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.3)
    punct_score = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.4)
    stop_score = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.5)
    wordlen_score = F.when(
        (F.col("avg_token_len") >= 2.5) & (F.col("avg_token_len") <= 12.0), 1.0
    ).otherwise(0.5)
    return sdf.withColumn("stopword_ratio", stop_ratio).withColumn(
        "quality",
        (len_score * 0.4 + punct_score * 0.2 + stop_score * 0.2 + wordlen_score * 0.2),
    )


def language_id(df: DataFrame, text: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-overlap language heuristic: score = fraction of tokens in
    each language's stopword list; argmax with deterministic tie-break on
    language code; 'und' when no stopwords hit.

    Shape-compatible with a real lid model (score-per-class → argmax);
    swap the scorer, keep the plan.
    """
    toks = _tokens(F.col(text))
    scores = []
    for lang in sorted(STOPWORDS):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                (-F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))).alias(
                    "neg_hits"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    # struct sort is lexicographic: ascending (neg_hits, lang) puts the
    # highest hit count first and breaks ties on alphabetical language code
    best = F.sort_array(F.array(*scores), asc=True)[0]
    return df.withColumn(
        out, F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))
    )
