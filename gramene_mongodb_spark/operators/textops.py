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


def _spread(df: DataFrame) -> DataFrame:
    """Spread a compacted input before a compute-heavy pass: repartition
    to defaultParallelism ONLY when the input has fewer partitions (the
    SCALE.md single-split plan-collapse rule). A well-partitioned input
    passes through untouched — unconditionally repartitioning would
    force a full shuffle on every call and could REDUCE parallelism
    when a cluster input already carries more splits than
    defaultParallelism."""
    p = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(p) if df.rdd.getNumPartitions() < p else df


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


def classifier_score(
    df: DataFrame,
    text: str = "text",
    dim: int = 64,
    bias: int = 0,
    weights: dict[int, int] | None = None,
    out: str = "clf_score",
) -> DataFrame:
    """fastText/DCLM-style linear quality classifier SERVING — the
    model-based filtering stage of a pretraining-data pipeline
    (``quality_score`` above is the heuristic stage; this is the learned
    stage's inference shape).

    Features are the hashing trick: token → ``md5_31(token) mod dim``
    (collisions are part of the model, exactly as in fastText's hashed
    n-gram buckets). Weights are an integer vector indexed by bucket:
    pass ``weights`` (bucket → int coefficient, scaled from a trained
    model) or take the default deterministic fixture
    ``w(b) = (b·2654435761 + 99991) mod 1997 − 998`` standing in for
    trained coefficients. Either way the vector enters the plan as a
    literal (a trained vector of any realistic ``dim`` is broadcast
    size), so the per-row score is ONE map-side
    ``aggregate(transform(tokens, w∘hash))`` expression — no shuffle, no
    UDF, no join; at 100 TB this runs at scan speed inside whole-stage
    codegen, which is why serving a linear classifier this way beats
    shipping tokens to Python by orders of magnitude.

    Integer weights keep the score exact across engines — the catalog
    oracle replays hash, weight formula and sum in portable SQL.
    Emits ``out`` (bias + Σ w[h(t)] over the token BAG — duplicates
    count, bag-of-words semantics) and ``{out}_n_tokens``.
    """
    from gramene_mongodb_spark.operators.dedup import _md5_base31

    toks = _tokens(F.col(text))
    bucket = lambda t: _md5_base31(t) % dim  # noqa: E731

    if weights is None:
        wexpr = (
            lambda t: (bucket(t) * F.lit(2654435761) + F.lit(99991)) % 1997 - 998
        )
    else:
        wmap = F.create_map(
            *[F.lit(x) for bw in sorted(weights.items()) for x in bw]
        )
        wexpr = lambda t: F.coalesce(  # noqa: E731
            wmap[bucket(t)].cast("long"), F.lit(0).cast("long")
        )

    score = F.aggregate(
        F.transform(toks, wexpr),
        F.lit(bias).cast("long"),
        lambda acc, v: acc + v,
    )
    return df.withColumn(out, score).withColumn(
        f"{out}_n_tokens", F.size(toks).cast("long")
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


def boilerplate_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate detection: word n-grams that recur across
    ≥ ``min_docs`` distinct documents (the repeated-passage signal behind
    C4/RefinedWeb-style line-level dedup — navigation chrome, license
    headers, templated spans).

    Output: (gram, df) — the boilerplate list is the broadcast side of a
    subsequent removal pass.  Plain space tokenization so the result is
    engine-checkable; the heavier normalized shingler (`dedup.shingle_arrays`)
    feeds the similarity joins instead.

    Scale: grams are deduped per-doc BEFORE the explode (array_distinct),
    so the shuffle carries one row per (doc, distinct gram); the
    doc-frequency agg is map-side combinable and the ≥min_docs filter
    drops the long unique tail before any downstream join.
    """
    toks = F.split(F.col(text), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )
    return (
        exploded.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") >= min_docs)
    )


#: simple audit patterns — a corpus-safety smoke check, not a PII system
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
    "ssn_like": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_scan(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-document counts of PII-looking spans (email/phone/SSN-like) —
    the audit pass a training pipeline runs before release.  Pure JVM
    regexp_count expressions (no Python), one column per pattern plus a
    total.  The pattern set is intentionally small and auditable; swap
    in a real PII model behind the same column contract.
    """
    out = df
    total = F.lit(0)
    for name, pat in sorted(PII_PATTERNS.items()):
        col = F.regexp_count(F.col(text), F.lit(pat)).cast("long")
        out = out.withColumn(f"n_{name}", col)
        total = total + F.col(f"n_{name}")
    return out.withColumn("n_pii_total", total.cast("long"))


#: replacement placeholders for ``pii_redact`` — applied in sorted
#: pattern-name order on both engine and oracle sides, so overlapping
#: hits resolve identically everywhere
PII_PLACEHOLDERS = {
    "email": "[EMAIL]",
    "phone": "[PHONE]",
    "ssn_like": "[SSN]",
}


def pii_redact(
    df: DataFrame, text: str = "text", out: str = "text_redacted"
) -> DataFrame:
    """Redaction companion to ``pii_scan``: replace every PII-looking
    span with its typed placeholder (``[EMAIL]``/``[PHONE]``/``[SSN]``)
    — the release-gate transform a training pipeline runs after the
    audit pass. Patterns apply in sorted name order (email, phone,
    ssn_like), each as one global JVM ``regexp_replace`` — fully
    codegen'd, no Python, no shuffle. Adds ``out`` plus
    ``n_redactions``.

    Counting semantics, stated precisely: ``n_redactions`` counts each
    pattern against the PROGRESSIVELY-REDACTED text (pattern k sees
    earlier placeholders), i.e. it is the number of replacements this
    function actually performed. That is deliberately NOT the same
    number as ``pii_scan``'s ``n_pii_total``, which counts every
    pattern against the ORIGINAL text — when patterns overlap (digits
    consumed by an earlier replacement), scan can report more hits
    than redact performs. The oracle replays the same sequential
    chain, so the differential pins these semantics."""
    col = F.col(text)
    total = F.lit(0)
    for name, pat in sorted(PII_PATTERNS.items()):
        total = total + F.regexp_count(col, F.lit(pat))
        col = F.regexp_replace(col, pat, PII_PLACEHOLDERS[name])
    return df.withColumn(out, col).withColumn(
        "n_redactions", total.cast("long")
    )


#: phrases whose presence disqualifies a line (C4's policy/boilerplate
#: list, Raffel et al. 2020 §2.2 — lowercase containment test)
LINE_BLACKLIST = (
    "javascript",
    "lorem ipsum",
    "cookie policy",
    "terms of use",
    "privacy policy",
    "click here",
)

#: terminal punctuation a keepable line must end with (C4 rule)
_TERMINAL_RE = r'[.!?"”]$'


#: Entity decode table for html_extract — applied in order, with &amp;
#: LAST so "&amp;lt;" decodes to "&lt;" (one level), never to "<".
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

#: Tags whose boundaries break text flow — converted to newlines so the
#: C4 line rules (line_filter) see the document's visual line structure.
_HTML_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote|pre"
    "|section|article|header|footer|nav|aside|form"
)


def html_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    html: str = "html",
    out: str = "text",
) -> DataFrame:
    """HTML/markup → text extraction — the stage every web-scale corpus
    pipeline starts with (C4/CCNet begin at WET/WARC markup, not clean
    prose). JVM regexp expressions only, in a fixed order:

    1. ``<script>``/``<style>`` elements vanish WITH their contents
       (code and CSS are not prose); HTML comments vanish;
    2. block-level tag boundaries become newlines, so downstream
       line-level rules (:func:`line_filter`) operate on the page's
       visual lines;
    3. remaining tags strip to a space (inline markup must not glue
       words together);
    4. the common named/numeric entities decode, ``&amp;`` last so
       double-encoded entities decode exactly one level;
    5. horizontal whitespace collapses per line; blank lines drop;
       the doc reassembles as newline-joined trimmed lines.

    Every pattern is RE2-compatible (no backreferences, inline ``(?is)``
    flags only) so a SQL oracle replays the transform verbatim.

    Output: ``(id, out, n_lines)`` where ``n_lines`` counts surviving
    (non-blank) lines. Map-side only — no shuffle, no UDF: at 100 TB
    this rides the scan like line_filter does.
    """
    s = F.regexp_replace(
        F.col(html), r"(?is)<script\b[^>]*>.*?</script\s*>", " "
    )
    s = F.regexp_replace(s, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, rf"(?is)</?(?:{_HTML_BLOCK_TAGS})\b[^>]*>", "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        s = F.regexp_replace(s, ent, ch)
    s = F.regexp_replace(s, r"[^\S\n]+", " ")
    lines = F.filter(
        F.transform(F.split(s, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return df.select(
        F.col(id_col),
        F.array_join(lines, "\n").alias(out),
        F.size(lines).cast("long").alias("n_lines"),
    )


def line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_words: int = 3,
    blacklist: tuple[str, ...] = LINE_BLACKLIST,
) -> DataFrame:
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): split on
    newlines and keep only lines that (a) end in terminal punctuation,
    (b) have ≥ ``min_words`` whitespace words, and (c) contain no
    blacklisted phrase (lowercase containment); reassemble the doc from
    surviving lines in order. The sub-document counterpart of the
    span/doc dedup passes — boilerplate navigation, cookie banners and
    truncated fragments vanish while prose survives.

    Pure higher-order column expressions (split → filter → array_join):
    map-side only, no shuffle, no UDF — at 100 TB this is a free pass
    over the scan. Output: id, n_lines, n_kept, text_clean (docs with
    zero surviving lines keep an empty string — drop downstream)."""
    lines = F.split(F.col(text), r"\n")
    # NB: an explicit lambda — transform() passes (element, index) to a
    # two-parameter callable, and F.trim's optional second parameter
    # would silently receive the index as its trim-character set
    trimmed = F.transform(lines, lambda x: F.trim(x))

    def keep(line):
        lw = F.lower(line)
        ok = line.rlike(_TERMINAL_RE) & (
            F.size(F.filter(F.split(line, r"\s+"), lambda w: w != "")) >= min_words
        )
        for phrase in blacklist:
            ok = ok & ~lw.contains(phrase.lower())
        return ok

    kept = F.filter(trimmed, keep)
    return df.select(
        F.col(id_col),
        F.size(trimmed).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("text_clean"),
    )


def boilerplate_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate fraction: of a doc's word n-gram
    positions, how many hit the corpus boilerplate list
    (``boilerplate_shingles``) — the scoring half of repeated-passage
    cleaning (filter or down-weight docs above a threshold).

    Two-pass corpus analytics in one lazy plan: pass 1 builds the
    boilerplate list (doc-frequency agg), pass 2 re-streams the gram
    positions against it.  Docs shorter than ``n`` tokens have no grams
    and are absent from the output (nothing to score).

    Scale: the boilerplate list is the ≥min_docs head of the gram
    distribution — small, so the pass-2 join broadcasts; gram positions
    never shuffle.
    """
    from pyspark.sql import functions as F2

    # spread before the gram construction — both passes are byte-cheap
    # but compute-heavy, so a 1-split input serializes them (SCALE.md
    # plan-collapse rule; 3.7 → 1.5 s at sf0.1)
    df = _spread(df)
    toks = F.split(F.col(text), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    positions = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    bp = boilerplate_shingles(df, id_col, text, n=n, min_docs=min_docs).select("gram")
    return (
        positions.join(
            F2.broadcast(bp.withColumn("__hit", F.lit(1))), "gram", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_bp"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_bp").cast("long").alias("n_bp"),
            F.round(F.col("n_bp") / F.col("n_grams"), 4).alias("bp_ratio"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Context-window chunking — the standard pre-tokenization step of a
    training/RAG pipeline: split each document into whitespace-token
    windows of ``chunk_tokens`` starting every ``stride`` tokens
    (``chunk_tokens − stride`` of overlap carries context across the
    boundary; the final chunk may be shorter).

    Contract: chunk k covers tokens [k·stride, k·stride + chunk_tokens);
    starts are emitted while k·stride < n_tokens, so every token lands in
    ≥1 chunk and chunk_id is reproducible (no content-dependent logic).

    All pure column math (split → sequence → explode → slice/array_join):
    the fan-out happens executor-side at scan speed, no Python, no
    shuffle — at 100 TB this is a map-only stage whose output feeds
    straight into a tokenizer ``mapInPandas``.

    Output: (id, chunk_id, chunk_text, n_tokens) — one row per chunk.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text)), r"\s+")
    n = F.size(F.col("__toks"))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    piece = lambda s: F.slice(F.col("__toks"), s + 1, chunk_tokens)  # noqa: E731
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), F.col("__toks"), F.explode(starts).alias("__start"))
        .select(
            F.col(id_col),
            F.expr(f"__start div {stride}").cast("long").alias("chunk_id"),
            F.array_join(piece(F.col("__start")), " ").alias("chunk_text"),
            F.size(piece(F.col("__start"))).cast("long").alias("n_tokens"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's word
    n-gram positions occupied by its single most-frequent n-gram (high →
    looping/templated text, a standard pre-training removal filter).

    Shape: explode gram positions → count per (doc, gram) → argmax per
    doc as ``min(struct(-cnt, gram))`` — the struct's field-wise order
    makes that "largest count, then lexicographically-smallest gram" in
    ONE hash aggregation (no per-doc sort, no window), and the same pass
    sums the counts into n_grams. Both aggregations partial-aggregate
    map-side; nothing but (doc, gram) partial counts ever shuffles; no
    Python. Docs with fewer than ``n`` tokens emit ratio 0 with a null
    top gram (nothing can repeat).

    Output: (id, n_grams, top_gram, top_gram_count, repetition_ratio).
    """
    toks = F.split(F.trim(F.col(text)), r"\s+")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # spread before the gram construction: a compacted corpus arrives
    # as ~1 parquet split and the O(tokens·n) string building would run
    # single-threaded (x_video_shots plan-collapse family; measured
    # 6.1 → 1.3 s at sf0.1)
    df = _spread(df)
    counts = (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.groupBy(id_col).agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram"))).alias("__top")
    ).select(
        F.col(id_col),
        F.col("__top.gram").alias("top_gram"),
        (-F.col("__top.neg")).alias("top_gram_count"),
    )
    totals = (
        df.select(F.col(id_col), F.size(grams).cast("long").alias("n_grams"))
    )
    return (
        totals.join(top, id_col, "left")
        .select(
            id_col,
            "n_grams",
            "top_gram",
            F.coalesce(F.col("top_gram_count"), F.lit(0)).cast("long").alias(
                "top_gram_count"
            ),
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.coalesce(F.col("top_gram_count"), F.lit(0))
                    / F.col("n_grams"),
                    4,
                ),
            ).otherwise(F.lit(0.0)).alias("repetition_ratio"),
        )
    )


# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

#: query params that never change content — stripped before dedup
_TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for dedup/grouping — the pre-pass every web
    corpus needs before URL-level dedup (the same page arrives as
    ``HTTP://WWW.Site.com/a/?utm_source=x#frag`` and
    ``http://site.com/a``).

    Deterministic, engine-portable, pure JVM expressions (regexp +
    array ops, no UDF, scan-speed over 100 TB):

    1. drop the fragment;
    2. lowercase scheme and host;
    3. strip a leading ``www.`` and the scheme-default port
       (``:80`` http, ``:443`` https);
    4. strip trailing slashes from the path;
    5. drop tracking params (``utm_*``/``fbclid``/``gclid``/…), sort
       the survivors for order-independence, and rejoin.

    Non-URL strings pass through best-effort (no scheme → returned
    trimmed-lowercased-as-host); quarantine is the caller's call.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    qstr = F.array_join(params, "&")
    return F.concat(
        F.when(scheme != "", F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        host,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``url_canon`` next to ``url_col`` (see ``canonical_url``)."""
    return df.withColumn("url_canon", canonical_url(F.col(url_col)))


# --------------------------------------------------------------------------
# TF-IDF top terms
# --------------------------------------------------------------------------

def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic keyword /
    salient-term extraction pass (feeds topic tagging, near-dup triage,
    retrieval indexing).

    Near-engine-portable: idf = ln(N/df) is SCALED to an integer once
    per term (``idf6 = round(idf·1e6)``) and the ranking score is the
    exact integer ``tf·idf6`` — no float summation or comparison in the
    ranking itself. The one residual float is ``ln``: it is not
    guaranteed correctly rounded across libm implementations, so a
    last-ulp difference at a .5 rounding boundary could in principle
    flip ``idf6`` by 1 and perturb a tie (probability ~1e-15 per term;
    the oracle replays the same formula, so in practice they agree).
    Tokenization matches the dedup family (lowercase, split on
    non-alphanumeric runs).

    Scale shape: one explode + two aggregations. The term→df join is a
    plain equi-join on ``term`` — NOT a forced broadcast: at web scale
    the distinct-term table (typos, ids, code tokens) runs to billions
    of rows and must be allowed to shuffle; AQE still broadcasts it when
    it is genuinely small. ``min_df`` prunes the hapax tail before the
    join (a term in fewer than ``min_df`` docs can't be a useful
    keyword and never survives ranking at corpus scale). N rides in a
    one-row broadcast. The big shuffles are the (doc, term) tf
    aggregation and the per-doc top-k window — both keyed, both linear.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " "), r"[^a-z0-9]+"),
        lambda t: t != "",
    )
    terms = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    ndocs = df.agg(F.count(F.lit(1)).alias("__N"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "idf6",
            F.round(F.log(F.col("__N") / F.col("df")) * 1e6).cast("long"),
        )
        .withColumn("score", (F.col("tf") * F.col("idf6")).cast("long"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "rank",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk) + BM25 ranking
# --------------------------------------------------------------------------

def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 16,
    shard_col: Column | None = None,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    step that concatenates documents in a deterministic order and cuts
    the stream every ``budget`` tokens into fixed-size training
    sequences. This computes, per document, WHERE it lands: its shard,
    its token offset within the shard's stream, and the first/last pack
    (context window) it occupies — documents straddle pack boundaries by
    design, exactly like the real pipelines that follow it with a
    tokenizer ``mapInPandas``.

    Determinism + scale shape: a single global concatenation order would
    serialize 100 TB behind one window, so the corpus is salted-hash
    SHARDED first (``shards`` independent streams — the parallel unit),
    and the running token offset is ONE window cumsum per shard. Shard
    assignment and intra-shard order both come from ``md5(salt || id)``
    (content-addressed, so re-runs and engine swaps agree; pass
    ``shard_col`` to override with your own distribution key). All
    arithmetic is integer (offsets, ``div``) — no float surface.

    Output: (id, shard, n_tokens, offset, first_pack, last_pack,
    n_packs) — ``offset`` is tokens before this doc in its shard's
    stream; packs are shard-local indices of ``budget``-token windows.
    """
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    from pyspark.sql import Window

    hx = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        shard_col
        if shard_col is not None
        else F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % shards
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__hx", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(tokens_col).cast("long")
    out = (
        df.select(
            F.col(id_col),
            n.alias("n_tokens"),
            shard.cast("long").alias("shard"),
            hx.alias("__hx"),
        )
        .withColumn("offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("first_pack", F.expr(f"offset div {budget}"))
        .withColumn(
            "last_pack",
            F.expr(
                f"greatest(offset div {budget},"
                f" (offset + n_tokens - 1) div {budget})"
            ),
        )
        .withColumn("n_packs", F.col("last_pack") - F.col("first_pack") + 1)
    )
    return out.drop("__hx")


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text: str = "text",
    k: int = 20,
) -> DataFrame:
    """BM25 top-``k`` retrieval scoring (k1=1.2, b=0.75) — the
    length-normalized upgrade of TF-IDF that every retrieval /
    decontamination / quality-mining pass reaches for.

    Engine-portable by integer-exact construction: with k1=1.2, b=0.75
    the per-term score  idf · tf·(k1+1) / (tf + k1(1−b+b·dl/avgdl))
    multiplied through by 10·avgdl becomes the INTEGER rational

        idf6 · 22·avgdl·tf  div  (10·avgdl·tf + 3·avgdl + 9·dl)

    where ``avgdl = total_tokens div N`` (integer), ``idf6`` is the
    Robertson idf ln((N−df+0.5)/(df+0.5)) scaled to integer micros and
    clamped at 0, and ``div`` is integer division — order-independent,
    no float summation anywhere in scoring or ranking (the one float is
    the idf ``ln``, same residual as ``tfidf_top_terms``). Scores sum
    exactly over query terms; ties break on id.

    Scale shape: the query-term list is a literal filter pushed into the
    explode (the scan keeps only matching tokens), then one (doc, term)
    aggregation, one tiny per-term df aggregate (≤ |query| rows,
    broadcast), and one top-k window — no corpus-wide term table at all,
    unlike TF-IDF keyword extraction.
    """
    from pyspark.sql import Window

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = _tokens(F.col(text))
    # corpus stats: N docs, total tokens, integer avgdl
    stats = df.select(F.size(toks).alias("__dl")).agg(
        F.count(F.lit(1)).alias("__N"),
        F.sum(F.col("__dl").cast("long")).alias("__T"),
    )
    docs = df.select(F.col(id_col), F.explode(toks).alias("term"), F.size(toks).alias("dl"))
    matched = docs.filter(F.col("term").isin(list(query_terms)))
    tf = matched.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__avgdl", F.expr("__T div __N"))
        .withColumn(
            "idf6",
            F.greatest(
                F.lit(0).cast("long"),
                F.round(
                    F.log((F.col("__N") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                    * 1e6
                ).cast("long"),
            ),
        )
        .withColumn(
            "term_score_micro",
            F.expr(
                "(idf6 * 22 * __avgdl * tf) div"
                " (10 * __avgdl * tf + 3 * __avgdl + 9 * dl)"
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("term_score_micro").alias("score_micro"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    # TakeOrdered top-k FIRST (per-partition heads + tiny merge — no
    # global shuffle), then rank the k survivors with a window that is
    # single-partition by construction and trivially small
    top = per_doc.orderBy(F.col("score_micro").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("rank"), F.col(id_col), "score_micro", "n_terms_matched"
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Inverted-index construction: ``term → (df, sorted posting list)``
    — the indexing half of the retrieval pair whose scoring half is
    ``bm25_scores``. Postings are document ids, deduplicated per
    document and sorted ascending, which is the on-disk layout every
    posting-list codec (delta + varint) assumes.

    ``min_df`` drops hapax terms — at web scale the term dictionary is
    Zipf, and hapaxes are most of it while serving no retrieval purpose.

    Scale: explode → per-doc distinct → ONE shuffle on ``term`` with
    map-side partial aggregation; ``collect_set`` keeps each posting
    list on its term's reducer (never the driver). Posting-list skew
    (stopword terms have corpus-sized lists) is real: cap it upstream
    by stopword removal or df-ceiling if needed; here df is unbounded
    because the corpus fits the reducer comfortably at any tested sf.
    """
    terms = (
        df.select(F.col(id_col), F.explode(F.array_distinct(_tokens(F.col(text)))).alias("term"))
    )
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_sort(F.collect_set(F.col(id_col))).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def top_ngrams(
    df: DataFrame,
    text: str = "text",
    n: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide heavy hitters: the ``k`` most frequent word
    ``n``-grams with exact counts — the boilerplate/contamination
    reconnaissance pass (what phrases dominate this crawl?) and the
    exact baseline a count-min sketch would approximate.

    Scale: n-gram explode → ONE shuffle on the gram with map-side
    partial counts (Zipf head grams partially aggregate in every map
    task, so the reducer sees ≤ #partitions rows per gram, not corpus
    rows) → TakeOrdered top-k (per-partition heads + driver-side merge
    of k·#partitions tuples, no global sort shuffle). Ties break on the
    gram text so the result set is deterministic.
    """
    toks = _tokens(F.col(text))
    # the size filter below guarantees sequence() gets a non-descending
    # range (Spark's sequence(0, -1) would DESCEND, not return empty)
    grams = F.expr(
        f"transform(sequence(0, size(__toks) - {n}),"
        f" i -> array_join(slice(__toks, i + 1, {n}), ' '))"
    )
    exploded = (
        df.select(toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(F.explode(grams).alias("gram"))
    )
    counted = exploded.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    top = counted.orderBy(F.col("cnt").desc(), F.col("gram").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "gram", "cnt"
    )


def ngram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the
    perplexity-style quality filter (CCNet's KenLM pass) with the model
    trained on the corpus itself: documents whose bigrams are improbable
    under the corpus distribution (boilerplate soup, lorem-noise,
    wrong-language fragments) score low and get filtered.

    Per bigram (w1, w2): ``nll6 = round(ln((C(w1)+V) / (C(w1,w2)+1))
    · 1e6)`` — add-one-smoothed negative log likelihood over vocabulary
    size V; the integer micro-log trick BM25/TF-IDF already use, so
    scores sum exactly and per-doc means are integer division. NLL is
    kept NON-NEGATIVE deliberately: truncating (Spark ``div``) and floor
    (DuckDB ``//``) division diverge on negative quotients, so a
    log-prob formulation would hash-mismatch on every doc whose sum
    doesn't divide evenly. Per doc: ``avg_nll6 = sum(nll6) //
    n_bigrams`` over bigram OCCURRENCES (repeats count); higher = less
    probable = lower quality. Docs with no bigram are excluded.

    Scale: two count aggregations (bigram, unigram — Zipf-head keys
    partially aggregate map-side), one scalar V, then one equi-join of
    doc-bigram occurrences against the bigram model and a doc-keyed
    aggregation. The model side is corpus-vocabulary-sized — broadcast
    when small, AQE decides otherwise; the corpus is never collected.
    """
    toks = _tokens(F.col(text))
    pairs = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__toks) - 2),"
                    " i -> named_struct('w1', __toks[i], 'w2', __toks[i + 1]))"
                )
            ).alias("bg"),
        )
        .select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bigram_c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    unigram = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = unigram.groupBy().agg(F.count(F.lit(1)).alias("__V"))
    model = (
        bigram_c.join(unigram, bigram_c["w1"] == unigram["w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c1") + F.col("__V")) / (F.col("c12") + 1)) * 1e6
            )
            .cast("long")
            .alias("nll6"),
        )
    )
    return (
        pairs.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("nll6").alias("sum_nll6"),
        )
        .withColumn("avg_nll6", F.expr("sum_nll6 div n_bigrams"))
    )


# --------------------------------------------------------------------------
# heavy hitters: bounded-memory candidate sketch + exact verify
# --------------------------------------------------------------------------

def heavy_hitters(
    df: DataFrame,
    text: str = "text",
    k_den: int = 200,
    capacity: int | None = None,
) -> DataFrame:
    """EXACTLY the tokens whose corpus frequency exceeds ``n/k_den``
    (n = total token count), with exact counts — found without ever
    building a full token frequency table.

    ``top_ngrams`` is the exact groupBy baseline; this is the shape that
    survives when token cardinality overflows aggregation hash tables
    (URLs, ids, typo-space at 100 TB): a per-partition **Misra–Gries**
    summary of bounded ``capacity`` (default ``2·k_den``) proposes
    candidates, then an exact recount over the (tiny, broadcast)
    candidate set verifies. MG guarantee: a token with global freq
    > n/k_den has, in ≥1 partition (pigeonhole), local freq
    > n_p/k_den ≥ n_p/(capacity+1), so it survives that partition's
    summary — the candidate union is a guaranteed superset and the
    final filter makes the answer EXACT, not approximate.

    Plan: one mapInPandas pass over the token stream (vectorized
    value_counts per Arrow batch + MG reduction: subtract the
    (capacity+1)-th largest, drop non-positives — memory is O(capacity)
    regardless of cardinality; partition token totals ride along so no
    separate counting scan), one distinct on the candidate set, one
    broadcast-semi-joined recount (map-side combinable, reducer sees
    only candidate tokens). No full-cardinality shuffle anywhere.

    Output: (token, cnt) for every token with cnt·k_den > n.
    """
    import pandas as pd

    cap = int(capacity) if capacity is not None else 2 * int(k_den)

    toks = (
        df.select(_tokens(F.col(text)).alias("__toks"))
        .select(F.explode("__toks").alias("token"))
    )

    def sketch(batches):
        agg: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for tok, c in pdf["token"].value_counts().items():
                agg[tok] = agg.get(tok, 0) + int(c)
            if len(agg) > cap:
                s = pd.Series(agg)
                s = s - s.nlargest(cap + 1).iloc[-1]
                agg = s[s > 0].to_dict()
        out = pd.DataFrame(
            {"token": list(agg.keys()) + [None], "n_part": 0}
        )
        out.loc[out.index[-1], "n_part"] = n_part
        yield out

    summary = toks.mapInPandas(sketch, "token string, n_part long")
    summary = summary.localCheckpoint(eager=True)  # one pass, reused twice
    n_total = summary.agg(F.sum("n_part")).collect()[0][0] or 0
    cands = summary.filter(F.col("token").isNotNull()).select("token").distinct()
    return (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") * k_den > F.lit(n_total))
    )


def bpe_pair_counts(
    df: DataFrame, text: str = "text", top_k: int = 50
) -> DataFrame:
    """Corpus-weighted adjacent symbol-pair counts — the inner loop of
    BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units"), round one where
    symbols are single characters. The highest-count pair is the next
    merge; re-running after applying merges trains the full vocabulary.

    Scale shape (the reason this is two shuffles, not a corpus scan per
    round): tokenize once and count WORD frequencies (distinct-word
    table << corpus under Zipf), then explode character pairs from the
    DISTINCT word list weighted by word count — per-round work is
    O(|vocab| * avg_word_len), independent of corpus size. All JVM
    expressions (split/transform/substring), no UDF; top-k via
    orderBy+limit (TakeOrdered, no global sort). Ties at the cut are
    broken by pair text, so the top-k set is deterministic.

    Output: ``pair`` (2-char symbol pair), ``n_occurrences`` (BIGINT
    total across the corpus, weighted by word frequency).
    """
    words = df.select(F.explode(_tokens(F.col(text))).alias("w"))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = wc.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(top_k)
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    merges: "list[tuple[str, str]]" = (),
) -> DataFrame:
    """Apply a learned BPE merge table — the ENCODE half of the
    tokenizer (bpe_pair_counts is the training half). Exact GPT-2-style
    semantics for any well-formed table (each merge's parts are single
    characters or outputs of strictly earlier merges — true of every
    learned table): under that invariant a merge, once exhausted, can
    never become applicable again, so applying merges sequentially in
    rank order equals the priority-queue algorithm.

    Engine-native trick: a word's symbol sequence is kept as a
    DOUBLE-space-joined string padded with one space each side, and one
    merge (x, y) → xy is ONE global ``regexp_replace`` of
    `` x  y `` → `` xy `` — leftmost non-overlapping semantics are
    exactly BPE's left-to-right pass, and the single-space boundaries
    let consecutive matches chain (the shared boundary stays intact).
    The whole encoder is therefore len(merges) JVM regex passes over
    the DISTINCT word table — vocabulary-sized, not corpus-sized, the
    same Zipf shape as bpe_pair_counts — then a hash join back to the
    corpus word stream. No UDF anywhere.

    ``merges`` must be rank-ordered and regex-safe (alphanumeric
    symbols; the tokenizer alphabet). Output per doc: (id, n_words,
    n_chars, n_bpe_tokens) — compression = n_bpe_tokens / n_chars.
    """
    words = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text))).alias("w")
    )
    vocab = words.select("w").distinct()
    # initial state: characters, double-space joined, space padded
    enc = F.concat(
        F.lit(" "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substring(F.col("w"), i, 1),
            ),
            "  ",
        ),
        F.lit(" "),
    )
    for x, y in merges:
        enc = F.regexp_replace(enc, f" {x}  {y} ", f" {x}{y} ")
    encoded = vocab.select(
        "w",
        F.size(F.split(F.trim(enc), r"\s{2}")).cast("long").alias("__ntok"),
    )
    return (
        words.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("__ntok").cast("long").alias("n_bpe_tokens"),
        )
    )


def _gram_array(toks, n: int):
    """Word n-gram array from a token array column (n=1 → the tokens)."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bleu_scores(
    pairs: DataFrame,
    id_col: str = "pair_id",
    ref: str = "ref",
    cand: str = "cand",
) -> DataFrame:
    """BLEU-2 per (reference, candidate) pair — the classic modified
    n-gram-precision eval for generated text (Papineni et al. 2002):
    clipped unigram/bigram precision (per gram type, matches capped at
    the reference's count), brevity penalty, geometric mean.

    Engine-portable by construction: p1/p2 are ratios of integer
    counts, the geometric mean uses ``sqrt`` (IEEE correctly-rounded,
    unlike exp/ln which vary by libm), and the brevity penalty is
    emitted as the exact ``exp`` ARGUMENT (1 − ref_len/cand_len,
    0 when cand ≥ ref) rather than its value — callers exponentiate if
    they need the penalized scalar; the comparable, deterministic
    numbers are the precisions and ``bleu2_unpenalized``.

    One gram explode per n + per-pair count joins — all relational,
    grouped on the pair id, no UDF. Output: (id, ref_len, cand_len,
    p1, p2, bp_log, bleu2_unpenalized).

    Degenerate pairs are KEPT, never dropped: a pair whose candidate
    (or reference) has <2 tokens simply has no bigrams, so p2 (and the
    geometric mean) come out null — the caller decides how to score
    unscorable pairs. Null/empty token arrays report length 0
    (``greatest(size, 0)`` — Spark's size(NULL) is −1), and bp_log is
    null when cand_len = 0 (the penalty is undefined, not zero).
    """
    # spread: gram explodes are byte-cheap/compute-heavy, so a 1-split
    # pair table serializes them (SCALE.md plan-collapse rule)
    pairs = _spread(pairs)
    base = pairs.select(
        F.col(id_col),
        _tokens(F.col(ref)).alias("__rt"),
        _tokens(F.col(cand)).alias("__ct"),
    )
    grams = _gram_array
    out = base.select(
        id_col,
        F.greatest(F.size("__rt"), F.lit(0)).cast("long").alias("ref_len"),
        F.greatest(F.size("__ct"), F.lit(0)).cast("long").alias("cand_len"),
    )
    for n in (1, 2):
        r = (
            base.select(id_col, F.explode(grams(F.col("__rt"), n)).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("__rc"))
        )
        c = (
            base.select(id_col, F.explode(grams(F.col("__ct"), n)).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("__cc"))
        )
        clipped = (
            c.join(r, [id_col, "g"], "left")
            .groupBy(id_col)
            .agg(
                F.sum(F.least(F.col("__cc"), F.coalesce(F.col("__rc"), F.lit(0))))
                .cast("long")
                .alias(f"__m{n}"),
                F.sum("__cc").cast("long").alias(f"__t{n}"),
            )
        )
        out = out.join(clipped, id_col, "left")
    return out.select(
        id_col,
        "ref_len",
        "cand_len",
        F.round(F.col("__m1") / F.col("__t1"), 4).alias("p1"),
        F.round(F.col("__m2") / F.col("__t2"), 4).alias("p2"),
        F.when(
            F.col("cand_len") >= F.col("ref_len"), F.lit(0.0)
        ).otherwise(
            # try_divide: cand_len = 0 → null penalty (ANSI x/0 throws)
            F.round(1 - F.try_divide(F.col("ref_len"), F.col("cand_len")), 4)
        ).alias("bp_log"),
        F.round(
            F.sqrt((F.col("__m1") / F.col("__t1")) * (F.col("__m2") / F.col("__t2"))),
            4,
        ).alias("bleu2_unpenalized"),
    )


def rouge_scores(
    pairs: DataFrame,
    id_col: str = "pair_id",
    ref: str = "ref",
    cand: str = "cand",
) -> DataFrame:
    """ROUGE-1/ROUGE-2 per (reference, candidate) pair (Lin 2004) — the
    recall-oriented counterpart to ``bleu_scores``: per gram type the
    overlap is min(cand_count, ref_count); recall divides by the
    REFERENCE total, precision by the candidate total, and F1 is
    2·overlap / (ref_total + cand_total) — every emitted number an
    integer ratio, deterministic across engines. Same relational shape
    as bleu_scores (gram explode + per-pair count join, no UDF).
    Output: (id, r1, p1_rouge, f1_1, r2, p2_rouge, f1_2).

    Same degenerate-pair contract as :func:`bleu_scores`: every input
    pair emits a row; metrics whose gram universe is empty (e.g. both
    sides <2 tokens for the bigram family, or a zero denominator) are
    null, never silently dropped."""
    # spread: same plan-collapse rule as bleu_scores
    pairs = _spread(pairs)
    base = pairs.select(
        F.col(id_col),
        _tokens(F.col(ref)).alias("__rt"),
        _tokens(F.col(cand)).alias("__ct"),
    )
    out = base.select(id_col)
    for n in (1, 2):
        r = (
            base.select(id_col, F.explode(_gram_array(F.col("__rt"), n)).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("__rc"))
        )
        c = (
            base.select(id_col, F.explode(_gram_array(F.col("__ct"), n)).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("__cc"))
        )
        m = (
            r.join(c, [id_col, "g"], "full_outer")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.least(
                        F.coalesce(F.col("__cc"), F.lit(0)),
                        F.coalesce(F.col("__rc"), F.lit(0)),
                    )
                ).cast("long").alias(f"__m{n}"),
                F.sum(F.coalesce(F.col("__rc"), F.lit(0))).cast("long").alias(f"__tr{n}"),
                F.sum(F.coalesce(F.col("__cc"), F.lit(0))).cast("long").alias(f"__tc{n}"),
            )
        )
        out = out.join(m, id_col, "left")
    # try_divide throughout: a one-sided gram family leaves a zero
    # denominator (e.g. empty ref, non-empty cand) and ANSI-mode
    # division would throw where the contract wants null
    return out.select(
        id_col,
        F.round(F.try_divide(F.col("__m1"), F.col("__tr1")), 4).alias("r1"),
        F.round(F.try_divide(F.col("__m1"), F.col("__tc1")), 4).alias("p1_rouge"),
        F.round(F.try_divide(2 * F.col("__m1"), F.col("__tr1") + F.col("__tc1")), 4).alias("f1_1"),
        F.round(F.try_divide(F.col("__m2"), F.col("__tr2")), 4).alias("r2"),
        F.round(F.try_divide(F.col("__m2"), F.col("__tc2")), 4).alias("p2_rouge"),
        F.round(F.try_divide(2 * F.col("__m2"), F.col("__tr2") + F.col("__tc2")), 4).alias("f1_2"),
    )


def ranking_metrics(
    df: DataFrame,
    group: str,
    score: str,
    rel: str,
    tie: str,
    k: int = 10,
) -> DataFrame:
    """Offline retrieval-quality evaluation per query group: nDCG@k
    (Järvelin & Kekäläinen 2002, exponential-gain form), MRR@k and
    precision@k — the metrics a training-data pipeline reports when it
    tunes its retrieval/dedup arms (BM25, ANN, hybrid fusion) against
    graded relevance labels.

    ``df`` holds one row per (query ``group``, candidate) with a
    ranking ``score`` and a graded ``rel`` label; ``tie`` is a unique
    key making both orderings total (SURVEY.md §7 determinism rule).
    IDCG is computed from the ideal (rel-descending) ordering of ALL
    candidates in the group truncated at k — the standard normalizer —
    so nDCG is comparable across queries with different candidate
    counts. Groups with no relevant candidate get ndcg/mrr 0, not NULL.

    Scale: two row_number windows and two aggregations, all keyed on
    the query group — per-query work linear in candidates, no global
    sort, no UDF. Final doubles are rounded (engine summation order).
    """
    from pyspark.sql import Window

    gain = F.pow(F.lit(2.0), F.col(rel).cast("double")) - F.lit(1.0)
    w = Window.partitionBy(group).orderBy(F.desc(score), F.asc(tie))
    ranked = df.withColumn("__rank", F.row_number().over(w)).filter(
        F.col("__rank") <= k
    )
    dcg = ranked.groupBy(group).agg(
        F.sum(gain / F.log2(F.col("__rank").cast("double") + 1)).alias("__dcg"),
        F.sum(F.when(F.col(rel) > 0, 1).otherwise(0)).cast("long").alias("__n_rel"),
        F.min(F.when(F.col(rel) > 0, F.col("__rank"))).alias("__frr"),
    )
    wi = Window.partitionBy(group).orderBy(F.desc(rel), F.asc(tie))
    idcg = (
        df.withColumn("__irank", F.row_number().over(wi))
        .filter(F.col("__irank") <= k)
        .groupBy(group)
        .agg(
            F.sum(gain / F.log2(F.col("__irank").cast("double") + 1)).alias("__idcg")
        )
    )
    return dcg.join(idcg, group).select(
        F.col(group),
        F.round(
            F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias(f"ndcg_at_{k}"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("__frr"), F.lit(0.0)), 6
        ).alias(f"mrr_at_{k}"),
        F.round(F.col("__n_rel").cast("double") / F.lit(float(k)), 4).alias(
            f"precision_at_{k}"
        ),
    )


def bpe_train(
    df: DataFrame,
    text: str = "text",
    n_merges: int = 8,
    batch_size: int = 1,
) -> "list[tuple[str, str, int]]":
    """Train a BPE merge table on a corpus (Sennrich et al. 2016) —
    the full iterative loop closing `bpe_pair_counts` (one round's
    counts) with `bpe_encode` (applying a learned table). Each round:
    count adjacent symbol pairs over the DISTINCT word table weighted
    by word frequency, pick up to ``batch_size`` merges, apply them
    everywhere, repeat for ``ceil(n_merges / batch_size)`` rounds.

    Batched selection (round-9, the standard fast-trainer trick that
    removes the one-Spark-job-per-merge ceiling): within a round the
    candidates are ranked (count desc, then lexicographic (x, y) —
    deterministic) and taken GREEDILY subject to symbol-disjointness —
    a pair joins the batch only if neither symbol appears in an
    earlier pick of the same round. Disjoint merges cannot create or
    destroy each other's adjacencies, so every recorded
    ``n_occurrences`` stays exact and applying the batch in any order
    gives the same state; the first disjoint candidate in global rank
    order IS the argmax over disjoint pairs, so the selection is
    exact, not heuristic (an over-fetched top-K is collected; if K
    exhausts without filling the batch, a targeted excluded-symbols
    argmax query completes it — still O(batch) driver rows).
    ``batch_size=1`` is classical sequential BPE. Larger batches can
    diverge from the sequential merge ORDER when the true sequential
    argmax at step k+1 would have been a pair created at step k — the
    usual batched-BPE trade: up to ``batch_size``× fewer rounds for a
    slightly different (rarely worse) table; measured on this corpus
    in BENCH_NOTES.md round 9. A round that cannot fill its batch
    (every remaining pair conflicts) yields fewer merges and does NOT
    backfill with extra rounds, so the round count is fixed — the
    property the unrolled SQL oracle replays.

    Scale shape: the corpus is scanned ONCE (word counts); every round
    after that runs on the vocabulary-sized symbol-string table —
    under Zipf that is orders of magnitude smaller than the corpus and
    INDEPENDENT of corpus size, which is what makes tokenizer training
    on 100 TB a vocabulary problem, not a corpus problem. Symbol
    strings use bpe_encode's double-space representation, so one merge
    is one JVM regexp_replace and a batch is one chained select. The
    per-round driver action collects O(batch) rows — scalar picks,
    same convention as k-means/closure convergence probes; corpus
    data never moves. A 32k-merge tokenizer at batch 64 is ~500
    sequential jobs instead of 32k.

    Stops early when no adjacent pair remains. Returns the learned
    table [(x, y, n_occurrences)] in merge order, directly consumable
    by ``bpe_encode(..., merges=[(x, y), ...])``.
    """
    import math

    words = df.select(F.explode(_tokens(F.col(text))).alias("w"))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    sym = F.concat(
        F.lit(" "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substring(F.col("w"), i, 1),
            ),
            "  ",
        ),
        F.lit(" "),
    )
    state = wc.select(sym.alias("sym"), "cnt").localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    n_rounds = math.ceil(n_merges / batch_size)
    for _ in range(n_rounds):
        want = min(batch_size, n_merges - len(merges))
        if want <= 0:
            break
        syms = F.split(F.trim(F.col("sym")), r"\s{2}")
        pairs = state.select(syms.alias("ss"), "cnt").filter(
            F.size("ss") >= 2
        ).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ss") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("ss"), i).alias("x"),
                        F.element_at(F.col("ss"), i + F.lit(1)).alias("y"),
                    ),
                )
            ).alias("p"),
            "cnt",
        )
        counts = pairs.groupBy(
            F.col("p.x").alias("x"), F.col("p.y").alias("y")
        ).agg(F.sum("cnt").cast("long").alias("n"))
        over_fetch = want * 4 + 4
        cand = counts.orderBy(F.desc("n"), "x", "y").limit(over_fetch).collect()
        if not cand:
            break
        picked: list[tuple[str, str, int]] = []
        used: set[str] = set()
        i = 0
        while len(picked) < want:
            if i < len(cand):
                r = cand[i]
                i += 1
                if r.x in used or r.y in used:
                    continue
                picked.append((r.x, r.y, int(r.n)))
                used.update((r.x, r.y))
            elif len(cand) == over_fetch:
                # top-K exhausted but more candidates may exist: exact
                # completion via a targeted excluded-symbols argmax
                nxt = (
                    counts.filter(
                        ~F.col("x").isin(*used) & ~F.col("y").isin(*used)
                    )
                    .orderBy(F.desc("n"), "x", "y")
                    .limit(1)
                    .collect()
                )
                if not nxt:
                    break
                r = nxt[0]
                picked.append((r.x, r.y, int(r.n)))
                used.update((r.x, r.y))
            else:
                break
        if not picked:
            break
        merges.extend(picked)
        col = F.col("sym")
        for x, y, _n in picked:
            col = F.regexp_replace(col, f" {x}  {y} ", f" {x}{y} ")
        state = state.select(col.alias("sym"), "cnt").localCheckpoint(eager=True)
    return merges


# --------------------------------------------------------------------------
# trained classification: multinomial Naive Bayes + AUC evaluation
# --------------------------------------------------------------------------

def nb_train(
    df: DataFrame,
    text: str = "text",
    label: str = "lang",
) -> tuple[DataFrame, DataFrame]:
    """Distributed multinomial Naive-Bayes TRAINING over a labelled
    corpus — the learn-the-weights counterpart to ``classifier_score``
    (which serves a fixed weight vector): the fastText-style quality /
    language classifier a curation pipeline trains on its own labelled
    split before filtering with it.

    Returns ``(model, prior)``:

    - ``model(label, w, nll6)`` — DENSE over vocabulary × classes:
      ``nll6 = round(ln((T_c + V) / (C(w,c) + 1)) · 1e6)`` — add-one-
      smoothed negative log likelihood of token ``w`` under class ``c``
      (T_c = total token occurrences in class, V = vocabulary size).
      Dense rows mean classification is ONE equi-join on the token —
      no per-class missing-token patching at serve time.
    - ``prior(label, prior_nll6)`` — ``round(ln(N / N_c) · 1e6)``.

    NLL is kept non-negative (same reason as ``ngram_lm_score``: Spark
    ``div`` truncates, DuckDB ``//`` floors — they only agree ≥ 0).
    Integer micro-logs sum exactly, so argmin is deterministic.

    Scale: one token×class count aggregation (Zipf-head keys combine
    map-side), one vocabulary pass, a vocab × classes expansion (class
    count is small — broadcast side), never collects the corpus. The
    model is vocabulary×classes-sized: shuffle-joinable at any corpus
    size, broadcastable when the vocabulary is small.
    """
    toks = _tokens(F.col(text))
    occ = df.select(F.col(label).alias("label"), F.explode(toks).alias("w"))
    cnt = occ.groupBy("label", "w").agg(F.count(F.lit(1)).alias("cwc"))
    tot = occ.groupBy("label").agg(F.count(F.lit(1)).alias("tc"))
    vocab = occ.select("w").distinct()
    v = vocab.groupBy().agg(F.count(F.lit(1)).alias("nv"))
    cls = df.groupBy(F.col(label).alias("label")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    n = df.groupBy().agg(F.count(F.lit(1)).alias("nn"))
    # Class axis MUST come from cls (every label seen in training), not
    # tot (labels with >=1 token occurrence): a class whose training
    # docs all tokenize to empty still has a prior and must stay
    # predictable with T_c = 0 (round-9 property-falsified fix).
    model = (
        vocab.crossJoin(F.broadcast(cls.select("label")))
        .crossJoin(F.broadcast(v))
        .join(F.broadcast(tot), ["label"], "left")
        .join(cnt, ["label", "w"], "left")
        .select(
            "label",
            "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.col("nv"))
                    / (F.coalesce(F.col("cwc"), F.lit(0)) + 1)
                )
                * 1e6
            )
            .cast("long")
            .alias("nll6"),
        )
    )
    prior = (
        cls.crossJoin(F.broadcast(n))
        .select(
            "label",
            F.round(F.log(F.col("nn") / F.col("nc")) * 1e6)
            .cast("long")
            .alias("prior_nll6"),
        )
    )
    return model, prior


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    prior: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Serve a trained Naive-Bayes model (``nb_train``) over documents:
    per doc and class, total ``nll6 = prior_nll6 + Σ nll6(w, c)`` over
    KNOWN-token occurrences (out-of-vocabulary tokens are skipped — the
    standard NB serving choice, and it keeps the plan to one inner
    equi-join); predicted class = argmin with ``(total, label)``
    tie-break. Docs whose every token is OOV produce no row (documented:
    they carry no evidence).

    Output: ``(id, pred_label, total_nll6, n_known)``.

    Scale: explode → equi-join on token (model side vocabulary×classes,
    broadcast when small — AQE decides) → (doc, class)-keyed sum → one
    per-doc window argmin. No UDF, no global sort, no collect.
    """
    from pyspark.sql import Window

    toks = _tokens(F.col(text))
    occ = df.select(F.col(id_col), F.explode(toks).alias("w"))
    scored = (
        occ.join(model, "w")
        .groupBy(id_col, "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_known"),
            F.sum("nll6").alias("sum_nll6"),
        )
        .join(prior, "label")
        .withColumn("total_nll6", F.col("sum_nll6") + F.col("prior_nll6"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.asc("total_nll6"), F.asc("label")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col(id_col),
            F.col("label").alias("pred_label"),
            F.col("total_nll6").cast("long").alias("total_nll6"),
            "n_known",
        )
    )


def auc_eval(
    df: DataFrame,
    group: str,
    score: str,
    positive: Column,
) -> DataFrame:
    """Group-wise ROC-AUC of a scoring column against a binary label —
    the eval a curation pipeline reports when it tunes its quality
    classifier (pairs with ``nb_train``/``classifier_score`` the way
    ``ranking_metrics`` pairs with BM25/ANN).

    Exact tie-corrected rank formulation (Mann–Whitney U): with
    ascending ranks over ``score``, ``rank_min + rank_max`` per row is
    the integer ``2·rank_avg``; then ``U2 = Σ_pos(rank_min + rank_max)
    − n_pos·(n_pos+1)`` and ``AUC = U2 / (2·n_pos·n_neg)`` — all
    integer until the final division, emitted as ``auc6`` so the
    oracle compares exactly. Groups with no positives or no negatives
    get NULL auc6 (undefined), kept so the caller sees them.

    The micro-ratio is computed by EXACT split division (``q·1e6 +
    a1·1e3 + floor(rem1·1e3 / d)`` with d = 2·n_pos·n_neg) rather than
    ``(U2·1e6) div d``, whose product overflows int64 once a group
    exceeds ~3M balanced rows; the split form is overflow-free up to
    n_pos·n_neg ≈ 4.6e15 (~10⁸-row balanced groups). Beyond that —
    or for a single global AUC — pre-aggregate into a (score, label,
    count) histogram first and rank the histogram: the rank sums
    themselves stay in range and the group is tiny.

    Scale: windows and the aggregate are all partitioned by ``group`` —
    per-group work is a local sort, no global ordering.
    """
    from pyspark.sql import Window

    pos = F.when(positive, 1).otherwise(0)
    wr = Window.partitionBy(group).orderBy(F.asc("__s"))
    base = df.select(F.col(group), F.col(score).alias("__s"), pos.alias("__p"))
    ranked = base.withColumn("__rmin", F.rank().over(wr)).withColumn(
        "__nt", F.count(F.lit(1)).over(Window.partitionBy(group, "__s"))
    )
    agg = ranked.groupBy(group).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("__p")).cast("long").alias("n_neg"),
        F.sum(
            F.col("__p") * (F.lit(2) * F.col("__rmin") + F.col("__nt") - 1)
        )
        .cast("long")
        .alias("__rsum2"),
    )
    u2 = F.col("__rsum2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return (
        agg.select(
            F.col(group),
            "n_pos",
            "n_neg",
            u2.cast("long").alias("u2"),
        )
        # exact split division: with d = 2·n_pos·n_neg and u2 = q·d + r,
        # r·1000 = a1·d + rem1  =>  floor(u2·1e6/d) = q·1e6 + a1·1e3 +
        # floor(rem1·1e3/d) — every intermediate ≤ d·1e3, so no int64
        # overflow until n_pos·n_neg ~ 4.6e15 (vs ~4.6e12 for u2·1e6)
        .withColumn(
            "auc6",
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.expr(
                    "(u2 div (2 * n_pos * n_neg)) * 1000000"
                    " + ((u2 % (2 * n_pos * n_neg)) * 1000"
                    "    div (2 * n_pos * n_neg)) * 1000"
                    " + (((u2 % (2 * n_pos * n_neg)) * 1000"
                    "     % (2 * n_pos * n_neg)) * 1000)"
                    "   div (2 * n_pos * n_neg)"
                ),
            ).cast("long"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over the
    corpus bigram space — the classic corpus-analytics pass (Church &
    Hanks 1990) a pipeline runs to find multi-word expressions worth
    protecting from tokenization splits.

    Over bigram OCCURRENCES (N total): ``pmi6 = round(ln((c12 · N) /
    (c1_left · c2_right)) · 1e6)`` where c1_left / c2_right are the
    occurrence counts of each word in first / second bigram position —
    so probabilities share the same denominator and PMI is exact.
    ``min_count`` suppresses the classic low-frequency PMI explosion.
    Float products are ordered identically in the oracle (c12·N then
    divide) so the doubles agree bit-for-bit.

    Scale: one bigram count (map-side combine), two position-marginal
    counts derived FROM the bigram counts (vocabulary-sized, not
    corpus-sized), one scalar N, top-k via TakeOrdered — no global
    sort, no UDF, corpus never collected.
    """
    from pyspark.sql import Window

    toks = _tokens(F.col(text))
    pairs = (
        df.select(toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__toks) - 2),"
                    " i -> named_struct('w1', __toks[i], 'w2', __toks[i + 1]))"
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    left = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    right = bc.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = bc.groupBy().agg(F.sum("c12").alias("nn"))
    top = (
        bc.filter(F.col("c12") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(
                F.log(
                    (F.col("c12").cast("double") * F.col("nn"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                )
                * 1e6
            )
            .cast("long")
            .alias("pmi6"),
        )
        .orderBy(F.desc("pmi6"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("pmi6"), F.asc("w1"), F.asc("w2"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "w1", "w2", "c12", "pmi6"
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text: str = "text",
    buckets: int = 128,
) -> DataFrame:
    """DSIR-style data selection via hashed importance resampling
    (Xie et al., "Data Selection for Language Models via Importance
    Resampling", 2023): score every RAW document by how much more
    likely its hashed token features are under the TARGET distribution
    than under the raw distribution, then keep the favorable ones —
    the principled version of "select web data that looks like the
    high-quality corpus".

    ``target`` is a boolean Column splitting the input into the target
    corpus (True) and the raw pool to be scored (False). Features are
    the hashing trick (md5_31 mod ``buckets``, the same portable hash
    the classifier and every sketch use). Per bucket, with add-one
    smoothing over ``B = buckets``: ``lr6 = round(ln(((c_t+1)·(T_r+B))
    / ((c_r+1)·(T_t+B))) · 1e6)`` — an integer micro-log-ratio, signed
    (sums need no division, so negatives are safe here). Per raw doc:
    ``dsir_lr6 = Σ lr6(bucket)`` over token occurrences, ``kept =
    dsir_lr6 ≥ 0``. Deterministic threshold selection — the
    Gumbel-noise sampling of the paper drops in by adding a
    hash-seeded jitter column before the threshold, same plan shape.
    Docs with zero tokens carry no evidence and emit no row.

    Scale: ONE (bucket)-keyed count aggregation over the full corpus
    (``buckets`` keys — combines map-side to almost nothing), a
    broadcast-sized weight table (``buckets`` rows), and a broadcast
    join back onto exploded raw tokens + per-doc sum: the scoring pass
    runs at scan speed, no shuffle wider than ``buckets`` keys, corpus
    never collected.
    """
    from gramene_mongodb_spark.operators.dedup import _md5_base31

    toks = _tokens(F.col(text))
    it = F.when(target, 1).otherwise(0)
    occ = df.select(
        F.col(id_col), it.alias("__it"), F.explode(toks).alias("__tok")
    ).withColumn("__b", _md5_base31(F.col("__tok")) % buckets)
    c = occ.groupBy("__b").agg(
        F.sum("__it").alias("ct"),
        F.sum(F.lit(1) - F.col("__it")).alias("cr"),
    )
    tt = c.groupBy().agg(F.sum("ct").alias("tct"), F.sum("cr").alias("tcr"))
    w = c.crossJoin(F.broadcast(tt)).select(
        "__b",
        F.round(
            F.log(
                ((F.col("ct") + 1).cast("double") * (F.col("tcr") + buckets))
                / ((F.col("cr") + 1).cast("double") * (F.col("tct") + buckets))
            )
            * 1e6
        )
        .cast("long")
        .alias("lr6"),
    )
    raw = occ.filter(F.col("__it") == 0).select(id_col, "__b")
    return (
        raw.join(F.broadcast(w), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr6").cast("long").alias("dsir_lr6"),
        )
        .withColumn("kept", (F.col("dsir_lr6") >= 0).cast("long"))
    )


def cohen_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa agreement between two categorical labelings
    (Cohen 1960) — the label-QA eval a pipeline reports when it
    compares an automatic classifier against gold labels or two
    annotators against each other (completes the eval suite:
    ``ranking_metrics`` for retrieval, ``auc_eval`` for scorers,
    kappa for categorical raters).

    Exact integer formulation: with ``n`` rows, ``agree`` exact
    matches, and per-category marginals ``rm_c`` (rater a) / ``cm_c``
    (rater b): ``num = n·agree − Σ_c rm_c·cm_c``, ``den = n² −
    Σ_c rm_c·cm_c``; kappa = num/den, emitted as ``kappa6 =
    round(num·1e6 / den)`` (float division of two exact integers —
    both engines compute the identical double). num may be negative
    (worse-than-chance agreement), which is why this uses round over
    a float rather than integer division. ``den = 0`` (both raters
    constant and identical) yields NULL kappa.

    Overflow discipline (same reason as ``auc_eval``'s split division):
    the products ``n·agree``, ``n²`` and ``Σ rm_c·cm_c`` exceed int64
    once n passes ~3.03e9 rows, so they are computed in
    ``DECIMAL(38,0)`` — exact to 1e38, i.e. any physical corpus — and
    ``kappa6`` is derived from the decimals. The diagnostic ``num`` /
    ``den`` columns stay BIGINT for schema stability via ``try_cast``
    (NULL, never silently wrapped, past the int64 bound).

    Scale: one (a, b)-keyed count — category-squared key space, combines
    map-side to nothing — and every downstream aggregate runs on that
    tiny table; the corpus is scanned once, never collected.
    """
    cnt = (
        df.select(F.col(rater_a).alias("__a"), F.col(rater_b).alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy().agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("c")).otherwise(0)).alias(
            "agree"
        ),
    )
    rm = cnt.groupBy(F.col("__a").alias("cat")).agg(F.sum("c").alias("rm"))
    cm = cnt.groupBy(F.col("__b").alias("cat")).agg(F.sum("c").alias("cm"))
    dec = "decimal(19,0)"
    pe = (
        rm.join(cm, "cat", "full_outer")
        .select(
            (
                F.coalesce(F.col("rm"), F.lit(0)).cast(dec)
                * F.coalesce(F.col("cm"), F.lit(0)).cast(dec)
            ).alias("__p")
        )
        .groupBy()
        .agg(F.sum("__p").alias("pe_num"))
    )
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("agree").cast("long").alias("agree"),
            (
                F.col("n").cast(dec) * F.col("agree").cast(dec)
                - F.col("pe_num")
            ).alias("__num"),
            (
                F.col("n").cast(dec) * F.col("n").cast(dec) - F.col("pe_num")
            ).alias("__den"),
        )
        .select(
            "n",
            "agree",
            F.expr("try_cast(__num AS bigint)").alias("num"),
            F.expr("try_cast(__den AS bigint)").alias("den"),
            F.when(
                F.col("__den") != 0,
                F.round(
                    F.col("__num").cast("double")
                    * 1000000.0
                    / F.col("__den").cast("double")
                ),
            )
            .cast("long")
            .alias("kappa6"),
        )
    )
