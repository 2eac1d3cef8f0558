"""Deduplication operators for large-scale text corpora.

Extension surface beyond the reference (BASELINE.json north_star): the
reference's dedup is exact/array-level only (A2 — ``_.uniq``,
``_.uniqBy(exons,'id')``, seen-sets ``atlas/getAtlasData.js:30-33``);
a 100 TB training-data pipeline needs document-level exact AND near-dup.

All operators are pure DataFrame ops on deterministic hash functions
(xxhash64 / md5 — both JVM-side, codegen'd), so results are reproducible
across runs and cluster sizes.

Scale design:
* exact dedup: one shuffle on the content hash; argmin keeps a canonical
  survivor (lowest id) deterministically.
* MinHash LSH: per-doc signature is a map-side groupBy over exploded
  shingles; banding turns all-pairs comparison into an equi-join on
  (band, band_hash) — candidate pairs only, never n².
* SimHash: 64-bit fingerprint per doc from token-hash bit votes;
  near-dup = fingerprints equal in all-but-k bands (equi-join per band).
* embedding-cosine: exact theta-join baseline + random-hyperplane LSH
  (signature bits JVM-side, banded equi-join candidates, exact verify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gramene_mongodb_spark.lineage import hard_checkpoint

# normalization applied before any hashing: lowercase, collapse whitespace
def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def normalized_fingerprint(df: DataFrame, text: str = "text", out: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of normalized text. Deterministic and
    portable (same bytes → same hex on any engine)."""
    return df.withColumn(out, F.md5(_norm(F.col(text)).cast("binary")))


def dedup_exact(df: DataFrame, id_col: str, text: str = "text") -> DataFrame:
    """Exact dedup: keep the lowest-id row per normalized-content hash.

    Single shuffle on the 128-bit content hash: one window pass computes
    both the survivor (row_number = 1 in id order) and the group size —
    no groupBy + join-back. Output: the surviving rows with every
    original column, plus ``fingerprint`` and ``n_dupes`` (group size ≥1).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    fp = normalized_fingerprint(df, text)
    return (
        fp.withColumn("n_dupes", F.count(F.lit(1)).over(w))
        .withColumn("__rn", F.row_number().over(w.orderBy(F.col(id_col))))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# blocking (entity resolution / record linkage)
# --------------------------------------------------------------------------

def blocking_keys(
    records: DataFrame,
    text: str = "name",
    strategy: str = "digits",
    width: int = 3,
    out_col: str = "blk",
) -> DataFrame:
    """Attach a blocking fingerprint — the equi-join key that bounds an
    entity-resolution pair space (records only compare within a block,
    so candidates are Σ|block|² instead of n²). Configurable strategy:

    * ``digits`` — last ``width`` digits of the digit-only fingerprint.
      Robust to letter typos/reformatting (the common corruption);
      recall holds whenever mutations don't touch digits.
    * ``prefix`` — first ``width`` chars of the lowercased alphanumeric
      normalization. Robust to suffix edits and punctuation.
    * ``sorted_tokens`` — first ``width`` tokens of the sorted
      lowercased token set. Robust to word reordering.

    Rows whose fingerprint is empty get an empty-string key — callers
    who'd rather drop un-blockable rows filter ``out_col != ''``.
    Pure column expressions (JVM-side, codegen'd); one narrow
    projection, no shuffle — the shuffle belongs to the downstream
    equi-join, on this key.
    """
    col = F.col(text)
    if strategy == "digits":
        key = F.substring(F.regexp_replace(col, "[^0-9]", ""), -width, width)
    elif strategy == "prefix":
        key = F.substring(
            F.lower(F.regexp_replace(col, "[^A-Za-z0-9]", "")), 1, width
        )
    elif strategy == "sorted_tokens":
        key = F.array_join(
            F.slice(
                F.array_sort(F.split(F.lower(F.trim(col)), r"\s+")), 1, width
            ),
            " ",
        )
    else:
        raise ValueError(
            f"unknown blocking strategy {strategy!r}; "
            "expected digits | prefix | sorted_tokens"
        )
    return records.withColumn(out_col, F.coalesce(key, F.lit("")))


def blocked_pairs(
    keyed: DataFrame, id_col: str, key_col: str = "blk"
) -> DataFrame:
    """Candidate pairs from a blocked table: the a<b self-equi-join on
    the blocking key (``blocking_keys`` output). Output (id_a, id_b),
    distinct — a record pair sharing several keys (multi-key blocking
    via unioned ``blocking_keys`` calls) emits once. Empty-string keys
    (un-blockable rows) are excluded: they would otherwise form one
    giant all-pairs block."""
    ids = keyed.filter(F.col(key_col) != "").select(id_col, key_col)
    a = ids.select(F.col(id_col).alias("id_a"), key_col)
    b = ids.select(F.col(id_col).alias("id_b"), key_col)
    return (
        a.join(b, key_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# --------------------------------------------------------------------------
# shingling
# --------------------------------------------------------------------------

def shingle_arrays(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    materialize: bool = False,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """One row per doc with its deduped word n-gram shingle array.

    Tokenization = lowercase split on non-alphanumeric runs. The sliding
    window is built with higher-order array functions (transform over an
    index sequence) — JVM-side, no Python UDF, but O(tokens²) character
    copying per doc, so this IS the compute-heavy step of every
    similarity operator. Two scale measures:

    * explicit ``repartition`` before the expression — small/compacted
      inputs otherwise arrive as few parquet splits and serialize the
      whole corpus through a handful of cores;
    * ``materialize=True`` localCheckpoints the arrays so multi-branch
      consumers (document-frequency + prefix + verification in the
      jaccard join) compute shingles ONCE instead of once per branch.
    """
    toks = F.filter(F.split(_norm(F.col(text)), r"[^a-z0-9]+"), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    # docs shorter than n tokens yield their whole text as one shingle
    grams = F.when(F.size(toks) >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    arrays = df.repartition(parallelism).select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.array_distinct(grams).alias("shingles"),
    )
    return arrays.localCheckpoint(eager=True) if materialize else arrays


def shingles(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    materialize: bool = False,
) -> DataFrame:
    """Word n-gram shingles, one row per (id, shingle), deduped.

    Pass ``materialize=True`` whenever the downstream plan is more than
    a single narrow pass: AQE coalesces shingle_arrays' repartition
    exchange to ~1 partition (the shuffled text BYTES are small) and
    the O(tokens²) shingle compute goes single-threaded — the
    x_video_shots plan-collapse (f848000). The eager checkpoint pins
    the spread; measured 10.7 → 2.0 s on minhash at sf0.1.
    """
    return shingle_arrays(df, id_col, text, n, materialize=materialize).select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    )


def span_dedup(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    span_tokens: int = 32,
) -> DataFrame:
    """Span-level exact dedup (the C4-style sub-document pass): split
    each doc into consecutive ``span_tokens``-token spans, keep every
    span only at its FIRST occurrence in the corpus (ordered by
    (doc id, span index)), and reconstruct each doc from its surviving
    spans. Catches boilerplate and partial copies that document-level
    dedup misses — the near-universal companion to exact dedup in
    training-data pipelines.

    Deterministic: first-occurrence semantics need no similarity
    threshold, and the winner per span is a total order. Output:
    (id, n_spans, n_kept, text_kept) with empty-token docs dropped on
    both engine and oracle sides alike.

    Scale: tokenize/split is map-side; ONE shuffle keyed by span text
    picks winners (span-frequency skew bounded — identical spans
    collapse to one winner row each); one doc-keyed shuffle reassembles.
    The span window (not shingles) keeps the blowup linear: each token
    appears in exactly one span.
    """
    from pyspark.sql import Window

    toks = F.filter(F.split(_norm(F.col(text)), r"[^a-z0-9]+"), lambda t: t != "")
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.when(
        n_spans > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.array_join(
                F.slice(toks, i * span_tokens + 1, span_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        F.col(id_col), F.posexplode(spans).alias("span_idx", "span_text")
    )
    w = Window.partitionBy("span_text").orderBy(F.col(id_col).asc(), F.col("span_idx").asc())
    kept = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    totals = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_idx", "span_text"))),
                lambda s: s["span_text"],
            ),
            " ",
        ).alias("text_kept"),
    )
    return totals.join(kept_agg, id_col, "left").select(
        F.col(id_col),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text_kept"), F.lit("")).alias("text_kept"),
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    window_tokens: int = 8,
    min_count: int = 2,
    hash_prefilter: bool = True,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """ExactSubstr-style repeated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal token span that occurs ``min_count``+ times anywhere
    in the corpus (across documents OR repeated within one), via
    SLIDING windows of ``window_tokens`` tokens at stride 1 — the
    overlap-sensitive companion to :func:`span_dedup`, whose fixed
    non-overlapping grid misses copies that straddle a span boundary.

    Spark-first re-expression of the paper's suffix-array algorithm:

    1. map-side: tokenize and emit every (doc, pos, window-text) —
       n_tokens − W + 1 rows per doc, linear like the token stream;
    2. ONE shuffle keyed by window text marks windows whose global
       occurrence count ≥ ``min_count`` (count window, no join-back);
    3. per-doc gaps-and-islands merges overlapping duplicated windows
       into maximal spans: ascending positions ⇒ a window starts a new
       island iff pos − lag(pos) > W − 1.

    Output, one row per input doc (scalar columns only): ``n_tokens``,
    ``n_windows``, ``n_dup_windows``, ``n_spans`` (maximal repeated
    spans), ``dup_tokens`` (tokens covered by some repeated span) and
    ``max_span_tokens``. Docs shorter than W tokens emit no windows
    and report zeros.

    Scale — the 100 TB path (``hash_prefilter=True``, the default):
    shuffling window TEXT multiplies corpus bytes by the window factor
    (~W×), so the hash path never shuffles text for the full corpus:

    * pass A aggregates 64-bit ``xxhash64(win_text)`` keys (computed
      map-side) — the exchange carries (8-byte hash, partial count)
      per DISTINCT hash per partition, ≈ corpus + 8 B/window instead
      of W tokens/window (SCALE.md probe);
    * the duplicated-hash set is measured (one count on the persisted
      hash-only aggregate — the house adaptive-size pick) and joined
      back BROADCAST when ≤ ``broadcast_threshold`` rows, so the
      corpus-sized side never re-shuffles; above threshold it falls
      back to a hash-keyed equi-join;
    * exact verify: only the candidate windows (the duplicated
      remainder + hash-collision noise) shuffle their text for a true
      per-text global count — xxhash64 collisions can only ADD
      candidates, never drop a true duplicate (equal text ⇒ equal
      hash), so the verified result is exactly the text-path result.

    ``hash_prefilter=False`` keeps the direct window-text shuffle —
    the simpler plan for small corpora and the differential twin for
    the property test. Island merge shuffles doc-keyed rows once
    either way.
    """
    from pyspark.sql import Window

    W = window_tokens
    toks = F.filter(F.split(_norm(F.col(text)), r"[^a-z0-9]+"), lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    n_windows = F.greatest(F.size("__toks") - F.lit(W) + 1, F.lit(0))
    # n_tokens / n_windows are MAP-SIDE facts of each doc — keep them off
    # the window-text shuffle so that exchange runs exactly once (the
    # first cut fed totals and islands from the same counted frame and
    # Catalyst duplicated the widest shuffle into both consumers)
    totals = base.select(
        F.col(id_col),
        # size(NULL) is -1 in Spark; null text means zero tokens
        F.greatest(F.size("__toks"), F.lit(0)).cast("long").alias("n_tokens"),
        n_windows.cast("long").alias("n_windows"),
    )
    wins = base.select(
        F.col(id_col),
        F.posexplode(
            # sequence(1, 0) yields DESCENDING [1, 0] in Spark, so gate
            # the zero-window case to an explicit empty array
            F.when(
                n_windows >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda i: F.array_join(F.slice("__toks", i, W), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "win_text"),
    )
    cw = Window.partitionBy("win_text")
    if hash_prefilter:
        hashed = wins.withColumn("win_hash", F.xxhash64("win_text"))
        # pass A: hash-only aggregate — map-side partial combine means
        # the exchange carries one (hash, count) pair per distinct hash
        # per partition, never the window text
        dup_hashes = (
            hashed.groupBy("win_hash")
            .agg(F.count(F.lit(1)).alias("__hcnt"))
            .filter(F.col("__hcnt") >= min_count)
            .select("win_hash")
            .persist()
        )
        n_dup = dup_hashes.count()
        if n_dup <= broadcast_threshold:
            candidates = hashed.join(F.broadcast(dup_hashes), "win_hash")
        else:
            candidates = hashed.join(dup_hashes, "win_hash")
        # exact verify on the duplicated remainder only: candidate text
        # (≈ duplicated windows + collision noise) is re-counted by the
        # true window text; equal text ⇒ equal hash, so every true
        # duplicate is a candidate and the verified set is exact
        dup = (
            candidates.withColumn("__cnt", F.count(F.lit(1)).over(cw))
            .filter(F.col("__cnt") >= min_count)
            .select(id_col, "pos")
        )
    else:
        # direct path: global occurrence count per window text
        # (within-doc repeats count)
        dup = (
            wins.withColumn("__cnt", F.count(F.lit(1)).over(cw))
            .filter(F.col("__cnt") >= min_count)
            .select(id_col, "pos")
        )
    ow = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup.withColumn("__lag", F.lag("pos").over(ow))
        .withColumn(
            "__new",
            F.when(
                F.col("__lag").isNull() | (F.col("pos") - F.col("__lag") > W - 1), 1
            ).otherwise(0),
        )
        .withColumn("__isl", F.sum("__new").over(ow))
        .groupBy(id_col, "__isl")
        .agg(
            F.count(F.lit(1)).alias("__n_wins"),
            F.min("pos").alias("__start"),
            (F.max("pos") + F.lit(W) - 1).alias("__end"),
        )
    )
    span_agg = islands.groupBy(id_col).agg(
        F.sum("__n_wins").cast("long").alias("n_dup_windows"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("__end") - F.col("__start") + 1).cast("long").alias("dup_tokens"),
        F.max(F.col("__end") - F.col("__start") + 1).cast("long").alias("max_span_tokens"),
    )
    return totals.join(span_agg, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("max_span_tokens", F.lit(0)).cast("long").alias("max_span_tokens"),
    )


def exact_substring_rewrite(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    window_tokens: int = 8,
    min_count: int = 2,
    hash_prefilter: bool = True,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022) — the rewrite product
    :func:`exact_substring_spans` only audits: cut every maximal
    duplicated token span out of each document, with keep-FIRST-
    occurrence semantics (same winner rule as :func:`span_dedup`), and
    return the cleaned corpus.

    A window occurrence (doc, pos, W tokens at stride 1) is CUT when
    its window text occurs ``min_count``+ times corpus-wide AND it is
    not the globally first occurrence of that text (total order
    (id, pos)). Cut windows merge into maximal spans by the same
    gaps-and-islands rule as the audit (new span iff gap > W−1); every
    token covered by a cut span is removed; the surviving normalized
    tokens reassemble in order. A doc that is a full copy of an
    earlier doc rewrites to '' while the first occurrence is untouched;
    an immediately repeated phrase within one doc keeps its first copy.

    Output: ``(id, n_tokens, n_cut_tokens, n_spans_cut, text_kept)``
    over the NORMALIZED token stream (same contract as
    ``span_dedup.text_kept``).

    Scale: the window pass is the audit's (hash-prefilter default —
    8 B/window through the count exchange, broadcast-bounded join-back,
    exact text verify on the duplicated remainder only); the
    first-occurrence rank rides the same win-text partition as the
    verify count (one window spec, no extra shuffle). Cut spans
    aggregate doc-keyed into per-doc interval arrays (span count per
    doc is small — bounded by n_windows/W islands), join back on the
    id, and the rewrite itself is a MAP-SIDE index-aware array filter:
    the corpus never shuffles token-by-token.
    """
    from pyspark.sql import Window

    W = window_tokens
    toks = F.filter(F.split(_norm(F.col(text)), r"[^a-z0-9]+"), lambda t: t != "")
    base = df.select(
        F.col(id_col),
        F.coalesce(toks, F.array().cast("array<string>")).alias("__toks"),
    )
    n_windows = F.greatest(F.size("__toks") - F.lit(W) + 1, F.lit(0))
    wins = base.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n_windows >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda i: F.array_join(F.slice("__toks", i, W), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "win_text"),
    )
    cw = Window.partitionBy("win_text")
    rw = Window.partitionBy("win_text").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    if hash_prefilter:
        hashed = wins.withColumn("win_hash", F.xxhash64("win_text"))
        dup_hashes = (
            hashed.groupBy("win_hash")
            .agg(F.count(F.lit(1)).alias("__hcnt"))
            .filter(F.col("__hcnt") >= min_count)
            .select("win_hash")
            .persist()
        )
        n_dup = dup_hashes.count()
        if n_dup <= broadcast_threshold:
            candidates = hashed.join(F.broadcast(dup_hashes), "win_hash")
        else:
            candidates = hashed.join(dup_hashes, "win_hash")
    else:
        candidates = wins
    # exact verify + first-occurrence rank share one win_text partition:
    # all occurrences of a candidate text are candidates (equal text ⇒
    # equal hash), so the rank over candidates IS the global rank
    cut = (
        candidates.withColumn("__cnt", F.count(F.lit(1)).over(cw))
        .withColumn("__rn", F.row_number().over(rw))
        .filter((F.col("__cnt") >= min_count) & (F.col("__rn") > 1))
        .select(id_col, "pos")
    )
    ow = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        cut.withColumn("__lag", F.lag("pos").over(ow))
        .withColumn(
            "__new",
            F.when(
                F.col("__lag").isNull() | (F.col("pos") - F.col("__lag") > W - 1), 1
            ).otherwise(0),
        )
        .withColumn("__isl", F.sum("__new").over(ow))
        .groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + F.lit(W) - 1).alias("e"),
        )
    )
    per_doc = islands.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("__cuts"),
        F.count(F.lit(1)).cast("long").alias("n_spans_cut"),
    )
    kept = F.when(
        F.col("__cuts").isNull(), F.col("__toks")
    ).otherwise(
        # 0-based index filter against the cut intervals (also 0-based
        # token positions s..e inclusive); nested lambda capture of i
        F.filter(
            "__toks",
            lambda t, i: ~F.exists(
                "__cuts", lambda c: (i >= c["s"]) & (i <= c["e"])
            ),
        )
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("n_tokens"),
            (F.size("__toks") - F.size(kept)).cast("long").alias("n_cut_tokens"),
            F.coalesce("n_spans_cut", F.lit(0)).cast("long").alias("n_spans_cut"),
            F.array_join(kept, " ").alias("text_kept"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by EXACT n-gram Jaccard ≥ threshold, via prefix
    filtering (the standard exact set-similarity join):

    1. rank each doc's shingles by ascending global document frequency;
    2. a pair with jaccard ≥ t MUST share a shingle among each side's
       first ⌊(1−t)·|set|⌋+1 rarest shingles, so the candidate equi-join
       runs only over that prefix — the frequent "stop-shingles" that
       blow up a naive inverted-index self-join never enter the join;
    3. verify candidates exactly with array_intersect over the full
       shingle sets (broadcast-friendly arrays table).

    No false negatives: the prefix bound is a theorem, not a heuristic,
    so results equal the naive all-pairs formulation. At 100 TB the
    candidate join shuffles only the prefix (≈(1−t) of the index), and
    verification touches candidate pairs only.

    The bound ⌊(1−t)·n⌋+1 is computed with a round-to-6dp guard before
    the floor: in doubles ``1.0 − 0.8 = 0.19999999999999996``, so for
    n=10 the raw product is 1.9999999999999996 and a bare floor yields
    prefix 2 where the theorem requires 3 — which silently DROPPED a
    jaccard-exactly-0.8 subset pair at sf0.1. Rounding first can only
    enlarge the prefix (more candidates, never fewer), so exactness is
    preserved in the safe direction.

    Output: (id_a, id_b, inter, size_a, size_b, jaccard) with id_a < id_b.
    """
    from pyspark.sql import Window

    arrays = shingle_arrays(df, id_col, text, n, materialize=True)
    # shingles are per-doc distinct (array_distinct in shingle_arrays),
    # so the set size rides along from the array — no count window
    sh = arrays.select(
        F.col(id_col),
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("shingle"),
    )
    doc_freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy(id_col)
    ranked = sh.join(doc_freq, "shingle").withColumn(
        "rn",
        F.row_number().over(w_doc.orderBy(F.col("df"), F.col("shingle"))),
    )
    # (r15 A/B: an eager checkpoint of the prefix — the w2/homologs
    # self-join trick — was tried and REVERTED: 2.4-3.1 → 3.4-3.9 s.
    # Unlike those cases the doubled subtree here is cheap relative to
    # the candidate join, and the synchronous barrier costs more than
    # the recompute it saves; the two aliased branches pipeline inside
    # one job.)
    # (r16 A/B #2: replacing this self-join with ONE groupBy(shingle) +
    # collect_list + in-array pair expansion produced the IDENTICAL
    # candidate set (43543 pairs, symdiff 0 at sf0.1) but measured
    # 2.70 vs 1.71 s end-to-end — the ObjectHashAggregate + nested
    # lambda expansion costs more than the pipelined duplicate subtree.
    # REVERTED. r16 A/B #1, in shingle_arrays: unrolled
    # concat_ws(element_at…) per shingle instead of
    # array_join(slice(…)) — bit-identical, 2× slower. REVERTED. With
    # three independent restructures all measured worse, this operator's
    # shape stands as the measured optimum; see OPTIMIZATION_r16.md.)
    prefix = ranked.filter(
        F.col("rn")
        <= F.floor(F.round((1.0 - threshold) * F.col("n_shingles"), 6)).cast("int")
        + 1
    ).select(id_col, "n_shingles", "shingle")
    # length filter: jaccard ≥ t forces min(|a|,|b|) ≥ t·max(|a|,|b|);
    # the 1e-6 slack keeps exact-boundary pairs that float rounding of
    # t·max would wrongly exclude (pruning may only over-admit — the
    # verify step is exact either way)
    candidates = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(
            (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(F.col("a.n_shingles"), F.col("b.n_shingles")).cast("double")
                >= threshold
                * F.greatest(F.col("a.n_shingles"), F.col("b.n_shingles"))
                - 1e-6
            )
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return _verify_jaccard(arrays, candidates, id_col, threshold)


def _verify_jaccard(
    arrays: DataFrame, candidates: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidate pairs
    against per-doc shingle arrays — O(candidates), shared by the
    prefix-filter join and the LSH candidate path (which must NOT pay
    for the full exact join just to verify its own candidates)."""
    aa = arrays.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("__sa"))
    bb = arrays.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("__sb"))
    return (
        candidates.join(aa, "id_a")
        .join(bb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sa", "__sb")).cast("long").alias("inter"),
            F.size("__sa").cast("long").alias("size_a"),
            F.size("__sb").cast("long").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    k: int = 2,
    q: int = 3,
) -> DataFrame:
    """EXACT bounded edit-distance near-dup join: all pairs with
    ``levenshtein(text_a, text_b) <= k``, for strings of length
    ≥ ``q·(k+1)`` (shorter strings carry no q-gram guarantee — filter
    them upstream or lower q). The typo/variant-title dedup semantic
    that token-set jaccard and MinHash cannot express (a one-character
    edit inside a word changes every covering shingle).

    Candidate generation is the Ed-Join prefix filter (Xiao, Wang, Lin,
    VLDB'08) over POSITIONAL character q-grams: an edit operation
    destroys at most ``q`` of a string's ``len−q+1`` grams and shifts
    survivors by at most ``k`` positions, so ed ≤ k leaves at most
    ``k·q`` grams of each side unmatched — a matching gram pair with
    position gap ≤ k must therefore fall inside each side's
    ``k·q + 1`` globally-rarest grams. The candidate equi-join runs
    only over that prefix; frequent stop-grams never enter the join.
    Exactness: prefix bound (theorem, not heuristic) + length-difference
    band ≤ k + final exact ``levenshtein`` verify — results equal the
    naive all-pairs formulation, which is exactly how the catalog
    oracle states it.

    Scale: gram explode + one df-count shuffle + prefix self-equi-join
    (shuffles only (k·q+1) rows per doc) + candidate-pair verify.
    Verification is per-pair O(len²) JVM levenshtein on candidates
    only; never n² on the corpus.

    Output: (id_a, id_b, dist) with id_a < id_b, dist ≤ k.
    """
    from pyspark.sql import Window

    min_len = q * (k + 1)
    base = df.select(
        F.col(id_col), F.col(text).alias("__t"), F.length(text).alias("__len")
    ).filter(F.col("__len") >= min_len)

    n_grams = F.col("__len") - q + 1
    grams = base.select(
        F.col(id_col),
        F.col("__len"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.col("__t").substr(i, F.lit(q)),
            )
        ).alias("pos", "gram"),
    )
    doc_freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy(id_col)
    prefix = (
        grams.join(doc_freq, "gram")
        .withColumn(
            "rn",
            F.row_number().over(
                w_doc.orderBy(F.col("df"), F.col("gram"), F.col("pos"))
            ),
        )
        .filter(F.col("rn") <= k * q + 1)
        .select(id_col, "__len", "gram", "pos")
    )
    candidates = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= k),
        )
        .filter(
            (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.abs(F.col("a.__len") - F.col("b.__len")) <= k)
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ta = base.select(F.col(id_col).alias("id_a"), F.col("__t").alias("__ta"))
    tb = base.select(F.col(id_col).alias("id_b"), F.col("__t").alias("__tb"))
    return (
        candidates.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__ta", "__tb").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= k)
    )


# --------------------------------------------------------------------------
# benchmark contamination scan (decontamination)
# --------------------------------------------------------------------------

def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark-contamination scan — the decontamination pass every
    training-data pipeline runs before a corpus ships: flag corpus
    documents that share any word ``n``-gram with a held-out benchmark
    set (the n-gram-collision test popularized by the GPT-3/PaLM data
    cards, typically n≈8-13).

    Returns one row per CONTAMINATED corpus doc: ``(id, n_grams,
    n_hit, hit_ratio)`` where ``n_hit`` counts the doc's distinct
    n-grams that occur anywhere in the benchmark and ``hit_ratio`` =
    n_hit / n_grams rounded to 4 dp.

    Scale shape: benchmark suites are tiny (thousands of docs) next to a
    100 TB corpus, so the benchmark's distinct-gram set is BROADCAST —
    the corpus side is a map-side shingle scan + hash-probe, and the only
    shuffle is the per-doc hit count keyed by doc id. Same tokenization
    as the jaccard/minhash family (``shingle_arrays``), so one shingle
    pass can feed dedup and decontamination together.
    """
    arrays = shingle_arrays(corpus, id_col, text, n, materialize=True)
    corpus_grams = arrays.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    bench_grams = (
        shingles(benchmark, id_col, text, n).select("shingle").distinct()
    )
    # shingle_arrays dedupes per doc, so a plain count is the distinct-hit count
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    sizes = arrays.select(F.col(id_col), F.size("shingles").cast("long").alias("n_grams"))
    return sizes.join(hits, id_col, "inner").select(
        F.col(id_col),
        "n_grams",
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("hit_ratio"),
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

#: Mersenne prime 2^31-1 — the modulus of the universal hash family. All
#: intermediates stay < 2^62, so the arithmetic is exact int64 on any engine.
MERSENNE31 = (1 << 31) - 1


def hash_family(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """(a_i, b_i) coefficients of the universal family
    h_i(x) = (a_i·x + b_i) mod (2^31−1), seeded → reproducible everywhere."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(num_hashes)
    ]


def _md5_base31(col):
    """Portable 31-bit base hash: first 8 md5 hex chars → int, mod 2^31−1.
    md5 is bit-identical on every engine (Spark/DuckDB/python), which makes
    every sketch built on it oracle-checkable — unlike xxhash64."""
    return (
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")
        % MERSENNE31
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 7,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    (a_i·md5_31(shingle) + b_i) mod 2^31−1.

    ONE md5 per shingle + ``num_hashes`` integer affine maps — cheaper
    than num_hashes independent string hashes, and fully portable (the
    same signature is computable in plain SQL, which is how the catalog
    oracle checks this sketch end-to-end). One exploded shingle table →
    all min-aggregations in a single map-side-combinable groupBy.
    """
    sh = shingles(df, id_col, text, n, materialize=True)
    return _signatures_from_shingles(sh, id_col, num_hashes, seed)


def _signatures_from_shingles(
    sh: DataFrame, id_col: str, num_hashes: int, seed: int
) -> DataFrame:
    """Signature aggregation over a precomputed (id, shingle) table —
    split out so callers that ALSO need the shingles (LSH verify,
    incremental dedup) compute them once, not once per consumer."""
    hashed = sh.withColumn("__bm", _md5_base31(F.col("shingle")))
    mins = [
        F.min((F.lit(a) * F.col("__bm") + F.lit(b)) % MERSENNE31).alias(f"h{i}")
        for i, (a, b) in enumerate(hash_family(num_hashes, seed))
    ]
    sig = hashed.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def _banded_buckets(
    df: DataFrame,
    id_col: str,
    text: str,
    n: int,
    num_hashes: int,
    bands: int,
    seed: int,
) -> DataFrame:
    """(id, band, bucket) rows for banded LSH: each band's bucket is the
    xxhash64 of its signature slice — an equi-joinable stand-in for
    "all rows of this band agree" (distinct-tuple collisions are ~2^-64).
    Standalone convenience form; minhash_lsh_pairs and incremental_dedup
    build bands via _bands_from_signatures over shingles they already
    computed (one corpus pass). In production the OUTPUT here is what a
    dedup service persists between runs."""
    sig = minhash_signatures(df, id_col, text, n, num_hashes, seed)
    return _bands_from_signatures(sig, id_col, num_hashes, bands)


def _bands_from_signatures(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    rows_per_band = num_hashes // bands
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("signature")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified by exact
    shingle Jaccard.

    num_hashes/bands rows per band; a pair is a candidate iff some band's
    sub-signature matches exactly — an equi-join on (band, hash(band
    slice)), never an all-pairs scan. Candidates are then verified with
    the exact Jaccard (ngram_jaccard_pairs semantics) so the output has no
    LSH false positives; false-negative rate is governed by the
    (bands, rows) S-curve.

    The signature family is md5-based (portable), so the ENTIRE sketch —
    signatures, band agreement, verification — has an exact SQL twin; the
    catalog oracle replays it brute-force in DuckDB and must match.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ verify_threshold.
    """
    # ONE materialized shingle-array pass feeds BOTH the signature
    # aggregation and the verify join (pre-refactor each computed its
    # own shingles — two O(tokens²) corpus passes for one operator)
    arrays = shingle_arrays(df, id_col, text, n, materialize=True)
    sh = arrays.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    sig = _signatures_from_shingles(sh, id_col, num_hashes, seed)
    banded = _bands_from_signatures(sig, id_col, num_hashes, bands)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # verify the LSH candidates DIRECTLY against the shingle arrays —
    # O(candidates). (Pre-round-9 this intersected with the FULL exact
    # prefix-filter join, paying the entire exact-join cost and making
    # the sketch pointless for performance: 6.2 → 2.6 s at sf0.1, and
    # at 100 TB the difference between O(candidates) and O(all pairs).)
    return _verify_jaccard(arrays, cand, id_col, verify_threshold).select(
        "id_a", "id_b", "jaccard"
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Each distinct token votes its hash bits (+1/−1); the fingerprint sets
    bit i where the vote sum is positive. Entirely higher-order array
    expressions over the exploded token table — one shuffle, no UDF.

    The 64 token-hash bits come from md5 (two 32-bit halves of the first
    16 hex chars), so the fingerprint — and therefore the whole near-dup
    operator — is reproducible in plain SQL on any engine with md5; the
    catalog oracle recomputes it brute-force in DuckDB.
    """
    toks = F.filter(F.split(_norm(F.col(text)), r"[^a-z0-9]+"), lambda t: t != "")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    tok = df.repartition(parallelism).select(
        F.col(id_col), F.explode(F.array_distinct(toks)).alias("token")
    )
    md5 = F.md5(F.col("token").cast("binary"))
    lo = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    hi = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    tok = tok.withColumn("h", F.shiftleft(hi, 32).bitwiseOR(lo))

    def mask(i: int) -> int:  # signed-64 representation of bit i
        return (1 << i) if i < 63 else -(1 << 63)

    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(mask(i))) != 0, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fingerprint = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(mask(i))).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint.bitwiseOR(bit)
    return agg.select(id_col, fingerprint.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming between SimHashes.

    Pigeonhole banding: split 64 bits into (max_hamming+1) bands; any pair
    within distance k agrees exactly on ≥1 band → equi-join per band on the
    band value, then verify the true Hamming distance with bit_count(xor).
    """
    nbands = max_hamming + 1
    width = 64 // nbands
    sh = simhash(df, id_col, text)
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("chunk"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.chunk")
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "chunk"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------------------
# Duplicate clusters (pairs → groups)
# --------------------------------------------------------------------------

def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Assign every document a duplicate-cluster id from near-dup PAIRS.

    The step after any pair generator (jaccard / MinHash / SimHash /
    embedding-cosine): pairs are edges of the duplicate graph; connected
    components give the groups; docs in no pair become singletons. The
    canonical survivor of each cluster is its minimum id (= the component
    label), so "keep one per cluster" is ``filter(doc_id == cluster_id)``.

    Output: (id_col, cluster_id, cluster_size) for EVERY row of ``df``.
    """
    from pyspark.sql import Window

    from gramene_mongodb_spark.operators.closure import connected_components

    comp = connected_components(pairs, pair_a, pair_b)
    out = (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .join(comp, F.col(id_col) == F.col("vertex"), "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id")
    return out.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w).cast("long")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup
# --------------------------------------------------------------------------

def _unit_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, u) with u = vec / ||vec|| as array<double> — normalizing once
    per row makes every downstream cosine a plain dot product."""
    from gramene_mongodb_spark.operators.similarity import _norm as _vnorm

    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("__v"),
    ).select(
        "id",
        F.transform(
            "__v", lambda x: x.cast("double") / _vnorm(F.col("__v"))
        ).alias("u"),
    )


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_to: int | None = None,
) -> DataFrame:
    """EXACT embedding near-dup: every pair with cosine ≥ threshold.

    Theta self-join (id_a < id_b) over unit-normalized vectors — O(n²)
    pair evaluations, all JVM-side (zip_with/aggregate dot product).
    This is the correctness baseline / oracle twin; at 100 TB use
    ``embedding_lsh_near_pairs``, which produces the same pairs minus the
    LSH false-negative tail but only evaluates banded candidates.

    ``round_to`` rounds BEFORE the threshold filter so the kept set is
    identical across engines with different float-summation order.
    Output: (id_a, id_b, cosine) with id_a < id_b.
    """
    from gramene_mongodb_spark.operators.similarity import _dot

    side = _unit_vectors(df, id_col, vec_col)
    # spread the STREAMED side before the nested-loop join: a compacted
    # embeddings table arrives as ~1 parquet split, and the O(n²) dot
    # products would otherwise run in ONE task (measured 25 → 3 s at
    # sf0.1 — the x_video_shots plan-collapse family). The other side
    # broadcasts, so every core evaluates its slice of the pair grid.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    a = side.repartition(parallelism).select(
        F.col("id").alias("id_a"), F.col("u").alias("__ua")
    )
    b = side.select(F.col("id").alias("id_b"), F.col("u").alias("__ub"))
    cos = _dot(F.col("__ua"), F.col("__ub"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        # no broadcast HINT: under the auto-broadcast threshold Catalyst
        # broadcasts b on its own (giving each of the 32 tasks its slice
        # of the pair grid); above it, forcing the hint would turn a
        # slow-but-finishing plan into an 8GB-limit hard failure
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_lsh_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 7,
    round_to: int | None = None,
) -> DataFrame:
    """Embedding near-dup via random-hyperplane (SimHash-for-vectors) LSH.

    1. signature: bit i = sign(v · plane_i) for ``n_planes`` seeded
       Gaussian hyperplanes — computed as JVM zip_with/aggregate dots
       against literal plane arrays (no Python in the scan);
    2. banding: bits split into ``bands`` bands of n_planes/bands rows;
       candidates = pairs agreeing exactly on ≥1 band — an equi-join on
       (band, bucket), never all-pairs;
    3. verify: candidates' true cosine computed exactly; pairs below
       ``threshold`` dropped, so output has no LSH false positives.

    P(bit match) = 1 − θ/π; with 8 bands × 2 rows, recall at cosine 0.4
    is ≈0.98 and climbs toward 1 for truer near-dups. At 100 TB the
    banded join shuffles ``bands`` rows per vector; the verify join
    touches candidates only.  Output: (id_a, id_b, cosine), id_a < id_b.
    """
    import numpy as np

    from gramene_mongodb_spark.operators.similarity import _dot

    planes = np.random.RandomState(seed).standard_normal((n_planes, dim))
    rows_per_band = n_planes // bands
    # fail LOUDLY on a dim mismatch: zip_with against a shorter/longer
    # literal plane null-pads, silently producing NULL buckets and an
    # empty/partial candidate set
    # coalesce: a NULL vector makes size() NULL, which would both route to
    # the error branch via a NULL condition AND null out the concat'd
    # diagnostic — keep the failure loud and the message intact
    obs_dim = F.coalesce(F.size("u"), F.lit(-1))
    unit = _unit_vectors(df, id_col, vec_col).withColumn(
        "u",
        F.when(obs_dim == dim, F.col("u")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"embedding_lsh_near_pairs: expected dim={dim}, got "),
                    obs_dim.cast("string"),
                )
            )
        ),
    )
    # spread + materialize ONCE: a compacted embeddings table arrives
    # as ~1 parquet split, so the n_planes dot products would run in a
    # single task; and `unit` feeds THREE consumers (signatures + both
    # verify sides), which would recompute the normalization per branch
    # (plan-collapse family; 6.8 → 2.0 s at sf0.1). Checkpointing also
    # fires the dim guard eagerly — bad input fails before any join.
    unit = unit.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)

    bit_cols = []
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(w)) for w in planes[i]])
        proj = F.aggregate(
            F.zip_with(F.col("u"), plane, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit_cols.append((proj >= 0).cast("int").alias(f"__b{i}"))
    sig = unit.select("id", "u", *bit_cols)

    band_structs = []
    for b in range(bands):
        bucket = F.lit(0)
        for j in range(rows_per_band):
            bucket = bucket + F.col(f"__b{b * rows_per_band + j}") * F.lit(1 << j)
        band_structs.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    banded = sig.select(
        "id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "bb.band", "bb.bucket")

    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    ua = unit.select(F.col("id").alias("id_a"), F.col("u").alias("__ua"))
    ub = unit.select(F.col("id").alias("id_b"), F.col("u").alias("__ub"))
    cos = _dot(F.col("__ua"), F.col("__ub"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        cand.join(ua, "id_a")
        .join(ub, "id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def incremental_dedup(
    history: DataFrame,
    delta: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Delta-vs-corpus near-dup screening — the DAILY shape of production
    dedup: the historical corpus is already deduplicated, so only the
    incoming batch needs checking, against history AND within itself.
    History×history pairs NEVER form — the candidate join is asymmetric
    (delta band buckets probe the corpus index), which is what makes
    day-N dedup cost O(|delta| · collision rate), not O(|corpus|²).

    A delta doc is a duplicate iff it band-matches (MinHash ``bands``
    over ``num_hashes`` md5-affine signatures, same family as
    minhash_lsh_pairs) and hash-verifies (Jaccard ≥ ``verify_threshold``
    over ``xxhash64(shingle)`` keys — near-exact: a cross-doc 64-bit
    collision inflates the intersection with probability ≈ |A|·|B|/2⁶⁴
    per pair, negligible at any real shingle-set size, and 64-bit keys
    keep the verify shuffle fixed-width instead of text-width) against
    a history doc, or against a delta doc
    with a SMALLER id (leader-by-id within the batch, so one batch of
    mutual dups keeps exactly one). ``dup_of`` is the minimum matching
    counterpart id — deterministic across engines.

    In production history's (id, band, bucket) rows and shingle sets are
    PERSISTED artifacts of the previous run (`_banded_buckets` is the
    index format); recomputing them here keeps the operator
    self-contained and oracle-checkable without changing the plan shape:
    either way the join is delta-bucket → corpus-bucket equi-join,
    verification touches only candidate ids, and nothing is ever
    all-pairs.

    Output: one row per delta doc — (id, kept, dup_of, n_matches).

    Precondition: history and delta id spaces should be disjoint (the
    daily shape guarantees it — history is the prior runs' keepers).
    An id appearing on both sides is tolerated only when both texts are
    identical (the self-pair is filtered; its shingle sets coincide);
    same id with DIFFERENT texts merges shingle sets and corrupts the
    Jaccard — don't do that.
    """
    # ONE materialized shingle pass for BOTH sides feeds banding AND
    # the exact-verify join below: a side tag rides through
    # shingle_arrays so the corpus is scanned, tokenized, repartitioned
    # and checkpointed once, not once per side (the sides are usually
    # slices of the same table; two separate passes paid the job
    # overhead twice — measured ~1.5 s of the entry's wall at sf0.1).
    tagged = (
        history.select(F.col(id_col), F.col(text))
        .withColumn("__hist", F.lit(True))
        .unionByName(
            delta.select(F.col(id_col), F.col(text))
            .withColumn("__hist", F.lit(False))
        )
    )
    arr = shingle_arrays(
        tagged, id_col, text, n, materialize=True, keep=("__hist",)
    )
    sh_all = arr.select(
        id_col, "__hist", F.explode("shingles").alias("shingle")
    )
    sh_h = sh_all.filter(F.col("__hist")).drop("__hist")
    sh_d = sh_all.filter(~F.col("__hist")).drop("__hist")
    hb = _bands_from_signatures(
        _signatures_from_shingles(sh_h, id_col, num_hashes, seed),
        id_col, num_hashes, bands,
    )
    # delta bands are referenced TWICE (history probe + within-delta
    # self-join); without severing, Catalyst re-runs the 64-min
    # signature aggregate once per reference. The table is delta-sized
    # × bands (tiny — and in production it IS a persisted artifact, so
    # materializing it here matches the deployment shape).
    db = hard_checkpoint(
        _bands_from_signatures(
            _signatures_from_shingles(sh_d, id_col, num_hashes, seed),
            id_col, num_hashes, bands,
        )
    )

    cand_h = (
        db.alias("d")
        .join(hb.alias("h"), ["band", "bucket"])
        # PRECONDITION: history and delta id spaces are disjoint (true
        # for the daily shape — history = prior runs' keepers). An id on
        # BOTH sides would otherwise self-candidate here (Jaccard 1 →
        # the delta doc reported as dup_of itself) AND the unioned
        # shingle table below would merge the two texts' shingle sets;
        # the filter kills the self-pair, and re-dup of a resubmitted id
        # against OTHER docs still verifies correctly when both texts
        # are identical (distinct shingle union == either set).
        .filter(F.col(f"d.{id_col}") != F.col(f"h.{id_col}"))
        .select(
            F.col(f"d.{id_col}").alias("new_id"),
            F.col(f"h.{id_col}").alias("src_id"),
        )
    )
    cand_d = (
        db.alias("x")
        .join(db.alias("y"), ["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"y.{id_col}").alias("new_id"),
            F.col(f"x.{id_col}").alias("src_id"),
        )
    )
    # candidate pairs are collision-sized (tiny) and referenced twice
    # below (the verify join AND the candidate-id semi-join) — sever
    cand = hard_checkpoint(cand_h.unionByName(cand_d).distinct())

    # shingle-Jaccard verification, candidates only — keyed on
    # xxhash64(shingle), the leakage-matrix trick: 8 B/row through the
    # distinct, both verify joins and the size agg instead of shingle
    # TEXT (local wall is flat — the minhash signature pass dominates
    # CPU — but on a network-bound cluster the exchange shrinks by the
    # text/8B ratio, the same win measured for source_leakage_matrix).
    # Identity is all the
    # intersection count needs; a collision merges two shingles with
    # probability ≈ |S|²/2⁶⁵ and moves inter/n_sh by ±1 inside
    # shingle-vocabulary-sized Jaccard terms — it could only flip a
    # pair sitting EXACTLY on the verify threshold, the same
    # immateriality argument documented at source_leakage_matrix.
    # verification touches CANDIDATE ids only — semi-join the corpus
    # shingle table down before the distinct, so the 8-byte exchange is
    # candidate-sized, not corpus-sized (history docs that never
    # band-matched cannot affect any verdict)
    need = (
        cand.select(F.col("new_id").alias(id_col))
        .unionByName(cand.select(F.col("src_id").alias(id_col)))
        .distinct()
    )
    sh = (
        sh_h.unionByName(sh_d)
        .join(need, id_col, "left_semi")
        .select(id_col, F.xxhash64("shingle").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(
            sh.select(F.col(id_col).alias("src_id"), "shingle"), "src_id"
        )
        .join(
            sh.select(F.col(id_col).alias("new_id"), "shingle"),
            ["new_id", "shingle"],
        )
        .groupBy("new_id", "src_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    verified = (
        inter.join(
            sizes.select(F.col(id_col).alias("src_id"), F.col("n_sh").alias("na")),
            "src_id",
        )
        .join(
            sizes.select(F.col(id_col).alias("new_id"), F.col("n_sh").alias("nb")),
            "new_id",
        )
        .filter(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
            >= verify_threshold
        )
    )
    matches = verified.groupBy("new_id").agg(
        F.min("src_id").alias("dup_of"),
        F.count(F.lit(1)).cast("long").alias("n_matches"),
    )
    return (
        delta.select(id_col)
        .join(matches.withColumnRenamed("new_id", id_col), id_col, "left")
        .select(
            id_col,
            F.when(F.col("dup_of").isNull(), 1).otherwise(0).cast("long").alias("kept"),
            "dup_of",
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias("n_matches"),
        )
    )


def source_leakage_matrix(
    df: DataFrame,
    group: str = "source",
    text: str = "text",
    n: int = 3,
    max_groups_per_shingle: int = 50,
) -> DataFrame:
    """Pairwise cross-source leakage matrix — the release-engineering
    artifact "which corpus sources share content with which": per
    unordered source pair, the exact Jaccard overlap of their word
    n-gram shingle vocabularies. `contamination_check` answers
    corpus-vs-ONE-benchmark; this answers all-sources-vs-each-other in
    one pass (dedup auditing, licensing triage, mixture design).

    Shingles present in more than ``max_groups_per_shingle`` sources
    are dropped BEFORE the pair expansion — they carry no
    discriminative signal (the ngram_jaccard stop-shingle argument) and
    they are exactly what makes a naive shingle self-join explode: the
    fan-out per shingle is bounded by ``max_groups_per_shingle²``
    regardless of corpus size. Sizes and Jaccard are defined over the
    KEPT (discriminative) shingles, replayed identically by the oracle.
    Measured ceiling (SCALE.md sixteenth probe): 10× corpus with 10×
    sources — ~100× the uncapped pair space — costs wall ×3.0, because
    the cap drops over-shared shingles before any pair forms.

    Output: (src_a < src_b, n_shared, n_a, n_b, jac6) with ``jac6`` the
    integer micro-Jaccard ``n_shared·1e6 / (n_a + n_b − n_shared)``
    computed by overflow-free split division.

    Scale: one (group, shingle-hash) distinct, one hash-keyed count,
    one bounded self-join, and group-keyed size aggregates joined back
    as broadcasts (group count is small). The corpus shuffles once —
    and what shuffles is ``xxhash64(shingle)`` (8 bytes/row), not the
    shingle text: the same prefilter trick as ``exact_substring_spans``
    applied to the whole pipeline, since every downstream consumer
    (distinct, df-count, self-join, sizes) only needs shingle IDENTITY,
    never its bytes. Collisions merge two distinct shingles with
    probability ≈ |S|²/2⁶⁵ (≈3e-5 at a trillion distinct shingles) and
    shift a single count by ±1 out of group-vocabulary-sized
    denominators — immaterial at micro-Jaccard precision, which is why
    no text join-back verify pass is spent here (unlike substring
    dedup, where a collision would flip a binary keep/cut decision).
    """
    # materialize=True is load-bearing for PARALLELISM, not just reuse:
    # the shuffled text bytes are small, so AQE coalesces the
    # repartition exchange to ~1 partition and the O(tokens²) shingle
    # compute goes single-threaded (the x_video_shots plan-collapse
    # lesson, f848000); the eager checkpoint pins the 32-way spread
    arrays = shingle_arrays(
        df.select(F.col(group).alias("__grp"), F.col(text)),
        "__grp",
        text,
        n,
        materialize=True,
    )
    gx = (
        arrays.select("__grp", F.explode("shingles").alias("shingle"))
        .select("__grp", F.xxhash64("shingle").alias("sh"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds bound + sizes + both join sides
    )
    ng = gx.groupBy("sh").agg(F.count(F.lit(1)).alias("__ng"))
    kept = gx.join(
        ng.filter(F.col("__ng") <= max_groups_per_shingle).select("sh"),
        "sh",
    )
    sizes = kept.groupBy("__grp").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    inter = (
        kept.alias("a")
        .join(kept.alias("b"), "sh")
        .filter(F.col("a.__grp") < F.col("b.__grp"))
        .groupBy(
            F.col("a.__grp").alias("src_a"), F.col("b.__grp").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("__grp").alias("src_a"), F.col("n_sh").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("__grp").alias("src_b"), F.col("n_sh").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr(
                "(n_shared div (n_a + n_b - n_shared)) * 1000000"
                " + ((n_shared % (n_a + n_b - n_shared)) * 1000"
                "    div (n_a + n_b - n_shared)) * 1000"
                " + (((n_shared % (n_a + n_b - n_shared)) * 1000"
                "     % (n_a + n_b - n_shared)) * 1000)"
                "   div (n_a + n_b - n_shared)"
            ).alias("jac6"),
        )
    )
