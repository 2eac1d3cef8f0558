"""Relational operator library (SURVEY.md §2.2-2.8).

Every helper returns a lazily-composed DataFrame; nothing collects.
Each docstring cites the reference behavior it re-expresses
(file:line into /root/reference) and states the scale story: what
partitioning/broadcast/pushdown strategy makes it hold at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# J1 — broadcast LUT decoration join
# --------------------------------------------------------------------------

def decorate_join(
    facts: DataFrame,
    lut: DataFrame,
    on: str | list[str],
    defaults: dict[str, Column] | None = None,
) -> DataFrame:
    """Broadcast hash left-outer enrich join (J1).

    Reference: the universal in-memory-LUT pattern (`search/doc_merger.js:12-28`,
    `search/genetree_adder.js:259-278`, `search/pathway_adder.js:70-85` …):
    build a hash from one whole source, stream the other side through it,
    non-matching rows pass through unchanged.

    Spark-first: ``facts.join(broadcast(lut), on, "left")``; ``defaults``
    supplies per-column fallbacks (the reference's ``row.name ? … : …``
    conditional defaulting).

    Scale: the LUT side must fit in executor memory (it is the reference's
    8 GB Node heap, but per-executor); the fact side never shuffles — this
    is a map-side join at any scale.
    """
    out = facts.join(F.broadcast(lut), on=on, how="left")
    if defaults:
        for col_name, default in defaults.items():
            out = out.withColumn(col_name, F.coalesce(F.col(col_name), default))
    return out


# --------------------------------------------------------------------------
# J2 — case-insensitive fallback join
# --------------------------------------------------------------------------

def ci_fallback_join(
    facts: DataFrame,
    lut: DataFrame,
    fact_key: str,
    lut_key: str,
) -> DataFrame:
    """Exact-then-uppercase fallback join (J2).

    Reference: ``search/doc_merger.js:20-25`` tries ``lut[id]`` then
    ``lut[id.toUpperCase()]``; ``search/pathway_adder.js:33-34,77``
    upper-cases both sides at build time.

    Spark-first: two broadcast left joins — one exact, one on
    ``upper(key)`` — then ``coalesce`` exact-match columns over fallback
    columns. Both joins are map-side; no shuffle at any scale.
    The exact match wins; the fallback only fills rows the exact join
    missed (matching the reference's short-circuit order).
    """
    payload_cols = [c for c in lut.columns if c != lut_key]
    exact = lut.select(
        F.col(lut_key).alias("__k_exact"),
        *[F.col(c).alias(f"__e_{c}") for c in payload_cols],
    )
    upper = (
        lut.select(
            F.upper(F.col(lut_key)).alias("__k_upper"),
            *[F.col(c).alias(f"__u_{c}") for c in payload_cols],
        )
        # several LUT keys may collapse onto one uppercased key; keep a
        # deterministic winner (min over payload) instead of fanning out
        .groupBy("__k_upper")
        .agg(*[F.min(f"__u_{c}").alias(f"__u_{c}") for c in payload_cols])
    )
    out = (
        facts.join(F.broadcast(exact), facts[fact_key] == exact["__k_exact"], "left")
        .join(F.broadcast(upper), F.upper(facts[fact_key]) == upper["__k_upper"], "left")
    )
    for c in payload_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__e_{c}"), F.col(f"__u_{c}")))
    return out.drop("__k_exact", "__k_upper", *[f"__e_{c}" for c in payload_cols],
                    *[f"__u_{c}" for c in payload_cols])


# --------------------------------------------------------------------------
# A5 / W4 — argmax (top-1 per group with deterministic tie-break)
# --------------------------------------------------------------------------

def argmax_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Top-1 per group (A5) — canonical-transcript selection semantics.

    Reference: ``search/decorate.js:48-80`` picks the transcript with the
    longest translation, ties broken by longest transcript. The reference's
    further ties are input-order-dependent (SURVEY.md §7 risk 3); callers
    MUST append a unique key to ``order_by`` to pin determinism.

    Spark-first: ``row_number`` window, filter rank==1. Scale: one shuffle
    on the group key; skewed groups are fine (window is per-key linear).
    For top-1 specifically, Catalyst can also use ``max_by``; row_number
    generalizes to top-k.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# K10 / J7 — arithmetic binning
# --------------------------------------------------------------------------

def bin_fixed_width(df: DataFrame, value: str | Column, width: float, out: str = "bin") -> DataFrame:
    """Uniform-width binning (K10/J7).

    Reference: ``search/bin_adder.js:35-60`` maps (taxon, region, start) to
    genome-wide bin ids via per-region cumulative offsets + integer division.
    With the offset pre-joined (broadcast), the bin id is pure arithmetic —
    no UDF, fully codegen'd, zero shuffle.
    """
    v = F.col(value) if isinstance(value, str) else value
    return df.withColumn(out, F.floor(v / F.lit(width)).cast("long"))


# --------------------------------------------------------------------------
# J5 — interval containment join
# --------------------------------------------------------------------------

def containment_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_lo: str,
    point_hi: str,
    ival_lo: str,
    ival_hi: str,
    how: str = "inner",
) -> DataFrame:
    """Interval containment join (J5): keep (point, interval) pairs where
    the interval fully contains the point range, inclusive on both ends.

    Reference: QTL containment ``search/qtl_adder.js:41-68``
    (``q.start <= g.start && q.end >= g.end``), binary-search over sorted
    intervals per (map, region).

    Spark-first: equi-join on the partition keys (``on`` — e.g.
    (map, region)) with the containment range predicate; Catalyst executes
    it as a shuffled equi-join with a post-filter, so the cost is bounded
    by the per-key pair count, NOT a full cross product. Scale: the equi
    keys must be selective (they are: per-region); for huge per-key
    cardinalities add a coarse bin key on both sides (bin_fixed_width on
    lo) to subdivide, or broadcast the interval side when small — the
    reference's sorted-array binary search is the single-node special case.
    """
    pred = (
        (intervals[ival_lo] <= points[point_lo])
        & (intervals[ival_hi] >= points[point_hi])
    )
    for k in on:
        pred = (points[k] == intervals[k]) & pred
    return points.join(intervals, pred, how)


# --------------------------------------------------------------------------
# K6 — interval-set merge (union of overlapping intervals)
# --------------------------------------------------------------------------

def merge_intervals(
    df: DataFrame,
    group_by: Sequence[str],
    lo: str,
    hi: str,
) -> DataFrame:
    """Merge overlapping intervals per group into maximal spans (K6).

    Reference: ``trees/add_domains_to_tree.js:63-85`` merges overlapping
    same-id protein features into maximal intervals.

    Spark-first (no UDF): the classic running-max trick —
    a new span starts where ``lo`` exceeds the running ``max(hi)`` of all
    preceding intervals; the span id is the running sum of those starts.
    Two window passes over one shuffle on the group key; per-group work is
    linear, so one giant group degrades gracefully (single-task linear
    scan) rather than blowing memory.

    Returns one row per merged span: group keys + ``lo``/``hi`` bounds and
    ``n_merged`` source-interval count.
    """
    order = Window.partitionBy(*group_by).orderBy(F.col(lo), F.col(hi))
    prev_max = (
        F.max(F.col(hi)).over(order.rowsBetween(Window.unboundedPreceding, -1))
    )
    flagged = df.withColumn(
        "__new_span",
        F.when(F.col(lo) > prev_max, F.lit(1)).otherwise(F.lit(0)),
    )
    spans = flagged.withColumn(
        "__span_id",
        F.sum("__new_span").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        spans.groupBy(*group_by, "__span_id")
        .agg(
            F.min(lo).alias(lo),
            F.max(hi).alias(hi),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__span_id")
    )


# --------------------------------------------------------------------------
# A3 — sessionization (group-adjacent by gap)
# --------------------------------------------------------------------------

def sessionize(
    df: DataFrame,
    group_by: Sequence[str],
    ts: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization (A3 generalized).

    Reference: the group-adjacent streaming pattern
    (``trees/genetree.js:36-73`` accumulates consecutive rows with the same
    key and flushes on key change). The time-gap variant is the same
    lag+cumsum shape and is what the ``events`` extension table needs.

    Spark-first: ``lag(ts)`` per key, flag gaps > ``gap_seconds``, running
    sum → session id. One shuffle on the group key; linear per key.

    The gap test is whole-second (floor-to-second on both endpoints, like
    ``floor(epoch(ts))`` deltas) and is computed with wall-clock interval
    arithmetic, never a cast-to-long: TIMESTAMP_NTZ forbids that cast, and
    interval comparison is timezone-independent for both timestamp flavors.
    Numeric ``ts`` columns (already epoch seconds) keep the plain subtract.

    Adds a ``session_id`` column (0-based per group).
    """
    order = Window.partitionBy(*group_by).orderBy(F.col(ts), *[F.col(c) for c in tiebreak])
    prev_ts = F.lag(F.col(ts)).over(order)
    if dict(df.dtypes).get(ts, "").startswith("timestamp"):
        sec = F.date_trunc("second", F.col(ts))
        prev_sec = F.lag(sec).over(order)
        is_gap = sec > prev_sec + F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    else:
        is_gap = (F.col(ts).cast("long") - prev_ts.cast("long")) > gap_seconds
    flagged = df.withColumn(
        "__new_sess",
        F.when(prev_ts.isNull() | is_gap, F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        flagged.withColumn(
            "session_id",
            F.sum("__new_sess").over(order.rowsBetween(Window.unboundedPreceding, 0)) - 1,
        )
        .drop("__new_sess")
    )


# --------------------------------------------------------------------------
# skew-safe aggregation (salting)
# --------------------------------------------------------------------------

def salted_aggregate(
    df: DataFrame,
    group_by: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting for skewed group keys.

    AQE splits skewed JOIN partitions automatically, but a groupBy whose
    single hot key floods one reducer still bottlenecks — the classic
    hot-genome / hot-tree skew (SURVEY.md §7 risk 4). Salting splits
    each key into ``salt_buckets`` sub-groups aggregated map-side, then
    merges the partials in a second (tiny) shuffle.

    ``aggs``: (column, fn, alias) with fn ∈ {count, sum, min, max} —
    the decomposable aggregates (partial and final combine with the same
    operation, count re-combining with sum). The salt is a deterministic
    row hash, so results are reproducible.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial_exprs = []
    final_exprs = []
    for col, fn, alias in aggs:
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{alias}"))
            final_exprs.append(F.sum(f"__p_{alias}").alias(alias))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{alias}"))
            final_exprs.append(F.sum(f"__p_{alias}").alias(alias))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{alias}"))
            final_exprs.append(F.min(f"__p_{alias}").alias(alias))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{alias}"))
            final_exprs.append(F.max(f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    partial = df if not partial_exprs else salted.groupBy(*group_by, "__salt").agg(
        *partial_exprs
    )
    return partial.groupBy(*group_by).agg(*final_exprs)


# --------------------------------------------------------------------------
# A6 — hierarchical rollup via ancestor arrays
# --------------------------------------------------------------------------

def rollup_by_ancestors(
    df: DataFrame,
    ancestors_col: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Sum leaf metrics up every ancestor of a hierarchy (A6).

    Reference: ``trees/speciesTree.js:193-219`` recursively sums
    ``num_genes`` to every taxonomy ancestor; ``ontologies/
    filter_taxonomy.js:108-115`` proves the ancestors-array formulation.

    Spark-first: ``explode(ancestors)`` then ``groupBy(ancestor)``. One
    shuffle; map-side partial aggregation makes the explosion cheap. For
    deep hierarchies (depth d) the exploded row count is d×|leaves| —
    at 100 TB prefer rolling up from a pre-aggregated per-leaf-group table.
    """
    return (
        df.select(F.explode(F.col(ancestors_col)).alias("ancestor"), "*")
        .groupBy("ancestor")
        .agg(*aggs)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``direction="backward"`` (default): each left row gets
    the LATEST right row with ``right_ts <= left_ts`` per key;
    ``direction="forward"``: the EARLIEST right row with
    ``right_ts >= left_ts`` (equal timestamps match in both).

    An operator Spark's join set lacks. The naive formulation (per-left-row
    max-subquery, or an inequality join + argmax) shuffles candidate pairs
    — O(|L|·|R|) per key. This is the scalable single-shuffle form:

    1. tag both inputs and union them on aligned schemas;
    2. one window per key ordered by (time, right-before-left) with
       ``last(struct, ignorenulls=True)`` over the unbounded-preceding
       frame — each left row reads the most recent right ROW atomically
       (all value columns ride in ONE struct, so a legitimate NULL in a
       matched right row is preserved rather than backfilled from an
       older right row — DuckDB/ASOF semantics);
    3. keep the left rows and unpack the struct.

    Cost: one shuffle + sort on ``on`` — same as a sort-merge join, no
    pair blowup, skew bounded per key. Right value columns come back
    suffixed (``value_cols`` defaults to all non-key non-ts right
    columns); rows with no prior right row get nulls.
    """
    from pyspark.sql.types import StructField, StructType

    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]
    value_cols = list(value_cols)
    left_pass = [c for c in left.columns if c not in on and c != left_ts]

    rstruct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
        + [StructField(right_ts, right.schema[right_ts].dataType)]
    )
    lsel = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *left_pass,
        F.lit(None).cast(rstruct_type).alias("__rvals"),
    )
    rsel = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_pass],
        F.struct(*value_cols, right_ts).alias("__rvals"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # forward = backward over reversed time; __is_left stays ascending so a
    # right row at the SAME instant precedes the left row in window order
    # (inclusive match) in both directions
    tord = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(tord, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = lsel.unionByName(rsel).select(
        *on,
        "__t",
        "__is_left",
        *left_pass,
        F.last("__rvals", ignorenulls=True).over(w).alias("__rvals"),
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *on,
        F.col("__t").alias(left_ts),
        *left_pass,
        *[F.col(f"__rvals.{c}").alias(c + suffix) for c in value_cols],
        F.col(f"__rvals.{right_ts}").alias(right_ts + suffix),
    )


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Interval OVERLAP join at scale: pairs whose [lo, hi] ranges
    intersect (inclusive), equi-keyed on ``on`` AND a coarse bin id.

    The J5/J6 post-filter form degrades when one equi-key holds many
    intervals (per-key pair count → n·m). This is the standard fix:

    1. each interval explodes to the fixed-width bins it covers
       (``sequence(floor(lo/w), floor(hi/w))`` — map-side, no Python);
    2. candidates come from an equi-join on (keys…, bin) — the shuffle
       is keyed fine-grained, so one hot region no longer lands on one
       reducer;
    3. the true overlap predicate filters candidates, and each pair is
       emitted from exactly ONE bin — the first bin both intervals
       share, ``bin == greatest(floor(l_lo/w), floor(r_lo/w))`` — so no
       ``distinct`` pass is needed (dedup is a predicate, not a shuffle).

    ``bin_width`` trades explode factor (long intervals / small bins)
    against per-bin pair counts (short intervals / big bins); pick it
    near the typical interval length. Columns shared by both sides come
    back suffixed.
    """
    on = list(on)

    def binned(df: DataFrame, lo: str, hi: str, side: str) -> tuple[DataFrame, str, str]:
        overlap_cols = [c for c in df.columns if c in left.columns and c in right.columns and c not in on]
        renamed = df.select(
            *on,
            *[F.col(c).alias(c + (suffixes[0] if side == "l" else suffixes[1]) if c in overlap_cols else c) for c in df.columns if c not in on],
        )
        lo_c = lo + (suffixes[0] if side == "l" else suffixes[1]) if lo in overlap_cols else lo
        hi_c = hi + (suffixes[0] if side == "l" else suffixes[1]) if hi in overlap_cols else hi
        return renamed.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_c) / bin_width), F.floor(F.col(hi_c) / bin_width)
                )
            ),
        ), lo_c, hi_c

    lb, llo, lhi = binned(left, l_lo, l_hi, "l")
    rb, rlo, rhi = binned(right, r_lo, r_hi, "r")
    joined = lb.join(rb, [*on, "__bin"])
    overlap = (F.col(llo) <= F.col(rhi)) & (F.col(rlo) <= F.col(lhi))
    first_shared = F.col("__bin") == F.greatest(
        F.floor(F.col(llo) / bin_width), F.floor(F.col(rlo) / bin_width)
    )
    return joined.filter(overlap & first_shared).drop("__bin")


def deterministic_sample(
    df: DataFrame, key: str | Column, rate: float, salt: str = ""
) -> DataFrame:
    """Reproducible hash-based row sampling: keep rows where the first two
    hex chars of ``md5(salt || key)`` fall below ``rate`` of the 0x00-0xFF
    range.

    Unlike ``df.sample()`` this is a pure FILTER on row content — the same
    rows are selected on every run, on any cluster, at any partitioning,
    and in any engine that agrees on md5 (the property that makes
    train/eval splits and corpus downsampling auditable).  Granularity is
    1/256; ``salt`` decorrelates independent samples over the same keys.

    Scale: no shuffle, no RNG state — the predicate evaluates map-side
    and pushes the projection into the scan.
    """
    threshold = _hex_threshold(rate)
    keyc = F.col(key) if isinstance(key, str) else key
    return df.filter(
        F.substring(F.md5(F.concat(F.lit(salt), keyc.cast("string"))), 1, 2)
        < F.lit(threshold)
    )


def quota_sample(
    df: DataFrame,
    key: str | Column,
    strata: str,
    quota: int,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hard CAP: keep at most ``quota`` rows from each
    stratum — the domain-balancing pass every web-scale corpus needs
    (one crawl-happy domain must not dominate the mixture; rates alone
    can't express "never more than N per domain").

    Selection is deterministic and unbiased: rows rank within their
    stratum by ``md5(salt || key)`` (a content hash, not arrival
    order), so the surviving set is stable across runs, partitionings,
    and engines — and adding new rows to a stratum can evict old ones
    only at the quota boundary. Ties on the full 32-hex digest are
    broken by the key itself (exact, no digest truncation).

    Scale: one shuffle on ``strata`` + a linear rank window per
    stratum. A hot domain's rows land on one reducer — acceptable
    because the window is O(n log n) in the stratum size and emits at
    most ``quota`` rows; for pathological single-domain corpora,
    pre-filter with ``deterministic_sample`` to tame the stratum first.
    """
    keyc = F.col(key) if isinstance(key, str) else key
    hx = F.md5(F.concat(F.lit(salt), keyc.cast("string")))
    w = Window.partitionBy(strata).orderBy(hx.asc(), keyc.cast("string").asc())
    return (
        df.withColumn("__qrank", F.row_number().over(w))
        .filter(F.col("__qrank") <= quota)
        .drop("__qrank")
    )


def _hex_threshold(rate: float) -> str:
    """Rate → 2-hex-char exclusive upper bound for the md5-prefix filter.
    rate≥1 maps to 'g', which sorts after every hex pair (all-pass) —
    format(256,'02x') would be '100', which compares LOWER than most hex
    pairs lexicographically and silently drops nearly everything."""
    n = max(0, min(256, round(rate * 256)))
    return "g" if n >= 256 else format(n, "02x")


def upsert_merge(
    current: DataFrame, updates: DataFrame, key: str | list[str]
) -> DataFrame:
    """SCD1 upsert as a DataFrame op (the engine-side restatement of the
    reference's Mongo ``update({_id}, doc, {upsert:true})`` sinks,
    ``trees/speciesTree.js:230-252``): a matched key takes the update
    row wholesale (full-document replace, incl. explicit nulls),
    unmatched update rows are inserted, untouched current rows pass
    through.

    Implementation: one full-outer equi-join on the key; row provenance
    decides each column (update side when the update row exists).
    Column sets must match (enforced) so the merge policy is total.

    Scale: a single co-partitioned shuffle on the key; with both sides
    bucketed on the key (``io.write_bucketed``) even that shuffle
    disappears — the standard nightly-merge layout.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            "upsert_merge requires identical column sets; got "
            f"{sorted(set(current.columns) ^ set(updates.columns))} unmatched"
        )
    # rename the update side up front: updates are routinely DERIVED from
    # current (same lineage), where alias-based disambiguation fails
    # marker name cannot collide with the renamed columns: a column
    # literally named "present" would alias to __u_present
    upd = updates.select(
        F.lit(True).alias("__upsert_marker__"),
        *[F.col(c).alias(f"__u_{c}") for c in updates.columns],
    )
    from functools import reduce

    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__u_{k}").eqNullSafe(F.col(k)) for k in keys],
    )
    merged = current.join(upd, cond, "full_outer")
    # presence marker, NOT key-isNotNull: the join is null-safe, so a
    # null-keyed update row is a legitimate match/insert and must not be
    # mistaken for "no update row joined here"
    matched = F.col("__upsert_marker__").isNotNull()
    return merged.select(
        *[
            F.when(matched, F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c)
            for c in current.columns
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salts: int = 8,
) -> DataFrame:
    """Equi-join for pathologically skewed keys: the LEFT (large, skewed)
    side gets a deterministic per-row salt, the RIGHT side is replicated
    ``salts`` times, and the join runs on (key, salt) — one hot key's
    rows spread over ``salts`` reducers instead of one straggler task.

    Use only when AQE's skew-join splitting isn't available (e.g. the
    skewed side feeds a window, or the join is inside a cached subtree);
    replication multiplies the right side's shuffle volume by ``salts``,
    so keep the right side narrow.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salts))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return l.join(r, [on, "__salt"]).drop("__salt")


def deterministic_sample_by(
    df: DataFrame,
    key: str | Column,
    strata: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum reproducible sampling (``df.sampleBy``'s auditable
    twin): each stratum gets its own md5-threshold rate — e.g. keep 100%
    of rare languages, 10% of the dominant one.

    Same contract as ``deterministic_sample``: pure content-hash filter,
    stable across runs/partitionings/engines, subset-monotone.  Strata
    not in ``rates`` fall back to ``default_rate`` (0 = drop).
    """
    keyc = F.col(key) if isinstance(key, str) else key
    hx = F.substring(F.md5(F.concat(F.lit(salt), keyc.cast("string"))), 1, 2)
    cond = F.lit(_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        cond = F.when(F.col(strata) == value, F.lit(_hex_threshold(rate))).otherwise(cond)
    return df.filter(hx < cond)


def inverse_sqrt_sample(
    df: DataFrame,
    key: str | Column,
    strata: str,
    coeff: float = 4.0,
    salt: str = "",
) -> DataFrame:
    """Temperature-flattened mixture sampling: stratum ``s`` of size
    ``n_s`` keeps ``rate_s = min(1, coeff/sqrt(n_s))`` of its rows — the
    τ=0.5 temperature reweighting used to balance training mixtures
    (dominant sources downsampled ∝ n^-1/2, small sources kept whole).
    Unlike ``deterministic_sample_by`` the rates come from the DATA, so
    the mixture rebalances itself as sources grow.

    Determinism across engines: the rate is quantized to k/256 with
    ``k = round(256·coeff/√n)`` — sqrt and one division are correctly
    rounded IEEE doubles on every engine, so k is identical everywhere,
    and the keep test is the same exact two-hex-char md5-prefix compare
    as ``deterministic_sample`` (no float boundary anywhere).

    Scale: one tiny aggregate (stratum → count, broadcast back) + a pure
    map-side filter. No RNG state; appending shards re-derives rates but
    never reshuffles data.

    NULL strata form their own stratum: groupBy already counts the NULL
    group, and the rate join is null-safe (``<=>``), so NULL-source rows
    are sampled at their group's rate instead of silently vanishing
    through a null-rejecting equi-join.
    """
    keyc = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__n"))
    rates = counts.select(
        F.col(strata).alias("__strata"),
        F.least(
            F.lit(256),
            F.round(F.lit(256.0 * float(coeff)) / F.sqrt(F.col("__n"))).cast("int"),
        ).alias("__k"),
    )
    hx = F.substring(F.md5(F.concat(F.lit(salt), keyc.cast("string"))), 1, 2)
    thr = F.lpad(F.lower(F.hex(F.col("__k"))), 2, "0")
    return (
        df.join(F.broadcast(rates), F.col(strata).eqNullSafe(F.col("__strata")))
        .filter((F.col("__k") >= 256) | (hx < thr))
        .drop("__strata", "__k")
    )


def token_budget_sample(
    df: DataFrame,
    key: str | Column,
    tokens_col: str,
    strata: str,
    budget: int,
    salt: str = "",
    out_cum: str = "cum_tokens",
) -> DataFrame:
    """Per-stratum TOKEN budget: keep rows from each stratum, in
    deterministic md5 order, until the stratum's cumulative token count
    reaches ``budget`` — the "at most N tokens per source" knob a
    training-mixture spec expresses in tokens, which a row quota
    (``quota_sample``) cannot: documents differ in length by orders of
    magnitude, so capping rows caps nothing.

    A row is kept iff its cumulative token sum (inclusive) is ≤
    ``budget``; the first over-budget document and everything after it
    in hash order are dropped, so the kept set never exceeds the budget
    and is a deterministic function of content — stable across runs,
    partitionings, and engines that agree on md5. The inclusive-sum
    rule means a single document larger than the whole budget is
    dropped, not truncated (truncation is ``chunk_documents``'s job).

    Scale: one shuffle on ``strata`` + a linear cumulative-sum window
    per stratum — the same shape and skew contract as ``quota_sample``
    (a hot stratum lands on one reducer; pre-tame it with
    ``deterministic_sample`` if a single stratum dominates the corpus).
    """
    keyc = F.col(key) if isinstance(key, str) else key
    hx = F.md5(F.concat(F.lit(salt), keyc.cast("string")))
    w = (
        Window.partitionBy(strata)
        .orderBy(hx.asc(), keyc.cast("string").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_cum, F.sum(F.col(tokens_col).cast("long")).over(w)
    ).filter(F.col(out_cum) <= budget)


def split_by_cluster(
    df: DataFrame,
    cluster_col: str | Column,
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a hash of the
    CLUSTER id, not the row id, so every member of a duplicate cluster
    (exact-dup group, MinHash component, …) lands in the SAME split —
    near-duplicates of a training document can never leak into the eval
    set, the failure mode row-hash splits are blind to.

    ``splits`` is an ordered (label, fraction) list; fractions are
    quantized to the same 1/256 md5-prefix granularity as
    ``deterministic_sample`` (exact two-hex-char compares, no float
    boundary), and the LAST label absorbs the hash tail so every row is
    labeled even when fractions round short of 1.0.

    Scale: pure map-side expression over an existing cluster-id column —
    no shuffle, no RNG; composes after ``dedup_clusters`` (which already
    paid its shuffles) or after a window over ``fingerprint``.
    """
    cc = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    hx = F.substring(F.md5(F.concat(F.lit(salt), cc.cast("string"))), 1, 2)
    labels = list(splits)
    cum = 0.0
    bounds = []
    for label, frac in labels[:-1]:
        cum += frac
        bounds.append((label, _hex_threshold(cum)))
    # innermost = tail absorber; wrap outward so the FIRST (smallest)
    # cumulative boundary is tested first
    expr = F.lit(labels[-1][0])
    for label, thr in reversed(bounds):
        expr = F.when(hx < F.lit(thr), F.lit(label)).otherwise(expr)
    return df.withColumn(out, expr)


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
    window_s: int | None = None,
    out: str = "funnel_stage",
) -> DataFrame:
    """N-step funnel analysis: for each user, how far through an ordered
    step sequence (view → click → purchase, …) they progressed, where
    step k+1 must occur STRICTLY AFTER the user's entry into step k
    (min-after-min semantics: entry time of step k+1 = min ts among
    events matching step k+1 with ts > entry(k); ties at the exact same
    timestamp do NOT advance — strict ordering is the deterministic
    choice both engines replay identically). ``window_s`` bounds each
    conversion: step k+1 must land within that many seconds of entering
    step k (wall-clock interval arithmetic — tz-proof on NTZ columns),
    which is what makes a funnel a funnel rather than an existence
    check over an unbounded history.

    Output: one row per distinct user with ``funnel_stage`` = number of
    steps completed (0..len(steps)).

    Scale: per-step = one filter + one user-keyed min aggregate + one
    equi-join against the previous stage's (shrinking) user set. Every
    shuffle is on ``user_col``, so AQE/exchange-reuse co-partitions the
    whole chain after the first hash; the stage tables shrink
    monotonically (funnel property), and nothing is ever collected.
    """
    uc, tc = F.col(user_col), F.col(ts_col)
    stage_tables = []
    prev = None  # DataFrame[user_col, __entry]
    for i, (_name, pred) in enumerate(steps):
        cur = df.filter(pred)
        if prev is not None:
            gate = tc > F.col("__entry")
            if window_s is not None:
                gate = gate & (
                    tc <= F.col("__entry") + F.expr(f"INTERVAL {int(window_s)} SECOND")
                )
            cur = cur.join(prev, user_col).filter(gate)
        nxt = cur.groupBy(user_col).agg(F.min(tc).alias("__entry"))
        stage_tables.append(nxt.select(uc, F.lit(1).alias(f"__s{i}")).withColumnRenamed(user_col, f"__u{i}"))
        prev = nxt
    result = df.select(uc).distinct()
    stage_expr = F.lit(0)
    for i, st in enumerate(stage_tables):
        result = result.join(
            st, result[user_col] == st[f"__u{i}"], "left"
        ).drop(f"__u{i}")
        stage_expr = stage_expr + F.when(F.col(f"__s{i}").isNotNull(), 1).otherwise(0)
    return result.select(uc, stage_expr.cast("int").alias(out))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    anchor_date: str = "2024-01-01",
    unit: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the calendar
    period (``unit`` = "week" or "day") of their FIRST event, counted
    from ``anchor_date``; each (cohort_period, period_offset) cell
    counts the distinct cohort members active ``offset`` periods after
    their cohort period — the standard retention triangle every
    product-analytics stack computes. Filter the input first to cohort
    on a specific action (e.g. purchases only).

    Week arithmetic is wall-clock (``datediff`` on the DATE of an NTZ
    timestamp — tz-proof) and non-negative by the anchor contract
    (anchor ≤ min event date), so truncating and floor division agree
    across engines.

    Scale: one user-keyed window (min week per user — the same shuffle
    profile as sessionize) followed by a (cohort, offset)-keyed count
    distinct whose output is weeks² rows; nothing is collected. Skew:
    a mega-cohort lands on one reducer only for its count-distinct,
    which Spark executes as a two-level partial aggregate.
    """
    uc = F.col(user_col)
    days = f"datediff(CAST({ts_col} AS DATE), DATE '{anchor_date}')"
    period = F.expr(days if unit == "day" else f"{days} div 7").cast("long")
    w = Window.partitionBy(user_col)
    ev = df.select(uc, period.alias("__p")).withColumn(
        "cohort_period", F.min("__p").over(w)
    )
    return (
        ev.groupBy(
            "cohort_period",
            (F.col("__p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count_distinct(uc).alias("n_users"))
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: Sequence[str],
    order_extra: Sequence[str] = (),
) -> DataFrame:
    """SCD type-2 history assembly from snapshots/events: per key,
    collapse consecutive rows whose tracked attributes did not change
    (change detection via lag over a deterministic attribute hash), then
    derive each surviving version's validity interval — ``valid_from`` =
    its timestamp, ``valid_to`` = the NEXT change's timestamp (null for
    the current version, flagged ``is_current``). The dimension-table
    twin of ``upsert_merge`` (SCD1): type 1 overwrites, type 2 keeps the
    full change history every warehouse audit asks for.

    ``order_extra`` appends tie-break columns (e.g. an event id) so
    same-timestamp snapshots order deterministically.

    Scale: two windows over the SAME (key × time) partitioning — AQE
    reuses the exchange, so it is one shuffle; change compression
    happens before the interval window, so the second pass sees only
    changed rows. The attribute hash is ``md5`` over a unit-separator
    join (engine-portable, null-safe via an explicit sentinel).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in order_extra]
    w = Window.partitionBy(key).orderBy(*order)
    attr_hash = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in attr_cols]
        )
    )
    changed = (
        df.withColumn("__h", attr_hash)
        .withColumn("__ph", F.lag("__h").over(w))
        .filter(F.col("__ph").isNull() | (F.col("__h") != F.col("__ph")))
        .drop("__h", "__ph")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def fixed_sample(
    df: DataFrame, key: str | Column, n: int, salt: str = ""
) -> DataFrame:
    """Exactly-N deterministic sample: the ``n`` rows whose
    ``md5(salt || key)`` ranks lowest (ties broken by the key) — the
    "give me exactly 10k eval documents, stable across runs and
    engines" contract that rate-based ``deterministic_sample`` (±1/256
    granularity, size varies with the corpus) cannot make.

    Scale: TakeOrdered — per-partition top-n heaps + a driver-side merge
    of n·partitions tuples; no global sort shuffle. For n large enough
    that n·partitions strains the driver, pre-filter with
    ``deterministic_sample`` at a slightly generous rate first.
    """
    keyc = F.col(key) if isinstance(key, str) else key
    hx = F.md5(F.concat(F.lit(salt), keyc.cast("string")))
    return df.orderBy(hx.asc(), keyc.cast("string").asc()).limit(int(n))


# --------------------------------------------------------------------------
# robust per-group outlier flags (median / MAD, integer-exact)
# --------------------------------------------------------------------------

def grouped_mad_outliers(
    df: DataFrame,
    group_by: Sequence[str],
    value: str,
    k: int = 3,
) -> DataFrame:
    """Flag per-group outliers by median absolute deviation — the robust
    anomaly screen a telemetry/curation pipeline runs per entity (mean ±
    k·stddev breaks on the very outliers it hunts; median/MAD does not).

    ``value`` must already be an integer column (quantize floats to
    micros first — the similarity.py convention). Both location and
    spread are ORDER-STATISTIC picks, not interpolated percentiles:

    * ``med  = value at sorted position ⌈n/2⌉`` within the group,
    * ``mad  = |value − med| at sorted position ⌈n/2⌉``,
    * outlier ⇔ ``|value − med| > k · mad``.

    A position pick on integers is deterministic on any engine and any
    partitioning (ties don't matter: equal values yield the same pick),
    so the whole operator is oracle-replayable — unlike float
    ``percentile()``/``stddev`` pipelines.

    Scale: ONE hash shuffle on the group key serves all four window
    computations (count, two ranked picks, spread) — the second ranked
    pick re-sorts within partitions but does not re-exchange. Skewed
    groups are per-key linear, same posture as ``sessionize``.

    Output: input columns + ``med``, ``mad``, ``is_outlier``.
    """
    keys = list(group_by)
    wp = Window.partitionBy(*keys)
    wv = wp.orderBy(F.col(value).asc())
    pos = F.expr("(__n + 1) div 2")
    out = (
        df.withColumn("__n", F.count("*").over(wp))
        .withColumn("__rn", F.row_number().over(wv))
        .withColumn(
            "med",
            F.max(F.when(F.col("__rn") == pos, F.col(value))).over(wp),
        )
        .withColumn("__dev", F.abs(F.col(value) - F.col("med")))
    )
    wd = wp.orderBy(F.col("__dev").asc())
    out = (
        out.withColumn("__rn2", F.row_number().over(wd))
        .withColumn(
            "mad",
            F.max(F.when(F.col("__rn2") == pos, F.col("__dev"))).over(wp),
        )
        .withColumn("is_outlier", F.col("__dev") > F.lit(int(k)) * F.col("mad"))
        .drop("__n", "__rn", "__rn2", "__dev")
    )
    return out


def percentile_threshold_filter(
    df: DataFrame,
    value: str,
    q_num: int,
    q_den: int,
    keep_ge: bool = True,
    value_quantum: int | None = None,
) -> DataFrame:
    """Corpus-relative adaptive filter: keep rows whose integer ``value``
    is ≥ (or <) the corpus's exact q-quantile, computed as the value at
    sorted position ⌈q·n⌉ — "drop the shortest quartile of documents"
    where the threshold FOLLOWS the corpus instead of being hardcoded.

    ``q = q_num/q_den`` as an integer rational, so the needed rank is
    ``(q_num·n + q_den − 1) div q_den`` — no float rank boundary for two
    engines to disagree on.

    Scale shape (the reason this is not one global sort): the quantile
    is computed on the VALUE DOMAIN, not the corpus — ``groupBy(value)``
    counts (map-side combinable, one shuffle keyed on value), a
    running-sum window over the distinct-value table (value-domain-sized
    — thousands of rows at 100 TB, the only single-partition step), then
    the 1-row threshold broadcast-joins back and the filter runs
    map-side. A corpus-sized global ``orderBy`` never happens.

    CARDINALITY CONTRACT: the unpartitioned running sum is bounded by
    the number of DISTINCT values, not rows. That is fine for
    integer-ish domains (n_chars, cents, token counts — thousands to
    millions of distinct values), but a high-cardinality continuous
    column (float scores, epoch micros) degrades toward a
    single-partition corpus sort. For those, set ``value_quantum``:
    values are floored to multiples of the quantum BEFORE counting, so
    the distinct table is at most range/quantum rows and the threshold
    is exact on the quantized domain (error < one quantum in value
    units — pick the quantum at the resolution the filter decision
    actually needs). The returned ``threshold`` is then a quantum
    multiple and the filter compares quantized values against it.

    Output: input columns + ``threshold`` (the same value on every row).
    """
    if value_quantum is not None:
        if value_quantum <= 0:
            raise ValueError(f"value_quantum must be positive: {value_quantum}")
        vexpr = (
            F.floor(F.col(value) / F.lit(int(value_quantum)))
            * F.lit(int(value_quantum))
        ).cast("long")
    else:
        vexpr = F.col(value)
    counts = df.groupBy(vexpr.alias("__v")).agg(
        F.count("*").alias("__c")
    )
    wcum = Window.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("__cum", F.sum("__c").over(wcum)).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy())
    )
    thr = (
        cum.filter(
            F.col("__cum")
            >= F.expr(f"({q_num} * __n + {q_den} - 1) div {q_den}")
        )
        .agg(F.min("__v").alias("threshold"))
    )
    joined = df.join(F.broadcast(thr))
    side = vexpr if value_quantum is not None else F.col(value)
    cond = (
        side >= F.col("threshold")
        if keep_ge
        else side < F.col("threshold")
    )
    return joined.filter(cond)


# --------------------------------------------------------------------------
# CDC log replay and incremental aggregate maintenance
# --------------------------------------------------------------------------

def cdc_replay(
    log: DataFrame,
    keys: Sequence[str],
    seq: Sequence[str],
    op: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a change-data-capture log (insert/update/delete rows with
    a per-key sequence) to the final table state: the LATEST op per key
    wins; keys whose latest op is a delete vanish.

    ``seq`` columns must totally order each key's changes (ts + a
    unique change id — same pinned-tie-break contract as
    ``argmax_per_group``). This is the log-structured twin of
    ``upsert_merge`` (one batch vs current state) and ``scd2_history``
    (which keeps all versions): replay keeps exactly one.

    Scale: one shuffle on the key, WindowGroupLimit prunes to the
    top-1 row per key map-side before the exchange — the log never
    re-sorts globally.
    """
    order = [F.col(c).desc() for c in seq]
    latest = argmax_per_group(log, list(keys), order)
    # NULL op must mean "not a delete", not "silently vanish": a bare
    # `op != delete_op` is NULL (filtered out) for NULL ops, which would
    # drop keys whose latest log row has no op as if they were deleted.
    keep = F.coalesce(F.col(op) != F.lit(delete_op), F.lit(True))
    return latest.filter(keep).drop(op)


def merge_partial_aggregates(
    state: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Incremental materialized-view maintenance: fold a new batch's
    partial aggregates into a stored aggregate table without
    re-aggregating history — the kappa-architecture pattern that keeps
    a 100 TB rollup fresh for the cost of the day's delta.

    ``state`` and ``batch`` both carry the SAME pre-aggregated columns
    (sum/count/min/max are the self-mergeable algebra; avg is derived
    sum/count downstream). Full-outer join on the key, combine with
    null-neutral coalesce — a key present in either side survives.

    Scale: the join shuffles on the aggregate key — aggregate-sized
    (|distinct keys|), not corpus-sized; co-partition/bucket both
    sides on the key and the exchange disappears entirely
    (io.write_bucketed, plan-asserted in test_io.py).
    """
    merged = state.alias("s").join(
        batch.alias("b"), on=list(keys), how="full_outer"
    )
    cols: list = [F.col(k) for k in keys]
    zero = F.lit(0).cast("long")
    for c in sums:
        cols.append(
            (
                F.coalesce(F.col(f"s.{c}"), zero)
                + F.coalesce(F.col(f"b.{c}"), zero)
            ).alias(c)
        )
    for c in counts:
        cols.append(
            (
                F.coalesce(F.col(f"s.{c}"), zero)
                + F.coalesce(F.col(f"b.{c}"), zero)
            ).alias(c)
        )
    for c in mins:
        cols.append(
            F.least(
                F.coalesce(F.col(f"s.{c}"), F.col(f"b.{c}")),
                F.coalesce(F.col(f"b.{c}"), F.col(f"s.{c}")),
            ).alias(c)
        )
    for c in maxs:
        cols.append(
            F.greatest(
                F.coalesce(F.col(f"s.{c}"), F.col(f"b.{c}")),
                F.coalesce(F.col(f"b.{c}"), F.col(f"s.{c}")),
            ).alias(c)
        )
    return merged.select(*cols)


def priority_sample(
    df: DataFrame,
    weight: str,
    key: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling without replacement by PRIORITY SAMPLING
    (Duffield–Lund–Thorup): each row gets priority q = w / u with u a
    deterministic md5-uniform in (0,1]; the top-``n`` priorities are
    the sample, and ``est_weight = max(w, τ)`` (τ = the (n+1)-th
    priority) makes subset-sum estimates unbiased — the weighted
    counterpart of ``fixed_sample`` ("give me 10k docs, long ones
    proportionally more likely, stable across runs and engines, with
    weights I can still sum").

    Engine-exactness: u and q involve ONE multiply and ONE divide on
    IEEE doubles — individually correctly-rounded operations are
    bit-identical on any engine (only float SUMS are order-sensitive),
    so the ranking and τ replay exactly in SQL.

    Scale: TakeOrdered top-(n+1) — per-partition heaps, no global sort
    shuffle; τ is a 1-row aggregate broadcast back.

    Output: input columns + ``est_weight`` (BIGINT, rounded).
    """
    keyc = F.col(key)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), keyc.cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    q = F.col(weight).cast("double") * F.lit(4294967296.0) / h.cast("double")
    top = (
        df.withColumn("__q", q)
        .orderBy(F.col("__q").desc(), keyc.asc())
        .limit(int(n) + 1)
    )
    tau = top.agg(
        F.when(F.count(F.lit(1)) > n, F.min("__q")).otherwise(0.0).alias("__tau")
    )
    kept = top.orderBy(F.col("__q").desc(), keyc.asc()).limit(int(n))
    return (
        kept.join(F.broadcast(tau))
        .withColumn(
            "est_weight",
            F.round(
                F.greatest(F.col(weight).cast("double"), F.col("__tau"))
            ).cast("long"),
        )
        .drop("__q", "__tau")
    )


def equidepth_bins(
    df: DataFrame,
    value: str,
    k: int,
    value_quantum: int | None = None,
) -> DataFrame:
    """Equi-depth histogram of an integer column: ``k`` bins of
    approximately equal row count — the quantile summary a planner or
    profiler publishes (equi-WIDTH binning is ``bin_fixed_width``; this
    is its data-adaptive sibling, and the exact baseline for
    ``approx_percentile``'s sketch).

    A distinct value lands wholly in one bin (no row-splitting):
    ``bin(v) = (cum(v) − 1) · k div n`` where cum is the running row
    count through v in value order — deterministic integer arithmetic,
    so the same boundaries fall out of any engine.

    Scale: same value-domain plan as ``percentile_threshold_filter`` —
    one groupBy(value) shuffle with map-side combine, then the running
    sum and bin assignment run on the distinct-value table (thousands
    of rows at 100 TB; the only single-partition step), never a
    corpus-wide sort.

    CARDINALITY CONTRACT (same as ``percentile_threshold_filter``): the
    single-partition running sum is distinct-value-bounded. For
    high-cardinality continuous domains set ``value_quantum`` — values
    are floored to quantum multiples first, bounding the distinct table
    to range/quantum rows; bin boundaries are then exact on the
    quantized domain (lo/hi come out as quantum multiples, boundary
    error < one quantum).

    Output: (bin, lo, hi, n_rows), bin ∈ [0, k).
    """
    if value_quantum is not None:
        if value_quantum <= 0:
            raise ValueError(f"value_quantum must be positive: {value_quantum}")
        vexpr = (
            F.floor(F.col(value) / F.lit(int(value_quantum)))
            * F.lit(int(value_quantum))
        ).cast("long")
    else:
        vexpr = F.col(value)
    counts = df.groupBy(vexpr.alias("v")).agg(F.count("*").alias("c"))
    wcum = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("__cum", F.sum("c").over(wcum)).withColumn(
        "__n", F.sum("c").over(Window.partitionBy())
    )
    binned = cum.withColumn(
        "bin", F.expr(f"(__cum - 1) * {int(k)} div __n").cast("long")
    )
    return binned.groupBy("bin").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum("c").alias("n_rows"),
    )


def grouped_rank_percentiles(
    df: DataFrame,
    group_by: Sequence[str],
    value: str,
    quantiles: Sequence[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
    prefix: str = "p",
) -> DataFrame:
    """Exact per-group percentiles as ORDER-STATISTIC picks — the
    ``percentile_disc`` semantics Spark lacks (its ``percentile`` /
    ``median`` interpolate, producing engine-dependent floats):
    quantile q = num/den picks the value at sorted position
    ``(num·n + den − 1) div den`` within the group. Integer in, integer
    out, identical on every engine — the grouped generalization of
    ``grouped_mad_outliers``'s median pick.

    ALL requested quantiles come out of ONE window pass (one hash
    shuffle on the group key: count + row_number + one conditional-max
    per quantile share the exchange), then a groupBy collapses to one
    row per group — same-keyed, so AQE usually folds it into the same
    stage.

    Output: group keys + one ``{prefix}{num}_{den}`` column per
    quantile.
    """
    keys = list(group_by)
    wp = Window.partitionBy(*keys)
    wv = wp.orderBy(F.col(value).asc())
    out = df.withColumn("__n", F.count("*").over(wp)).withColumn(
        "__rn", F.row_number().over(wv)
    )
    names = []
    for num, den in quantiles:
        pos = F.expr(f"({num} * __n + {den} - 1) div {den}")
        name = f"{prefix}{num}_{den}"
        names.append(name)
        out = out.withColumn(
            name, F.max(F.when(F.col("__rn") == pos, F.col(value))).over(wp)
        )
    return out.groupBy(*keys).agg(*[F.max(c).alias(c) for c in names])


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not DOMINATED by any other —
    no row with ``minimize`` ≤ and ``maximize`` ≥ (one strict). The
    classic multi-criteria shortlist ("cheapest AND freshest") that
    no single ORDER BY can produce; both columns must be integers.

    Two-phase distributed plan (skyline-of-skylines: a locally
    dominated row is globally dominated, so phase 1 never drops a
    frontier point):

    1. LOCAL skyline per input partition — window keyed on
       ``spark_partition_id()``, so the heavy elimination runs in
       parallel with no shuffle;
    2. GLOBAL skyline over the survivors (frontier-sized — typically
       orders of magnitude smaller) — the only single-partition window.

    Within a pass, a row survives iff its ``maximize`` equals its
    ``minimize``-group max AND strictly exceeds the running max over
    all strictly-smaller ``minimize`` values (RANGE frame to
    1 PRECEDING — excludes ties). Exact-duplicate pairs survive
    together (neither strictly dominates).
    """

    def pass_(d: DataFrame, part_cols: list) -> DataFrame:
        wo = Window.partitionBy(*part_cols).orderBy(F.col(minimize).asc())
        strict = wo.rangeBetween(Window.unboundedPreceding, -1)
        grp = Window.partitionBy(*(part_cols + [F.col(minimize)]))
        out = (
            d.withColumn("__rmax", F.max(maximize).over(strict))
            .withColumn("__pmax", F.max(maximize).over(grp))
            .filter(
                (F.col(maximize) == F.col("__pmax"))
                & (
                    F.col("__rmax").isNull()
                    | (F.col(maximize) > F.col("__rmax"))
                )
            )
            .drop("__rmax", "__pmax")
        )
        return out

    local = pass_(
        df.withColumn("__pid", F.spark_partition_id()), [F.col("__pid")]
    ).drop("__pid")
    return pass_(local, [])


def interval_max_overlap(
    df: DataFrame,
    group_by: Sequence[str],
    lo: str,
    hi: str,
) -> DataFrame:
    """Peak overlap depth per key: the maximum number of [lo, hi)
    intervals covering any single point — coverage depth in genomics,
    peak concurrency in ops analytics. The counting sibling of
    ``merge_intervals`` (which only fuses; this measures how deep the
    pile gets).

    Boundary sweep as pure windows: every interval contributes a +1 at
    ``lo`` and a −1 at ``hi``; sorting boundaries per key with ends
    BEFORE starts at the same position (half-open semantics: an
    interval ending where another starts does not overlap it) and
    running-summing gives the depth profile; the answer is its max.

    One shuffle on the group key (explode to 2 rows per interval,
    window, max) — per-key linear, same posture as ``merge_intervals``.

    Output: group keys + ``max_depth`` (long).
    """
    keys = list(group_by)
    b = df.select(
        *keys,
        F.explode(
            F.array(
                F.struct(
                    F.col(lo).alias("pos"), F.lit(1).cast("long").alias("delta")
                ),
                F.struct(
                    F.col(hi).alias("pos"), F.lit(-1).cast("long").alias("delta")
                ),
            )
        ).alias("b"),
    ).select(*keys, F.col("b.pos").alias("pos"), F.col("b.delta").alias("delta"))
    # ends (-1) sort before starts (+1) at equal pos → delta ascending
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("pos").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    depth = b.withColumn("__d", F.sum("delta").over(w))
    return depth.groupBy(*keys).agg(F.max("__d").alias("max_depth"))


def forward_fill(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[str],
    cols: Sequence[str],
    suffix: str = "_filled",
) -> DataFrame:
    """Gap filling: per key, replace NULLs with the LAST non-null value
    in event order (sensor dropout, missing snapshot fields — the
    imputation every telemetry/dimension pipeline runs before
    aggregating). Leading NULLs (no prior observation) stay NULL —
    honest, not zero-filled.

    One window per filled column over the SAME (key × order)
    partitioning — one shuffle total, `last(ignorenulls=True)` with an
    unbounded-preceding frame is per-key linear and skew-tolerant.

    Output: input columns + one ``{col}{suffix}`` per filled column.
    """
    keys = list(group_by)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out


def zorder_key(
    cols: Sequence[str],
    bits: int = 10,
) -> Column:
    """Z-order (Morton) interleave key over N non-negative integer
    columns, ``bits`` low bits each — the multi-dimensional DATA LAYOUT
    primitive (Delta/Iceberg `OPTIMIZE ZORDER BY` semantics): sorting or
    range-partitioning a table by this key co-locates rows that are
    close in EVERY dimension, so parquet min/max row-group stats prune
    scans for predicates on ANY of the interleaved columns, not just a
    single sort prefix. The missing piece that makes `compact_parquet`
    a clustering rewrite rather than just a file-size fix:
    ``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)``.

    Bit b of column i lands at output position ``b·N + i`` — a pure
    shift/mask expression tree (2·bits·N terms), whole-stage-codegen'd
    JVM arithmetic, no UDF. Values are masked to ``bits`` low bits;
    quantize wider domains first (e.g. ``value div step``) — the same
    contract as ``value_quantum`` elsewhere.

    Returns a Column (BIGINT); N·bits must be ≤ 63.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"zorder_key: {n}*{bits} bits exceeds BIGINT range")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            key = key + F.shiftleft(
                F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1)),
                b * n + i,
            ).cast("long")
    return key


def linear_interpolate(
    df: DataFrame,
    group_by: Sequence[str],
    order_col: str,
    value: str,
    suffix: str = "_interp",
) -> DataFrame:
    """Gap filling by LINEAR interpolation: per key, a NULL integer
    ``value`` between two non-null observations is replaced by the
    integer lerp  v0 + (v1 - v0) * (t - t0) div (t1 - t0)  over the
    integer ``order_col`` axis — the imputation ``forward_fill`` is too
    blunt for (a dropout mid-ramp should not repeat the stale reading).
    Leading/trailing gaps (no bracketing sample on one side) stay NULL,
    same honesty contract as forward_fill.

    Integer-exact and engine-portable: the division TRUNCATES toward
    zero, which Spark's ``div`` and DuckDB's ``//`` both do (verified
    including negative deltas — unlike floor division, where engines
    disagree with Python). ``order_col`` must be integer and unique per
    key (epoch micros, sequence ids).

    One key-ordered shuffle serves all four bracketing windows
    (prev/next value and position share the exchange); the lerp itself
    is codegen arithmetic.

    Output: input columns + ``{value}{suffix}``.
    """
    keys = list(group_by)
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t_of_obs = F.when(F.col(value).isNotNull(), F.col(order_col))
    out = (
        df.withColumn("__pv", F.last(F.col(value), ignorenulls=True).over(wb))
        .withColumn("__pt", F.last(t_of_obs, ignorenulls=True).over(wb))
        .withColumn("__nv", F.first(F.col(value), ignorenulls=True).over(wf))
        .withColumn("__nt", F.first(t_of_obs, ignorenulls=True).over(wf))
    )
    lerp = F.col("__pv") + F.expr(
        f"(__nv - __pv) * ({order_col} - __pt) div (__nt - __pt)"
    )
    return out.withColumn(
        f"{value}{suffix}",
        F.when(F.col(value).isNotNull(), F.col(value)).otherwise(
            F.when(F.col("__pv").isNotNull() & F.col("__nv").isNotNull(), lerp)
        ),
    ).drop("__pv", "__pt", "__nv", "__nt")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots of a table: ``insert``
    (key only in new), ``delete`` (only in old), ``update`` (in both
    with any compared column differing, null-safely), ``unchanged``.
    The VALIDATION twin of the incremental family: replaying a CDC log
    onto ``old`` must reproduce ``new`` — ``snapshot_diff(replayed,
    new)`` returning all-unchanged is the end-to-end assertion, and the
    diff itself is how a lake backfills a missing log (diff two
    snapshots → synthesize the changes).

    One full-outer join keyed on ``keys`` — bucket both snapshots on
    the key to make it shuffle-free at 100 TB. Comparison uses
    null-safe equality (``<=>``), so NULL→NULL is unchanged and
    NULL→value is an update, matching SQL IS DISTINCT FROM.

    Output: keys + ``op`` + ``changed_cols`` (sorted array of differing
    column names; empty for non-updates).
    """
    cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in keys]
    )
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(1).alias("__in_o"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(1).alias("__in_n"),
    )
    j = o.join(n, list(keys), "full_outer")
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in cols
    ]
    changed = F.array_sort(F.array_compact(F.array(*diffs)))
    op = (
        F.when(F.col("__in_o").isNull(), F.lit("insert"))
        .when(F.col("__in_n").isNull(), F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    empty = F.array().cast("array<string>")
    return j.select(
        *keys,
        op.alias("op"),
        F.when(op == "update", changed).otherwise(empty).alias("changed_cols"),
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    min_margin: int = 1,
) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style training sets:
    within each ``group_col`` (a prompt id — all candidate responses to
    the same prompt), emit ONE (chosen, rejected) pair — the highest-
    and lowest-scoring candidates — with the score margin between them.

    Tie-breaks are pinned so the pair is deterministic across engines:
    chosen = max (score, id) lexicographically (highest score, then
    highest id), rejected = min (score, id) (lowest score, then lowest
    id). Groups with fewer than two candidates, or where the margin is
    below ``min_margin``, produce no pair (a pair whose chosen and
    rejected are near-identical teaches nothing).

    Plan: ONE map-side-combinable groupBy on the prompt key — two
    struct min/max aggregates, no window, no self-join; at 100 TB this
    is a single shuffle of one row per prompt. (The window-rank
    formulation shuffles every candidate row into a sort; this one
    combines partially map-side.)
    """
    best = F.max(F.struct(F.col(score_col), F.col(id_col))).alias("__b")
    worst = F.min(F.struct(F.col(score_col), F.col(id_col))).alias("__w")
    g = df.groupBy(group_col).agg(best, worst, F.count(F.lit(1)).alias("__n"))
    return (
        g.filter(
            (F.col("__n") >= 2)
            & (F.col("__b")[score_col] - F.col("__w")[score_col] >= min_margin)
        )
        .select(
            group_col,
            F.col("__b")[id_col].alias("chosen_id"),
            F.col("__w")[id_col].alias("rejected_id"),
            F.col("__b")[score_col].alias("chosen_score"),
            F.col("__w")[score_col].alias("rejected_score"),
            (F.col("__b")[score_col] - F.col("__w")[score_col]).alias("margin"),
            F.col("__n").cast("long").alias("n_candidates"),
        )
    )


def value_histogram_sketch(
    df: DataFrame, value_col: str, quantum: int
) -> DataFrame:
    """Fixed-quantum value-domain histogram — the MERGEABLE quantile
    sketch completing the incremental-aggregate family (distinct counts
    → HLL sketches, sums/counts → partial_aggregate_merge, quantiles →
    this): counts per ``floor(value / quantum)`` bucket. Two sketches
    built on disjoint partitions of a corpus merge by ADDITIVE UNION
    (`merge_value_histograms`) — the same commutative-monoid algebra as
    partial counts, which is what makes quantiles maintainable across
    micro-batches, days, or shards without reprocessing history.

    Error contract (the honest trade): any quantile read off the
    histogram (`histogram_quantiles`) is the LOWER EDGE of the bucket
    holding the order statistic, so it is ≤ the exact percentile_disc
    value and within one ``quantum`` of it. Sketch size = value range /
    quantum, independent of row count — the 100 TB knob is the quantum,
    exactly as documented for the value-domain quantile ops above.
    All arithmetic is integer: the sketch, the merge and the read are
    engine-exact (oracle-replayable), unlike probabilistic KLL/t-digest.
    """
    if quantum <= 0:
        raise ValueError("quantum must be positive")
    return df.groupBy(
        F.floor(F.col(value_col) / quantum).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def merge_value_histograms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Additive union of two value-histogram sketches — one key-sized
    shuffle on the bucket id, map-side combinable."""
    return (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, qs: Sequence[int], quantum: int
) -> DataFrame:
    """Read percentiles (integer q per cent, e.g. [50, 90, 99]) off a
    value-histogram sketch: the estimate for q is ``bucket*quantum`` of
    the first bucket whose cumulative count reaches ``ceil(q·n/100)``
    (percentile_disc's order statistic). ONE pass: a running sum over
    the bucket table (bounded by the value-domain cardinality contract,
    NOT corpus size) and one conditional-min aggregate per q.

    Output: (q, est) — one row per requested percentile.
    """
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = hist.agg(F.sum("cnt").cast("long").alias("__n"))
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .crossJoin(F.broadcast(n))
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("__n") * q / 100), F.col("bucket")
            )
        ).alias(f"__b{q}")
        for q in qs
    ]
    row = cum.agg(*picks)
    ests = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(q)).cast("long").alias("q"),
                    (F.col(f"__b{q}") * quantum).cast("long").alias("est"),
                )
                for q in qs
            ]
        )
    )
    return row.select(ests.alias("__e")).select("__e.q", "__e.est")


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 4096,
    k: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Bloom-style membership PRE-FILTER for the big-probe/small-build
    join shape: instead of shuffling the 100 TB probe side to discover
    that most rows have no build-side partner, ship a compact bit-set
    (here: the sorted array of k md5-derived bit positions set by the
    build keys, broadcast as ONE row) and drop probe rows map-side
    unless ALL k of their positions are present. Zero false negatives
    by construction (a true key's positions are all set); false
    positives at the classic (1 - e^{-kn/m})^k rate pass through to
    whatever exact join follows — the filter trades a broadcast of
    ~m_bits ints for shuffling the probe side.

    Portable by design: positions come from md5(salt_i || key), so the
    same filter is computable in any engine (the catalog oracle replays
    the identical positions relationally) — unlike engine-private bloom
    builds. The bit-set is PACKED into ``m_bits/64`` longs (``bit_or``
    per word), so the per-row membership test is k O(1) array lookups
    plus shifts — NOT a scan of the set-position list, which costs
    O(set bits) per row and dominates wall once the filter holds more
    than a few hundred positions. ``m_bits`` must be a multiple of 64.
    Output: the probe rows that pass, with the internal columns dropped.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    def positions(key_col):
        return F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{salt}{i}"), key_col.cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % m_bits
                )
                for i in range(k)
            ]
        )

    words = (
        build.select(F.explode(positions(F.col(build_key))).alias("p"))
        .select(
            F.expr("cast(p div 64 as int)").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    bm = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("__m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(element_at(__m, i), cast(0 as bigint)))"
        ).alias("__bm")
    )
    return (
        probe.withColumn("__pos", positions(F.col(probe_key)))
        .crossJoin(F.broadcast(bm))
        .filter(
            F.expr(
                "forall(__pos, p -> (shiftright("
                "element_at(__bm, cast(p div 64 as int) + 1),"
                " cast(p % 64 as int)) & 1) = 1)"
            )
        )
        .drop("__pos", "__bm")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency sketch)
# ---------------------------------------------------------------------------


def _cms_cell(key_col: Column, i: int, width: int, salt: str) -> Column:
    """Hash row i's cell for a key: md5(salt_i || key) % width — the
    same engine-portable construction as ``bloom_prefilter``, so any
    oracle can replay the exact counter grid."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{i}"), key_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch of a key column's frequency distribution
    (Cormode & Muthukrishnan 2005): a depth x width counter grid where
    every input row increments one counter per hash row. Point reads
    (`cms_point_estimates`) take the MIN over the depth counters and
    are ALWAYS over-estimates (collisions only add), within eps*N
    (eps = e/width) with probability 1 - e^-depth — the right tool for
    heavy keys in Zipf data, useless for the flat tail, and the entry's
    differential shows exactly that contract.

    The sketch is a <= depth*width-row DataFrame (~64 KB at the 4x2048
    default) built with ONE map-side-combinable groupBy; sketches over
    disjoint shards merge by additive union (`merge_count_min`) — the
    same commutative-monoid algebra as the HLL / value-histogram /
    partial-agg family, which is what makes it the 100 TB shape:
    per-day sketches merge without reprocessing history, and join-size
    estimates (`cms_inner_product`) come from two sketches alone,
    never the data. Output: (i, j, cnt).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("i"),
                _cms_cell(F.col(key_col), i, width, salt).alias("j"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def merge_count_min(a: DataFrame, b: DataFrame) -> DataFrame:
    """Additive union of two Count-Min sketches built with the same
    (depth, width, salt) — one grid-sized shuffle, map-side combinable."""
    return (
        a.unionByName(b)
        .groupBy("i", "j")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Frequency estimates for a (small) key set off a Count-Min
    sketch: each key probes its depth cells (broadcast-joined against
    the grid — the sketch never exceeds depth*width rows) and takes the
    min. Absent cells count 0, so a key never inserted estimates 0
    unless every one of its cells collides. Output: (key_col, est)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("i"),
                        _cms_cell(F.col(key_col), i, width, salt).alias("j"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.i").alias("i"), F.col("c.j").alias("j"))
    return (
        probes.join(F.broadcast(sketch), ["i", "j"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size estimation from two Count-Min sketches over the join
    key (Cormode & Muthukrishnan 2005, section 4.2): for each hash row
    the cell-wise inner product over-estimates sum_k fA(k)*fB(k) —
    which IS |A join B| on the key — and the min over rows is the
    estimate. Two ~64 KB sketches answer "how big is this 100 TB
    join?" without touching either table again. A hash row with NO
    overlapping cells means the true inner product is 0 — the left
    join + coalesce keeps such rows in the min (an inner join would
    silently drop them and over-estimate). Output: one row (est).
    """
    return (
        a.join(b.withColumnRenamed("cnt", "__bc"), ["i", "j"], "left")
        .groupBy("i")
        .agg(
            F.sum(F.col("cnt") * F.coalesce(F.col("__bc"), F.lit(0))).alias("__ip")
        )
        .agg(F.coalesce(F.min("__ip"), F.lit(0)).cast("long").alias("est"))
    )


def frequent_itemsets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_frac: float = 0.02,
    materialize: bool = True,
    pair_strategy: str = "grouped",
) -> DataFrame:
    """Apriori frequent-pair mining (Agrawal & Srikant, VLDB 1994) over
    (basket, item) rows: emit every unordered item PAIR co-occurring in
    >= ``min_support_frac`` of baskets, with its support and both
    members' single-item supports — the market-basket co-occurrence
    primitive (absent from the reference; its aggregation surface stops
    at per-key counts, e.g. ``search/decorate.js`` count maps).

    The Apriori step is what makes this scale: a pair can be frequent
    only if BOTH members are, so the basket stream is semi-join-pruned
    against the frequent-item set BEFORE the pair explosion, and the
    per-basket self-join runs co-partitioned on the basket key (one
    shuffle each side). The support threshold is declarative
    (single-row total cross-joined by Catalyst as a broadcast), so the
    whole mine is ONE lazy plan with no driver scalars.

    Broadcast bound, stated honestly: item support counts BASKET
    CONTAINMENT, so the frequent-item set is bounded by
    sum(|basket|) / (f × n_baskets) = avg_basket_size / f — NOT the
    single-probability bound ⌊1/f⌋ (each basket row contributes to
    |basket| different items' supports). With the default f = 0.02
    that is 50 × avg_basket_size rows of one item id + one count:
    comfortably broadcast-sized for retail-shaped baskets (tens of
    items), but a corpus of very wide baskets (thousands of items)
    at a tiny f can exceed the broadcast ceiling — there, drop the
    ``F.broadcast`` hints and let AQE pick the join (the semi-join
    prune and pair explosion are unchanged), or raise f.

    Output: item_a < item_b, pair_support, support_a, support_b,
    n_baskets — all exact counts (confidence/lift are ratios of these;
    left to the caller to keep the comparison surface integer-exact).

    ``pair_strategy`` picks how pairs are generated (equality-tested,
    both exact):

    - ``"grouped"`` (default): ONE basket-keyed shuffle into a sorted
      per-basket item array, pairs exploded map-side from the array.
      One fewer corpus-wide exchange than the self-join (measured
      2.26 → 2.02 s at sf0.1 and −1 shuffle), but a basket's pair
      array materializes in memory — fine for retail-shaped baskets
      (≤ thousands of items), wrong for pathological mega-baskets.
    - ``"join"``: co-partitioned per-basket self-join; pairs stream
      through the shuffle with bounded memory per task. Use when a
      single basket's frequent-item pair count can exceed task memory.
    """
    baskets = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    # the basket grid feeds FOUR consumers (total, item supports, both
    # self-join sides); without materialization Catalyst re-runs the
    # distinct shuffle for each (ReusedExchange does not collapse them
    # across the aliased self-join) — checkpoint it once
    if materialize:
        baskets = baskets.localCheckpoint(eager=True)
    tot = baskets.agg(F.count_distinct("__basket").alias("n_baskets"))
    item_supp = baskets.groupBy("__item").agg(F.count(F.lit(1)).alias("__supp"))
    freq = (
        item_supp.crossJoin(F.broadcast(tot))
        .filter(F.col("__supp") >= F.ceil(F.lit(min_support_frac) * F.col("n_baskets")))
        .select("__item", "__supp")
    )
    pruned = baskets.join(
        F.broadcast(freq.select("__item")), "__item", "left_semi"
    )
    if pair_strategy == "grouped":
        lists = (
            pruned.groupBy("__basket")
            .agg(F.sort_array(F.collect_set("__item")).alias("items"))
            .filter(F.size("items") >= 2)  # sequence(0,-1) would DESCEND
        )
        pairs = (
            lists.select(
                F.explode(
                    F.expr(
                        "flatten(transform(sequence(0, size(items) - 2), i ->"
                        " transform(sequence(int(i) + 1, size(items) - 1), j ->"
                        " struct(items[i] AS item_a, items[j] AS item_b))))"
                    )
                ).alias("p")
            )
            .select("p.item_a", "p.item_b")
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("pair_support"))
        )
    elif pair_strategy == "join":
        pairs = (
            pruned.alias("a")
            .join(pruned.alias("b"), "__basket")
            .filter(F.col("a.__item") < F.col("b.__item"))
            .groupBy(
                F.col("a.__item").alias("item_a"),
                F.col("b.__item").alias("item_b"),
            )
            .agg(F.count(F.lit(1)).alias("pair_support"))
        )
    else:
        raise ValueError(f"unknown pair_strategy: {pair_strategy!r}")
    sa = F.broadcast(freq.select(F.col("__item").alias("item_a"), F.col("__supp").alias("support_a")))
    sb = F.broadcast(freq.select(F.col("__item").alias("item_b"), F.col("__supp").alias("support_b")))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .filter(
            F.col("pair_support")
            >= F.ceil(F.lit(min_support_frac) * F.col("n_baskets"))
        )
        .join(sa, "item_a")
        .join(sb, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("pair_support").cast("long").alias("pair_support"),
            F.col("support_a").cast("long").alias("support_a"),
            F.col("support_b").cast("long").alias("support_b"),
            F.col("n_baskets").cast("long").alias("n_baskets"),
        )
    )


def event_transitions(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    event: str = "event_type",
    tie: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral-analytics aggregate behind "what do
    users do after X" (journey analysis, anomaly baselining, simple
    next-event prediction). Complements `funnel_stages` (which tests a
    FIXED path) by measuring ALL observed paths.

    Per user, events ordered by ``(ts, tie)`` (the SURVEY §7 total-order
    rule); each consecutive pair contributes one (from_event, to_event)
    occurrence. Output per ordered pair: ``n`` (count), ``n_from``
    (row marginal) and ``p6 = n·1e6 div n_from`` — the transition
    probability as an exact integer micro-ratio (non-negative, so
    truncating/floor division agree).

    Scale: ONE user-keyed window (lead) + ONE aggregation on the
    (from, to) key space — event-type cardinality squared, tiny; both
    combine map-side. The row marginal is derived FROM the pair counts
    (no second corpus pass), joined back on the from-key. No UDF, no
    global sort, no collect.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user).orderBy(F.asc(ts), F.asc(tie))
    pairs = (
        df.select(F.col(user), F.col(ts), F.col(tie), F.col(event))
        .withColumn("__next", F.lead(event).over(w))
        .filter(F.col("__next").isNotNull())
        .select(
            F.col(event).alias("from_event"), F.col("__next").alias("to_event")
        )
    )
    cnt = pairs.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    marg = cnt.groupBy("from_event").agg(F.sum("n").cast("long").alias("n_from"))
    return (
        cnt.join(F.broadcast(marg), "from_event")
        .select(
            "from_event",
            "to_event",
            "n",
            "n_from",
            # exact split division (the auc_eval overflow lesson):
            # n·1e6 would overflow int64 once a single transition pair
            # passes ~9e12 occurrences; the split form is safe to ~9e15
            F.expr(
                "(n div n_from) * 1000000"
                " + ((n % n_from) * 1000 div n_from) * 1000"
                " + (((n % n_from) * 1000 % n_from) * 1000) div n_from"
            ).alias("p6"),
        )
    )
