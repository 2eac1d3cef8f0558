"""IO layer: sources and sinks (SURVEY.md §2.1).

The reference reads MySQL/JSONL/TSV/OBO/XML/REST/Redis/Mongo and writes
JSONL/TSV/Mongo (S1-S17).  Spark-first restatement:

* columnar staging is **Parquet** — every upstream source is staged once,
  then all operators run on parquet scans that Catalyst prunes
  (column pruning + predicate pushdown reach the scan; verify with
  ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
* JSONL/TSV sources and sinks are first-class (S4/S5/S13/S14).
* the reject channel (S17 — the reference's ``insertion_errors.jsonl``,
  ``search/decorate.js:37-46``) is a quarantine path write.
* JDBC (S1-S3) and Mongo-connector (S10-S12) readers are thin wrappers:
  they only assemble options, so they are unit-testable without servers.

All loaders return plain DataFrames; nothing is collected to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: canonical table names shipped by the test harness (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: columns that MAY be stored as parquet TIMESTAMP(NANOS) by older data
#: generators; Spark reads those as long (spark.sql.legacy.parquet.nanosAsLong)
#: and we convert to timestamp here.  Current testdata stores timestamp[us]
#: (read natively as TIMESTAMP_NTZ), which the dtype check leaves untouched —
#: downstream operators handle both flavors with wall-clock arithmetic.
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one staged parquet table.

    A bare parquet scan: filters/projections applied downstream are pushed
    into this scan by Catalyst, so callers should NOT pre-``select`` here.
    Nanosecond-precision timestamp columns (a parquet type Spark lacks)
    arrive as long nanos and are converted to TimestampType (micros);
    micro-precision parquet timestamps pass through as TIMESTAMP_NTZ.

    ``nanosAsLong`` is set here (runtime-settable) rather than only at
    session build time, so the read works under ANY SparkSession — the
    harness runs ``queries()`` on a plain session it builds itself.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # Integer division, NOT `/ 1000` + floor: `/` on longs promotes to
            # double, and int64 nanos (~1.7e18) exceed double's 53-bit mantissa,
            # silently perturbing ~1.6% of timestamps by 1 µs vs the exact value.
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several staged tables at once; defaults to all of TABLES."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_temp_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register staged tables as temp views so ``spark.sql`` can use them."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


# --------------------------------------------------------------------------
# text-format sources (S4 JSONL, S5 TSV)
# --------------------------------------------------------------------------

def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL source (S4 — ``search/decorate.js:13,31-34``).

    Pass an explicit schema in production: schema inference is a full
    extra pass over 100 TB of text.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_tsv(spark: SparkSession, path: str, schema=None, header: bool = False) -> DataFrame:
    """TSV source (S5 — ``search/pathway_adder.js:13-57`` et al.)."""
    reader = spark.read.option("sep", "\t").option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "false")
    return reader.csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (S13). ``ignoreNullFields`` reproduces the reference's
    remove-empties cosmetic (P3, ``search/decorate.js:124-143``)."""
    df.write.mode(mode).option("ignoreNullFields", "true").json(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """TSV sink (S14 — ``prep_urgi_tsv.js:26-79``)."""
    df.write.mode(mode).option("sep", "\t").option("header", "true").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    sort_within_partitions: tuple[str, ...] = (),
) -> None:
    """Parquet sink with optional hive partitioning + within-file ordering.

    ``sort_within_partitions`` is the parquet analog of the reference's
    secondary indexes (``search/indexCommands.txt``): sorting by the hot
    predicate column gives min/max row-group pruning on read.
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_sized(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    target_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 2048,
    total_rows: int | None = None,
    representative: bool = False,
    **options,
) -> dict:
    """Target-size governed sink — output FILE SIZING is the part of a
    100 TB ETL that ``df.write`` alone gets wrong: task count dictates
    file count, so a 2000-task stage writing a 10 GB result leaves
    2000×5 MB fragments (listing + footer + task overhead on every
    read), while a coalesced stage writing 10 TB leaves multi-GB files
    that break row-group parallelism. This helper prices rows in the
    TARGET format and sizes the write to ``target_bytes`` files.

    Mechanics (two bounded passes, no full pre-scan):

    1. **Price**: write ``sample_rows`` rows (``limit`` — cheap, reads
       only leading partitions; or, with ``representative=True`` and a
       known ``total_rows``, a uniform Bernoulli sample — one extra
       scan, required when encoded row size correlates with position,
       e.g. nested docs of wildly varying depth) to a
       ``<path>__sizing__`` sibling in the same format+options, measure
       encoded bytes via the Hadoop FileSystem API (scheme-honest:
       file:/, hdfs://, s3a://), derive bytes/row. Encoded size is the
       only honest signal — in-memory row width over-prices
       dictionary/RLE-friendly data by 5-20×.
    2. **Cap**: write with ``maxRecordsPerFile = target_bytes //
       bytes_per_row`` so no task emits an oversized file, regardless
       of upstream partitioning.
    3. **Merge (opt-in)**: when the caller supplies ``total_rows``
       (known from an upstream ``observe``/count — this helper never
       forces a second full scan of the input), also
       ``repartition(ceil(total_rows / records_per_file))``
       round-robin so undersized fragments merge and files come out
       uniform. Without it, AQE's coalescing plus the cap still bound
       the size above, just not below.

    Small samples over-estimate bytes/row (footer/dictionary overhead
    amortizes with file size), which errs toward SMALLER files — the
    safe direction. Returns the sizing decision for observability:
    ``{bytes_per_row, records_per_file, n_partitions, sampled}``.
    """
    if representative and not (isinstance(total_rows, int) and total_rows > 0):
        # representative=True is an explicit opt-out of biased limit()
        # pricing; silently falling back to it would defeat the caller's
        # stated intent (round-13 advice). The Bernoulli fraction needs
        # the row count — get it from an upstream observe/count.
        raise ValueError(
            "write_sized(representative=True) requires total_rows > 0 "
            "(the Bernoulli sample fraction is sample_rows/total_rows); "
            f"got total_rows={total_rows!r}"
        )
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    tmp = path.rstrip("/") + "__sizing__"
    fmt_writer = lambda d, p: d.write.mode("overwrite").options(**options).format(
        fmt
    ).save(p)
    if representative and total_rows:
        # ``limit`` prices LEADING rows — biased whenever encoded row
        # size correlates with position (test_io.py builds such a
        # dataset: small rows first, 100× rows last; leading-row pricing
        # under-sizes maxRecordsPerFile and the write emits files far
        # over target). When the caller already knows total_rows, a
        # uniform Bernoulli sample prices the true mixture; it costs one
        # extra scan of the input, the same class of price as the
        # caller's count.
        frac = min(1.0, float(sample_rows) / float(total_rows))
        sample = df.sample(withReplacement=False, fraction=frac, seed=7)
    else:
        sample = df.limit(int(sample_rows))
    fmt_writer(sample, tmp)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = jtmp.getFileSystem(conf)
    sampled_bytes = fs.getContentSummary(jtmp).getLength()
    n_sampled = spark.read.format(fmt).options(**options).load(tmp).count()
    fs.delete(jtmp, True)
    if n_sampled == 0:  # empty input: plain write, nothing to size
        # MUST honor the caller's mode here: fmt_writer hardcodes
        # overwrite (correct for the sizing scratch dir only) — an empty
        # incremental batch written in append mode would otherwise wipe
        # the destination.
        df.write.mode(mode).options(**options).format(fmt).save(path)
        return {"bytes_per_row": 0.0, "records_per_file": 0,
                "n_partitions": None, "sampled": 0}
    bytes_per_row = max(1.0, sampled_bytes / n_sampled)
    records_per_file = max(1, int(target_bytes // bytes_per_row))
    n_parts = None
    out = df
    if total_rows is not None:
        n_parts = max(1, -(-int(total_rows) // records_per_file))
        out = df.repartition(n_parts)
    (
        out.write.mode(mode)
        .options(**options)
        .option("maxRecordsPerFile", records_per_file)
        .format(fmt)
        .save(path)
    )
    return {
        "bytes_per_row": bytes_per_row,
        "records_per_file": records_per_file,
        "n_partitions": n_parts,
        "sampled": n_sampled,
    }


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source — format breadth beyond the reference's JSONL/TSV
    (S4/S5): ORC is the other columnar interchange format a Spark shop
    ingests from Hive-era warehouses. Same pushdown/pruning contract as
    parquet (predicate pushdown + column pruning reach the ORC reader;
    Spark's vectorized ORC scan applies)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source (``binaryFile`` format): ingest a directory of
    opaque media payloads (images/audio/video) as rows of (path,
    modificationTime, length, content BINARY) — the standard entry
    point of the multimodal pipeline (``multimodal.probe_metadata`` /
    ``decode_pixels`` consume the ``content`` column directly).

    Scale: files become splits (one row per file, many files per task);
    ``pathGlobFilter`` prunes at listing time — no bytes are read for
    filtered-out files. Keep payloads ≤ a few MB per row (Arrow batch
    sizing downstream); larger blobs should ride as object-store URIs.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    sort_within_partitions: tuple[str, ...] = (),
) -> None:
    """ORC sink — mirror of ``write_parquet`` (hive partitioning +
    within-file ordering for stripe-level min/max pruning)."""
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


# --------------------------------------------------------------------------
# reject channel (S17)
# --------------------------------------------------------------------------

def split_rejects(df: DataFrame, predicate, reject_path: str | None = None):
    """Split a stream into (valid, rejects) on a row-level predicate (P6),
    optionally quarantining rejects to ``reject_path`` as JSONL — the
    Spark restatement of ``insertion_errors.jsonl`` (S17).

    Returns the valid DataFrame (and writes rejects eagerly when a path is
    given, since the caller usually discards them).
    """
    valid = df.filter(predicate)
    if reject_path is not None:
        df.filter(~predicate).write.mode("overwrite").json(reject_path)
    return valid


# --------------------------------------------------------------------------
# server-backed sources (assembled-options wrappers; no live servers in CI)
# --------------------------------------------------------------------------

def jdbc_reader(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
):
    """JDBC source (S1-S3 — replaces the reference's buffered/cursor MySQL
    scans and its hand-rolled IN-list batching, ``trees/genetree.js:333-373``).

    ``partition_column`` + bounds turns one server-side query into
    ``num_partitions`` parallel range scans — the Spark-native version of
    the reference's GNU-parallel process fan-out (S16).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable" if " " not in table_or_query.strip() else "query", table_or_query)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def mongo_writer(df: DataFrame, uri: str, database: str, collection: str, mode: str = "append"):
    """Mongo sink options (S11/S12). Returns the configured writer; caller
    invokes ``.save()`` where the connector jar is present."""
    return (
        df.write.format("mongodb")
        .mode(mode)
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )


def upsert_parquet_collection(
    spark: SparkSession, path: str, updates: DataFrame, key: str | list[str]
) -> DataFrame:
    """Executed upsert sink against a parquet-staged "collection" — the
    engine-side form of the reference's ``update({_id}, doc, {upsert:
    true})`` Mongo sinks (S12 — ``trees/taxonomy.js:48-69``,
    ``search/decorate.js:145-165``) when staging to parquet instead of a
    live server: matched keys are replaced wholesale, unmatched update
    rows inserted, untouched rows pass through (operators.relational.
    upsert_merge semantics, exactly the connector's ``replaceDocument``).

    The merged result is written to a sibling temp dir and swapped in —
    Spark cannot lazily overwrite a path it is still reading — so the
    collection directory is never observed half-written.  Returns the
    re-read collection.
    """
    import shutil

    from gramene_mongodb_spark.operators.relational import upsert_merge

    exists = os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
    if exists:
        merged = upsert_merge(spark.read.parquet(path), updates, key)
    else:
        merged = updates
    tmp = path.rstrip("/") + ".__upsert_tmp__"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    *keys: str,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (hash-partitioned-on-disk) table.

    Bucketing is the scale answer for a join key used repeatedly
    (homologs⋈genes, tree nodes⋈leaves): both sides pre-hashed into the
    same bucket layout join with NO exchange — the shuffle is paid once
    at write time instead of on every query.  ``sortBy`` the same keys
    so the sort-merge join's sort is also free.

    ``path`` makes it an external table (data survives DROP TABLE);
    bucketed layout requires the table catalog (``saveAsTable``), not a
    bare ``.parquet(path)`` write.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def zorder_key(col_a, col_b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative integer columns —
    a sort key that clusters BOTH dimensions at once.

    ``write_parquet(sort_within_partitions=("__z",))`` with this key
    gives min/max row-group pruning on either column (or both), where a
    plain sort only prunes its leading column — the parquet analog of a
    composite index for two-dimensional predicates (region × position,
    user × time).  Pure bit arithmetic, JVM-side, no UDF; callers clamp
    values into [0, 2^bits).
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def observed(df: DataFrame, name: str, **metrics):
    """Attach zero-overhead pipeline counters to a DataFrame (the Spark
    restatement of the reference's every-1000-docs progress logs,
    A9 — ``search/decorate.js:40-44``): metrics are computed inside the
    existing job (no extra pass, no driver loop) and read from the
    returned ``Observation`` after any action.

        df2, obs = observed(df, "load", rows=F.count(F.lit(1)),
                            bad=F.sum(F.when(cond, 1).otherwise(0)))
        df2.write.parquet(...)
        obs.get  # {'rows': ..., 'bad': ...}

    At 100 TB this is how row-count/invariant assertions ship with the
    job instead of as separate validation scans.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[expr.alias(alias) for alias, expr in metrics.items()]), obs


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_bytes`` files — the maintenance job that keeps a 100 TB
    lake scannable after streaming/incremental writers fragment it
    (every tiny file costs a task + an open + footer reads; compaction
    restores row-group-sized scans and healthy listing times).

    Sizing reads the CURRENT on-disk bytes (the only honest signal —
    row counts don't predict encoded size), then one
    ``repartition(n)`` rewrite. Round-robin repartition, so output
    files are uniformly sized even when the input is skewed. Returns
    the number of output partitions.

    At real scale run per partition-directory (dt=.../hour=...) so
    compaction parallelizes across partitions and never rewrites the
    whole table; this single-dir form is that building block.
    """
    df = spark.read.parquet(src)
    # size via the Hadoop FS API so any scheme (s3a://, hdfs://, file:/)
    # works — os.walk would silently see nothing on object stores
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # dst == src would let mode("overwrite") delete the input out from
    # under the lazy read — that destroys the data, not compacts it.
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    dfs = jdst.getFileSystem(spark._jsc.hadoopConfiguration())
    if str(fs.makeQualified(jpath)) == str(dfs.makeQualified(jdst)):
        raise ValueError(
            f"compact_parquet: dst must differ from src ({src!r}); "
            "write to a sibling path and swap"
        )
    files = fs.listFiles(jpath, True)
    total = 0
    while files.hasNext():
        st = files.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    n = max(1, -(-total // int(target_bytes)))
    df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profile — the ANALYZE/stats-collection job every
    lake runs before planning and after loads (null counts feed quality
    gates, exact NDVs feed join-strategy and bucketing decisions,
    min/max feed partition-pruning sanity checks).

    ONE aggregation over the table computes, per column: null count,
    EXACT distinct count, and lexicographic min/max (stringified so one
    schema fits every column type); a ``stack`` unpivot reshapes the
    single wide row into one row per column. Multi-column exact
    distincts make Catalyst plan an Expand (one duplicated stream per
    distinct column) — the honest cost of exactness in one pass; for
    quick profiles of very wide tables pass a column subset, or use
    approx_count_distinct upstream (the a_approx_aggregates sketch
    path) when 2% error is acceptable.

    Output: (column, n_rows, n_nulls, n_distinct, min_value, max_value).
    """
    from pyspark.sql import functions as F

    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        # F.col() PARSES its argument (dots split, backticks quote), so
        # reference the source column in fully-quoted form — a column
        # literally named "a`b" or "u.v" must profile like any other
        src = F.col("`" + c.replace("`", "``") + "`")
        aggs += [
            # count(when(...)) not sum(when(...)): sum over an EMPTY
            # table is NULL, count is 0 — the empty profile must read
            # as zeros, not nulls
            F.count(F.when(src.isNull(), 1)).alias(f"__nn_{c}"),
            F.count_distinct(src).alias(f"__nd_{c}"),
            F.min(src.cast("string")).alias(f"__mn_{c}"),
            F.max(src.cast("string")).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    # double embedded backticks inside the backtick-quoted derived
    # identifiers (same rule as check_expectations) — the alias() calls
    # above take the name literally, selectExpr parses it
    stack = ", ".join(
        f"""'{c.replace("'", "''")}', """
        f"`__nn_{b}`, `__nd_{b}`, `__mn_{b}`, `__mx_{b}`"
        for c in cols
        for b in (c.replace("`", "``"),)
    )
    return wide.selectExpr(
        "CAST(__n AS BIGINT) AS n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def check_expectations(
    df: DataFrame,
    row_checks: dict[str, "object"] | None = None,
    unique: dict[str, tuple[str, ...]] | None = None,
    foreign_keys: dict[str, tuple[str, DataFrame, str]] | None = None,
    fk_broadcast: bool = True,
) -> DataFrame:
    """Declarative data-quality gate (the deequ/dbt-tests role): verify
    a load against named expectations and emit one row per expectation
    with its violation count — the artifact a 100 TB pipeline writes
    next to every partition it publishes, so a bad load is caught at
    the sink, not three jobs downstream.

    Three expectation families, each with the cheapest faithful plan:

    - ``row_checks``: name → boolean Column; ALL compile into ONE
      aggregate pass (``count(when(~pred))`` per check — violations of
      any number of row predicates cost a single scan). Covers
      not-null, accepted-values, ranges, regex shape, cross-column
      implications.
    - ``unique``: name → column tuple; exact duplicate count via
      ``count(*) − count(distinct struct(cols))`` in the SAME single
      aggregate (multi-distinct costs Catalyst an Expand — the honest
      price of exactness; at extreme widths run uniqueness separately).
      NULL-key rule (pinned by test): NULL keys PARTICIPATE — the key
      tuple is wrapped in a struct, so rows whose keys are partly or
      fully NULL compare field-wise and duplicate NULL tuples COUNT as
      violations. This is stricter than ANSI UNIQUE (which ignores
      NULLs) and matches the practical primary-key intent: two
      NULL-keyed rows in a PK column are a data bug, not "unknown".
    - ``foreign_keys``: name → (col, ref_df, ref_col); orphan count by
      LEFT ANTI join, broadcast when the reference side is a dimension
      (``fk_broadcast``, the common case), shuffle-hash otherwise.
      NULL FKs are not orphans (SQL semantics: membership unknown).

    Output: ``(expectation, kind, violations, total, passed)``, ordered
    by name. ``total`` is the scanned row count (denominator for
    violation-rate alerting)."""
    from pyspark.sql import functions as F

    row_checks = row_checks or {}
    unique = unique or {}
    foreign_keys = foreign_keys or {}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in row_checks.items():
        aggs.append(F.count(F.when(~pred, 1)).alias(f"__rc_{name}"))
    for name, cols in unique.items():
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in cols]))
            ).alias(f"__uq_{name}")
        )
    wide = df.agg(*aggs)
    parts = []
    for name in row_checks:
        parts.append((name, "row_check", f"__rc_{name}"))
    for name in unique:
        parts.append((name, "unique", f"__uq_{name}"))
    spark = df.sparkSession
    if parts:
        # expectation names are caller-supplied strings interpolated
        # into SQL — double any single quote in the literal and
        # backtick-quote the derived column identifier so a name like
        # "don't pass" can't break (or inject into) the stack() expr
        stack = ", ".join(
            f"""'{n.replace("'", "''")}', '{k}', `{c.replace("`", "``")}`"""
            for n, k, c in parts
        )
        out = wide.selectExpr(
            "CAST(__n AS BIGINT) AS total",
            f"stack({len(parts)}, {stack}) AS (expectation, kind, violations)",
        )
    else:  # FK-only gate: no single-pass aggregate to unpivot
        out = spark.createDataFrame(
            [],
            "expectation STRING, kind STRING, violations BIGINT, total BIGINT",
        )
    for name, (col, ref_df, ref_col) in foreign_keys.items():
        ref = ref_df.select(F.col(ref_col).alias(col)).distinct()
        if fk_broadcast:
            ref = F.broadcast(ref)
        orphans = (
            df.select(col)
            .filter(F.col(col).isNotNull())
            .join(ref, col, "left_anti")
        )
        fk_row = orphans.agg(
            F.count(F.lit(1)).alias("violations")
        ).crossJoin(
            df.agg(F.count(F.lit(1)).cast("long").alias("total"))
        ).select(
            F.lit(name).alias("expectation"),
            F.lit("foreign_key").alias("kind"),
            F.col("violations").cast("long"),
            "total",
        )
        out = out.select("expectation", "kind", "violations", "total").unionByName(
            fk_row
        )
    return out.select(
        "expectation",
        "kind",
        F.col("violations").cast("long").alias("violations"),
        F.col("total").cast("long").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("expectation")


def conform_schema(df: DataFrame, target) -> DataFrame:
    """Project a DataFrame onto a target StructType: columns come out
    in target order; absent ones materialize as typed NULLs; present
    ones are cast (int->long, float->double and friends follow Spark
    cast semantics). Extra source columns are dropped. This is the
    column-level contract a multi-year parquet collection needs —
    readers pin the CURRENT schema and old files conform, instead of
    every consumer carrying per-generation special cases."""
    from pyspark.sql import functions as F

    have = {f.name for f in df.schema.fields}
    return df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target.fields
        ]
    )


def read_evolving(
    spark: SparkSession, paths: list[str] | tuple[str, ...], target=None
) -> DataFrame:
    """Read a parquet collection whose files span SCHEMA GENERATIONS —
    the normal state of a 100 TB corpus written over years.

    Fast path: one ``mergeSchema`` read — a SINGLE scan relation that
    unions columns by name (absent -> null), so partition pruning and
    pushdown still apply across all generations. Spark REFUSES that
    merge when two generations disagree on a column's TYPE (e.g. a
    float column widened to double); in that case, given a ``target``
    StructType, each path is read separately, conformed
    (`conform_schema`), and unioned by name — per-generation scans,
    each still pruned/pushed-down, with the cast happening map-side.
    Without ``target`` the type conflict re-raises: silently guessing
    a winner would corrupt whichever generation loses.
    """
    paths = list(paths)
    try:
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        # force schema resolution HERE so a type conflict surfaces
        # inside this try, not at first action
        df.schema
    except Exception as e:
        # ONLY the merge refusal (SparkException [CANNOT_MERGE_SCHEMAS]
        # / [CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE]) falls back to
        # per-generation reads; a transient FS/permission error or a
        # missing path re-raises — masking those into the fallback
        # could read partial data or fail confusingly later
        if "CANNOT_MERGE" not in str(e) and "Failed merging schemas" not in str(e):
            raise
        if target is None:
            raise
        from functools import reduce

        return reduce(
            DataFrame.unionByName,
            [conform_schema(spark.read.parquet(p), target) for p in paths],
        )
    return conform_schema(df, target) if target is not None else df
