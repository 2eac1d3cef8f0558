"""Unit tests for text-analysis extensions (boilerplate detection, PII
scan) on hand-built fixtures; the documents-table paths are covered by
the oracle parity suite (x_text_stats / x_boilerplate_shingles / …)."""

from __future__ import annotations

from gramene_mongodb_spark.operators import textops as T


def test_boilerplate_shingles_finds_repeated_span(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "intro text the quick brown fox jumps again"),
            (3, "completely different words here entirely now"),
            (4, "tiny doc"),  # shorter than n → contributes nothing
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.gram: r.df for r in T.boilerplate_shingles(df, n=5, min_docs=2).collect()}
    assert out == {"the quick brown fox jumps": 2}


def test_boilerplate_shingles_dedups_within_doc(spark):
    # the same 2-gram repeated inside ONE doc must count that doc once
    df = spark.createDataFrame(
        [(1, "ha ha ha ha"), (2, "ha ha only")],
        "doc_id LONG, text STRING",
    )
    out = {r.gram: r.df for r in T.boilerplate_shingles(df, n=2, min_docs=2).collect()}
    assert out == {"ha ha": 2}


def test_pii_scan_counts_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob@test.org today"),
            (2, "call 555-123-4567 about ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in T.pii_scan(df).collect()}
    assert rows[1].n_email == 2 and rows[1].n_pii_total == 2
    assert rows[2].n_phone == 1 and rows[2].n_ssn_like == 1
    assert rows[2].n_pii_total == 2
    assert rows[3].n_pii_total == 0


def test_pii_scan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "doc_id LONG, text STRING")
    out = T.pii_scan(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_deterministic_sample_full_rate_keeps_everything(spark):
    """Regression: rate=1.0 must be all-pass — format(256,'02x')='100'
    compares LOWER than most hex pairs and used to drop nearly all rows."""
    from gramene_mongodb_spark.operators.relational import deterministic_sample

    df = spark.createDataFrame([(i,) for i in range(200)], "id LONG")
    assert deterministic_sample(df, "id", 1.0).count() == 200
    assert deterministic_sample(df, "id", 0.0).count() == 0


def test_deterministic_sample_by_respects_strata_rates(spark):
    from gramene_mongodb_spark.operators.relational import (
        deterministic_sample,
        deterministic_sample_by,
    )

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(400)]
    df = spark.createDataFrame(rows, "id LONG, lang STRING")
    out = deterministic_sample_by(df, "id", "lang", {"en": 0.25, "zh": 1.0})
    got = {r.lang: r.n for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert got["zh"] == 200                      # rate 1.0: all kept
    assert 20 <= got["en"] <= 80                 # ~25% of 200, hash variance
    # per-stratum selection == single-rate selection restricted to the stratum
    en_only = deterministic_sample(df.filter("lang = 'en'"), "id", 0.25)
    assert {r.id for r in out.filter("lang='en'").collect()} == {
        r.id for r in en_only.collect()
    }


def test_chunk_documents_windows_and_tail(spark):
    # 10 tokens, chunk 4, stride 3 → starts 0,3,6,9; last two are short
    words = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, words)], "doc_id LONG, text STRING")
    rows = sorted(
        T.chunk_documents(df, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_id, r.n_tokens) for r in rows] == [(0, 4), (1, 4), (2, 4), (3, 1)]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # 1 token of overlap
    assert rows[3].chunk_text == "t9"


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only three words")], "doc_id LONG, text STRING")
    rows = T.chunk_documents(df, chunk_tokens=128, stride=96).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "only three words"
    assert rows[0].n_tokens == 3


def test_repetition_stats_flags_looping_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),       # 4 bigrams, all "spam spam"
            (2, "all different words entirely"),   # 3 bigrams, counts 1
            (3, "short"),                          # < n tokens → no grams
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in T.repetition_stats(df, n=2).collect()}
    assert out[1].repetition_ratio == 1.0
    assert out[1].top_gram == "spam spam" and out[1].top_gram_count == 4
    # deterministic lexicographic tie-break among count-1 grams
    assert out[2].top_gram == "all different" and out[2].repetition_ratio == 0.3333
    assert out[3].n_grams == 0 and out[3].top_gram is None
    assert out[3].repetition_ratio == 0.0


def test_tfidf_top_terms_ranks_rare_terms_first(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple banana common common"),
            (2, "banana cherry common"),
            (3, "common common common durian"),
        ],
        "doc_id LONG, text STRING",
    )
    out = T.tfidf_top_terms(df, "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple (df=1, tf=2) must outrank banana (df=2) and common (df=3)
    assert by_doc[1][0].term == "apple" and by_doc[1][0].rank == 1
    # 'common' appears in every doc -> idf = ln(1) = 0 -> score 0
    common = [r for r in out if r.term == "common"]
    assert all(r.score == 0 for r in common)
    # durian unique to doc 3 -> its top term
    assert by_doc[3][0].term == "durian"
    # exactly k rows max per doc, ranks contiguous from 1
    assert all(len(v) <= 2 and v[0].rank == 1 for v in by_doc.values())


def test_contamination_check_flags_shared_ngrams(spark):
    from gramene_mongodb_spark.operators import dedup as D

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id LONG, text STRING",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "quick brown fox jumps over"
            (1, "she saw the quick brown fox jumps over a fence today"),
            (2, "completely unrelated words about spark and parquet files"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in
           D.contamination_check(corpus, bench, "doc_id", n=5).collect()}
    assert 1 in out and out[1].n_hit >= 1
    assert 2 not in out  # clean docs are not emitted


def test_inverse_sqrt_sample_rates_and_determinism(spark):
    from gramene_mongodb_spark.operators.relational import inverse_sqrt_sample

    rows = [(i, "big" if i < 400 else "tiny") for i in range(420)]
    df = spark.createDataFrame(rows, "id LONG, src STRING")
    kept1 = {r.id for r in inverse_sqrt_sample(df, "id", "src", coeff=4.0).collect()}
    kept2 = {r.id for r in inverse_sqrt_sample(df, "id", "src", coeff=4.0).collect()}
    assert kept1 == kept2  # deterministic
    # tiny stratum (n=20 < 16^2/... -> rate 4/sqrt(20) ~ 0.89): k=round(229)
    # big stratum n=400 -> rate 4/20 = 0.2 -> k=51 -> ~20% kept
    big = [i for i in kept1 if i < 400]
    tiny = [i for i in kept1 if i >= 400]
    assert 0.10 <= len(big) / 400 <= 0.30
    assert len(tiny) / 20 >= 0.6
    # n <= coeff^2 (=16) keeps EVERYTHING (rate clamps to 1)
    small = spark.createDataFrame([(i, "s") for i in range(10)], "id LONG, src STRING")
    assert inverse_sqrt_sample(small, "id", "src").count() == 10


def test_inverse_sqrt_sample_null_strata_form_own_stratum(spark):
    """NULL strata must not vanish through the rate join: a small NULL
    stratum (n <= coeff^2) is kept whole, like any other small stratum."""
    from gramene_mongodb_spark.operators.relational import inverse_sqrt_sample

    rows = [(i, None if i >= 400 else "big") for i in range(410)]
    df = spark.createDataFrame(rows, "id LONG, src STRING")
    kept = inverse_sqrt_sample(df, "id", "src", coeff=4.0).collect()
    null_kept = [r.id for r in kept if r.src is None]
    assert sorted(null_kept) == list(range(400, 410))  # n=10 <= 16 -> all kept
    big_kept = [r.id for r in kept if r.src == "big"]
    assert 0.10 <= len(big_kept) / 400 <= 0.30
    assert set(df.columns) == {c for r in kept[:1] for c in r.asDict()}


def test_quota_sample_caps_and_preserves(spark):
    from gramene_mongodb_spark.operators.relational import quota_sample

    rows = [(i, "big" if i < 100 else "small", i * 10) for i in range(105)]
    df = spark.createDataFrame(rows, "id LONG, src STRING, payload LONG")
    kept = quota_sample(df, "id", "src", quota=10).collect()
    by_src: dict = {}
    for r in kept:
        by_src.setdefault(r.src, []).append(r.id)
    assert len(by_src["big"]) == 10          # capped exactly
    assert sorted(by_src["small"]) == [100, 101, 102, 103, 104]  # under quota -> whole
    # deterministic + all columns preserved
    again = quota_sample(df, "id", "src", quota=10).collect()
    assert sorted((r.id, r.payload) for r in kept) == sorted(
        (r.id, r.payload) for r in again
    )
    assert set(kept[0].asDict()) == {"id", "src", "payload"}
    # a different salt changes the surviving set (independent draws)
    other = {r.id for r in quota_sample(df, "id", "src", quota=10, salt="s2").collect()
             if r.src == "big"}
    assert other != set(by_src["big"])


def test_canonical_url_edge_cases(spark):
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.operators.textops import canonical_url

    cases = [
        # (raw, expected canonical)
        ("HTTPS://WWW.Site.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://site.com/a/b?a=1&b=2"),
        ("http://site.com:80/x", "http://site.com/x"),
        ("https://site.com:80/x", "https://site.com:80/x"),  # non-default port kept
        ("http://site.com:8080/x", "http://site.com:8080/x"),
        ("HTTP://Example.org", "http://example.org"),
        ("http://a.com/p?utm_campaign=z&fbclid=q", "http://a.com/p"),  # all tracked -> no ?
        ("http://a.com/p/?q=1&q=1", "http://a.com/p?q=1&q=1"),  # duplicates kept, sorted
        ("site.com/path/", "site.com/path"),  # schemeless best-effort
    ]
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(cases)],
                               "i LONG, url STRING")
    got = {r.i: r.c for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_span_dedup_first_occurrence_wins(spark):
    from gramene_mongodb_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # spans (W=2): "a b", "c d"
            (2, "a b x y"),          # "a b" already seen in doc 1 -> dropped
            (3, "c d c d"),          # both spans duplicate doc 1's "c d"
            (4, "zz"),               # single short span, unique
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r for r in span_dedup(df, "doc_id", span_tokens=2).collect()}
    assert (got[1].n_spans, got[1].n_kept, got[1].text_kept) == (2, 2, "a b c d")
    assert (got[2].n_spans, got[2].n_kept, got[2].text_kept) == (2, 1, "x y")
    # doc 3: both spans are "c d" — the corpus winner is doc 1, and the
    # within-doc repeat loses to its own first index too
    assert (got[3].n_spans, got[3].n_kept, got[3].text_kept) == (2, 0, "")
    assert (got[4].n_spans, got[4].n_kept, got[4].text_kept) == (1, 1, "zz")


def test_span_dedup_empty_doc_dropped(spark):
    from gramene_mongodb_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(1, "some words here"), (2, "...")], "doc_id LONG, text STRING"
    )
    got = {r.doc_id for r in span_dedup(df, "doc_id", span_tokens=2).collect()}
    assert got == {1}  # token-free docs vanish (same on the oracle side)


def test_pack_documents_covers_every_token_contiguously(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}", 10 + (i * 37) % 90) for i in range(60)],
        "doc_id LONG, text STRING, n_tokens LONG",
    )
    out = T.pack_documents(
        docs, "doc_id", "n_tokens", budget=100, shards=4
    ).collect()
    assert len(out) == 60
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1  # hash sharding actually spreads
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.offset)
        # offsets tile the shard stream exactly: no gaps, no overlaps
        pos = 0
        for r in rows:
            assert r.offset == pos, (shard, r.doc_id)
            assert r.first_pack == pos // 100
            assert r.last_pack == max(pos // 100, (pos + r.n_tokens - 1) // 100)
            assert r.n_packs == r.last_pack - r.first_pack + 1 >= 1
            pos += r.n_tokens


def test_pack_documents_deterministic_order(spark):
    docs = spark.createDataFrame(
        [(i, 5) for i in range(40)], "doc_id LONG, n_tokens LONG"
    )
    a = {r.doc_id: (r.shard, r.offset) for r in T.pack_documents(docs).collect()}
    b = {r.doc_id: (r.shard, r.offset) for r in T.pack_documents(docs).collect()}
    assert a == b  # content-addressed: re-run identical


def test_bm25_rare_term_outranks_common(spark):
    rows = [(i, "common words filler " + ("common " * 5)) for i in range(20)]
    rows.append((100, "common words needle filler"))
    rows.append((101, "needle needle unrelated"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = T.bm25_scores(df, ["needle", "common"], k=5).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    # docs containing the rare term outrank ubiquitous-term-only docs
    top2 = {out[0].doc_id, out[1].doc_id}
    assert top2 == {100, 101}
    assert all(r.score_micro >= 0 for r in out)
    # scores strictly ordered by (score desc, doc_id asc)
    pairs = [(-r.score_micro, r.doc_id) for r in out]
    assert pairs == sorted(pairs)


def test_bm25_length_normalization(spark):
    # same tf for the query term; shorter doc must score higher (needle
    # kept under half the corpus so the Robertson idf doesn't clamp to 0)
    rows = [(1, "needle " + "pad " * 3), (2, "needle " + "pad " * 50)]
    rows += [(10 + i, "no match here") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.doc_id: r.score_micro for r in T.bm25_scores(df, ["needle"], k=10).collect()}
    assert out[1] > out[2] > 0
    assert 3 not in out


# ---------------------------------------------------------------------------
# round 6: token budget / cluster split / inverted index / top n-grams
# ---------------------------------------------------------------------------


def test_token_budget_respects_budget_per_stratum(spark):
    from gramene_mongodb_spark.operators import relational as R

    rows = [(i, "a", 100) for i in range(10)] + [(100 + i, "b", 300) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_tokens LONG")
    out = R.token_budget_sample(df, "doc_id", "n_tokens", "source", 500).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # inclusive-sum rule: each stratum's kept total never exceeds the budget
    assert sum(r.n_tokens for r in by_src["a"]) <= 500
    assert sum(r.n_tokens for r in by_src["b"]) <= 500
    assert len(by_src["a"]) == 5 and len(by_src["b"]) == 1
    # cum_tokens is the inclusive running sum in selection order
    for rs in by_src.values():
        rs.sort(key=lambda r: r.cum_tokens)
        total = 0
        for r in rs:
            total += r.n_tokens
            assert r.cum_tokens == total


def test_token_budget_oversized_doc_dropped_not_truncated(spark):
    from gramene_mongodb_spark.operators import relational as R

    df = spark.createDataFrame([(1, "a", 10_000)], "doc_id LONG, source STRING, n_tokens LONG")
    assert R.token_budget_sample(df, "doc_id", "n_tokens", "source", 500).count() == 0


def test_split_by_cluster_is_leakage_safe_and_total(spark):
    from gramene_mongodb_spark.operators import relational as R
    from pyspark.sql import Window, functions as F

    # two docs per cluster, 200 clusters
    rows = [(i, i // 2) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id LONG, cluster_id LONG")
    out = R.split_by_cluster(df, "cluster_id").collect()
    assert len(out) == 400 and all(r.split in ("train", "val", "test") for r in out)
    per_cluster = {}
    for r in out:
        per_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # every member of a cluster lands in the SAME split
    assert all(len(s) == 1 for s in per_cluster.values())
    # all three labels occur at 200 clusters / default 90-5-5
    labels = {next(iter(s)) for s in per_cluster.values()}
    assert labels == {"train", "val", "test"}
    n_train = sum(1 for s in per_cluster.values() if "train" in s)
    assert n_train > 140  # ~90% of 200, generous slack


def test_inverted_index_postings_sorted_and_df_consistent(spark):
    docs = spark.createDataFrame(
        [(3, "alpha beta"), (1, "beta gamma beta"), (2, "alpha"), (4, "delta")],
        "doc_id LONG, text STRING",
    )
    out = {r.term: r for r in T.inverted_index(docs, min_df=2).collect()}
    assert set(out) == {"alpha", "beta"}  # gamma/delta are hapax
    assert out["alpha"].postings == [2, 3]
    assert out["beta"].postings == [1, 3]  # per-doc distinct: doc 1 counted once
    assert all(r.df == len(r.postings) for r in out.values())


def test_top_ngrams_exact_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id LONG, text STRING"
    )
    out = T.top_ngrams(docs, n=2, k=10).collect()
    assert [(r.gram, r.cnt) for r in out[:2]] == [("a b", 3), ("b a", 1)]
    # single-token doc contributes no bigram; ranks are dense from 1
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    assert sum(r.cnt for r in out) == 5


def test_lm_score_rare_bigrams_score_higher_nll(spark):
    # "the cat" repeated everywhere is probable; "zk qx" appears once
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "zk qx zz vv"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in T.ngram_lm_score(df).collect()}
    assert len(out) == 11
    # repeats count as occurrences: 5 bigrams per common doc, 3 for the odd one
    assert out[0].n_bigrams == 5 and out[100].n_bigrams == 3
    assert out[100].avg_nll6 > out[0].avg_nll6
    for r in out.values():
        assert r.sum_nll6 >= 0 and r.avg_nll6 == r.sum_nll6 // r.n_bigrams


def test_lm_score_single_token_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "word"), (2, "two words")], "doc_id LONG, text STRING"
    )
    out = T.ngram_lm_score(df).collect()
    assert [r.doc_id for r in out] == [2]


def test_token_budget_monotone_in_budget(spark):
    """A larger budget keeps a SUPERSET of a smaller budget's rows (the
    kept set is a prefix of the same md5-ordered cumsum), so budget
    tuning never swaps documents, only extends the prefix."""
    from gramene_mongodb_spark.operators import relational as R

    rows = [(i, f"s{i % 3}", 50 + (i * 37) % 200) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_tokens LONG")
    small = {r.doc_id for r in R.token_budget_sample(df, "doc_id", "n_tokens", "source", 500).collect()}
    large = {r.doc_id for r in R.token_budget_sample(df, "doc_id", "n_tokens", "source", 2000).collect()}
    assert small < large


def test_funnel_stages_ordering_window_and_ties(spark):
    from datetime import datetime

    from gramene_mongodb_spark.operators import relational as R
    from pyspark.sql import functions as F

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1: full ordered funnel inside the window
        (1, t(10), "view"), (1, t(20), "click"), (1, t(30), "purchase"),
        # u2: click BEFORE first view -> never advances past stage 1
        (2, t(20), "click"), (2, t(30), "view"),
        # u3: click at the EXACT view timestamp -> strict > does not advance
        (3, t(10), "view"), (3, t(10), "click"),
        # u4: click outside the window -> stage 1 only
        (4, t(0), "view"), (4, t(50), "click"),
        # u5: no matching step at all
        (5, t(0), "error"),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP_NTZ, event_type STRING")
    out = {
        r.user_id: r.funnel_stage
        for r in R.funnel_stages(
            df,
            "user_id",
            "ts",
            [
                ("view", F.col("event_type") == "view"),
                ("click", F.col("event_type") == "click"),
                ("purchase", F.col("event_type") == "purchase"),
            ],
            window_s=30,
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 1, 4: 1, 5: 0}


def test_cohort_retention_day_semantics(spark):
    from datetime import datetime

    from gramene_mongodb_spark.operators import relational as R

    d = lambda day, h=0: datetime(2024, 1, 1 + day, h)
    rows = [
        # u1 first active day 0, returns day 2 (twice -> still 1 distinct)
        (1, d(0)), (1, d(2)), (1, d(2, 5)),
        # u2 first active day 2, returns day 3
        (2, d(2)), (2, d(3)),
        # u3 only day 0
        (3, d(0)),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP_NTZ")
    out = {
        (r.cohort_period, r.period_offset): r.n_users
        for r in R.cohort_retention(df, "user_id", "ts", "2024-01-01", unit="day").collect()
    }
    assert out == {(0, 0): 2, (0, 2): 1, (2, 0): 1, (2, 1): 1}


def test_scd2_history_change_compression_and_intervals(spark):
    from datetime import datetime

    from gramene_mongodb_spark.operators import relational as R

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), 1, "A"), (1, t(10), 2, "A"),  # unchanged -> compressed away
        (1, t(20), 3, "B"), (1, t(30), 4, "A"),  # A again = NEW version
        (2, t(5), 5, "X"),
    ]
    df = spark.createDataFrame(rows, "k LONG, ts TIMESTAMP_NTZ, eid LONG, attr STRING")
    out = sorted(
        (r.k, r.ts, r.attr, r.valid_to, r.is_current)
        for r in R.scd2_history(df, "k", "ts", ["attr"], order_extra=["eid"]).collect()
    )
    assert [(k, a, vt is None, cur) for k, _, a, vt, cur in out] == [
        (1, "A", False, False),
        (1, "B", False, False),
        (1, "A", True, True),
        (2, "X", True, True),
    ]
    # valid_to chains to the next change's valid_from
    k1 = [r for r in out if r[0] == 1]
    assert k1[0][3] == k1[1][1] and k1[1][3] == k1[2][1]


def test_fixed_sample_exact_n_stable_and_subset_free(spark):
    from gramene_mongodb_spark.operators import relational as R

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id LONG")
    a = sorted(r.doc_id for r in R.fixed_sample(df, "doc_id", 50).collect())
    b = sorted(r.doc_id for r in R.fixed_sample(df, "doc_id", 50).collect())
    assert a == b and len(a) == 50
    # different salt -> different (decorrelated) selection
    c = sorted(r.doc_id for r in R.fixed_sample(df, "doc_id", 50, salt="other").collect())
    assert c != a
    # n > corpus -> whole corpus
    assert R.fixed_sample(df, "doc_id", 1000).count() == 500


def test_pii_redact_sequential_and_counts(spark):
    from gramene_mongodb_spark.operators import textops as T

    rows = [
        (1, "mail me at bob@example.com or call 555-867-5309 ok."),
        (2, "ssn 123-45-6789 twice: 987-65-4321"),
        (3, "clean text with no sensitive spans at all"),
        (4, "two mails a@b.co c@d.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r.doc_id: r for r in T.pii_redact(df, "text").collect()}
    assert out[1].text_redacted == "mail me at [EMAIL] or call [PHONE] ok."
    assert out[1].n_redactions == 2
    assert out[2].text_redacted == "ssn [SSN] twice: [SSN]"
    assert out[2].n_redactions == 2
    assert out[3].text_redacted == rows[2][1] and out[3].n_redactions == 0
    assert out[4].text_redacted == "two mails [EMAIL] [EMAIL]"
    assert out[4].n_redactions == 2


def test_line_filter_rules(spark):
    from gramene_mongodb_spark.operators import textops as T

    text = "\n".join(
        [
            "A proper sentence with plenty of words.",   # kept
            "Ends well?",                                 # <3 words
            "No terminal punctuation here at all",        # no terminal punct
            "Please accept our cookie policy today.",     # blacklist
            "  Trimmed line also counts as kept.  ",      # kept after trim
            "",                                           # empty
            'He said "stop".',                            # kept (quote ok? ends with .)
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    r = T.line_filter(df, "doc_id", "text").collect()[0]
    assert r.n_lines == 7
    assert r.n_kept == 3
    assert r.text_clean == (
        "A proper sentence with plenty of words.\n"
        "Trimmed line also counts as kept.\n"
        'He said "stop".'
    )


def test_html_extract_rules(spark):
    """Every html_extract rule on hand-built markup: script/style die
    WITH contents (even with '<' inside the script body), comments die,
    block tags break lines, inline tags become spaces (no word gluing),
    entities decode one level (&amp;lt; -> &lt;, never <), whitespace
    collapses, blank lines drop."""
    from gramene_mongodb_spark.operators import textops as T

    html = (
        '<html><head><STYLE media="all">body {color:#000}</STYLE></head>'
        "<body><!-- secret\nnote --><h2>Head</h2>"
        "<p>alpha<b>beta</b> gamma &amp; delta&nbsp;&lt;tag&gt;</p>"
        "<script type='text/js'>if (1<2) { alert('x'); }</script>"
        "<ul><li>item one</li><li>item   two</li></ul>"
        "<p>literal &amp;lt; stays encoded</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id: long, html: string")
    r = T.html_extract(df, "doc_id", "html").collect()[0]
    assert r.text == (
        "Head\n"
        "alpha beta gamma & delta <tag>\n"
        "item one\n"
        "item two\n"
        "literal &lt; stays encoded"
    )
    assert r.n_lines == 5


def test_bleu_scores_clipping_reference(spark):
    """Hand-computed BLEU-2 check: clipping caps candidate gram counts
    at the reference's; brevity log-argument emitted exactly."""
    from gramene_mongodb_spark.operators import textops as T

    pairs = spark.createDataFrame(
        [
            # ref: "the cat sat", cand: "the the the cat"
            # p1: clipped matches = min(3,1)['the'] + 1['cat'] = 2, total 4
            # bigrams cand: [the the, the the, the cat]; ref: [the cat, cat sat]
            # p2: 'the cat' min(1,1)=1, 'the the' min(2,0)=0 -> 1/3
            (1, "the cat sat", "the the the cat"),
            # equal strings -> all 1.0
            (2, "a b c d", "a b c d"),
        ],
        "pair_id: long, ref: string, cand: string",
    )
    out = {r.pair_id: r for r in T.bleu_scores(pairs).collect()}
    assert (out[1].p1, out[1].p2) == (0.5, 0.3333)
    assert out[1].bp_log == 0.0  # cand_len 4 >= ref_len 3
    assert out[1].bleu2_unpenalized == round((0.5 * (1 / 3)) ** 0.5, 4)
    assert (out[2].p1, out[2].p2, out[2].bleu2_unpenalized) == (1.0, 1.0, 1.0)


def test_bleu_rouge_keep_degenerate_pairs(spark):
    """The degenerate-pair contract (round-9 ADVICE fix): pairs with
    <2 tokens on either side — no bigrams — or empty/null text are
    KEPT with null metrics, never dropped; lengths report 0 (not
    Spark's size(NULL) = −1) and bp_log is null when cand_len = 0."""
    from gramene_mongodb_spark.operators import textops as T

    pairs = spark.createDataFrame(
        [
            (1, "hello", "hello"),   # 1 token each: p1=1, no bigrams
            (2, "x y", ""),          # empty candidate
            (3, "", "a"),            # empty reference
            (4, None, None),         # null both
        ],
        "pair_id: long, ref: string, cand: string",
    )
    bleu = {r.pair_id: r for r in T.bleu_scores(pairs).collect()}
    assert set(bleu) == {1, 2, 3, 4}  # every pair emits a row
    assert (bleu[1].ref_len, bleu[1].cand_len) == (1, 1)
    assert (bleu[1].p1, bleu[1].p2, bleu[1].bp_log) == (1.0, None, 0.0)
    assert bleu[1].bleu2_unpenalized is None
    assert (bleu[2].cand_len, bleu[2].p1, bleu[2].bp_log) == (0, None, None)
    assert (bleu[3].ref_len, bleu[3].p1, bleu[3].bp_log) == (0, 0.0, 0.0)
    assert (bleu[4].ref_len, bleu[4].cand_len) == (0, 0)

    rouge = {r.pair_id: r for r in T.rouge_scores(pairs).collect()}
    assert set(rouge) == {1, 2, 3, 4}
    assert (rouge[1].r1, rouge[1].p1_rouge, rouge[1].f1_1) == (1.0, 1.0, 1.0)
    assert rouge[1].r2 is None and rouge[1].f1_2 is None
    assert (rouge[2].r1, rouge[2].p1_rouge) == (0.0, None)
    assert rouge[4].f1_1 is None


def test_nb_train_classify_hand_computed(spark):
    """NB on a 2-class corpus small enough to verify by hand: class 'a'
    trains on 'x x y', class 'b' on 'y z'; vocabulary {x,y,z} (V=3).
    A test doc 'x x' must classify 'a' (x is twice as likely under a),
    and 'z z z' must classify 'b'. OOV-only docs emit no row."""
    import math

    from gramene_mongodb_spark.operators import textops as T

    train = spark.createDataFrame(
        [(1, "x x y", "a"), (2, "y z", "b")],
        "doc_id: long, text: string, lang: string",
    )
    model, prior = T.nb_train(train, "text", "lang")
    m = {(r.label, r.w): r.nll6 for r in model.collect()}
    # dense vocab x classes: 3 tokens x 2 classes = 6 rows
    assert len(m) == 6
    # class a: T_a=3, V=3; C(x,a)=2 -> round(ln(6/3)*1e6)
    assert m[("a", "x")] == round(math.log((3 + 3) / (2 + 1)) * 1e6)
    # class b has no x: C(x,b)=0 -> round(ln((2+3)/1)*1e6)
    assert m[("b", "x")] == round(math.log((2 + 3) / 1) * 1e6)
    p = {r.label: r.prior_nll6 for r in prior.collect()}
    assert p == {"a": round(math.log(2 / 1) * 1e6), "b": round(math.log(2 / 1) * 1e6)}

    test = spark.createDataFrame(
        [(10, "x x"), (11, "z z z"), (12, "unseen oov")],
        "doc_id: long, text: string",
    )
    pred = {r.doc_id: r for r in T.nb_classify(test, model, prior).collect()}
    assert set(pred) == {10, 11}  # OOV-only doc 12 carries no evidence
    assert pred[10].pred_label == "a" and pred[10].n_known == 2
    assert pred[11].pred_label == "b" and pred[11].n_known == 3


def test_auc_eval_hand_computed_with_ties(spark):
    """AUC on hand-rankable groups: perfect separation -> auc6=1e6;
    inverted -> 0; an all-tied group -> 500000 (rank average); a
    single-class group -> NULL auc6 (undefined, kept)."""
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.operators import textops as T

    rows = [
        # g1: positives strictly above negatives -> AUC 1
        ("g1", 10, 1), ("g1", 9, 1), ("g1", 2, 0), ("g1", 1, 0),
        # g2: inverted -> AUC 0
        ("g2", 1, 1), ("g2", 9, 0),
        # g3: every score tied -> AUC 0.5 exactly
        ("g3", 5, 1), ("g3", 5, 0), ("g3", 5, 1), ("g3", 5, 0),
        # g4: no negatives -> undefined
        ("g4", 3, 1), ("g4", 4, 1),
        # g5: fractional AUC through the split division — ranks asc
        # [1:neg, {3,3} tie: pos+neg, 4:pos] -> U2 = (2+3)+(4+4)-6 = 7,
        # AUC = 7/8 = 0.875
        ("g5", 1, 0), ("g5", 3, 1), ("g5", 3, 0), ("g5", 4, 1),
    ]
    df = spark.createDataFrame(rows, "g: string, s: long, y: int")
    out = {r.g: r for r in T.auc_eval(df, "g", "s", F.col("y") == 1).collect()}
    assert out["g1"].auc6 == 1_000_000
    assert out["g2"].auc6 == 0
    assert out["g3"].auc6 == 500_000
    assert out["g4"].auc6 is None and out["g4"].n_neg == 0
    assert (out["g5"].u2, out["g5"].auc6) == (7, 875_000)


def test_pmi_collocations_prefers_exclusive_pairs(spark):
    """'aa bb' always co-occur (exclusive bigram) while 'cc' pairs
    promiscuously with many partners; with equal raw counts the
    exclusive pair must out-rank the promiscuous ones on PMI."""
    from gramene_mongodb_spark.operators import textops as T

    docs = [(i, "aa bb") for i in range(5)]
    docs += [(100 + i, f"cc dd{i % 5}") for i in range(25)]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    out = T.pmi_collocations(df, "text", min_count=5, k=10).collect()
    assert out[0].rank == 1 and (out[0].w1, out[0].w2) == ("aa", "bb")
    # every cc-pair has the same count as aa-bb (5) but lower PMI
    cc = [r for r in out if r.w1 == "cc"]
    assert cc and all(r.pmi6 < out[0].pmi6 and r.c12 == 5 for r in cc)


def test_dsir_weights_hand_computed(spark):
    """DSIR on a corpus where the math is checkable by hand: target
    docs are all 'aa', the raw pool has one 'aa' doc (target-like ->
    kept) and one 'zz zz' doc (raw-only bucket -> negative weight,
    dropped). With B=128 buckets: lr(aa)=ln((4*131)/(2*131))=ln 2,
    lr(zz)=ln((1*131)/(3*131))=ln(1/3)."""
    import math

    from pyspark.sql import functions as F

    from gramene_mongodb_spark.operators import textops as T

    docs = spark.createDataFrame(
        [(1, "aa", "t"), (2, "aa", "t"), (3, "aa", "t"),
         (10, "aa", "r"), (11, "zz zz", "r")],
        "doc_id: long, text: string, pool: string",
    )
    out = {
        r.doc_id: r
        for r in T.dsir_weights(docs, F.col("pool") == "t").collect()
    }
    assert set(out) == {10, 11}  # only the raw pool is scored
    ln2_6 = round(math.log(2) * 1e6)
    ln13_6 = round(math.log(1 / 3) * 1e6)
    assert (out[10].dsir_lr6, out[10].kept, out[10].n_feats) == (ln2_6, 1, 1)
    assert (out[11].dsir_lr6, out[11].kept, out[11].n_feats) == (2 * ln13_6, 0, 2)


def test_cohen_kappa_hand_computed(spark):
    """Kappa on the textbook 2x2 table: a/b agree on 25 of 40 with
    marginals rm=(20,20), cm=(25,15) -> pe_num=800, num=40*25-800=200,
    den=1600-800=800, kappa=0.25. Also: perfect agreement -> 1e6, and
    a constant identical pair -> den 0 -> NULL."""
    from gramene_mongodb_spark.operators import textops as T

    rows = (
        [("x", "x")] * 15 + [("x", "y")] * 5
        + [("y", "x")] * 10 + [("y", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a: string, b: string")
    r = T.cohen_kappa(df, "a", "b").collect()[0]
    assert (r.n, r.agree, r.num, r.den, r.kappa6) == (40, 25, 200, 800, 250000)

    perfect = spark.createDataFrame([("x", "x"), ("y", "y")], "a: string, b: string")
    assert T.cohen_kappa(perfect, "a", "b").collect()[0].kappa6 == 1_000_000

    const = spark.createDataFrame([("x", "x")] * 3, "a: string, b: string")
    assert T.cohen_kappa(const, "a", "b").collect()[0].kappa6 is None
