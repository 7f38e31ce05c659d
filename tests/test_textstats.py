"""Text-analysis operator unit tests (language-ID tie-breaks, quality
features) — the driver oracle covers the bulk behavior; these pin the edge
cases the sf data doesn't reach."""

from __future__ import annotations

from pneuma_treatment_spark.operators.textstats import language_id, quality_features


def test_language_id_tie_breaks_like_oracle(spark):
    """Equal max hit counts must resolve in the SQL oracle's CASE order
    (en, then de, then fr) — a doc with one en + one de stopword is 'en',
    one de + one fr stopword is 'de'."""
    rows = [
        (1, "the der zzz"),          # en=1, de=1 tie → en
        (2, "der le zzz"),           # de=1, fr=1 tie → de
        (3, "the der le"),           # three-way tie → en
        (4, "zzz yyy xxx"),          # no hits → und
        (5, "der und ist the a"),    # de=3 beats en=2 → de
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "en", 4: "und", 5: "de"}


def test_quality_features_ratios(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "12345 67890!!!")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert out[1]["n_tokens"] == 6
    assert out[1]["stopword_ratio"] == 3 / 6  # the, on, the
    assert out[2]["digit_ratio"] > 0.5


def test_redact_pii_patterns_and_counts(spark):
    from pneuma_treatment_spark.operators.textstats import redact_pii

    rows = [
        (1, "mail me at jane.doe+x@example.co.uk today"),
        (2, "card 4111 1111 1111 1111 and ssn 123-45-6789"),
        (3, "call (555) 123-4567 or +1 555.123.4567"),
        (4, "host 192.168.0.1 port 8080"),
        (5, "clean text, no pii at all"),
        (6, None),
        (7, "version 1.2.3.4.5 is not an ip"),   # 5 dotted groups → lookahead blocks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["text"] == "mail me at [EMAIL] today" and out[1]["n_pii"] == 1
    assert out[2]["text"] == "card [CARD] and ssn [SSN]" and out[2]["n_pii"] == 2
    assert out[3]["text"] == "call [PHONE] or [PHONE]" and out[3]["n_pii"] == 2
    assert out[4]["text"] == "host [IPV4] port 8080" and out[4]["n_pii"] == 1
    assert out[5]["text"] == rows[4][1] and out[5]["n_pii"] == 0
    assert out[6]["text"] is None and out[6]["n_pii"] is None
    assert out[7]["n_pii"] == 0  # over-long dotted run left intact


def test_redact_pii_out_col_preserves_original(spark):
    from pneuma_treatment_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    r = redact_pii(docs, out_col="clean").collect()[0]
    assert r["text"] == "a@b.io" and r["clean"] == "[EMAIL]" and r["n_pii"] == 1


def test_split_assign_is_deterministic_and_conv_scoped(spark):
    from pneuma_treatment_spark.operators.textstats import split_assign
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        F.concat(F.lit("c"), (F.col("id") % 800).cast("string")).alias("conv_id"),
        F.col("id").alias("turn_idx"),
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(df, w, seed=3)
    # every turn of a conversation lands in the same split
    assert out.groupBy("conv_id").agg(
        F.count_distinct("split").alias("n")
    ).agg(F.max("n")).first()[0] == 1
    # pure function of (key, seed): identical across invocations…
    a = {r["conv_id"]: r["split"] for r in out.select("conv_id", "split").distinct().collect()}
    b = {
        r["conv_id"]: r["split"]
        for r in split_assign(df, w, seed=3).select("conv_id", "split").distinct().collect()
    }
    assert a == b
    # …and stable when the corpus grows: the original keys keep their split
    grown = spark.range(8000).select(
        F.concat(F.lit("c"), (F.col("id") % 1600).cast("string")).alias("conv_id")
    )
    g = {
        r["conv_id"]: r["split"]
        for r in split_assign(grown, w, seed=3).select("conv_id", "split").distinct().collect()
    }
    assert all(g[k] == v for k, v in a.items())
    # conv-level ratios near the weights
    from collections import Counter
    frac = Counter(a.values())
    assert abs(frac["train"] / 800 - 0.8) < 0.05
    # different seed reshuffles
    c = {
        r["conv_id"]: r["split"]
        for r in split_assign(df, w, seed=4).select("conv_id", "split").distinct().collect()
    }
    assert a != c


def test_split_assign_validates_weights(spark):
    import pytest as _pytest
    from pneuma_treatment_spark.operators.textstats import split_assign

    df = spark.createDataFrame([("c1",)], ["conv_id"])
    with _pytest.raises(ValueError):
        split_assign(df, {})
    with _pytest.raises(ValueError):
        split_assign(df, {"a": -1.0, "b": 2.0})
    with _pytest.raises(ValueError):
        split_assign(df, {"a": 0.0})


def test_repetition_stats_hand_values(spark):
    from pneuma_treatment_spark.operators.textstats import repetition_stats

    rows = [
        (1, "a b\na b\nc d"),        # 3 lines, "a b" dup → 1/3; toks a b a b c d
        (2, "x y z"),                # no repetition
        (3, "go go go go"),          # degenerate repetition
        (4, "one"),                  # too short for 2/3-grams
        (5, ""),                     # empty → null fracs
        (6, None),                   # null text → null fracs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert abs(out[1]["dup_line_frac"] - 1 / 3) < 1e-9
    # 2-grams of (a b a b c d): ab ba ab bc cd → 5 total, 4 distinct
    assert abs(out[1]["dup_2gram_frac"] - 1 / 5) < 1e-9
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["dup_2gram_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0
    # go x4: 3 bigrams all "go go" → 2/3 dup; 2 trigrams identical → 1/2
    assert abs(out[3]["dup_2gram_frac"] - 2 / 3) < 1e-9
    assert abs(out[3]["dup_3gram_frac"] - 1 / 2) < 1e-9
    assert out[4]["dup_2gram_frac"] is None and out[4]["dup_3gram_frac"] is None
    assert out[4]["dup_line_frac"] == 0.0
    assert out[5]["dup_line_frac"] is None
    assert out[6]["dup_line_frac"] is None and out[6]["dup_3gram_frac"] is None


def test_split_case_sql_null_key_matches_operator(spark):
    """The DuckDB twin must mirror split_assign's null-key → null-split
    behavior (an unguarded CASE falls through NULL comparisons to the
    last split)."""
    import duckdb

    from pneuma_treatment_spark.operators.textstats import split_assign
    from pneuma_treatment_spark.queries import _SPLIT_W, _split_case_sql

    df = spark.createDataFrame([(None,), ("k1",), ("k2",)], "k string")
    got = {
        r["k"]: r["split"]
        for r in split_assign(df, _SPLIT_W, key="k", seed=0).collect()
    }
    sql = _split_case_sql("k", 0)
    want = dict(
        duckdb.sql(
            f"SELECT k, {sql} AS split FROM (VALUES (NULL), ('k1'), ('k2')) t(k)"
        ).fetchall()
    )
    assert got == want and got[None] is None
