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
