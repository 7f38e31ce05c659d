"""Dedup (exact / ngram / minhash / simhash) and similarity-search tests on
planted duplicates."""

from __future__ import annotations

import numpy as np
import pytest

from pneuma_treatment_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest looking for food and water"
    )
    near = base.replace("green", "dark")          # 1-word change → high jaccard
    rows = [
        (1, base),
        (2, base),                                  # exact dup of 1
        (3, near),                                  # near dup of 1
        (4, "completely different text about spark sql engines and shuffles"),
        (5, "completely different text about spark sql engines and shuffles"),  # dup of 4
        (6, "unrelated short snippet"),
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["keep_id"]: r for r in dedup.exact_dedup(docs).collect()}
    assert out[1]["dup_cnt"] == 2 and out[1]["doc_ids"] == [1, 2]
    assert out[4]["dup_cnt"] == 2
    assert out[3]["dup_cnt"] == 1


def test_ngram_jaccard_exact_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_recall_vs_exact(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_pairs(docs, threshold=0.5).collect()
    }
    # verified-by-exact-jaccard LSH output ⊆ exact pairs; recall on planted dups
    assert mh <= exact
    assert (1, 2) in mh  # identical docs always collide in every band


def test_simhash_near_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             dedup.simhash_near_pairs(docs, max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0      # identical text → identical simhash
    assert pairs[(4, 5)] == 0
    assert (1, 3) in pairs         # one-word change → small hamming distance


def _legacy_simhash(docs, bits=64):
    """The round-1 formulation (explode of `bits` (bit, ±1) structs per token
    → groupBy(id, bit)) — kept here as the equality oracle for the
    de-amplified implementation."""
    from pyspark.sql import functions as F

    toks = docs.where(F.col("text").isNotNull() & (F.trim("text") != "")).select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(dedup.normalize_text(F.col("text")), " ")).alias("tok"),
    )
    h = toks.withColumn("h", F.xxhash64("tok"))
    per_bit = h.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("bit"),
                        F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1)
                        .otherwise(-1)
                        .alias("w"),
                    )
                    for b in range(bits)
                ]
            )
        ).alias("bw"),
    ).select("id", F.col("bw.bit").alias("bit"), F.col("bw.w").alias("w"))
    sums = per_bit.groupBy("id", "bit").agg(F.sum("w").alias("s"))
    sig = sums.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, CAST(bit AS INT))")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
    return sig.select(F.col("id").alias("doc_id"), "simhash")


def test_simhash_matches_legacy(docs):
    new = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    old = {r["doc_id"]: r["simhash"] for r in _legacy_simhash(docs).collect()}
    assert new == old


def test_simhash_hash_distinct_identical(docs):
    """The distinct-vocabulary md5 path (hash once per token type,
    broadcast-join back) must produce bit-identical signatures to the
    per-occurrence path — it is a cost rewrite, not a semantic change."""
    kw = dict(token_hash=dedup.md5_token_hash, bits=60)
    dim = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash(docs, hash_distinct=True, **kw).collect()}
    occ = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash(docs, hash_distinct=False, **kw).collect()}
    assert dim == occ and len(dim) > 0


def test_simhash_single_shuffle(docs):
    """The de-amplified signature build must shuffle the token stream ONCE
    (groupBy(id)) — no per-bit row explosion, no second aggregation."""
    plan = dedup.simhash(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate explode") == 1  # tokens only, not (bit, w)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    centers = rng.normal(0, 1, (4, 16))
    rows = []
    for i in range(200):
        c = centers[i % 4]
        v = c + rng.normal(0, 0.05, 16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_matches_numpy(emb):
    pdf = emb.toPandas()
    q = np.array(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0], dtype=np.float64)
    M = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    sims = M @ q / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = [int(pdf["vec_id"].iloc[i]) for i in np.argsort(-sims) if pdf["vec_id"].iloc[i] != 0]
    got = [r["vec_id"] for r in
           similarity.cosine_topk(emb, list(q), k=10, exclude_id=0).collect()]
    assert set(got) == set(order[:10])


def test_lsh_topk_recall(emb):
    pdf = emb.toPandas()
    q = [float(x) for x in pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0]]
    planes = similarity.random_hyperplanes(16, n_planes=6, seed=7)
    bucketed = similarity.with_lsh_bucket(emb, planes)
    approx = {r["vec_id"] for r in similarity.lsh_topk(bucketed, q, planes, k=10).collect()}
    brute = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10, exclude_id=0).collect()}
    # same-cluster vectors share the bucket with high probability
    assert len(approx & brute) >= 5


def test_cosine_band_pairs_recall(emb):
    """Banded-LSH verified pairs ⊆ exact pairs, and same-cluster near-pairs
    (cos ≈ 0.99 in the 4-cluster fixture) are nearly all recovered."""
    pdf = emb.toPandas()
    M = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    ids = pdf["vec_id"].to_numpy()
    exact = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(sims[i, j], 6) >= 0.95
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_band_pairs(emb, threshold=0.95).collect()
    }
    assert got <= {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(sims[i, j], 6) >= 0.95 - 1e-9
    }
    assert len(got) >= 0.9 * len(exact) > 0


def test_ivf_topk_recall(emb):
    from pneuma_treatment_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_train_centroids,
        with_ivf_cell,
    )

    pdf = emb.toPandas()
    q = [float(x) for x in pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0]]
    cents = ivf_train_centroids(emb, n_cells=8, seed=7)
    celled = with_ivf_cell(emb, cents)
    celled.cache().count()
    # 4 well-separated clusters → cells align with clusters; probing the
    # nearest cells must recover the brute-force top-k almost entirely
    approx = {r["vec_id"] for r in ivf_topk(celled, cents, q, k=10, nprobe=2).collect()}
    brute = {r["vec_id"] for r in cosine_topk(emb, q, k=10, exclude_id=0).collect()}
    assert len(approx & brute) >= 8
    # nprobe = all cells == exact brute force (minus the query itself)
    allp = {r["vec_id"] for r in ivf_topk(celled, cents, q, k=10, nprobe=8).collect()}
    assert len(allp & ({0} | brute)) >= 9


def test_ivf_recall_curve(emb):
    """The 'recall drops on a held-out query set' retrain trigger, measured
    (VERDICT r5 item 3): held-out queries (not in the corpus) → recall@k per
    nprobe vs brute force. The curve must be monotone non-decreasing in
    nprobe, and probing ALL cells must equal brute force exactly (recall
    1.0) — the exactness anchor BENCH/ivf_recall.md commits at sf0.1."""
    from pneuma_treatment_spark.operators.similarity import (
        ivf_recall_curve,
        ivf_train_centroids,
        with_ivf_cell,
    )

    # hold out every 10th vector: panel is disjoint from the corpus
    held = emb.where("vec_id % 10 = 3")
    corpus = emb.where("vec_id % 10 != 3")
    queries = [
        [float(x) for x in r["embedding"]]
        for r in held.orderBy("vec_id").limit(8).collect()
    ]
    cents = ivf_train_centroids(corpus, n_cells=8, seed=7)
    celled = with_ivf_cell(corpus, cents).cache()
    celled.count()
    curve = ivf_recall_curve(celled, cents, queries, k=10, nprobes=(1, 2, 4, 8))
    vals = [curve[p] for p in (1, 2, 4, 8)]
    assert vals == sorted(vals), f"recall not monotone in nprobe: {curve}"
    assert vals[-1] == 1.0, f"nprobe = n_cells must equal brute force: {curve}"
    # 4 well-separated clusters: even nprobe=1 lands in the right cluster
    # for most queries
    assert vals[0] >= 0.5


def test_ivf_cell_stats_skew_monitor(spark):
    """The documented IVF retrain trigger (max/median > 8×, or empty cells)
    as a measured flag, not prose — VERDICT r4 item 5."""
    from pneuma_treatment_spark.operators.similarity import ivf_cell_stats

    def celled(counts):
        rows = [(i, c) for c, n in enumerate(counts) for i in range(n)]
        return spark.createDataFrame(rows, "vec_id long, ivf_cell int")

    # balanced occupancy: healthy, no retrain
    ok = ivf_cell_stats(celled([10, 12, 9, 11]), n_cells=4)
    assert ok["retrain"] is False and ok["n_cells_empty"] == 0
    assert ok["median"] == 10.5 and ok["max"] == 12 and ok["skew"] < 2

    # deliberately skewed: one hot cell 9× the median fires the flag
    hot = ivf_cell_stats(celled([90, 10, 10]), n_cells=3)
    assert hot["retrain"] is True and hot["skew"] == 9.0 and hot["max"] == 90

    # empty cells (codebook drift) fire it even without hot-cell skew
    drift = ivf_cell_stats(celled([10, 10, 10]), n_cells=5)
    assert drift["retrain"] is True and drift["n_cells_empty"] == 2

    # exactly at the threshold does NOT fire (policy is strictly greater)
    edge = ivf_cell_stats(celled([80, 10, 10]), n_cells=3)
    assert edge["skew"] == 8.0 and edge["retrain"] is False

    # empty table: inert result, no division by zero
    empty = ivf_cell_stats(celled([]), n_cells=4)
    assert empty["retrain"] is False and empty["n_cells_occupied"] == 0


def test_auto_band_planes_rule():
    assert similarity.auto_band_planes(100) == 4          # floor
    assert similarity.auto_band_planes(1 << 10, 64) == 4
    assert similarity.auto_band_planes(1 << 11, 64) == 5  # +1 per doubling
    assert similarity.auto_band_planes(1 << 12, 64) == 6


def test_band_candidates_subquadratic(spark):
    """With the auto-sized band width, doubling n must grow banded
    CANDIDATES strictly sub-quadratically, and strictly slower than the
    fixed geometry at the same n (the sizing rule must actually bite)."""
    rng = np.random.default_rng(11)

    def make(n):
        rows = [(i, [float(x) for x in rng.normal(0, 1, 32)]) for i in range(n)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    small, big = 512, 1024
    p_small = similarity.auto_band_planes(small, target_bucket_rows=8)
    p_big = similarity.auto_band_planes(big, target_bucket_rows=8)
    assert p_big == p_small + 1
    counts = {}
    for n, p in ((small, p_small), (big, p_big)):
        planes = similarity.random_hyperplanes(32, 2 * p, seed=7)
        counts[n] = similarity.band_candidates(make(n), planes, 2, p).count()
    # fixed geometry doubles to ~4x (quadratic); the extra plane cuts it to
    # ~3x on gaussian data (unbalanced cone splits — see auto_band_planes)
    assert counts[big] < 3.7 * counts[small], counts
    planes_fixed = similarity.random_hyperplanes(32, 2 * p_small, seed=7)
    fixed_big = similarity.band_candidates(make(big), planes_fixed, 2, p_small).count()
    assert counts[big] < fixed_big, (counts, fixed_big)

    # the DEFAULT path (band_planes=None) must route through the same auto
    # sizing: identical verified pairs as pinning auto_band_planes(n)
    df = make(small)
    auto = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_band_pairs(
            df, threshold=0.0, n_bands=2, target_bucket_rows=8, approx_n=small
        ).collect()
    }
    pinned = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_band_pairs(
            df, threshold=0.0, n_bands=2, band_planes=p_small
        ).collect()
    }
    assert auto == pinned and len(auto) > 0


def test_band_pairs_arrow_equals_hof(emb):
    """The Arrow-matmul bucket path must produce the same verified pairs as
    the column-expression path on the clustered fixture (projections are
    far from zero, so BLAS vs sequential fold order cannot flip a sign)."""
    hof = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_band_pairs(
            emb, threshold=0.95, bucket_method="hof"
        ).collect()
    }
    arrow = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_band_pairs(
            emb, threshold=0.95, bucket_method="arrow"
        ).collect()
    }
    assert arrow == hof and len(arrow) > 0


def test_band_pairs_arrow_drops_null_embeddings(spark, emb):
    """A null vector must be silently excluded by BOTH bucket paths (the
    HOF path's null bucket never joins; the Arrow path must not crash the
    task on the None conversion)."""
    from pyspark.sql import functions as F

    withnull = emb.unionByName(
        spark.createDataFrame([(99999, None)], "vec_id long, embedding array<float>")
    )
    for method in ("hof", "arrow"):
        pairs = similarity.cosine_band_pairs(
            withnull, threshold=0.95, bucket_method=method
        ).collect()
        assert all(r["id_a"] != 99999 and r["id_b"] != 99999 for r in pairs)
        assert len(pairs) > 0


def test_ivf_recall_check_slo_trips_on_degraded_codebook(spark):
    """The wired SLO trigger (VERDICT r6 item 8): a codebook matching the
    data passes the check at the serving nprobe; a degraded codebook (cells
    orthogonal to the cluster structure, splitting every query's true
    neighbors across cells) trips retrain=True."""
    import numpy as np

    from pneuma_treatment_spark.operators import similarity

    rng = np.random.RandomState(0)
    dim, per = 8, 40
    bases = []
    rows, vid = [], 0
    for c in range(4):
        b = np.zeros(dim)
        b[c * 2 : (c + 1) * 2] = 50.0
        bases.append(b)
        for _ in range(per):
            v = b + rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    good = [[float(x) for x in b] for b in bases]
    celled = similarity.with_ivf_cell(emb, good).persist()
    queries = good
    ok = similarity.ivf_recall_check(celled, good, queries, slo=0.9, nprobe=1)
    assert ok["retrain"] is False and ok["recall"] >= 0.9
    celled.unpersist()

    # degraded: centroids differ only along a noise coordinate — every
    # cluster's members scatter across all 4 cells, so nprobe=1 finds only
    # a fraction of any query's true top-k
    bad = [[0.0] * (dim - 1) + [tau] for tau in (-3.0, -1.0, 1.0, 3.0)]
    celled_bad = similarity.with_ivf_cell(emb, bad).persist()
    trip = similarity.ivf_recall_check(celled_bad, bad, queries, slo=0.9, nprobe=1)
    assert trip["retrain"] is True and trip["recall"] < 0.9
    assert trip["slo"] == 0.9 and trip["nprobe"] == 1
    celled_bad.unpersist()
