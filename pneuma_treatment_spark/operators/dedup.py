"""Document deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data pipeline operators over a documents table (doc_id, text).
All hashing is JVM-side (``xxhash64`` / ``md5`` column expressions) — no
Python in the candidate-generation path; only the final verify step touches
arrays.

Scale design: exact dedup is one hash-groupBy. Near-dup avoids the O(n²)
pairwise wall by LSH banding — candidates are pairs sharing a band bucket,
a self-equi-join on (band, hash) that Spark executes as a shuffle join on a
high-cardinality key. The verify step re-checks true Jaccard on candidates
only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pneuma_treatment_spark.session import fan_out


def normalize_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one representative (min id) per hash."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .groupBy(F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text."""
    toks = F.split(normalize_text(col), " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array(toks[0])))


def with_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return fan_out(docs).where(
        F.col(text_col).isNotNull() & (F.trim(text_col) != "")
    ).withColumn("shingles", shingles(F.col(text_col), n))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (the oracle path): explode
    shingles, self-join on shared shingle, count intersections, compute
    |∩| / (|A|+|B|−|∩|). Quadratic only in documents that actually share a
    shingle. Use :func:`minhash_pairs` at scale."""
    s = with_shingles(docs, text_col, n).select(
        F.col(id_col).alias("id"), "shingles", F.size("shingles").alias("sz")
    )
    ex = s.select("id", "sz", F.explode("shingles").alias("sh"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def minhash_signature(shingle_col: Column, k: int = 32) -> Column:
    """k-permutation MinHash signature: min over shingles of seeded xxhash64."""

    def perm(i: int):
        # closure factory — a 2-param lambda would receive the element index
        # as its second arg (pyspark HOF arity dispatch), not the seed
        return F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i))))

    return F.array(*[perm(i) for i in range(k)])


def md5_seeded_hash(col: Column, i: int) -> Column:
    """Seeded 60-bit md5 hash (the replayable family for MinHash band
    hashes — one call per (doc, band), so the md5 cost stays negligible)."""
    return md5_token_hash(F.concat(col, F.lit(f":{i}")))


def _mh_mix(h: Column, i: int) -> Column:
    """Cheap integer permutation of a base hash — replayable everywhere and
    ONE md5 per shingle instead of k (32 md5s per shingle cost ~24s at
    sf0.1; integer mixing is free)."""
    return (1103515245 * ((h + 10007 * i) % 1073741824) + 12345) % 1073741824


def minhash_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH near-dup candidates, verified by exact Jaccard.

    k/bands rows per band tune the S-curve; defaults (32 hashes, 8 bands of
    4) target thresholds around 0.7-0.9. Candidate generation is an
    equi-join on (band_idx, band_hash) — no all-pairs shuffle.

    ``hash_family="md5"`` switches to the SQL-replayable construction: ONE
    60-bit md5 base hash per shingle, k integer-mix permutations of it, and
    md5 band hashes (xxhash64, the default, has no SQL twin).
    """
    rows = k // bands
    if hash_family == "md5":

        def _perm(i: int):
            # closure factory — a default-arg lambda would have TWO params
            # and pyspark's HOF arity dispatch passes the ELEMENT INDEX as
            # the second argument, silently overriding the default
            return F.array_min(F.transform(F.col("__hs"), lambda h: _mh_mix(h, i)))

        sig_expr = F.array(*[_perm(i) for i in range(k)])
        s = (
            with_shingles(docs, text_col, n)
            .withColumn("__hs", F.transform("shingles", md5_token_hash))
            .select(
                F.col(id_col).alias("id"),
                "shingles",
                F.size("shingles").alias("sz"),
                sig_expr.alias("sig"),
            )
        )
        bh = md5_seeded_hash
    else:
        s = with_shingles(docs, text_col, n).select(
            F.col(id_col).alias("id"),
            "shingles",
            F.size("shingles").alias("sz"),
            minhash_signature(F.col("shingles"), k).alias("sig"),
        )
        bh = lambda c, i: F.xxhash64(c, F.lit(i))
    banded = s.select(
        "id",
        "sz",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        bh(
                            F.concat_ws(",", F.slice("sig", b * rows + 1, rows)), b
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sz", "shingles", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))

    # Candidates carry IDS ONLY through the banded self-join and the pair
    # dedup; the shingle arrays join back once per side afterwards (carrying
    # two full shingle sets per candidate row was the dominant shuffle).
    a, b = banded.select("id", "band", "bhash").alias("a"), banded.select(
        "id", "band", "bhash"
    ).alias("b")
    ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    side = s.select("id", "shingles", "sz")
    cand = ids.join(
        side.select(
            F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"),
            F.col("sz").alias("sz_a"),
        ),
        "id_a",
    ).join(
        side.select(
            F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"),
            F.col("sz").alias("sz_b"),
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "sz_a", "sz_b", "jaccard")
    )


def md5_token_hash(col: Column) -> Column:
    """60-bit token hash from the md5 hex prefix — slower than xxhash64 but
    reproducible in any engine with md5 (the DuckDB oracle included)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    token_hash=None,
    hash_distinct: bool = False,
) -> DataFrame:
    """SimHash per document: sign-sum of token hash bits (64-bit xxhash64 by
    default; pass ``token_hash=md5_token_hash, bits=60`` for the
    SQL-replayable variant).

    One groupBy(id) over the 1× token stream with ``bits`` conditional-sum
    aggregate expressions — each partial is just ``bits`` longs per doc, so
    map-side combine compacts the shuffle to signature size. (The previous
    formulation exploded a (bit, ±1) struct per token per bit — a ``bits``×
    row amplification of the token stream that dominated the bench.)

    Per bit b the ±1 sign-sum is ``2*popcount_b − n_tokens``; we aggregate
    ``sum(bit_b)`` and ``count`` and recover the sign at the end.

    ``hash_distinct=True`` hashes the DISTINCT token vocabulary once and
    broadcast-joins the hash back to the token stream: vocabulary grows
    sublinearly in corpus size (Heaps' law), so the dimension stays a
    bounded broadcast while the per-occurrence hash cost disappears. It is
    OFF by default because it only pays when per-token hashing dominates
    (very long documents × an expensive hash): measured at sf0.1 (270k
    tokens, 31-token vocab — the best possible case for the rewrite) the
    extra distinct + broadcast-join stages cost MORE than they save
    (3.8 s vs 3.0 s end-to-end; the md5 calls are ~0.4 s of either), and
    both paths are pinned bit-identical by
    tests/test_dedup_similarity.py::test_simhash_hash_distinct_identical.
    """
    th = token_hash or (lambda c: F.xxhash64(c))
    # compact single-split inputs would run the whole explode+aggregate map
    # stage on one task (session.fan_out is a no-op at real split counts)
    toks = fan_out(docs).where(
        F.col(text_col).isNotNull() & (F.trim(text_col) != "")
    ).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    )
    if hash_distinct:
        vocab = toks.select("tok").distinct().select("tok", th(F.col("tok")).alias("h"))
        h = toks.join(F.broadcast(vocab), "tok").select("id", "h")
    else:
        h = toks.select("id", th(F.col("tok")).alias("h"))
    # Two popcounts ride each aggregate in 32-bit lanes (sum of
    # bit_lo + bit_hi<<32): HALF the aggregate expressions, which halves the
    # whole-stage-codegen compile of the agg stage (~2 s cold at bits=60).
    # Lane safety: each lane's count < 2^31 needs only n_tokens(doc) < 2^31.
    # python-API shiftright needs a literal shift count — fine here, b is
    # a python int.
    def lane_expr(b_lo: int, b_hi: int | None):
        lo = F.shiftright("h", b_lo).bitwiseAND(F.lit(1))
        if b_hi is None:
            return lo
        return lo + F.shiftleft(F.shiftright("h", b_hi).bitwiseAND(F.lit(1)), 32)

    pairs = [(2 * i, 2 * i + 1 if 2 * i + 1 < bits else None)
             for i in range((bits + 1) // 2)]
    sums = h.groupBy("id").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(lane_expr(lo, hi)).alias(f"__q{i}") for i, (lo, hi) in enumerate(pairs)],
    )

    # unpack lanes: p_b for even b is the low 32 bits, odd b the high 32
    def pop(b: int):
        qc = F.col(f"__q{b // 2}")
        return qc.bitwiseAND(F.lit((1 << 32) - 1)) if b % 2 == 0 else F.shiftright(qc, 32)

    # sign-sum s_b = 2*p_b - n; bit set iff s_b > 0. 1<<63 overflows signed
    # long — use the wrapped Java literal for the top bit.
    def bitval(b: int) -> int:
        return (1 << b) if b < 63 else -(1 << 63)

    sig_expr = None
    for b in range(bits):
        term = F.when(
            2 * pop(b) - F.col("__n") > 0, F.lit(bitval(b)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig_expr = term if sig_expr is None else sig_expr + term
    return sums.select(F.col("id").alias(id_col), sig_expr.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, bits: int = 64, **kw
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, candidates
    via 4-block banding (any identical bits/4-wide block → candidate)."""
    sig = simhash(docs, bits=bits, **kw)
    block_bits = bits // 4
    mask = (1 << block_bits) - 1
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright("simhash", b * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bval").alias("bval"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.withColumn("hamming", ham).where(ham <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
