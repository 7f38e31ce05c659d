"""Late-data backfill (plans/backfill.py).

The contract: applying a delta of late/corrected turns through
``backfill_pipeline`` must leave every pipeline table BIT-EQUAL to a
from-scratch rebuild on the updated input (the anti-drift gate for the
mirrored stage builds), keep the per-partition lineage contract green,
touch only the partitions the affected conversations live in, and be
idempotent (the crash-recovery story: re-run the same delta to heal a
partially-merged backfill)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jobs.rollup_job import run_pipeline
from pneuma_treatment_spark.io.tableio import TableIO
from pneuma_treatment_spark.plans.backfill import backfill_pipeline, merge_conv_scoped
from pneuma_treatment_spark.plans.lineage import verify_partition_lineage
from pneuma_treatment_spark.synth import generate_transcripts

ARGS = dict(n_convs=30, seed=11, mega_turns=800)
TABLES = ("ingest", "filled", "treated", "rollup_1m", "rollup_1h", "rollup_1d", "chunks")
SORT_KEYS = {
    "chunks": ["conv_id", "tier", "metric", "start_ts"],
    "rollup_1m": ["conv_id", "tier", "bucket_ts"],
    "rollup_1h": ["conv_id", "tier", "bucket_ts"],
    "rollup_1d": ["conv_id", "tier", "bucket_ts"],
}


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    """Base pipeline + backfill in wd_a; from-scratch rebuild on the
    updated input in wd_b; both from the same deterministic raw table."""
    tmp = tmp_path_factory.mktemp("backfill")
    base_path = str(tmp / "base_raw")
    updated_path = str(tmp / "updated_raw")
    wd_a, wd_b = str(tmp / "wd_a"), str(tmp / "wd_b")

    generate_transcripts(
        spark, ARGS["n_convs"], seed=ARGS["seed"], mega_turns=ARGS["mega_turns"]
    ).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    convs = [r["conv_id"] for r in base.select("conv_id").distinct().orderBy("conv_id").limit(2).collect()]
    c_a, c_b = convs

    # Delta, upsert-keyed on (conv_id, turn_idx) — built with DataFrame ops
    # so every column type matches the raw table exactly:
    corrected = base.where((F.col("conv_id") == c_a) & (F.col("turn_idx") == 2)).withColumn(
        "text", F.lit("corrected text with a very different token count indeed")
    )
    last_a = base.where(F.col("conv_id") == c_a).orderBy(F.col("turn_idx").desc()).limit(1)
    late = last_a.select(
        "conv_id",
        (F.col("turn_idx") + 1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("a late-arriving turn").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("ts") + F.expr("INTERVAL 90 SECONDS")).alias("ts"),
    ).unionByName(
        last_a.select(
            "conv_id",
            (F.col("turn_idx") + 2).alias("turn_idx"),
            F.lit("assistant").alias("role"),
            F.lit("and its reply, also late").alias("text"),
            F.lit("search").alias("tool"),
            (F.col("ts") + F.expr("INTERVAL 150 SECONDS")).alias("ts"),
        )
    )
    day_moved = base.where((F.col("conv_id") == c_b) & (F.col("turn_idx") == 0)).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 3 DAYS")
    )
    new_conv = (
        base.where(F.col("conv_id") == c_a)
        .where(F.col("turn_idx") < 4)
        .withColumn("conv_id", F.lit("conv_zz_backfill"))
    )
    delta = corrected.unionByName(late).unionByName(day_moved).unionByName(new_conv)
    delta_path = str(tmp / "delta")
    delta.write.parquet(delta_path)
    delta = spark.read.parquet(delta_path)

    base.join(
        delta.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    ).unionByName(delta).write.parquet(updated_path)

    run_pipeline(spark, wd_a, **ARGS, input_table=base_path)

    # snapshot ingest data-file mtimes before the backfill
    pre_mtimes = {}
    for root, _dirs, files in os.walk(os.path.join(wd_a, "ingest")):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                pre_mtimes[p] = os.path.getmtime(p)

    summary = backfill_pipeline(spark, wd_a, spark.read.parquet(delta_path))

    run_pipeline(spark, wd_b, **ARGS, input_table=updated_path)

    yield dict(
        wd_a=wd_a, wd_b=wd_b, summary=summary, delta_path=delta_path,
        affected=[c_a, c_b, "conv_zz_backfill"], pre_mtimes=pre_mtimes,
    )
    for d in (wd_a, wd_b):
        shutil.rmtree(d, ignore_errors=True)


def _sorted_pdf(io: TableIO, table: str) -> pd.DataFrame:
    pdf = io.read(table).toPandas()
    keys = SORT_KEYS.get(table, ["conv_id", "turn_idx"])
    return pdf.sort_values(keys).reset_index(drop=True)[sorted(pdf.columns)]


def test_backfill_equals_rebuild(spark, env):
    io_a, io_b = TableIO(spark, env["wd_a"]), TableIO(spark, env["wd_b"])
    for t in TABLES:
        a, b = _sorted_pdf(io_a, t), _sorted_pdf(io_b, t)
        pd.testing.assert_frame_equal(a, b, check_dtype=False), t


def test_backfill_summary_shape(env):
    s = env["summary"]
    assert s["affected_convs"] == 3
    assert set(s["tables"]) == set(TABLES)
    ing = s["tables"]["ingest"]
    # upsert: every affected conv's old rows replaced + the delta's new rows
    assert ing["added"] > ing["removed"] > 0
    assert ing["parts_rewritten"] > 0


def test_backfill_lineage_stays_green(spark, env):
    io = TableIO(spark, env["wd_a"])
    for t in ("ingest", "filled", "treated", "rollup_1m", "rollup_1h", "rollup_1d", "chunks"):
        assert verify_partition_lineage(io, t), t


def test_backfill_leaves_unaffected_partitions_untouched(spark, env):
    """The scale contract: only partitions of affected buckets are
    rewritten — every data file in other buckets is physically untouched."""
    io = TableIO(spark, env["wd_a"])
    aff = spark.createDataFrame([(c,) for c in env["affected"]], ["conv_id"])
    aff_buckets = {
        r["b"]
        for r in aff.select(
            F.pmod(F.xxhash64("conv_id"), F.lit(io.n_buckets)).cast("int").alias("b")
        ).collect()
    }
    checked = 0
    for p, mt in env["pre_mtimes"].items():
        bucket = next(
            (int(seg.split("=", 1)[1]) for seg in p.split(os.sep) if seg.startswith("p_bucket=")),
            None,
        )
        if bucket is not None and bucket not in aff_buckets:
            assert os.path.getmtime(p) == mt, p
            checked += 1
    assert checked > 0  # the fixture must actually exercise unaffected buckets


def test_backfill_is_idempotent(spark, env):
    io = TableIO(spark, env["wd_a"])
    before = {t: _sorted_pdf(io, t) for t in ("ingest", "rollup_1d", "chunks")}
    backfill_pipeline(spark, env["wd_a"], spark.read.parquet(env["delta_path"]))
    for t, pdf in before.items():
        pd.testing.assert_frame_equal(_sorted_pdf(io, t), pdf, check_dtype=False), t
    for t in ("ingest", "rollup_1m", "chunks"):
        assert verify_partition_lineage(io, t), t


def test_backfill_rejects_duplicate_keys(spark, env):
    """A duplicate (conv_id, turn_idx) would survive the anti-join and
    insert both rows — the guard must refuse before touching any table."""
    delta = spark.read.parquet(env["delta_path"])
    with pytest.raises(ValueError, match="duplicate"):
        backfill_pipeline(spark, env["wd_a"], delta.unionByName(delta.limit(1)))


def test_backfill_unchunked_pipeline(spark, tmp_path):
    """chunked=False pipelines (no raw_anomaly column in filled) must be
    inferred from the table layout and recomputed through the slim path."""
    args = dict(n_convs=12, seed=5, mega_turns=0)
    base_path = str(tmp_path / "raw")
    generate_transcripts(spark, 12, seed=5).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    c = base.select("conv_id").distinct().orderBy("conv_id").first()["conv_id"]
    delta = base.where((F.col("conv_id") == c) & (F.col("turn_idx") == 1)).withColumn(
        "text", F.lit("unchunked corrected row with extra words")
    )
    dpath = str(tmp_path / "delta")
    delta.write.parquet(dpath)
    upd_path = str(tmp_path / "upd")
    base.join(delta.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti").unionByName(
        spark.read.parquet(dpath)
    ).write.parquet(upd_path)

    wd_a, wd_b = str(tmp_path / "wa"), str(tmp_path / "wb")
    run_pipeline(spark, wd_a, **args, input_table=base_path, chunked=False)
    backfill_pipeline(spark, wd_a, spark.read.parquet(dpath))
    run_pipeline(spark, wd_b, **args, input_table=upd_path, chunked=False)
    io_a, io_b = TableIO(spark, wd_a), TableIO(spark, wd_b)
    for t in ("treated", "rollup_1d"):
        pd.testing.assert_frame_equal(
            _sorted_pdf(io_a, t), _sorted_pdf(io_b, t), check_dtype=False
        ), t
    shutil.rmtree(wd_a, ignore_errors=True)
    shutil.rmtree(wd_b, ignore_errors=True)


def test_merge_drops_emptied_partition(spark, tmp_path):
    """A corrected ts that pulls the ONLY conversation out of a day must
    drop that (day, bucket) dir — dynamic overwrite alone cannot (it only
    replaces partitions present in the written frame)."""
    io = TableIO(spark, str(tmp_path / "t"), n_buckets=2)
    rows = spark.createDataFrame(
        [("cx", 0, "2024-01-01 10:00:00"), ("cx", 1, "2024-01-01 11:00:00"),
         ("cy", 0, "2024-02-01 10:00:00")],
        ["conv_id", "turn_idx", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    io.write(rows, "tab")
    # move ALL of cx to a different day
    moved = rows.where(F.col("conv_id") == "cx").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 DAYS")
    )
    stats = merge_conv_scoped(
        io, "tab", moved, spark.createDataFrame([("cx",)], ["conv_id"])
    )
    assert stats["stale_dropped"] == 1
    out = io.read("tab").toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert sorted(out["p_day"].astype(str).unique()) == ["2024-01-11", "2024-02-01"]
    assert len(out) == 3
    # the emptied dir is physically gone, INCLUDING its emptied day parent
    # (an empty husk would later truncate _partition_dirs' layout walk)
    assert not os.path.exists(os.path.join(str(tmp_path / "t"), "tab", "p_day=2024-01-01"))
    assert io._partition_dirs("tab") == ["p_day", "p_bucket"]


def test_backfill_rejects_contradicting_cfg(spark, env):
    from pneuma_treatment_spark.operators.treatment import TreatmentConfig

    with pytest.raises(ValueError, match="treatment config"):
        backfill_pipeline(
            spark,
            env["wd_a"],
            spark.read.parquet(env["delta_path"]),
            cfg=TreatmentConfig(tol=1.25),
        )


def test_backfill_rejects_contradicting_buckets(spark, env):
    """ADVICE r6: a wrong --buckets prunes the wrong p_bucket set and
    silently duplicates affected conversations' old rows — must refuse
    against the recorded count before touching any table."""
    with pytest.raises(ValueError, match="n_buckets"):
        backfill_pipeline(
            spark,
            env["wd_a"],
            spark.read.parquet(env["delta_path"]),
            n_buckets=env_n_buckets_plus_one(env["wd_a"]),
        )


def env_n_buckets_plus_one(workdir: str) -> int:
    import json

    m = json.loads(open(os.path.join(workdir, "_manifest", "filled.json")).read())
    return int(m["config"]["n_buckets"]) + 1


def test_delete_conversations_equals_filtered_rebuild(spark, tmp_path):
    """Whole-conversation deletion (VERDICT r6 item 5): post-delete tables
    bit-equal a from-scratch build on the filtered input, partitions whose
    last row left are dropped, lineage stays green, and a repeat delete is
    a no-op."""
    from pneuma_treatment_spark.plans.backfill import delete_conversations

    args = dict(n_convs=10, seed=13, mega_turns=0)
    base_path = str(tmp_path / "raw")
    generate_transcripts(spark, 10, seed=13).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    victims = [
        r["conv_id"]
        for r in base.select("conv_id").distinct().orderBy("conv_id").limit(2).collect()
    ]
    filt_path = str(tmp_path / "filtered")
    base.where(~F.col("conv_id").isin(victims)).write.parquet(filt_path)

    wd_a, wd_b = str(tmp_path / "wa"), str(tmp_path / "wb")
    run_pipeline(spark, wd_a, **args, input_table=base_path)
    summary = delete_conversations(
        spark, wd_a, spark.createDataFrame([(c,) for c in victims], ["conv_id"])
    )
    run_pipeline(spark, wd_b, **args, input_table=filt_path)

    assert summary["affected_convs"] == 2
    assert summary["tables"]["ingest"]["removed"] > 0
    assert summary["tables"]["ingest"]["added"] == 0

    io_a, io_b = TableIO(spark, wd_a), TableIO(spark, wd_b)
    for t in TABLES:
        pd.testing.assert_frame_equal(
            _sorted_pdf(io_a, t), _sorted_pdf(io_b, t), check_dtype=False
        ), t
    for t in TABLES:
        assert verify_partition_lineage(io_a, t), t

    # the victims' rows are physically gone everywhere
    for t in TABLES:
        assert io_a.read(t).where(F.col("conv_id").isin(victims)).count() == 0, t

    # idempotent: repeating the delete changes nothing
    again = delete_conversations(
        spark, wd_a, spark.createDataFrame([(victims[0],)], ["conv_id"])
    )
    assert again["tables"]["ingest"]["removed"] == 0
    pd.testing.assert_frame_equal(
        _sorted_pdf(io_a, "chunks"), _sorted_pdf(io_b, "chunks"), check_dtype=False
    )

    shutil.rmtree(wd_a, ignore_errors=True)
    shutil.rmtree(wd_b, ignore_errors=True)


def test_scrub_deadletter_removes_victims_only(spark, tmp_path):
    """Compliance deletion must reach the dead-letter raw-text store: the
    victims' rows leave every epoch dir, other rows are byte-identical,
    an epoch emptied entirely disappears, and a re-scrub is a no-op."""
    from pneuma_treatment_spark.plans.backfill import scrub_deadletter

    dead = tmp_path / "dead"
    rows0 = [("cv", 0, "user", "victim secret", None, "2024-01-01 10:00:00"),
             ("ck", 0, "user", "kept text", None, "2024-01-01 10:01:00")]
    rows1 = [("cv", 1, "user", "victim only epoch", None, "2024-01-01 11:00:00")]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    for i, rows in enumerate((rows0, rows1)):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.parquet(str(dead / f"batch_id={i}"))

    victims = spark.createDataFrame([("cv",)], ["conv_id"])
    out = scrub_deadletter(spark, str(dead), victims)
    assert out["rows_removed"] == 2
    assert out["epochs_rewritten"] == ["batch_id=0"]
    assert out["epochs_removed"] == ["batch_id=1"]
    left = spark.read.option("basePath", str(dead)).parquet(str(dead)).collect()
    assert len(left) == 1 and left[0]["conv_id"] == "ck" and left[0]["text"] == "kept text"
    again = scrub_deadletter(spark, str(dead), victims)
    assert again["rows_removed"] == 0 and not again["epochs_rewritten"]


def test_crashed_scrub_aside_is_invisible_and_heals(spark, tmp_path):
    """A crash inside the scrub swap must never let readers resurrect the
    pre-scrub contents: the aside dir is dot-prefixed (invisible to Spark
    listing and batch_id=* globs), a concurrent heal reads only the
    scrubbed rows, and the next scrub restores the aside before acting."""
    from pneuma_treatment_spark.plans.backfill import scrub_deadletter
    from pneuma_treatment_spark.streaming.rollup_stream import read_dead_letter

    dead = tmp_path / "dead"
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    spark.createDataFrame(
        [("ck", 0, "user", "kept", None, "2024-01-01 10:00:00")], schema
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
        str(dead / "batch_id=0")
    )
    # simulate a crash mid-swap: the ORIGINAL (victim-bearing) epoch sits
    # in the aside, the rewritten dir never landed
    spark.createDataFrame(
        [("cv", 0, "user", "victim secret", None, "2024-01-01 11:00:00")], schema
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
        str(dead / ".aside.batch_id=1")
    )

    # readers see only live epochs — the aside's raw text is invisible
    rows = read_dead_letter(spark, str(dead)).collect()
    assert [r["conv_id"] for r in rows] == ["ck"]

    # the next scrub heals the aside back, then scrubs it like any epoch
    out = scrub_deadletter(
        spark, str(dead), spark.createDataFrame([("cv",)], ["conv_id"])
    )
    assert out["rows_removed"] == 1 and out["epochs_removed"] == ["batch_id=1"]
    assert not (dead / ".aside.batch_id=1").exists()
    left = read_dead_letter(spark, str(dead)).collect()
    assert [r["conv_id"] for r in left] == ["ck"]


def test_adopt_buckets_is_loud_without_a_record(tmp_path):
    """No recorded bucket count + no explicit --buckets must ERROR: a
    guessed default is exactly the wrong-bucket-set pruning the adoption
    exists to prevent."""
    from pneuma_treatment_spark.plans.backfill import _adopt_recorded_buckets

    with pytest.raises(ValueError, match="record"):
        _adopt_recorded_buckets({}, None)
    assert _adopt_recorded_buckets({}, 16) == 16
    assert _adopt_recorded_buckets({"n_buckets": 8}, None) == 8


def test_backfill_adopts_recorded_chunk_windows(spark, tmp_path):
    """A chunks table written with a CUSTOM window map must be re-encoded
    with the same map on backfill (ADVICE r6) — mixed maps would break
    chunk_ttl_sql_predicate's written-with contract. Pinned by bit-equality
    to a from-scratch rebuild under the same custom map."""
    args = dict(n_convs=10, seed=7, mega_turns=0)
    windows = {"1m": 3, "1h": 20, "1d": 150}
    base_path = str(tmp_path / "raw")
    generate_transcripts(spark, 10, seed=7).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    c = base.select("conv_id").distinct().orderBy("conv_id").first()["conv_id"]
    last = base.where(F.col("conv_id") == c).orderBy(F.col("turn_idx").desc()).limit(1)
    delta = last.select(
        "conv_id",
        (F.col("turn_idx") + 1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("late turn for the window-map test").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias("ts"),
    )
    dpath = str(tmp_path / "delta")
    delta.write.parquet(dpath)
    upd_path = str(tmp_path / "upd")
    base.unionByName(spark.read.parquet(dpath)).write.parquet(upd_path)

    wd_a, wd_b = str(tmp_path / "wa"), str(tmp_path / "wb")
    run_pipeline(spark, wd_a, **args, input_table=base_path, chunk_window_days=windows)
    backfill_pipeline(spark, wd_a, spark.read.parquet(dpath))
    run_pipeline(spark, wd_b, **args, input_table=upd_path, chunk_window_days=windows)
    io_a, io_b = TableIO(spark, wd_a), TableIO(spark, wd_b)
    pd.testing.assert_frame_equal(
        _sorted_pdf(io_a, "chunks"), _sorted_pdf(io_b, "chunks"), check_dtype=False
    )
    shutil.rmtree(wd_a, ignore_errors=True)
    shutil.rmtree(wd_b, ignore_errors=True)
