"""Multimodal binary-column plumbing: schemas, batching, determinism."""

from __future__ import annotations

from pneuma_treatment_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    resize_images,
    synth_media,
)


def test_feature_extraction_deterministic(spark):
    media = synth_media(spark, n=48, seed=5)
    f1 = extract_features(media, dim=32).toPandas().sort_values("media_id")
    f2 = extract_features(synth_media(spark, n=48, seed=5), dim=32).toPandas().sort_values("media_id")
    assert (f1["payload_sha"].to_numpy() == f2["payload_sha"].to_numpy()).all()
    assert all(len(v) == 32 for v in f1["feature"])
    assert (f1["n_bytes"] > 0).all()


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=30, seed=5)
    plan = frame_sample_plan(media, every_ms=1000).toPandas()
    vids = media.where("kind = 'video'").toPandas()
    # one row per sampled frame; counts follow duration
    per = plan.groupby("media_id").size()
    for r in vids.itertuples(index=False):
        assert per[r.media_id] == (r.duration_ms - 1) // 1000 + 1


def test_resize_images_geometry(spark):
    media = synth_media(spark, n=48, seed=5)
    out = resize_images(media, max_side=64).toPandas()
    src = media.where("kind = 'image'").toPandas()
    assert len(out) == len(src)
    assert (out[["width", "height"]].max(axis=1) <= 64).all()
    m = out.merge(src, on="media_id", suffixes=("_n", "_o"))
    # exact integer geometry: aspect-preserving clamp with truncation
    for r in m.itertuples(index=False):
        scale = min(1.0, 64 / max(r.width_o, r.height_o))
        assert (r.width_n, r.height_n) == (
            max(1, int(r.width_o * scale)),
            max(1, int(r.height_o * scale)),
        )
