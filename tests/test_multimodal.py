"""Multimodal column plumbing (operators/multimodal.py): schemas, Arrow
batch shapes, determinism, and frame-sampling fan-out. The decode itself
is a documented stub — these tests pin the Spark-side contract a real
decoder would drop into."""

import math

import pytest
from pyspark.sql import functions as F

from golden_horse_spark.operators.multimodal import (
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    extract_media_features,
    sample_video_frames,
    synthesize_media,
)
from golden_horse_spark.sources.documents import synthesize_documents

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def media(spark):
    docs = synthesize_documents(spark, 120, seed=31, partitions=4)
    return synthesize_media(spark, docs).cache()


def test_media_table_schema_and_determinism(spark, media):
    assert media.schema == MEDIA_SCHEMA
    rows = media.collect()
    assert rows, "synthesizer produced no media rows"
    assert all(len(r["payload"]) == 128 for r in rows)
    assert {r["kind"] for r in rows} <= {"image", "audio", "video"}
    # deterministic: regenerate from the same documents → identical table
    docs = synthesize_documents(spark, 120, seed=31, partitions=4)
    again = {tuple(r) for r in synthesize_media(spark, docs).collect()}
    assert again == {tuple(r) for r in rows}
    # images carry no duration (time media may hash to 0 too)
    assert all(r["duration_ms"] == 0 for r in rows if r["kind"] == "image")


def test_feature_extraction_shapes(media):
    feats = extract_media_features(media, feat_dim=8)
    assert feats.schema == FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()  # one feature row per media row
    for r in rows:
        assert r["feat_dim"] == 8 and len(r["feature"]) == 8
        mean, std, mn, mx = r["feature"][:4]
        assert 0.0 <= mn <= mean <= mx <= 1.0
        assert std >= 0.0 and not math.isnan(std)


def test_feature_extraction_deterministic(media):
    a = {(r["media_ref"], tuple(r["feature"])) for r in
         extract_media_features(media).collect()}
    b = {(r["media_ref"], tuple(r["feature"])) for r in
         extract_media_features(media).collect()}
    assert a == b


def test_video_frame_sampling_fanout(media):
    frames = sample_video_frames(media, every_ms=1000)
    rows = frames.collect()
    durations = {
        r["media_ref"]: r["duration_ms"]
        for r in media.where("kind = 'video'").collect()
    }
    assert set(r["media_ref"] for r in rows) == set(durations)
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r["ts_ms"])
    for ref, tss in by_ref.items():
        want = max(1, math.ceil(max(durations[ref], 1) / 1000))
        assert len(tss) == want, (ref, durations[ref], sorted(tss))
        assert sorted(tss) == list(range(0, max(durations[ref], 1), 1000))
    # every sampled frame carries a 2-dim feature
    assert all(len(r["frame_feature"]) == 2 for r in rows)


def test_payload_pruned_when_not_needed(media):
    """Selecting only metadata must not read the payload column — at
    100 TB of bytes this is the difference between a metadata query and
    a full scan (column pruning through the projection)."""
    df = media.select("media_ref", "kind").where(F.col("kind") == "image")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[-1] if "ReadSchema" in plan else True
