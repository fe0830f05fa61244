"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic fakes,
NotImplementedError gates for real codecs."""

import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.operators.multimodal import (
    decode_images,
    make_feature_extract_udf,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30).cache()


def test_synth_media_schema_and_determinism(spark, media):
    again = synth_media(spark, n=30)
    assert sorted(map(tuple, media.collect())) == sorted(map(tuple, again.collect()))
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"} and len(kinds) == 3


def test_decode_images_shapes(media):
    out = decode_images(media)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert 0.0 <= r["mean_intensity"] <= 255.0
        assert r["width"] >= 4 and r["height"] >= 4
    # deterministic
    assert sorted(map(tuple, rows)) == sorted(map(tuple, decode_images(media).collect()))


def test_real_decode_is_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        decode_images(media, real_decode=True).collect()


def test_feature_extract_udf(media):
    extract = make_feature_extract_udf(dim=8)
    rows = media.select("media_id", extract(F.col("payload")).alias("feat")).collect()
    assert all(len(r["feat"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feat"])


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=1000)
    per_vid = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durations = {r["media_id"]: r["meta"]["duration_ms"] for r in media.filter(F.col("kind") == "video").collect()}
    assert per_vid and set(per_vid) == set(durations)
    for mid, n in per_vid.items():
        assert n == durations[mid] // 1000
