"""Multimodal plumbing: schema, batch shape, deterministic fake decode."""

import hashlib

from thesis_ner_co_tri_training_spark.operators.multimodal import (
    _fake_features,
    extract_features,
    frame_sample_plan,
    gen_media_df,
)


def test_extract_features_shape_and_determinism(spark):
    media = gen_media_df(spark, 30)
    feats = extract_features(media, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        assert r["feat_dim"] == 8 and len(r["feat"]) == 8
        assert "PIL" in r["decode_error"] or "libvips" in r["decode_error"]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        want = _fake_features(payload, 8)
        # feat column is float32; compare within single-precision tolerance
        assert all(abs(a - b) < 1e-6 for a, b in zip(r["feat"], want))


def test_frame_sample_plan_counts(spark):
    media = gen_media_df(spark, 12)
    plan = frame_sample_plan(media, every_ms=500)
    got = {}
    for r in plan.collect():
        got.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    # only videos (every 3rd id starting at 2), frames = 0..duration step 500
    want_ids = {i for i in range(12) if i % 3 == 2}
    assert set(got) == want_ids
    for i in want_ids:
        duration = 1000 + i
        assert sorted(got[i]) == list(range(0, duration + 1, 500))
