"""Multimodal plumbing: schema, determinism, batch shape (decode stubbed)."""

import pytest


def _media_df(spark):
    from stakgraph_spark.textops.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", b"\x89PNG fake bytes 1", {"src": "cam"}, "r1"),
        (2, "image", b"\x89PNG fake bytes 2", {"src": "cam"}, "r1"),
        (3, "audio", b"RIFF fake wav", {"sr": "16000"}, "r2"),
        (4, "image", None, {}, "r2"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_deterministic(spark):
    from stakgraph_spark.textops.multimodal import extract_media_features

    feats = {r.media_id: r for r in
             extract_media_features(_media_df(spark)).collect()}
    assert set(feats) == {1, 2, 3, 4}
    # images get dims + 16-dim embedding; audio passes through hash-only
    assert feats[1].width and feats[1].height and len(feats[1].embedding) == 16
    assert feats[3].embedding is None and feats[3].n_bytes == 13
    # deterministic: same bytes -> same feature
    again = {r.media_id: r for r in
             extract_media_features(_media_df(spark)).collect()}
    assert again[1].embedding == feats[1].embedding
    assert feats[1].sha != feats[2].sha


def test_real_decode_is_explicitly_stubbed():
    from stakgraph_spark.textops.multimodal import _decode_image

    with pytest.raises(NotImplementedError):
        _decode_image(b"x", fake=False)
