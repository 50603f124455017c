"""Multimodal column plumbing: binary schema, Arrow-batched
mapInPandas decode/feature/frame ops, determinism across
partitionings, and the import-gated real-decoder path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_recommendation_spark.multimodal import (
    attach_fake_media,
    extract_image_features,
    sample_frames,
)
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media_docs(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    return attach_fake_media(docs, kind="image").cache()


def test_media_column_is_binary(media_docs):
    assert dict(media_docs.dtypes)["media"] == "binary"
    row = media_docs.first()
    assert bytes(row.media).startswith(b"FAKEMEDIA1")


def test_feature_extraction_schema_and_values(spark, media_docs):
    feats = extract_image_features(media_docs, feature_dim=8)
    assert [f.name for f in feats.schema.fields] == [
        "doc_id", "width", "height", "feature",
    ]
    rows = feats.collect()
    assert len(rows) == media_docs.count()
    for r in rows[:20]:
        assert len(r.feature) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feature)
        assert r.width == r.doc_id % 16 + 4
        assert r.height == r.doc_id % 12 + 4


def test_features_stable_across_partitionings(spark, media_docs):
    a = {r.doc_id: r.feature for r in extract_image_features(media_docs).collect()}
    rep = media_docs.repartition(13)
    b = {r.doc_id: r.feature for r in extract_image_features(rep).collect()}
    assert a == b


def test_frame_sampling_fanout(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id").limit(10)
    vids = attach_fake_media(docs, kind="video")  # n_frames = 8
    frames = sample_frames(vids, every_n=2)
    rows = frames.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert len(per_doc) == 10
    for idxs in per_doc.values():
        assert sorted(idxs) == [0, 2, 4, 6]
    assert all(len(bytes(r.frame)) > 0 for r in rows)


def test_pil_decoder_import_gate(spark, media_docs):
    """Without Pillow the real-decoder path must fail loudly with
    guidance, not silently fall back."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        extract_image_features(media_docs.limit(2), decoder="pil").collect()
    assert "NotImplementedError" in str(ei.value) or "Pillow" in str(ei.value)


def test_audio_features_stub(spark):
    from streaming_recommendation_spark.multimodal.columns import (
        extract_audio_features,
    )

    docs = load_table(spark, "documents", SF_DIR).select("doc_id").limit(20)
    audio = attach_fake_media(docs, kind="audio")
    out = extract_audio_features(audio).collect()
    assert len(out) == 20
    for r in out:
        assert r.sample_rate == 16000
        assert r.duration_s > 0
        assert len(r.feature) == 8
        assert all(0.0 <= v <= 1.01 for v in r.feature)


def test_image_phash_banded_near_dup_pairs(spark):
    """Two images differing in one pixel hash within Hamming<=1 and
    must surface as a banded pair; an unrelated image must not."""
    import struct

    from pyspark.sql import Row

    from streaming_recommendation_spark.multimodal.columns import (
        _MAGIC,
        image_phash,
    )
    from streaming_recommendation_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    def payload(body: bytes) -> bytes:
        return _MAGIC + struct.pack(">III", 8, 6, 1) + body

    base = bytes(range(48))
    # mean-preserving local edit (swap two dark pixels): visually
    # near-identical, hash within the banding budget
    tweaked = bytes([1, 0]) + base[2:]
    other = bytes((i * 37 + 11) % 251 for i in range(48))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, media=payload(base)),
            Row(doc_id=2, media=payload(tweaked)),
            Row(doc_id=3, media=payload(other)),
        ]
    )
    hashes = image_phash(df)
    pairs = {(r.a, r.b): r.hamming
             for r in banded_hamming_pairs(hashes, "phash").collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all(p == (1, 2) for p in pairs)


def test_banded_hamming_pairs_validates_params(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    df = spark.createDataFrame([Row(doc_id=1, phash=7)])
    import pytest as _pt

    with _pt.raises(ValueError):
        banded_hamming_pairs(df, "phash", bits=50, bands=4)
    with _pt.raises(ValueError):
        banded_hamming_pairs(df, "phash", max_hamming=4, bands=4)
