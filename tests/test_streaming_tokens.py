"""Streaming token-accounting store (streaming/tokens.py): the real
2-batch foreachBatch ingest under frozen BPE merges must serve the
packing manifest from disk identically to the one-shot batch
pipeline, retries must be idempotent, a missing merges file must
raise instead of silently re-learning an incompatible tokenizer, and
the shared-store compaction must round-trip."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.bpe import (
    bpe_token_stats,
    learn_bpe,
)
from streaming_recommendation_spark.operators.curation import pack_sequences
from streaming_recommendation_spark.streaming.tokens import (
    compact_token_stats,
    load_merges,
    pack_from_store,
    read_token_stats,
    save_merges,
    token_stats_batch,
    tokens_ingest_batch,
    tokens_ingest_pipeline,
)

DOCS = [
    (0, "web", "low lower lowest low low"),
    (1, "web", "new newer newest new"),
    (2, "books", "low new low new lower"),
    (3, "books", "widest wider wide wide"),
    (4, "web", "lowest newest widest"),
    (5, "books", "low low low new new wide"),
]
DOC_SCHEMA = "doc_id bigint, source string, text string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, DOC_SCHEMA)


@pytest.fixture(scope="module")
def merges(docs):
    return learn_bpe(docs, num_merges=4, count_mode="delta")


def _pack_rows(df):
    return sorted(
        (r.source, r.bin_id, r.n_docs, r.bin_tokens, r.bin_n_words)
        for r in df.collect()
    )


def test_union_of_batches_is_whole_corpus_stats(spark, docs, merges):
    b0 = docs.where(F.col("doc_id") < 3)
    b1 = docs.where(F.col("doc_id") >= 3)
    streamed = token_stats_batch(b0, merges).unionByName(
        token_stats_batch(b1, merges)
    )
    whole = docs.select("doc_id", "source").join(
        bpe_token_stats(docs, merges), "doc_id"
    )
    key = lambda r: (r.doc_id, r.source, r.n_words, r.n_bpe_tokens)
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, whole.collect())
    )


def test_ingest_then_pack_serves_from_disk(spark, docs, merges, tmp_path):
    sdir = str(tmp_path / "stats")
    mpath = str(tmp_path / "merges.json")
    save_merges(merges, mpath)
    assert load_merges(mpath) == [tuple(m) for m in merges]
    tokens_ingest_batch(docs.where(F.col("doc_id") < 3), 0, sdir, merges)
    tokens_ingest_batch(docs.where(F.col("doc_id") >= 3), 1, sdir, merges)
    got = pack_from_store(spark, sdir, context_len=8)
    per_doc = docs.select("doc_id", "source").join(
        bpe_token_stats(docs, merges), "doc_id"
    )
    want = pack_sequences(
        per_doc, context_len=8, token_col="n_bpe_tokens",
        extra_sum_cols=("n_words",),
    )
    assert _pack_rows(got) == _pack_rows(want)
    # retry idempotence: redeliver batch 1, nothing changes
    tokens_ingest_batch(docs.where(F.col("doc_id") >= 3), 1, sdir, merges)
    assert _pack_rows(pack_from_store(spark, sdir, context_len=8)) == _pack_rows(
        want
    )


def test_real_foreachbatch_pipeline(spark, docs, merges, tmp_path):
    ddir = tmp_path / "stream"
    ddir.mkdir()
    for name, lo, hi, age in (("b0.jsonl", 0, 3, 200), ("b1.jsonl", 3, 6, 100)):
        p = ddir / name
        p.write_text(
            "\n".join(
                json.dumps({"doc_id": i, "source": s, "text": t})
                for i, s, t in DOCS[lo:hi]
            )
            + "\n"
        )
        now = p.stat().st_mtime
        os.utime(p, (now - age, now - age))
    mpath = str(tmp_path / "merges.json")
    save_merges(merges, mpath)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(ddir))
    )
    q = tokens_ingest_pipeline(
        stream, str(tmp_path / "stats"), mpath, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    stats = read_token_stats(spark, str(tmp_path / "stats"))
    assert stats.select("batch_id").distinct().count() == 2
    per_doc = docs.select("doc_id", "source").join(
        bpe_token_stats(docs, merges), "doc_id"
    )
    key = lambda r: (r.doc_id, r.source, r.n_words, r.n_bpe_tokens)
    assert sorted(map(key, stats.drop("batch_id").collect())) == sorted(
        map(key, per_doc.collect())
    )


def test_missing_merges_raises(spark, tmp_path):
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(tmp_path))
    with pytest.raises(FileNotFoundError, match="learn the\n?.*offline"):
        tokens_ingest_pipeline(
            stream,
            str(tmp_path / "stats"),
            str(tmp_path / "nope.json"),
            str(tmp_path / "ckpt"),
        )


def test_compaction_roundtrip_with_upsert(spark, docs, merges, tmp_path):
    """Doc 0 is re-ingested with different text (batch 2); compaction
    keeps the newest counts and the packed manifest equals the batch
    pipeline over the corrected corpus."""
    sdir, bdir = str(tmp_path / "stats"), str(tmp_path / "statsb")
    fixed = spark.createDataFrame(
        [(0, "web", "wide wide widest")], DOC_SCHEMA
    )
    tokens_ingest_batch(docs.where(F.col("doc_id") < 3), 0, sdir, merges)
    tokens_ingest_batch(docs.where(F.col("doc_id") >= 3), 1, sdir, merges)
    tokens_ingest_batch(fixed, 2, sdir, merges)
    gen = compact_token_stats(spark, sdir, bdir, upto_batch_id=2)
    assert gen == 2
    corrected = docs.where(F.col("doc_id") != 0).unionByName(fixed)
    per_doc = corrected.select("doc_id", "source").join(
        bpe_token_stats(corrected, merges), "doc_id"
    )
    want = pack_sequences(
        per_doc, context_len=8, token_col="n_bpe_tokens",
        extra_sum_cols=("n_words",),
    )
    got = pack_from_store(spark, sdir, context_len=8, base_dir=bdir)
    assert _pack_rows(got) == _pack_rows(want)


def test_resolved_read_between_compactions(spark, docs, merges, tmp_path):
    """VERDICT r11 #2 generalized to the token store: doc 0 corrected
    in batch 2, NO compaction — the resolved read (default) serves
    only the newest counts, so packing/billing sums never
    double-count; resolve=False exposes the raw both-copies log."""
    sdir = str(tmp_path / "stats")
    fixed = spark.createDataFrame(
        [(0, "web", "wide wide widest")], DOC_SCHEMA
    )
    tokens_ingest_batch(docs.where(F.col("doc_id") < 3), 0, sdir, merges)
    tokens_ingest_batch(docs.where(F.col("doc_id") >= 3), 1, sdir, merges)
    tokens_ingest_batch(fixed, 2, sdir, merges)
    raw = read_token_stats(spark, sdir, resolve=False)
    assert raw.where(F.col("doc_id") == 0).count() == 2  # both copies
    res = read_token_stats(spark, sdir)
    assert res.where(F.col("doc_id") == 0).count() == 1
    corrected = docs.where(F.col("doc_id") != 0).unionByName(fixed)
    per_doc = corrected.select("doc_id", "source").join(
        bpe_token_stats(corrected, merges), "doc_id"
    )
    want = pack_sequences(
        per_doc, context_len=8, token_col="n_bpe_tokens",
        extra_sum_cols=("n_words",),
    )
    got = pack_from_store(spark, sdir, context_len=8)
    assert _pack_rows(got) == _pack_rows(want)
