"""Hypothesis property tests over the pure-Python layers (no Spark
job per example): the serving as-of lookup vs a brute-force model,
and the fake-media codec roundtrip."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from streaming_recommendation_spark.serving import ReplayService

MAX_H = 4


@pytest.fixture(scope="module")
def service(spark):
    rows = []
    # dense ties: 3 users x timestamps drawn from a tiny domain
    ts_plan = {
        "a": [5, 5, 10, 10, 10, 20, 30],
        "b": [1],
        "c": [7, 7, 7, 7, 7, 7],
    }
    for u, tss in ts_plan.items():
        for i, ts in enumerate(tss):
            rows.append(Row(user_id=u, item_id=f"{u}{i}", timestamp=ts))
    behavior = spark.createDataFrame(rows)
    svc = ReplayService(behavior, max_history=MAX_H)
    svc._rows = rows
    return svc


@given(
    user=st.sampled_from(["a", "b", "c", "ghost"]),
    ts=st.integers(min_value=-5, max_value=40),
)
@settings(max_examples=300, deadline=None)
def test_recent_history_matches_bruteforce(service, user, ts):
    got = service.recent_history(user, ts)
    visible = sorted(
        ((r.timestamp, r.item_id) for r in service._rows
         if r.user_id == user and r.timestamp <= ts),
    )
    expected = [i for _, i in visible][-MAX_H:]
    assert got == expected


@given(doc_id=st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_fake_media_header_roundtrip(doc_id):
    """The header attach_fake_media builds column-side must parse back
    through _parse_fake with the same geometry (byte-level protocol
    agreement between the Spark writer and the pandas reader)."""
    import hashlib
    import struct

    from streaming_recommendation_spark.multimodal.columns import _parse_fake

    width = doc_id % 16 + 4
    height = doc_id % 12 + 4
    body = bytes.fromhex(hashlib.md5(str(doc_id).encode()).hexdigest() * 4)
    payload = (
        b"FAKEMEDIA1" + struct.pack(">III", width, height, 1) + body
    )
    w, h, nf, parsed_body = _parse_fake(payload)
    assert (w, h, nf) == (width, height, 1)
    assert parsed_body == body


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("abcde"), st.text(max_size=5)), max_size=30
    )
)
@settings(max_examples=100, deadline=None)
def test_jsonl_sink_last_write_wins(tmp_path_factory, pairs):
    from streaming_recommendation_spark.streaming.sink import JsonlDirSink

    sink = JsonlDirSink(str(tmp_path_factory.mktemp("kv")))
    sink.write_pairs(pairs)
    expected = dict(pairs)  # dict() keeps the LAST value per key
    assert sink.read_all() == expected
