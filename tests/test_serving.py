"""Serving facade handlers: as-of history parity, profile fan-out,
versioned recommendation lookup — no web framework needed."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from streaming_recommendation_spark.serving import ReplayService


@pytest.fixture(scope="module")
def service(spark):
    rows = []
    for u in ["u1", "u2", "u3"]:
        for i in range(6):
            rows.append(
                Row(user_id=u, item_id=f"{u}-i{i}", timestamp=1000 + i * 100)
            )
    behavior = spark.createDataFrame(rows)
    return ReplayService(behavior, max_history=3, fanout_min=1, fanout_max=2)


def test_recent_history_asof_semantics(service):
    # inclusive at exact ts; last max_history items
    assert service.recent_history("u1", 1200) == ["u1-i0", "u1-i1", "u1-i2"]
    assert service.recent_history("u1", 1199) == ["u1-i0", "u1-i1"]
    assert service.recent_history("u1", 9999) == ["u1-i3", "u1-i4", "u1-i5"]
    assert service.recent_history("u1", 500) == []
    assert service.recent_history("nobody", 1200) == []


def test_send_profiles_writes_versioned_keys(service):
    resp = service.send_profiles("u1", 1300)
    assert "user profiles" in resp["message"]
    assert json.loads(service.kv["user_profile:u1:1300"]) == [
        "u1-i1", "u1-i2", "u1-i3",
    ]
    # deterministic: same call -> same fan-out
    kv_before = dict(service.kv)
    service.send_profiles("u1", 1300)
    assert service.kv == kv_before


def test_get_recommendation_latest_at_or_before(service):
    service.kv["recommendation_result:u2:1100"] = json.dumps(["a", "b"])
    service.kv["recommendation_result:u2:1400"] = json.dumps(["c"])
    assert service.get_recommendation("u2", 1350) == {
        "user_id": "u2", "timestamp": 1100, "recommendation": ["a", "b"],
    }
    assert service.get_recommendation("u2", 1400)["recommendation"] == ["c"]
    assert service.get_recommendation("u2", 1000)["recommendation"] == []


def test_fastapi_gate(service):
    try:
        import fastapi  # noqa: F401

        pytest.skip("fastapi unexpectedly present")
    except ImportError:
        pass
    from streaming_recommendation_spark.serving.handlers import build_app

    with pytest.raises(NotImplementedError):
        build_app(service)
