from .pipeline import (
    PROFILE_SCHEMA,
    parse_profile_stream,
    profile_pipeline,
    read_kafka_stream,
    sliding_window_activity,
    versioned_profile_records,
)
from .sink import JsonlDirSink, RedisSink, foreach_batch_writer

__all__ = [
    "PROFILE_SCHEMA",
    "parse_profile_stream",
    "profile_pipeline",
    "read_kafka_stream",
    "sliding_window_activity",
    "versioned_profile_records",
    "JsonlDirSink",
    "RedisSink",
    "foreach_batch_writer",
]
