from .handlers import KvReplayService, ReplayService, build_kv_history_index

__all__ = ["KvReplayService", "ReplayService", "build_kv_history_index"]
