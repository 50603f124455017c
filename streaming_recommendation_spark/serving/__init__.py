from .handlers import ReplayService

__all__ = ["ReplayService"]
