from .audit import audit, checkpoint_partitioned, formatted_plan

__all__ = ["audit", "checkpoint_partitioned", "formatted_plan"]
