from .audit import audit, formatted_plan

__all__ = ["audit", "formatted_plan"]
