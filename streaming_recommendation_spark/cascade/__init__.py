from .recommend import CascadeConfig, recommend

__all__ = ["CascadeConfig", "recommend"]
