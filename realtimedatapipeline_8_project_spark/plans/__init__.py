from .registry import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
