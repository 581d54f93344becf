from .catalog import ORACLES, QUERIES, register

__all__ = ["ORACLES", "QUERIES", "register"]
