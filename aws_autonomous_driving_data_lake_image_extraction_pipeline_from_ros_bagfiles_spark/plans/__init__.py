"""Query registry exported through /root/repo/__spark_entry__.py."""

from .registry import ORACLES, QUERIES, register

__all__ = ["ORACLES", "QUERIES", "register"]
