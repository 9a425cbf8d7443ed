from .core import ConstraintSuite, SuiteResult, stable_partition_id

__all__ = ["ConstraintSuite", "SuiteResult", "stable_partition_id"]
