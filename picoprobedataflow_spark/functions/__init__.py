"""Scalar / text / vector function layer (SURVEY.md §2.8)."""

from picoprobedataflow_spark.functions import scalar, text, vectors  # noqa: F401
