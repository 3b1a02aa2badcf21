"""Spark extraction pipeline: ordering, salting, pandas-UDF stages, checkpoints."""
