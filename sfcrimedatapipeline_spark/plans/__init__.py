"""Logical plans: dimension builders, fact build, serve queries, pipeline."""
