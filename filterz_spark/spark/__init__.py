"""Spark-side operators: partition filter builds, probes, sketch aggregation,
skew handling, checkpoint/resume."""
