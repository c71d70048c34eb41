"""Relational, telemetry, and training-data-pipeline operators."""
