"""Batch sources/sinks: JDBC bridges and filesystem helpers."""
