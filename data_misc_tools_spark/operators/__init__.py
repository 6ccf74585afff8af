"""Enrichment and pipeline operators (DataFrame → DataFrame)."""
