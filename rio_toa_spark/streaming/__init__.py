"""Structured Streaming ingest for the page/tile pipelines."""
