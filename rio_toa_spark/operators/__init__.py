"""DataFrame-level operators: TOA pipelines, spatial joins, dedup,
similarity search, text analysis."""
