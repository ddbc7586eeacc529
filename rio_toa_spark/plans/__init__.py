"""Resumable execution: partition manifests, lineage, metrics."""
