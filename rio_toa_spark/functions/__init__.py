"""Scalar/array compute kernels and metadata parsing for the engine."""
