"""Numeric kernels: pose math, encodings, ray generation, rendering, losses."""
