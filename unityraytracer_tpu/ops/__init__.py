"""Compute ops: intersections, sampling, shading, acceleration, kernels."""
