"""Utilities: math, imaging, logging, timing."""
