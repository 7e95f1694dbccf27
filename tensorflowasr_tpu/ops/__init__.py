"""Functional compute ops: frontend, losses, decoding, Pallas kernels."""
