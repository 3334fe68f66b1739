"""Distributed operators over Ray Data Datasets."""

from georay.ops import spatial  # noqa: F401
