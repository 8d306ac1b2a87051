"""Scalar/column function library: geocoding, text analysis, hashing."""
