"""Scalar/row-level functions: match formatting, text analysis, dedup helpers."""
