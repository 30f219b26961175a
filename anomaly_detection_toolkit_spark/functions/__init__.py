"""Reusable column-expression builders and pure-numpy kernels."""
