"""Composed end-to-end pipelines."""

from .flagship import flagship_pipeline  # noqa: F401
