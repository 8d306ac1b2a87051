"""Composed end-to-end pipelines."""

from .flagship import flagship_pipeline, flagship_transform  # noqa: F401
