"""Lineage, checkpointing and resumable execution."""

from .lineage import FragmentRunner, read_manifest  # noqa: F401
