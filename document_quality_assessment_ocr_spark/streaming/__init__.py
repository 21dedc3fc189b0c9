"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.9); the streaming story here is
incremental ingest: new spans files appear in a directory, each micro-batch
runs the SAME extraction plan via foreachBatch and appends committed output.
"""

from .extract import stream_extraction  # noqa: F401
