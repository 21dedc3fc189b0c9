"""Scalar / vectorized function surface (SURVEY.md §2.10-2.11).

:mod:`.text` — native Column expressions for text spans (density, tokens,
language-ID, quality, fingerprints): JVM-side, codegen-fused, SQL-checkable.

:mod:`.udfs` — Arrow-batched pandas UDFs wrapping the numpy kernels in
:mod:`..kernels` for media spans: the sanctioned slow path, never per-row
Python.
"""
