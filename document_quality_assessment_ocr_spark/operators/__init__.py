"""Relational + training-data operators.

Beyond the reference's own surface (SURVEY.md §2), a 100 TB training-data
pipeline needs dedup / similarity / text-analysis primitives; they live here
as DataFrame → DataFrame functions, built from native Spark ops (md5-keyed
hashing so the DuckDB oracle can reproduce them bit-for-bit)."""
