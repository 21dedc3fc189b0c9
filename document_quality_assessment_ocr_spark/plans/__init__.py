"""Logical plans: the end-to-end extraction pipeline and metrics rollups.

Declarative DataFrame code only — Catalyst owns physical planning. The
extraction plan executes with at most two shuffles (dedup by doc_id + the
payload-score join when the payload side is too big to broadcast); the
per-document aggregation reuses the dedup exchange.
"""
