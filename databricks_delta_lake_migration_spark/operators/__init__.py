"""Reusable DataFrame→DataFrame operators.

Reference-parity operators (cleanse, SCD2, gold products) plus the
[EXT] LLM-data-pipeline tier (dedup family, similarity search, text
analysis, multimodal plumbing) mandated by BASELINE.json.
"""
