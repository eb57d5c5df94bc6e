"""Reusable large-scale data-pipeline operators (north-star extension).

These are the LLM-training-data operators the project adds beyond the
reference's surface (BASELINE.json north_star): deduplication families,
similarity search, text analysis, multimodal column plumbing. Each is a
composition of built-in DataFrame ops (JVM-side, codegen'd) — Pandas
UDFs appear only where built-ins genuinely cannot express the semantics
(multimodal decode).
"""
