"""Composable DataFrame operators (non-query building blocks).

Query-shaped capabilities live in ``plans/``; this package holds the
operators that are reused across plans or that need imperative
(pandas-UDF) implementations: multimodal decode plumbing, the
map/reduce UDF adapters, etc.
"""
