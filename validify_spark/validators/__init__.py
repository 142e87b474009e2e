"""Validator expression builders.

``sql_builders``: pure Column/Catalyst expressions (the fast path — JVM
whole-stage codegen, zero Python). ``udf_tier``: Arrow-vectorized pandas
UDFs for the checks SQL cannot express exactly (ipv6, WHATWG url parse,
phone metadata, IDN email fallback) — applied only where needed
(SURVEY.md §4.2 "two-tier checks").
"""
