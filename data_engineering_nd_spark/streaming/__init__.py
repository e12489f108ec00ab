"""Structured Streaming layer.

The reference is batch-only (SURVEY.md §2.10): its "incremental" story is
daily Airflow re-runs with mode('append') writes. This module provides the
streaming-native equivalents for the engine's event pipeline — the same
logical queries as analytics.q03/q13/q16, expressed over readStream sources
with watermarks, so a user can run them continuously instead of re-batching.
"""
