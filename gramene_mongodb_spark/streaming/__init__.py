"""Structured Streaming surface (SURVEY.md §2.9 + §7 phase E).

The reference is batch-only (its Node "streams" are single-process
pipelining, not event-time processing), so this package is pure
extension: event-time windowed aggregation with watermarks and
session windows over the ``events`` table shape.
"""
