"""Utilities: tracing/profiling hooks, progress reporting."""

from .tracing import trace_span, maybe_profile  # noqa: F401
