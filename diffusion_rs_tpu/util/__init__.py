"""Utilities: tracing/profiling hooks, progress reporting."""

from .tracing import trace_span, maybe_profile  # noqa: F401
from .progress import progress  # noqa: F401
from .dtype import resolve_auto_dtype  # noqa: F401
