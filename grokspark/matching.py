"""Pure-Python single-row matching — the documented parity API.

This is the reference library's user surface (compile once, match in a
loop, /root/reference/README.md:50-56; ``match_against`` returning
``Option<Matches>``, /root/reference/src/lib.rs:100-105) exposed as
plain functions. The heavy lifting lives on
:class:`grokspark.compiler.CompiledPattern`; this module is the stable,
driver-side, non-Spark entry point used by tests, oracles, and the CLI.

For bulk matching inside Spark use :mod:`grokspark.udfs` — same
semantics, Arrow-batched.
"""

from __future__ import annotations

from typing import Optional

from grokspark.compiler import CompiledPattern, GrokRegistry

__all__ = ["compile_pattern", "match", "match_against"]


def compile_pattern(
    expr: str,
    registry: Optional[GrokRegistry] = None,
    with_alias_only: bool = False,
) -> CompiledPattern:
    """Compile a grok expression against ``registry`` (default: the 320
    vendored builtins)."""
    registry = registry or GrokRegistry.with_default_patterns()
    return registry.compile(expr, with_alias_only=with_alias_only)


def match_against(
    compiled: CompiledPattern, text: str, timeout: Optional[float] = None
) -> Optional[dict[str, str]]:
    """Match one line: ``{key: value}`` of participating captures in
    sorted key order, or None on no-match (the reference's
    ``Option<Matches>`` + ``Matches::iter()`` view)."""
    return compiled.match_against(text, timeout=timeout)


def match(
    expr: str,
    text: str,
    registry: Optional[GrokRegistry] = None,
    with_alias_only: bool = False,
) -> Optional[dict[str, str]]:
    """One-shot convenience: compile ``expr`` and match ``text``.
    Compile-once-match-many callers should use :func:`compile_pattern` +
    :func:`match_against` instead."""
    return match_against(compile_pattern(expr, registry, with_alias_only), text)
