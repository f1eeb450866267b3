"""Default grok pattern library loader.

Parses the vendored ``*.pattern`` data files (see README.md in this
directory) at import time with the same rules the reference applies at
build time (/root/reference/build.rs:15-39): skip blank lines and lines
starting with ``#``, split each remaining line at the first space into
``(NAME, pattern_body)``, sorted by name.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["default_patterns", "pattern_files"]

_PATTERN_DIR = Path(__file__).resolve().parent


def pattern_files() -> list[Path]:
    """The vendored pattern data files, sorted by name."""
    return sorted(_PATTERN_DIR.glob("*.pattern"))


def _load() -> dict[str, str]:
    patterns: dict[str, str] = {}
    for path in pattern_files():
        for line in path.read_text(encoding="utf-8").splitlines():
            if not line or line.startswith("#"):
                continue
            name, sep, body = line.partition(" ")
            if not sep:
                continue
            patterns[name] = body
    return dict(sorted(patterns.items()))


_DEFAULTS: dict[str, str] | None = None


def default_patterns() -> dict[str, str]:
    """A fresh copy of the 319 built-in pattern definitions."""
    global _DEFAULTS
    if _DEFAULTS is None:
        _DEFAULTS = _load()
    return dict(_DEFAULTS)


if __name__ == "__main__":
    # `python -m grokspark.patterns` — report library size.
    pats = default_patterns()
    print(f"{len(pats)} default patterns from {len(pattern_files())} files")
