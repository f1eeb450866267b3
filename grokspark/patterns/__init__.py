"""Default grok pattern library loader.

Parses the vendored ``*.pattern`` data files (see README.md in this
directory) at import time with the same rules the reference applies at
build time (/root/reference/build.rs:15-39): skip blank lines and lines
starting with ``#``, split each remaining line at the first space into
``(NAME, pattern_body)``, sorted by name.

Provenance parity: the reference codegens one documented module per
pattern file plus a merged set (/root/reference/build.rs:76-97,
``pub mod patterns``). Here ``patterns_by_file()`` is that per-file
enumeration and ``default_patterns()`` the merged view; later files
win on name collisions in the merged view, same as the reference's
insertion order over sorted file names.
"""

from __future__ import annotations

from importlib import resources
from pathlib import Path

__all__ = ["default_patterns", "pattern_files", "patterns_by_file"]

_PATTERN_DIR = Path(__file__).resolve().parent


def pattern_files() -> list[Path]:
    """The vendored pattern data files as filesystem paths, sorted by
    name (empty when the package runs from a ``--py-files`` zip — use
    ``patterns_by_file``/``default_patterns``, which are zip-safe)."""
    return sorted(_PATTERN_DIR.glob("*.pattern"))


def _iter_pattern_texts() -> list[tuple[str, str]]:
    """(file_stem, text) for every vendored data file, via
    importlib.resources so it works both from a checkout AND from the
    ``spark-submit --py-files`` zip (plain ``Path.glob`` silently finds
    NOTHING inside a zip — the registry shipped empty to clusters
    until the submit smoke test caught it)."""
    suffix = ".pattern"
    out = [
        (entry.name[: -len(suffix)], entry.read_text(encoding="utf-8"))
        for entry in resources.files(__package__).iterdir()
        if entry.name.endswith(suffix)
    ]
    if not out:
        raise RuntimeError(
            "no vendored .pattern data files found — the grokspark "
            "package was deployed without its data files"
        )
    return sorted(out)


def _parse_text(text: str) -> dict[str, str]:
    patterns: dict[str, str] = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        name, sep, body = line.partition(" ")
        if not sep:
            continue
        patterns[name] = body
    return patterns


def _load() -> dict[str, dict[str, str]]:
    return {stem: _parse_text(text) for stem, text in _iter_pattern_texts()}


_BY_FILE: dict[str, dict[str, str]] | None = None


def _by_file() -> dict[str, dict[str, str]]:
    global _BY_FILE
    if _BY_FILE is None:
        _BY_FILE = _load()
    return _BY_FILE


def patterns_by_file(file: str | None = None) -> dict:
    """Per-file pattern provenance (reference: the generated per-file
    modules, /root/reference/build.rs:76-97).

    With ``file`` (a stem like ``"aws"`` or a file name like
    ``"aws.pattern"``): that file's name -> body dict. Without: the full
    ``{file_stem: {name: body}}`` mapping."""
    by_file = _by_file()
    if file is None:
        return {stem: dict(pats) for stem, pats in by_file.items()}
    stem = file.removesuffix(".pattern")
    if stem not in by_file:
        raise KeyError(
            f"no vendored pattern file {file!r}; have {sorted(by_file)}"
        )
    return dict(by_file[stem])


_MERGED: dict[str, str] | None = None


def default_patterns() -> dict[str, str]:
    """A fresh copy of the 320 built-in pattern definitions (all files
    merged; sorted by name like the reference's BTreeMap)."""
    global _MERGED
    if _MERGED is None:
        merged: dict[str, str] = {}
        for pats in _by_file().values():
            merged.update(pats)
        _MERGED = dict(sorted(merged.items()))
    return dict(_MERGED)


if __name__ == "__main__":
    # `python -m grokspark.patterns` — report library size.
    pats = default_patterns()
    print(f"{len(pats)} default patterns from {len(pattern_files())} files")
