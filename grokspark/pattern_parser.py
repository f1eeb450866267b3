"""Lexer for grok pattern strings.

A grok pattern is a regular-expression string with embedded placeholders
of the form ``%{name:alias:extract=definition}``:

- ``name``   (required): ``[A-Za-z0-9_]+`` — the pattern to expand.
- ``alias``  (optional): additionally allows ``-[].`` — the output key.
  May be empty only when ``extract`` is given (``%{name::extract}``).
- ``extract``(optional): same charset as alias — a type tag the engine
  stores but does not act on (callers cast with it).
- ``definition`` (optional, after ``=``): an inline pattern body, any
  characters except ``{`` and ``}``.

A literal ``%`` is allowed when not followed by ``{``.

Behavioral contract mirrors the reference lexer
(/root/reference/src/pattern_parser.rs:86-278), including its quirks:
``%`` followed by any non-``{`` character swallows text up to the next
``%`` as one literal chunk, and error cases distinguish
InvalidCharacter / InvalidPattern / InvalidPatternDefinition exactly as
the reference does (illegal-form corpus at
/root/reference/src/pattern_parser.rs:350-375).

This module is driver-side only — executors never lex grok strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Union

__all__ = [
    "GrokPatternError",
    "InvalidCharacter",
    "InvalidPattern",
    "InvalidPatternDefinition",
    "RegularExpression",
    "GrokPattern",
    "grok_split",
]


class GrokPatternError(Exception):
    """Base class for grok pattern lex errors."""


class InvalidCharacter(GrokPatternError):
    """A character not allowed in a name/alias/extract component."""

    def __init__(self, char: str) -> None:
        super().__init__(f"invalid character {char!r} in grok placeholder")
        self.char = char


class InvalidPattern(GrokPatternError):
    """The placeholder is structurally invalid (unterminated, empty name,
    or too many components)."""


class InvalidPatternDefinition(GrokPatternError):
    """The inline definition (or an empty alias/extract slot that required
    content) is invalid."""


@dataclass(frozen=True)
class RegularExpression:
    """A literal regex chunk of the grok string."""

    string: str
    start: int
    end: int


@dataclass(frozen=True)
class GrokPattern:
    """One ``%{...}`` placeholder."""

    pattern: str  # the full original %{...} text
    name: str
    alias: str
    extract: str
    definition: str
    start: int
    end: int


Component = Union[RegularExpression, GrokPattern]

_TERMINATORS = "}=:"
_ALIAS_EXTRA = "-[]."


def _munch_word(s: str, i: int, allow_extra: bool) -> tuple[str, str, int]:
    """Scan a name/alias/extract word starting at ``i``.

    Returns ``(word, terminator, index_of_terminator)``. The empty word is
    legal only in alias/extract position (``allow_extra``).
    """
    start = i
    n = len(s)
    while i < n:
        c = s[i]
        if c in _TERMINATORS:
            if i == start and not allow_extra:
                raise InvalidPattern(f"empty pattern name in {s!r}")
            return s[start:i], c, i
        ok = (c.isascii() and c.isalnum()) or c == "_" or (allow_extra and c in _ALIAS_EXTRA)
        if not ok:
            raise InvalidCharacter(c)
        i += 1
    raise InvalidPattern(f"unterminated grok placeholder in {s!r}")


def _lex_placeholder(s: str, start: int) -> tuple[GrokPattern, int]:
    """Lex one placeholder whose ``%{`` begins at ``start``.

    Returns the component and the index just past its closing ``}``.
    """
    n = len(s)
    i = start + 2  # past "%{"
    parts = ["", "", ""]  # name, alias, extract
    idx = 0
    while True:
        word, term, i = _munch_word(s, i, allow_extra=idx > 0)
        if idx == 3:
            raise InvalidPattern(f"too many components in grok placeholder in {s!r}")
        parts[idx] = word
        i += 1  # consume the terminator
        idx += 1
        if idx == 3 and parts[2] == "":
            raise InvalidPatternDefinition(f"empty extract in {s!r}")
        if term == "}":
            if idx == 2 and parts[1] == "":
                # `%{name:}` — an alias slot was opened but left empty with
                # no extract to justify it.
                raise InvalidPatternDefinition(f"empty alias in {s!r}")
            return (
                GrokPattern(s[start:i], parts[0], parts[1], parts[2], "", start, i),
                i,
            )
        if term == "=":
            dstart = i
            while True:
                if i >= n:
                    raise InvalidPatternDefinition(f"unterminated definition in {s!r}")
                c = s[i]
                if c == "{":
                    raise InvalidPatternDefinition(f"'{{' not allowed in definition in {s!r}")
                if c == "}":
                    break
                i += 1
            definition = s[dstart:i]
            i += 1  # consume '}'
            if definition == "":
                raise InvalidPatternDefinition(f"empty definition in {s!r}")
            if idx == 2 and parts[1] == "":
                raise InvalidPatternDefinition(f"empty alias in {s!r}")
            return (
                GrokPattern(s[start:i], parts[0], parts[1], parts[2], definition, start, i),
                i,
            )
        # term == ":" — next component


def grok_split(s: str) -> Iterator[Component]:
    """Split a grok pattern string into literal-regex and placeholder
    components. Raises a :class:`GrokPatternError` subclass at the first
    malformed placeholder.
    """
    n = len(s)
    i = 0
    while i < n:
        start = i
        if s[i] == "%":
            if i + 1 >= n:
                # trailing lone '%'
                yield RegularExpression(s[start:], start, n)
                return
            if s[i + 1] == "{":
                comp, i = _lex_placeholder(s, start)
                yield comp
                continue
            # Literal '%': the following character is swallowed into this
            # chunk too (so "%%{x}" is a single literal chunk), then scan
            # up to the next '%'.
            i += 2
            while i < n and s[i] != "%":
                i += 1
            yield RegularExpression(s[start:i], start, i)
            continue
        while i < n and s[i] != "%":
            i += 1
        yield RegularExpression(s[start:i], start, i)
