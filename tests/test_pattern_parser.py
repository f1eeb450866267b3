"""Lexer parity tests — corpus transcribed from the reference
(/root/reference/src/pattern_parser.rs:280-376)."""

from __future__ import annotations

import pytest

from grokspark.pattern_parser import (
    GrokPattern,
    GrokPatternError,
    RegularExpression,
    grok_split,
)


def test_split_literal_and_placeholder():
    comps = list(grok_split("Hello, %{name}!"))
    assert [str(getattr(c, "string", getattr(c, "pattern", ""))) for c in comps] == [
        "Hello, ",
        "%{name}",
        "!",
    ]
    assert isinstance(comps[0], RegularExpression)
    assert isinstance(comps[1], GrokPattern)
    assert isinstance(comps[2], RegularExpression)


LEGAL = [
    "%{name}",
    "%{name:name}",
    "%{name:name:name}",
    "%{name::name}",
    "%{name=defn}",
    "%{name:name=defn}",
    "%{name:name:name=defn}",
    "%{name:name[x]}",
    "%{name:name[x]:name[y]}",
]


@pytest.mark.parametrize("pattern", LEGAL)
def test_legal_placeholders(pattern):
    comps = list(grok_split(pattern))
    assert len(comps) == 1
    comp = comps[0]
    assert isinstance(comp, GrokPattern)
    # spans must reconstruct the original text
    assert pattern[comp.start : comp.end] == comp.pattern


def test_placeholder_fields():
    (c,) = grok_split("%{name:alias:ext=defn}")
    assert (c.name, c.alias, c.extract, c.definition) == ("name", "alias", "ext", "defn")
    (c,) = grok_split("%{name::ext}")
    assert (c.name, c.alias, c.extract, c.definition) == ("name", "", "ext", "")
    (c,) = grok_split("%{name=de fn}")
    assert (c.name, c.alias, c.extract, c.definition) == ("name", "", "", "de fn")


REAL = [
    r"(?:\(Views: %{NUMBER:viewms}ms \| ActiveRecord: %{NUMBER:activerecordms}ms|\(ActiveRecord: %{NUMBER:activerecordms}ms)?",
    r"%{NUMBER:ts}\t%{NOTSPACE:uid}\t%{IP:orig_h}\t%{INT:orig_p}\t%{IP:resp_h}\t%{INT:resp_p}\t%{WORD:proto}\t%{INT:trans_id}\t%{GREEDYDATA:query}\t%{GREEDYDATA:qclass}\t%{GREEDYDATA:qclass_name}\t%{GREEDYDATA:qtype}\t%{GREEDYDATA:qtype_name}\t%{GREEDYDATA:rcode}\t%{GREEDYDATA:rcode_name}\t%{GREEDYDATA:AA}\t%{GREEDYDATA:TC}\t%{GREEDYDATA:RD}\t%{GREEDYDATA:RA}\t%{GREEDYDATA:Z}\t%{GREEDYDATA:answers}\t%{GREEDYDATA:TTLs}\t%{GREEDYDATA:rejected}",
]


@pytest.mark.parametrize("pattern", REAL)
def test_real_world_patterns(pattern):
    comps = list(grok_split(pattern))  # must not raise
    rebuilt = "".join(getattr(c, "string", "") or getattr(c, "pattern", "") for c in comps)
    assert rebuilt == pattern


ILLEGAL = [
    "%{name",
    "%{name=",
    "%{name=}",
    "%{name=a",
    "%{name:",
    "%{name:}",  # alias slot opened but empty with no extract
    "%{name:a",
    "%{name:a:b",
    "%{name::",
    "%{name::b",
    "%{name:a:}",
    "%{name::}",
    "%{na.me:a:b}",
    "%{name:a:b:c}",
    "%{name:a:b:c:d}",
]


@pytest.mark.parametrize("pattern", ILLEGAL)
def test_illegal_placeholders(pattern):
    with pytest.raises(GrokPatternError):
        list(grok_split(pattern))


def test_literal_percent_handling():
    # lone trailing %
    comps = list(grok_split("abc%"))
    assert [c.string for c in comps] == ["abc", "%"]
    # % not followed by { swallows the next char into the literal chunk
    comps = list(grok_split("100%% done"))
    assert all(isinstance(c, RegularExpression) for c in comps)
    assert "".join(c.string for c in comps) == "100%% done"
    # escaped percent before a placeholder-looking chunk
    comps = list(grok_split(r"\x25{notapattern} %{name}"))
    assert isinstance(comps[-1], GrokPattern)
