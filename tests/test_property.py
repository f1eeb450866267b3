"""Property-based tests (hypothesis): lexer round-trips, tokenize ∘
detokenize identity, compiler/matcher agreement on randomized inputs."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from grokspark import GrokRegistry, grok_split
from grokspark.pattern_parser import GrokPattern, GrokPatternError, RegularExpression

NAME = st.text(string.ascii_letters + string.digits + "_", min_size=1, max_size=12)
ALIAS = st.text(string.ascii_letters + string.digits + "_-[].", min_size=1, max_size=12)
DEFN = st.text(
    st.characters(blacklist_characters="{}", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=20,
)


@st.composite
def placeholder(draw) -> str:
    name = draw(NAME)
    alias = draw(st.one_of(st.none(), ALIAS))
    extract = draw(st.one_of(st.none(), ALIAS))
    defn = draw(st.one_of(st.none(), DEFN))
    s = "%{" + name
    if alias is not None or extract is not None:
        s += ":" + (alias or "")
    if extract is not None:
        s += ":" + extract
    if defn is not None:
        s += "=" + defn
    s += "}"
    # the grammar disallows an opened-but-empty alias slot with no extract
    if alias is None and extract is None and defn is None:
        return "%{" + name + "}"
    return s


LITERAL = st.text(
    st.characters(blacklist_characters="%{}", blacklist_categories=("Cs",)),
    max_size=15,
)


@given(st.lists(st.one_of(LITERAL, placeholder()), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_lexer_roundtrip_reconstructs_input(parts):
    """Any interleaving of safe literals and legal placeholders lexes
    without error and the component spans reconstruct the input."""
    s = "".join(parts)
    try:
        comps = list(grok_split(s))
    except GrokPatternError:
        # an alias slot opened empty (alias drawn as None, extract absent,
        # defn present like "%{n:=d}") is legal-by-construction above, so
        # any error would be a bug — but literals can end with '%' and glue
        # to a following '{', changing the parse. Only allow errors then.
        assert "%" in s
        return
    rebuilt = "".join(
        c.string if isinstance(c, RegularExpression) else c.pattern for c in comps
    )
    assert rebuilt == s
    for c in comps:
        assert s[c.start : c.end] == (
            c.string if isinstance(c, RegularExpression) else c.pattern
        )


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_tokenize_detokenize_identity(text):
    """Byte-level vocab: decode(encode(x)) == x for any unicode text."""
    tokens = list(text.encode("utf-8"))
    assert all(0 <= t <= 255 for t in tokens)
    assert bytes(tokens).decode("utf-8") == text


@given(st.text(string.printable, max_size=60))
@settings(max_examples=200, deadline=None)
def test_greedydata_always_matches(s):
    """%{GREEDYDATA:msg} matches any input with msg == everything up to
    the first \\n (reference GREEDYDATA = .*; PCRE-class `.` excludes
    only \\n — \\r IS matched, hypothesis caught that)."""
    p = GrokRegistry.with_default_patterns().compile("%{GREEDYDATA:msg}")
    m = p.match_against(s)
    assert m is not None
    assert m["msg"] == s.split("\n", 1)[0]


@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_word_capture_agrees_with_split(words):
    """%{WORD:w} captures exactly the first whitespace token."""
    s = " ".join(words)
    p = GrokRegistry.with_default_patterns().compile("%{WORD:w}", with_alias_only=True)
    assert p.match_against(s) == {"w": words[0]}


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.binary(min_size=0, max_size=16),
)
@settings(max_examples=150, deadline=None)
def test_png_encode_decode_identity(width, height, seed):
    """Pure-stdlib PNG codec: decode(encode(px)) == px for arbitrary
    RGB content, and the integer luma matches the direct formula."""
    import hashlib

    from grokspark.operators.png import decode_png, encode_png, png_features

    need = width * height * 3
    stream = bytearray()
    counter = 0
    while len(stream) < need:
        stream += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    rgb = bytes(stream[:need])
    data = encode_png(width, height, rgb)
    img = decode_png(data)
    assert (img["width"], img["height"], img["channels"]) == (width, height, 3)
    assert img["pixels"] == rgb
    feats = png_features(data)
    want = 299 * sum(rgb[0::3]) + 587 * sum(rgb[1::3]) + 114 * sum(rgb[2::3])
    assert feats["luma_milli"] == want


@given(st.text(max_size=80), st.text(max_size=80))
@settings(max_examples=100, deadline=None)
def test_fake_png_deterministic_and_decodable(key, text):
    from grokspark.operators.png import fake_png, png_features

    p1, p2 = fake_png(key, text), fake_png(key, text)
    assert p1 == p2
    feats = png_features(p1)
    assert 4 <= feats["width"] <= 11 and 4 <= feats["height"] <= 11
    assert 0.0 <= feats["mean_luma"] <= 255.0


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_simhash_batch_matches_scalar_reference(texts):
    """The vectorized SimHash kernel (numpy FNV fold + segmented votes)
    must equal the scalar pure-Python reference bit-for-bit on
    arbitrary unicode, including empty docs and whitespace-only text."""
    import numpy as np

    from grokspark.operators.dedup import _fnv1a, _fnv1a_batch, simhash_batch, simhash_py

    got = simhash_batch(texts)
    exp = np.array([simhash_py(t) for t in texts], dtype=np.int64)
    assert (got == exp).all()

    words = [w.encode("utf-8") for t in texts for w in t.lower().split()]
    if words:
        hb = _fnv1a_batch(words)
        he = np.array([_fnv1a(w.decode("utf-8")) for w in words], dtype=np.uint64)
        assert (hb == he).all()
