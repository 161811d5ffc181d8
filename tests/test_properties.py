"""Property-based tests (hypothesis) — randomized invariants in the
reference's sampling style (tests/test_rdfwrappers.py uses random.choice)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_i2b2_converter_spark.config import TOKEN_SPLIT_REGEX
from rdf_i2b2_converter_spark.functions.text import extract_text_py
from rdf_i2b2_converter_spark.operators.mentions import TokenAhoCorasick
from rdf_i2b2_converter_spark.plans.data_pipeline import reduce_basecode

_token = st.text(alphabet="abcdefgh0123", min_size=1, max_size=4)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_extract_text_normal_form(html):
    """For ANY bytes: output has no leading/trailing space, no space runs,
    and is deterministic."""
    out = extract_text_py(html)
    assert out == out.strip()
    assert "  " not in out and "\n" not in out and "\t" not in out
    assert out == extract_text_py(html)


@settings(max_examples=100, deadline=None)
@given(
    toks=st.lists(_token, min_size=0, max_size=60),
    pats=st.lists(st.lists(_token, min_size=1, max_size=3), min_size=1, max_size=8),
)
def test_ac_equals_bruteforce(toks, pats):
    """Aho-Corasick over token streams == brute-force sliding-window count,
    for arbitrary token streams and pattern sets (incl. overlapping and
    nested patterns)."""
    surfaces = sorted({" ".join(p) for p in pats})
    ac = TokenAhoCorasick(surfaces)
    got: dict[str, int] = {}
    for s, _b, _e in ac.find(toks):
        got[s] = got.get(s, 0) + 1
    want: dict[str, int] = {}
    for s in surfaces:
        p = s.split(" ")
        n = sum(1 for i in range(len(toks) - len(p) + 1) if toks[i : i + len(p)] == p)
        if n:
            want[s] = n
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcxyz:/.#", min_size=1, max_size=20), min_size=1, max_size=6))
def test_basecode_chain_injective_on_paths(path):
    """Different URI paths yield different chained codes; chaining is
    associative-free (order-sensitive) — the join-key uniqueness contract
    (tests/test_i2b2wrappers.py:133-140 analog)."""
    code = ""
    for uri in path:
        code = reduce_basecode(uri, code)
    assert len(code) == 50 and re.fullmatch("[0-9a-f]{50}", code)
    # a permuted path (when it differs) gives a different code
    if len(path) >= 2 and path[0] != path[-1]:
        other = ""
        for uri in reversed(path):
            other = reduce_basecode(uri, other)
        assert other != code


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_contract_matches_regex(text):
    """The Python tokenizer used in the matcher equals the declared
    TOKEN_SPLIT_REGEX contract (shared with SQL oracles)."""
    sp = re.compile(TOKEN_SPLIT_REGEX)
    toks = [t for t in sp.split(text.lower()) if t]
    for t in toks:
        assert not sp.search(t)  # tokens contain no separator chars
