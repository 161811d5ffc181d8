"""Text extraction and analysis.

The extraction path re-realizes the reference's literal-value extraction
(src/data_loader.py:142-170) for web pages: a *pure function of html bytes*
— the BASELINE per-row invariant is byte-identical extracted text per url,
so the normalization is pinned here (no locale, no library-version drift)
and shared verbatim between the vectorized pandas UDF and the pure-Python
test oracle.

Analysis functions (language-ID, quality score, token count, fingerprint,
shingles) are built-in Column expressions — JVM-side, codegen'd, and
mirrorable 1:1 in the DuckDB oracle SQL.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import TOKEN_SPLIT_REGEX

# ------------------------------------------------------------- extraction

_SCRIPT_RE = re.compile(rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so '&amp;lt;' decodes to '&lt;' not '<'
)


def extract_text_py(html: bytes | None) -> str | None:
    """Pinned, deterministic html-bytes -> text normalization.

    Steps (fixed forever — changing any of them breaks the byte-identity
    contract): drop <script>/<style> blocks, strip tags, decode utf-8 with
    replacement, decode 6 named/numeric entities, collapse whitespace,
    strip. Pure function: no locale, clock, or library-version dependence.
    """
    if html is None:
        return None
    no_script = _SCRIPT_RE.sub(b" ", html)
    no_tags = _TAG_RE.sub(b" ", no_script)
    text = no_tags.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    return _WS_RE.sub(" ", text).strip()


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized Arrow-batched wrapper of :func:`extract_text_py`.

    This is the engine's only html-parsing hot path; at 10^12 documents it
    runs embarrassingly parallel per input split with zero shuffle.
    """
    return html.map(extract_text_py)


# ------------------------------------------------------- token primitives


def tokens(text: Column | str) -> Column:
    """Lowercased alphanumeric tokens; the contract shared with the
    gazetteer matcher and the DuckDB oracle (config.TOKEN_SPLIT_REGEX)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_REGEX), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-token shingles as space-joined strings (for MinHash / Jaccard).

    Implemented as a zip_with chain over k-1 shifted copies of the token
    array, NOT as ``transform(sequence(...), i -> slice(toks, i, k))``:
    an expression referenced *inside* a higher-order-function lambda is
    re-evaluated per array element, which made shingling O(len^2) per row
    (tokenization re-run ~len times). zip_with keeps every tokenization
    outside the lambda — evaluated once per row, still fully codegen'd.

    zip_with pads the shorter side with nulls; null-propagating concat
    turns incomplete trailing shingles into nulls, filtered at the end.
    """
    toks = tokens(text)
    result = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        result = F.zip_with(result, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(result, lambda x: x.isNotNull())


# --------------------------------------------------------- text analysis

#: Per-language stopword lists for the n-gram/stopword language heuristic.
#: Deterministic and tiny — broadcast as literals into the expression.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
}


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _let(value: Column, body) -> Column:
    """HOF let-binding: evaluate ``value`` ONCE and bind it as a lambda
    variable in ``body``. An expression referenced from several branches of
    a when/greatest tree is otherwise re-evaluated per reference (Catalyst
    has no general CSE across codegen branches); wrapping it in a
    single-element transform makes every reference a cheap bound-variable
    read."""
    return F.transform(F.array(value), body)[0]


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hit-counts, 'und' when all
    zero; ties broken by fixed language order (en, de, fr, es).

    Single tokenization pass: the per-language counts fold into ONE
    aggregate over the token array (an array-of-N accumulator), and the
    argmax reads the bound counts via :func:`_let` — the naive
    greatest+when chain re-evaluated tokenization ~24x per row.
    """
    langs = list(STOPWORDS)  # insertion order = tie-break order
    toks = tokens(text)
    # one pass over tokens; membership tests hit only the bound lambda vars
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), len(langs)),
        lambda acc, t: F.transform(
            acc,
            lambda a, i: a
            + F.coalesce(
                *[
                    F.when((i == j) & t.isin(*STOPWORDS[lang]), 1)
                    for j, lang in enumerate(langs)
                ],
                F.lit(0),
            ),
        ),
    )
    lang_lits = F.array(*[F.lit(lang) for lang in langs])
    return _let(
        counts,
        lambda c: F.when(
            F.array_max(c) > 0,
            F.element_at(lang_lits, F.array_position(c, F.array_max(c)).cast("int")),
        ).otherwise(F.lit("und")),
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality in [0,1]: alpha ratio, stopword ratio, length band.

    Same spirit as C4/Gopher text-quality rules; pure arithmetic so the
    DuckDB oracle reproduces it bit-for-bit after round(4).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    alpha_chars = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    all_stop = tuple({w for ws in STOPWORDS.values() for w in ws})
    stop_ratio = F.when(n_tok > 0, _stopword_hits(toks, all_stop) / n_tok).otherwise(F.lit(0.0))
    len_band = (
        F.when((n_tok >= 10) & (n_tok <= 10000), F.lit(1.0))
        .when(n_tok > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    return F.round(alpha_ratio * 0.4 + stop_ratio * 0.3 + len_band * 0.3, 4)


def normalized_text(text: Column | str) -> Column:
    """Canonical text form used for exact-dup hashing: lowercased,
    non-alphanumeric runs -> single space, trimmed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), TOKEN_SPLIT_REGEX, " "))


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text. Exact-dup key."""
    return F.md5(normalized_text(text))


def min_shingle_fingerprint(text: Column | str, k: int = 3) -> Column:
    """Winnowing-style rolling fingerprint: the minimum md5 over the
    document's k-token shingles (a 1-perm MinHash). Near-dup blocking key:
    documents sharing any minimal shingle hash collide."""
    sh = shingles(text, k)
    return F.array_min(F.transform(sh, F.md5))
