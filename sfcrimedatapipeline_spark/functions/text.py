"""Text primitives: tokenization, n-grams, normalization, stopwords.

Each primitive exists twice — as a Column expression and as a DuckDB SQL
fragment built from the SAME Python constants — so the text-analysis
operators stay oracle-checkable. Everything is built-in Catalyst
expressions (split/filter/transform/aggregate); no UDFs in this layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Per-language stopword lists (public common-word lists; the lang-id
#: heuristic scores token overlap). Keys sorted — the tie-break order.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit", "auf"],
    "en": ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on"],
    "es": ["el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "dans", "pour", "sur"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人", "他", "中"],
}

_WS = r"\s+"


# --- Spark side ------------------------------------------------------------

def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), _WS), lambda t: t != "")


def ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-grams (space-joined) from a token array; empty if < n tokens."""
    count = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(0)))
    return F.when(count >= 1, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def normalized(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace,
    trimmed."""
    return F.trim(F.regexp_replace(F.lower(text), _WS, " "))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens (with multiplicity) found in ``lang``'s list."""
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))


def ids_to_str(col: Column) -> Column:
    """Canonical space-joined string of an integer-array column — the
    DRIVER-FACING serialization of token-id payloads. The driver's
    correctness harness sorts result frames with pandas
    ``sort_values``, which cannot hash list cells (round-10 VERDICT:
    ``docs_span_corruption`` crashed the driver with ``TypeError:
    unhashable type: 'list'``), so no gated query may return a raw
    array column. Internal operator APIs keep the array form; plans
    apply this at the boundary. NULL and empty arrays both serialize
    to ``''`` (concat_ws skips NULL args), matching the SQL twin."""
    return F.concat_ws(" ", col.cast("array<string>"))


def sql_ids_to_str(expr: str) -> str:
    """DuckDB twin of :func:`ids_to_str` — same separator, same
    NULL/empty collapse to ``''``."""
    return f"coalesce(array_to_string({expr}, ' '), '')"


#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
#: marks. Explicit ASCII classes — identical semantics in Java regex
#: (Spark) and RE2 (DuckDB), unlike \p{L}-style classes.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    """Sub-word-ish tokens per the shared BPE_PATTERN."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


# --- DuckDB side (fragments referencing a column named `text`) -------------

def sql_tokens(col: str = "text") -> str:
    """Tokenizer fragment with the source column parameterized —
    consumers that tokenize a qualified/aliased column (``d.text``,
    ``chunk_text``) use this instead of string-replacing ``SQL_TOKENS``
    (which would silently corrupt if the fragment ever gained another
    occurrence of the substring 'text')."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '{_WS}'),"
        " t -> t <> '')"
    )


SQL_TOKENS = sql_tokens()
SQL_NORMALIZED = f"trim(regexp_replace(lower(text), '{_WS}', ' ', 'g'))"


def sql_ngrams(toks_col: str, n: int = 3) -> str:
    """N-gram list from an already-computed token-array column (use in a
    CTE: ``WITH tok AS (SELECT ..., <SQL_TOKENS> AS t ...)``)."""
    parts = " || ' ' || ".join(f"{toks_col}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks_col}) >= {n} THEN "
        f"[{parts} for i in generate_series(1, len({toks_col}) - {n - 1})] "
        f"ELSE [] END"
    )


def sql_stopword_hits(toks_expr: str, lang: str) -> str:
    wordlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, t -> list_contains([{wordlist}], t)))"


SQL_BPE_TOKENS = f"regexp_extract_all(text, '{BPE_PATTERN}')"


#: CJK character class (unified ideographs + kana + hangul) — the same
#: literal ranges as textstats.SCRIPT_RANGES["cjk"], shared across the
#: Java-regex and RE2 engines
CJK_CLASS = "一-鿿぀-ヿ가-힯"


def tokens_multilingual(text: Column) -> Column:
    """Script-aware tokens: whitespace words for space-delimited
    scripts PLUS character BIGRAMS inside CJK runs (CJK text carries no
    spaces, so whitespace tokenization would yield one giant token per
    sentence — bigrams are the standard lexical unit for CJK search
    and dedup). A lone CJK character between boundaries still emits
    itself as a unigram so no content silently vanishes.

    Mechanism, pure Catalyst: pad every CJK codepoint with spaces
    (isolating each run), whitespace-split, then per token either keep
    it (non-CJK) or... — padding isolates every CJK char as ITS OWN
    token, so bigrams are rebuilt by pairing consecutive CJK tokens via
    a sequence transform over the token array. Deterministic, shared
    verbatim with the SQL twin.
    """
    # isolate each CJK codepoint, then split on whitespace
    padded = F.regexp_replace(text, f"([{CJK_CLASS}])", " $1 ")
    toks = F.filter(F.split(F.lower(padded), _WS), lambda t: t != "")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    is_cjk = lambda t: t.rlike(f"^[{CJK_CLASS}]$")  # noqa: E731
    nxt = lambda i: F.element_at(toks, (i + 1).cast("int"))  # noqa: E731
    cur = lambda i: F.element_at(toks, i.cast("int"))  # noqa: E731
    per_pos = F.transform(
        idx,
        lambda i: F.when(n == 0, F.array().cast("array<string>"))
        .when(
            # CJK char followed by a CJK char → bigram
            is_cjk(cur(i)) & (i < n) & F.coalesce(is_cjk(nxt(i)), F.lit(False)),
            F.array(F.concat(cur(i), nxt(i))),
        )
        .when(
            # CJK char NOT followed by CJK: emit as unigram ONLY if it
            # also has no CJK predecessor (else the bigram covered it)
            is_cjk(cur(i))
            & ~F.coalesce(
                F.when(i > 1, is_cjk(F.element_at(toks, (i - 1).cast("int")))),
                F.lit(False),
            ),
            F.array(cur(i)),
        )
        .when(~is_cjk(cur(i)), F.array(cur(i)))
        .otherwise(F.array().cast("array<string>")),
    )
    return F.flatten(per_pos)
