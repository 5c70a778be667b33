"""Text-analysis operators for the LLM-data-pipeline surface
(BASELINE.json north star): token counting, quality scoring, language
ID, document fingerprinting.

All pure Catalyst expressions (split/filter/size/md5) — no UDFs, so the
hot path stays inside whole-stage codegen and scales linearly with
partitions; there is no shuffle in any of these (per-row transforms).
Ratios divide exact integer counts, so double results are bit-identical
across engines (IEEE division is correctly rounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.functions.text import (
    STOPWORDS,
    normalized,
    stopword_hits,
    tokens,
)

#: quality-score thresholds (shared with the SQL oracle builder below)
QUALITY_MIN_TOKENS, QUALITY_MAX_TOKENS = 10, 5000
QUALITY_MIN_MEAN_LEN, QUALITY_MAX_MEAN_LEN = 2.0, 12.0
QUALITY_MIN_STOPWORD_RATIO = 0.01


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char count, mean token length, non-alnum ratio."""
    toks = tokens(F.col(text_col))
    n_toks = F.size(toks)
    total_tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    text_len = F.length(F.col(text_col))
    non_alnum = text_len - F.length(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", "")
    )
    return df.withColumns(
        {
            "n_tokens": n_toks,
            "n_chars_obs": text_len,
            "mean_token_len": F.when(n_toks > 0, total_tok_chars / n_toks).otherwise(
                F.lit(0.0)
            ),
            "non_alnum_ratio": F.when(text_len > 0, non_alnum / text_len).otherwise(
                F.lit(0.0)
            ),
        }
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """0-3 integer quality score from length / token-shape / stopword
    signals (deterministic ints — no float comparisons in the gate)."""
    toks = tokens(F.col(text_col))
    n_toks = F.size(toks)
    en_hits = stopword_hits(toks, "en")
    mean_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / n_toks,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, en_hits / n_toks).otherwise(F.lit(0.0))
    score = (
        n_toks.between(QUALITY_MIN_TOKENS, QUALITY_MAX_TOKENS).cast("int")
        + mean_len.between(QUALITY_MIN_MEAN_LEN, QUALITY_MAX_MEAN_LEN).cast("int")
        + (stop_ratio >= QUALITY_MIN_STOPWORD_RATIO).cast("int")
    )
    return df.withColumns(
        {"stopword_ratio": stop_ratio, "quality_score": score}
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    toks = tokens(F.col(text_col))
    return {lang: stopword_hits(toks, lang) for lang in sorted(STOPWORDS)}


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits,
    alphabetical tie-break, 'und' when nothing matches.

    Staged selects, mirroring the oracle's CTEs: tokenize ONCE, bind the
    per-language hit counts to real columns, then argmax over the bound
    ints. Inlining instead would nest the tokenizer (a regex split) and
    five filter-HOFs — none of which codegen — into every arm of the
    greatest/when tree, and Catalyst does not CSE duplicated lambda
    subtrees: each output row would re-tokenize tens of times in the
    interpreted evaluator.
    """
    toked = df.withColumn("__toks", tokens(F.col(text_col)))
    langs = sorted(STOPWORDS)
    scored = toked.withColumns(
        {f"__s_{lang}": stopword_hits(F.col("__toks"), lang) for lang in langs}
    )
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in langs])
    pred: Column = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(F.col(f"__s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return scored.withColumn("lang_pred", pred).drop(
        "__toks", *[f"__s_{lang}" for lang in langs]
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return df.withColumn("fingerprint", F.md5(normalized(F.col(text_col))))


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-word and BPE-ish sub-word token counts + their exact
    ratio (sub-word fertility — the usual LLM-cost estimator)."""
    from sfcrimedatapipeline_spark.functions.text import bpe_tokens

    n_words = F.size(tokens(F.col(text_col)))
    n_bpe = F.size(bpe_tokens(F.col(text_col)))
    return df.withColumns(
        {
            "n_word_tokens": n_words,
            "n_bpe_tokens": n_bpe,
            "bpe_per_word": F.when(n_words > 0, n_bpe / n_words).otherwise(F.lit(0.0)),
        }
    )


#: PII patterns — explicit ASCII classes only, so Java regex (Spark)
#: and RE2 (DuckDB) agree; scrub order matters (URLs may contain
#: email-shaped substrings, so URLs go first).
PII_URL_RE = r"https?://[^ \t\n]+"
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"
PII_ORDER = (
    (PII_URL_RE, "<URL>"),
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def with_pii_scrubbed(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact URLs, emails, and international-format phone numbers with
    typed placeholders + per-class match counts — the standard
    pre-training scrub pass. Pure regexp_replace/regexp_count chain: no
    UDF, no shuffle, linear per row. Each count is taken on the text as
    it stood BEFORE that class's own scrub but AFTER the earlier ones
    (an email inside a URL counts as URL, not email) — the oracle
    mirrors the same staging."""
    stage = F.col(text_col)
    counts = {}
    for pat, token in PII_ORDER:
        counts[token] = F.regexp_count(stage, F.lit(pat)).cast("int")
        stage = F.regexp_replace(stage, pat, token)
    return df.withColumns(
        {
            "n_urls": counts["<URL>"],
            "n_emails": counts["<EMAIL>"],
            "n_phones": counts["<PHONE>"],
            "scrubbed": stage,
        }
    )


#: winnowing defaults: k-char grams, window of w consecutive gram hashes
WINNOW_K, WINNOW_W = 8, 4


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every k-char gram of the normalized text, take the minimum in
    each window of w consecutive gram hashes, emit the distinct minima.

    The gram hash is the portable md5 formula (oracle-parity) rather
    than a true rolling Rabin–Karp — positions are independent, so the
    whole thing stays a per-row array expression: no shuffle, no UDF,
    parallel across documents.
    """
    from sfcrimedatapipeline_spark.functions.hashing import portable_hash64

    # STAGED selects, one alias per stage: an expression referenced
    # inside a higher-order-function lambda is re-evaluated PER ARRAY
    # ELEMENT, so `normalized(text)` (a regex) or the gram-hash array
    # must be bound to a column first. Multi-use non-cheap aliases are
    # exempt from CollapseProject, so the boundary holds.
    normed = df.select(F.col(id_col), normalized(F.col(text_col)).alias("__norm"))

    n_grams = F.length("__norm") - (k - 1)
    # guard BEFORE building sequence(1, n): Spark's sequence DESCENDS
    # when start > stop, so an unguarded sequence(1, 0) yields [1, 0]
    gram_hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: portable_hash64(F.col("__norm").substr(i, F.lit(k)), 0),
        ),
    ).otherwise(F.array().cast("array<long>"))
    hashed = normed.select(F.col(id_col), gram_hashes.alias("__hs"))

    n_windows = F.size("__hs") - (w - 1)
    minima = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(F.col("__hs"), j, w)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # explode_outer + isNotNull (not plain explode): a non-outer
    # Generate makes Catalyst infer size(minima) > 0 and push it to the
    # scan with the whole gram-hash tree inlined, serializing the
    # hashing into the scan task (see dedup.ngram_jaccard_pairs)
    return (
        hashed.select(
            F.col(id_col),
            F.explode_outer(F.array_distinct(minima)).alias("fingerprint"),
        )
        .filter(F.col("fingerprint").isNotNull())
    )


def build_vocabulary(
    df: DataFrame, vocab_size: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Frequency-ranked vocabulary: the top ``vocab_size`` tokens with
    dense ids (0 = most frequent; ties broken by token text) plus
    corpus frequency — the tokenizer-training primitive.

    explode → map-side-combined groupBy (shuffle bounded by distinct
    token count) → one top-k window at vocabulary cardinality.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode_outer(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return (
        counts.withColumn("token_id", (F.row_number().over(w) - 1).cast("int"))
        .filter(F.col("token_id") < vocab_size)
        .select("token_id", "token", F.col("freq").cast("long").alias("freq"))
    )


def with_oov_rate(
    df: DataFrame, vocab: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a vocabulary frame:
    (doc, n_tokens, n_oov, oov_rate) — the coverage check run before
    committing to a tokenizer. Token occurrences (not distinct types)
    are counted, matching how a tokenizer meets text.

    explode → broadcast LEFT join against the vocabulary (vocab is
    top-k-bounded, always broadcastable) → per-doc counts. Docs with
    zero tokens report rate 0.0.
    """
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("token")
    )
    joined = toks.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("__in_v"))),
        "token",
        "left",
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("token").cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("token").isNotNull() & F.col("__in_v").isNull(), 1)
                .otherwise(0)
            ).cast("long").alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("oov_rate"),
        )
    )
