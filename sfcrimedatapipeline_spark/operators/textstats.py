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

#: Gopher-gate thresholds (Rae et al. 2021 §A1.1, adapted to the test
#: corpus's space-delimited word soup — no lines or punctuation exist
#: to filter on). Fractions are RATIONALS (num, den) so every rule is
#: an exact integer cross-multiplication; shared with the SQL oracle.
GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS = 15, 90
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3, 10  # integer char bounds
GOPHER_MAX_DUP_FRAC = (13, 20)  # duplicate-token fraction ≤ 0.65
GOPHER_MAX_TOP_FRAC = (1, 8)  # top-unigram fraction ≤ 0.125
GOPHER_MIN_STOPWORDS = 1  # ≥1 hit from the English list


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


def collapse_token_runs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition scrub (the Dolma/C4 intra-doc pass
    the cross-doc dedup family cannot do): collapse every run of
    CONSECUTIVE identical tokens to a single occurrence ("the the
    the" → "the") and rebuild the text in order. Emits ``df`` +
    ``n_tokens`` (before) / ``n_kept`` / ``clean_text``.

    Pure higher-order array expressions — the positional filter keeps
    token i iff it differs from token i-1 (CaseWhen guards the i=0
    probe lazily, so ``element_at`` never sees index 0) — one
    codegen'd projection, no shuffle, no UDF, linear per row; at
    100 TB this is a free rider on any scan that already reads the
    text column."""
    toks = tokens(F.col(text_col))
    d = df.withColumn("__tk", toks)
    kept = F.filter(
        F.col("__tk"),
        lambda t, i: F.when(i == 0, F.lit(True)).otherwise(
            t != F.element_at(F.col("__tk"), i)
        ),
    )
    return (
        d.withColumn("n_tokens", F.size("__tk").cast("long"))
        .withColumn("__kept", kept)
        .withColumn("n_kept", F.size("__kept").cast("long"))
        .withColumn("clean_text", F.concat_ws(" ", F.col("__kept")))
        .drop("__tk", "__kept")
    )


def has_blocked_word(toks: Column, words: list[str]) -> Column:
    """True iff any token (exact, lowercased) is in ``words`` — the
    C4 "bad-word list" document gate (the public pipeline drops any
    page with one listed word; the list here is a neutral stand-in).
    ``arrays_overlap`` against a literal array — broadcast by
    construction, codegen'd, no shuffle."""
    return F.arrays_overlap(toks, F.array(*[F.lit(w) for w in words]))


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
    token count) → orderBy(...).limit(vocab_size), which Spark plans
    as TakeOrderedAndProject (per-partition top-k + a driver merge of
    vocab_size·partitions rows — never a global sort, never a
    partition-less window over the distinct-token frame, whose
    cardinality at web scale is billions) → the id-assigning
    row_number runs on the LIMITED frame, bounded by the constant
    vocab_size.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode_outer(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(vocab_size)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return top.select(
        (F.row_number().over(w) - 1).cast("int").alias("token_id"),
        "token",
        F.col("freq").cast("long").alias("freq"),
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


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals — the Gopher-rules quality
    filter family (Rae et al. 2021 §A1.1: duplicate-n-gram and
    top-n-gram fractions flag boilerplate/spam before training).

    Per document: token/type counts, duplicate-token fraction
    (1 − types/tokens), top-unigram token fraction, bigram counts and
    the analogous duplicate/top fractions. Every fraction is ONE
    division of exact integers, so doubles are bit-identical across
    engines; documents with no tokens keep a row with zeroed stats (a
    filter must see empty docs, not silently drop them).

    Scale shape: two explode → groupBy(id, gram) aggregations (map-side
    combined partials) re-aggregated per id, then co-keyed LEFT joins
    back to the doc spine — never a per-doc O(n²) array scan, so cost
    per token is flat no matter how long the document. The bigram array
    is built row-side (linear Catalyst transform), not via a windowed
    self-join.
    """
    from sfcrimedatapipeline_spark.functions.text import ngrams

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__toks"))

    def _gram_agg(grams: DataFrame, prefix: str) -> DataFrame:
        return (
            grams.groupBy(id_col, "__g")
            .agg(F.count("*").alias("__c"))
            .groupBy(id_col)
            .agg(
                F.sum("__c").cast("long").alias(f"{prefix}_total"),
                F.count("*").cast("long").alias(f"{prefix}_types"),
                F.max("__c").cast("long").alias(f"{prefix}_top"),
            )
        )

    uni = _gram_agg(base.select(id_col, F.explode("__toks").alias("__g")), "uni")
    bi = _gram_agg(
        base.select(
            id_col, F.explode(ngrams(F.col("__toks"), 2)).alias("__g")
        ),
        "bi",
    )

    def _frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    n_tok = F.coalesce(F.col("uni_total"), F.lit(0)).alias("n_tokens")
    n_bi = F.coalesce(F.col("bi_total"), F.lit(0)).alias("n_bigrams")
    return (
        df.select(id_col)
        .join(uni, id_col, "left")
        .join(bi, id_col, "left")
        .select(
            id_col,
            n_tok,
            F.coalesce(F.col("uni_types"), F.lit(0)).alias("n_types"),
            _frac(
                F.col("uni_total") - F.col("uni_types"), F.col("uni_total")
            ).alias("dup_token_frac"),
            _frac(F.col("uni_top"), F.col("uni_total")).alias("top_unigram_frac"),
            n_bi,
            _frac(F.col("bi_total") - F.col("bi_types"), F.col("bi_total")).alias(
                "dup_bigram_frac"
            ),
            _frac(F.col("bi_top"), F.col("bi_total")).alias("top_bigram_frac"),
        )
    )


def gopher_gate(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composed Gopher-style PASS/FAIL curation gate per document —
    the actual keep/drop decision a pretraining pipeline applies,
    where ``repetition_stats``/``with_quality`` expose the raw
    signals. Five rules, every one an exact-integer comparison (the
    fraction thresholds are rationals applied by cross-multiplication,
    so no float ever reaches a boundary):

      r_tokens    token count in [GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS]
      r_wordlen   mean token length in [GOPHER_MIN_MEAN_LEN,
                  GOPHER_MAX_MEAN_LEN]  (chars vs len·tokens, ints)
      r_dup       duplicate-token fraction ≤ GOPHER_MAX_DUP_FRAC
      r_top       top-unigram fraction ≤ GOPHER_MAX_TOP_FRAC
      r_stopword  ≥ GOPHER_MIN_STOPWORDS hits from the English list

    Zero-token documents fail every rule by construction (a filter
    must reject empties, not skip them). Output: one row per document
    with the five booleans and ``pass_all``.

    Scale shape: one explode → groupBy(id, token) map-side-combined
    count, re-aggregated per id (total/types/top/chars/stopword hits in
    ONE pass), LEFT-joined back to the id spine — per-token cost flat
    in document length, no per-doc array rescans, no UDFs.
    """
    from sfcrimedatapipeline_spark.functions.text import STOPWORDS

    toks = tokens(F.col(text_col))
    grams = df.select(F.col(id_col), F.explode(toks).alias("__t"))
    agg = (
        grams.groupBy(id_col, "__t")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("__total"),
            F.count("*").cast("long").alias("__types"),
            F.max("__c").cast("long").alias("__top"),
            F.sum(F.col("__c") * F.length("__t")).cast("long").alias("__chars"),
            F.sum(
                F.when(
                    F.col("__t").isin(STOPWORDS["en"]), F.col("__c")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("__stop"),
        )
    )
    total = F.coalesce(F.col("__total"), F.lit(0).cast("long"))
    types_ = F.coalesce(F.col("__types"), F.lit(0).cast("long"))
    top = F.coalesce(F.col("__top"), F.lit(0).cast("long"))
    chars = F.coalesce(F.col("__chars"), F.lit(0).cast("long"))
    stop = F.coalesce(F.col("__stop"), F.lit(0).cast("long"))
    dup_n, dup_d = GOPHER_MAX_DUP_FRAC
    top_n, top_d = GOPHER_MAX_TOP_FRAC
    rules = {
        "r_tokens": total.between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS),
        "r_wordlen": (total > 0)
        & (chars >= F.lit(GOPHER_MIN_MEAN_LEN) * total)
        & (chars <= F.lit(GOPHER_MAX_MEAN_LEN) * total),
        "r_dup": (total > 0)
        & ((total - types_) * F.lit(dup_d) <= F.lit(dup_n) * total),
        "r_top": (total > 0) & (top * F.lit(top_d) <= F.lit(top_n) * total),
        "r_stopword": stop >= GOPHER_MIN_STOPWORDS,
    }
    out = df.select(id_col).join(agg, id_col, "left")
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    return out.withColumn(
        "pass_all",
        F.col("r_tokens")
        & F.col("r_wordlen")
        & F.col("r_dup")
        & F.col("r_top")
        & F.col("r_stopword"),
    ).drop("__total", "__types", "__top", "__chars", "__stop")


#: inverse-probability quantization scale for unigram_lm_score: one
#: part per 10^12 keeps q_t exact in a BIGINT for any corpus term count
#: while bounding Σ count·q_t below 2^63 for documents up to ~9M tokens
LM_SCALE = 10**12


def unigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained unigram-LM rarity score per document — the
    model-free stand-in for perplexity filtering in training-data
    curation (CCNet-style: score each document against a reference LM,
    drop the tails).

    The LM is the corpus itself: p(t) = c_t/N over whitespace tokens.
    The score is the arithmetic-mean inverse token probability,
    mean_t N/c_t, with 1/c_t quantized to exact integers BEFORE any
    summation: q_t = LM_SCALE div c_t, score = N · Σ count_doc(t)·q_t
    / (LM_SCALE · n_doc_tokens). A true ln-perplexity has the same
    dataflow (doc term counts → corpus-LM join → weighted sum) but sums
    doubles whose order — and libm's last ulp — differs across engines;
    here every intermediate is an exact BIGINT and the final
    multiply/divides are a fixed sequence of correctly-rounded IEEE
    ops, so the gate hash is stable. High = rare vocabulary, low =
    boilerplate-common.

    Scale shape: explode → groupBy(id, token) with map-side combine;
    the LM frame is a groupBy(token) whose size is the vocabulary, not
    the corpus; N is a 1-row broadcast; the tf↔LM join shuffles on
    token (both sides pre-aggregated); final groupBy(id).
    """
    toks = tokens(F.col(text_col))
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__c"))
    )
    lm = tf.groupBy("__t").agg(F.sum("__c").alias("__ct"))
    n_total = lm.agg(F.sum("__ct").cast("long").alias("__N"))
    scored = (
        tf.join(lm, "__t")
        .select(
            id_col,
            F.col("__c"),
            F.expr(f"{LM_SCALE}L div __ct").alias("__q"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.sum(F.col("__c") * F.col("__q")).cast("long").alias("__sq"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            id_col,
            "n_tokens",
            (
                F.col("__N").cast("double")
                * F.col("__sq").cast("double")
                / F.lit(float(LM_SCALE))
                / F.col("n_tokens")
            ).alias("rarity"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce(F.col("rarity"), F.lit(0.0)).alias("rarity"),
        )
    )


#: smaller than LM_SCALE because the bigram quantum carries the PREFIX
#: count as a multiplier: q = (c_prefix·SCALE) div c_bigram peaks at
#: c_prefix·SCALE when the bigram is a hapax — 10⁹ keeps q and the
#: per-doc Σc·q inside BIGINT up to ~10⁹-token corpora (switch the two
#: sums to DECIMAL(38,0) beyond that; the formula is unchanged).
BIGRAM_LM_SCALE = 10**9


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained bigram-LM surprisal score per document — the
    transition-aware companion to :func:`unigram_lm_score` (CCNet-style
    perplexity filtering distinguishes shuffled-word salad from fluent
    text only with context; a unigram LM scores both identically).

    The LM is the corpus itself: p(b|a) = c_ab / c_a•, where c_a• sums
    c_ab over the continuations of prefix ``a`` (so rows and columns
    come from ONE bigram-count frame). The score is the arithmetic-mean
    inverse conditional probability, mean over the doc's bigrams of
    c_a•/c_ab — high = improbable transitions. Same exactness recipe as
    the unigram score: the quantum q_ab = (c_a•·BIGRAM_LM_SCALE) div
    c_ab is an exact BIGINT, per-doc sums are exact BIGINTs, and the
    final divides are a fixed IEEE sequence — bit-stable, shared
    verbatim with the oracle. Docs with <2 tokens score 0.0.

    Scale shape: bigram explode → groupBy(id, bigram) map-side
    combined; the LM frame is groupBy(bigram) at bigram-vocabulary
    cardinality; prefix totals are a second vocabulary-sized aggregate;
    the tf↔LM join shuffles on the bigram key (both sides
    pre-aggregated); final groupBy(id).
    """
    from sfcrimedatapipeline_spark.functions.text import ngrams, tokens

    bgs = ngrams(tokens(F.col(text_col)), 2)
    tf = (
        df.select(F.col(id_col), F.explode(bgs).alias("__bg"))
        .groupBy(id_col, "__bg")
        .agg(F.count("*").alias("__c"))
    )
    lm = tf.groupBy("__bg").agg(F.sum("__c").cast("long").alias("__cb"))
    pref = lm.groupBy(
        F.split(F.col("__bg"), " ").getItem(0).alias("__a")
    ).agg(F.sum("__cb").cast("long").alias("__ca"))
    lm_q = lm.join(
        pref, F.split(F.col("__bg"), " ").getItem(0) == F.col("__a")
    ).select(
        "__bg",
        F.expr(f"(__ca * {BIGRAM_LM_SCALE}L) div __cb").alias("__q"),
    )
    scored = (
        tf.join(lm_q, "__bg")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_bigrams"),
            F.sum(F.col("__c") * F.col("__q")).cast("long").alias("__sq"),
        )
        .select(
            id_col,
            "n_bigrams",
            (
                F.col("__sq").cast("double")
                / F.lit(float(BIGRAM_LM_SCALE))
                / F.col("n_bigrams").cast("double")
            ).alias("surprisal"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("surprisal"), F.lit(0.0)).alias("surprisal"),
        )
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Distributed byte-pair-encoding merge training (Sennrich et al.
    2016) — tokenizer-vocabulary induction, the step upstream of every
    token-counting/packing operator here.

    Trains on the WORD-FREQUENCY table, not raw documents: one corpus
    scan builds (word, freq) — after that every round's cost is bounded
    by vocabulary size, not corpus size (the standard trick that makes
    BPE training feasible at 100 TB). Each round: (a) one map-side-
    combined shuffle summing adjacent-symbol-pair frequencies, (b) a
    1-row argmax fetch — highest count, lexicographic (left, right)
    tie-break; index metadata, never data, (c) one Arrow ``mapInPandas``
    pass rewriting the vocab's symbol sequences (left-to-right,
    non-overlapping — the reference semantics), with lineage truncated
    per round (reliable checkpoint when ``checkpoint_dir`` is given).

    Fully deterministic — exact integer counts and a total-order
    tie-break — so the parity test pins the merge table EXACTLY against
    a pure-Python reference; the driver gate is rows-only because ~10
    iterative argmaxes are not one-SQL-expressible. Stops early when no
    pair repeats (max count < 2).

    Returns ``[(rank, left, right, merged, pair_count), ...]``.
    """
    from sfcrimedatapipeline_spark.functions.caching import truncate_lineage
    from sfcrimedatapipeline_spark.functions.text import tokens

    syms = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .select("freq", F.split(F.col("w"), "").alias("syms"))
    )
    syms = truncate_lineage(syms, checkpoint_dir)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", (i + 1).cast("int")).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        best = (
            syms.select("freq", F.explode(pair_structs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < 2:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, a + b, cnt))

        def apply_merge(batches: Iterator[pd.DataFrame], a=a, b=b):
            import pandas as pd

            for pdf in batches:
                rewritten = []
                for s in pdf["syms"]:
                    s = list(s)
                    out, i = [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(s[i])
                            i += 1
                    rewritten.append(out)
                yield pd.DataFrame({"freq": pdf["freq"], "syms": rewritten})

        syms = syms.mapInPandas(apply_merge, "freq long, syms array<string>")
        # lazy: the next round's argmax action materializes the
        # checkpoint — one Spark action per merge round, not two
        syms = truncate_lineage(syms, checkpoint_dir)

    return merges


def train_bpe_local(
    docs: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    max_words: int | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Production-vocab BPE trainer: ONE distributed scan builds the
    (word, freq) table, the merge loop runs DRIVER-LOCALLY over it.

    :func:`train_bpe` is exact but pays one shuffle + one driver argmax
    PER MERGE — fine for a demo vocab, hopeless for the 32k-merge
    production case (32k sequential Spark rounds). The observation that
    fixes it: after the first aggregation every round only re-derives
    pair counts from the WORD-FREQUENCY table, whose size is the
    distinct vocabulary — millions of rows at 100 TB, not billions —
    and that table fits the driver. So: aggregate distributed once
    (``max_words`` caps the collect at the top-frequency vocabulary,
    tie-broken ``(freq DESC, word ASC)`` for determinism), then train
    with the classic incremental algorithm — per-pair inverted index,
    contributions subtracted/re-added only for words containing the
    merged pair, lazy max-heap keyed ``(-count, left, right)`` so the
    argmax matches :func:`train_bpe`'s exact
    ``(count DESC, left ASC, right ASC)`` tie-break (UTF-8 byte order
    == code-point order, so Python and Spark string comparison agree).

    Identical output contract to :func:`train_bpe` (same merge table,
    same early stop when no pair repeats); pytest pins equality against
    both the distributed trainer and the pure-Python reference, and
    runs 1000 merges in seconds. Feed the result to
    :func:`bpe_segment_counts` unchanged.
    """
    import heapq
    from collections import Counter, defaultdict

    from sfcrimedatapipeline_spark.functions.text import tokens

    wf = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("w")).limit(max_words)
    rows = wf.collect()  # vocabulary-bounded by construction
    words = [list(r.w) for r in rows]
    freqs = [int(r.freq) for r in rows]

    counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for wi, s in enumerate(words):
        f = freqs[wi]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] += f
            where[p].add(wi)
    heap = [(-c, a, b) for (a, b), c in counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = None
        while heap:
            negc, a, b = heap[0]
            cur = counts.get((a, b), 0)
            if -negc != cur or cur <= 0:
                heapq.heappop(heap)  # stale entry
                continue
            best = (a, b, cur)
            break
        if best is None or best[2] < 2:
            break
        a, b, cnt = best
        merges.append((rank, a, b, a + b, cnt))
        changed: set = set()
        for wi in list(where[(a, b)]):
            s = words[wi]
            f = freqs[wi]
            if not any(
                s[i] == a and s[i + 1] == b for i in range(len(s) - 1)
            ):
                where[(a, b)].discard(wi)  # stale index entry
                continue
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] -= f
                changed.add(p)
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[wi] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                counts[p] += f
                changed.add(p)
                where[p].add(wi)
        for p in changed:
            if counts.get(p, 0) <= 0:
                counts.pop(p, None)
                where.pop(p, None)
            else:
                heapq.heappush(heap, (-counts[p], p[0], p[1]))

    return merges


def _rank_indexed_encoder(pairs_in_rank_order: list[tuple[str, str]]):
    """Rank-indexed greedy BPE segmenter (VERDICT r7 #1): returns a
    cached ``word -> tuple[token str, ...]`` function whose per-word
    cost is independent of the vocabulary size.

    The naive replay — for every word, sweep the ENTIRE ordered merge
    list — costs O(V·|w|) per word; at a production vocab (32k-100k
    merges) that is 10⁴-10⁵ Python-loop passes per word, a 100 TB
    throughput killer even Arrow-batched. This encoder instead
    repeatedly merges the lowest-rank pair PRESENT in the word
    (greedy left-to-right within each pass, the exact training-replay
    scan), so cost is O(|w|·merges-present): a dict lookup per
    adjacent pair, never a vocab sweep. The standard BPE-encode
    equivalence argument makes this replay-identical to the in-rank-
    order sweep for any WELL-FORMED merge table (each merge's operands
    are base characters or products of strictly lower-ranked merges —
    true of :func:`train_bpe`/:func:`train_bpe_local` output by
    construction): a lower-ranked pair can never be CREATED by a
    higher-ranked merge, so applying ranks in ascending order and
    applying the minimum present rank first visit the identical merge
    sequence. Pinned by tests/test_textstats.py replay-identity on a
    ≥10k-merge table.

    Natural text is Zipfian — the same words recur constantly — so the
    per-word result is memoized (bounded LRU: fixed memory per
    executor thread regardless of corpus size).
    """
    from functools import lru_cache

    pair_rank: dict[tuple[str, str], int] = {}
    for rank, p in enumerate(pairs_in_rank_order):
        pair_rank.setdefault(p, rank)  # duplicate pair: smallest rank wins

    @lru_cache(maxsize=65536)
    def encode_word(word: str) -> tuple[str, ...]:
        s = list(word)
        while len(s) > 1:
            best_rank = None
            for i in range(len(s) - 1):
                r = pair_rank.get((s[i], s[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            a, b = pairs_in_rank_order[best_rank]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return tuple(s)

    return encode_word


def bpe_segment_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: segment each document's words by
    replaying the merges (rank-indexed greedy — see
    :func:`_rank_indexed_encoder` — replay-identical to the rank-order
    sweep for trained tables, with per-word cost independent of vocab
    size) and count the resulting subword tokens. One Arrow pass, no
    shuffle; the merge list is a broadcast-closure constant, exactly
    like a production tokenizer's vocab file."""
    ordered = [(left, right) for _, left, right, _, _ in sorted(merges)]

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        encode_word = _rank_indexed_encoder(ordered)

        for pdf in batches:
            counts = [
                sum(len(encode_word(w)) for w in str(t).lower().split())
                if t is not None
                else 0
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "n_bpe_subwords": counts})

    return docs.select(id_col, text_col).mapInPandas(
        segment, f"{id_col} long, n_bpe_subwords long"
    )


def ttr_hapax_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document type-token ratio and hapax-legomena ratio →
    ``(doc_id, n_tokens, n_types, ttr, n_hapax, hapax_ratio)`` — the
    classic vocabulary-richness pair (low TTR = repetitive boilerplate,
    high hapax share = rich/noisy text), complementing the Simpson
    diversity index with the two counts every corpus report quotes.

    Relational shape: explode tokens → per-(doc, token) counts → one
    map-side-combined per-doc aggregate (n_types = distinct tokens,
    n_hapax = tokens with count 1), then a left join back to the doc
    frame so empty documents keep a row with zeros. Exact integers to
    two final divides.
    """
    from sfcrimedatapipeline_spark.functions.text import tokens

    per_tok = (
        df.select(id_col, F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__c"))
    )
    stats = per_tok.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    base = df.select(id_col).join(stats, id_col, "left")
    nt = F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
    return base.select(
        id_col,
        nt.alias("n_tokens"),
        F.coalesce(F.col("n_types"), F.lit(0)).cast("long").alias("n_types"),
        F.when(
            nt > 0,
            F.coalesce(F.col("n_types"), F.lit(0)).cast("double")
            / nt.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ttr"),
        F.coalesce(F.col("n_hapax"), F.lit(0)).cast("long").alias("n_hapax"),
        F.when(
            nt > 0,
            F.coalesce(F.col("n_hapax"), F.lit(0)).cast("double")
            / nt.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("hapax_ratio"),
    )


#: token-id namespace split for :func:`bpe_tokenize`: single-character
#: tokens map to their Unicode codepoint (stable, vocab-file-free);
#: merged tokens map to MERGED_ID_BASE + merge rank. The base clears
#: the whole Unicode range (max codepoint 0x10FFFF = 1 114 111 <
#: 10 000 000), so the two id spaces can never collide.
MERGED_ID_BASE = 10_000_000


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full BPE segmentation emit (VERDICT r6 #8): ``(doc_id,
    token_ids array<long>)`` — the trainable-shard payload, closing the
    gap between :func:`bpe_segment_counts` (counts only) and what
    ``pack_sequences`` actually needs to feed a trainer.

    Same replay semantics as :func:`bpe_segment_counts` (rank-indexed
    greedy via :func:`_rank_indexed_encoder` — replay-identical to the
    rank-order sweep for trained tables, per-word cost independent of
    vocab size; training-set words reproduce their trained segmentation
    exactly), accepting the output of :func:`train_bpe` /
    :func:`train_bpe_local` or any well-formed
    ``(rank, left, right, ...)`` table. Token ids need no vocab file:
    single-char tokens are their codepoint, merged tokens are
    ``MERGED_ID_BASE + rank`` (ranks are unique; if two merges ever
    produce the same surface string the smallest rank wins, so the
    mapping is a function). One Arrow pass, no shuffle; the merge list
    rides the closure like a production tokenizer's vocab artifact.
    """
    ordered = [(m[1], m[2]) for m in sorted(merges)]
    rank_of: dict[str, int] = {}
    for m in sorted(merges):
        rank_of.setdefault(m[1] + m[2], int(m[0]))

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        segment_word = _rank_indexed_encoder(ordered)

        def encode_word(word: str) -> list[int]:
            return [
                MERGED_ID_BASE + rank_of[t] if len(t) > 1 else ord(t)
                for t in segment_word(word)
            ]

        for pdf in batches:
            ids = [
                [i for w in str(t).lower().split() for i in encode_word(w)]
                if t is not None
                else []
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "token_ids": ids})

    return docs.select(id_col, text_col).mapInPandas(
        segment, f"{id_col} long, token_ids array<long>"
    )


#: script ranges as LITERAL char-class fragments shared by both engines
#: (Java regex and RE2 disagree on \u vs \x{} escape syntax, but both
#: accept literal codepoint ranges inside a class)
SCRIPT_RANGES: dict[str, str] = {
    "latin": "a-zA-Z",
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    "cjk": "一-鿿぀-ヿ가-힯",
    "digit": "0-9",
}


def with_script_mix(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Writing-system composition per document: character counts per
    script family (Latin, Cyrillic, Arabic, CJK incl. kana/hangul,
    digits) plus the dominant script — the companion signal to the
    stopword lang-id for multilingual curation (a 'lang=en' doc that is
    80% CJK chars is mislabeled; a mixed-script doc is often spam).

    Counting by ``length(x) − length(regexp_replace(x, class, ''))``:
    pure per-row JVM expressions, no UDF, no shuffle. Dominant script =
    argmax count with alphabetical tie-break ('none' when every count
    is zero) — the exact lang-id argmax discipline, so the whole column
    set hash-compares.
    """
    text = F.col(text_col)
    total = F.length(text)
    counts = {
        name: total
        - F.length(F.regexp_replace(text, f"[{rng}]", ""))
        for name, rng in SCRIPT_RANGES.items()
    }
    out = df.withColumns(
        {f"n_{name}": c.cast("long") for name, c in counts.items()}
    )
    names = sorted(SCRIPT_RANGES)
    best = F.greatest(*[F.col(f"n_{n}") for n in names])
    dominant: Column = F.lit("none")
    for n in reversed(names):
        dominant = F.when(F.col(f"n_{n}") == best, F.lit(n)).otherwise(dominant)
    dominant = F.when(best == 0, F.lit("none")).otherwise(dominant)
    return out.withColumn("dominant_script", dominant)


#: hashed-feature classifier defaults (shared with the SQL oracle)
CLASSIFIER_DIM = 256
CLASSIFIER_WEIGHT_SEED = "w"
CLASSIFIER_FEATURE_SEED = "feat"


def with_classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = CLASSIFIER_DIM,
) -> DataFrame:
    """Linear quality-classifier scoring with HASHED token features —
    the fasttext-style "model as a broadcast weight table" shape used
    to score web corpora (e.g. the GPT-3 / CCNet quality filters),
    with a deterministic hash-derived weight vector standing in for a
    trained one (the container has no training data or model files;
    swapping in real weights is replacing one small DataFrame).

    Pipeline shape, which is the point: tokens → feature bucket
    (portable 60-bit hash mod ``dim``) → per-(doc, bucket) counts →
    BROADCAST join against the ``dim``-row weight table → one map-side
    combined sum per doc. The corpus never shuffles by anything other
    than doc id; the model rides to every executor as a broadcast.
    Integer weights in [-8, 8] and integer counts keep the score an
    exact BIGINT, so the oracle hash-matches bit-for-bit.

    Emits ``(id, clf_score, clf_pass)``; empty-token documents score 0.
    """
    from sfcrimedatapipeline_spark.functions.hashing import portable_hash64

    spark = df.sparkSession
    weights = spark.range(dim).select(
        F.col("id").alias("bucket"),
        (
            portable_hash64(F.col("id"), F.lit(CLASSIFIER_WEIGHT_SEED)) % 17 - 8
        ).cast("long").alias("weight"),
    )
    bucketed = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .select(
            id_col,
            (portable_hash64(F.col("tok"), F.lit(CLASSIFIER_FEATURE_SEED)) % dim).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )
    scored = (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("weight")).alias("clf_score"))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("clf_score", F.lit(0)).cast("long").alias("clf_score"),
            (F.coalesce("clf_score", F.lit(0)) > 0).alias("clf_pass"),
        )
    )


#: BM25 constants, exact rationals: k1 = 6/5, b = 3/4 (the standard
#: 1.2 / 0.75 defaults), idf quantized at 1e9 (shared with the oracle)
BM25_IDF_SCALE = 1_000_000_000


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25-style lexical relevance of every document to a fixed query
    term set — the keyword-search primitive (Robertson/Spärck Jones;
    what Lucene/Elasticsearch score with) over a corpus table.

    EXACT-RATIONAL variant: the idf is Robertson's
    ``(N - df + 0.5)/(df + 0.5)`` quantized to an integer at 1e9
    WITHOUT the logarithm — ln's last ulp is libm- and engine-specific,
    and summing float term scores is partition-order-dependent, so the
    standard log idf cannot be bit-gated across engines (the
    unigram_lm_score precedent). With k1=6/5 and b=3/4 the tf
    normalization is also rational:

        tf·(k1+1)/(tf + k1(1-b+b·dl/avgdl))
          = 22·tf·T / (10·tf·T + 3·T + 9·dl·N),   avgdl = T/N

    so each per-term contribution is one integer division (DECIMAL
    numerator — tf·T·idf_q overflows BIGINT past ~sf0.01) and the
    per-doc score an exact BIGINT sum; the single final divide by the
    scale is the only double op. Log-idf changes absolute scores, not
    the per-term monotonicity in df/tf/dl.

    Scale shape: terms are a BROADCAST in-list filter pushed to the
    scan; df_t and the (N, T) corpus row are broadcast; the only
    shuffle is groupBy(doc, term) on the matched subset. Docs matching
    no term produce no row (search-result semantics).
    """
    terms = [t.lower() for t in query_terms]
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__tk")).select(
        id_col, F.size("__tk").cast("long").alias("dl"), F.col("__tk")
    )
    corpus = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("t_tokens"),
    )
    tf = (
        base.select(id_col, "dl", F.explode("__tk").alias("__t"))
        .filter(F.col("__t").isin(terms))
        .groupBy(id_col, "dl", "__t")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_t = tf.groupBy("__t").agg(F.count("*").cast("long").alias("df_t"))
    scale = F.lit(BM25_IDF_SCALE).cast("long")
    joined = tf.join(F.broadcast(df_t), "__t").crossJoin(F.broadcast(corpus))
    idf_q = F.expr(
        f"({BM25_IDF_SCALE}L * (2 * (n_docs - df_t) + 1)) div (2 * df_t + 1)"
    )
    contrib = F.expr(
        "CAST(__idfq AS DECIMAL(38,0)) * 22 * tf * t_tokens"
        " div CAST(10 * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs AS DECIMAL(38,0))"
    )
    return (
        joined.withColumn("__idfq", idf_q)
        .withColumn("__contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_terms_matched"),
            (F.sum("__contrib").cast("double") / scale.cast("double")).alias("bm25"),
        )
    )


#: inverted-index layout: term-hash bucket count (one partition dir
#: per bucket; real corpora hold millions of terms — bucketing keeps
#: directory fan-out fixed while still pruning ~(probed/total) buckets)
INDEX_TERM_BUCKETS = 16


def inverted_index_write(
    df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = INDEX_TERM_BUCKETS,
) -> dict:
    """Materialize an INVERTED TEXT INDEX on storage — the lexical
    sibling of similarity.ivfpq_index_write: postings (term, doc, tf,
    dl) written as parquet PARTITIONED BY TERM-HASH BUCKET, term df in
    a bucketed side table, and the 2-number corpus stats (N docs, T
    tokens) in a JSON sidecar. Search then reads ONLY the buckets its
    query terms hash to — partition pruning enforced by layout, the
    same I/O contract as the ANN index.

    Build: one explode + one groupBy(doc, term) with map-side combine
    (tf), one groupBy(term) (df) — the same passes BM25 scoring runs,
    paid once instead of per query.
    """
    import json
    import os

    from sfcrimedatapipeline_spark.functions.hashing import portable_hash64

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__tk")).select(
        id_col, F.size("__tk").cast("long").alias("dl"), F.col("__tk")
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("t_tokens"),
    ).first()
    postings = (
        base.select(id_col, "dl", F.explode("__tk").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn(
            "term_bucket",
            (portable_hash64(F.col("term"), F.lit("idx")) % n_buckets).cast("int"),
        )
    )
    postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
        os.path.join(index_dir, "postings")
    )
    df_t = (
        postings.groupBy("term", "term_bucket")
        .agg(F.count("*").cast("long").alias("df_t"))
    )
    df_t.write.mode("overwrite").partitionBy("term_bucket").parquet(
        os.path.join(index_dir, "term_stats")
    )
    meta = {
        "n_docs": stats["n_docs"],
        "t_tokens": stats["t_tokens"],
        "n_buckets": n_buckets,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def inverted_index_search(
    spark,
    index_dir: str,
    query_terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 search OVER THE MATERIALIZED INDEX — bit-identical scores
    to :func:`bm25_scores` on the raw corpus (same exact-rational
    contributions), but reading only the postings buckets the query
    terms hash to (PartitionFilters on ``term_bucket`` — plan-tested),
    with tf/df/dl all precomputed. The per-query cost is a pruned read
    + one groupBy(doc) over the matched postings, independent of
    corpus text size.
    """
    import hashlib
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    terms = sorted({t.lower() for t in query_terms})

    def _bucket(term: str) -> int:
        h = int(hashlib.md5(f"idx:{term}".encode()).hexdigest()[:15], 16)
        return h % meta["n_buckets"]

    buckets = sorted({_bucket(t) for t in terms})
    postings = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    df_t = (
        spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "df_t")
    )
    n_docs, t_tokens = meta["n_docs"], meta["t_tokens"]
    joined = postings.join(F.broadcast(df_t), "term")
    idf_q = F.expr(
        f"({BM25_IDF_SCALE}L * (2 * ({n_docs}L - df_t) + 1)) div (2 * df_t + 1)"
    )
    contrib = F.expr(
        f"CAST(__idfq AS DECIMAL(38,0)) * 22 * tf * {t_tokens}L"
        f" div CAST(10 * tf * {t_tokens}L + 3 * {t_tokens}L + 9 * dl * {n_docs}L"
        " AS DECIMAL(38,0))"
    )
    return (
        joined.withColumn("__idfq", idf_q)
        .withColumn("__contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_terms_matched"),
            (
                F.sum("__contrib").cast("double") / F.lit(BM25_IDF_SCALE).cast("double")
            ).alias("bm25"),
        )
    )


#: lcm(2..11) — makes the harmonic NDCG discount 1/(rank+1) an exact
#: integer weight at every rank ≤ 10, so DCG numerators are BIGINTs
NDCG_DISCOUNT_LCM = 27_720


def retrieval_ndcg(
    df: DataFrame,
    query_terms: dict[str, list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Graded retrieval evaluation: NDCG@k of the BM25 ranking for a
    panel of queries, scored in ONE dataflow — the search-quality
    monitor a corpus pipeline runs after every index rebuild. The
    relevance grade of a (query, doc) pair is the number of DISTINCT
    query terms the document contains (a judgment derivable from the
    data itself, so the metric needs no external label table).

    EXACT-RATIONAL variant: position discounts are harmonic
    ``1/(rank+1)`` rather than the textbook ``1/log2(rank+1)`` —
    log's last ulp is libm- and engine-specific (the bm25_scores idf
    precedent) — and are scaled by lcm(2..k+1) so every DCG/IDCG
    numerator is an exact BIGINT; the only double op is the final
    ``dcg/idcg`` divide, bit-stable across engines. Harmonic vs log2
    changes the absolute NDCG, not the ranking monotonicity it grades.
    Requires ``k <= 10`` (the lcm covers ranks 1..10).

    Scale shape: one tokenize + explode filtered to the query-term
    union (an in-list pushed to the scan), tf/df aggregates map-side
    combined, query map / term df / 2-number corpus stats all
    BROADCAST. Both ranking windows partition by query id — the
    per-partition frame is one query's MATCHED docs (term-pruned, not
    the corpus) and the two windows share one exchange. Queries with
    no matching document produce no row (search-result semantics).
    """
    if k > 10:
        raise ValueError("k <= 10: NDCG_DISCOUNT_LCM covers ranks 1..10")
    from pyspark.sql import Window

    spark = df.sparkSession
    qrows = [
        (qid, t.lower())
        for qid, ts in sorted(query_terms.items())
        for t in sorted({x.lower() for x in ts})
    ]
    qmap = spark.createDataFrame(qrows, "qid string, __t string")
    all_terms = sorted({t for _, t in qrows})

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__tk")).select(
        id_col, F.size("__tk").cast("long").alias("dl"), F.col("__tk")
    )
    corpus = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("t_tokens"),
    )
    tf = (
        base.select(id_col, "dl", F.explode("__tk").alias("__t"))
        .filter(F.col("__t").isin(all_terms))
        .groupBy(id_col, "dl", "__t")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # per-term document frequency over the TERM UNION, computed once —
    # a term shared by two queries must not double-count its df
    df_t = tf.groupBy("__t").agg(F.count("*").cast("long").alias("df_t"))
    joined = (
        tf.join(F.broadcast(df_t), "__t")
        .join(F.broadcast(qmap), "__t")
        .crossJoin(F.broadcast(corpus))
    )
    idf_q = F.expr(
        f"({BM25_IDF_SCALE}L * (2 * (n_docs - df_t) + 1)) div (2 * df_t + 1)"
    )
    contrib = F.expr(
        "CAST(__idfq AS DECIMAL(38,0)) * 22 * tf * t_tokens"
        " div CAST(10 * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs AS DECIMAL(38,0))"
    )
    scored = (
        joined.withColumn("__idfq", idf_q)
        .withColumn("__contrib", contrib)
        .groupBy("qid", id_col)
        .agg(
            F.count("*").cast("long").alias("__rel"),
            (
                F.sum("__contrib").cast("double")
                / F.lit(BM25_IDF_SCALE).cast("double")
            ).alias("bm25"),
        )
    )
    w_rank = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc(id_col))
    w_ideal = Window.partitionBy("qid").orderBy(F.desc("__rel"), F.asc(id_col))
    ranked = scored.withColumn(
        "__rn", F.row_number().over(w_rank)
    ).withColumn("__ri", F.row_number().over(w_ideal))
    w_at = F.expr(f"{NDCG_DISCOUNT_LCM}L div (__rn + 1)")
    w_ideal_at = F.expr(f"{NDCG_DISCOUNT_LCM}L div (__ri + 1)")
    per_q = ranked.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_matched"),
        F.sum(F.when(F.col("__rn") <= k, F.col("__rel") * w_at).otherwise(0))
        .cast("long")
        .alias("dcg_num"),
        F.sum(F.when(F.col("__ri") <= k, F.col("__rel") * w_ideal_at).otherwise(0))
        .cast("long")
        .alias("idcg_num"),
    )
    return per_q.select(
        "qid",
        "n_matched",
        "dcg_num",
        "idcg_num",
        (F.col("dcg_num").cast("double") / F.col("idcg_num").cast("double")).alias(
            "ndcg"
        ),
    )


#: RAKE: top keywords kept per document
RAKE_TOP_K = 3


def rake_keywords(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = RAKE_TOP_K,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are the maximal stopword-free token runs (the English stopword
    list is the delimiter set — this corpus has no punctuation), each
    word scores deg(w)/freq(w) over the DOCUMENT's candidates (freq =
    occurrences, deg = Σ length of phrases containing it — favoring
    words that live in long collocations), and a phrase scores the sum
    of its member words. Top-k phrases per document, score DESC,
    phrase ASC.

    Determinism: deg/freq are exact integers; each member ratio is one
    exact division; the phrase score folds those doubles IN PHRASE
    ORDER (Spark ``aggregate`` over the position-sorted list = DuckDB
    ``list_sum`` over ``list(... ORDER BY p)`` — the MMR sequential-
    fold discipline), so scores are bit-identical and the top-k gate
    holds.

    Scale shape: one posexplode, one per-doc cumulative-sum window
    (PARTITIONED by doc), two doc-keyed groupBys and two doc-keyed
    joins, one per-doc top-k window — everything keyed by document, no
    global state, no UDFs.
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    pos = df.select(
        id_col, F.posexplode(toks).alias("__p", "__w")
    ).withColumn("__stop", F.col("__w").isin(STOPWORDS["en"]))
    wrun = (
        Window.partitionBy(id_col)
        .orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    members = (
        pos.withColumn(
            "__ph",
            F.sum(F.col("__stop").cast("int")).over(wrun),
        )
        .filter(~F.col("__stop"))
        .select(id_col, "__ph", "__p", "__w")
    )
    phrases = members.groupBy(id_col, "__ph").agg(
        F.count("*").cast("long").alias("__plen"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__w"))),
                lambda s: s["__w"],
            ),
        ).alias("phrase"),
    )
    wordstats = (
        members.join(
            phrases.select(id_col, "__ph", "__plen"), [id_col, "__ph"]
        )
        .groupBy(id_col, "__w")
        .agg(
            F.count("*").cast("long").alias("__freq"),
            F.sum("__plen").cast("long").alias("__deg"),
        )
    )
    scored = (
        members.join(wordstats, [id_col, "__w"])
        .groupBy(id_col, "__ph")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__p", "__deg", "__freq"))
                    ),
                    lambda s: s["__deg"].cast("double")
                    / s["__freq"].cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score")
        )
        .join(phrases.select(id_col, "__ph", "phrase"), [id_col, "__ph"])
    )
    wk = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("phrase"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("int").alias("rank"), "phrase", "score")
    )
