"""Entity resolution (record linkage): blocked candidate generation,
weighted field-similarity scoring, threshold matching.

The capability the warehouse's dimension loads quietly assume — the
reference's DimAddress/DimCrimeDescription dedupe by exact string
equality (/root/reference/dags/ELT.py:165-205, SELECT DISTINCT), which
silently keeps "Customer#000000123" and "customer 000000123" as two
entities. This module is the fuzzy tier above that: Fellegi-Sunter-ish
weighted agreement over multiple fields, then connected components
(operators/corpus.py) to collapse matched records to one entity.

Exactness discipline: the name similarity is a character-trigram SET
Jaccard — two integer counts (``n_inter``, ``n_union``) — and the
digit-field agreement is 0/1, so the combined score
``0.5*n_inter/n_union + 0.5*same_digits`` is the same rational in any
engine; no libm, no collation dependence (ASCII lower only).

Scale shape: candidate pairs come from BLOCKING — a self-equi-join on
a cheap deterministic key — never an all-pairs cross join. Candidate
volume is sum over blocks of |block|², so the block key's job is to
bound block size: here (nation, last-3-of-id-digits) keeps blocks at
~n/25000. The trigram arrays are built once per record before the
join (map-side, whole-stage codegen), so the pair stage is an
equi-join plus two ``array_intersect``/``array_union`` size
expressions — no explode, no shuffle beyond the join itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: character n-gram width for the name similarity
TRIGRAM_N = 3


def normalized_name(name: Column) -> Column:
    """Canonical form for similarity: ASCII-lowercased, whitespace
    collapsed, trimmed (same contract as functions/text.normalized)."""
    return F.trim(F.regexp_replace(F.lower(name), r"\s+", " "))


def char_trigrams(nm: Column) -> Column:
    """Distinct character trigrams of an (already normalized) string.

    Built with sequence+transform — pure Catalyst, no UDF. The
    ``when`` guard matters: Spark's ``sequence(1, len-2)`` DESCENDS
    when ``len < 3`` (sequence(1,0) = [1,0]), so short strings must
    short-circuit to an empty array instead."""
    n = TRIGRAM_N
    grams = F.transform(
        F.sequence(F.lit(1), (F.length(nm) - (n - 1)).cast("int")),
        lambda i: nm.substr(i, F.lit(n)),
    )
    return F.when(F.length(nm) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def prepare_records(
    df: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Attach the derived linkage fields: normalized name ``__nm``,
    first digit-run ``__digits``, trigram set ``__tg``, and the
    digit-suffix block key ``__blk3``. One narrow projection — every
    similarity input is computed ONCE per record here, not per pair."""
    nm = normalized_name(F.col(name_col))
    digits = F.regexp_extract(F.col(name_col), "([0-9]+)", 1)
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        *(block_cols or []),
        nm.alias("__nm"),
        digits.alias("__digits"),
        char_trigrams(nm).alias("__tg"),
        F.substring(digits, -3, 3).alias("__blk3"),
    )


def candidate_pairs(
    recs: DataFrame,
    id_col: str = "rec_id",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Blocked candidate pairs: self-equi-join on (``block_cols`` +
    digit-suffix), ``id_a < id_b``. The join is a plain shuffled
    equi-join on the block key — co-partitioned by definition, and the
    ``<`` predicate halves the within-block quadratic."""
    keys = [*(block_cols or []), "__blk3"]
    a = recs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(k).alias(f"__ka_{i}") for i, k in enumerate(keys)],
        F.col("__tg").alias("__tg_a"),
        F.col("__digits").alias("__dig_a"),
    )
    b = recs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(k).alias(f"__kb_{i}") for i, k in enumerate(keys)],
        F.col("__tg").alias("__tg_b"),
        F.col("__digits").alias("__dig_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for i in range(len(keys)):
        cond = cond & (F.col(f"__ka_{i}") == F.col(f"__kb_{i}"))
    return a.join(b, cond).select(
        "id_a", "id_b", "__tg_a", "__tg_b", "__dig_a", "__dig_b"
    )


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Weighted field agreement per candidate pair:
    ``score = 0.5 * trigram_jaccard(name) + 0.5 * [digits equal]``.

    Emits the integer evidence (``n_inter``, ``n_union``,
    ``same_digits``) alongside the double score so downstream (and the
    oracle gate) can re-derive it exactly."""
    n_inter = F.size(F.array_intersect("__tg_a", "__tg_b")).cast("long")
    n_union = F.size(F.array_union("__tg_a", "__tg_b")).cast("long")
    same = F.when(F.col("__dig_a") == F.col("__dig_b"), 1).otherwise(0)
    return pairs.select(
        "id_a",
        "id_b",
        n_inter.alias("n_inter"),
        n_union.alias("n_union"),
        same.cast("int").alias("same_digits"),
    ).withColumn(
        "score",
        F.lit(0.5) * F.col("n_inter") / F.col("n_union")
        + F.lit(0.5) * F.col("same_digits"),
    )


def link_records(
    df: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    block_cols: list[str] | None = None,
    threshold: float = 0.6,
) -> DataFrame:
    """Full linkage pipeline: prepare → block → score → threshold.
    Returns matched pairs ``(id_a, id_b, n_inter, n_union,
    same_digits, score)`` with ``score >= threshold``."""
    recs = prepare_records(df, id_col, name_col, block_cols)
    return score_pairs(candidate_pairs(recs, id_col, block_cols)).filter(
        F.col("score") >= threshold
    )


def resolve_entities(
    matches: DataFrame,
    id_col: str = "rec_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Matched pairs → entity clusters via connected components
    (operators/corpus.py — A~B, A~C must place B and C in one entity
    even when B,C never scored). Returns ``(rec_id, canonical_id)``,
    canonical = min id in the cluster."""
    from sfcrimedatapipeline_spark.operators.corpus import connected_components

    cc = connected_components(
        matches, src_col="id_a", dst_col="id_b", checkpoint_dir=checkpoint_dir
    )
    return cc.select(
        F.col("doc_id").alias(id_col), F.col("canonical_id")
    )


def golden_record(
    df: DataFrame,
    cluster_col: str,
    longest: list[str] | None = None,
    maxes: list[str] | None = None,
    mins: list[str] | None = None,
    modes: list[str] | None = None,
) -> DataFrame:
    """Survivorship merge: one canonical "golden" record per entity
    cluster — the step after :func:`resolve_entities` in an MDM
    pipeline. Strategies per attribute, all with TOTAL deterministic
    orderings (a ``first()``-style pick would be partition-order
    nondeterministic):

    - ``longest``: longest value wins, lexicographically largest on
      length ties (``max_by`` over a ``(length, value)`` struct).
    - ``maxes`` / ``mins``: plain extreme.
    - ``modes``: most frequent value wins, largest value on count ties
      (per-(cluster, value) count then ``max_by`` over
      ``(count, value)``).

    One map-side-combined aggregation for longest/max/min/count; each
    mode column adds one (cluster, value)-grained aggregate joined
    back — every shuffle is on the cluster key, nothing is windowed.
    Output: ``cluster_col``, ``n_members``, one column per rule.
    """
    longest = longest or []
    maxes = maxes or []
    mins = mins or []
    modes = modes or []
    aggs = [F.count("*").alias("n_members")]
    for c in longest:
        aggs.append(
            F.max_by(
                c, F.struct(F.length(c).alias("l"), F.col(c).alias("v"))
            ).alias(c)
        )
    for c in maxes:
        aggs.append(F.max(c).alias(c))
    for c in mins:
        aggs.append(F.min(c).alias(c))
    out = df.groupBy(cluster_col).agg(*aggs)
    for c in modes:
        picked = (
            df.groupBy(cluster_col, c)
            .agg(F.count("*").alias("__c"))
            .groupBy(cluster_col)
            .agg(
                F.max_by(
                    c, F.struct(F.col("__c").alias("c"), F.col(c).alias("v"))
                ).alias(c)
            )
        )
        out = out.join(picked, cluster_col)
    return out
