"""Deduplication operators (north-star surface): exact, MinHash+LSH,
n-gram Jaccard, SimHash, embedding-cosine near-dup.

Scale design: nothing here ever builds an all-pairs cross join. Every
near-dup path is *blocked* first (LSH band buckets, shared-ngram
candidates, simhash band equality), so the quadratic step only runs
inside buckets — the standard shuffle-light pattern for 100 TB corpora
(hash-partitioned self-joins on bucket keys; skew handled by AQE).

Hashes are the portable md5-based ones (functions/hashing.py) so the
whole MinHash pipeline is oracle-checkable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sfcrimedatapipeline_spark.functions.hashing import portable_hash64
from sfcrimedatapipeline_spark.functions.text import ngrams, normalized, tokens

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4  # 16 hashes → 4 bands × 4 rows


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on normalized text: keep the lowest id per group.

    One hash-aggregate shuffle on the md5 fingerprint (never on the full
    text — at 100 TB the shuffle payload is 32 bytes/row, not the doc).
    """
    return (
        df.select(
            F.col(id_col), F.md5(normalized(F.col(text_col))).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("kept_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, distinct word-n-gram array) per document.

    Tokens are bound to a column before the n-gram transform — an
    expression embedded in a higher-order-function lambda re-evaluates
    per array element, so inlining the tokenizer would re-split the
    text once per n-gram position.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    return toked.select(
        F.col(id_col),
        F.array_distinct(ngrams(F.col("__toks"), n)).alias("shingles"),
    )


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """MinHash signature per doc: for each seed, min portable hash over
    the shingle set. Pure array expressions — per-row, no shuffle, no UDF."""
    def _seed_hash(seed: int):
        # single-parameter lambda: a two-parameter one (e.g. ``lambda s,
        # i=i``) would be treated by F.transform as (element, index) and
        # the array index would silently override the seed
        return lambda s: portable_hash64(s, seed)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), _seed_hash(i)))
            for i in range(num_hashes)
        ]
    )
    return shingled.withColumn("signature", sig)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """LSH banding: split each signature into bands, bucket by band
    hash, emit distinct candidate pairs (a < b) sharing ≥1 bucket.

    The self-join is on (band_idx, band_key) — co-partitioned on both
    sides, bucket sizes are small by construction, and the distinct
    collapses multi-band matches.
    """
    num_hashes = DEFAULT_NUM_HASHES
    rows = num_hashes // num_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_", *[F.element_at("signature", b * rows + r + 1) for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(num_bands)
        ]
    )
    buckets = signatures.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col, "band.band_idx", "band.band_key"
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    candidates: DataFrame, shingled: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for candidate pairs from their distinct shingle sets.

    |A∩B| via array_intersect on the two (already distinct) arrays;
    |A∪B| = |A|+|B|−|A∩B|. Joins bring only the shingle arrays of the
    candidate rows — never a full cross join.
    """
    sh_a = shingled.select(
        F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sh_b = shingled.select(
        F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    bucket-join → exact-Jaccard verify ≥ threshold."""
    # docs with < n tokens have no shingles and can never pass a
    # positive threshold — drop them before signing (also keeps the
    # empty-set signature out of the band buckets)
    #
    # shingled feeds both the signature pass and the verify join, and
    # sigs feeds both sides of the bucket self-join; without persist
    # Spark re-derives the whole tokenize→shingle→hash subtree once per
    # consumer. Both frames are O(corpus) with small rows (id + shingle
    # array / 16 longs) — MEMORY_AND_DISK spills safely at scale.
    shingled = shingle_sets(df, id_col, text_col).filter(F.size("shingles") > 0).persist()
    sigs = minhash_signatures(shingled).select(id_col, "signature").persist()
    cands = lsh_candidate_pairs(sigs, id_col)
    return jaccard_pairs(cands, shingled, id_col).filter(
        F.col("jaccard") >= threshold
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact n-gram Jaccard dedup, relationally: explode distinct
    shingles, self-join on shingle (the block key), count shared
    shingles per pair, derive Jaccard. No minhash approximation — the
    candidate set is every pair sharing ≥1 shingle, which is exactly the
    set that can pass any threshold > 0."""
    exploded = (
        shingle_sets(df, id_col, text_col, n)
        .select(F.col(id_col), F.size("shingles").alias("n_sh"), F.explode("shingles").alias("sh"))
        .persist()  # consumed by both sides of the shingle self-join
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return pair_counts.select(
        "doc_a", "doc_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc from portable token hashes.

    Shape: explode tokens → hash each token ONCE → groupBy(doc) with 64
    integer bit-vote sums. The md5 runs exactly one pass over the token
    stream (an inline per-bit formulation would re-evaluate it per bit),
    and the aggregation gets map-side partial combine — one small
    shuffle of 64 ints per doc regardless of document size. Docs with
    zero tokens have no votes and are dropped (same semantics as the
    oracle's unnest).
    """
    tok_hashes = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).select(id_col, portable_hash64(F.col("__t"), 0).alias("__hv"))
    # vote_b = Σ_tokens (2*bit_b(h) - 1): positive → simhash bit b is 1
    votes = tok_hashes.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(F.col("__hv"), b).bitwiseAND(1) * 2 - 1).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    bit_cols = []
    for chunk_start in range(0, bits, 16):
        chunk_val = None
        for b in range(chunk_start, min(chunk_start + 16, bits)):
            term = (F.col(f"v{b}") > 0).cast("long") * F.lit(2 ** (b - chunk_start))
            chunk_val = term if chunk_val is None else chunk_val + term
        bit_cols.append(F.lpad(F.hex(chunk_val), 4, "0"))
    # 60-bit portable hashes: bits 60..63 are always 0-voted (vote = -n_tokens → bit 0)
    return votes.select(
        F.col(id_col), F.concat(*reversed(bit_cols)).alias("simhash")
    )


def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold.

    Exact all-pairs within id-blocked halves — suitable for verify
    stages and small/medium corpora; the ANN path for full-corpus scale
    is operators/similarity.py (LSH-bucketed). Norms are computed once
    per vector per side; the per-pair work is one unrolled codegen dot.
    """
    from sfcrimedatapipeline_spark.functions.vectors import cosine_fixed, norm_fixed

    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm_fixed(F.col(vec_col), dim).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm_fixed(F.col(vec_col), dim).alias("nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine_fixed(F.col("va"), F.col("vb"), dim, F.col("na"), F.col("nb"))
    return pairs.select(
        "id_a", "id_b", F.round(sim, 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def embedding_near_duplicates_blas(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    dim: int = 64,
) -> DataFrame:
    """Same pairs as :func:`embedding_near_duplicates`, computed as
    dense tiles in numpy over Arrow batches — the vectorized form of
    exact all-pairs verify.

    The corpus side is broadcast as one (m, dim) float64 matrix; each
    Arrow batch of the streamed side scores against it as dim-sequential
    vectorized accumulation. Per-pair cost drops from an interpreted/
    codegen 64-term expression to a fused numpy op over the whole tile.
    At full scale, tile the broadcast side too (grid of blocks) — the
    batch side already streams.

    Bit-parity with the JVM/or oracle version is engineered, not
    approximate: float32→float64 widening is exact; accumulating one
    dimension at a time over the tile reproduces the unrolled
    left-to-right sum exactly (numpy's own matmul/sum use pairwise
    reduction and WOULD drift in the last bits); rounding uses exact
    binary Decimal HALF_UP — the same algorithm as Spark's ``round`` —
    applied only to near-threshold candidates.
    """
    from decimal import ROUND_HALF_UP, Decimal
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    corpus = (
        emb.select(F.col(id_col).cast("long"), vec_col)
        .sort(id_col)
        .collect()
    )
    ids_b = np.array([r[0] for r in corpus], dtype=np.int64)
    mat_b = np.array(
        [np.asarray(r[1], dtype=np.float32) for r in corpus], dtype=np.float32
    ).astype(np.float64)
    bc = emb.sparkSession.sparkContext.broadcast((ids_b, mat_b))
    quantum = Decimal(1).scaleb(-6)

    def _seq_sq_norm(m: np.ndarray) -> np.ndarray:
        acc = m[:, 0] * m[:, 0]
        for d in range(1, m.shape[1]):
            acc = acc + m[:, d] * m[:, d]
        return np.sqrt(acc)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat = bc.value
        nb = _seq_sq_norm(b_mat)
        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(
                [np.asarray(v, dtype=np.float32) for v in pdf[vec_col]],
                dtype=np.float32,
            ).astype(np.float64)
            na = _seq_sq_norm(a_mat)
            acc = np.multiply.outer(a_mat[:, 0], b_mat[:, 0])
            for d in range(1, dim):
                acc = acc + np.multiply.outer(a_mat[:, d], b_mat[:, d])
            cos = acc / np.multiply.outer(na, nb)
            cand = (cos >= threshold - 1e-6) & (a_ids[:, None] < b_ids[None, :])
            ai, bi = np.nonzero(cand)
            out_a, out_b, out_c = [], [], []
            for i, j in zip(ai, bi):
                # Decimal(repr(x)): shortest round-trip repr, the same
                # algorithm as the BigDecimal.valueOf inside Spark's round
                rounded = float(
                    Decimal(repr(float(cos[i, j]))).quantize(
                        quantum, rounding=ROUND_HALF_UP
                    )
                )
                if rounded >= threshold:
                    out_a.append(a_ids[i])
                    out_b.append(b_ids[j])
                    out_c.append(rounded)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    return emb.select(F.col(id_col).cast("long").alias(id_col), vec_col).mapInPandas(
        score, schema
    )
