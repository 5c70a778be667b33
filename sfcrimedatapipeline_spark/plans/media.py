"""Multimodal driver queries with DuckDB oracles.

The Spark side runs the REAL plumbing — binary payload synthesis in
JVM expressions, then Arrow-batched mapInPandas (numpy byte stats,
frame slicing). The oracles recompute the same values relationally:
payload == encode(text), so blob length is octet_length, byte values
come from hex-pair arithmetic, and frame content compares as hex
substrings at doubled offsets (DuckDB cannot slice blobs directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.functions.partitioning import ensure_min_partitions
from sfcrimedatapipeline_spark.operators import multimodal as mm
from sfcrimedatapipeline_spark.sources.tables import read_table

N_TYPES = len(mm.MEDIA_TYPES)
_TYPE_CASE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    return mm.synthesize_media(docs)


def media_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bytes per media type — exercises the JVM binary-payload path."""
    return (
        _media(spark, sf_dir)
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            # pin both sides: DuckDB sum→HUGEINT / max(octet_length)→
            # BIGINT vs Spark long/int — the oracle hash is type-sensitive
            F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
            F.max(F.octet_length("payload")).cast("int").alias("max_bytes"),
        )
    )


def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/mapInPandas numpy byte stats, value-checked exactly.
    ``method="bytes"`` pins the raw-stream decode so a synthesized text
    payload that happens to start with a container magic (e.g. "P5 ")
    cannot flip a row onto the container branch mid-gate; the real
    container decode is gated by ``media_pgm_decode`` + pytest."""
    return mm.image_features(_media(spark, sf_dir), method="bytes")


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through mapInPandas; frames compared as hex."""
    return mm.sample_frames(_media(spark, sf_dir)).select(
        "doc_id", "frame_idx", "frame_hex"
    )


def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio sample stats (duration/peak/RMS) through mapInPandas; the
    oracle replays the signed-int8 sample interpretation in hex-pair
    arithmetic and the identical divide→sqrt→round float tail.
    ``method="bytes"`` pins the raw decode (a text payload starting
    with "RIFF" must not flip onto the stdlib-wave branch mid-gate);
    the WAV container branch is value-gated by pytest."""
    return mm.audio_features(_media(spark, sf_dir), method="bytes")


def media_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe detection over sampled frames: lag window + exact
    integer byte-diff fold (operators/multimodal.py:detect_keyframes),
    fully hash-gated — diffs are BIGINTs, first frames NULL."""
    return mm.detect_keyframes(_media(spark, sf_dir))


def media_pgm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL container-decode branch under the oracle: each document's
    UTF-8 bytes are wrapped into a valid binary PGM (``P5``) payload —
    header built with JVM string expressions, raster truncated to a
    whole 8-wide pixel grid — and ``image_features(method="auto")``
    must *parse the header* and compute stats over the raster only.
    The oracle replays the construction arithmetically (it knows the
    raster is bytes 1..8*h of the text), so a parser that misreads the
    header or leaks header bytes into the stats hash-mismatches."""
    docs = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    tmp = docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("raw"),
    ).select(
        "doc_id",
        "raw",
        F.floor(F.octet_length("raw") / 8).cast("int").alias("h"),
    )
    media = tmp.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.concat(
            F.encode(
                F.concat(
                    F.lit("P5\n8 "), F.col("h").cast("string"), F.lit("\n255\n")
                ),
                "utf-8",
            ),
            F.expr("substring(raw, 1, h * 8)"),
        ).alias("payload"),
    )
    return mm.image_features(media, method="auto")


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing under the oracle: the deterministic byte path
    (``method="bytes"`` — truncate/zero-pad to width*height) through the
    REAL Arrow/mapInPandas pipeline, so the value check is pure byte
    arithmetic DuckDB can replay as hex slicing. The PIL decode path is
    covered separately by tests/test_multimodal.py (environment-bound,
    not oracle-checkable)."""
    return mm.resize_images(_media(spark, sf_dir), method="bytes").select(
        "doc_id",
        "width",
        "height",
        F.hex(F.col("resized")).alias("resized_hex"),
    )


def build_oracle_sql() -> dict[str, str]:
    fs, stride = mm.FRAME_SIZE, mm.FRAME_STRIDE
    return {
        "media_inventory": f"""
            SELECT {_TYPE_CASE} AS media_type,
                   count(*) AS n_items,
                   CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                   CAST(max(octet_length(encode(text))) AS INTEGER) AS max_bytes
            FROM documents
            GROUP BY 1
        """,
        "media_image_features": """
            WITH img AS (
                SELECT doc_id, hex(encode(text)) AS hx,
                       octet_length(encode(text)) AS n
                FROM documents WHERE doc_id % 3 = 0
            ),
            b AS (
                SELECT doc_id, n,
                       CASE WHEN n > 0
                            THEN [CAST(('0x' || substring(hx, i*2+1, 2)) AS INT)
                                  for i in generate_series(0, n - 1)]
                            ELSE [] END AS bytes
                FROM img
            )
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN n > 0 THEN list_min(bytes) ELSE 0 END AS INTEGER) AS byte_min,
                   CAST(CASE WHEN n > 0 THEN list_max(bytes) ELSE 0 END AS INTEGER) AS byte_max,
                   CAST(coalesce(list_sum(bytes), 0) AS BIGINT) AS byte_sum
            FROM b
        """,
        "media_frame_sample": f"""
            WITH vid AS (
                SELECT doc_id, hex(encode(text)) AS hx,
                       octet_length(encode(text)) // {fs} AS n_frames
                FROM documents WHERE doc_id % 3 = 2
            ),
            idx AS (
                SELECT doc_id, hx,
                       unnest(CASE WHEN n_frames > 0
                                   THEN [x for x in generate_series(0, n_frames - 1)
                                         if x % {stride} = 0]
                                   ELSE [] END) AS i
                FROM vid
            )
            SELECT doc_id,
                   CAST(i AS INTEGER) AS frame_idx,
                   substring(hx, CAST(i * {fs} * 2 + 1 AS INTEGER), {fs * 2}) AS frame_hex
            FROM idx
        """,
        # signed int8 samples from hex pairs (v > 127 → v - 256); the
        # square sum is exact integer, so rms is one divide + one sqrt
        # + one round on both engines
        "media_audio_features": """
            WITH au AS (
                SELECT doc_id, hex(encode(text)) AS hx,
                       octet_length(encode(text)) AS n
                FROM documents WHERE doc_id % 3 = 1
            ),
            s AS (
                SELECT doc_id, n,
                       CASE WHEN n > 0
                            THEN [CASE WHEN CAST(('0x' || substring(hx, i*2+1, 2)) AS INT) > 127
                                       THEN CAST(('0x' || substring(hx, i*2+1, 2)) AS INT) - 256
                                       ELSE CAST(('0x' || substring(hx, i*2+1, 2)) AS INT) END
                                  for i in generate_series(0, n - 1)]
                            ELSE [] END AS samples
                FROM au
            )
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_samples,
                   CAST(n AS DOUBLE) / 16000 AS duration_s,
                   CAST(CASE WHEN n > 0
                             THEN list_max(list_transform(samples, x -> abs(x)))
                             ELSE 0 END AS INTEGER) AS peak,
                   CASE WHEN n > 0
                        THEN round(sqrt(CAST(list_sum(list_transform(samples, x -> x * x)) AS DOUBLE) / n), 6)
                        ELSE 0.0 END AS rms
            FROM s
        """,
        # byte diffs are integer sums (order-free, list_sum safe);
        # first frame of each video: NULL diff, keyframe by contract
        "media_keyframes": f"""
            WITH vid AS (
                SELECT doc_id, hex(encode(text)) AS hx,
                       octet_length(encode(text)) // {mm.FRAME_SIZE} AS n_frames
                FROM documents WHERE doc_id % 3 = 2
            ),
            idx AS (
                SELECT doc_id, hx,
                       unnest(CASE WHEN n_frames > 0
                                   THEN [x for x in generate_series(0, n_frames - 1)
                                         if x % {mm.FRAME_STRIDE} = 0]
                                   ELSE [] END) AS i
                FROM vid
            ),
            fr AS (
                SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
                       substring(hx, CAST(i * {mm.FRAME_SIZE} * 2 + 1 AS INTEGER),
                                 {mm.FRAME_SIZE * 2}) AS h
                FROM idx
            ),
            l AS (
                SELECT doc_id, frame_idx, h,
                       lag(h) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS ph
                FROM fr
            ),
            d AS (
                SELECT doc_id, frame_idx,
                       CASE WHEN ph IS NULL THEN NULL
                            ELSE CAST(list_sum(
                                [abs(CAST(('0x' || substring(h, i*2-1, 2)) AS INT)
                                     - CAST(('0x' || substring(ph, i*2-1, 2)) AS INT))
                                 for i in generate_series(1, {mm.FRAME_SIZE})]) AS BIGINT)
                            END AS byte_diff
                FROM l
            )
            SELECT doc_id, frame_idx, byte_diff,
                   coalesce(byte_diff > 256, TRUE) AS is_keyframe
            FROM d
        """,
        # the parser must recover exactly bytes 1..8*h of the text as
        # the raster (h = floor(len/8)); h = 0 is a legal empty-raster
        # PGM and must yield zeroed stats
        "media_pgm_decode": """
            WITH img AS (
                SELECT doc_id, hex(encode(text)) AS hx,
                       (octet_length(encode(text)) // 8) * 8 AS n
                FROM documents
            ),
            b AS (
                SELECT doc_id, n,
                       CASE WHEN n > 0
                            THEN [CAST(('0x' || substring(hx, i*2+1, 2)) AS INT)
                                  for i in generate_series(0, n - 1)]
                            ELSE [] END AS bytes
                FROM img
            )
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN n > 0 THEN list_min(bytes) ELSE 0 END AS INTEGER) AS byte_min,
                   CAST(CASE WHEN n > 0 THEN list_max(bytes) ELSE 0 END AS INTEGER) AS byte_max,
                   CAST(coalesce(list_sum(bytes), 0) AS BIGINT) AS byte_sum
            FROM b
        """,
        "media_resize": """
            SELECT doc_id,
                   CAST(16 AS INTEGER) AS width,
                   CAST(16 AS INTEGER) AS height,
                   rpad(substring(hex(encode(text)), 1, 512), 512, '0') AS resized_hex
            FROM documents WHERE doc_id % 3 = 0
        """,
    }


QUERIES = {
    "media_inventory": media_inventory,
    "media_image_features": media_image_features,
    "media_frame_sample": media_frame_sample,
    "media_audio_features": media_audio_features,
    "media_keyframes": media_keyframes,
    "media_pgm_decode": media_pgm_decode,
    "media_resize": media_resize,
}

ORACLE_SQL = build_oracle_sql()


def media_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL training-sample manifest: each media item joined to
    its caption document (the media table derives from documents, so
    doc_id is the real pairing key), with payload bytes, declared
    dimensions, caption token count, and the deterministic hash split
    — the image-text-pair assembly every multimodal trainer consumes.
    Composes three gated operators (synthesize_media, tokenization,
    assign_splits) under one hash.
    """
    from sfcrimedatapipeline_spark.functions.text import tokens
    from sfcrimedatapipeline_spark.operators.corpus import assign_splits
    from sfcrimedatapipeline_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    media = mm.synthesize_media(docs)
    caps = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("caption_tokens")
    )
    joined = media.join(caps, "doc_id").select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "caption_tokens",
    )
    return assign_splits(joined, key_col="doc_id")


QUERIES["media_training_manifest"] = media_training_manifest


def _manifest_oracle() -> str:
    from sfcrimedatapipeline_spark.operators.corpus import split_boundaries
    from sfcrimedatapipeline_spark.plans.corpus_queries import SPLITS

    b = split_boundaries(SPLITS)
    uniform = (
        "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
        " / 4294967296.0"
    )
    types = ", ".join(f"'{t}'" for t in mm.MEDIA_TYPES)
    from sfcrimedatapipeline_spark.functions.text import SQL_TOKENS

    return f"""
        SELECT doc_id,
               [{types}][CAST(doc_id % {len(mm.MEDIA_TYPES)} AS INT) + 1] AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
               CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS width,
               CAST((doc_id % 48) * 16 + 16 AS INTEGER) AS height,
               CAST(len({SQL_TOKENS}) AS BIGINT) AS caption_tokens,
               CASE WHEN {uniform} < {b[0][1]!r} THEN 'train'
                    WHEN {uniform} < {b[1][1]!r} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """


ORACLE_SQL["media_training_manifest"] = _manifest_oracle()


def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup of BINARY payloads — the multimodal twin of
    text fingerprint dedup: md5 over the raw bytes (not a decode),
    keeper = min id per digest, duplicate bytes never shuffle (32-hex
    digests do). Emits every digest with its copy count (n_copies > 1
    is the dedup worklist; the sf testdata's raw payloads are all
    distinct, so emitting all keeps the binary-md5 parity under a
    500-row gate instead of an empty one).

    Oracle note: DuckDB has no md5(BLOB); since the payload is
    encode(text) by construction, md5(text) hashes the identical
    UTF-8 byte sequence."""
    m = _media(spark, sf_dir)
    return (
        m.select("doc_id", F.md5(F.col("payload")).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


QUERIES["media_dedup_exact"] = media_dedup_exact

ORACLE_SQL["media_dedup_exact"] = """
    SELECT md5(text) AS digest,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS keeper_id
    FROM documents
    GROUP BY 1
"""


def media_dedup_perceptual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over image payloads
    (operators/multimodal.py:perceptual_near_duplicates): 64-bit
    dHash per image, 4 x 16-bit band candidate join, exact hamming per
    candidate. ``algorithm="dhash"`` + ``method="bytes"`` pin the
    all-integer pipeline (nearest-neighbor fold onto the metadata
    plane, 8x9 gradient grid), so the DuckDB oracle replays every
    index comparison exactly and the pair list hash-gates; the float
    DCT pHash and the real container decodes are pytest-gated
    (tests/test_multimodal.py)."""
    return mm.perceptual_near_duplicates(
        _media(spark, sf_dir), method="bytes", algorithm="dhash", max_hamming=3
    )


QUERIES["media_dedup_perceptual"] = media_dedup_perceptual

# byte_idx(r, c) = (((r*h//8)*w + (c*w//9)) * n) // (w*h) — the same
# nearest-neighbor fold the Python kernel uses; DuckDB lists are
# 1-indexed, bits pack MSB-first per 16-bit band, hamming = popcount of
# band xors. The img/grid/bands CTE chain is shared with the
# keep-one-groups oracle below.
def _bands_cte_sql(prefix: str, img_sql: str) -> str:
    """CTE chain ``{p}img → {p}grid → {p}bands`` replaying the dhash
    byte pipeline in SQL: byte_idx(r, c) = (((r*h//8)*w + (c*w//9)) *
    n) // (w*h) — the nearest-neighbor fold the Python kernel uses —
    DuckDB lists 1-indexed, bits packed MSB-first per 16-bit band.
    ONE builder for every side (train images, planted eval twins) so
    the grid/band arithmetic cannot drift between the two halves of
    one oracle (round-10 review)."""
    p = prefix
    return f"""{p}img AS ({img_sql}),
    {p}grid AS (
        SELECT doc_id,
               [CASE WHEN n > 0
                     THEN CAST(('0x' || substring(hx,
                          ((((i // 9) * h // 8) * w + ((i % 9) * w // 9)) * n // (w * h)) * 2 + 1,
                          2)) AS INT)
                     ELSE 0 END
                for i in generate_series(0, 71)] AS g
        FROM {p}img
    ),
    {p}bands AS (
        SELECT doc_id,
               [list_sum([CASE WHEN g[(k // 8) * 9 + (k % 8) + 1]
                                    > g[(k // 8) * 9 + (k % 8) + 2]
                               THEN CAST(power(2, 15 - (k - 16 * j)) AS BIGINT)
                               ELSE 0 END
                          for k in generate_series(16 * j, 16 * j + 15)])
                for j in generate_series(0, 3)] AS b
        FROM {p}grid
    )"""


_IMG_BANDS_CTE = _bands_cte_sql("", """
        SELECT doc_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n,
               (doc_id % 64) * 16 + 16 AS w,
               (doc_id % 48) * 16 + 16 AS h
        FROM documents WHERE doc_id % 3 = 0
    """)

ORACLE_SQL["media_dedup_perceptual"] = f"""
    WITH {_IMG_BANDS_CTE}
    SELECT CAST(a.doc_id AS BIGINT) AS id_a,
           CAST(c.doc_id AS BIGINT) AS id_b,
           CAST(bit_count(xor(coalesce(a.b[1], 0), coalesce(c.b[1], 0)))
              + bit_count(xor(coalesce(a.b[2], 0), coalesce(c.b[2], 0)))
              + bit_count(xor(coalesce(a.b[3], 0), coalesce(c.b[3], 0)))
              + bit_count(xor(coalesce(a.b[4], 0), coalesce(c.b[4], 0))) AS INTEGER)
               AS hamming,
           (bit_count(xor(coalesce(a.b[1], 0), coalesce(c.b[1], 0)))
              + bit_count(xor(coalesce(a.b[2], 0), coalesce(c.b[2], 0)))
              + bit_count(xor(coalesce(a.b[3], 0), coalesce(c.b[3], 0)))
              + bit_count(xor(coalesce(a.b[4], 0), coalesce(c.b[4], 0)))) <= 3
               AS is_near_dup
    FROM bands a JOIN bands c
      ON a.doc_id < c.doc_id
     AND (coalesce(a.b[1], 0) = coalesce(c.b[1], 0)
       OR coalesce(a.b[2], 0) = coalesce(c.b[2], 0)
       OR coalesce(a.b[3], 0) = coalesce(c.b[3], 0)
       OR coalesce(a.b[4], 0) = coalesce(c.b[4], 0))
"""


def media_dedup_perceptual_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one perceptual dedup (operators/multimodal.py:
    perceptual_dedup_groups): one (doc_id, keeper_id) row per image,
    keeper = min doc_id of the hamming ≤ 3 connected component. The
    LINEAR scale path next to media_dedup_perceptual's inherently
    quadratic pair list — pairing, edges, and connected components all
    run at distinct-hash cardinality (sf1 probe: the pair query's 10x
    exact-copy stress multiplies output ~100x; this one's output stays
    one row per image). Oracle: same bands CTE + doc-level transitive
    closure by recursive CTE (same-hash docs connect through their
    hamming-0 pair, so doc-level closure ≡ the operator's hash-level
    CC expanded through members)."""
    return mm.perceptual_dedup_groups(
        _media(spark, sf_dir), method="bytes", algorithm="dhash", max_hamming=3
    )


QUERIES["media_dedup_perceptual_groups"] = media_dedup_perceptual_groups

ORACLE_SQL["media_dedup_perceptual_groups"] = f"""
    WITH RECURSIVE {_IMG_BANDS_CTE},
    prs AS (
        SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
        FROM bands a JOIN bands c
          ON a.doc_id < c.doc_id
         AND (coalesce(a.b[1], 0) = coalesce(c.b[1], 0)
           OR coalesce(a.b[2], 0) = coalesce(c.b[2], 0)
           OR coalesce(a.b[3], 0) = coalesce(c.b[3], 0)
           OR coalesce(a.b[4], 0) = coalesce(c.b[4], 0))
        WHERE (bit_count(xor(coalesce(a.b[1], 0), coalesce(c.b[1], 0)))
             + bit_count(xor(coalesce(a.b[2], 0), coalesce(c.b[2], 0)))
             + bit_count(xor(coalesce(a.b[3], 0), coalesce(c.b[3], 0)))
             + bit_count(xor(coalesce(a.b[4], 0), coalesce(c.b[4], 0)))) <= 3
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM prs
        UNION ALL
        SELECT doc_b, doc_a FROM prs
    ),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM bands
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(min(r) AS BIGINT) AS keeper_id
    FROM reach GROUP BY id
"""


def media_dedup_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs (operators/multimodal.py:
    audio_near_duplicates): 64-bit energy-delta fingerprint per clip —
    64 equal sample blocks, block energy = Σ|sample| in exact
    integers, bit = energy rises to the next block (wraparound) —
    through the shared 4 x 16-bit banding. ``method="bytes"`` pins the
    signed-int8 sample interpretation so the DuckDB oracle replays the
    block arithmetic exactly; the WAV container branch and the
    amplitude-invariance property are pytest-gated."""
    return mm.audio_near_duplicates(
        _media(spark, sf_dir), method="bytes", max_hamming=3
    )


QUERIES["media_dedup_audio"] = media_dedup_audio

# sample i = signed int8 from hex pair i; block k = samples
# [k*n//64, (k+1)*n//64); bit k = e[k] > e[(k+1) % 64]; bands/hamming
# identical to media_dedup_perceptual.
ORACLE_SQL["media_dedup_audio"] = """
    WITH au AS (
        SELECT doc_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents WHERE doc_id % 3 = 1
    ),
    en AS (
        SELECT doc_id,
               [coalesce(list_sum(
                    [abs(CASE WHEN CAST(('0x' || substring(hx, i * 2 + 1, 2)) AS INT) > 127
                              THEN CAST(('0x' || substring(hx, i * 2 + 1, 2)) AS INT) - 256
                              ELSE CAST(('0x' || substring(hx, i * 2 + 1, 2)) AS INT) END)
                     for i in generate_series(k * n // 64, (k + 1) * n // 64 - 1)]
               ), 0) for k in generate_series(0, 63)] AS e
        FROM au
    ),
    bands AS (
        SELECT doc_id,
               [list_sum([CASE WHEN e[k + 1] > e[(k + 1) % 64 + 1]
                               THEN CAST(power(2, 15 - (k - 16 * j)) AS BIGINT)
                               ELSE 0 END
                          for k in generate_series(16 * j, 16 * j + 15)])
                for j in generate_series(0, 3)] AS b
        FROM en
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a,
           CAST(c.doc_id AS BIGINT) AS id_b,
           CAST(bit_count(xor(coalesce(a.b[1], 0), coalesce(c.b[1], 0)))
              + bit_count(xor(coalesce(a.b[2], 0), coalesce(c.b[2], 0)))
              + bit_count(xor(coalesce(a.b[3], 0), coalesce(c.b[3], 0)))
              + bit_count(xor(coalesce(a.b[4], 0), coalesce(c.b[4], 0))) AS INTEGER)
               AS hamming,
           (bit_count(xor(coalesce(a.b[1], 0), coalesce(c.b[1], 0)))
              + bit_count(xor(coalesce(a.b[2], 0), coalesce(c.b[2], 0)))
              + bit_count(xor(coalesce(a.b[3], 0), coalesce(c.b[3], 0)))
              + bit_count(xor(coalesce(a.b[4], 0), coalesce(c.b[4], 0)))) <= 3
               AS is_near_dup
    FROM bands a JOIN bands c
      ON a.doc_id < c.doc_id
     AND (coalesce(a.b[1], 0) = coalesce(c.b[1], 0)
       OR coalesce(a.b[2], 0) = coalesce(c.b[2], 0)
       OR coalesce(a.b[3], 0) = coalesce(c.b[3], 0)
       OR coalesce(a.b[4], 0) = coalesce(c.b[4], 0))
"""


def media_dedup_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs (operators/multimodal.py:
    video_near_duplicates): energy-delta fingerprint over 64 equal
    chunks of the frame byte stream (unsigned), shared banding.
    Relative block boundaries make uniformly re-timed copies hash
    identically (pytest-gated); the all-integer arithmetic hash-gates
    against the DuckDB oracle below."""
    return mm.video_near_duplicates(_media(spark, sf_dir), max_hamming=3)


QUERIES["media_dedup_video"] = media_dedup_video

# byte i is UNSIGNED (no sign fold-down); otherwise identical block /
# band / hamming arithmetic to media_dedup_audio.
ORACLE_SQL["media_dedup_video"] = """
    WITH vid AS (
        SELECT doc_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents WHERE doc_id % 3 = 2
    ),
    en AS (
        SELECT doc_id,
               [coalesce(list_sum(
                    [CAST(('0x' || substring(hx, i * 2 + 1, 2)) AS INT)
                     for i in generate_series(k * n // 64, (k + 1) * n // 64 - 1)]
               ), 0) for k in generate_series(0, 63)] AS e
        FROM vid
    ),
    bands AS (
        SELECT doc_id,
               [list_sum([CASE WHEN e[k + 1] > e[(k + 1) % 64 + 1]
                               THEN CAST(power(2, 15 - (k - 16 * j)) AS BIGINT)
                               ELSE 0 END
                          for k in generate_series(16 * j, 16 * j + 15)])
                for j in generate_series(0, 3)] AS b
        FROM en
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a,
           CAST(c.doc_id AS BIGINT) AS id_b,
           CAST(bit_count(xor(coalesce(a.b[1], 0), coalesce(c.b[1], 0)))
              + bit_count(xor(coalesce(a.b[2], 0), coalesce(c.b[2], 0)))
              + bit_count(xor(coalesce(a.b[3], 0), coalesce(c.b[3], 0)))
              + bit_count(xor(coalesce(a.b[4], 0), coalesce(c.b[4], 0))) AS INTEGER)
               AS hamming,
           (bit_count(xor(coalesce(a.b[1], 0), coalesce(c.b[1], 0)))
              + bit_count(xor(coalesce(a.b[2], 0), coalesce(c.b[2], 0)))
              + bit_count(xor(coalesce(a.b[3], 0), coalesce(c.b[3], 0)))
              + bit_count(xor(coalesce(a.b[4], 0), coalesce(c.b[4], 0)))) <= 3
               AS is_near_dup
    FROM bands a JOIN bands c
      ON a.doc_id < c.doc_id
     AND (coalesce(a.b[1], 0) = coalesce(c.b[1], 0)
       OR coalesce(a.b[2], 0) = coalesce(c.b[2], 0)
       OR coalesce(a.b[3], 0) = coalesce(c.b[3], 0)
       OR coalesce(a.b[4], 0) = coalesce(c.b[4], 0))
"""


# --------------------------------------------------------------- round 10
# Perceptual train/eval contamination (VERDICT r9 #6): the image-side
# split audit mirroring contamination_semantic. The eval set is
# PLANTED RE-ENCODED TWINS — every MEDIA_EVAL_MOD-th image doc
# re-emitted under doc_id+MEDIA_EVAL_OFFSET with its first character
# replaced ('x' re-encode artifact: different bytes, so raw-byte md5
# dedup misses it) while the metadata plane (w, h) stays the SOURCE's.
# For ASCII-leading texts the byte length is preserved and only grid
# row 0 comparisons can flip, so most twins land within hamming ≤ 3 of
# their source; multibyte-leading texts shift every sampled index and
# (deterministically, on both engines) escape — the honest recall
# boundary of perceptual hashing under re-encoding, stated here rather
# than hidden.

MEDIA_EVAL_MOD = 15
MEDIA_EVAL_OFFSET = 2_000_000


def _media_eval_twins(docs: DataFrame) -> DataFrame:
    """Planted re-encoded eval twins (module note) in the canonical
    media shape — built by synthesize_media itself over the
    twin-texted source rows (round-10 review: re-spelling the
    payload/meta construction here would silently diverge if the
    synthesis formula ever changed). The meta plane derives from the
    SOURCE doc_id — a re-encode keeps the image plane — and the id is
    offset above the train range only AFTER synthesis; MEDIA_EVAL_MOD
    is a multiple of 3, so every source row is media_type='image'."""
    from sfcrimedatapipeline_spark.operators.multimodal import synthesize_media

    src = docs.filter(F.col("doc_id") % MEDIA_EVAL_MOD == 0).withColumn(
        "text", F.concat(F.lit("x"), F.expr("substring(text, 2, length(text))"))
    )
    return synthesize_media(src).withColumn(
        "doc_id", F.col("doc_id") + MEDIA_EVAL_OFFSET
    )


def media_contamination_perceptual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which eval images have a re-encoded twin in the training
    corpus? (operators/multimodal.py:perceptual_contamination —
    banded Hamming pairing over DISTINCT perceptual hashes with
    multiplicity weights on both splits, VERDICT r11 #2; eval never
    triggers a train×train pass and duplicate-heavy media never goes
    quadratic). Report shape: ONE row per CONTAMINATED eval item —
    train-document match count plus the best (lowest-hamming,
    lowest-id) train twin — so the output is bounded by |eval|
    regardless of how promiscuous the perceptual space is (the raw
    pair list reads 178k rows at sf0.1 on this fixture's
    heavily-colliding byte-images)."""
    docs = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    return mm.perceptual_contamination(
        _media_eval_twins(docs),
        mm.synthesize_media(docs),
        method="bytes",
        algorithm="dhash",
        max_hamming=3,
    ).orderBy("eval_id")


QUERIES["media_contamination_perceptual"] = media_contamination_perceptual

_EVAL_BANDS_CTE = _bands_cte_sql("e", f"""
        SELECT doc_id + {MEDIA_EVAL_OFFSET} AS doc_id, hx, n, w, h FROM (
            SELECT doc_id,
                   hex(encode('x' || substring(text, 2))) AS hx,
                   octet_length(encode('x' || substring(text, 2))) AS n,
                   (doc_id % 64) * 16 + 16 AS w,
                   (doc_id % 48) * 16 + 16 AS h
            FROM documents WHERE doc_id % {MEDIA_EVAL_MOD} = 0
        ) s
    """)

ORACLE_SQL["media_contamination_perceptual"] = f"""
    WITH {_IMG_BANDS_CTE},
    {_EVAL_BANDS_CTE},
    cpairs AS (
        SELECT CAST(e.doc_id AS BIGINT) AS eval_id,
               CAST(t.doc_id AS BIGINT) AS train_id,
               CAST(bit_count(xor(coalesce(e.b[1], 0), coalesce(t.b[1], 0)))
                  + bit_count(xor(coalesce(e.b[2], 0), coalesce(t.b[2], 0)))
                  + bit_count(xor(coalesce(e.b[3], 0), coalesce(t.b[3], 0)))
                  + bit_count(xor(coalesce(e.b[4], 0), coalesce(t.b[4], 0)))
                  AS BIGINT) AS hamming
        FROM ebands e JOIN bands t
          ON (coalesce(e.b[1], 0) = coalesce(t.b[1], 0)
           OR coalesce(e.b[2], 0) = coalesce(t.b[2], 0)
           OR coalesce(e.b[3], 0) = coalesce(t.b[3], 0)
           OR coalesce(e.b[4], 0) = coalesce(t.b[4], 0))
    )
    SELECT eval_id,
           CAST(count(*) AS BIGINT) AS n_train_matches,
           CAST(min([hamming, train_id])[1] AS INTEGER) AS best_hamming,
           CAST(min([hamming, train_id])[2] AS BIGINT) AS best_train_id
    FROM cpairs
    WHERE hamming <= 3
    GROUP BY eval_id
    ORDER BY eval_id
"""
