"""URL / domain-level curation — the C4/RefinedWeb web-corpus layer
(VERDICT r9 #4: the one standard pretraining curation family the
engine was missing).

Four operators, all pure Catalyst expressions (regexp / string /
higher-order array functions — zero Python in the hot path) so the
whole layer stays inside whole-stage codegen at 100 TB:

- :func:`canonical_url` / :func:`url_domain` — column builders:
  lowercase scheme+host, strip the fragment, strip default ports
  (:80 http / :443 https), strip a leading ``www.``, strip trailing
  slashes, drop tracking query params (``utm_*``/``fbclid``/
  ``gclid``) while preserving the remaining params' order.
- :func:`url_exact_dedup` — canonical-URL exact dedup: ONE hash
  groupBy on the canonical string (the md5-fingerprint discipline of
  operators/dedup.py:dedup_exact applied to the URL key).
- :func:`domain_cap` — C4-style per-domain document cap (keep the
  ``cap`` lowest doc ids): SALTED TWO-PHASE top-K, so a
  billion-document domain never becomes one task's sort buffer —
  phase 1 ranks within (domain, salt) and keeps ≤cap per salt
  (correct: the global cap smallest ids of a domain are distributed
  among salts, and each salt's local cap smallest is a superset of
  its share of them), phase 2 ranks the ≤cap·n_salts survivors per
  domain. Phase-2 skew is bounded by cap·n_salts rows per domain BY
  CONSTRUCTION, independent of domain size.
- :func:`web_dispositions` — the composed funnel: blocklist →
  canonical-URL dedup → domain cap, each document receiving exactly
  ONE disposition in priority order (the curate_corpus partition
  contract, operators/corpus.py:1074).

Domain note: ``url_domain`` returns the canonical HOST. Registrable
e-TLD+1 extraction needs the Public Suffix List — a deployment plugs
a broadcast PSL lookup table join here; the cap/blocklist operators
are agnostic to which definition the domain column carries.

Reference parity: the reference pipeline (/root/reference/dags/ELT.py)
has no web-curation surface — this is the LLM-training-data extension
family (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: query params dropped by canonicalization (C4 convention); shared
#: verbatim with the DuckDB oracle so the two sides cannot drift.
#: Case-insensitive (UTM_Source= tracks the same as utm_source=) and
#: matches valueless params ('?fbclid' with no '=') via the (=|$)
#: alternative — ADVICE r10. The inline (?i) works identically in
#: Java regex (Spark) and RE2 (DuckDB).
TRACKING_PARAM_RE = "^(?i)(utm_[a-z0-9_]*|fbclid|gclid)(=|$)"

#: phase-1 salt count for the two-phase domain cap. 16 spreads a hot
#: domain over 16 tasks; phase 2 then sorts ≤ cap·16 rows per domain.
CAP_SALTS = 16

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]+([^?#]*)"
#: anchored to before any fragment — a '?' INSIDE the fragment
#: ('#/route?tab=1', SPA-style) must not leak into the canonical
#: query key (ADVICE r10). Shared with the DuckDB oracle twin.
QUERY_CAPTURE_RE = "^[^?#]*\\?([^#]*)"


def _parts(url: Column) -> tuple[Column, Column, Column, Column, Column]:
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    # scheme-less / non-hierarchical inputs ('a.com/p', 'mailto:x@y')
    # have no '://' host — canonicalization must NOT degenerate them
    # to '://' (a silent mass-merge on real crawl data, ADVICE r10)
    hierarchical = hostport != ""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_replace(
        F.regexp_extract(url, _PATH_RE, 1), "/+$", ""
    )
    rawq = F.regexp_extract(url, QUERY_CAPTURE_RE, 1)
    kept = F.filter(
        F.split(rawq, "&"),
        lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != F.lit("")),
    )
    query = F.concat_ws("&", kept)
    return hierarchical, scheme, host, path, query


def canonical_url(url: Column) -> Column:
    """Canonical form of a raw URL column (module doc). Pure
    regexp/array expressions — codegen'd, no UDF. Non-hierarchical
    inputs (no ``scheme://host``) pass through UNCHANGED — raw-string
    equality is the only safe dedup key for them."""
    hierarchical, scheme, host, path, query = _parts(url)
    return F.when(
        hierarchical,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
                F.lit("")
            ),
        ),
    ).otherwise(url)


def url_domain(url: Column) -> Column:
    """Canonical host (lowercased, default port and leading ``www.``
    stripped) — the per-domain cap/blocklist key. NULL for
    non-hierarchical inputs (no ``scheme://host``) so cap/blocklist
    consumers can exclude them instead of lumping every such row into
    one empty-string pseudo-domain."""
    hierarchical, _, host, _, _ = _parts(url)
    return F.when(hierarchical, host)


def url_exact_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-URL exact dedup report: one row per canonical URL
    that occurs ≥2 times, with the kept (minimum) id and the copy
    count. One map-side-combinable groupBy on the canonical string —
    the text never shuffles, and the shuffle key is the short URL."""
    return (
        docs.select(
            F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    n_salts: int = CAP_SALTS,
) -> DataFrame:
    """Keep the ``cap`` lowest ``id_col`` documents per domain via the
    salted two-phase top-K (module doc) → the kept rows of ``docs``.

    Phase 1 is correct for ANY deterministic salt: within one salt the
    local cap-smallest ids include every global-cap-smallest id that
    hashed to that salt, so the union over salts is a superset of the
    global answer; phase 2 ranks that bounded superset exactly.
    """
    if cap < 1:
        raise ValueError(f"domain_cap needs cap >= 1, got {cap}")
    salted = docs.withColumn(
        "__salt", F.pmod(F.col(id_col).cast("long"), F.lit(n_salts))
    )
    w1 = Window.partitionBy(domain_col, "__salt").orderBy(F.col(id_col).asc())
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= cap)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(domain_col).orderBy(F.col(id_col).asc())
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def web_dispositions(
    docs: DataFrame,
    blocklist: list[str],
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document web-curation disposition, priority order
    ``blocked_domain`` → ``url_duplicate`` → ``domain_capped`` →
    ``kept`` (each document exactly one label, so the labels partition
    the corpus — the curate_corpus report contract). Blocklist and
    URL dedup are decided on ALL documents; the domain cap ranks only
    the still-eligible ones (the order a C4-style pipeline applies
    them). Returns ``docs`` + ``canonical_url``/``domain``/``__disp``.

    Scale shape: blocklist membership is an isin over a literal list
    (broadcast by construction); the dup decision is one groupBy on
    the canonical URL re-joined on the short key; the cap is the
    salted two-phase rank of :func:`domain_cap`. No step shuffles the
    document text more than once.
    """
    base = docs.withColumn(
        "canonical_url", canonical_url(F.col(url_col))
    ).withColumn("domain", url_domain(F.col(url_col)))
    # a NULL domain (non-hierarchical URL) is never blocked and never
    # capped — it has no domain key; it still participates in URL
    # dedup on its raw-string canonical form (ADVICE r10)
    blocked = F.coalesce(F.col("domain").isin(blocklist), F.lit(False))
    keep_ids = (
        base.filter(~blocked)
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("__keep_id"))
    )
    flagged = base.join(keep_ids, "canonical_url", "left").withColumn(
        "__is_dup",
        (~blocked)
        & F.col("__keep_id").isNotNull()
        & (F.col(id_col) != F.col("__keep_id")),
    )
    eligible = flagged.filter(
        ~blocked & ~F.col("__is_dup") & F.col("domain").isNotNull()
    )
    capped_kept = domain_cap(
        eligible.select(id_col, "domain"), cap=cap, id_col=id_col
    ).select(F.col(id_col).alias("__kept_id"))
    out = flagged.join(
        capped_kept, flagged[id_col] == F.col("__kept_id"), "left"
    ).withColumn(
        "__disp",
        F.when(blocked, F.lit("blocked_domain"))
        .when(F.col("__is_dup"), F.lit("url_duplicate"))
        .when(
            F.col("__kept_id").isNull() & F.col("domain").isNotNull(),
            F.lit("domain_capped"),
        )
        .otherwise(F.lit("kept")),
    )
    return out.drop("__keep_id", "__is_dup", "__kept_id")
