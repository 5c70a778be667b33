"""Iterative graph algorithms beyond connected components
(operators/corpus.py): PageRank over a pair graph.

The corpus use: rank documents inside a near-duplicate / citation /
link graph to pick cluster representatives by centrality instead of
min-id, and to weight crawl frontiers.

Scale shape (per iteration): the out-degree join is loop-INVARIANT,
so it is folded into the persisted edge list once; each round is then
``edges ⋈ ranks`` on src (edges pre-partitioned by src and persisted,
so only the node-cardinality ranks side shuffles) followed by a
map-side-combined ``groupBy(dst).sum()``. On the undirected path the
mirrored edge list gives every node in-degree ≥ 1, so the per-round
"nodes LEFT JOIN contribs" backfill is provably a no-op and is
skipped — two joins per round become one. The edge partition count
tracks edge volume (bounded by the session parallelism) instead of
inheriting the static shuffle setting, so a tiny graph schedules a
handful of tasks per round while a cluster-scale graph still fans
out. Lineage is truncated every second round exactly as in
connected_components — executor-local by default, or a RELIABLE
checkpoint dir via ``checkpoint_dir=`` for cluster jobs. Dangling-node
mass is redistributed uniformly via a 1-row aggregate, never a collect
of rows.

Rank values are IEEE double sums whose low bits depend on aggregation
order, so the driver query is rows-only by design; the numeric
contract (parity with a dense numpy power iteration to 1e-12, rank
mass ≈ 1) is pinned in tests/test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    damping: float = 0.85,
    iters: int = 10,
    undirected: bool = True,
    checkpoint_dir: str | None = None,
    deterministic: bool = False,
) -> DataFrame:
    """PageRank over the pair graph → ``(doc_id, rank)``; ranks sum to
    ~1. ``undirected=True`` mirrors every edge first (the near-dup
    graph is symmetric). ``checkpoint_dir`` switches lineage truncation
    from executor-local blocks to a RELIABLE checkpoint under that path
    — the cluster setting, where losing an executor must not lose the
    iteration state (functions/caching.py:truncate_lineage)."""
    fwd = pairs.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    )
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        if undirected
        else fwd
    )
    edges = edges.persist()  # upstream may be a whole dedup pipeline
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    # Fold the loop-invariant out-degree into the edge list ONCE, and
    # pre-partition it by the join key so each round shuffles only the
    # node-cardinality ranks frame. Partition count tracks edge volume
    # (~1M edges/partition) up to the session parallelism — a static
    # shuffle.partitions would schedule that many near-empty tasks per
    # round on a small graph.
    spark = edges.sparkSession
    e_cnt = edges.count()
    parts = max(1, min(spark.sparkContext.defaultParallelism, 1 + e_cnt // 1_000_000))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = (
        edges.join(out_deg, "src").repartition(parts, "src").persist()
    )
    edges_deg.count()

    # deterministic=True swaps the contribution sum for the Q40
    # fixed-point aggregate (functions/fixedpoint.py): floor-quantized
    # contributions sum exactly in any order, so the rank trace is
    # bit-identical across partitionings AND engines — what upgraded
    # pagerank_dup_graph from rows-only to value-hash gated (its old
    # blocker was precisely "aggregation-order-dependent low bits").
    # Quantization bias per round is ≤ in-degree·2^-40 ≈ 1e-10 on rank
    # mass — far below any ranking decision.
    from sfcrimedatapipeline_spark.functions.fixedpoint import sql_fx, sql_unfx

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        joined = edges_deg.join(ranks, edges_deg.src == ranks.id)
        if deterministic:
            contribs = (
                joined.select(
                    F.col("dst").alias("id"),
                    F.expr(sql_fx("rank / CAST(deg AS DOUBLE)")).alias("c_fx"),
                )
                .groupBy("id")
                .agg(F.expr(f"{sql_unfx('sum(c_fx)')} ").alias("contrib"))
            )
        else:
            contribs = (
                joined.select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("contrib"))
            )
        # mass parked on dangling nodes (no out-edges) spreads uniformly.
        # An undirected graph cannot have dangling nodes (every node is
        # an edge endpoint, so out_deg >= 1 after mirroring): skip the
        # per-round aggregate action entirely — on a tiny graph the
        # round's wall time is dominated by action count, not data.
        if undirected:
            dangling = 0.0
        else:
            dangling = (
                ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
                .first()["m"]
            )
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping)
            * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
        ).alias("rank")
        if undirected:
            # mirrored edges ⇒ every node has in-degree ≥ 1 ⇒ contribs
            # already covers the full node set; the backfill join is a
            # provable no-op, so each round is one join + one agg.
            ranks = contribs.select("id", new_rank)
        else:
            ranks = nodes.join(contribs, "id", "left").select("id", new_rank)
        # truncate lineage every SECOND round (and on the last): a
        # 2-round-deep plan is still tiny, and halving the eager
        # checkpoint actions halves the wall time on small graphs,
        # where per-action scheduling dominates
        if it % 2 == 1 or it == iters - 1:
            from sfcrimedatapipeline_spark.functions.caching import (
                truncate_lineage,
            )

            ranks = truncate_lineage(ranks, checkpoint_dir, eager=True)
    edges.unpersist()
    edges_deg.unpersist()
    nodes.unpersist()
    return ranks.select(F.col("id").alias("doc_id"), "rank")


def triangle_count(
    pairs: DataFrame, src_col: str = "doc_a", dst_col: str = "doc_b"
) -> DataFrame:
    """Global triangle count over an undirected pair graph — the
    standard clustering-density diagnostic for a near-dup graph (how
    transitive are the dup relations?). Returns one row: n_triangles.

    Canonicalize every edge to (lo, hi), then count ordered chains
    a<b<c where (a,b),(b,c),(a,c) are all edges — each triangle counted
    exactly once, via two equi-joins on node keys (the standard
    relational formulation; at scale the joins hash-partition on the
    shared node and AQE handles hub skew).
    """
    from sfcrimedatapipeline_spark.functions.caching import (
        unpersist_when_released,
    )

    e = (
        pairs.select(
            F.least(F.col(src_col), F.col(dst_col)).cast("long").alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).cast("long").alias("hi"),
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .persist()  # released when the result frame is (ADVICE r4)
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.hi") == F.col("bc.lo"))
        .join(
            ac,
            (F.col("ac.lo") == F.col("ab.lo")) & (F.col("ac.hi") == F.col("bc.hi")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return unpersist_when_released(tri, e)


def clustering_coefficients(
    pairs: DataFrame, src_col: str = "doc_a", dst_col: str = "doc_b"
) -> DataFrame:
    """Local clustering coefficient per node → ``(doc_id, degree,
    n_triangles, clustering_coeff)`` with coeff = 2·T(v) / (d(v)·(d(v)−1))
    — how clique-like each node's neighborhood is (a near-dup cluster
    member scores ~1, a hub stitching unrelated docs scores ~0, the
    standard triage between the two).

    Same relational shape as :func:`triangle_count` — canonical (lo,hi)
    edges, two equi-joins enumerate each triangle a<b<c exactly once —
    then each triangle is EXPLODED to its three corners and one
    map-side-combined count per node joins the degree frame. Exact
    integer arithmetic to one final divide. Degree-1 nodes (no possible
    wedge) report coeff 0.0.
    """
    from sfcrimedatapipeline_spark.functions.caching import (
        unpersist_when_released,
    )

    e = (
        pairs.select(
            F.least(F.col(src_col), F.col(dst_col)).cast("long").alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).cast("long").alias("hi"),
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("lo").alias("id"))
        .union(e.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri_nodes = (
        ab.join(bc, F.col("ab.hi") == F.col("bc.lo"))
        .join(
            ac,
            (F.col("ac.lo") == F.col("ab.lo")) & (F.col("ac.hi") == F.col("bc.hi")),
        )
        .select(
            F.explode(
                F.array(F.col("ab.lo"), F.col("ab.hi"), F.col("bc.hi"))
            ).alias("id")
        )
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    dd = F.col("degree").cast("double")
    out = (
        deg.join(tri_nodes, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.when(
                F.col("degree") >= 2,
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (dd * (dd - F.lit(1.0))),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )
    return unpersist_when_released(out, e)


def bfs_distances(
    pairs: DataFrame,
    seed_pred,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_hops: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS over the undirected pair graph: hop distance
    from the nearest seed (``seed_pred``: a Column predicate over
    ``id``) for every REACHED node — "how many near-dup hops from a
    known-bad document", the contamination-spread query over a dup
    graph.

    Per round: one equi-join of the (non-self-loop) edge list against
    the current frontier labels, a +1 neighbor min, a union with the
    standing labels, and one map-side-combined min — the same
    one-shuffle-per-round dataflow as connected_components. Distances
    are INTEGERS, monotonically non-increasing per node, so
    convergence is an exact scalar probe (reached-count + distance
    sum), and the whole output is oracle-checkable bit-for-bit
    (unlike PageRank's float ranks). ``max_hops`` bounds the rounds;
    unreached nodes emit no row (mirroring the recursive-CTE oracle).
    """
    fwd = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    labels = nodes.filter(seed_pred(F.col("id"))).withColumn(
        "distance", F.lit(0).cast("int")
    )
    from sfcrimedatapipeline_spark.functions.caching import truncate_lineage

    prev_probe = None
    for _ in range(max_hops):
        via_nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg((F.min("distance") + 1).cast("int").alias("distance"))
            .withColumnRenamed("src", "id")
        )
        labels = truncate_lineage(
            labels.unionByName(via_nbr).groupBy("id").agg(
                F.min("distance").alias("distance")
            ),
            checkpoint_dir,
        )
        row = labels.agg(
            F.count("*").alias("n"),
            F.sum(F.col("distance").cast("decimal(38,0)")).alias("s"),
        ).first()
        probe = (row["n"], row["s"])
        if probe == prev_probe:
            break
        prev_probe = probe
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), "distance")


def k_core(
    pairs: DataFrame,
    k: int = 2,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core decomposition at fixed ``k``: the maximal subgraph in
    which every node keeps degree ≥ k — the web-graph screen that
    separates densely-corroborated documents from stragglers a
    near-dup pair list alone can't rank (a node can have high degree
    purely from spam satellites that the peel removes from under it).

    Peeling, relationally: each round recomputes degrees with ONE
    map-side-combined count over the mirrored alive-edge list, drops
    the sub-k nodes, and keeps edges whose BOTH endpoints survive via
    two left-semi joins against the node-cardinality survivor frame.
    The survivor set shrinks monotonically, so an unchanged COUNT (an
    aggregate scalar probe, never a row collect) proves an unchanged
    SET and the fixed point. Lineage is truncated per round
    (functions/caching.py — executor-local, or reliable via
    ``checkpoint_dir=``). Rounds are bounded by the peel depth, not
    |V|: each round removes every currently sub-k node at once.

    The output (doc_id, degree within the k-core) is exact integers,
    and the peel is IDEMPOTENT past its fixed point: once no node is
    sub-k, further rounds change nothing. So a FIXED round count ≥ the
    peel depth replays the converged answer exactly, and the driver
    query (graph_kcore_dup) is value-hash gated against a DuckDB
    oracle that unrolls ``KCORE_ROUNDS`` peel rounds as MATERIALIZED
    CTEs (plans/corpus_queries.py:_kcore_oracle_sql); the plan-level
    query asserts round ``KCORE_ROUNDS`` equals round
    ``KCORE_ROUNDS-1`` (idempotence = convergence proof). The
    pure-Python peeling parity test (tests/test_graph.py) additionally
    pins the run-to-convergence semantics this fixed-round contract
    stands in for.

    Convergence margin, MEASURED (VERDICT r9 #9): the dup graph's peel
    depth (:func:`k_core_peel_depth`) is **1 round at sf0.001, sf0.01,
    and sf0.1** — LSH near-dup components are dense cliques plus
    degree-1 satellites, so one peel removes every sub-k node and the
    survivor set is immediately stable — leaving an 11-round margin
    under ``KCORE_ROUNDS=12``. Depth grows with CHAIN-like structures
    (a path of length L peels in ~L/2 rounds), not with data volume:
    the realistic growth model (SCALE_PROBE unique mode — duplicate
    GROUP COUNT grows, group size doesn't) replicates the within-group
    structure per copy and leaves the depth scale-invariant.
    ``tests/test_round10_fixes.py`` asserts depth + 2 ≤ KCORE_ROUNDS
    at both gate SFs each run, so silent erosion of the margin fails
    CI before it can break the gate.
    """
    return _k_core_loop(
        pairs, k, src_col, dst_col, max_iters, checkpoint_dir
    )[0]


def k_core_peel_depth(
    pairs: DataFrame,
    k: int = 2,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 50,
    checkpoint_dir: str | None = None,
) -> int:
    """Measured PEEL DEPTH of the k-core fixed point: the number of
    productive peel rounds before the survivor count stabilizes — the
    quantity the fixed-round gate contract (``KCORE_ROUNDS``) must
    dominate for the unrolled oracle to equal run-to-convergence
    (VERDICT r9 #9). Raises if ``max_iters`` rounds don't converge, so
    a passing call IS a convergence proof at that bound."""
    _, depth, converged = _k_core_loop(
        pairs, k, src_col, dst_col, max_iters, checkpoint_dir
    )[0:3]
    if not converged:
        raise RuntimeError(
            f"k-core peel did not converge within {max_iters} rounds"
        )
    return depth


def _k_core_loop(
    pairs: DataFrame,
    k: int,
    src_col: str,
    dst_col: str,
    max_iters: int,
    checkpoint_dir: str | None,
) -> tuple[DataFrame, int, bool]:
    """Shared peel loop → (core frame, productive-round count,
    converged flag). ``depth`` counts rounds whose survivor set
    CHANGED; the terminating equal-count round is the idempotence
    witness, not a productive round."""
    from sfcrimedatapipeline_spark.functions.caching import truncate_lineage

    fwd = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    alive = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev = -1
    core = None
    depth = 0
    converged = False
    for rnd in range(max_iters):
        deg = alive.groupBy("src").agg(F.count("*").cast("long").alias("degree"))
        core = deg.filter(F.col("degree") >= k)
        n = core.count()
        if n == prev:
            converged = True
            break
        depth = rnd + 1
        prev = n
        keep = core.select("src")
        alive = truncate_lineage(
            alive.join(keep, "src", "left_semi").join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            ),
            checkpoint_dir,
        )
    out = core.select(F.col("src").alias("doc_id"), "degree")
    return out, depth, converged


def label_propagation(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    rounds: int = 3,
    checkpoint_dir: str | None = None,
    adaptive: bool = False,
) -> DataFrame:
    """Synchronous LABEL PROPAGATION community detection (Raghavan et
    al. 2007) over the pair graph → ``(doc_id, community_id)``.
    DETERMINISTIC variant: every node starts labeled with its own id;
    each round ALL nodes simultaneously adopt their neighbors' most
    frequent previous-round label, ties broken by the SMALLEST label.
    No randomized visit order, no partition-order dependence — a fixed
    round count replays exactly, so the result can be hash-gated
    against an oracle that unrolls the same rounds in SQL (unlike
    classic asynchronous LPA, whose output depends on update order).

    Scale shape: per round, ONE shuffle of the node-cardinality label
    frame into the pre-partitioned edge join (the pagerank discipline:
    edges carry the loop-invariant partitioning), then two MAP-SIDE-
    COMBINABLE aggregates — ``groupBy(node, label).count`` and the
    argmax via ``groupBy(node).max(struct(cnt, -label))``. No window:
    a celebrity node's degree never becomes one task's sort buffer.
    Lineage truncated every second round (``checkpoint_dir`` switches
    to reliable checkpoints for the cluster setting).

    Round-count guidance (VERDICT r6 #5): a fixed ``rounds`` keeps the
    output deterministic and hash-gateable, but label information only
    travels ``rounds`` hops — on a graph whose communities have larger
    diameter, a too-small count fragments them silently. Before fixing
    ``rounds`` on a new corpus, run :func:`lpa_convergence` (same loop,
    same arguments) and read the per-round changed-label counts: pick
    the smallest round where ``n_changed`` reaches its fixpoint plateau
    (0, or the stable oscillation floor — synchronous LPA can 2-cycle
    on bipartite-ish structures, so a small non-zero plateau is the
    converged state, not a bug). On the gated MinHash near-dup graph
    the probe shows the plateau inside 3 rounds
    (tests/test_graph.py::test_lpa_convergence_probe pins it); near-dup
    clusters are dense and low-diameter, so this transfers to 100 TB —
    duplicate-cluster diameter doesn't grow with corpus size.

    ``adaptive=True`` (VERDICT r7 #6) USES the convergence probe's
    measurement instead of asking the operator to guess: the loop stops
    at the first round where ``n_changed = 0`` (a true fixpoint —
    labels that didn't change under a synchronous update never change
    again), with ``rounds`` acting as the hard cap (synchronous LPA can
    2-cycle on bipartite-ish structures, where changed never hits 0 and
    the cap is the stop). Costs one scalar count per round — the same
    bounded action the probe already pays. The gated queries keep the
    fixed deterministic 3-round twin (an oracle must unroll a STATIC
    round count); adaptive is the production entry point for graphs
    whose diameter is unknown.
    """
    labels, _ = _lpa_run(
        pairs,
        src_col,
        dst_col,
        rounds,
        checkpoint_dir,
        track_changes=False,
        adaptive=adaptive,
    )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("community_id")
    )


def lpa_convergence(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    rounds: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Convergence probe for :func:`label_propagation` (VERDICT r6 #5):
    runs the SAME synchronous rounds and returns one row per round —
    ``(round_no, n_changed)``, the count of nodes whose label differs
    from the previous round. ``n_changed`` hitting its plateau tells
    you the fixed round count has reached the fixpoint; a value still
    falling at the last round means communities are fragmented and
    ``rounds`` must grow. Driver cost: one scalar count per round
    (bounded — never a row collect)."""
    labels, changed = _lpa_run(
        pairs, src_col, dst_col, rounds, checkpoint_dir, track_changes=True
    )
    spark = labels.sparkSession
    return spark.createDataFrame(changed, "round_no int, n_changed long")


def _lpa_run(
    pairs: DataFrame,
    src_col: str,
    dst_col: str,
    rounds: int,
    checkpoint_dir: str | None,
    track_changes: bool,
    adaptive: bool = False,
) -> tuple[DataFrame, list[tuple[int, int]]]:
    """Shared synchronous-LPA loop. Returns (final labels, per-round
    changed counts — empty unless track_changes/adaptive). With
    ``adaptive``, stops early at the first changed = 0 round (``rounds``
    is the cap)."""
    fwd = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    spark = edges.sparkSession
    e_cnt = edges.count()
    parts = max(
        1, min(spark.sparkContext.defaultParallelism, 1 + e_cnt // 1_000_000)
    )
    edges_p = edges.repartition(parts, "src").persist()
    edges_p.count()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    changed: list[tuple[int, int]] = []
    for r in range(rounds):
        nb = edges_p.join(labels, edges_p.src == labels.id).select(
            F.col("dst").alias("node"), "label"
        )
        cnt = nb.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        new_labels = (
            cnt.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
                ).alias("m")
            )
            .select(F.col("node").alias("id"), (-F.col("m.neg")).alias("label"))
        )
        if track_changes or adaptive or r % 2 == 1 or r == rounds - 1:
            from sfcrimedatapipeline_spark.functions.caching import (
                truncate_lineage,
            )

            # when probing, truncate EVERY round so the per-round count
            # below doesn't recompute the chain it just measured
            new_labels = truncate_lineage(new_labels, checkpoint_dir, eager=True)
        if track_changes or adaptive:
            prev = labels.select("id", F.col("label").alias("__old"))
            n = (
                new_labels.join(prev, "id")
                .filter(F.col("label") != F.col("__old"))
                .count()  # bounded: one scalar per round
            )
            changed.append((r + 1, n))
            if adaptive and n == 0:
                # synchronous fixpoint: an unchanged label vector maps
                # to itself every following round — stop here
                labels = new_labels
                break
        labels = new_labels
    edges.unpersist()
    edges_p.unpersist()
    return labels, changed


def hits(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    iters: int = 4,
    deterministic: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities over the near-dup pair
    graph, directed LATER→EARLIER document (``greatest(id) →
    least(id)``): a later near-duplicate "cites" the earlier original,
    so high AUTHORITY marks the originals that copies converge on and
    high HUB marks the aggregator/compilation documents that overlap
    many originals — the directional provenance ranking PageRank's
    undirected centrality can't separate.

    Per round: a ← Eᵀh, L1-normalize; h ← Ea, L1-normalize. With
    ``deterministic=True`` both the contribution sums and the L1
    totals go through the Q40 fixed point (functions/fixedpoint.py),
    and each normalization is one double division of engine-exact
    operands — the pagerank(deterministic=True) discipline, so the
    full (hub, authority) trace is bit-identical across partitionings
    and engines and the query hash-gates. Nodes with no in-edges keep
    authority 0 (resp. hubs for no out-edges) via the spine backfill.

    Scale shape: one join + one map-side-combined aggregate per
    half-round over an edge list pre-partitioned on its join key; the
    L1 totals are 1-row aggregates (never a collect); lineage is
    truncated every second round (executor-local, or reliable via
    ``checkpoint_dir=``).
    """
    from sfcrimedatapipeline_spark.functions.caching import (
        truncate_lineage,
        unpersist_when_released,
    )
    from sfcrimedatapipeline_spark.functions.fixedpoint import sql_fx, sql_unfx

    if iters < 1:
        # with zero rounds `a` would stay None below and the output
        # join would crash; half a round is also not HITS (ADVICE r9)
        raise ValueError(f"hits() needs iters >= 1, got {iters}")

    edges = (
        pairs.select(
            F.greatest(
                F.col(src_col).cast("long"), F.col(dst_col).cast("long")
            ).alias("src"),
            F.least(
                F.col(src_col).cast("long"), F.col(dst_col).cast("long")
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    nodes.count()

    fx_sum_v = sql_unfx("sum(" + sql_fx("v") + ")") + " + 0.0"
    fx_sum_raw = sql_unfx("sum(" + sql_fx("raw") + ")") + " + 0.0"

    def _contrib(joined: DataFrame, key: str) -> DataFrame:
        g = joined.groupBy(F.col(key).alias("id"))
        if deterministic:
            return g.agg(F.expr(fx_sum_v).alias("raw"))
        return g.agg(F.sum("v").alias("raw"))

    # the loop works on SPARSE vectors (only nodes with a nonzero
    # value): a missing entry is exactly 0 and contributes nothing to
    # the next half-round's join, so the per-round dense spine backfill
    # would be a provable no-op — the dense frame materializes ONCE at
    # output. Each half-round's raw frame is eagerly lineage-truncated
    # (persisted) BEFORE its L1 total is taken, so the total and every
    # downstream consumer ride the cache instead of re-deriving the
    # full iteration chain per action.
    def _normalize(raw: DataFrame) -> DataFrame:
        raw = truncate_lineage(raw, checkpoint_dir, eager=True)
        if deterministic:
            tot = raw.agg(F.expr(fx_sum_raw).alias("t"))
        else:
            tot = raw.agg(F.sum("raw").alias("t"))
        return raw.crossJoin(F.broadcast(tot)).select(
            "id", (F.col("raw") / F.col("t")).alias("v")
        )

    h = nodes.select("id", F.lit(1.0).alias("v"))
    a = None
    for _ in range(iters):
        a = _normalize(
            _contrib(edges.join(h, edges.src == h.id).select("dst", "v"), "dst")
        )
        h = _normalize(
            _contrib(edges.join(a, edges.dst == a.id).select("src", "v"), "src")
        )
    out = (
        nodes.join(h.select("id", F.col("v").alias("hub")), "id", "left")
        .join(a.select("id", F.col("v").alias("authority")), "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
        )
    )
    # the final left-joins against edges/nodes are LAZY: unpersisting
    # here would make every downstream action re-derive the distinct
    # mirrored edge list and node spine from source (ADVICE r9). Tie
    # the caches' lifetime to the returned frame instead — the last
    # h/a half-rounds are already eagerly truncated, so the output
    # joins read cached inputs exactly once per action.
    return unpersist_when_released(out, edges, nodes)
