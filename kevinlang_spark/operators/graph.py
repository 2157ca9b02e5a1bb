"""Iterative graph algorithms on DataFrames.

Connected components (min-label propagation) lives with the dedup suite
(``operators/dedup.py:neardup_components``); this module adds PageRank —
the canonical iterative-join workload, and the shape that exercises
lineage control: naive iteration grows the logical plan linearly until
planning time dominates, so ranks are ``localCheckpoint``-ed every few
rounds to truncate it.  At 100 TB the checkpoint becomes a persisted
table write; everything else is per-iteration key shuffles (no driver
state, no collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank with uniform dangling-mass redistribution:
    ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling_mass/N)``.

    Per iteration: one join of ranks to edges on the source (shuffle on
    ``src``), one grouped sum on the destination (shuffle on ``dst``),
    and a 1-row dangling-mass aggregate — all map-side combined.  The
    node set and out-degrees are computed once.  Returns (node, rank)
    with ranks summing to 1.
    """
    # materialize the loop-invariant frames ONCE: every iteration's job
    # re-evaluates its lineage, so an uncheckpointed edge list re-scans
    # the source table and re-runs the distinct EVERY round — at 100 TB
    # that is `iterations` full input passes instead of one (measured at
    # bench scale: ~40% of total pagerank wall time).
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        # pre-partition the loop-invariant edge table on its join key:
        # localCheckpoint preserves the physical partitioning, so when
        # the rank side outgrows the broadcast threshold every
        # iteration's contribs join reuses this layout instead of
        # re-shuffling the edge side — at 100 TB this is a bucketed
        # edge table and the win is an edge-sized shuffle PER
        # ITERATION.  At bench scale (ranks broadcast) the same
        # repartition fixes a second problem: AQE coalesces the
        # distinct's output to a handful of partitions, and every
        # round would inherit that tiny parallelism (measured sf0.1:
        # ~11% off total).
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # out-degree is LOOP-INVARIANT, so it is folded into the node table
    # ONCE (deg NULL marks dangling nodes) and carried through the loop
    # as an extra int column — the alternative, a per-iteration
    # ranks⋈deg join, costs a rank-table-sized shuffle join every round
    # once the graph outgrows the broadcast threshold (at bench scale
    # deg broadcasts and the fold is timing-neutral; at 100 TB it
    # deletes `iterations` shuffle joins)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg, F.col("node") == F.col("src"), "left")
        .select("node", "deg")
        # LAZY checkpoint: the count() below materializes it (r12) —
        # the loop's consumers all run after this synchronous count
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes

    for i in range(iterations):
        # dangling mass stays a LAZY 1-row aggregate broadcast-crossed
        # into the update — no per-iteration driver round-trip, the whole
        # iteration remains one declarative plan
        dangling = ranks.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contribs = (
            ranks.where(F.col("deg").isNotNull())
            .select("node", (F.col("rank") / F.col("deg")).alias("contrib"))
            .alias("r")
            .join(e.alias("g"), F.col("r.node") == F.col("g.src"))
            .groupBy(F.col("g.dst").alias("node"))
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("__dm") / n_nodes
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # materialize periodically: each iteration reads ranks THREE
            # times (dangling agg, contribs, update join) — without any
            # checkpoint the plan's reference fan-out compounds per round
            # (recompute paths grow ~3^k; exchange reuse absorbs some of
            # it, analyzer time the rest).  Every round is too often,
            # though: the materialization job itself costs a round's
            # wall-time at low data volume, and a 2-3 round window keeps
            # both the plan and the recompute bounded (measured sf0.1:
            # every-3 ≈ 25% faster than every-1, identical output).
            # GraphX persists on a cadence for the same reason; at 100 TB
            # this is a periodic table write.
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Bounded-round k-core peeling (Matula & Beck 1983 / Batagelj &
    Zaveršnik): repeatedly drop nodes with degree < ``k`` until stable
    or ``rounds`` exhausted; the surviving subgraph where every node
    keeps ≥ k neighbors is the k-core — the standard dense-region
    extractor (community seeds, spam rings, robust-graph backbones).

    ``edges`` is an undirected canonical edge list (src < dst, distinct).
    The round count is FIXED, not run-to-convergence: each peel is one
    degree aggregation + two semi joins, so the total cost is
    O(rounds) key shuffles regardless of graph size, and a fixed round
    count makes the result engine-reproducible (the oracle unrolls the
    same rounds).  Most real graphs converge in far fewer rounds than
    nodes; callers needing the exact core add rounds.  Each round is
    checkpointed for the same recompute-fan-out reason as
    :func:`pagerank`, and the loop exits early once a round removes no
    edge — peeling is monotone, so the fixed point equals the full
    ``rounds`` unroll exactly.

    Returns (node, degree) for nodes alive after the final peel, with
    their degree inside the surviving subgraph."""
    if k < 1 or rounds < 1:
        raise ValueError(f"k and rounds must be >= 1 (got k={k}, rounds={rounds})")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        # materialized once: the peel loop would otherwise re-scan the
        # source per round (see pagerank)
        .localCheckpoint(eager=True)
    )
    alive = sym
    prev_edges = None
    for i in range(rounds):
        deg = alive.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= k).select("u")
        alive = alive.join(keep, "u", "left_semi").join(
            keep.select(F.col("u").alias("v")), "v", "left_semi"
        )
        if i + 1 < rounds:
            # EAGER checkpoint, deliberately (r12 A/B): folding this job
            # into the early-exit count() (eager=False) cut 2 jobs but
            # cost 3.5 s → 4.4 s — a lazily-checkpointed LogicalRDD scan
            # carries no size statistics, so the next peel's semi joins
            # lose their broadcast and fall back to shuffled joins (no
            # exchange below the join means AQE cannot re-plan it
            # either).  Measured and reverted.
            alive = alive.localCheckpoint(eager=True)
            # fixed-point early exit: peeling is monotone, so a round
            # that removes no edge means every later round is a no-op —
            # the result is IDENTICAL to running all `rounds` (the
            # unrolled oracle still matches), we just skip the dead
            # jobs.  The count is near-free: alive was just materialized.
            n = alive.count()
            if n == prev_edges:
                break
            prev_edges = n
    return (
        alive.groupBy("u")
        .agg(F.count("*").cast("bigint").alias("degree"))
        .select(F.col("u").alias("node"), "degree")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    src: str = "a",
    dst: str = "b",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Semi-synchronous Label Propagation (Raghavan et al. 2007)
    community detection, made deterministic: every node starts with its
    own id as label; each round every node adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label, all
    nodes updating simultaneously from the previous round's labels.
    Fixed ``rounds`` (classic LPA converges in ~5 sweeps on most
    graphs) keeps cost bounded and the result engine-reproducible.

    Per round: one neighbor-label join (shuffle on node id) + one
    (node,label) count + one per-node arg-max — the arg-max is a
    grouped ``max(struct(count, -label))``, never an unpartitioned
    window.  Because the edge list is symmetrized, EVERY node in the
    node set has at least one neighbor, so the arg-max output already
    covers every node — no per-round "re-attach isolated nodes" join
    is needed (unlike pagerank, whose sink nodes receive no contribs);
    dropping that join cut ~20% of LPA wall-time at sf0.1 with
    identical output.  Unlike pagerank,
    each round consumes the previous labels exactly ONCE, so the
    lineage is a chain with no recompute fan-out — the checkpoint
    cadence (default every 2) is purely an analyzer/lineage-depth
    guard, not a recompute guard (measured sf0.1: dropping the
    every-round checkpoint cut ~35% wall-time, identical output).
    Returns (node, label).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1 (got {rounds})")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        # materialized once AND pre-partitioned on the per-sweep join key
        # (v = the neighbor whose label we read): the checkpoint keeps
        # the layout, so each sweep shuffles only the label table (see
        # pagerank; measured ~17% off LPA total at sf0.1)
        .repartition(F.col("v"))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for i in range(rounds):
        nbr = (
            sym.join(labels, sym["v"] == labels["node"])
            .select("u", "label")
            # one u-keyed exchange per sweep instead of two: hash(u)
            # satisfies ClusteredDistribution for BOTH downstream aggs
            # (groupBy(u,label) and groupBy(u)), so the label count and
            # the arg-max run exchange-free on top of it.  The (u,label)
            # exchange it replaces gained almost nothing from map-side
            # combine anyway — the join output is laid out by v, so a
            # map partition holds one neighborhood's worth of DISTINCT
            # u's, not duplicate (u,label) pairs.  Measured sf0.1:
            # 8.8s → ~5s warm.
            .repartition(F.col("u"))
            .groupBy(F.col("u").alias("n"), F.col("label").alias("l"))
            .agg(F.count("*").alias("c"))
        )
        # every node appears as `u` in the symmetrized edge list, so this
        # grouped arg-max emits exactly one row per node — the update is
        # complete without re-joining the node set
        labels = nbr.groupBy("n").agg(
            F.max(F.struct(F.col("c"), (-F.col("l")).alias("nl"))).alias("m")
        ).select(F.col("n").alias("node"), (-F.col("m.nl")).alias("label"))
        if (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            # LAZY checkpoint (r12): each round consumes the previous
            # labels exactly ONCE (the docstring's chain property), so
            # there is no fan-out to race — the checkpoint still
            # truncates the logical plan immediately, and the blocks
            # materialize inside the one consuming job instead of as a
            # separate per-cadence driver job.
            labels = labels.localCheckpoint(eager=False)
    return labels


def hits(
    edges: DataFrame,
    iterations: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    list: auth(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v} auth(v), each
    vector L1-normalized per iteration (the sum-normalized variant —
    scale-free and division-only, so cross-engine reproducible to
    rounding).

    Per iteration: two edge joins + two grouped sums (shuffles on dst
    then src) and two lazy 1-row normalizer aggregates broadcast into
    the update — no driver round-trips inside the loop, checkpointed
    per round like :func:`pagerank`.  Returns (node, hub, auth);
    nodes missing a score side report 0.0.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1 (got {iterations})")
    # TWO materialized copies of the edge list, one per join orientation:
    # the auth step joins scores on src, the hub step joins auth on dst.
    # distinct() leaves the table hash-partitioned on (src,dst) — neither
    # join key — so a single copy re-shuffles the EDGES every iteration;
    # pre-partitioned copies shuffle only the score table per sweep (the
    # pagerank/LPA invariant-layout rule, 2× edge storage for 2·iters
    # fewer edge-sized exchanges; measured ~15% off sf0.1 wall).
    e_src = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )
    e_dst = e_src.repartition(F.col("dst")).localCheckpoint(eager=True)
    nodes = (
        e_src.select(F.col("src").alias("node"))
        .union(e_src.select(F.col("dst").alias("node")))
        .distinct()
        # LAZY checkpoint: the count() below materializes it (r12)
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    scores = nodes.select(
        "node", F.lit(1.0 / n_nodes).alias("hub"), F.lit(1.0 / n_nodes).alias("auth")
    )
    for i in range(iterations):
        auth_raw = (
            scores.alias("s")
            .join(e_src.alias("g"), F.col("s.node") == F.col("g.src"))
            .groupBy(F.col("g.dst").alias("node"))
            .agg(F.sum("s.hub").alias("a_raw"))
        )
        a_norm = auth_raw.agg(F.sum("a_raw").alias("__an"))
        auth = (
            nodes.join(auth_raw, "node", "left")
            .crossJoin(F.broadcast(a_norm))
            .select(
                "node",
                (F.coalesce(F.col("a_raw"), F.lit(0.0)) / F.col("__an")).alias(
                    "auth"
                ),
            )
        )
        hub_raw = (
            auth.alias("t")
            .join(e_dst.alias("g"), F.col("t.node") == F.col("g.dst"))
            .groupBy(F.col("g.src").alias("node"))
            .agg(F.sum("t.auth").alias("h_raw"))
        )
        h_norm = hub_raw.agg(F.sum("h_raw").alias("__hn"))
        scores = (
            nodes.join(hub_raw, "node", "left")
            .crossJoin(F.broadcast(h_norm))
            .join(auth, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("h_raw"), F.lit(0.0)) / F.col("__hn")).alias(
                    "hub"
                ),
                F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
            )
        )
        if i + 1 < iterations:
            scores = scores.localCheckpoint(eager=True)
    return scores


def adamic_adar(
    edges: DataFrame,
    k: int = 20,
    max_deg: int = 64,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Adamic–Adar link prediction: score every non-adjacent node pair
    with common neighbors by Σ_z 1/ln(deg(z)) over shared neighbors z —
    the classic "who should be connected" heuristic (friend/related-item
    recommendation, knowledge-graph completion).

    Scale shape: ONE two-hop join keyed on the shared neighbor z.  Hubs
    make that join quadratic (a degree-d neighbor emits d² candidate
    pairs), so neighbors with deg > ``max_deg`` are dropped BEFORE the
    join — the standard hub cap, and the same second-order-loss argument
    as the sparse-cosine df cap: 1/ln(deg) already weights hubs toward
    zero.  Existing edges are removed with one anti join; the top-``k``
    cut ranks on the ROUNDED score with (a, b) tie-breaks so the
    boundary is engine-reproducible.

    Returns (a, b, n_common, score), a < b, strongest pairs first
    bounded to ``k`` rows."""
    if k < 1 or max_deg < 2:
        raise ValueError(f"k must be >= 1 and max_deg >= 2 (got k={k}, max_deg={max_deg})")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    # neighbor lists keyed by the MIDDLE node z: (z, endpoint)
    mid = (
        sym.select(F.col("v").alias("z"), F.col("u").alias("x"))
        .join(
            deg.where(F.col("d") <= max_deg).select(
                F.col("u").alias("z"), "d"
            ),
            "z",
        )
    )
    l, r = mid.alias("l"), mid.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.z") == F.col("r.z")) & (F.col("l.x") < F.col("r.x")),
        )
        .groupBy(F.col("l.x").alias("a"), F.col("r.x").alias("b"))
        .agg(
            F.count("*").cast("bigint").alias("n_common"),
            F.round(F.sum(1.0 / F.log(F.col("l.d"))), 6).alias("score"),
        )
    )
    # drop already-connected pairs (sym holds both directions, so one
    # left_anti on the canonical direction suffices for a < b pairs)
    fresh = pairs.join(
        sym.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return fresh.orderBy(
        F.col("score").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(k)


def wl_refinement(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Weisfeiler–Lehman color refinement (1968; the WL graph-kernel
    basis): every node starts labeled with its DEGREE, then each round
    relabels to hash(own label, sorted multiset of neighbor labels).
    After r rounds two nodes share a label only if their radius-r
    neighborhoods are structurally identical — the standard graph
    fingerprint for isomorphism screening, role discovery, and
    structural features.

    Per round: one neighbor join + one grouped sorted-list aggregate +
    a hash projection — shuffles on the node key only, checkpointed
    like the other bounded-round graph ops.  The sorted list makes the
    collect order-insensitive, and labels are 52-bit md5-prefix ints so
    any engine replays them bit-for-bit.  Returns (node, wl_label)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1 (got {rounds})")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # invariant edge table pre-partitioned on the per-round label
        # join key (see pagerank)
        .repartition(F.col("v"))
        .localCheckpoint(eager=True)
    )
    labels = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("label")
    )
    for i in range(rounds):
        # One join + ONE aggregation per round (r12 optimization round):
        # the node's own label rides into the neighbor-signature groupBy
        # as a tagged union row instead of joining back afterward — the
        # old labels⋈sig join (a third node-keyed exchange per round) is
        # gone.  collect_list skips the NULLs the tag filters produce,
        # and every labels node has ≥1 neighbor by construction (labels
        # derives from sym), so the output node set is identical to the
        # old inner join's; the hash input (own label, sorted neighbor
        # multiset) is unchanged int/string math — byte-identical labels.
        nbr = sym.join(labels, sym["v"] == labels["node"]).select(
            F.col("u").alias("n"),
            F.col("label").alias("l"),
            F.lit(False).alias("own"),
        )
        own = labels.select(
            F.col("node").alias("n"), F.col("label").alias("l"),
            F.lit(True).alias("own"),
        )
        sig = nbr.unionByName(own).groupBy("n").agg(
            F.max(F.when(F.col("own"), F.col("l"))).alias("__self"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(~F.col("own"), F.col("l")))
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("sig"),
        )
        labels = sig.select(
            F.col("n").alias("node"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col("__self").cast("string"), F.col("sig")
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("label"),
        )
        if i + 1 < rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("wl_label"))


def shortest_paths(
    edges: DataFrame,
    source: int,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Single-source shortest paths by bounded-round Bellman–Ford
    relaxation: dist'(v) = min(dist(v), min over edges u→v of
    dist(u) + w(u,v)), ``rounds`` times — after r rounds every node
    within r hops of ``source`` carries its exact shortest distance
    over ≤ r-edge paths (the full answer when r ≥ graph diameter).

    Per round: one join of the distance table to the edge list on the
    source endpoint + one grouped min — node-key shuffles only, same
    checkpointed bounded-round shape as pagerank/kcore/LPA/WL.  A
    path's distance accumulates left-to-right along its edges in every
    engine identically, so distances are bit-reproducible (min is
    selection, not summation across paths).  ``weight=None`` means
    hop counts.  Returns (node, dist) for reached nodes."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1 (got {rounds})")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("w"))
        # invariant edge table pre-partitioned on the relaxation join key
        # (see pagerank)
        .repartition(F.col("u"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0.0)], "node bigint, dist double")
    prev_n = None
    for i in range(rounds):
        relaxed = (
            dist.join(e, dist["node"] == e["u"])
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if i + 1 < rounds:
            # EAGER, deliberately (r12 A/B, see kcore): a lazy checkpoint
            # here strips the size stats the next round's relaxation join
            # plans its broadcast from — measured 2× slower on the
            # harmonic sibling, reverted.
            dist = dist.localCheckpoint(eager=True)
            if weight is None:
                # unweighted early exit: a node's dist is final the round
                # it first appears (BFS layers), so a stable node count
                # IS the fixed point — identical result to the full
                # unroll, minus the dead jobs.  Weighted runs can still
                # improve existing distances, so they never short-cut.
                n = dist.count()
                if n == prev_n:
                    break
                prev_n = n
    return dist


def harmonic_centrality(
    edges: DataFrame,
    sources: list[int],
    rounds: int = 6,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Sampled harmonic centrality (Marchiori–Latora / Boldi–Vigna):
    C(v) = Σ_{s ∈ sources, s ≠ v} 1 / d(s, v) over hop distances from a
    source SAMPLE — the standard scalable estimator for closeness-style
    centrality (exact all-pairs is O(n·m) and never runs at 100 TB).

    All sources propagate in ONE bounded-round loop over a distance
    table keyed (source, node): per round one edge join + one grouped
    min exactly like :func:`shortest_paths`, but the key carries the
    source id, so adding sources widens the key space instead of
    multiplying rounds.  Unreachable-within-r pairs contribute 0
    (standard harmonic convention).  Returns (node, n_reached, score)
    rounded 6dp, sources excluded from their own score."""
    if rounds < 1 or not sources:
        raise ValueError(
            f"need rounds >= 1 and at least one source "
            f"(got rounds={rounds}, sources={sources})"
        )
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # invariant edge table pre-partitioned on the relaxation join
        # key (see pagerank)
        .repartition(F.col("u"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(s, s, 0.0) for s in sources], "s bigint, node bigint, dist double"
    )
    prev_n = None
    done = 0
    # TWO relaxations per materialization (r12 A/B: 8.4 s → 6.4 s,
    # 23 → 19 jobs at sf0.1, outputs identical): hop relaxation is
    # monotone — rows only ever ADD, distances are final on first reach
    # — so the states visited are the same whether we check the fixed
    # point every round or every second round; a stable (s, node) count
    # across a double-step still proves the fixed point (any change
    # strictly grows the count).  The depth-2 un-materialized plan keeps
    # its broadcast: estimates propagate from the eager checkpoint one
    # join+agg deep.  kcore and neardup_components measured SLOWER under
    # the same batching (their loops early-exit in 2-3 rounds, so the
    # second step of each pair is wasted work) — harmonic runs its full
    # bounded rounds, so batching only deletes driver jobs.
    while done < rounds:
        steps = min(2, rounds - done)
        for _ in range(steps):
            relaxed = dist.join(sym, dist["node"] == sym["u"]).select(
                "s", F.col("v").alias("node"), (F.col("dist") + 1.0).alias("dist")
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("s", "node")
                .agg(F.min("dist").alias("dist"))
            )
            done += 1
        if done < rounds:
            # EAGER, deliberately (r12 A/B): lazy (eager=False) cut 3
            # jobs but ran 6.2 s → 13.5 s — the lazily-checkpointed
            # distance table loses its size statistics and the per-round
            # relaxation join falls off broadcast (no exchange below the
            # join, so AQE cannot rescue it).  Measured and reverted.
            dist = dist.localCheckpoint(eager=True)
            # hop distances are final on first reach (see shortest_paths):
            # stable (s, node) count == fixed point, result identical to
            # the full unroll
            n = dist.count()
            if n == prev_n:
                break
            prev_n = n
    return (
        dist.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.count("*").cast("int").alias("n_reached"),
            F.round(F.sum(1.0 / F.col("dist")), 6).alias("score"),
        )
    )


def clustering_coefficient(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient — triangles(v) /
    (deg(v) choose 2), the classic cohesion score (Watts & Strogatz
    1998) next to the global triangle count: bot/spam subgraphs show
    near-zero clustering, tight communities near one.

    Shape: edges canonicalize once (least/greatest + distinct,
    checkpointed — three join legs read them), triangles enumerate via
    the same wedge-build + closing-edge hash equi-joins as the global
    count (each triangle once, a<b<c), then EXPLODE to its three
    corners for a per-node count joined to the degree census.  All
    counts are integers; the coefficient is the single division
    ``2·t / (d·(d−1))``, so both engines replay it exactly.

    Returns (node, degree, triangles, clustering_coef); isolated and
    degree-1 nodes report coefficient 0.0."""
    e = (
        df.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        # three join legs + the degree census read e: materialize once
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("x"),
        F.col("e1.b").alias("y"),
        F.col("e2.b").alias("z"),
    )
    tri = wedges.join(
        e3,
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
    ).select("x", "y", "z")
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    tcount = corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("triangles")
    )
    d = F.col("degree")
    t = F.col("triangles")
    return (
        deg.join(tcount, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(t, F.lit(0).cast("bigint")).alias("triangles"),
        )
        .select(
            "node",
            "degree",
            "triangles",
            F.when(
                d >= 2,
                (F.lit(2) * t).cast("double") / (d * (d - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coef"),
        )
    )
