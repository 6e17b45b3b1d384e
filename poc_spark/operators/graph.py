"""Graph analytics over the interaction-edge table (extension — the
reference renders fixed-size nodes; an analysis engine should quantify
them).

Edges are the canonical undirected form (source <= target, weight).
All operators are plain DataFrame ops; PageRank is the one iterative
algorithm, driven by a small driver loop with each step a
broadcast-join + aggregate (the standard Pregel-free formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _directed(edges: DataFrame) -> DataFrame:
    """Expand canonical undirected edges to both directions."""
    fwd = edges.select(
        F.col("source").alias("src"), F.col("target").alias("dst"), "weight"
    )
    rev = edges.select(
        F.col("target").alias("src"), F.col("source").alias("dst"), "weight"
    )
    return fwd.unionByName(rev)


def degrees(edges: DataFrame) -> DataFrame:
    """(id, degree, weighted_degree): distinct-neighbor count and total
    incident weight per node. One shuffle on the node id."""
    return (
        _directed(edges)
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("degree"),
            F.sum("weight").alias("weighted_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    ordered_sum: bool = False,
) -> DataFrame:
    """(id, rank) — weighted PageRank on the undirected graph.

    Each iteration: contribution = rank * weight / weighted_degree along
    every directed edge, re-aggregated per destination. The edge list
    with precomputed out-weight is cached once; iterations reuse it.
    Driver loop of `iterations` joins — at scale, checkpoint every ~5
    iterations to truncate lineage (done here via localCheckpoint when
    the loop is long).
    """
    directed = _directed(edges)
    out_w = directed.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # localCheckpoint (not .cache): reused every iteration, but cached
    # plans pin CacheManager entries for the session's lifetime —
    # checkpointed blocks drop on GC, and lineage truncation is a
    # bonus for the iteration loop.
    links = (
        directed.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("share"))
        .localCheckpoint(eager=True)
    )
    nodes = links.select(F.col("src").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))

    for i in range(iterations):
        joined = links.join(ranks, links.src == ranks.id).select(
            "dst", "src", (F.col("share") * F.col("rank")).alias("c")
        )
        if ordered_sum:
            # fold contributions in src order: bit-reproducible doubles
            # (any engine folding the same order gets the same ranks —
            # the contract oracle's list_reduce does exactly this).
            # Costs a per-dst collect_list: bounded by max degree, so
            # reserve for verification graphs; production keeps the
            # partial-agg sum.
            received = F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            )
            contribs = joined.groupBy("dst").agg(received.alias("received"))
        else:
            contribs = joined.groupBy("dst").agg(F.sum("c").alias("received"))
        ranks = nodes.join(
            contribs, nodes.id == contribs.dst, "left"
        ).select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce("received", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % 5 == 0 and i + 1 < iterations:
            # truncate lineage so the plan doesn't grow unboundedly
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def connected_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """(id, component) — undirected connected components by min-label
    propagation: every node repeatedly adopts the smallest label among
    itself and its neighbors until a fixpoint. component = smallest node
    id in the component (deterministic).

    Converges in O(diameter) iterations; each iteration is one join +
    aggregate. The loop checkpoints lineage every 5 rounds and exits
    early on fixpoint (a count of changed labels — cheap, the label
    table is one row per node). If max_iterations is exhausted before
    the fixpoint (diameter > max_iterations — long chain graphs), the
    labels are NOT final components: raise instead of returning silently
    wrong ids."""
    # checkpoint the edge view once: every iteration joins against it,
    # and an expensive upstream (a PassJoin candidate generation, the
    # chat lag window) would otherwise be recomputed per round — the
    # same discipline as pagerank's links checkpoint (measured on the
    # entity-resolution pipeline: 25s -> seconds at sf0.1)
    directed = (
        _directed(edges).select("src", "dst").localCheckpoint(eager=True)
    )
    labels = (
        directed.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    changed = 0
    for i in range(max_iterations):
        # min over {own label} ∪ {neighbors' labels} in ONE aggregate:
        # the self row rides the same union (tagged is_self) instead of
        # a separate left join back onto `labels`, and it carries the
        # pre-round label out of the aggregate — so the fixpoint check
        # below is a scan of the checkpointed frame, not a second join.
        # Per round this removes two exchanges and one job vs the
        # join + left-join + changed-join shape (least(own, min(nbr))
        # == min over the union, so labels are bit-identical).
        prop = directed.join(labels, directed.dst == labels.id).select(
            "src", "component", F.lit(False).alias("is_self")
        )
        own = labels.select(
            F.col("id").alias("src"), "component", F.lit(True).alias("is_self")
        )
        mins = (
            prop.unionByName(own)
            .groupBy("src")
            .agg(
                F.min("component").alias("component"),
                # exactly one self row per node; when() keeps the
                # component's own type (no cast assumptions on the id)
                F.max(
                    F.when(F.col("is_self"), F.col("component"))
                ).alias("_old"),
            )
        )
        # pointer-jumping shortcut (the large-star/small-star idea):
        # every node also adopts the label of its current label's node,
        # halving label-chain depth each round — convergence drops from
        # O(diameter) to O(log diameter), so long chain graphs fit the
        # iteration budget.
        lbl = mins.select(
            F.col("src").alias("c_id"), F.col("component").alias("c_comp")
        )
        new_labels = mins.join(
            lbl, mins.component == lbl.c_id, "left"
        ).select(
            F.col("src").alias("id"),
            F.least(
                F.col("component"), F.coalesce("c_comp", F.col("component"))
            ).alias("component"),
            "_old",
        # lazy checkpoint: the changed-count below materializes the
        # blocks inside its own job — one action per round, not an
        # eager-materialize job plus a count job
        ).localCheckpoint(eager=False)
        changed = new_labels.filter(
            F.col("component") != F.col("_old")
        ).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    if changed > 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); the graph's "
            "diameter exceeds the budget — raise max_iterations"
        )
    return labels


def triangle_count(edges: DataFrame) -> DataFrame:
    """(id, triangles) — triangles through each node, via the canonical
    ordered edge list joined to itself (each triangle a<b<c counted once
    per member). Two joins on the small canonical edge set."""
    e = edges.select("source", "target")
    ab = e.alias("ab")
    bc = e.alias("bc")
    # wedge a<b<c from a-b and b-c, closed by a-c
    wedges = ab.join(bc, F.col("ab.target") == F.col("bc.source")).select(
        F.col("ab.source").alias("a"),
        F.col("ab.target").alias("b"),
        F.col("bc.target").alias("c"),
    )
    ac = e.select(F.col("source").alias("a"), F.col("target").alias("c"))
    tris = wedges.join(ac, ["a", "c"])  # each closed triangle once (a<b<c)
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return per_node


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, clustering_coeff) — local clustering
    coefficient 2·T(v) / (deg(v)·(deg(v)−1)), 0.0 for degree-1 nodes.

    Composes the two existing aggregates (degrees, triangle_count) with
    a left join; the coefficient is one int/int double division from
    exact integers, so it hashes bit-identically across engines. Same
    shuffle profile as triangle_count — the wedge join dominates; the
    degree join is a broadcast (one row per node)."""
    deg = degrees(edges).select("id", "degree")
    tri = triangle_count(edges)
    joined = deg.join(tri, "id", "left").select(
        "id",
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
    )
    denom = F.col("degree").cast("double") * (F.col("degree") - 1).cast("double")
    return joined.select(
        "id",
        "degree",
        "triangles",
        F.when(F.col("degree") >= 2, 2.0 * F.col("triangles").cast("double") / denom)
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


def adamic_adar(
    edges: DataFrame,
    top_k: int | None = None,
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """(u, v, score) — Adamic–Adar link prediction over NON-adjacent
    node pairs: score(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg(z)).

    Candidate generation is by shared neighbor (the wedge self-join on
    z), never all-pairs — the standard bucketed shape; only z with
    degree ≥ 2 produce wedges, so ln(deg) is always positive. Existing
    edges are removed with a left anti-join on the canonical (u<v)
    form. Determinism WITHOUT per-pair arrays: each z-contribution
    1/ln(deg z) is quantized to integer picounits (round(1e12/ln d) —
    exact in double range) and summed as LONG — order-free, partial
    (map-side) aggregation applies, and the whole aggregate stays in
    whole-stage codegen (measured: the sorted-struct fold and the
    DECIMAL sum were 6× and 5× slower on the dense sf0.1 graph).
    Scores round to 6dp before the top-k ordering (tie-break u, v).

    At scale the wedge join is quadratic in hub degree: one 10⁶-degree
    hub alone emits ~5·10¹¹ wedge rows. `max_wedge_degree` caps deg(z)
    with a pre-filter on the broadcast degree table — z nodes above the
    cap produce NO wedges (both wedge sides prune through the inner
    join on the filtered deg relation, so the hub's rows never reach
    the exchange). Hubs contribute the least signal per wedge anyway
    (1/ln(d) → 0), which is why every production Adamic-Adar caps;
    10_000 is a sane production default — the library default is None
    (exact) so small-graph callers and the uncapped oracle entry keep
    bit-identical scores, and the capped contract entry passes the cap
    explicitly with a matching capped oracle. Capped wedge volume is
    bounded by Σ_{z kept} C(deg z, 2) ≤ |kept z|·cap²/2, independent
    of hub skew."""
    # the edge list feeds FIVE plan legs (two wedge sides, the anti
    # side, the degree table, and each broadcast); checkpoint it once
    # so an expensive upstream (the chat lag window) isn't recomputed
    # per leg — same discipline as pagerank's links checkpoint. The
    # repartition matters as much as the checkpoint: that upstream is
    # a single-partition global window, and without the spread the
    # whole wedge enumeration would run as ONE task.
    edges = edges.repartition("source", "target").localCheckpoint(eager=True)
    directed = _directed(edges).select("src", "dst")
    deg = directed.groupBy(F.col("src").alias("z")).agg(
        F.count(F.lit(1)).alias("dz")
    )
    # dz = 1 never forms a wedge (the a.n < b.n2 self-pair filter kills
    # it), but its 1/ln(1) contribution expression would divide by zero
    # wherever the optimizer evaluates the projection before the join —
    # prune explicitly instead of relying on plan luck
    deg = deg.filter(F.col("dz") >= 2)
    if max_wedge_degree is not None:
        # THE cap: hub z never enters the broadcast build side, so its
        # wedge fan-out is zero — the quadratic blow-up is cut before
        # any wedge row is emitted, not filtered after
        deg = deg.filter(F.col("dz") <= max_wedge_degree)
    nbrs = directed.select(F.col("src").alias("z"), F.col("dst").alias("n"))
    if max_wedge_degree is not None:
        # prune the PROBE side pre-exchange too: hub rows would match
        # nothing in the capped build side, but without this semi-join
        # they'd still cross the wedge join's shuffle first
        nbrs = nbrs.join(F.broadcast(deg.select("z")), "z", "leftsemi")
    a = nbrs.alias("a")
    # the build side carries each z's picounit contribution
    # round(1e12/ln d) — an exact integer in double range (max 1.44e12
    # << 2^53) — so the wedge join EMITS (u, v, c) directly: no extra
    # pass over the wedge stream to attach degrees, and the LONG sum
    # is a plain codegen hash aggregate (the sorted-struct fold and a
    # DECIMAL(20,12) sum measured 6× / 5× slower at sf0.1)
    bnb = (
        nbrs.join(F.broadcast(deg), "z")
        .select(
            F.col("z").alias("z2"),
            F.col("n").alias("n2"),
            F.round(F.lit(1.0e12) / F.log(F.col("dz").cast("double")), 0)
            .cast("long")
            .alias("c"),
        )
        .alias("b")
    )
    # ADAPTIVE wedge-join strategy: below the row bound the build side
    # (<= 2|E| tiny long-triples) BROADCASTS — the wedge enumeration
    # then runs map-side with no shuffle of either edge relation
    # (measured 15.0 -> 8.3 s at sf0.1, identical results). Above the
    # bound (a 100 TB graph's edge list does not broadcast) it stays a
    # shuffled hash join on z. Conf spark.poc.graph.wedgeBroadcastMaxRows
    # overrides (0 forces the shuffle path — exercised by the forced-
    # all sweep like every other adaptive dispatch).
    spark = edges.sparkSession
    bcast_max = int(
        spark.conf.get("spark.poc.graph.wedgeBroadcastMaxRows", "5000000")
    )
    n_directed = 2 * edges.count()  # cheap: edges is checkpointed
    build = F.broadcast(bnb) if 0 < n_directed <= bcast_max else bnb
    pairs = (
        a.join(build, F.col("a.z") == F.col("b.z2"))
        .filter(F.col("a.n") < F.col("b.n2"))
        .select(
            F.col("a.n").alias("u"),
            F.col("b.n2").alias("v"),
            F.col("b.c").alias("c"),
        )
    )
    # aggregate FIRST, anti-join after: the anti-join then runs over
    # |distinct pairs| grouped rows instead of |wedges| raw rows
    scored_all = pairs.groupBy("u", "v").agg(
        F.round(F.sum("c").cast("double") / F.lit(1.0e12), 6).alias("score")
    )
    existing = edges.select(
        F.col("source").alias("u"), F.col("target").alias("v")
    )
    scored = scored_all.join(F.broadcast(existing), ["u", "v"], "leftanti")
    if top_k:
        scored = scored.orderBy(F.desc("score"), "u", "v").limit(top_k)
    return scored


def modularity_by_community(
    edges: DataFrame, communities: DataFrame
) -> DataFrame:
    """(community, n_nodes, e_within, d_total, q_contrib) — Newman
    modularity decomposed per community over the UNWEIGHTED graph:
    Q = Σ_c [ e_c/m − (d_c/2m)² ], reported per c. The contribution is
    computed as the single exact-integer expression
    (4·m·e_c − d_c²) / (4·m²) cast to double once — no float folds, so
    it hashes bit-identically cross-engine (d_c, e_c, m are exact).

    `communities` is (id, community); nodes absent from it are
    singleton communities (coalesce to their own id). One edge-to-label
    join (twice, for both endpoints — label table broadcasts), two hash
    aggregates, and a broadcast 1-row m."""
    m_row = edges.select(F.count(F.lit(1)).alias("m"))
    lbl = communities.select("id", "community")
    nodes = (
        _directed(edges)
        .select(F.col("src").alias("id"))
        .distinct()
        .join(lbl, "id", "left")
        .select("id", F.coalesce("community", F.col("id")).alias("community"))
    )
    deg = degrees(edges).select("id", "degree")
    d_per = (
        nodes.join(deg, "id")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("degree").alias("d_total"),
        )
    )
    ls = nodes.select(F.col("id").alias("source"), F.col("community").alias("cs"))
    lt = nodes.select(F.col("id").alias("target"), F.col("community").alias("ct"))
    e_per = (
        edges.join(F.broadcast(ls), "source")
        .join(F.broadcast(lt), "target")
        .filter(F.col("cs") == F.col("ct"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_within"))
    )
    joined = (
        d_per.join(e_per, "community", "left")
        .withColumn("e_within", F.coalesce("e_within", F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(m_row))
    )
    num = (
        F.lit(4) * F.col("m") * F.col("e_within")
        - F.col("d_total") * F.col("d_total")
    )
    den = F.lit(4) * F.col("m") * F.col("m")
    return joined.select(
        "community",
        "n_nodes",
        "e_within",
        F.col("d_total").cast("long").alias("d_total"),
        F.round(num.cast("double") / den.cast("double"), 9).alias("q_contrib"),
    )


def k_core(edges: DataFrame, k: int, max_iterations: int = 30) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node has
    degree >= k WITHIN the subgraph. Iterative peel — drop nodes with
    current degree < k, recompute degrees on the induced subgraph,
    repeat to fixpoint. The result is unique regardless of peel order
    (the k-core is well-defined), so the operator is deterministic.

    Each round is one degree aggregate + two semi-joins on the node id;
    the edge set only shrinks, and localCheckpoint truncates lineage
    (same discipline as connected_components). Rounds needed ≤ peel
    depth, typically far below max_iterations.

    Output: (id, degree) — degree measured inside the k-core.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = _directed(edges).select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iterations):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        # anti-join on the REMOVAL set, which shrinks round over round
        # (broadcasting the survivor set instead would ship every
        # remaining node — exactly what doesn't scale)
        removed = deg.filter(F.col("degree") < k).select("src")
        removed = removed.localCheckpoint(eager=True)
        if removed.count() == 0:
            break
        cur = (
            cur.join(F.broadcast(removed), "src", "leftanti")
            .join(
                F.broadcast(removed.withColumnRenamed("src", "dst")),
                "dst",
                "leftanti",
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"k_core did not stabilize in {max_iterations} rounds"
        )
    return (
        cur.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
