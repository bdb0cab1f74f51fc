"""Graph analytics over the RDF triple graph.

The reference's data model IS a graph (RDF triples), but its engine
only mines CINDs from it; any real RDF/knowledge-graph pipeline also
wants structural analytics.  Edges here are the entity→entity triples
(object starts with an entity prefix — the FK predicates of the triple
view; literal-valued triples carry no edge).

Determinism discipline: PageRank runs in *integer fixed-point*
(RANK_SCALE units).  Every per-iteration operation is integer division
or integer sum — both exact and order-independent — so Spark and the
DuckDB oracle produce bit-identical ranks with no float-drift exposure
even after many iterations (unlike a double-valued PageRank, where
aggregation order drifts ULPs per iteration).

Scale notes: one shuffle per PageRank iteration (groupBy dst), the
out-degree table joins broadcast when small / shuffle-hash when not,
and the iteration count is fixed (no driver-side convergence collect).
Edges are re-derived per iteration from a persisted, checkpoint-
truncated edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfind_spark.sources.triples import triple_view_sql
from rdfind_spark.util import materialize

PR_ITERATIONS = 5
PR_DAMPING_PCT = 85  # d = 0.85 as an integer percentage (exact arithmetic)
RANK_SCALE = 1_000_000_000_000  # fixed-point units per unit of rank
# Loop-stage sizing: the iteration tables are fixed-width (16-24 B
# rows), so ~4M rows ≈ one 64 MB shuffle partition.  The session-global
# shuffle.partitions is sized for the STRING-heavy queries; inheriting
# it here costs ~0.5 s of pure scheduling per stage when the graph is
# small relative to the session's data (measured 26.6 s vs 15.6 s for
# the full query at sf0.1 under a 128-partition session).
PR_EDGES_PER_PARTITION = 4_000_000


def entity_edges(triples: DataFrame) -> DataFrame:
    """Distinct entity→entity edges: triples whose object is an entity
    reference (contains the ``prefix:`` marker used by every entity in
    the triple view, e.g. ``nation:7``).  Literal objects (names,
    statuses, flags) are not edges."""
    is_entity = F.col("obj").rlike("^[a-z]+:")
    return (
        triples.filter(is_entity)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )


ENTITY_EDGES_SQL = """SELECT DISTINCT subj AS src, obj AS dst
FROM triples WHERE regexp_matches(obj, '^[a-z]+:')"""


def degree_distribution(triples: DataFrame) -> DataFrame:
    """Degree histogram of the entity graph: for each (direction,
    degree) the number of nodes with that degree — the first sanity
    check on any graph at scale (hub detection, skew planning).  Two
    aggregations, each one shuffle."""
    edges = entity_edges(triples)
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree")
    )
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("degree")
    )
    return (
        out_deg.withColumn("direction", F.lit("out"))
        .unionByName(in_deg.withColumn("direction", F.lit("in")))
        .groupBy("direction", "degree")
        .agg(F.count("*").alias("n_nodes"))
    )


def degree_distribution_sql() -> str:
    return f"""WITH triples AS (
{triple_view_sql()}
),
edges AS ({ENTITY_EDGES_SQL}),
deg AS (
  SELECT 'out' AS direction, src AS node, COUNT(*) AS degree
  FROM edges GROUP BY src
  UNION ALL
  SELECT 'in' AS direction, dst AS node, COUNT(*) AS degree
  FROM edges GROUP BY dst
)
SELECT direction, degree, COUNT(*) AS n_nodes
FROM deg GROUP BY direction, degree"""


# Hub-removal threshold for the component decomposition — the classic
# "remove hubs, then find communities" shape, and the threshold is part
# of the query definition (the oracle embeds the same constant).  The
# value is chosen SUBCRITICAL deliberately: parts average ~30 lineitems
# at every SF, so P(part degree <= 10) ~ 4e-5 and essentially no part
# survives to bridge customer neighborhoods — the surviving graph is
# order/lineitem stars bound per-customer where the customer (degree ~
# Poisson(11)) survives, with diameter bounded by COMMUNITY size, not
# corpus size.  A threshold of 20 instead sits near the bridge graph's
# percolation critical point (the ~4% of parts below it weave one giant
# snake-like component): measured rounds-to-converge grew 9 (sf0.001)
# -> 14 (sf0.01) -> >12 budget, with ONE component left at sf0.001 —
# the structure a hub-removal query exists to avoid.  At 10, measured
# convergence is 3-5 rounds at every SF probed, scale-independently.
COMPONENTS_MAX_DEGREE = 10
# Fixed round budget shared by the Spark loop (raise-on-exceed) and the
# chained-CTE oracle (identity once the fixed point is reached) — see
# graph_components for the equivalence argument.  Measured usage is
# 3-5 rounds (subcritical regime, above); 12 = ~4x headroom, and the
# loop raises loudly rather than emit a non-converged labeling.
COMPONENTS_MAX_ROUNDS = 12


def hub_pruned_sym_edges(triples: DataFrame, max_degree: int):
    """(kept_nodes, symmetrized_edges) of the hub-pruned entity graph —
    the shared construction of ``graph_components`` and its convergence
    headroom test (which must measure the SAME graph the registered
    query labels).  Hub removal: two anti-joins against the hub set
    (hub count is corpus_degree_mass / max_degree — broadcast-sized,
    AQE promotes).  Edges come back symmetrized and distinct, as
    ``_min_label_components`` requires."""
    edges = materialize(entity_edges(triples))
    deg = materialize(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    hubs = deg.filter(F.col("degree") > max_degree).select("node")
    kept = deg.filter(F.col("degree") <= max_degree).select("node")
    ke = edges.join(
        hubs.select(F.col("node").alias("src")), on="src", how="left_anti"
    ).join(hubs.select(F.col("node").alias("dst")), on="dst", how="left_anti")
    sym = (
        ke.select(F.col("src").alias("a_id"), F.col("dst").alias("b_id"))
        .unionByName(
            ke.select(F.col("dst").alias("a_id"), F.col("src").alias("b_id"))
        )
        .distinct()
        .transform(materialize)
    )
    return kept, sym


def graph_components(
    triples: DataFrame,
    max_degree: int = COMPONENTS_MAX_DEGREE,
    max_iters: int = COMPONENTS_MAX_ROUNDS,
) -> DataFrame:
    """Connected components of the entity graph after hub removal —
    the second half of the graph-analytics pair (with ``pagerank``).
    The raw entity graph is one giant component (everything reaches
    everything through the nation/region hubs), so the structural
    query removes nodes with total degree > ``max_degree`` first and
    labels what remains: order/lineitem stars, bound into per-customer
    communities where the customer node survives the degree cut (see
    ``COMPONENTS_MAX_DEGREE`` for why the threshold must sit below the
    bridge graph's percolation critical point).

    Spark side: min-label propagation WITH pointer jumping
    (``_min_label_components``, functions/dedup.py — the same loop that
    clusters near-duplicates), run over the symmetrized hub-pruned
    edges.  O(log diameter) rounds, one join+aggregate and one lookup
    join per round, state bounded by the surviving edge endpoints;
    raises rather than return a non-converged labeling.  Labels are the
    node STRINGS (min = lexicographic, identical in Spark and DuckDB
    for the ASCII ``prefix:id`` vocabulary) — unlike PageRank there is
    no per-iteration arithmetic to keep narrow, and the final label IS
    the output column, so dictionary-encoding would just add two
    restore joins.

    Oracle equivalence: the oracle runs the IDENTICAL recurrence
    (min over own+neighbor labels, then pointer jump L := L[L]) as
    ``max_iters`` chained materialized CTEs.  Both sides compute the
    same deterministic label sequence; the Spark loop stops early at
    the fixed point (and RAISES if it is not reached by ``max_iters``),
    while the oracle's surplus rounds past the fixed point are the
    identity map — so equal results are guaranteed, never coincidental.

    Returns (node, component_id) for every NON-HUB node; nodes whose
    every neighbor was a hub become their own singleton component."""
    from rdfind_spark.functions.dedup import _min_label_components
    from rdfind_spark.util import loop_shuffle_partitions

    kept, sym = hub_pruned_sym_edges(triples, max_degree)
    # Loop-stage sizing (the pagerank rule, see loop_shuffle_partitions):
    # the label tables are edge-endpoint-sized fixed-width rows; sym is
    # already materialized, so the count is a cache scan.
    with loop_shuffle_partitions(triples.sparkSession, sym.count()):
        labels, _ = _min_label_components(sym, max_iters)
    return kept.join(
        labels.withColumnRenamed("doc_id", "node"), on="node", how="left"
    ).select("node", F.coalesce("cluster_id", "node").alias("component_id"))


def graph_components_sql(
    max_degree: int = COMPONENTS_MAX_DEGREE,
    rounds: int = COMPONENTS_MAX_ROUNDS,
) -> str:
    """The identical min-label + pointer-jump recurrence as chained
    MATERIALIZED CTEs (two per round) — same pattern as pagerank_sql;
    surplus rounds past the fixed point are the identity map."""
    parts = [
        f"""WITH triples AS (
{triple_view_sql()}
),
edges AS ({ENTITY_EDGES_SQL}),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
  ) GROUP BY node
),
kept AS (SELECT node FROM deg WHERE degree <= {max_degree}),
ke AS (
  SELECT e.src, e.dst FROM edges e
  WHERE e.src IN (SELECT node FROM kept)
    AND e.dst IN (SELECT node FROM kept)
),
sym AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM ke UNION SELECT dst AS a, src AS b FROM ke
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM sym)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
s{i} AS MATERIALIZED (
  SELECT l.node, LEAST(l.lab, MIN(n.lab)) AS lab
  FROM l{i - 1} l
  JOIN sym e ON e.a = l.node
  JOIN l{i - 1} n ON n.node = e.b
  GROUP BY l.node, l.lab
),
l{i} AS MATERIALIZED (
  SELECT s.node, COALESCE(j.lab, s.lab) AS lab
  FROM s{i} s LEFT JOIN s{i} j ON j.node = s.lab
)"""
        )
    parts.append(
        f"""
SELECT k.node, COALESCE(l.lab, k.node) AS component_id
FROM kept k LEFT JOIN l{rounds} l ON l.node = k.node"""
    )
    return "".join(parts)


def pagerank(
    triples: DataFrame,
    iterations: int = PR_ITERATIONS,
    top_k: int = 50,
) -> DataFrame:
    """Fixed-iteration PageRank over the entity graph, in integer
    fixed-point (see module docstring).  Dangling nodes (no out-edges)
    leak their rank mass, as in the classic simplified formulation —
    the oracle reproduces the identical recurrence:

        r0(v)     = RANK_SCALE // N
        r_{k+1}(v) = ((100 - d) * (RANK_SCALE // N)) // 100
                     + (d * Σ_{u→v} (r_k(u) // outdeg(u))) // 100

    Returns the ``top_k`` nodes by final rank (ties broken by node id),
    rank also as a double for human consumption.

    Scale shape: the rank table is node-sized; each iteration is one
    equi-join (rank ⋈ edges on src, outdeg pre-attached to the edge
    table so the join carries no extra columns) and one groupBy(dst) —
    partial aggregation makes the shuffle per-node, not per-edge.  The
    loop body is lazily composed and the rank table localCheckpoint-ed
    per round so the plan stays iteration-local (same pattern as the
    near-dup label propagation, functions/dedup.py)."""
    # Dictionary-encode node URIs to 64-bit ids up front (the CIND
    # engine's hashing discipline, cind.py build_capture_tables): every
    # shuffle — the edge distinct, the node census, the iteration loop
    # — moves fixed-width longs, not URI strings; strings never shuffle
    # at all (restored map-side for the ~top_k result rows only).  An
    # xxhash64 collision would merge two nodes — probability ~n²/2⁶⁵
    # (~1e-8 at 640k nodes), and a merge perturbs ranks, so the
    # driver's oracle comparison catches it loudly.
    is_entity = F.col("obj").rlike("^[a-z]+:")
    raw = triples.filter(is_entity).select(
        F.col("subj").alias("src_s"), F.col("obj").alias("dst_s")
    )
    # The edge table is persisted PARTITIONED BY src: the out-degree
    # aggregate, the attach join, and every iteration's rank join are
    # all keyed on src, so hashing the cache once lets each of them
    # reuse the stored partitioning — the profiled prefix previously
    # spent its largest segment re-exchanging edges for the out-degree
    # attach, and each iteration re-shuffled the edge side of the rank
    # join (only the node-sized rank table needs an exchange per round
    # now, which also holds at cluster scale where ranks are far too
    # big to broadcast).
    edges0 = (
        raw.select(
            F.xxhash64("src_s").alias("src"), F.xxhash64("dst_s").alias("dst")
        )
        .distinct()
        .persist()
    )
    n_edges = edges0.count()
    # Pin the loop's shuffle parallelism to the measured graph size
    # (floored at the cluster's core count) instead of inheriting the
    # session-global shuffle.partitions — see PR_EDGES_PER_PARTITION.
    # The whole heavy loop executes eagerly inside this function (the
    # rank table is checkpoint-materialized before return), so the
    # session conf is restored before any caller-side job runs; only
    # the result-sized string restore executes under the caller's conf,
    # which is the right setting for a string-table scan anyway.
    spark = triples.sparkSession
    loop_par = max(
        spark.sparkContext.defaultParallelism,
        1 + n_edges // PR_EDGES_PER_PARTITION,
    )
    conf_key = "spark.sql.shuffle.partitions"
    old_partitions = spark.conf.get(conf_key)
    spark.conf.set(conf_key, str(loop_par))
    try:
        return _pagerank_loop(edges0, iterations, top_k, raw)
    finally:
        spark.conf.set(conf_key, old_partitions)


def _pagerank_loop(
    edges0: DataFrame, iterations: int, top_k: int, raw: DataFrame
) -> DataFrame:
    edges = edges0.repartition("src").persist()
    edges.count()
    edges0.unpersist()
    nodes = (
        edges.select(F.explode(F.array("src", "dst")).alias("id"))
        .distinct()
        .persist()
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # outdeg attached once (colocated: both sides carry the cached
    # src partitioning); edge table re-used every iteration
    edges_d = edges.join(out_deg, on="src").persist()
    # nodes and edges_d both read only the already-built edges cache —
    # materialize them concurrently (the cind.py two-thread pattern;
    # no unbuilt shared cache, so no AQE cache race).
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(nodes.count)
        f2 = pool.submit(edges_d.count)
        n_nodes = f1.result()
        f2.result()
    base = RANK_SCALE // n_nodes
    teleport = (100 - PR_DAMPING_PCT) * base // 100
    edges.unpersist()

    # Nodes with no in-edges sit at exactly `teleport` after every
    # round — precompute them once and UNION them in, instead of a
    # node-table left join per iteration (one fewer join shuffle per
    # round; the union is a no-shuffle concat).
    no_in = nodes.join(
        edges_d.select(F.col("dst").alias("id")).distinct(),
        on="id",
        how="left_anti",
    ).persist()
    no_in.count()
    ranks = nodes.select("id", F.lit(base).alias("rank"))
    for i in range(iterations):
        contrib = (
            edges_d.join(
                ranks.select(F.col("id").alias("src"), "rank"), on="src"
            )
            .select(
                F.col("dst").alias("id"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = contrib.select(
            "id",
            (
                F.lit(teleport)
                + F.expr(f"({PR_DAMPING_PCT} * inflow) div 100")
            ).alias("rank"),
        ).unionByName(no_in.select("id", F.lit(teleport).alias("rank")))
        # The iteration chain is LINEAR (ranks feeds the next round
        # exactly once), so plan size grows only linearly and several
        # rounds can fuse into one job — checkpoint every third round
        # just to bound plan depth for large iteration counts, instead
        # of forcing one barrier job per round.
        if (i + 1) % 3 == 0 and (i + 1) < iterations:
            ranks = materialize(ranks)
    # Materialize the final rank table BEFORE unpersisting the loop
    # inputs: the returned DataFrame executes later, and un-checkpointed
    # trailing iterations would silently recompute edges_d/no_in from
    # the raw triples at that point (measured as most of the query's
    # wall-clock before this fix).
    ranks = materialize(ranks)
    no_in.unpersist()
    edges_d.unpersist()
    nodes.unpersist()

    # Top-k selection happens on hashed ids, string restoration on the
    # candidate rows only — no node-sized string shuffle, and nothing
    # node-sized ever reaches the driver:
    #  1. kth = the top_k-th largest rank (TakeOrdered on longs — a
    #     ≤ top_k driver list);
    #  2. candidates = every node with rank >= kth (top_k + rank ties;
    #     usually result-sized, but a tie band CAN be huge — every
    #     zero-in-degree node sits at exactly `teleport`, so if the
    #     boundary falls into that band the candidate set is node-sized.
    #     It therefore stays a DataFrame end-to-end: restoration is a
    #     distributed semi-join, never an `isin` over a collected list);
    #  3. restore candidate strings via a join of the raw string edges
    #     against the candidate id set (AQE broadcasts when small);
    #  4. the exact (rank desc, node-STRING asc) tie-break runs as a
    #     distributed TakeOrdered LIMIT over the restored candidates —
    #     no single-partition window over a possibly node-sized band —
    #     and row_number assigns positions over the ≤ top_k survivors.
    kth_rows = (
        ranks.select("rank").orderBy(F.col("rank").desc()).limit(top_k).collect()
    )
    if not kth_rows:
        return ranks.select(
            F.lit("").alias("node"),
            "rank",
            F.lit(0.0).alias("pr"),
            F.lit(0).alias("pos"),
        ).limit(0)
    kth = kth_rows[-1]["rank"]
    cand = ranks.filter(F.col("rank") >= kth)
    node_strings = (
        raw.select(F.explode(F.array("src_s", "dst_s")).alias("node"))
        .withColumn("id", F.xxhash64("node"))
        .join(cand.select("id"), on="id", how="left_semi")
        .distinct()
    )
    restored = cand.join(node_strings, on="id").select("node", "rank")
    top = restored.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rank").desc(), F.col("node").asc())
    return top.withColumn("pos", F.row_number().over(w)).select(
        "node",
        "rank",
        F.round(F.col("rank") / F.lit(float(RANK_SCALE)), 9).alias("pr"),
        "pos",
    )


def pagerank_sql(iterations: int = PR_ITERATIONS, top_k: int = 50) -> str:
    """The identical integer recurrence as chained CTEs (one per
    iteration) — DuckDB arithmetic on BIGINTs matches Spark's exactly,
    so ranks are bit-identical by construction."""
    d = PR_DAMPING_PCT
    parts = [
        f"""WITH triples AS (
{triple_view_sql()}
),
edges AS ({ENTITY_EDGES_SQL}),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
),
params AS (
  SELECT {RANK_SCALE} // COUNT(*) AS base,
         ((100 - {d}) * ({RANK_SCALE} // COUNT(*))) // 100 AS teleport
  FROM nodes
),
edges_d AS (
  SELECT e.src, e.dst, o.outdeg
  FROM edges e
  JOIN (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src) o
    ON o.src = e.src
),
r0 AS (
  SELECT node, (SELECT base FROM params) AS rank FROM nodes
)"""
    ]
    for i in range(iterations):
        parts.append(
            f""", r{i + 1} AS (
  SELECT n.node,
         (SELECT teleport FROM params)
         + ({d} * COALESCE(c.inflow, 0)) // 100 AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS inflow
    FROM edges_d e JOIN r{i} r ON r.node = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)"""
        )
    parts.append(
        f"""
SELECT node, rank, round(CAST(rank AS DOUBLE) / {RANK_SCALE}.0, 9) AS pr, pos
FROM (
  SELECT node, CAST(rank AS BIGINT) AS rank,
         CAST(row_number() OVER (ORDER BY rank DESC, node ASC) AS INT) AS pos
  FROM r{iterations}
) WHERE pos <= {top_k}"""
    )
    return "".join(parts)


def pair_triangles(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected pair graph given as
    canonical (a_id, b_id) rows with a_id < b_id — e.g. the near-
    duplicate candidate graphs from functions/dedup.py.  Triangle
    density is the standard cohesion check on a near-dup graph before
    transitive clustering: cliques (true duplicate groups) are
    triangle-rich, while chained false positives are triangle-poor.

    Spark side runs the degree-ordered orientation algorithm (the
    MapReduce-era standard for skew-safe triangle enumeration, cf.
    Suri & Vassilvitskii "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): every edge is oriented from its (degree, id)-
    smaller endpoint to the larger, which makes the directed graph
    acyclic with out-degree bounded by O(sqrt(|E|)) — so the wedge
    self-join Σ outdeg² is near-linear even when one hub node touches
    half the corpus, where a naive adjacency join would quadratically
    explode on exactly that node.  Each triangle then has exactly one
    node with two out-edges (its orientation-minimal corner), so the
    wedge→closing-edge equi-join counts every triangle exactly once:
    two shuffles (wedge join on the source, closing join on the
    (v1, v2) pair), no window, no driver state.

    The oracle runs the direct id-ordered 3-way self-join (fine at
    oracle scale; identical result set by symmetry of the triangle
    predicate).  Returns (doc_id, n_triangles) for nodes in >= 1
    triangle.

    Output-size honesty: a c-clique CONTAINS c³/6 triangles, so a pair
    graph with a giant duplicate class makes the result itself cubic in
    the class size — no plan fixes an output that big.  Run this after
    exact dedup has collapsed identical-text classes (the same upstream
    discipline MAX_BAND_DOCS documents for LSH), where near-dup cliques
    stay small."""
    e = edges.select(
        F.col("a_id").cast("long").alias("u"), F.col("b_id").cast("long").alias("v")
    ).distinct()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u").join(
        deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("td"),
    )
    oriented = materialize(oriented)  # feeds the wedge join twice + the close
    o1 = oriented.select("s", F.col("t").alias("v1"), F.col("td").alias("d1"))
    o2 = oriented.select("s", F.col("t").alias("v2"), F.col("td").alias("d2"))
    wedges = o1.join(o2, "s").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    tri = wedges.join(
        oriented.select(F.col("s").alias("v1"), F.col("t").alias("v2")),
        ["v1", "v2"],
    )
    return (
        tri.select(F.explode(F.array("s", "v1", "v2")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )


def pair_triangles_sql(pairs_sql: str) -> str:
    """Oracle rendering over any canonical-pair CTE: enumerate each
    triangle once as x < y < z via the direct 3-way self-join, then
    count corner participation per node."""
    return f"""WITH pairs AS ({pairs_sql}),
e AS (SELECT a_id, b_id FROM pairs),
tri AS (
  SELECT e1.a_id AS x, e1.b_id AS y, e2.b_id AS z
  FROM e e1
  JOIN e e2 ON e2.a_id = e1.b_id
  JOIN e e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
),
corners AS (
  SELECT x AS doc_id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT doc_id, COUNT(*) AS n_triangles FROM corners GROUP BY doc_id"""


# ------------------------------------------------------------- k-core

KCORE_K = 4
KCORE_MAX_ROUNDS = 14  # sf0.001/0.1 converge in 6 peels, sf0.01 in 9
# Strategy switchover (round-9 verdict task 4 — the criterion coded,
# not prose): after the FIRST degree filter, if more than this percent
# of nodes survive, the graph has a long peel tail (small fronts, many
# rounds) and the decrement peel wins — restrict-peel rewrites the
# whole surviving edge set every round, which only pays when the
# survivor set collapses geometrically.  On the entity graphs here
# round 1 peels >70% of nodes (survivors ~25-30%), so "auto" stays on
# restrict — consistent with the round-9 measurement (restrict 21-50s
# vs decrement 96-118s at sf0.1); a k=2 path graph keeps ~100% of
# nodes per round and flips to decrement (fixture-pinned).
KCORE_DECREMENT_SURVIVOR_PCT = 70


def k_core(
    triples: DataFrame,
    k: int = KCORE_K,
    max_rounds: int = KCORE_MAX_ROUNDS,
    strategy: str = "auto",
) -> DataFrame:
    """k-core decomposition membership (Seidman 1983): the maximal
    subgraph of the symmetrized entity graph in which every node has
    degree >= k, computed by the standard peel — repeatedly drop nodes
    whose degree among SURVIVING nodes is < k until a fixed point.
    The third structural query of the graph family (with components
    and PageRank): cores locate the densely-embedded entities that
    survive after the star fringes (lineitems, leaf parts) peel away.

    Output: (node, core_degree) for every node in the k-core, with its
    within-core degree (>= k by definition).

    Spark side, TWO physical strategies behind one semantics
    (``strategy``: "auto" | "restrict" | "decrement"):

    - **restrict-peel** — per round, one degree aggregate over the
      SURVIVING edge set and two semi-joins restricting it.  Wins when
      the surviving set shrinks geometrically, as on star-fringe
      graphs like this one (round 1 peels the lineitem leaves, >70% of
      nodes), so total work is a fast-converging sum of shrinking
      scans.
    - **decrement-peel** — the edge table is built once and never
      rewritten; each round joins it against just the just-removed
      FRONT and decrements the survivors' degree ledger.  Wins when
      fronts stay small relative to the graph (long peel tails — deep
      k-cores, path-heavy graphs), where restrict would rewrite a
      barely-shrinking edge set every round.  MEASURED here: 96-118s
      vs restrict's 21-50s at sf0.1 on the star-fringe entity graph —
      which is exactly why "auto" picks by the measured shape, the
      round-1 survivor ratio (``KCORE_DECREMENT_SURVIVOR_PCT``),
      rather than hard-coding either.

    Both strategies peel the SAME nodes in the same rounds (the front
    at round i is the standard simultaneous peel's round-i removal
    set), so they agree exactly — property-pinned in
    tests/test_graph_text2.py and driver-checked against the one
    unrolled-CTE oracle (``graph_kcore`` restrict, ``graph_kcore_decrement``
    forced decrement).  Raises rather than return a non-converged core
    (same discipline as ``graph_components``).  Oracle equivalence:
    the peel is monotone and idempotent at the fixed point, so the
    oracle's ``max_rounds``-deep unrolled CTE chain equals the
    converged loop exactly — surplus rounds are the identity map,
    never coincidence.

    Equal survivor COUNT implies equal survivor SET (the peel is
    monotone decreasing), so the count-stability stop is exact."""
    if strategy not in ("auto", "restrict", "decrement"):
        raise ValueError(f"k_core: unknown strategy {strategy!r}")
    edges = entity_edges(triples)
    sym = materialize(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .distinct()
    )
    # Round 1 is shared: the full-degree ledger and its first filter
    # both price the criterion and seed whichever loop runs.
    deg = materialize(sym.groupBy("a").agg(F.count("*").alias("d")))
    n_nodes = deg.count()
    alive0 = deg.filter(F.col("d") >= k)
    n_alive = alive0.count()
    if strategy == "auto":
        strategy = (
            "decrement"
            if n_nodes > 0
            and n_alive * 100 > n_nodes * KCORE_DECREMENT_SURVIVOR_PCT
            else "restrict"
        )
    from rdfind_spark.util import loop_shuffle_partitions

    # Loop-stage sizing (the pagerank rule): per-round state is bounded
    # by the symmetrized edge set, far below what the session's
    # shuffle.partitions was sized for.  The peel loops run eagerly
    # inside (per-round materialize), so the pin covers all the heavy
    # stages; only the result-sized final aggregate executes under the
    # caller's conf.
    with loop_shuffle_partitions(triples.sparkSession, sym.count()):
        if strategy == "decrement":
            return _k_core_decrement(sym, deg, k, max_rounds)
        return _k_core_restrict(sym, alive0, n_alive, k, max_rounds)


def _k_core_restrict(
    sym: DataFrame, alive0: DataFrame, n_alive: int, k: int, max_rounds: int
) -> DataFrame:
    """Restrict-peel loop (see :func:`k_core`).  ``alive0``/``n_alive``
    are the round-1 degree filter the dispatcher already computed."""
    rem = materialize(alive0.select(F.col("a").alias("v")))
    prev_n = n_alive
    live = materialize(
        sym.join(rem.withColumnRenamed("v", "a"), on="a", how="left_semi")
        .join(rem.withColumnRenamed("v", "b"), on="b", how="left_semi")
    )
    for _ in range(max_rounds):
        rem = (
            live.groupBy("a")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("a").alias("v"))
        )
        rem = materialize(rem)
        n = rem.count()
        if n == prev_n:
            break
        prev_n = n
        live = materialize(
            live.join(rem.withColumnRenamed("v", "a"), on="a", how="left_semi")
            .join(rem.withColumnRenamed("v", "b"), on="b", how="left_semi")
        )
    else:
        raise RuntimeError(
            f"k_core: no fixed point within {max_rounds} peel rounds — "
            "raise KCORE_MAX_ROUNDS (and the oracle unroll) together"
        )
    return (
        live.groupBy("a")
        .agg(F.count("*").alias("core_degree"))
        .select(F.col("a").alias("node"), "core_degree")
    )


def _k_core_decrement(
    sym: DataFrame, deg: DataFrame, k: int, max_rounds: int
) -> DataFrame:
    """Decrement-peel loop (see :func:`k_core`): ``sym`` is scanned
    per round only against the just-removed front; the mutable state
    is the alive-node degree ledger.  A survivor's final ledger value
    is its within-core degree: it started at full degree and lost
    exactly one per removed neighbor (fronts are disjoint across
    rounds, ``sym`` is distinct-symmetric)."""
    from rdfind_spark.util import release

    ledger = deg  # (a, d) over alive nodes; first round: all nodes
    for _ in range(max_rounds):
        front = ledger.filter(F.col("d") < k).select(F.col("a").alias("v"))
        alive = ledger.filter(F.col("d") >= k)
        if front.isEmpty():
            return alive.select(
                F.col("a").alias("node"), F.col("d").alias("core_degree")
            )
        # decrements flow along edges OUT of the front (sym is
        # symmetric, so the b-side join sees every incident edge);
        # decrements aimed at removed nodes drop out in the alive join
        dec = (
            sym.join(front.withColumnRenamed("v", "b"), on="b")
            .groupBy("a")
            .agg(F.count("*").alias("c"))
        )
        nxt = materialize(
            alive.join(dec, on="a", how="left").select(
                "a",
                (F.col("d") - F.coalesce(F.col("c"), F.lit(0))).alias("d"),
            )
        )
        release(ledger)
        ledger = nxt
    raise RuntimeError(
        f"k_core: no fixed point within {max_rounds} peel rounds — "
        "raise KCORE_MAX_ROUNDS (and the oracle unroll) together"
    )


def k_core_sql(k: int = KCORE_K, rounds: int = KCORE_MAX_ROUNDS) -> str:
    """The identical peel as ``rounds`` chained MATERIALIZED CTEs —
    surplus rounds past the fixed point are the identity map (same
    pattern as graph_components_sql / pagerank_sql)."""
    parts = [
        f"""WITH triples AS (
{triple_view_sql()}
),
edges AS ({ENTITY_EDGES_SQL}),
sym AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT dst AS a, src AS b FROM edges
),
e0 AS MATERIALIZED (SELECT a, b FROM sym)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
r{i} AS MATERIALIZED (
  SELECT a AS v FROM e{i - 1} GROUP BY a HAVING COUNT(*) >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  WHERE e.a IN (SELECT v FROM r{i}) AND e.b IN (SELECT v FROM r{i})
)"""
        )
    parts.append(
        f"""
SELECT a AS node, COUNT(*) AS core_degree
FROM e{rounds} GROUP BY a"""
    )
    return "".join(parts)
