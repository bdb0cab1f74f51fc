"""Tests for graph analytics (degree distribution, integer PageRank)
and the round-2 text operators (TF-IDF keywords, quality filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfind_spark.functions import graph, text


def _toy_triples(spark):
    # a tiny two-hub graph: a->b, a->c, b->c, c->a plus literal rows
    rows = [
        ("n:a", "linksTo", "n:b"),
        ("n:a", "linksTo", "n:c"),
        ("n:b", "linksTo", "n:c"),
        ("n:c", "linksTo", "n:a"),
        ("n:a", "hasName", "Alpha"),  # literal: not an edge
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_entity_edges_excludes_literals(spark):
    edges = graph.entity_edges(_toy_triples(spark)).collect()
    assert len(edges) == 4
    assert all(r.dst.startswith("n:") for r in edges)


def test_degree_distribution_counts(spark):
    rows = {
        (r.direction, r.degree): r.n_nodes
        for r in graph.degree_distribution(_toy_triples(spark)).collect()
    }
    # out-degrees: a=2, b=1, c=1 -> {2:1 node, 1:2 nodes}
    assert rows[("out", 2)] == 1
    assert rows[("out", 1)] == 2
    # in-degrees: b=1, c=2, a=1
    assert rows[("in", 2)] == 1
    assert rows[("in", 1)] == 2


def test_pagerank_matches_hand_recurrence(spark):
    """One iteration by hand, in the exact integer recurrence."""
    pr = graph.pagerank(_toy_triples(spark), iterations=1, top_k=10)
    got = {r.node: r.rank for r in pr.collect()}
    base = graph.RANK_SCALE // 3
    teleport = (100 - graph.PR_DAMPING_PCT) * base // 100
    d = graph.PR_DAMPING_PCT
    # outdeg: a=2, b=1, c=1. contributions: a: from c (base//1);
    # b: from a (base//2); c: from a (base//2) + b (base//1)
    exp_a = teleport + d * (base // 1) // 100
    exp_b = teleport + d * (base // 2) // 100
    exp_c = teleport + d * ((base // 2) + (base // 1)) // 100
    assert got == {"n:a": exp_a, "n:b": exp_b, "n:c": exp_c}


def test_pagerank_mass_is_order_independent(spark):
    """Repartitioned input gives bit-identical ranks (integer
    arithmetic has no aggregation-order drift)."""
    t = _toy_triples(spark)
    a = {r.node: r.rank for r in graph.pagerank(t, iterations=3).collect()}
    b = {
        r.node: r.rank
        for r in graph.pagerank(t.repartition(7), iterations=3).collect()
    }
    assert a == b


def test_tfidf_keywords_basic(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry dog"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_keywords(docs, k=2)
    rows = {(r.doc_id, r.term): r for r in out.collect()}
    # 'apple' appears in 1 doc -> idf = ln(3/1); tf=2
    r = rows[(1, "apple")]
    assert r.tf == 2 and r.df == 1 and r.pos == 1
    # per-doc top-k respected
    assert max(r.pos for r in rows.values()) <= 2
    # stopwords never emitted
    docs2 = spark.createDataFrame(
        [(1, "the the the word")], "doc_id long, text string"
    )
    terms = {r.term for r in text.tfidf_keywords(docs2, k=5).collect()}
    assert "the" not in terms and "word" in terms


def test_quality_filter_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b"),  # too short
            (2, "spam " * 50),  # repetitive (one distinct token)
            (3, "the quick brown fox jumps over a lazy dog near the river "
                "bank while birds sing softly today"),  # clean
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.quality_filter(docs).collect()}
    assert not rows[1].keep and "too_short" in rows[1].fail_reasons
    assert not rows[2].keep and "repetitive" in rows[2].fail_reasons
    assert rows[3].keep and rows[3].fail_reasons == ""


def test_pagerank_plan_has_no_global_single_partition_sort(spark):
    """The top-k must plan as TakeOrderedAndProject, not a global
    window sort over the full rank table."""
    pr = graph.pagerank(_toy_triples(spark), iterations=1, top_k=5)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_span_dedup_keeps_first_occurrence(spark):
    from rdfind_spark.functions import sampling

    docs = spark.createDataFrame(
        [
            (1, "s", "en", "a b c d e f g h i j K L M"),  # spans: [a..j], [K L M]
            (2, "s", "en", "a b c d e f g h i j X Y Z"),  # first span is a dup
        ],
        "doc_id long, source string, lang string, text string",
    )
    rows = {r.doc_id: r for r in sampling.span_dedup(docs, k=10).collect()}
    assert rows[1].n_spans == 2 and rows[1].n_dup_spans == 0
    assert rows[1].clean_text == "a b c d e f g h i j K L M"
    assert rows[2].n_spans == 2 and rows[2].n_dup_spans == 1
    assert rows[2].clean_text == "X Y Z"


def test_span_dedup_within_document(spark):
    from rdfind_spark.functions import sampling

    text = " ".join(["w"] * 20)  # two identical 10-token spans
    docs = spark.createDataFrame(
        [(1, "s", "en", text)], "doc_id long, source string, lang string, text string"
    )
    r = sampling.span_dedup(docs, k=10).collect()[0]
    assert r.n_spans == 2 and r.n_dup_spans == 1
    assert r.clean_text == " ".join(["w"] * 10)


def test_mix_sources_weights_and_determinism(spark):
    from rdfind_spark.functions import sampling

    rows = [(i, "keep_all" if i % 2 else "keep_none", "en", "t") for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    out = sampling.mix_sources(
        docs, weights={"keep_all": 1.0, "keep_none": 0.0}
    ).collect()
    assert {r.source for r in out} == {"keep_all"}
    assert len(out) == 100
    # half-weight keeps roughly half, deterministically
    out1 = sampling.mix_sources(docs, weights={}, default=0.5).collect()
    out2 = sampling.mix_sources(docs.repartition(7), weights={}, default=0.5).collect()
    assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)
    assert 60 <= len(out1) <= 140


def test_graph_components_removes_hubs_and_labels_communities(spark):
    """Hand-built graph: one hub (degree 4 > max_degree 3) wired into
    two otherwise-disconnected chains.  With the hub removed the chains
    are separate components labeled by their lexicographic-min node;
    the node left with only hub edges becomes its own singleton."""
    rows = [
        # chain 1: a-b-c (plus hub edges)
        ("n:a", "p", "n:b"),
        ("n:b", "p", "n:c"),
        # chain 2: x-y
        ("n:x", "p", "n:y"),
        # hub h touches both chains and a leaf that has no other edge
        ("n:h", "p", "n:a"),
        ("n:h", "p", "n:x"),
        ("n:h", "p", "n:leaf"),
        ("n:leaf2", "p", "n:h"),
        ("n:a", "name", "Literal"),  # not an edge
    ]
    triples = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        r.node: r.component_id
        for r in graph.graph_components(triples, max_degree=3).collect()
    }
    assert got == {
        "n:a": "n:a",
        "n:b": "n:a",
        "n:c": "n:a",
        "n:x": "n:x",
        "n:y": "n:x",
        # hub-isolated nodes: own singleton; the hub itself is absent
        "n:leaf": "n:leaf",
        "n:leaf2": "n:leaf2",
    }


def test_graph_components_matches_duckdb_oracle_on_toy_graph(spark):
    """The chained-CTE oracle and the Spark loop run the identical
    recurrence — pin them equal on a graph with a diameter-4 chain so
    more than one round is actually exercised."""
    import duckdb

    rows = [("n:%02d" % i, "p", "n:%02d" % (i + 1)) for i in range(9)] + [
        ("m:1", "p", "m:2"),
        ("m:2", "p", "m:3"),
    ]
    triples = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = sorted(
        (r.node, r.component_id)
        for r in graph.graph_components(triples, max_degree=10).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE edges AS SELECT * FROM (VALUES "
        + ", ".join(f"('{s}', '{o}')" for s, _, o in rows)
        + ") t(src, dst)"
    )
    sql = graph.graph_components_sql(max_degree=10)
    # splice out the parquet-backed triple/edge CTEs, keep the algorithm
    body = sql[sql.index("deg AS (") :]
    oracle = sorted(map(tuple, con.execute("WITH " + body).fetchall()))
    assert got == oracle
    assert len({c for _, c in got}) == 2


def test_graph_components_converges_within_budget(spark, sf_dir):
    """The registered query's fixed round budget must cover the real
    data with headroom (the loop raises past the budget): measured 5
    rounds at sf0.001 against a budget of 12."""
    from rdfind_spark.functions.dedup import _min_label_components
    from rdfind_spark.sources.triples import triple_view

    # the SAME construction the registered query runs — shared helper,
    # so a pruning change cannot silently void this headroom check
    _, sym = graph.hub_pruned_sym_edges(
        triple_view(spark, sf_dir), graph.COMPONENTS_MAX_DEGREE
    )
    _, rounds = _min_label_components(sym, graph.COMPONENTS_MAX_ROUNDS)
    assert rounds <= graph.COMPONENTS_MAX_ROUNDS // 2, (
        f"convergence ({rounds} rounds) is eating the raise-don't-lie "
        f"headroom of COMPONENTS_MAX_ROUNDS={graph.COMPONENTS_MAX_ROUNDS}"
    )


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "a_id long, b_id long"
    )


def test_pair_triangles_known_graph(spark):
    # K4 on {0,1,2,3} (4 triangles, each node in 3) plus a pendant
    # edge 3-9 (node 9 in none) and an isolated edge 10-11
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = {
        r.doc_id: r.n_triangles
        for r in graph.pair_triangles(
            _pairs(spark, k4 + [(3, 9), (10, 11)])
        ).collect()
    }
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pair_triangles_hub_star_has_none_and_no_cartesian(spark):
    # a pure star (hub 0 to 50 leaves) has zero triangles — and the
    # degree-ordered orientation gives the HUB out-degree 0 (every
    # edge orients leaf->hub), so the wedge join emits nothing; the
    # plan must contain no cartesian/nested-loop stage
    star = [(0, i) for i in range(1, 51)]
    df = graph.pair_triangles(_pairs(spark, star))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert df.count() == 0


def test_pair_triangles_matches_bruteforce_random_graph(spark):
    # deterministic pseudo-random graph; brute-force triple loop as
    # the reference
    import itertools

    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 7919 + 13) % 30, (i * 104729 + 7) % 30) for i in range(140)
            )
            if a != b
        }
    )
    eset = set(edges)
    expected = {}
    for x, y, z in itertools.combinations(range(30), 3):
        if (x, y) in eset and (x, z) in eset and (y, z) in eset:
            for n in (x, y, z):
                expected[n] = expected.get(n, 0) + 1
    got = {
        r.doc_id: r.n_triangles
        for r in graph.pair_triangles(_pairs(spark, edges)).collect()
    }
    assert got == expected


def test_k_core_peels_fringes_keeps_clique(spark):
    """Hand-checkable 4-core: a 5-clique survives with within-core
    degree 4; a pendant node and a 5-leaf star peel away entirely
    (the star CENTER peels in round 2 — the cascade, not just the
    degree filter)."""
    from rdfind_spark.functions.graph import k_core

    rows = []
    clique = [f"x:{i}" for i in range(1, 6)]
    for i, a in enumerate(clique):
        for b in clique[i + 1 :]:
            rows.append((a, "linksTo", b))
    rows.append(("x:6", "linksTo", "x:1"))  # pendant
    for i in range(1, 6):  # star: center y:0
        rows.append((f"y:{i}", "linksTo", "y:0"))
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    got = {r.node: r.core_degree for r in k_core(triples, k=4).collect()}
    assert got == {n: 4 for n in clique}


def _kcore_strategy_spy(monkeypatch):
    """Record which k-core loop the dispatcher picked, still running it."""
    import rdfind_spark.functions.graph as g

    calls = []
    real_r, real_d = g._k_core_restrict, g._k_core_decrement

    def spy_r(*a, **kw):
        calls.append("restrict")
        return real_r(*a, **kw)

    def spy_d(*a, **kw):
        calls.append("decrement")
        return real_d(*a, **kw)

    monkeypatch.setattr(g, "_k_core_restrict", spy_r)
    monkeypatch.setattr(g, "_k_core_decrement", spy_d)
    return calls


def _path_clique_triples(spark, path_len=20):
    """Long-peel-tail shape: a path (k=2 peels two endpoints per round,
    front stays tiny while ~everything survives) plus a 5-clique that
    is the only 2-core."""
    rows = [(f"p:{i}", "linksTo", f"p:{i + 1}") for i in range(path_len)]
    clique = [f"c:{i}" for i in range(5)]
    for i, a in enumerate(clique):
        for b in clique[i + 1 :]:
            rows.append((a, "linksTo", b))
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_k_core_auto_picks_decrement_on_long_peel_tail(spark, monkeypatch):
    """Path-heavy graph at k=2: round 1 peels only the two path
    endpoints (>70% of nodes survive), so "auto" must dispatch to the
    decrement peel — and the result is still exactly the 5-clique."""
    from rdfind_spark.functions.graph import k_core

    calls = _kcore_strategy_spy(monkeypatch)
    triples = _path_clique_triples(spark)
    got = {
        r.node: r.core_degree
        for r in k_core(triples, k=2, max_rounds=20).collect()
    }
    assert calls == ["decrement"]
    assert got == {f"c:{i}": 4 for i in range(5)}


def test_k_core_auto_picks_restrict_on_star_fringe(spark, monkeypatch):
    """The clique+pendant+star fixture peels 6 of 12 nodes in round 1
    (survivors 50% < the 70% criterion) — "auto" stays on the
    restrict peel, matching the measured sf-graph behavior."""
    from rdfind_spark.functions.graph import k_core

    rows = []
    clique = [f"x:{i}" for i in range(1, 6)]
    for i, a in enumerate(clique):
        for b in clique[i + 1 :]:
            rows.append((a, "linksTo", b))
    rows.append(("x:6", "linksTo", "x:1"))
    for i in range(1, 6):
        rows.append((f"y:{i}", "linksTo", "y:0"))
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    calls = _kcore_strategy_spy(monkeypatch)
    got = {r.node: r.core_degree for r in k_core(triples, k=4).collect()}
    assert calls == ["restrict"]
    assert got == {n: 4 for n in clique}


def test_k_core_strategies_agree(spark):
    """Strategy-agreement pin: both physical loops produce the
    identical (node, core_degree) set on both fixture shapes and at
    both k values — the same result the one unrolled-CTE oracle
    checks on the driver board (graph_kcore vs graph_kcore_decrement)."""
    from rdfind_spark.functions.graph import k_core

    for triples, k in (
        (_path_clique_triples(spark), 2),
        (_path_clique_triples(spark, path_len=8), 3),
    ):
        r = {
            (row.node, row.core_degree)
            for row in k_core(
                triples, k=k, max_rounds=20, strategy="restrict"
            ).collect()
        }
        d = {
            (row.node, row.core_degree)
            for row in k_core(
                triples, k=k, max_rounds=20, strategy="decrement"
            ).collect()
        }
        assert r == d


def test_k_core_decrement_raises_without_fixed_point(spark):
    """The decrement loop keeps the restrict loop's loud-raise
    discipline: a peel deeper than max_rounds must raise, never return
    a half-peeled core."""
    import pytest

    from rdfind_spark.functions.graph import k_core

    with pytest.raises(RuntimeError, match="no fixed point"):
        k_core(
            _path_clique_triples(spark, path_len=20),
            k=2,
            max_rounds=3,
            strategy="decrement",
        ).collect()
