"""Unit tests for the training-data-pipeline operators (text, dedup,
similarity, events) on small hand-checkable inputs."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from rdfind_spark.functions import dedup, events, similarity, text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_token_stats_and_quality(spark):
    df = _docs(spark, ["the cat sat on the mat.", "a a a a"])
    stats = {r["doc_id"]: r for r in text.token_stats(df).collect()}
    assert stats[0]["n_tokens"] == 6
    assert stats[0]["n_bpe_tokens"] == 7  # 6 words + '.'
    assert stats[1]["n_distinct_tokens"] == 1
    q = {r["doc_id"]: r for r in text.quality_scores(df).collect()}
    assert q[1]["distinct_ratio"] == 0.25
    assert q[0]["stopword_ratio"] == 0.5  # the, on, the (of 6)
    assert q[1]["punct_ratio"] == 0.0


def test_lang_id_deterministic(spark):
    df = _docs(spark, ["the fast table", "le la et chose", "xyzzy blub"])
    got = {r["doc_id"]: r["detected_lang"] for r in text.lang_id(df).collect()}
    assert got[0] == "en"
    assert got[1] == "fr"
    assert got[2] == "en"  # all-zero scores fall back to first language


def test_fingerprint_matches_manual_minhash(spark):
    toks = ["w%d" % i for i in range(8)]
    txt = " ".join(toks)
    expected = min(
        hashlib.md5(" ".join(toks[i : i + 5]).encode()).hexdigest()
        for i in range(4)
    )
    got = text.fingerprints(_docs(spark, [txt])).collect()[0]["fingerprint"]
    assert got == expected


def test_exact_dedup_map_canonicalizes(spark):
    df = _docs(spark, ["Hello  World", "hello world", "other text"])
    rows = {r["doc_id"]: r["canonical_id"] for r in dedup.exact_dedup_map(df).collect()}
    assert rows == {0: 0, 1: 0, 2: 2}  # normalization merges 0 and 1


def test_ngram_jaccard_finds_near_dup(spark):
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"
    other = " ".join(f"x{i}" for i in range(30))
    df = _docs(spark, [base, near, other])
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert [(p["a_id"], p["b_id"]) for p in pairs] == [(0, 1)]
    # manual jaccard on 3-shingles
    sh = lambda t: {
        " ".join(t.split()[i : i + 3]) for i in range(len(t.split()) - 2)
    }
    a, b = sh(base), sh(near)
    assert abs(pairs[0]["jaccard"] - len(a & b) / len(a | b)) < 1e-6


def test_shingle_cosine_hand_checked_weights(spark):
    # doc0 "a b c" x3: shingles abc x3, bca x2, cab x2 -> |v|^2 = 17
    # doc1: abc x2, bca, cab, bcd, cdd, ddd -> |v|^2 = 9
    # dot = 3*2 + 2*1 + 2*1 = 10 -> cos^2 = 100/153 -> 653594 ppm
    df = _docs(spark, ["a b c a b c a b c", "a b c a b c d d d", "z y x w v u t"])
    rows = dedup.shingle_cosine_pairs(df, min_cos2_ppm=1).collect()
    assert [(r.a_id, r.b_id, r.dot, r.cos2_ppm) for r in rows] == [
        (0, 1, 10, 653594)
    ]
    # weighting matters: set Jaccard on the same pair is |{abc,bca,cab}|
    # over |{abc,bca,cab,bcd,cdd,ddd}| = 0.5 — the count-vector cosine
    # scores the repetition-aligned pair higher (0.808 vs 0.5)
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    j = {(r.a_id, r.b_id): r.jaccard for r in jac}[(0, 1)]
    assert abs(j - 0.5) < 1e-6


def test_shingle_cosine_hot_cap_drops_stopword_shingles(spark):
    # "s s s" appears in every doc -> df over the cap -> dropped from
    # dot AND norms; the residual vectors share nothing
    docs = [f"s s s s u{i} v{i} w{i}" for i in range(5)]
    df = _docs(spark, docs)
    rows = dedup.shingle_cosine_pairs(
        df, min_cos2_ppm=1, max_shingle_docs=3
    ).collect()
    assert rows == []


def test_minhash_lsh_agrees_with_exact_on_dups(spark):
    base = " ".join(f"w{i}" for i in range(40))
    near = base + " tail"
    df = _docs(spark, [base, near, " ".join(f"y{i}" for i in range(40))])
    got = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert [(p["a_id"], p["b_id"]) for p in got] == [(0, 1)]


def test_lsh_hot_band_bucket_cap_bounds_degenerate_corpus(spark):
    # A mass-duplicate class wider than MAX_BAND_DOCS collides in EVERY
    # band; without the cap one bucket alone would emit w(w-1)/2 ≈ 31k
    # candidates × 16 bands.  With the cap all its buckets are dropped:
    # the query completes with a candidate count bounded by the narrow
    # buckets only, and reports no pairs for the class (mass-identical
    # docs are exact_dedup_map's job — recall argument at MAX_BAND_DOCS).
    # A genuine sparse near-dup pair must still pair via its width-2
    # buckets.
    dup = " ".join(f"d{i}" for i in range(20))
    base = " ".join(f"w{i}" for i in range(40))
    near = base + " tail"
    n_dup = dedup.MAX_BAND_DOCS + 50
    rows = [(i, dup, "en", "src", len(dup)) for i in range(n_dup)]
    rows.append((n_dup, base, "en", "src", len(base)))
    rows.append((n_dup + 1, near, "en", "src", len(near)))
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert [(p["a_id"], p["b_id"]) for p in got] == [(n_dup, n_dup + 1)]
    # same degenerate class spanning the eval/train cut: fuzzy
    # contamination stays bounded too (its 10%-eval split crosses the
    # class, so uncapped it would be quadratic in the duplicated mass).
    # Only the genuine near-dup leak (doc 250 is eval, 251 train)
    # survives; the mass class reports nothing.
    cross = dedup.contamination_fuzzy(df).collect()
    assert [(r["eval_id"], r["train_id"]) for r in cross] == [(n_dup, n_dup + 1)]


def test_simhash_identical_and_disjoint(spark):
    a = " ".join(f"w{i}" for i in range(20))
    df = _docs(spark, [a, a])
    fps = [r["simhash"] for r in dedup.simhash_fingerprints(df).collect()]
    assert fps[0] == fps[1]
    pairs = dedup.simhash_pairs(df, max_hamming=0).collect()
    assert [(p["a_id"], p["b_id"], p["hamming"]) for p in pairs] == [(0, 1, 0)]


def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        ["vec_id", "embedding", "label"],
    )


def test_cosine_pairs_and_knn(spark):
    vecs = [[1, 0, 0], [0.9, 0.1, 0], [0, 1, 0], [0, 0, 1]]
    df = _embs(spark, vecs)
    pairs = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in dedup.embedding_cosine_pairs(df, threshold=0.9).collect()
    }
    assert set(pairs) == {(0, 1)}
    knn = similarity.knn_bruteforce(df, n_queries=1, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(knn, key=lambda r: r["rank"])] == [1, 2]


def test_ivf_recall_on_real_embeddings(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(embs, n_queries=3, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_ivf(embs, n_queries=3, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall collapsed: {recall}"


def test_pq_fused_training_matches_per_subspace(spark, sf_dir):
    """The fused one-pass-per-round PQ trainer must produce codebooks
    ELEMENT-EQUAL to training each subspace independently with
    _train_centroids on the sliced vectors (the reference recurrence
    the SQL oracle also runs) — the fusion is a scan-count
    optimization, never a semantic change."""
    from pyspark.sql import functions as F

    from rdfind_spark.functions.similarity import (
        PQ_DSUB,
        PQ_ITERS,
        PQ_KSUB,
        PQ_M,
        _pq_codebooks,
        _quantized,
        _train_centroids,
    )
    from rdfind_spark.util import materialize

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = materialize(embs.select("vec_id", _quantized("embedding").alias("q")))
    fused = _pq_codebooks(q)
    reference = [
        _train_centroids(
            q.select(
                "vec_id", F.slice("q", mm * PQ_DSUB + 1, PQ_DSUB).alias("q")
            ),
            PQ_KSUB,
            PQ_ITERS,
        )
        for mm in range(PQ_M)
    ]
    assert fused == reference


def test_ivf_pq_with_unbounded_rescore_equals_plain_ivf(spark, sf_dir):
    """With the rescore depth larger than any bucket, IVF-PQ rescores
    EVERY coarse candidate exactly — so its top-k must equal plain
    knn_ivf's (same seeded coarse probes, same exact cosine): the ADC
    stage only ever narrows, never re-ranks, the final result.  Pins
    that quantization error is confined to candidate selection."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in similarity.knn_ivf(embs, n_queries=3, k=5).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in similarity.knn_ivf_pq(
            embs, n_queries=3, k=5, rescore=10**6
        ).collect()
    }
    assert pq == ivf


def test_trained_ivf_pq_with_unbounded_rescore_equals_trained_ivf(spark, sf_dir):
    """The trained-coarse analogue of the seeded reduction pin: with
    unbounded rescore depth, knn_ivf_pq_trained exact-rescores every
    coarse candidate, so its top-k must equal knn_ivf_trained's (same
    integer-Lloyd coarse centroids, same integer-cosine probe argmax,
    same exact final cosine) — the two variants share the coarse stage
    exactly and PQ error is confined to candidate selection."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in similarity.knn_ivf_trained(embs, n_queries=3, k=5).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in similarity.knn_ivf_pq_trained(
            embs, n_queries=3, k=5, rescore=10**6
        ).collect()
    }
    assert pq == ivf


def test_trained_ivf_improves_assignment_cosine(spark, sf_dir):
    """The Lloyd rounds must improve (or preserve) the index quality
    metric they optimize — mean assignment cosine — over the seeded
    index, and the trained top-k must stay a sane ANN result."""
    from pyspark.sql import functions as F

    from rdfind_spark.functions.similarity import (
        _km_argmax,
        _quantized,
        _train_centroids,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = embs.select("vec_id", _quantized("embedding").alias("q"))
    q = q.localCheckpoint(eager=True)
    seeds = sorted(
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in q.filter(F.col("vec_id") < 8).collect()
    )
    trained = _train_centroids(q, k=8, iters=2)
    assert trained != seeds, "training was a no-op"

    def mean_cos(cents):
        return (
            _km_argmax(q, cents).agg(F.avg("cosine").alias("m")).first()["m"]
        )

    m_seed, m_train = mean_cos(seeds), mean_cos(trained)
    assert m_train >= m_seed - 1e-9, (m_seed, m_train)

    # trained top-k: exactly k ranked rows per query, reasonable recall
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(embs, n_queries=3, k=5).collect()
    }
    rows = similarity.knn_ivf_trained(embs, n_queries=3, k=5).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 6)) for v in per_q.values()), per_q
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(exact & approx) / len(exact) >= 0.4


def test_embedding_dedup_ivf_matches_brute_force(spark, sf_dir):
    """The bucketed default must reproduce the exact brute-force pair
    set on the real embeddings, and its plan must not cross-join the
    full table (only the 8-row broadcast centroid table)."""
    import contextlib
    import io

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    brute = {
        (r["a_id"], r["b_id"], r["cosine"])
        for r in dedup.embedding_cosine_pairs(embs).collect()
    }
    bucketed_df = similarity.embedding_dedup_pairs_ivf(embs)
    bucketed = {(r["a_id"], r["b_id"], r["cosine"]) for r in bucketed_df.collect()}
    assert brute, "fixture must produce near-dup pairs"
    assert bucketed == brute
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bucketed_df.explain(mode="simple")
    assert "CartesianProduct" not in buf.getvalue(), (
        "bucketed embedding dedup must not cartesian-join the table"
    )


def _events_df(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m),
                user_id=u,
                event_type=et,
                value=float(v),
                props="{}",
            )
            for i, (m, u, et, v) in enumerate(rows)
        ]
    )


def test_sessionize_gap_splits(spark):
    ev = _events_df(
        spark,
        [(0, 1, "view", 1), (10, 1, "click", 1), (60, 1, "view", 1), (65, 2, "view", 1)],
    )
    got = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in events.sessionize(ev, gap_min=30).collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_funnel_ordering_matters(spark):
    ev = _events_df(
        spark,
        [
            (0, 1, "view", 1),
            (5, 1, "click", 1),
            (10, 1, "purchase", 9),
            (0, 2, "click", 1),
            (5, 2, "view", 1),  # click before view: not funnel-ordered
            (0, 3, "view", 1),
        ],
    )
    row = events.event_funnel(ev).collect()[0]
    assert (row["n_viewed"], row["n_clicked_after_view"], row["n_purchased_after_click"]) == (3, 1, 1)


def test_hourly_counts(spark):
    ev = _events_df(spark, [(0, 1, "view", 2), (30, 1, "view", 3), (90, 2, "click", 5)])
    got = {
        (r["hour"].minute, r["event_type"]): (r["n_events"], r["value_sum"])
        for r in events.hourly_event_counts(ev).collect()
    }
    assert got[(0, "view")] == (2, 5.0)
    assert got[(0, "click")] == (1, 5.0)


def test_dedup_clusters_transitive(spark):
    """A near-dup chain A~B, B~C (A and C not directly similar) must
    land in ONE cluster labeled by the smallest doc_id."""
    from rdfind_spark.functions.dedup import dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, base),
        (2, base + " lambda"),
        (3, base + " lambda mu nu"),
        (10, "completely different words here nothing shared at all okay"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(df, threshold=0.5).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == 10


def test_clusters_chain_converges_logarithmically(spark):
    """Degenerate-corpus guard for the components loop: a 1,000-node
    duplicate CHAIN (diameter 999 — plain min-label propagation needs
    999 rounds and the old max_iters=20 would have returned a silently
    non-converged labeling) must collapse to ONE cluster labeled by the
    min id, in O(log diameter) rounds: the pointer-jumping reach
    recurrence r_k = 2*r_{k-1} + 2 covers 999 hops at round 9, plus
    one fixpoint-detection round = 10."""
    from rdfind_spark.functions.dedup import _min_label_components

    n = 1000
    e = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], ["a_id", "b_id"]
    )
    labels, rounds = _min_label_components(edges)
    assert rounds <= 10, rounds
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert len(got) == n
    assert set(got.values()) == {0}


def test_redact_text_patterns(spark):
    from rdfind_spark.functions.text import redact_text

    df = spark.createDataFrame(
        [(1, "mail me at a.b@ex.com or see https://x.io/p?q=1 id 12345678 now")],
        ["doc_id", "text"],
    )
    r = redact_text(df).collect()[0]
    assert "<EMAIL>" in r.clean_text and "<URL>" in r.clean_text and "<NUM>" in r.clean_text
    assert "a.b@ex.com" not in r.clean_text
    assert (r.n_emails, r.n_urls, r.n_longnums) == (1, 1, 1)


def test_asof_last_view_picks_latest_prior(spark):
    rows = [
        (0, 1, "view", 0),       # t=0
        (5, 1, "view", 0),       # t=5
        (5, 1, "purchase", 10),  # same-instant view counts (<=)
        (7, 1, "purchase", 10),  # latest prior view is t=5
        (3, 2, "purchase", 10),  # user 2 has no view
    ]
    df = _events_df(spark, rows)
    got = {
        (r.event_id, r.last_view_ts and r.last_view_ts.minute)
        for r in events.asof_last_view(df).collect()
    }
    assert got == {(2, 5), (3, 5), (4, None)}


def test_range_join_counts_boundaries(spark):
    # window = 600 s: (e_ts - 600, e_ts], exclusive lower bound
    rows = [
        (0, 1, "click", 0),    # exactly 600 s before error -> excluded
        (5, 1, "click", 0),    # inside
        (10, 1, "click", 0),   # same instant -> included
        (10, 1, "error", 0),
        (20, 2, "error", 0),   # no clicks
    ]
    df = _events_df(spark, rows)
    got = {(r.event_id, r.n_clicks) for r in events.range_join_counts(df).collect()}
    assert got == {(3, 2), (4, 0)}


# ----------------------------------------------------- curation ops


def test_train_split_deterministic_and_ratioed(spark, sf_dir):
    from rdfind_spark.functions.sampling import train_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {(r.doc_id, r.split) for r in train_split(docs).collect()}
    b = {(r.doc_id, r.split) for r in train_split(docs).collect()}
    assert a == b and len(a) == docs.count()
    frac = {
        s: n / len(a)
        for s, n in __import__("collections").Counter(s for _, s in a).items()
    }
    # md5-derived byte boundaries: 205/25/26 out of 256 (±8% abs at n=500)
    assert abs(frac["train"] - 205 / 256) < 0.08
    assert abs(frac.get("val", 0) - 25 / 256) < 0.08
    assert abs(frac.get("test", 0) - 26 / 256) < 0.08


def test_stratified_sample_matches_naive_window(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rdfind_spark.functions.sampling import SAMPLE_K, stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.doc_id, r.source, r.sample_rank)
        for r in stratified_sample(docs).collect()
    }
    h = F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    naive = (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= SAMPLE_K)
    )
    expected = {
        (r.doc_id, r.source, r.sample_rank) for r in naive.collect()
    }
    assert got == expected and got


def test_contamination_check_fixture(spark):
    from rdfind_spark.functions.sampling import contamination_check

    shared = "alpha beta gamma delta epsilon"  # exactly one 5-shingle
    docs = spark.createDataFrame(
        [
            # doc 0 (eval: 0 % 50 == 0): 2 distinct shingles, one shared
            (0, f"{shared} zeta"),
            # doc 1 (corpus) carries the shared shingle
            (1, f"{shared} other words here"),
            # doc 50 (eval): short doc, whole-text fallback, no overlap
            (50, "tiny doc"),
            # doc 2 (corpus), unrelated
            (2, "completely different content entirely unrelated text"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated)
        for r in contamination_check(docs).collect()
    }
    assert got == {0: (2, 1), 50: (1, 0)}


def test_export_train_corpus_composition(spark, sf_dir):
    """Export rows must be exactly: quality-gated ∩ train-split ∩
    exact-dedup-canonical (cross-checked against the standalone ops)."""
    from pyspark.sql import functions as F

    from rdfind_spark.functions import sampling
    from rdfind_spark.functions.dedup import exact_dedup_map
    from rdfind_spark.functions.text import token_stats, quality_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r.doc_id for r in sampling.export_train_corpus(docs).collect()}
    train = {
        r.doc_id
        for r in sampling.train_split(docs).filter("split = 'train'").collect()
    }
    canon = {
        r.doc_id
        for r in exact_dedup_map(docs)
        .filter("doc_id = canonical_id")
        .collect()
    }
    stats = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    qual = {
        r.doc_id: (r.distinct_ratio, r.punct_ratio)
        for r in quality_scores(docs).collect()
    }
    expected = {
        d
        for d in train & canon
        if stats[d] >= sampling.EXPORT_MIN_TOKENS
        and qual[d][0] >= sampling.EXPORT_MIN_DISTINCT_RATIO
        and qual[d][1] <= sampling.EXPORT_MAX_PUNCT_RATIO
    }
    assert got == expected and got


def test_curation_ops_partitioning_invariant(spark):
    """Hypothesis property: split assignment, sample membership, and
    contamination counts are pure functions of content — invariant
    under row order and partition count (the property RNG-based
    sampling loses, and the one that makes backfills reproducible)."""
    from hypothesis import given, settings, strategies as st

    from rdfind_spark.functions import sampling

    words = st.sampled_from(
        "alpha beta gamma delta epsilon zeta eta theta".split()
    )

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 300), st.lists(words, min_size=1, max_size=12)),
            min_size=4,
            max_size=30,
            unique_by=lambda t: t[0],
        ),
        st.randoms(),
    )
    def check(rows, rng):
        data = [
            (doc_id, " ".join(toks), f"src{doc_id % 3}")
            for doc_id, toks in rows
        ]
        shuffled = data[:]
        rng.shuffle(shuffled)
        a = spark.createDataFrame(data, "doc_id LONG, text STRING, source STRING")
        b = spark.createDataFrame(
            shuffled, "doc_id LONG, text STRING, source STRING"
        ).repartition(7)
        for op in (
            sampling.train_split,
            lambda d: sampling.stratified_sample(d, k=3),
            sampling.contamination_check,
        ):
            ra = {tuple(r) for r in op(a).collect()}
            rb = {tuple(r) for r in op(b).collect()}
            assert ra == rb

    check()


def test_pack_sequences_matches_naive_prefix_sum(spark, sf_dir):
    """The hierarchical (bucketed) prefix sum must equal the naive
    single-window cumsum exactly, and per-source start offsets must
    tile [0, total_tokens) with no gaps or overlaps."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rdfind_spark.functions.sampling import SEQ_LEN, pack_sequences
    from rdfind_spark.functions.text import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.doc_id, r.source, r.n_tokens, r.start_offset, r.seq_id)
        for r in pack_sequences(docs).collect()
    }
    h = F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        docs.select(
            "doc_id",
            "source",
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
            h.alias("h"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
            F.expr(f"(cum - n_tokens) div {SEQ_LEN}").alias("seq_id"),
        )
    )
    expected = {
        (r.doc_id, r.source, r.n_tokens, r.start_offset, r.seq_id)
        for r in naive.collect()
    }
    assert got == expected and got
    # tiling: per source, sorted starts == cumulative token sums
    by_src: dict = {}
    for _, src, n, start, _ in got:
        by_src.setdefault(src, []).append((start, n))
    for src, rows in by_src.items():
        rows.sort()
        pos = 0
        for start, n in rows:
            assert start == pos, f"gap/overlap at {src}:{start} != {pos}"
            pos += n


def test_repetition_stats_hand_checked(spark):
    # doc 0: "x y x y x y" -> bigrams [xy yx xy yx xy]: top "x y" 3 of 5
    #   -> 600000 ppm; trigrams [xyx yxy xyx yxy]: all 4 repeated
    #   -> 1000000 ppm -> discard
    # doc 1: all-distinct tokens -> top bigram 1/4, no repeated trigram
    df = _docs(spark, ["x y x y x y", "a b c d e"])
    rows = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
    assert rows[0]["n_tokens"] == 6
    assert rows[0]["top2gram_ppm"] == 600_000
    assert rows[0]["dup3gram_ppm"] == 1_000_000
    assert rows[0]["keep"] is False
    assert rows[1]["top2gram_ppm"] == 250_000
    assert rows[1]["dup3gram_ppm"] == 0
    assert rows[1]["keep"] is False  # top bigram 25% > the 10% bar
    # doc with fewer than 2 tokens: both ppm 0, kept
    one = _docs(spark, ["solo"])
    r = text.repetition_stats(one).collect()[0]
    assert (r["top2gram_ppm"], r["dup3gram_ppm"], r["keep"]) == (0, 0, True)


def test_event_transitions_census(spark):
    # user 1: view -> click -> view ; user 2: view -> view
    ev = _events_df(
        spark,
        [(0, 1, "view", 1), (1, 1, "click", 1), (2, 1, "view", 1), (0, 2, "view", 1), (5, 2, "view", 1)],
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob_ppm"])
        for r in events.event_transitions(ev).collect()
    }
    # from "view": 2 transitions (view->click, view->view); from "click": 1
    assert got[("view", "click")] == (1, 500000)
    assert got[("view", "view")] == (1, 500000)
    assert got[("click", "view")] == (1, 1000000)
    assert len(got) == 3


def test_event_transitions_ppm_truncates(spark):
    # 3 transitions out of "a": 1/3 must truncate to 333333, not round
    ev = _events_df(
        spark,
        [(0, 1, "a", 1), (1, 1, "b", 1), (0, 2, "a", 1), (1, 2, "c", 1), (0, 3, "a", 1), (1, 3, "d", 1)],
    )
    rows = events.event_transitions(ev).collect()
    assert sorted(r["prob_ppm"] for r in rows) == [333333, 333333, 333333]


def test_dsir_weights_fixed_point_hand_check(spark):
    """Tiny corpus where the staged integer arithmetic is computable by
    hand: tokens aa (target-heavy) and bb (raw-only).
    vocab: aa ct_r=2 ct_t=2; bb ct_r=1 ct_t=0; N_r=3 N_t=2 V=2.
    ratio(aa) = (3*1e9 div 4) * 5 div 3 = 1_250_000_000
    ratio(bb) = (1*1e9 div 4) * 5 div 2 =   625_000_000
    """
    from rdfind_spark.functions.sampling import dsir_weights

    docs = spark.createDataFrame(
        [(0, "aa aa", "en", "s", 5), (1, "bb", "de", "s", 2)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = {r["doc_id"]: r for r in dsir_weights(docs).collect()}
    assert rows[0]["n_tokens"] == 2
    assert rows[0]["dsir_score"] == 2 * 1_250_000_000
    assert rows[1]["n_tokens"] == 1
    assert rows[1]["dsir_score"] == 625_000_000
    # target-domain doc outranks the non-target doc
    assert rows[0]["dsir_score"] > rows[1]["dsir_score"]


def test_hard_negatives_labels_differ_and_rank_contiguous(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = similarity.knn_hard_negatives(embs, n_queries=3, k=5).collect()
    assert rows, "no hard negatives mined"
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["query_label"] != r["neighbor_label"]
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_rp_reduce_unit_vector_reads_out_the_sign_matrix(spark):
    # e_k scaled: y_j = sign(j, k) * RP_SCALE exactly; zero vector -> 0
    k_hot = 7
    e = [0.0] * similarity.RP_IN_DIM
    e[k_hot] = 1.0
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=e, label=0),
         Row(vec_id=2, embedding=[0.0] * similarity.RP_IN_DIM, label=0)]
    )
    rows = similarity.rp_reduce(df).collect()
    got = {(r.vec_id, r.rp_dim): r.rp_value for r in rows}
    assert len(got) == 2 * similarity.RP_OUT_DIM
    # a malformed (short) vector is excluded, not NULL-poisoned
    bad = spark.createDataFrame([Row(vec_id=3, embedding=[1.0, 2.0], label=0)])
    assert similarity.rp_reduce(bad).count() == 0
    for j in range(similarity.RP_OUT_DIM):
        assert got[(1, j)] == similarity._rp_sign(j, k_hot) * similarity.RP_SCALE
        assert got[(2, j)] == 0


def test_contamination_fuzzy_reports_cross_set_pairs_only(spark):
    # doc 0 (eval: 0 % 10 == 0) == doc 3 (train) verbatim -> reported
    # with jaccard 1.0 (identical signatures share every LSH band, so
    # the candidate is guaranteed, not recall-lucky).  docs 4 == 5 are
    # a WITHIN-train duplicate pair and docs 0 == 10 a within-EVAL pair:
    # neither may appear.  doc 1 is unrelated.
    leaked = "alpha beta gamma delta epsilon zeta"
    train_dup = "one two three four five six seven"
    texts = {
        0: leaked,
        1: "totally different words here entirely",
        3: leaked,
        4: train_dup,
        5: train_dup,
        10: leaked,
    }
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in texts.items()],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = dedup.contamination_fuzzy(df).collect()
    assert sorted((r.eval_id, r.train_id, r.jaccard) for r in rows) == [
        (0, 3, 1.0),
        (10, 3, 1.0),
    ]


def test_trained_variants_invariant_to_malformed_rows(spark, sf_dir):
    """Every kmeans-derived operator trains on _valid_quantized (round-6
    advisor): a malformed embedding row (wrong length) must not perturb
    — or crash — knn_ivf_trained / embedding_kmeans / knn_ivf_pq_trained.
    Before the shared filter, knn_ivf_trained's Lloyd aggregate indexed
    positions 1..dim and died with ArrayIndexOutOfBounds on such a row
    (measured), so the shared-coarse-stage reduction held only on
    well-formed data."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bad = spark.createDataFrame(
        [(99_990, [0.5] * 7, 0)], "vec_id long, embedding array<float>, label int"
    )
    mixed = embs.unionByName(bad)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for fn in (
        lambda e: similarity.knn_ivf_trained(e, n_queries=3, k=5),
        lambda e: similarity.embedding_kmeans(e),
        lambda e: similarity.knn_ivf_pq_trained(e, n_queries=3, k=5),
    ):
        assert rows(fn(embs)) == rows(fn(mixed))


def test_dup_ngram_fraction_exact_ppm(spark):
    # doc0/doc1 share their full shingle set; doc2 is unique; doc3
    # half-overlaps doc0
    df = _docs(
        spark,
        [
            "alpha beta gamma delta",      # shingles: a b g / b g d
            "alpha beta gamma delta",      # identical: both dup
            "zeta eta theta iota",         # unique: zero dup
            "alpha beta gamma nine",       # 'alpha beta gamma' dup, other not
        ],
    )
    out = {r.doc_id: r for r in dedup.dup_ngram_fraction(df).collect()}
    assert out[0].n_shingles == 2 and out[0].dup_ngram_ppm == 1_000_000
    assert out[1].dup_ngram_ppm == 1_000_000
    assert out[2].dup_ngram_ppm == 0 and out[2].keep == 1
    assert out[3].n_shingles == 2 and out[3].dup_ngram_ppm == 500_000
    # keep bit: threshold is on the ppm value
    assert out[0].keep == (1 if 1_000_000 <= dedup.DUP_NGRAM_MAX_PPM else 0)


def test_spread_seeds_farthest_point_property(spark):
    """Deterministic k-center greedy: start at min vec_id, then each
    pick maximizes the exact integer squared distance to its nearest
    chosen seed (ties by smaller vec_id)."""
    from pyspark.sql import functions as F

    from rdfind_spark.functions.similarity import (
        _quantized,
        _train_centroids,
        spread_seeds,
    )

    embs = spark.createDataFrame(
        [
            (0, [0.0, 0.1]),
            (1, [0.0, 0.2]),
            (2, [10.0, 0.0]),
            (3, [-20.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = embs.select("vec_id", _quantized("embedding").alias("q"))
    # greedy: 0 (min id) -> 3 (farthest from 0) -> 2 (max min-distance)
    seeds = spread_seeds(q, 3)
    assert [vid for vid, _ in seeds] == [0, 2, 3]
    # sample_mod restricts candidates to the hash-sample
    assert [vid for vid, _ in spread_seeds(q, 2, sample_mod=2)] == [0, 2]
    # seeds slot into the Lloyd loop unchanged (k clusters, exact ints)
    cents = _train_centroids(q, 3, 1, seeds=seeds)
    assert len(cents) == 3
    assert all(isinstance(v, int) for _, vec in cents for v in vec)


def test_dup_span_census_maximal_spans_any_alignment(spark):
    # doc0 and doc1 share a 12-token run at DIFFERENT offsets (C4-style
    # fixed chunks would miss the alignment); doc2 is clean; doc3
    # carries the run twice -> two separate maximal regions
    run = " ".join(f"r{i}" for i in range(12))
    d0 = " ".join(f"a{i}" for i in range(5)) + " " + run + " " + " ".join(
        f"b{i}" for i in range(5)
    )
    d1 = run + " " + " ".join(f"c{i}" for i in range(10))
    d2 = " ".join(f"z{i}" for i in range(20))
    d3 = run + " " + " ".join(f"m{i}" for i in range(11)) + " " + run
    df = _docs(spark, [d0, d1, d2, d3])
    rows = {r.doc_id: r for r in dedup.dup_span_census(df).collect()}
    # dup 10-grams of the shared run start at 3 consecutive positions;
    # their intervals merge into ONE maximal span of exactly 12 tokens
    assert (rows[0].n_dup_spans, rows[0].dup_tokens) == (1, 12)
    assert (rows[1].n_dup_spans, rows[1].dup_tokens) == (1, 12)
    assert (rows[2].n_dup_spans, rows[2].dup_tokens) == (0, 0)
    assert (rows[3].n_dup_spans, rows[3].dup_tokens) == (2, 24)
    assert rows[0].dup_fraction_ppm == 12 * 1_000_000 // rows[0].n_tokens


def test_cos2_ppm_wide_arithmetic(spark):
    """The cos^2-ppm cross-multiplication must be exact past the int64
    cliff (dot > ~3.03e6 overflows dot*dot*1e6 in BIGINT — ANSI Spark
    raises, DuckDB raises, pre-ANSI Spark silently wraps): the widened
    DECIMAL(38)/HUGEINT forms must agree with exact Python integers,
    engine-for-engine."""
    import duckdb

    from rdfind_spark.functions.dedup import _cos2_ppm_expr, _cos2_ppm_sql

    cases = [
        (4_000_000, 17_000_000_000_000, 16_500_000_000_000),  # overflow regime
        (4_000_000, 16_000_000_000_000, 16_000_000_000_000),  # cos = 1 there
        (1_200, 1_500_000, 1_800_000),
        (7_000_000, 49_000_000_000_000, 1_000_001),
        (3_030_000, 9_180_900_000_000, 1_000_000),  # right at the old cliff
    ]
    expect = [(d * d * 1_000_000) // (a * b) for d, a, b in cases]

    vals = ", ".join(f"({d}L, {a}L, {b}L)" for d, a, b in cases)
    got_spark = [
        r[0]
        for r in spark.sql(
            f"SELECT {_cos2_ppm_expr('dot', 'a_n2', 'b_n2')} "
            f"FROM VALUES {vals} AS t(dot, a_n2, b_n2)"
        ).collect()
    ]
    assert got_spark == expect

    vals2 = ", ".join(
        f"({d}::BIGINT, {a}::BIGINT, {b}::BIGINT)" for d, a, b in cases
    )
    got_duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {_cos2_ppm_sql('dot', 'a_n2', 'b_n2')} "
            f"FROM (VALUES {vals2}) t(dot, a_n2, b_n2)"
        ).fetchall()
    ]
    assert got_duck == expect


def test_shingle_cosine_survives_high_tf_dot(spark):
    """End-to-end overflow pin: two documents of ONE token repeated
    2002 times share a single cold shingle with tf=2000 each, so
    dot = 4e6 — past the old int64 cliff where the narrow form raised
    (ANSI) or wrapped (non-ANSI).  Identical documents must score
    exactly cos^2 = 1e6 ppm."""
    tok = " ".join(["w"] * 2002)  # 2000 3-gram shingles, all identical
    df = _docs(spark, [tok, tok])
    rows = dedup.shingle_cosine_pairs(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a_id, r.b_id) == (0, 1)
    assert r.dot == 2000 * 2000
    assert r.cos2_ppm == 1_000_000


def test_jaccard_prefix_equals_base_and_prunes(spark):
    """The prefix-filtered Jaccard join must return EXACTLY the base
    inverted-index result (pair-for-pair, score-for-score) while
    generating strictly fewer candidate pairs — the prefix principle's
    whole point.  Fixture: near-dup pairs above/below the threshold
    plus disjoint noise docs."""
    base_text = " ".join(f"t{i}" for i in range(40))
    near = " ".join(f"t{i}" for i in range(36)) + " x1 x2 x3 x4"
    far = " ".join(f"t{i}" for i in range(12)) + " " + " ".join(
        f"y{i}" for i in range(28)
    )
    # every noise doc ends with the same 3 tokens: the shared shingle
    # "z1 z2 z3" has df=6 so it sorts LAST in the rarest-first canonical
    # order — outside every prefix — and the 15 cross-noise candidate
    # pairs the full inverted-index join generates must all be pruned
    noise = [
        " ".join(f"n{j}_{i}" for i in range(30)) + " z1 z2 z3"
        for j in range(6)
    ]
    df = _docs(spark, [base_text, near, far] + noise)

    got = sorted(map(tuple, dedup.jaccard_pairs_prefix(df).collect()))
    want = sorted(map(tuple, dedup.ngram_jaccard_pairs(df).collect()))
    assert got == want
    assert (0, 1) in {(a, b) for a, b, _ in got}

    sh = dedup._shingles(df, dedup.NGRAM_K)
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    cold = sh  # no shingle is hot in this fixture
    full = (
        cold.select("shingle", F.col("doc_id").alias("a_id"))
        .join(cold.select("shingle", F.col("doc_id").alias("b_id")), on="shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .count()
    )
    pruned = dedup._prefix_candidates(
        cold, dfc, dedup.JACCARD_THRESHOLD
    ).count()
    assert pruned < full, (pruned, full)


def test_multiprobe_lsh_recovers_boundary_neighbors(spark, sf_dir):
    """Multi-probe candidates are a strict superset of single-probe
    candidates (the original bucket is probe 0), and on the real
    embeddings the extra Hamming-1 probes must recover neighbors the
    single-probe index misses (recall@k strictly improves vs brute
    force)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_bruteforce(emb).collect()
    }
    single = {
        (r.query_id, r.neighbor_id) for r in similarity.knn_lsh(emb).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_lsh_multiprobe(emb).collect()
    }
    r_single = len(single & bf) / len(bf)
    r_multi = len(multi & bf) / len(bf)
    assert r_multi > r_single, (r_single, r_multi)
    assert r_multi >= 0.8, r_multi


def test_dedup_funnel_counts_with_real_duplicates(spark):
    """Funnel arithmetic on a corpus with BOTH duplicate kinds: two
    exact copies (whitespace/case variants normalize together), one
    near-dup of the same family, and two clean docs.  Stage 1 removes
    the exact copy; stage 2 removes the near-dup; the clean docs
    survive both."""
    base = " ".join(f"w{i}" for i in range(40))
    near = base + " tail"
    df = _docs(
        spark,
        [base, "  " + base.upper() + "  ", near,
         " ".join(f"x{i}" for i in range(40)),
         " ".join(f"y{i}" for i in range(40))],
    )
    rows = {r.stage: r for r in dedup.dedup_funnel(df, threshold=0.5).collect()}
    assert (rows[1].docs_in, rows[1].docs_kept, rows[1].docs_removed) == (5, 4, 1)
    assert (rows[2].docs_in, rows[2].docs_kept, rows[2].docs_removed) == (4, 3, 1)


def test_containment_pairs_asymmetric_and_complete(spark):
    """Containment catches the quote/subset case Jaccard misses: a
    short doc inside a long one scores C(short->long) = 1.0 while the
    reverse direction and the Jaccard score stay low.  Also a
    brute-force completeness pin of the probe-side prefix cut: the
    prefix-filtered result equals the unfiltered inverted-index model
    on a fixture whose noise docs share a common (frequent) tail
    shingle that must sort out of every prefix."""
    short = " ".join(f"q{i}" for i in range(10))
    long_doc = short + " " + " ".join(f"w{i}" for i in range(40))
    noise = [
        " ".join(f"m{j}_{i}" for i in range(25)) + " z1 z2 z3"
        for j in range(5)
    ]
    df = _docs(spark, [short, long_doc] + noise)
    got = {
        (r.src_id, r.dst_id): r.containment_ppm
        for r in dedup.containment_pairs(df).collect()
    }
    # short (8 shingles, all inside long) -> containment exactly 1e6
    assert got[(0, 1)] == 1_000_000
    # reverse direction: 8/48 = 166666 ppm < threshold -> absent
    assert (1, 0) not in got
    # Jaccard on the same pair is 8/48 < 0.18: the symmetric paths
    # never report it
    jac = {(r.a_id, r.b_id) for r in dedup.ngram_jaccard_pairs(df).collect()}
    assert (0, 1) not in jac
    # completeness vs the unfiltered model at threshold 0 is the whole
    # candidate universe — compare at the real threshold instead
    sh = dedup._shingles(df, dedup.NGRAM_K)
    sizes = {r.doc_id: r.n_sh for r in
             sh.groupBy("doc_id").agg(F.count("*").alias("n_sh")).collect()}
    shingle_sets = {}
    for r in sh.collect():
        shingle_sets.setdefault(r.doc_id, set()).add(r.shingle)
    want = {}
    for s, ss in shingle_sets.items():
        for d, ds in shingle_sets.items():
            if s == d:
                continue
            ppm = len(ss & ds) * 1_000_000 // sizes[s]
            if ppm >= dedup.CONTAINMENT_THRESHOLD_PPM:
                want[(s, d)] = ppm
    assert got == want


def test_feature_hashing_matches_python_model(spark):
    """Hand-model pin of the signed hashing trick: feature ids, signs,
    accumulation, and the zero-weight drop all match a pure-Python md5
    model; repeated tokens accumulate tf-with-sign; the space is
    dim-bounded."""
    import hashlib

    from rdfind_spark.functions.text import FEATURE_HASH_DIM, feature_hashing

    texts = ["Alpha beta beta GAMMA", "alpha alpha", ""]
    df = _docs(spark, texts)
    got = {
        (r.doc_id, r.feature_id): r.weight
        for r in feature_hashing(df).collect()
    }

    def model(text):
        import re

        out = {}
        # regex split, not str.split(): an empty text yields the ['']
        # token in BOTH engines (the corpus-wide tokenizer convention
        # the oracle board pins), and the model must reproduce it
        for t in re.split(r"\s+", text.lower().strip()):
            h = hashlib.md5(t.encode()).hexdigest()
            fid = int(h[:8], 16) % FEATURE_HASH_DIM
            out[fid] = out.get(fid, 0) + (1 if h[8] in "01234567" else -1)
        return {k: v for k, v in out.items() if v != 0}

    want = {
        (i, fid): w
        for i, t in enumerate(texts)
        for fid, w in model(t).items()
    }
    assert got == want
    assert all(0 <= fid < FEATURE_HASH_DIM for _, fid in got)
    # doc 1: "alpha alpha" accumulates tf 2 on one feature
    assert sorted(abs(w) for (d, _), w in got.items() if d == 1) == [2]
