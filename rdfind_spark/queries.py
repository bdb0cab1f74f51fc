"""The query registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DF``
with the equivalent DuckDB SQL (generated from the same specs, see
``rdfind_spark.oracle``).  Names map to SURVEY.md §2 operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfind_spark import oracle
from rdfind_spark.functions import (
    corpus_stats,
    dedup,
    events,
    graph,
    multimodal,
    sampling,
    similarity,
    text,
    warehouse,
)
from rdfind_spark.operators import census, rules, transforms
from rdfind_spark.operators.captures import capture_candidates
from rdfind_spark.operators.cind import (
    capture_overlaps,
    discover_cinds,
    distinct_captures,
)
from rdfind_spark.sources.triples import triple_view

MIN_SUPPORT = 10

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(
    name: str, sql: str | None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _dcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_captures(capture_candidates(triple_view(spark, sf_dir)))


# ----------------------------------------------------------- CIND core


@register("cind_minimal", oracle.cind_sql(MIN_SUPPORT, minimal=True))
def cind_minimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: pertinent minimal CINDs (SURVEY §3.3; G1+A5+J6)."""
    return discover_cinds(triple_view(spark, sf_dir), MIN_SUPPORT, minimal=True)


@register("cind_all", oracle.cind_sql(MIN_SUPPORT, minimal=False))
def cind_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pertinent CINDs incl. non-minimal (AllAtOnce semantics)."""
    return discover_cinds(triple_view(spark, sf_dir), MIN_SUPPORT, minimal=False)


@register("cind_minimal_ar", oracle.cind_sql(MIN_SUPPORT, minimal=True, ar=True))
def cind_minimal_ar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal CINDs with the G17 association-rule filter applied
    before minimality (reference ``--use-ar`` path)."""
    return discover_cinds(
        triple_view(spark, sf_dir), MIN_SUPPORT, minimal=True, ar_filter=True
    )


@register("cind_small_to_large", oracle.cind_sql(MIN_SUPPORT, minimal=True))
def cind_small_to_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged SmallToLarge traversal (the reference's default strategy);
    same oracle as cind_minimal — the driver's check doubles as the
    cross-strategy agreement test (SURVEY §5)."""
    from rdfind_spark.operators.staged import discover_cinds_staged

    return discover_cinds_staged(triple_view(spark, sf_dir), MIN_SUPPORT)


@register("cind_approx_verify", oracle.cind_sql(MIN_SUPPORT, minimal=True))
def cind_approx_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-then-verify traversal (reference strategy 2,
    ``plan/ApproximateAllAtOnceTraversalStrategy.scala``, re-expressed
    with Spark-native Bloom bitmask sketches): exact result, so it
    shares cind_minimal's oracle — the driver's check doubles as the
    strategy-agreement test."""
    return discover_cinds(
        triple_view(spark, sf_dir), MIN_SUPPORT, minimal=True, sketch_filter=True
    )


def _zipf_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdfind_spark.sources.skew import zipf_triples

    return zipf_triples(spark, sf_dir)


def _zipf_triples_sql() -> str:
    from rdfind_spark.sources.skew import zipf_triples_sql

    return zipf_triples_sql()


@register(
    "cind_zipf_skew",
    oracle.cind_sql(MIN_SUPPORT, minimal=True, triples_sql=_zipf_triples_sql()),
)
def cind_zipf_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-CIND discovery under real hub-value skew (round-11
    registration; round-10 verdict task 3a): the deterministic
    DBpedia-shaped fixture derived arithmetically from ``orders``
    (``sources/skew.py``) has 43 join lines of ~760-1250 frequent
    captures at sf0.01 — past HOT_LINE_K=512 — plus 240 celebrity
    subjects living in 12+ hot lines, so the hot-mask decomposition
    AND its deep-capture part-2 salted path (``cind.py:209``, the
    engine's replacement for the reference's join-line rebalancing,
    ``operators/AssignJoinLineRebalancing.scala:15-65``) both run at
    their real thresholds inside a driver-checked three-check query,
    not just a probe."""
    return discover_cinds(_zipf_triples(spark, sf_dir), MIN_SUPPORT, minimal=True)


@register(
    "cind_minimal_proj_s",
    oracle.cind_sql(MIN_SUPPORT, minimal=True, projection="s"),
)
def cind_minimal_proj_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal CINDs restricted to subject-projected captures
    (reference ``--projection``, ``programs/RDFind.scala:701-702``)."""
    return discover_cinds(
        triple_view(spark, sf_dir), MIN_SUPPORT, minimal=True, projection="s"
    )


@register("capture_supports", oracle.capture_supports_sql(MIN_SUPPORT))
def capture_supports_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-capture support counts (A10), as one lazy hashed-key
    plan (the string-keyed distinct this used before kept the long URI
    strings through the wide shuffle and measured >10s slower at sf0.1;
    the eager persisted prefix shared with the CIND engines measured
    ~25s here because nothing reuses its caches — see
    ``frequent_capture_supports``)."""
    from rdfind_spark.operators.cind import frequent_capture_supports

    return frequent_capture_supports(triple_view(spark, sf_dir), MIN_SUPPORT)


@register("capture_overlaps", oracle.capture_overlaps_sql(MIN_SUPPORT))
def capture_overlaps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise overlap counts of frequent captures (G2/A6), on the
    same hashed persisted prefix as the CIND engines (the string-keyed
    distinct this used before measured ~20s slower at sf0.1)."""
    from rdfind_spark.operators.cind import build_capture_tables

    # defer_frequent: the string-recovery scan overlaps the eager
    # hot-line census inside capture_overlaps
    _, _, _, frequent, capf = build_capture_tables(
        triple_view(spark, sf_dir), MIN_SUPPORT, defer_frequent=True
    )
    return capture_overlaps(capf, frequent, min_overlap=MIN_SUPPORT)


# ------------------------------------------------------------- census


@register("condition_counts_frequent", oracle.condition_counts_sql(MIN_SUPPORT))
def condition_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent unary+binary condition counts (A1+A2)."""
    return census.condition_counts(triple_view(spark, sf_dir), MIN_SUPPORT)


@register("condition_histogram", oracle.condition_histogram_sql())
def condition_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per condition-type census (A14)."""
    return census.condition_histogram(triple_view(spark, sf_dir))


@register("count_distinct_values", oracle.count_distinct_values_sql())
def count_distinct_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-value census, entity vs literal (A15)."""
    return census.count_distinct_values(triple_view(spark, sf_dir))


@register("count_triples", oracle.count_triples_sql())
def count_triples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple + distinct-triple counts (A17/T4)."""
    return census.count_triples(triple_view(spark, sf_dir))


@register("join_line_histogram", oracle.join_line_histogram_sql())
def join_line_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-line size → frequency (A11)."""
    return census.join_line_histogram(_dcap(spark, sf_dir))


@register("association_rules", oracle.association_rules_sql(MIN_SUPPORT, 1.0))
def association_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence-1.0 association rules (J2/J3 + AR mining)."""
    return rules.association_rules(triple_view(spark, sf_dir), MIN_SUPPORT, 1.0)


@register("hash_collisions", oracle._with_triples(transforms.hash_collisions_sql()))
def hash_collisions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short-hash collision census (A16 CheckHashCollisions)."""
    return transforms.hash_collisions(triple_view(spark, sf_dir))


# ----------------------------------------- training-data pipeline: text


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_small_input: the testdata tables are single-row-group
    # parquet (one unsplittable scan task), and codegen fuses the
    # expensive tokenize/shingle/minhash derivation into the scan
    # stage — one core does it all without the spread (guide §2.5;
    # no-op on inputs that already scan wide).
    from rdfind_spark.util import spread_small_input

    return spread_small_input(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdfind_spark.util import spread_small_input

    return spread_small_input(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.parquet has shipped with two ts physical types: TIMESTAMP
    # with micro precision (read natively) and TIMESTAMP(NANOS), which
    # Spark's vectorized reader rejects — for the latter, read nanos as
    # long and truncate to microseconds (exactly what DuckDB's implicit
    # TIMESTAMP_NS → TIMESTAMP cast does, so the oracle sees identical
    # instants).  Dispatch on the actual file schema.
    from rdfind_spark.util import spread_small_input

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spread_small_input(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return events.normalize_event_ts(raw)


@register("text_token_stats", text.token_stats_sql())
def text_token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token census (whitespace + BPE-ish regex)."""
    return text.token_stats(_docs(spark, sf_dir))


@register("text_quality_scores", text.quality_scores_sql())
def text_quality_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals (stopword/punct/distinct ratios)."""
    return text.quality_scores(_docs(spark, sf_dir))


@register("text_lang_id", text.lang_id_sql())
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language identification."""
    return text.lang_id(_docs(spark, sf_dir))


@register("text_fingerprints", text.fingerprints_sql())
def text_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-shingle min-hash document fingerprints."""
    return text.fingerprints(_docs(spark, sf_dir))


# ---------------------------------------- training-data pipeline: dedup


@register("dedup_exact", dedup.exact_dedup_map_sql())
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup map: doc_id → canonical id by normalized-text md5."""
    return dedup.exact_dedup_map(_docs(spark, sf_dir))


@register("dedup_ngram_jaccard", dedup.ngram_jaccard_pairs_sql())
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact shingle Jaccard (inverted-index join)."""
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir))


@register("dedup_jaccard_prefix", dedup.ngram_jaccard_pairs_sql())
def dedup_jaccard_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard pairs via PREFIX-FILTERED candidates
    (SSJoin/PPJoin prefix principle): only each document's
    c - ceil(t*c) + 1 rarest shingles enter the self-join (52% fewer
    candidate pairs at sf0.001, measured), then one sorted-array
    intersection per candidate verifies exactly.  Result identical to
    dedup_ngram_jaccard, so it shares that query's oracle — the
    driver's check doubles as the strategy-agreement test, like
    cind_approx_verify vs cind_minimal."""
    return dedup.jaccard_pairs_prefix(_docs(spark, sf_dir))


@register("dedup_containment", dedup.containment_pairs_sql())
def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED shingle-containment pairs (Broder 1997 inclusion):
    C(src→dst) = |S_src ∩ S_dst| / |S_src| >= 0.5 in exact integer ppm
    — the asymmetric near-dup Jaccard misses (a short document wholly
    quoted inside a long one).  Spark side prefix-filters the PROBE
    side only (dst has no bound under containment); the oracle is the
    unfiltered inverted-index join, so the driver's check doubles as a
    completeness proof of the prefix cut."""
    return dedup.containment_pairs(_docs(spark, sf_dir))


@register("dedup_funnel", dedup.dedup_funnel_sql())
def dedup_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel a production dedup pipeline reports: per
    stage (exact md5, then MinHash+LSH components), documents
    in/kept/removed.  TRULY sequential: stage 2 runs on stage-1
    SURVIVORS, because a full-corpus shortcut is unsound here — exact
    dedup normalizes case/whitespace while shingles do not, so an
    exact-dup class need not sit inside one LSH component (refuted by
    the unit fixture; see dedup.dedup_funnel)."""
    return dedup.dedup_funnel(_docs(spark, sf_dir))


@register("dedup_minhash_estimate", dedup.minhash_estimate_eval_sql())
def dedup_minhash_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-calibration table: per exact-Jaccard qualifying pair,
    how many of the 12 MinHash components agree (E[matches/k] = true
    Jaccard, Broder 1997) plus the integer-ppm estimate — the
    engine's own measured evidence for the estimator its LSH banding
    thresholds assume, recomputed bit-for-bit by the oracle (md5
    permutations are deterministic)."""
    return dedup.minhash_estimate_eval(_docs(spark, sf_dir))


@register("docs_dup_spans", dedup.dup_span_census_sql())
def docs_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MAXIMAL duplicated-substring census (Lee et al.
    2022 exact-substring dedup, re-expressed relationally): a token
    position is duplicated when its L-gram occurs >= 2 times anywhere
    in the corpus; overlapping duplicated intervals merge into maximal
    spans via doc-partitioned windows.  Catches duplication at ANY
    alignment (unlike the C4-style fixed chunks of docs_span_dedup)
    and localizes it per document (unlike the corpus-level
    docs_dup_ngram_fraction).  All exact integers."""
    return dedup.dup_span_census(_docs(spark, sf_dir))


@register("dedup_shingle_cosine", dedup.shingle_cosine_pairs_sql())
def dedup_shingle_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by WEIGHTED sparse cosine over shingle count
    vectors — the tf-weighted counterpart of dedup_ngram_jaccard
    (repetition-heavy near-dups Jaccard under-scores surface here).
    Score is cos^2 in ppm via integer cross-multiplication (no sqrt,
    no floats — bit-stable, monotone in cosine); same inverted-index
    + hot-shingle-cap join shape."""
    return dedup.shingle_cosine_pairs(_docs(spark, sf_dir))


@register("dedup_minhash_lsh", dedup.minhash_lsh_pairs_sql())
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs verified by exact Jaccard."""
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir))


@register("dedup_simhash", dedup.simhash_pairs_sql())
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance."""
    return dedup.simhash_pairs(_docs(spark, sf_dir))


@register("docs_dup_ngram_fraction", dedup.dup_ngram_fraction_sql())
def docs_dup_ngram_fraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-n-gram fraction per document (exact
    integer ppm + Gopher-style keep bit) — the corpus-level repetition
    signal; docs_repetition_filter covers the within-document rules.
    One doc-frequency aggregate + linear join-back over the shared
    shingle table, never a self-join."""
    return dedup.dup_ngram_fraction(_docs(spark, sf_dir))


@register(
    "dedup_pair_triangles",
    graph.pair_triangles_sql(dedup.simhash_pairs_sql()),
)
def dedup_pair_triangles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the SimHash near-dup pair graph
    (the cohesion check run before trusting transitive clustering:
    true duplicate groups are cliques, chained false positives are
    triangle-poor).  Spark runs degree-ordered orientation — acyclic
    edges, out-degree O(sqrt(E)), each triangle counted at its unique
    two-out-edge corner — so the wedge join survives hub nodes that
    would send a naive adjacency self-join quadratic; the oracle runs
    the direct x<y<z 3-way join over the shared simhash-pair SQL.
    3,830 triangles over 1,234 pairs at sf0.01."""
    return graph.pair_triangles(dedup.simhash_pairs(_docs(spark, sf_dir)))


@register("dedup_clusters", dedup.dedup_clusters_sql())
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup connected components (canonical doc per cluster) over
    the MinHash+LSH pair graph; iterative min-label propagation vs the
    oracle's recursive-CTE transitive closure."""
    return dedup.dedup_clusters(_docs(spark, sf_dir))


@register("dedup_incremental", dedup.incremental_dedup_sql())
def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-run dedup: new docs admitted only if their
    hash is absent from the prior-corpus fingerprint set (left_anti on
    the hash — no pairwise work)."""
    return dedup.incremental_dedup(_docs(spark, sf_dir))


@register("text_redact", text.redact_text_sql())
def text_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction (emails/URLs/long digit runs) with audit
    counts."""
    return text.redact_text(_docs(spark, sf_dir))


@register("dedup_embedding_ivf", dedup.embedding_cosine_pairs_sql())
def dedup_embedding_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, bucketed (IVF multi-assignment pair
    generation + exact cosine rescore — no full-table crossJoin).  The
    oracle side IS the brute-force all-pairs SQL: the check verifies
    the bucketed plan reproduces the exact brute-force pair set
    (``dedup.embedding_cosine_pairs`` stays available as the in-engine
    correctness baseline but is no longer the registered default)."""
    return similarity.embedding_dedup_pairs_ivf(_embs(spark, sf_dir))


@register("dedup_embedding_ivf_neardup", similarity.neardup_pairs_sql())
def dedup_embedding_ivf_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs in the SCALABLE regime (threshold ≥0.8):
    centroid count grows with the data (n / VECTORS_PER_CENTROID), so
    Σ bucket² — the candidate-generation cost — stays linear in n
    instead of collapsing to all-pairs.  This is the headline plan a
    100 TB dedup pass runs; ``dedup_embedding_ivf`` (threshold 0.4,
    fixed small index) remains the low-threshold completeness stress
    test.  Runs over the corpus augmented with deterministic jittered
    twins (the seeded test dups top out at cosine ≈0.51, below any
    honest near-dup bar — see similarity.augmented_neardup_embeddings);
    oracle = brute-force all-pairs SQL over the same augmented corpus,
    so the check verifies the scaled bucketing reproduces the exact
    (non-empty, ≈n-row) pair set."""
    aug = similarity.augmented_neardup_embeddings(_embs(spark, sf_dir))
    return similarity.embedding_dedup_pairs_ivf(
        aug, threshold=similarity.NEARDUP_COSINE_THRESHOLD
    )


@register("text_tfidf_keywords", text.tfidf_keywords_sql())
def text_tfidf_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k keywords by TF-IDF (explode → tf, df aggs,
    broadcast idf join; ranks on rounded scores)."""
    return text.tfidf_keywords(_docs(spark, sf_dir))


@register("text_feature_hashing", text.feature_hashing_sql())
def text_feature_hashing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing-trick featurizer (Weinberger et al. 2009):
    sparse (doc_id, feature_id, weight) term-frequency vectors in a
    fixed 1024-dim hashed space — no vocabulary build, no dictionary
    broadcast, sign bit making collisions cancel in expectation.
    Exact integers end-to-end (md5 hex fold identical in both
    engines)."""
    return text.feature_hashing(_docs(spark, sf_dir))


@register("docs_quality_filter", text.quality_filter_sql())
def docs_quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style combined rule filter with per-rule audit
    reasons and the final keep bit."""
    return text.quality_filter(_docs(spark, sf_dir))


@register("docs_repetition_filter", text.repetition_stats_sql())
def docs_repetition_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition census: top word-bigram share + repeated
    trigram share per document (integer ppm) with the boilerplate keep
    bit — the repetition half of the Gopher rules the quality filter
    doesn't cover."""
    return text.repetition_stats(_docs(spark, sf_dir))


# ------------------------------------- corpus statistics / LM prep


@register("text_bigrams", corpus_stats.bigram_counts_sql())
def text_bigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k corpus bigram census (array-transform generation, one
    map-side-combined shuffle)."""
    return corpus_stats.bigram_counts(_docs(spark, sf_dir))


@register("text_skipgram_cooc", corpus_stats.skipgram_cooc_sql())
def text_skipgram_cooc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k skip-gram co-occurrence pairs within a ±3-token window
    (word2vec/GloVe co-occurrence prep; nested array transforms, one
    map-side-combined shuffle)."""
    return corpus_stats.skipgram_cooc(_docs(spark, sf_dir))


@register("text_bpe_vocab", corpus_stats.bpe_vocab_sql())
def text_bpe_vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-vocabulary training: 8 merge rounds over the
    distinct-word table (pair census + single-row argmax collect +
    narrow replace map per round); oracle = the identical recurrence
    as a chained CTE."""
    return corpus_stats.bpe_vocab(_docs(spark, sf_dir))


@register("text_bpe_encode", corpus_stats.bpe_encode_stats_sql())
def text_bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the other half of the tokenizer
    story (text_bpe_vocab trains; a pipeline then tokenizes every
    document to budget sequence lengths and bill tokens).  The training
    loop's final distinct-word symbolization IS the word→tokenization
    map, so application is one vocabulary join + per-doc aggregate: no
    per-document Python, no re-tokenization pass.  Exact-integer token
    / char counts and the chars-per-token compression diagnostic;
    oracle runs the identical chain (shared _bpe_chain_sql) plus the
    same join-aggregate."""
    return corpus_stats.bpe_encode_stats(_docs(spark, sf_dir))


@register("docs_lm_score", corpus_stats.lm_score_stats_sql())
def docs_lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one-smoothed bigram LM scoring per document —
    the integer-exact analogue of CCNet-style perplexity pruning
    (documents improbable under a corpus LM are boilerplate/garbled
    outliers).  Mean smoothed conditional bigram probability in ppm,
    all BIGINT (a float Σlog would drift across engines in addition
    order and libm ULPs; this rendering is bit-stable and
    order-preserving for ranking).  Scored at per-document bigram-TYPE
    cardinality (p_ppm is constant per (w1, w2)), with the global
    census derived from the same type table — see lm_score_stats."""
    return corpus_stats.lm_score_stats(_docs(spark, sf_dir))


@register("text_pmi_bigrams", corpus_stats.pmi_bigrams_sql())
def text_pmi_bigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k collocations by PMI (exact scaled-integer probability
    ratio — bit-identical across engines)."""
    return corpus_stats.pmi_bigrams(_docs(spark, sf_dir))


@register("docs_inverted_index", corpus_stats.inverted_index_sql())
def docs_inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token posting-list index with df/tf and a capped sorted posting
    head."""
    return corpus_stats.inverted_index(_docs(spark, sf_dir))


@register("text_token_length_hist", corpus_stats.token_length_histogram_sql())
def text_token_length_hist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token-length histogram (tokenizer sanity census)."""
    return corpus_stats.token_length_histogram(_docs(spark, sf_dir))


@register("docs_length_deciles", corpus_stats.length_deciles_sql())
def docs_length_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-decile assignment (curriculum prep; ntile
    with deterministic tie-break)."""
    return corpus_stats.length_deciles(_docs(spark, sf_dir))


@register("docs_vocab_coverage", corpus_stats.vocab_coverage_sql())
def docs_vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k vocabulary with exact cumulative corpus coverage (ppm) —
    the LM vocab-sizing census."""
    return corpus_stats.vocab_coverage(_docs(spark, sf_dir))


@register("docs_length_digest", corpus_stats.length_digest_eval_sql())
def docs_length_digest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest approximate median vs exact per language (the 100 TB
    percentile path, accuracy-gated)."""
    return corpus_stats.length_digest_eval(_docs(spark, sf_dir))


@register("docs_keyword_search", corpus_stats.keyword_search_sql())
def docs_keyword_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shaped keyword retrieval in exact integer fixed-point
    (Robertson & Walker 1994): saturated-tf x rarity with document-
    length normalization, the idf's libm logarithm replaced by the
    rational rarity ratio it would be fed (monotone in df, so ranking
    is preserved and both engines are bit-identical).  Top-k with a
    deterministic (score, doc_id) tie-break; the term filter runs
    INSIDE the explode so the shuffle carries query-term rows only."""
    return corpus_stats.keyword_search(_docs(spark, sf_dir))


@register("docs_hybrid_search", corpus_stats.hybrid_rrf_search_sql())
def docs_hybrid_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-free hybrid reranking (round-11 registration;
    round-10 verdict task 3b): reciprocal-rank fusion (Cormack et al.
    2009) of the BM25 keyword leg and the corpus-LM fluency leg,
    rrf = Σ 1e9 DIV (60 + rank), all-integer so both engines agree
    bit-for-bit.  Each leg ends in its own deterministic top-100
    (a top-k heap, not a global sort); the fusion windows + full-outer
    join run on those bounded lists only, so the rerank costs nothing
    at corpus scale.  Docs missing from a leg report rank -1."""
    return corpus_stats.hybrid_rrf_search(_docs(spark, sf_dir))


@register("docs_url_dedup", dedup.url_dedup_sql())
def docs_url_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup stage (round-11 registration;
    round-10 verdict task 3b): a deterministic messy synthetic crawl
    (four spellings per logical page — scheme case, WWW., default
    ports, utm_* tracking params, fragments, trailing slashes; the
    ?page=2 variant must NOT collapse) is canonicalized entirely in
    JVM regex and deduped by ONE hash shuffle on the canonical key,
    keeping the longest document per page.  The oracle reconstructs
    the expected canonical string arithmetically from doc_id — it
    never runs the canonicalizer — so any wrong regex in the chain
    (host-only lowercasing, separator repair, port/slash handling)
    breaks the value hash."""
    return dedup.url_dedup(_docs(spark, sf_dir))


@register("docs_cube_counts", corpus_stats.docs_cube_counts_sql())
def docs_cube_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang × source) census with CUBE subtotals in one grouping-sets
    pass."""
    return corpus_stats.docs_cube_counts(_docs(spark, sf_dir))


@register("docs_length_percentiles", corpus_stats.length_percentiles_sql())
def docs_length_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact length percentiles (p25/p50/p75 linear
    interpolation, bit-exact vs quantile_cont)."""
    return corpus_stats.length_percentiles(_docs(spark, sf_dir))


# ------------------------------------------- warehouse star joins


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register("warehouse_revenue_by_nation", warehouse.revenue_by_nation_sql())
def warehouse_revenue_by_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star join: revenue per (region, nation) in exact
    integer cents; dimensions broadcast, date filter pushed to scan."""
    return warehouse.revenue_by_nation(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@register("warehouse_pricing_summary", warehouse.pricing_summary_sql())
def warehouse_pricing_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary report (Q1 shape): scan → pushed filter → one
    groupBy on a 6-value key; exact integer quantities/cents."""
    return warehouse.pricing_summary(_t(spark, sf_dir, "lineitem"))


@register("warehouse_revenue_forecast", warehouse.revenue_forecast_sql())
def warehouse_revenue_forecast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band revenue scan (Q6 shape): every predicate pushed to
    the parquet scan, one global integer sum."""
    return warehouse.revenue_forecast(_t(spark, sf_dir, "lineitem"))


@register("warehouse_late_priority", warehouse.late_shipment_priority_sql())
def warehouse_late_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join with a cross-table predicate: order counts by
    priority among orders with a >90-days-late shipment."""
    return warehouse.late_shipment_priority(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@register("warehouse_top_unshipped", warehouse.top_unshipped_orders_sql())
def warehouse_top_unshipped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping-priority shape: top-10 revenue among one segment's
    unshipped orders (pushed date filters, TakeOrdered top-k, exact
    integer cents with full tie-break)."""
    return warehouse.top_unshipped_orders(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register("warehouse_local_supplier", warehouse.local_supplier_volume_sql())
def warehouse_local_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier-volume shape: six-table join chain with the
    same-nation predicate as an equi-join condition, broadcast dims."""
    return warehouse.local_supplier_volume(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@register("warehouse_min_cost_supplier", warehouse.min_cost_supplier_sql())
def warehouse_min_cost_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 min-cost-supplier shape: correlated per-part MIN expressed as
    a window-min over one fact aggregate; part filter semi-joins before
    the aggregate, decorations broadcast."""
    return warehouse.min_cost_supplier(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
    )


@register("warehouse_volume_shipping", warehouse.volume_shipping_sql())
def warehouse_volume_shipping_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume-shipping shape: nation dimension broadcast twice under
    different roles, two-nation disjunction, revenue by direction and
    ship year."""
    return warehouse.volume_shipping(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register("warehouse_market_share", warehouse.market_share_sql())
def warehouse_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 market-share shape: ratio of conditional aggregates per order
    year over a two-level dimension chain — type-filtered part keys
    broadcast into the fact scan, region→nation pre-joined into
    customer, nation broadcast twice under different roles; one
    aggregate computes both the conditional and total sums, share in
    exact integer ppm."""
    return warehouse.market_share(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "part"),
    )


@register("warehouse_big_spenders", warehouse.big_spender_orders_sql())
def warehouse_big_spenders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume-order shape: HAVING-threshold fact aggregate
    whose tiny qualifying set broadcasts into the decoration joins."""
    return warehouse.big_spender_orders(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register("warehouse_promo_bands", warehouse.promo_band_revenue_sql())
def warehouse_promo_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 disjunctive-band shape: OR-of-ANDs across a broadcast part
    join with the brand/size union pre-pushed to the dimension scan."""
    return warehouse.promo_band_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


@register("warehouse_custdist", warehouse.customer_distribution_sql())
def warehouse_custdist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer-distribution shape: the outer-join classic —
    order-count histogram INCLUDING zero-order customers.  The fact
    side aggregates to key-level before the left join (one
    map-side-combined shuffle), so the outer join never sees the raw
    order stream."""
    return warehouse.customer_distribution(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register("warehouse_sales_opportunity", warehouse.sales_opportunity_sql())
def warehouse_sales_opportunity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 dormant-rich-customers shape: scalar-subquery average
    (single-row broadcast, cross-multiplied so no division — exact
    integer cents) + left-anti join against the DISTINCT buyer keys."""
    return warehouse.sales_opportunity(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register("warehouse_waiting_suppliers", warehouse.waiting_suppliers_sql())
def warehouse_waiting_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 waiting-suppliers shape: suppliers whose line shipped late
    on finished MULTI-supplier orders where they were the ONLY late
    supplier — the famous EXISTS/NOT-EXISTS double self-join on the
    fact, planned as one LEFT SEMI + one LEFT ANTI over key-level
    DISTINCT pair projections (fact collapses before both self-joins;
    plan pinned in test_plans.py)."""
    return warehouse.waiting_suppliers(
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "warehouse_supplier_census",
    warehouse.supplier_relationship_census_sql(),
)
def warehouse_supplier_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier-relationship shape: distinct-supplier census
    per qualifying (brand, type, size) class — the fact stream
    collapses to distinct (part, supplier) pairs BEFORE the dimension
    join, the complaint exclusion (negative-balance suppliers) is a
    LEFT ANTI against a tiny aggregate, and both dimension filters
    push to the part scan (plan pinned in test_plans.py)."""
    return warehouse.supplier_relationship_census(
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "lineitem"),
    )


@register("warehouse_returned_items", warehouse.returned_item_revenue_sql())
def warehouse_returned_items_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item-reporting shape: revenue lost to returns per
    customer for one order quarter — returnflag filter pushed to the
    lineitem scan, date window to the orders scan, nation broadcast,
    exact integer cents, deterministic top-20 TakeOrdered."""
    return warehouse.returned_item_revenue(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "nation"),
    )


@register("warehouse_small_qty_revenue", warehouse.small_qty_revenue_sql())
def warehouse_small_qty_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order shape: the correlated per-part average
    quantity subquery as ONE class-restricted aggregate joined back —
    cross-multiplied integer comparison (no division), part-class
    semi-join BEFORE the aggregate, single-row integer-cents report."""
    return warehouse.small_qty_revenue(
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "lineitem"),
    )


# ----------------------------------------------- graph analytics (RDF)


@register("graph_degree_distribution", graph.degree_distribution_sql())
def graph_degree_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In/out degree histogram of the entity graph."""
    return graph.degree_distribution(triple_view(spark, sf_dir))


@register("graph_pagerank", graph.pagerank_sql())
def graph_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer fixed-point PageRank over the entity
    graph (bit-identical to the oracle's chained-CTE recurrence)."""
    return graph.pagerank(triple_view(spark, sf_dir))


@register("graph_kcore", graph.k_core_sql())
def graph_kcore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition membership (Seidman 1983) of the
    symmetrized entity graph: iterative peel until every surviving
    node keeps degree >= 4 among survivors, reporting within-core
    degree.  Spark loop stops at the fixed point (raises if not
    reached); the oracle is the identical peel unrolled to
    KCORE_MAX_ROUNDS chained CTEs — surplus rounds past the fixed
    point are the identity map.  Measured convergence: 6 peels at
    sf0.001/sf0.1, 9 at sf0.01."""
    return graph.k_core(triple_view(spark, sf_dir))


@register("graph_kcore_decrement", graph.k_core_sql())
def graph_kcore_decrement_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME k-core decomposition forced onto the decrement-peel
    physical strategy (edge table built once, per-round join against
    the just-removed front, mutable degree ledger) — the long-peel-tail
    branch k_core's "auto" criterion dispatches to.  Identical oracle
    as graph_kcore, so the driver's check doubles as the
    strategy-agreement test, like cind_approx_verify vs cind_minimal.
    Deliberately the SLOWER strategy on this star-fringe graph
    (measured r9: 96-118s vs 21-50s at sf0.1) — registered for
    correctness evidence of the branch, excluded from bench.py (the
    restrict twin measures the operator)."""
    return graph.k_core(triple_view(spark, sf_dir), strategy="decrement")


@register("graph_components", graph.graph_components_sql())
def graph_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the hub-pruned entity graph — the
    graph-analytics pair-completer with graph_pagerank.  Min-label
    propagation + pointer jumping (functions/dedup.py:
    _min_label_components, the near-dup clustering loop, reused over a
    second graph); oracle = the identical recurrence as chained
    materialized CTEs.  Measured convergence: 5 rounds at sf0.001,
    3 at sf0.01 (subcritical hub threshold — see
    graph.COMPONENTS_MAX_DEGREE)."""
    return graph.graph_components(triple_view(spark, sf_dir))


# ------------------------------------ training-data pipeline: curation


@register("docs_train_split", sampling.train_split_sql())
def docs_train_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-derived train/val/test split assignment."""
    return sampling.train_split(_docs(spark, sf_dir))


@register("docs_stratified_sample", sampling.stratified_sample_sql())
def docs_stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic top-k sample (two-phase salted top-k)."""
    return sampling.stratified_sample(_docs(spark, sf_dir))


@register("docs_contamination", sampling.contamination_check_sql())
def docs_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set shingle contamination counts vs the training corpus."""
    return sampling.contamination_check(_docs(spark, sf_dir))


@register("docs_contamination_fuzzy", dedup.contamination_fuzzy_sql())
def docs_contamination_fuzzy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (near-duplicate) eval-set contamination: cross-set LSH
    band probe — eval side shuffled on (band, key), AQE picks the build
    side — exact-Jaccard verified, hot band buckets capped."""
    return dedup.contamination_fuzzy(_docs(spark, sf_dir))


@register("docs_pack_sequences", sampling.pack_sequences_sql())
def docs_pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing via hierarchical (two-pass) parallel prefix sum."""
    return sampling.pack_sequences(_docs(spark, sf_dir))


@register("docs_export_train", sampling.export_train_corpus_sql())
def docs_export_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed export: quality gates ∘ exact-dedup canonical ∘ train
    split in one fused plan."""
    return sampling.export_train_corpus(_docs(spark, sf_dir))


@register("docs_span_dedup", sampling.span_dedup_sql())
def docs_span_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-corpus span dedup: non-overlapping k-token spans
    keep their globally-first occurrence; documents reassembled."""
    return sampling.span_dedup(_docs(spark, sf_dir))


@register("docs_mix_sources", sampling.mix_sources_sql())
def docs_mix_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-derived source-mixture subsampling (domain
    weighting)."""
    return sampling.mix_sources(_docs(spark, sf_dir))


@register("docs_dsir_weights", sampling.dsir_weights_sql())
def docs_dsir_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed-unigram importance weight per document
    (target/raw probability ratio, fixed-point integer arithmetic)."""
    return sampling.dsir_weights(_docs(spark, sf_dir))


# ----------------------------------- training-data pipeline: similarity


@register("knn_bruteforce", similarity.knn_bruteforce_sql())
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the query vectors."""
    return similarity.knn_bruteforce(_embs(spark, sf_dir))


@register("embedding_prep", similarity.embedding_prep_sql())
def embedding_prep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm + int8 quantization prep stats."""
    return similarity.embedding_prep(_embs(spark, sf_dir))


@register("knn_ivf_recall", similarity.knn_ivf_recall_sql())
def knn_ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the IVF index vs exact brute force."""
    return similarity.knn_ivf_recall(_embs(spark, sf_dir))


@register("knn_lsh", similarity.knn_lsh_sql())
def knn_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (random-hyperplane band signatures → bucket
    join → exact rescoring)."""
    return similarity.knn_lsh(_embs(spark, sf_dir))


@register("knn_lsh_multiprobe", similarity.knn_lsh_multiprobe_sql())
def knn_lsh_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH k-NN (Lv et al. 2007): each query additionally
    probes every bucket at Hamming distance 1 per band, recovering
    near neighbors a borderline hyperplane pushed next door — recall@10
    0.520 -> 0.960 at sf0.01 with the index UNCHANGED (the 100 TB
    trade: probe fan-out is cheap, index size is not).  Exact rescoring
    tail identical to knn_lsh."""
    return similarity.knn_lsh_multiprobe(_embs(spark, sf_dir))


@register("embedding_kmeans", similarity.embedding_kmeans_sql())
def embedding_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means IVF training in integer fixed-point (bit-identical
    recurrence across engines); returns the final assignment."""
    return similarity.embedding_kmeans(_embs(spark, sf_dir))


@register("dedup_semantic", similarity.semantic_dedup_sql())
def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-then-prune semantic dedup (linear plan:
    broadcast centroid assignment + representative cosine)."""
    return similarity.semantic_dedup(_embs(spark, sf_dir))


@register("knn_ivf", similarity.knn_ivf_sql())
def knn_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (deterministic index)."""
    return similarity.knn_ivf(_embs(spark, sf_dir))


@register("knn_ivf_trained", similarity.knn_ivf_trained_sql())
def knn_ivf_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over TRAINED centroids: the integer Lloyd loop
    (embedding_kmeans) builds the index instead of first-N-by-id
    seeding — balanced buckets on skewed corpora."""
    return similarity.knn_ivf_trained(_embs(spark, sf_dir))


@register("knn_ivf_trained_recall", similarity.knn_ivf_trained_recall_sql())
def knn_ivf_trained_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of trained-centroid IVF vs exact brute force (companion
    of knn_ivf_recall for the seeded index)."""
    return similarity.knn_ivf_trained_recall(_embs(spark, sf_dir))


@register("knn_ivf_pq", similarity.knn_ivf_pq_sql())
def knn_ivf_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ quantized ANN: coarse probe buckets, candidates ranked by
    asymmetric distance against per-subspace integer-Lloyd codebooks
    (4 code lookups per candidate, not a 64-wide dot), top survivors
    exact-rescored — the 100 TB index-memory lever (16× compression)."""
    return similarity.knn_ivf_pq(_embs(spark, sf_dir))


@register("knn_ivf_pq_recall", similarity.knn_ivf_pq_recall_sql())
def knn_ivf_pq_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of IVF-PQ vs exact brute force — what quantized codes +
    LUT scoring cost at the default probe/rescore settings."""
    return similarity.knn_ivf_pq_recall(_embs(spark, sf_dir))


@register("knn_ivf_pq_trained", similarity.knn_ivf_pq_trained_sql())
def knn_ivf_pq_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ over a TRAINED coarse quantizer (integer-Lloyd centroids,
    map-side argmax assignment) — the production 100 TB ANN form; the
    PQ tail (encode, broadcast ADC LUT, bounded rescore) is shared with
    knn_ivf_pq."""
    return similarity.knn_ivf_pq_trained(_embs(spark, sf_dir))


@register("knn_ivf_pq_trained_recall", similarity.knn_ivf_pq_trained_recall_sql())
def knn_ivf_pq_trained_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of trained-coarse IVF-PQ vs exact brute force —
    completes the seeded/trained x exact/PQ recall grid."""
    return similarity.knn_ivf_pq_trained_recall(_embs(spark, sf_dir))


@register("knn_hard_negatives", similarity.knn_hard_negatives_sql())
def knn_hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per query, the top-k
    most-similar vectors with a DIFFERENT label, via the IVF probe
    plan (label inequality pushed into the scored join)."""
    return similarity.knn_hard_negatives(_embs(spark, sf_dir))


@register("embedding_rp_reduce", similarity.rp_reduce_sql())
def embedding_rp_reduce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection dimensionality reduction: 64→16 integer
    components per vector, shuffle-free single-stage codegen; the ±1
    matrix is a shared compile-time literal on both engines."""
    return similarity.rp_reduce(_embs(spark, sf_dir))


# --------------------------------------------------- event analytics


@register("events_hourly_counts", events.hourly_event_counts_sql())
def events_hourly_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts + value sums."""
    return events.hourly_event_counts(_events(spark, sf_dir))


@register("events_sessionize", events.sessionize_sql())
def events_sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap)."""
    return events.sessionize(_events(spark, sf_dir))


@register("events_top_purchasers", events.top_purchasers_per_day_sql())
def events_top_purchasers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day top-k users by purchase value."""
    return events.top_purchasers_per_day(_events(spark, sf_dir))


@register("events_interarrival", events.user_interarrival_sql())
def events_interarrival_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap stats (lag window + aggregate)."""
    return events.user_interarrival(_events(spark, sf_dir))


@register("events_daily_rollup", events.daily_rollup_sql())
def events_daily_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, event_type) counts with ROLLUP subtotals."""
    return events.daily_rollup(_events(spark, sf_dir))


@register("events_retention", events.day_retention_sql())
def events_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day user retention per day."""
    return events.day_retention(_events(spark, sf_dir))


@register("events_asof_join", events.asof_last_view_sql())
def events_asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: purchase → most recent prior view per user (union +
    running-last window; oracle is DuckDB's native ASOF LEFT JOIN)."""
    return events.asof_last_view(_events(spark, sf_dir))


@register("events_range_join", events.range_join_counts_sql())
def events_range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: clicks within 10 min before each error."""
    return events.range_join_counts(_events(spark, sf_dir))


@register("events_anomalies", events.value_anomalies_sql())
def events_anomalies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score value outliers (moment stats + broadcast
    rejoin; no window sort)."""
    return events.value_anomalies(_events(spark, sf_dir))


@register("events_hourly_profile", events.hourly_activity_profile_sql())
def events_hourly_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type."""
    return events.hourly_activity_profile(_events(spark, sf_dir))


@register("events_transitions", events.event_transitions_sql())
def events_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition census (empirical Markov chain,
    integer-ppm probabilities)."""
    return events.event_transitions(_events(spark, sf_dir))


@register("events_dau_wau", events.dau_wau_sql())
def events_dau_wau_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day active users (banded replication for the
    rolling distinct — no per-day history self-join)."""
    return events.dau_wau(_events(spark, sf_dir))


@register("events_grouping_sets", events.grouping_sets_census_sql())
def events_grouping_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS census with grouping_id (one pass)."""
    return events.grouping_sets_census(_events(spark, sf_dir))


@register("events_distinct_sketch", events.distinct_users_sketch_sql())
def events_distinct_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate vs exact, per event type
    (sketch must land within tolerance or the oracle check fails)."""
    return events.distinct_users_sketch(_events(spark, sf_dir))


@register("events_moving_window", events.moving_daily_value_sql())
def events_moving_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing 7-day RANGE-frame moving count/value sum
    (integer-exact frame aggregation)."""
    return events.moving_daily_value(_events(spark, sf_dir))


@register("events_pivot", events.events_pivot_by_type_sql())
def events_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event counts pivoted to one column per event type."""
    return events.events_pivot_by_type(_events(spark, sf_dir))


@register("events_funnel", events.event_funnel_sql())
def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel reach counts."""
    return events.event_funnel(_events(spark, sf_dir))


# ------------------------------------------------------- streaming
# Streaming queries run to completion (Trigger.AvailableNow → memory
# sink) and return the sink table, so the driver checks the STREAMING
# execution path itself.  stream_hourly_counts is complete-mode equal
# to the batch window aggregate by construction, so it carries the
# batch SQL oracle (full three-check coverage of a streaming plan);
# the stateful sessionizer emits only gap-closed sessions (open
# sessions stay in state) — a proper subset of the batch result with
# no SQL rendering, hence rows-only.


@register("stream_hourly_counts", events.hourly_event_counts_sql())
def stream_hourly_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts over readStream — equals the
    batch ``events_hourly_counts`` result exactly (complete mode)."""
    import uuid

    from rdfind_spark.streaming import hourly_counts_stream, run_available_now, stream_events

    # unique sink name: memory-sink queryNames cannot be reused within
    # one session, and the driver may invoke a query more than once
    name = run_available_now(
        hourly_counts_stream(stream_events(spark, sf_dir)),
        f"stream_hourly_{uuid.uuid4().hex[:8]}",
        output_mode="complete",
    )
    return spark.table(name)


@register(
    "stream_interval_join",
    """SELECT e.event_id, e.user_id, e.ts AS e_ts, c.ts AS c_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id AND c.ts <= e.ts
 AND epoch_us(c.ts) > epoch_us(e.ts) - 600 * 1000000""",
)
def stream_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (error ⋈ preceding
    clicks) driven to completion — the emitted pair set equals the
    batch range join exactly, so it carries a full SQL oracle."""
    import uuid

    from rdfind_spark.streaming import (
        run_available_now,
        stream_error_click_join,
        stream_events,
    )

    name = run_available_now(
        stream_error_click_join(stream_events(spark, sf_dir)),
        f"stream_ivj_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    return spark.table(name)


@register(
    "stream_purchase_totals",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
       round(SUM(value), 6) AS purchase_value
FROM events WHERE event_type = 'purchase' GROUP BY 1, 2""",
)
def stream_purchase_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked per-(day, user) purchase totals over readStream
    (complete mode ⇒ equals the batch daily aggregate exactly)."""
    import uuid

    from rdfind_spark.streaming import (
        daily_purchase_totals_stream,
        run_available_now,
        stream_events,
    )

    name = run_available_now(
        daily_purchase_totals_stream(stream_events(spark, sf_dir)),
        f"stream_ptot_{uuid.uuid4().hex[:8]}",
        output_mode="complete",
    )
    return spark.table(name)


from rdfind_spark.streaming.windows import (
    session_window_stream_oracle_sql,
    streaming_anomalies_oracle_sql,
    streaming_contamination_oracle_sql,
    streaming_dedup_deliveries_oracle_sql,
    streaming_sessionize_oracle_sql,
)


@register("stream_anomalies", streaming_anomalies_oracle_sql())
def stream_anomalies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online stateful z-score outliers (``applyInPandasWithState``,
    Welford moments carried across micro-batches).  Full SQL oracle:
    under the guaranteed single AvailableNow micro-batch the online
    prior-prefix baseline equals a prior-prefix window frame (see
    streaming_anomalies_oracle_sql); exact parity with a Python online
    reference is additionally pinned in
    tests/test_streaming_multimodal.py."""
    import uuid

    from rdfind_spark.streaming import (
        run_available_now,
        stream_events,
        streaming_anomalies,
    )

    ev = stream_events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    name = run_available_now(
        streaming_anomalies(ev),
        f"stream_anom_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    return spark.table(name)


@register(
    "stream_session_windows",
    session_window_stream_oracle_sql(),
)
def stream_session_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessions via Spark's NATIVE session_window aggregation —
    the JVM-side, state-store-backed twin of stream_sessions'
    applyInPandasWithState sessionizer (the 100 TB-preferred variant:
    incremental hash aggregate, no Arrow hop).  Full SQL oracle:
    µs-gap batch islands with end = last event + gap, emitted iff the
    final watermark passes the end."""
    import uuid

    from rdfind_spark.streaming import (
        run_available_now,
        session_window_stream,
        stream_events,
    )

    name = run_available_now(
        session_window_stream(stream_events(spark, sf_dir)),
        f"stream_sw_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    return spark.table(name)


@register("stream_sessions", streaming_sessionize_oracle_sql())
def stream_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionizer (``applyInPandasWithState``) driven
    to completion.  Full SQL oracle: closed sessions equal µs-gap batch
    sessionization minus each user's final (still-open) session under
    the guaranteed single micro-batch (see
    streaming_sessionize_oracle_sql); batch-equality is additionally
    pinned in tests/test_streaming_multimodal.py."""
    import uuid

    from rdfind_spark.streaming import run_available_now, stream_events, streaming_sessionize

    name = run_available_now(
        streaming_sessionize(stream_events(spark, sf_dir)),
        f"stream_sessions_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    return spark.table(name)


@register(
    "stream_dedup_deliveries",
    streaming_dedup_deliveries_oracle_sql(),
)
def stream_dedup_deliveries_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery dedup via dropDuplicatesWithinWatermark:
    every event delivered twice (self-union), first arrival per full
    delivery fingerprint survives, key state expires with the
    watermark (bounded state on an unbounded stream).  Deterministic
    because duplicate deliveries are identical in every projected
    column; under the single AvailableNow micro-batch the result is
    SELECT DISTINCT over the projection."""
    import uuid

    from rdfind_spark.streaming import (
        run_available_now,
        stream_events,
        streaming_dedup_deliveries,
    )

    name = run_available_now(
        streaming_dedup_deliveries(stream_events(spark, sf_dir)),
        f"stream_dedup_{uuid.uuid4().hex[:8]}",
        output_mode="append",
        # the SELECT DISTINCT oracle is equivalent only under one data
        # micro-batch (steady-state watermark expiry re-admits keys) —
        # make the contract self-checking instead of prose-only
        expect_single_data_batch=True,
    )
    return spark.table(name)


@register(
    "stream_contamination",
    streaming_contamination_oracle_sql(dedup.CONTAM_FUZZY_EVAL_MOD),
)
def stream_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-time eval-set contamination guard: incoming
    (train) documents are LSH-banded per micro-batch with the batch
    dedup's expression tree and stream-static joined against the eval
    set's hot-capped band-key table; collisions are quarantined doc_ids
    (distinct — dropDuplicates state IS the quarantine set, bounded by
    contamination incidence).  Batch-count-independent output, full SQL
    oracle shared with the batch twin via dedup._lsh_sql_parts."""
    import uuid

    from rdfind_spark.streaming import (
        run_available_now,
        stream_documents,
        streaming_contamination_guard,
    )

    eval_docs = _docs(spark, sf_dir).filter(
        F.col("doc_id") % dedup.CONTAM_FUZZY_EVAL_MOD == 0
    )
    eval_keys = dedup._cold_band_keys(eval_docs).select("band", "key").distinct()
    train_stream = stream_documents(spark, sf_dir).filter(
        F.col("doc_id") % dedup.CONTAM_FUZZY_EVAL_MOD != 0
    )
    name = run_available_now(
        streaming_contamination_guard(train_stream, eval_keys),
        f"stream_contam_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    return spark.table(name)


# ------------------------------------------------------- multimodal


@register("multimodal_audio_stats", multimodal.audio_clip_stats_sql())
def multimodal_audio_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audio path completing the multimodal triad: byte-
    valid WAV clips (RIFF header literal + JVM-assembled PCM body,
    incl. an odd-size LIST chunk exercising RIFF word alignment) →
    real chunk-walk decode (mapInPandas, shuffle-free) → PCM amplitude
    sum.  The oracle recomputes the synthesis arithmetic, so a wrong
    header offset, chunk stride, or sample decode breaks the hash."""
    return multimodal.audio_clip_stats(_docs(spark, sf_dir))


@register("multimodal_bmp_stats", multimodal.bmp_image_stats_sql())
def multimodal_bmp_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BMP image path: byte-valid 24-bit BMPs (constant
    header literal + JVM-assembled pixel array stored BOTTOM-UP with
    the 4-byte row stride the format demands) → real header/stride
    walk decode (mapInPandas, shuffle-free) → per-channel pixel sums.
    The oracle recomputes the pixel formulas, so a wrong data offset,
    stride, row order, or BGR/RGB mixup breaks the hash; the top-down
    (negative height) variant is pinned in unit tests."""
    return multimodal.bmp_image_stats(_docs(spark, sf_dir))


@register("multimodal_features", multimodal.multimodal_features_sql())
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing + Arrow-batched feature extraction
    (mapInPandas), verified end-to-end against SQL."""
    return multimodal.multimodal_features(_docs(spark, sf_dir))


@register("multimodal_frame_stats", multimodal.video_frame_stats_sql())
def multimodal_frame_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video-frame path end to end: deterministic concatenated-
    NetPBM containers built JVM-side (attach_videos), frame boundaries
    found by actual header parses (sample_frames), every 2nd frame
    decoded to pixel stats (frame_stats).  The oracle recomputes the
    container arithmetic, so a wrong boundary, stride, or decode breaks
    the hash.  Pixel-exact mixed-geometry sampling is pinned in
    tests/test_streaming_multimodal.py."""
    return multimodal.video_frame_stats(_docs(spark, sf_dir), every_n=2)


@register("multimodal_gif_stats", multimodal.gif_image_stats_sql())
def multimodal_gif_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end GIF path (round-11 registration of the round-10
    codec): byte-valid GIF87a payloads built JVM-side (attach_gif:
    global palette + literal-LZW sub-blocks) → REAL LZW decompression
    (hand-written decoder, mapInPandas, shuffle-free) → per-channel
    palette sums and the row-order moment.  The oracle recomputes the
    pixel formulas, so a wrong bit order, code width, clear-code
    handling, palette stride, or sub-block walk breaks the hash;
    compressing-encoder round-trip and 4-pass interlace are pinned in
    tests/test_streaming_multimodal.py."""
    return multimodal.gif_image_stats(_docs(spark, sf_dir))


@register("multimodal_png_stats", multimodal.png_image_stats_sql())
def multimodal_png_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end PNG path (round-11 registration of the round-10
    codec): byte-valid truecolor PNGs built JVM-side (attach_png,
    row filter cycling through all five spec types by doc_id) →
    stdlib zlib inflate + per-row filter reconstruction
    (None/Sub/Up/Average/Paeth, mapInPandas, shuffle-free) → channel
    sums and the row-order moment.  The oracle recomputes the pixel
    formulas, so a wrong Paeth predictor, filter inverse, stride, or
    CRC/chunk walk breaks the hash; the spec-side filter fixture is
    pinned in tests/test_streaming_multimodal.py."""
    return multimodal.png_image_stats(_docs(spark, sf_dir))


# --------------------------------------------------- board ordering
#
# The driver's correctness board caps at 50 entries taken in registry
# order, while the registry holds more — so registration order decides
# which queries get fresh driver evidence each round.  The priority
# list below front-loads (a) every query whose latest driver check is
# not green (never checked, or failed last time — includes everything
# newly registered this round) and (b) the flagship CIND engines plus
# one representative per operator family, so each round's board both
# closes evidence gaps and re-verifies the core.  The tail (everything
# not listed) keeps its file order; tests/test_oracle_meta.py enforces
# that no evidence-gapped query falls outside the first 50.

_BOARD_PRIORITY = [
    # round-11 rotation (precomputed plan: COVERAGE.md "Precomputed
    # round-11 board plan", demanded by the round-10 verdict task 1;
    # the forced set was recomputed this round as
    # registered − keys(CORRECTNESS_r09) − keys(CORRECTNESS_r10) and
    # matched the plan's thirty keys exactly; 3-round staleness window
    # enforced by test_driver_evidence_staleness_bounded):
    #   1-30: the THIRTY keys whose only in-window driver rows are
    #        CORRECTNESS_r08, which exits the window this round — they
    #        MUST collect fresh rows now.  In the plan's order.
    #   31-35: the round-11 registrations (first driver evidence
    #        needed; ≤5/round policy, COVERAGE.md "Registry-growth
    #        policy").
    #   36-50: the first FIFTEEN of the 50 r9-board keys not
    #        re-covered at r10, in r9-board order.  The remaining 35
    #        r9-cohort keys exit the window at r12 and MUST lead the
    #        round-12 board (35 forced + ≤5 new = ≤40, leaving ≥10
    #        slots to start the r10 cohort).
    # --- slots 1-30: the thirty r8-evidence deferrals
    "condition_counts_frequent",
    "join_line_histogram",
    "hash_collisions",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprints",
    "dedup_exact",
    "warehouse_revenue_by_nation",
    "warehouse_revenue_forecast",
    "warehouse_late_priority",
    "warehouse_min_cost_supplier",
    "warehouse_volume_shipping",
    "warehouse_big_spenders",
    "graph_degree_distribution",
    "docs_train_split",
    "docs_stratified_sample",
    "docs_contamination",
    "docs_contamination_fuzzy",
    "docs_pack_sequences",
    "docs_export_train",
    "docs_span_dedup",
    "docs_dsir_weights",
    "events_hourly_counts",
    "events_transitions",
    "events_moving_window",
    "events_pivot",
    "events_funnel",
    "multimodal_audio_stats",
    "multimodal_features",
    # --- slots 31-35: round-11 registrations
    "multimodal_gif_stats",
    "multimodal_png_stats",
    "cind_zipf_skew",
    "docs_url_dedup",
    "docs_hybrid_search",
    # --- slots 36-50: the r9 cohort, first 15 not re-covered at r10,
    #     in r9-board order
    "text_redact",
    "text_bigrams",
    "text_token_length_hist",
    "docs_length_deciles",
    "docs_length_digest",
    "docs_length_percentiles",
    "warehouse_pricing_summary",
    "warehouse_promo_bands",
    "docs_cube_counts",
    "embedding_rp_reduce",
    "stream_anomalies",
    "stream_sessions",
    "knn_hard_negatives",
    "knn_ivf_trained_recall",
    "knn_ivf_trained",
]


def _board_order(d: dict) -> dict:
    out = {n: d[n] for n in _BOARD_PRIORITY if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


SPARK_QUERIES = _board_order(SPARK_QUERIES)
ORACLE_SQL = _board_order(ORACLE_SQL)
