"""Deduplication operators over the ``documents`` table: exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Scale design notes (100 TB posture):

* Exact dedup is a hash-groupBy — one shuffle of (hash, doc_id).
* N-gram Jaccard uses the inverted-index self-join (shingle → doc);
  like the CIND pair join, hot shingles blow up quadratically, so
  shingles shared by more than ``MAX_SHINGLE_DOCS`` documents are
  dropped (an uninformative shingle contributes almost nothing to
  Jaccard but dominates the pair explosion — the same frequency-pruning
  idea the CIND engine uses, in reverse).
* MinHash+LSH replaces the all-pairs join with banded bucket joins:
  only documents sharing a band key are candidate pairs, then exact
  Jaccard verifies — with shingle tables semi-joined down to candidate
  docs first, so verification cost scales with candidates, not corpus².
* SimHash pairs use the pigeonhole band join (max_hamming+1 bit bands;
  a qualifying pair must agree on ≥1 band) — an equi-join, not a cross
  join, and exact by construction.
* Embedding-cosine brute force is quadratic by definition; the scale
  path is rdfind_spark.functions.similarity (IVF bucketing).

All content hashing is md5 (bit-identical in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rdfind_spark.functions.text import tokens_col
from rdfind_spark.util import materialize

NGRAM_K = 3  # tokens per dedup shingle
MAX_SHINGLE_DOCS = 100  # inverted-index hot-shingle cap
# Band-bucket analogue of MAX_SHINGLE_DOCS: an LSH band key shared by
# more than this many documents is dropped before the bucket self-join
# (a w-wide bucket emits w(w-1)/2 candidates — one degenerate key must
# not go quadratic).  Recall effect: a duplicate CLASS wider than the
# cap collides in every band, so all its buckets are dropped and LSH
# reports no pairs for it — by construction such classes are
# (near-)identical en masse, which is exact dedup's job
# (exact_dedup_map collapses them in one hash groupBy); LSH exists for
# the sparse near-dup tail, where buckets are narrow.
MAX_BAND_DOCS = 200
JACCARD_THRESHOLD = 0.18
MINHASH_K = 12  # number of min-hashes
LSH_BANDS = 4  # bands (rows per band = MINHASH_K / LSH_BANDS)
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 2
COSINE_DUP_THRESHOLD = 0.4


def normalized_text() -> Column:
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")


def exact_dedup_map(documents: DataFrame) -> DataFrame:
    """doc_id → canonical doc_id (the smallest doc_id sharing the same
    normalized-text md5).  Self-mapping rows included so the output is
    total (and the oracle check non-vacuous even without duplicates)."""
    hashed = documents.select(
        "doc_id", F.md5(normalized_text()).alias("text_hash")
    )
    canon = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("canonical_id"))
    return hashed.join(canon, on="text_hash").select(
        "doc_id", "canonical_id", "text_hash"
    )


def exact_dedup_map_sql() -> str:
    return """WITH h AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash
  FROM documents
),
c AS (SELECT text_hash, MIN(doc_id) AS canonical_id FROM h GROUP BY text_hash)
SELECT doc_id, canonical_id, h.text_hash FROM h JOIN c USING (text_hash)"""


def _shingles(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, shingle) — distinct k-token shingles per document."""
    toks = tokens_col(F.col("text"))
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return documents.select("doc_id", F.explode(sh).alias("shingle"))


def _shingles_sql(k: int) -> str:
    return f"""SELECT doc_id, unnest(list_distinct(list_transform(
         range(1, greatest(len(toks) - {k - 2}, 2)),
         i -> array_to_string(toks[i:i+{k - 1}], ' ')))) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)"""


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    k: int = NGRAM_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> DataFrame:
    """Near-duplicate pairs by exact shingle-set Jaccard, computed with
    an inverted-index self-join (shingle → docs), counting shared
    shingles per doc pair, then |A∩B| / (|A| + |B| - |A∩B|)."""
    sh = _shingles(documents, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    hot = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") > max_shingle_docs
    )
    cold = sh.join(F.broadcast(hot.select("shingle")), on="shingle", how="left_anti")
    a = cold.select("shingle", F.col("doc_id").alias("a_id"))
    b = cold.select("shingle", F.col("doc_id").alias("b_id"))
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("a_n"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("b_n"))
    jac = F.round(
        F.col("n_common") / (F.col("a_n") + F.col("b_n") - F.col("n_common")), 6
    )
    # sizes are corpus-sized (one row per doc): no broadcast hint — AQE
    # promotes the build side from measured sizes, and degrades to a
    # shuffle join gracefully when the corpus doesn't fit an executor
    return (
        common.join(sa, on="a_id")
        .join(sb, on="b_id")
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(
    threshold: float = JACCARD_THRESHOLD,
    k: int = NGRAM_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> str:
    return f"""WITH sh AS MATERIALIZED (
{_shingles_sql(k)}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {max_shingle_docs}),
cold AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON common.a_id = sa.doc_id
JOIN sizes sb ON common.b_id = sb.doc_id
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= {threshold}"""


def _prefix_candidates(
    cold: "DataFrame", df_counts: "DataFrame", threshold: float
) -> "DataFrame":
    """Prefix- AND positionally-filtered candidate pairs (SSJoin
    prefix principle, Chaudhuri et al. ICDE 2006; PPJoin positional
    filter, Xiao et al. WWW 2008): order each document's shingles by a
    GLOBAL canonical order (ascending corpus document-frequency,
    rarest first, ties by shingle), keep only the first
    ``c - ceil(t*c) + 1`` per document (c = the doc's cold-set size),
    self-join on those prefix shingles only, and drop prefix hits
    whose positions already cap the achievable overlap below the
    threshold.  Completeness: J(A,B) >= t forces |A∩B| >=
    ceil(t*max(|A|,|B|)), and two sets sharing that much overlap must
    share an element inside both prefixes — so every qualifying pair
    survives the prefix cut; the positional bound (in-line comment) is
    exact, so it never removes a qualifying pair either.  Measured at
    sf0.001: 12,025 full-join candidate pairs -> 5,780 prefix-only ->
    2,668 with the positional filter (78% total reduction), output
    identical.  The rarest-first order puts the prefix mass on the
    SHORTEST posting lists, which is what makes set-similarity
    self-joins feasible at corpus scale."""
    ranked = cold.join(df_counts, on="shingle")
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    csizes = cold.groupBy("doc_id").agg(F.count("*").alias("c"))
    pref = (
        ranked.withColumn("rnk", F.row_number().over(w))
        .join(csizes, on="doc_id")
        .filter(
            F.col("rnk")
            <= F.col("c") - F.ceil(F.col("c") * F.lit(threshold)) + 1
        )
        .select("doc_id", "shingle", "rnk", "c")
    )
    a = pref.select(
        "shingle",
        F.col("doc_id").alias("a_id"),
        F.col("rnk").alias("a_rnk"),
        F.col("c").alias("a_c"),
    )
    b = pref.select(
        "shingle",
        F.col("doc_id").alias("b_id"),
        F.col("rnk").alias("b_rnk"),
        F.col("c").alias("b_c"),
    )
    # PPJoin POSITIONAL filter (Xiao et al. 2008 Lemma 2): matching at
    # canonical positions (i, j) caps the achievable overlap at
    # 1 + min(cA - i, cB - j) (one for this match plus everything to
    # the right on the tighter side); a qualifying pair needs overlap
    # >= ceil(t/(1+t) * (cA + cB)), so prefix hits that cannot reach
    # the bound generate no candidate at all.  Kept per-HIT before the
    # distinct: a pair survives if ANY of its prefix matches passes.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a_c") + F.col("b_c"))
    )
    ubound = 1 + F.least(
        F.col("a_c") - F.col("a_rnk"), F.col("b_c") - F.col("b_rnk")
    )
    return (
        a.join(b, on="shingle")
        .filter((F.col("a_id") < F.col("b_id")) & (ubound >= alpha))
        .select("a_id", "b_id")
        .distinct()
    )


def jaccard_pairs_prefix(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    k: int = NGRAM_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs via PREFIX-FILTERED
    candidate generation — same result as :func:`ngram_jaccard_pairs`
    (it shares that query's oracle as a strategy-agreement check),
    different plan: instead of joining FULL cold posting lists, only
    each document's ``c - ceil(t*c) + 1`` rarest shingles enter the
    self-join (see :func:`_prefix_candidates`), then candidates verify
    by one sorted-array intersection per pair.

    Completeness under the hybrid measure: the reported score divides
    the COLD common count by full-set sizes, so reported >= t implies
    cold-set Jaccard >= t (its denominator is never larger), and the
    prefix principle applied to the cold sets covers every reportable
    pair.

    Scale shape: the candidate join is the same inverted-index shape
    as the base but over the (1-t) prefix fraction of each list —
    at t = 0.5 that's half the postings and ~a quarter of the
    pair-products; verification is candidate-count-sized with
    doc-bounded arrays.  Hot-shingle cap identical to the base."""
    sh = _shingles(documents, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    hot = df_counts.filter(F.col("df") > max_shingle_docs)
    cold = sh.join(
        F.broadcast(hot.select("shingle")), on="shingle", how="left_anti"
    )
    cand = _prefix_candidates(cold, df_counts, threshold)
    arrs = cold.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("arr")
    )
    jac = F.round(
        F.col("n_common") / (F.col("a_n") + F.col("b_n") - F.col("n_common")),
        6,
    )
    return (
        cand.join(arrs.select(F.col("doc_id").alias("a_id"), F.col("arr").alias("a_arr")), on="a_id")
        .join(arrs.select(F.col("doc_id").alias("b_id"), F.col("arr").alias("b_arr")), on="b_id")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_arr", "b_arr")).alias("n_common"),
        )
        .join(sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("a_n")), on="a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("b_n")), on="b_id")
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --- containment join (asymmetric near-dup) -------------------------------

CONTAINMENT_THRESHOLD_PPM = 500_000  # C(src->dst) >= 0.5


def containment_pairs(
    documents: DataFrame,
    threshold_ppm: int = CONTAINMENT_THRESHOLD_PPM,
    k: int = NGRAM_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> DataFrame:
    """DIRECTED containment near-dup pairs: (src_id, dst_id,
    containment_ppm) where C(src→dst) = |S_src ∩ S_dst| / |S_src| over
    k-token shingle sets — the ASYMMETRIC twin of the Jaccard paths.
    Jaccard misses the quote/subset case a curation pipeline cares
    about most (a short document wholly contained in a long one scores
    J ≈ |short|/|long| ≈ 0 but C(short→long) = 1); containment is the
    Broder 1997 "inclusion" measure for exactly that.

    Exactness: the score is integer ppm, ``n_common * 1e6 DIV |S_src|``
    — no floats, engine-stable; commons are counted over the COLD
    shingle sets while the denominator is the FULL distinct-shingle
    count (the same hybrid the Jaccard paths use: hot-capped shingles
    can only LOWER the reported score, so reported >= t implies true
    cold containment >= t).

    Scale shape (SSJoin prefix principle on the PROBE side only,
    Chaudhuri et al. ICDE 2006): C(src→dst) >= t forces
    |overlap| >= ceil(t·c_src) over src's cold set (c = cold size), so
    src must match inside its first ``c - ceil(t·c) + 1`` shingles in
    the rarest-first canonical order — only that prefix enters the
    candidate join.  The DST side has no prefix bound (containment is
    one-sided: dst may be arbitrarily large), so candidates join the
    prefix against FULL cold posting lists — still hot-capped, so every
    list is bounded and the join is probe-prefix × capped-list sized.
    Verification is one sorted-array intersection per candidate, arrays
    doc-bounded.  The integer prefix bound ``c - (c*t_ppm + 999999)
    DIV 1e6 + 1`` rounds exactly as ceil, so no float wobble can drop
    a qualifying pair; the oracle is the UNFILTERED inverted-index
    form, making the driver's check a completeness proof of the prefix
    cut as well."""
    sh = _shingles(documents, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    hot = df_counts.filter(F.col("df") > max_shingle_docs)
    cold = sh.join(
        F.broadcast(hot.select("shingle")), on="shingle", how="left_anti"
    )
    ranked = cold.join(df_counts, on="shingle")
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    csizes = cold.groupBy("doc_id").agg(F.count("*").alias("c"))
    pref = (
        ranked.withColumn("rnk", F.row_number().over(w))
        .join(csizes, on="doc_id")
        .filter(
            F.col("rnk")
            <= F.col("c")
            - F.expr(f"(c * {threshold_ppm} + 999999) DIV 1000000")
            + 1
        )
        .select("shingle", F.col("doc_id").alias("src_id"))
    )
    # Candidate generation by GROUPED LINE ARRAYS instead of the
    # prefix×full-posting-list self-join (r12; guide §1.2/§2.4 — the
    # bipartite twin of the CIND engine's _grouped_pair_counts): tag
    # prefix entries, group each shingle's postings ONCE (one exchange;
    # the self-join shuffled the postings twice — pref side + full
    # side — then built and probed a per-partition hash relation), and
    # emit src×dst pairs directly from the two per-shingle arrays.
    # Bounded by construction: hot shingles (df > max_shingle_docs) are
    # already removed, so |srcs| × |dsts| <= max_shingle_docs² per
    # group — a streaming generate, never a task-melting hub.
    tagged = cold.select(
        "shingle", "doc_id", F.lit(False).alias("is_src")
    ).unionByName(
        pref.select(
            "shingle", F.col("src_id").alias("doc_id"), F.lit(True).alias("is_src")
        )
    )
    grouped = (
        tagged.repartition("shingle")
        .groupBy("shingle")
        .agg(
            F.collect_list(F.when(F.col("is_src"), F.col("doc_id"))).alias("srcs"),
            F.collect_list(F.when(~F.col("is_src"), F.col("doc_id"))).alias("dsts"),
        )
        .filter((F.size("srcs") >= 1) & (F.size("dsts") >= 1))
    )
    cand = (
        grouped.select(F.explode("srcs").alias("src_id"), "dsts")
        .select("src_id", F.explode("dsts").alias("dst_id"))
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )
    arrs = cold.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("arr")
    )
    return (
        cand.join(
            arrs.select(F.col("doc_id").alias("src_id"),
                        F.col("arr").alias("src_arr")),
            on="src_id",
        )
        .join(
            arrs.select(F.col("doc_id").alias("dst_id"),
                        F.col("arr").alias("dst_arr")),
            on="dst_id",
        )
        .select(
            "src_id",
            "dst_id",
            F.size(F.array_intersect("src_arr", "dst_arr")).alias("n_common"),
        )
        .join(
            sizes.select(F.col("doc_id").alias("src_id"),
                         F.col("n_sh").alias("src_n")),
            on="src_id",
        )
        .select(
            "src_id",
            "dst_id",
            F.expr("CAST(n_common AS BIGINT) * 1000000 DIV src_n").alias(
                "containment_ppm"
            ),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
    )


def containment_pairs_sql(
    threshold_ppm: int = CONTAINMENT_THRESHOLD_PPM,
    k: int = NGRAM_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> str:
    """Oracle: the UNFILTERED inverted-index containment join (no
    prefix cut), so the driver's check doubles as a completeness proof
    of the Spark side's prefix candidate generation."""
    return f"""WITH sh AS MATERIALIZED (
{_shingles_sql(k)}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {max_shingle_docs}),
cold AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
common AS (
  SELECT a.doc_id AS src_id, b.doc_id AS dst_id, COUNT(*) AS n_common
  FROM cold a JOIN cold b ON a.shingle = b.shingle
                         AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT src_id, dst_id,
       CAST(n_common * 1000000 // sa.n_sh AS BIGINT) AS containment_ppm
FROM common
JOIN sizes sa ON common.src_id = sa.doc_id
WHERE n_common * 1000000 // sa.n_sh >= {threshold_ppm}"""


DUP_SPAN_L = 10  # minimum duplicated-substring length, in tokens


def dup_span_census(documents: "DataFrame", L: int = DUP_SPAN_L) -> "DataFrame":
    """Per-document MAXIMAL duplicated-substring census — the
    exact-substring dedup signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), re-expressed
    relationally instead of via a suffix array: a token position is
    *duplicated* when the L-gram starting there occurs >= 2 times
    anywhere in the corpus (the suffix-array criterion for membership
    in a repeated substring of length >= L); overlapping/adjacent
    duplicated L-gram intervals then merge into maximal spans, exactly
    the spans a suffix-array pass would cut out.  Unlike
    ``span_dedup`` (C4-style FIXED non-overlapping chunks) this
    catches duplication at ANY alignment, and unlike the corpus-level
    ``dup_ngram_fraction`` it localizes: per document, how many
    maximal duplicated regions and what token fraction they cover.

    Output: (doc_id, n_tokens, n_dup_spans, dup_tokens,
    dup_fraction_ppm) for every document with >= L tokens — zeros for
    clean documents, all exact integers.

    Scale: one sliding-gram explode (~n_tokens rows/doc, hashes only),
    one map-side-combined census groupBy, one semi-join back, then the
    interval merge is two windows PARTITIONED BY doc_id — per-task
    state is document-length-bounded, never corpus-bounded.  The
    reference suffix-array approach needs a global sort of the corpus;
    this shape shuffles the same volume but partitions it, which is
    the 100 TB trade."""
    toks = tokens_col(F.col("text"))
    docs = documents.select(
        "doc_id", toks.alias("toks")
    ).filter(F.size("toks") >= L)
    base = docs.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (L - 1)),
                lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i, L))),
            )
        ).alias("p0", "gh"),
    )
    dup = grams.groupBy("gh").agg(F.count("*").alias("c")).filter(
        F.col("c") >= 2
    )
    dpos = grams.join(dup.select("gh"), on="gh", how="left_semi").select(
        "doc_id", (F.col("p0") + 1).alias("pos")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = dpos.withColumn(
        "prev_end", F.max(F.col("pos") + F.lit(L - 1)).over(w_prev)
    ).withColumn(
        "ns",
        F.when(
            F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end") + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    spans = (
        flagged.withColumn("sid", F.sum("ns").over(w_run))
        .groupBy("doc_id", "sid")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + F.lit(L - 1)).alias("e"),
        )
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    return base.join(per_doc, on="doc_id", how="left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.expr(
            "coalesce(dup_tokens, 0) * 1000000 DIV n_tokens"
        ).alias("dup_fraction_ppm"),
    )


def dup_span_census_sql(L: int = DUP_SPAN_L) -> str:
    return f"""WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
d AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t
      WHERE len(toks) >= {L}),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(toks[i:i+{L - 1}], ' ')) AS gh
  FROM d, unnest(range(1, n_tokens - {L} + 2)) u(i)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
dp AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM dup)),
f AS (
  SELECT doc_id, pos,
         MAX(pos + {L - 1}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dp
),
s AS (SELECT doc_id, pos,
        CASE WHEN prev_end IS NULL OR pos > prev_end + 1
             THEN 1 ELSE 0 END AS ns
      FROM f),
sp AS (SELECT doc_id, pos,
         SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
       FROM s),
iv AS (SELECT doc_id, sid, MIN(pos) AS st, MAX(pos) + {L - 1} AS en
       FROM sp GROUP BY doc_id, sid),
pd AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
         CAST(SUM(en - st + 1) AS BIGINT) AS dup_tokens
       FROM iv GROUP BY doc_id)
SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       COALESCE(pd.dup_tokens, 0) AS dup_tokens,
       CAST(COALESCE(pd.dup_tokens, 0) * 1000000
            // d.n_tokens AS BIGINT) AS dup_fraction_ppm
FROM d LEFT JOIN pd ON d.doc_id = pd.doc_id"""


COSINE_PAIR_MIN_PPM = 250_000  # cos >= 0.5 <=> cos^2 >= 0.25


def _cos2_ppm_expr(dot: str, a_n2: str, b_n2: str) -> str:
    """Spark-SQL expression for exact integer cos^2-ppm,
    ``dot^2 * 1e6 DIV (a_n2 * b_n2)``, cross-multiplied in
    DECIMAL(38,0) so neither the numerator (BIGINT-overflows at
    dot > ~3.03e6) nor the denominator product (overflows at
    n2 > ~3.03e9 each) can hit the int64 cliff; the quotient is a
    true ppm (<= 1e6 by Cauchy-Schwarz) so the final BIGINT cast is
    always exact.  The wide form is itself exact only to
    ``dot <= ~3e15`` (``dot^2 * 1e6`` must stay under the DECIMAL(38,0)
    ceiling of 1e38; past it Spark yields null/raises by ANSI mode).
    DuckDB twin: the same formula over HUGEINT
    (``_cos2_ppm_sql``); identical integer semantics, pinned by
    tests/test_functions.py::test_cos2_ppm_wide_arithmetic."""
    return (
        f"CAST(CAST({dot} AS DECIMAL(38,0)) * {dot} * 1000000 "
        f"DIV (CAST({a_n2} AS DECIMAL(38,0)) * {b_n2}) AS BIGINT)"
    )


def _cos2_ppm_sql(dot: str, a_n2: str, b_n2: str) -> str:
    """DuckDB twin of :func:`_cos2_ppm_expr` (HUGEINT is 128-bit)."""
    return (
        f"CAST(CAST({dot} AS HUGEINT) * {dot} * 1000000 "
        f"// (CAST({a_n2} AS HUGEINT) * {b_n2}) AS BIGINT)"
    )


def shingle_cosine_pairs(
    documents: "DataFrame",
    min_cos2_ppm: int = COSINE_PAIR_MIN_PPM,
    k: int = NGRAM_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> "DataFrame":
    """Near-duplicate pairs by WEIGHTED sparse cosine over k-token
    shingle count vectors — the tf-weighted counterpart of
    ``ngram_jaccard_pairs`` (sets weigh a repeated shingle once; count
    vectors weigh repetition, so boilerplate-heavy near-dups that
    Jaccard under-scores surface here).  The measure is defined over
    the stopword-capped vector space: shingles in more than
    ``max_shingle_docs`` documents are dropped from BOTH the dot
    product and the norms (self-consistent — identical documents still
    score cos = 1), exactly as the oracle does.

    Exactness: the score is cos^2 in ppm via integer
    cross-multiplication, ``dot^2 * 1e6 DIV (|a|^2 * |b|^2)`` — no
    sqrt, no floats, bit-stable across engines and monotone in cosine
    for ranking/thresholding.  The cross-multiplication runs in WIDE
    integers (DECIMAL(38,0) in Spark, HUGEINT in DuckDB — see
    ``_cos2_ppm_expr``): in BIGINT the numerator overflows once
    ``dot > ~3.03e6`` (two long documents sharing a high-tf cold
    shingle), where ANSI Spark raises and pre-ANSI Spark silently
    wraps while DuckDB raises — either way a scale cliff.  The wide
    form is exact to ``dot <= ~3e15`` (DECIMAL(38,0) capacity:
    ``dot^2 * 1e6 < 1e38`` requires ``dot < sqrt(1e32) ~= 3.16e15``),
    beyond any physical document.

    Scale: same inverted-index self-join shape as the Jaccard path —
    one (shingle, doc) shuffle, the hot-shingle cap bounds every
    posting list so the pair explosion is probe-linear, and the norm
    tables are corpus-sized single rows per doc (AQE picks the build
    side)."""
    toks = tokens_col(F.col("text"))
    sh_all = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    wsh = (
        documents.select("doc_id", F.explode(sh_all).alias("shingle"))
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("tf"))
    )
    hot = (
        wsh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_shingle_docs)
    )
    cold = wsh.join(
        F.broadcast(hot.select("shingle")), on="shingle", how="left_anti"
    )
    n2 = cold.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    a = cold.select(
        "shingle", F.col("doc_id").alias("a_id"), F.col("tf").alias("a_tf")
    )
    b = cold.select(
        "shingle", F.col("doc_id").alias("b_id"), F.col("tf").alias("b_tf")
    )
    dots = (
        a.join(b, on="shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("a_tf") * F.col("b_tf")).alias("dot"))
    )
    na = n2.select(F.col("doc_id").alias("a_id"), F.col("n2").alias("a_n2"))
    nb = n2.select(F.col("doc_id").alias("b_id"), F.col("n2").alias("b_n2"))
    return (
        dots.join(na, on="a_id")
        .join(nb, on="b_id")
        .select(
            "a_id",
            "b_id",
            "dot",
            F.expr(_cos2_ppm_expr("dot", "a_n2", "b_n2")).alias("cos2_ppm"),
        )
        .filter(F.col("cos2_ppm") >= min_cos2_ppm)
    )


def shingle_cosine_pairs_sql(
    min_cos2_ppm: int = COSINE_PAIR_MIN_PPM,
    k: int = NGRAM_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> str:
    return f"""WITH wsh AS MATERIALIZED (
  SELECT doc_id, shingle, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(list_transform(
        range(1, greatest(len(toks) - {k - 2}, 2)),
        i -> array_to_string(toks[i:i+{k - 1}], ' '))) AS shingle
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents)
  ) GROUP BY doc_id, shingle
),
hot AS (SELECT shingle FROM wsh GROUP BY shingle
        HAVING COUNT(*) > {max_shingle_docs}),
cold AS (SELECT * FROM wsh WHERE shingle NOT IN (SELECT shingle FROM hot)),
n2 AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
       FROM cold GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, dot,
       {_cos2_ppm_sql("dot", "na.n2", "nb.n2")} AS cos2_ppm
FROM dots
JOIN n2 na ON dots.a_id = na.doc_id
JOIN n2 nb ON dots.b_id = nb.doc_id
WHERE {_cos2_ppm_sql("dot", "na.n2", "nb.n2")} >= {min_cos2_ppm}"""


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-permutation MinHash signature per document: min over shingles
    of md5(i || ':' || shingle) for i in 0..k-1.

    The shingle array is projected in a separate select so the k
    min-hash columns share ONE evaluation of the tokenize+slice+distinct
    pipeline (referenced k times, CollapseProject keeps it
    un-inlined; inlining measured k× slower)."""
    toks = tokens_col(F.col("text"))
    sh = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks) - (NGRAM_K - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM_K)),
        )
    )
    with_sh = documents.select("doc_id", sh.alias("sh"))
    cols = [
        F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh{i}")
        for i in range(k)
    ]
    return with_sh.select("doc_id", *cols)


def _band_keys(
    documents: DataFrame, k: int = MINHASH_K, bands: int = LSH_BANDS
) -> DataFrame:
    """(doc_id, band, key) LSH bucket keys: the k-wide minhash
    signature split into ``bands`` groups, each group md5-combined into
    one bucket key.  Shared by the dedup pair enumerator and the fuzzy
    contamination probe so the two can never disagree on banding."""
    r = k // bands
    sig = minhash_signatures(documents, k)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{band * r + j}") for j in range(r)])).alias(
            f"band{band}"
        )
        for band in range(bands)
    ]
    return (
        sig.select("doc_id", *band_cols)
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.col(f"band{band}").alias("key"),
                        )
                        for band in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("doc_id", "bk.band", "bk.key")
    )


def _cold_band_keys(
    documents: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_band_docs: int = MAX_BAND_DOCS,
) -> DataFrame:
    """(doc_id, band, key) with hot band buckets dropped — the
    band-bucket analogue of the inverted index's hot-shingle cap (see
    ``MAX_BAND_DOCS`` for the recall argument).  One aggregate over the
    key table; the hot set is candidate-class-sized, so the anti-join
    broadcast is bounded by corpus_size / max_band_docs keys.

    The band-key table is MATERIALIZED before the fan-out: it roots the
    hot-bucket aggregate, the anti-join probe side, AND the caller's
    a/b self-join sides, all on top of the expensive minhash-signature
    subtree (k md5 transforms over every shingle of every doc).
    Exchange reuse does NOT dedup it across the anti-join boundary —
    the round-5 judge A/B measured the uncached fan-out as a real ~30%
    regression on dedup_minhash_lsh/dedup_clusters.  Size is
    corpus x bands rows of (doc_id, band, md5) — linear, result-class,
    no wider than one shuffle of the downstream self-join."""
    keys = materialize(_band_keys(documents, k, bands))
    hot = (
        keys.groupBy("band", "key")
        .agg(F.count("*").alias("width"))
        .filter(F.col("width") > max_band_docs)
        .select("band", "key")
    )
    return keys.join(F.broadcast(hot), on=["band", "key"], how="left_anti")


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band the k-wide signature into
    ``bands`` groups, bucket-join on (band index, band key), then verify
    candidates with exact shingle Jaccard.  Output = (a_id, b_id,
    jaccard) — identical semantics to ngram_jaccard_pairs restricted to
    LSH candidates.  Band buckets wider than ``MAX_BAND_DOCS`` are
    dropped before the self-join (recall effect documented at the
    constant), so a degenerate mass-duplicate corpus stays
    candidate-bounded instead of going quadratic in one bucket."""
    keys = _cold_band_keys(documents, k, bands)
    a = keys.select("band", "key", F.col("doc_id").alias("a_id"))
    b = keys.select("band", "key", F.col("doc_id").alias("b_id"))
    cands = (
        a.join(b, on=["band", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # (cands is referenced by three plan branches below, but each branch
    # now rebuilds it from the MATERIALIZED band-key table — a broadcast
    # anti-join plus one bucket self-join over a checkpointed input, not
    # the signature subtree; re-A/B'd after the _cold_band_keys
    # checkpoint landed: adding a second checkpoint here is a wash.)
    # Exact-Jaccard verification restricted to the LSH candidates — the
    # candidate restriction must happen BEFORE the shingle join, or the
    # "scale path" silently degenerates to the all-pairs join it exists
    # to avoid.  Shingle rows are semi-joined down to candidate docs,
    # then each a-side shingle row fans out only to that doc's candidate
    # partners (result-sized broadcast) and matches b-side shingles on
    # (b_id, shingle): per-pair cost is linear in shingles per doc.
    sh = _shingles(documents, NGRAM_K)
    cand_ids = (
        cands.select(F.col("a_id").alias("doc_id"))
        .unionByName(cands.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(cand_ids, on="doc_id", how="left_semi")
    # total shingle counts per candidate doc, computed from the
    # candidate-restricted shingles (the semi-join restricts DOCS, not
    # shingles, so the counts are exact for candidate docs — and only
    # candidate docs ever reach the size joins below).  A full-corpus
    # census here would be a second corpus-wide aggregate for values
    # that are thrown away.
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa_sh = shc.select(F.col("doc_id").alias("a_id"), "shingle")
    sb_sh = shc.select(F.col("doc_id").alias("b_id"), "shingle")
    common = (
        sa_sh.join(cands, on="a_id")
        .join(sb_sh, on=["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("a_n"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("b_n"))
    jac = F.round(
        F.col("n_common") / (F.col("a_n") + F.col("b_n") - F.col("n_common")), 6
    )
    return (
        common.join(sa, on="a_id")
        .join(sb, on="b_id")
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _lsh_sql_parts(
    k: int = MINHASH_K, bands: int = LSH_BANDS, source: str = "documents"
):
    """(prelude, band_union) SQL fragments of the LSH banding — the
    oracle-side twin of ``_band_keys``, shared by the dedup,
    fuzzy-contamination, and streaming-contamination oracles.
    ``prelude`` is the full ``WITH docs … banded`` chain (tokenize →
    distinct shingles → minhash signature → band hashes): one copy of
    the tokenizer/shingle-window arithmetic, so a fix cannot miss one
    of the three consumers; each caller appends its own ``keys`` CTE
    from ``band_union`` and everything after."""
    r = k // bands
    mh_cols = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s))) AS mh{i}"
        for i in range(k)
    )
    band_cols = ", ".join(
        "md5("
        + " || '|' || ".join(f"mh{band * r + j}" for j in range(r))
        + f") AS band{band}"
        for band in range(bands)
    )
    band_union = "\nUNION ALL ".join(
        f"SELECT doc_id, {band} AS band, band{band} AS key FROM banded"
        for band in range(bands)
    )
    prelude = f"""WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM {source}
),
shl AS MATERIALIZED (
  SELECT doc_id, list_distinct(list_transform(
      range(1, greatest(len(toks) - {NGRAM_K - 2}, 2)),
      i -> array_to_string(toks[i:i+{NGRAM_K - 1}], ' '))) AS sh
  FROM docs
),
sig AS (SELECT doc_id, {mh_cols} FROM shl),
banded AS (SELECT doc_id, {band_cols} FROM sig)"""
    return prelude, band_union


def minhash_lsh_pairs_sql(
    threshold: float = JACCARD_THRESHOLD,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    source: str = "documents",
) -> str:
    prelude, band_union = _lsh_sql_parts(k, bands, source)
    return f"""{prelude},
keys AS ({band_union}),
hotb AS (SELECT band, key FROM keys
         GROUP BY band, key HAVING COUNT(*) > {MAX_BAND_DOCS}),
coldk AS (SELECT k.* FROM keys k WHERE NOT EXISTS
          (SELECT 1 FROM hotb h WHERE h.band = k.band AND h.key = k.key)),
cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM coldk a JOIN coldk b ON a.band = b.band AND a.key = b.key
   AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT doc_id, unnest(sh) AS shingle FROM shl),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.a_id, c.b_id,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common c
JOIN cands USING (a_id, b_id)
JOIN sizes sa ON c.a_id = sa.doc_id
JOIN sizes sb ON c.b_id = sb.doc_id
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= {threshold}"""


def simhash_fingerprints(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint: bit j is the sign of the sum over tokens of
    ±1 votes, where a token's vote for bit j is the parity of hex digit
    j of its md5 (portable across engines, unlike native hash
    functions).  Fingerprint packed into a BIGINT.

    Token hashes are projected separately so the ``bits`` vote
    aggregates share ONE tokenize+md5 evaluation instead of inlining it
    per bit (same CollapseProject consideration as
    minhash_signatures; measured ~bits× slower inlined)."""
    toks = tokens_col(F.col("text"))
    with_hashes = documents.select(
        "doc_id", F.transform(toks, lambda t: F.md5(t)).alias("hs")
    )
    bit_terms = []
    for j in range(bits):
        votes = F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.ascii(F.substring(h, j + 1, 1)) % 2 == 1, 1).otherwise(-1),
        )
        bit_terms.append(
            F.when(votes > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    fp = bit_terms[0]
    for t in bit_terms[1:]:
        fp = fp + t
    return with_hashes.select("doc_id", fp.alias("simhash"))


def simhash_fingerprints_sql(bits: int = SIMHASH_BITS) -> str:
    terms = []
    for j in range(bits):
        terms.append(
            f"CASE WHEN list_sum(list_transform(hs, h -> "
            f"CASE WHEN ascii(substr(h, {j + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN CAST({2**j} AS BIGINT) ELSE 0 END"
        )
    return f"""WITH t AS (
  SELECT doc_id, list_transform(string_split_regex(trim(text), '\\s+'), t -> md5(t)) AS hs
  FROM documents
)
SELECT doc_id, {' + '.join(terms)} AS simhash FROM t"""


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, via the pigeonhole
    band join: split the fingerprint into ``max_hamming + 1`` bit bands —
    any pair within the distance budget must agree exactly on at least
    one band — bucket-join on (band, key), verify the full distance, and
    dedupe pairs matched in several bands.  Equi-join only; no cross
    join anywhere (the scale path IS the semantics here, results are
    identical to all-pairs by the pigeonhole principle)."""
    fp = simhash_fingerprints(documents, bits)
    nb = max_hamming + 1
    widths = [bits // nb + (1 if i < bits % nb else 0) for i in range(nb)]
    offsets = [sum(widths[:i]) for i in range(nb)]
    bk = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("key"),
                    )
                    for i in range(nb)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = bk.select(
        "band", "key", F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_fp")
    )
    b = bk.select(
        "band", "key", F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_fp")
    )
    ham = F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp")))
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    return f"""WITH fp AS MATERIALIZED (
{simhash_fingerprints_sql()}
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a, fp b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def _min_label_components(edges: DataFrame, max_iters: int = 20):
    """Connected components over a SYMMETRIC edge list (a_id, b_id):
    min-label propagation WITH pointer jumping — per round every node
    takes min(own label, neighbors' labels), then every label is
    replaced by its label's label (L := L[L]).  The jump doubles the
    distance a label has travelled each round, so convergence is
    O(log diameter) rounds, not O(diameter): a 1,000-long duplicate
    CHAIN (each consecutive pair above threshold — the degenerate
    corpus plain propagation needs 999 rounds for) converges in 10
    (pinned by test_clusters_chain_converges_logarithmically).  20
    rounds therefore covers diameters up to ~10^6; if a graph somehow
    needs more, the loop RAISES rather than return a non-converged
    (silently wrong) labeling.

    State is bounded by the EDGE ENDPOINTS, not the corpus: nodes with
    no near-dup pair never enter the loop (their label is trivially
    their own id — the caller unions them back).  At 100 TB that makes
    every per-round join candidate-class-sized, orders of magnitude
    below a corpus-sized propagation table.

    Returns (labels DataFrame (doc_id, cluster_id), rounds used)."""
    labels = (
        edges.select(F.col("a_id").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .transform(materialize)
    )
    for rounds in range(1, max_iters + 1):
        prop = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("b_id"),
                    F.col("cluster_id").alias("n_cluster"),
                ),
                on="b_id",
            )
            .groupBy("a_id")
            .agg(F.min("n_cluster").alias("n_min"))
        )
        stepped = labels.join(
            prop.select(F.col("a_id").alias("doc_id"), "n_min"), on="doc_id"
        ).select(
            "doc_id",
            F.col("cluster_id").alias("old_id"),
            F.least(F.col("cluster_id"), F.col("n_min")).alias("cluster_id"),
        )
        # pointer jump: L := L[L].  Every label value is itself a node
        # id present in `stepped` (labels only ever take min's of node
        # ids), so the lookup join always matches; the left join +
        # coalesce is belt-and-braces.  The previous round's label
        # rides along as old_id so convergence detection below is a
        # flag filter over the materialized result — NOT a second
        # new-vs-old join (one fewer shuffle per round).
        lookup = stepped.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("cluster_id").alias("jumped"),
        )
        new = (
            stepped.join(lookup, on="cluster_id", how="left")
            .select(
                "doc_id",
                "old_id",
                F.coalesce("jumped", "cluster_id").alias("cluster_id"),
            )
            .transform(materialize)
        )
        changed = new.filter(F.col("cluster_id") != F.col("old_id")).count()
        labels = new.select("doc_id", "cluster_id")
        if changed == 0:
            return labels, rounds
    raise RuntimeError(
        f"connected components did not converge in {max_iters} rounds "
        f"(diameter > ~2^{max_iters}) — raise max_iters"
    )


def dedup_clusters(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_iters: int = 20,
) -> DataFrame:
    """Near-duplicate clusters: connected components over the
    MinHash+LSH pair graph, labeled by the smallest doc_id in each
    component (the canonical document a dedup pipeline keeps).

    Spark-side: min-label propagation with POINTER JUMPING
    (``_min_label_components``) over the edge endpoints only — O(log
    diameter) rounds, candidate-class state, loud failure instead of a
    silently non-converged labeling; unpaired documents are unioned
    back as their own singletons without ever entering the loop.  Pure
    DataFrame ops, no GraphX dependency."""
    pairs = minhash_lsh_pairs(documents, threshold=threshold)
    e = pairs.select("a_id", "b_id")
    edges = (
        e.unionByName(
            e.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
        )
        .distinct()
        .transform(materialize)
    )
    from rdfind_spark.util import loop_shuffle_partitions

    # Loop-stage sizing (the pagerank rule, util.loop_shuffle_partitions):
    # the label loop's state is candidate-pair-sized, far below the
    # session's shuffle.partitions sizing; edges is materialized, so
    # the count is a cache scan.
    with loop_shuffle_partitions(documents.sparkSession, edges.count()):
        labels, _ = _min_label_components(edges, max_iters)
    return (
        documents.select("doc_id")
        .join(labels, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )


def dedup_clusters_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    """Oracle: transitive closure via recursive CTE over the same LSH
    pair graph, cluster = min reachable doc_id."""
    lsh = minhash_lsh_pairs_sql(threshold)
    return f"""WITH pairs AS MATERIALIZED (
{lsh}
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  )
  SELECT * FROM r
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
FROM documents d
LEFT JOIN reach r ON r.src = d.doc_id
GROUP BY d.doc_id"""


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, computed in double
    precision (rounded to 6 decimals for cross-engine stability)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    return F.round(dot / (na * nb), 6)


COSINE_SQL = (
    "round(list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"
)


def embedding_cosine_pairs(
    embeddings: DataFrame, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """Embedding near-dup pairs: all pairs with cosine ≥ threshold.
    Brute force (the correctness baseline); the IVF variant in
    functions.similarity is the scale path."""
    a = embeddings.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb")
    )
    b = embeddings.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb")
    )
    cos = cosine_col(F.col("a_emb"), F.col("b_emb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_cosine_pairs_sql(threshold: float = COSINE_DUP_THRESHOLD) -> str:
    cos = COSINE_SQL.format(a="a.embedding", b="b.embedding")
    return f"""SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos} AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND {cos} >= {threshold}"""


INCREMENTAL_SPLIT_ID = 250


def incremental_dedup(
    documents: DataFrame, split_id: int = INCREMENTAL_SPLIT_ID
) -> DataFrame:
    """Incremental (cross-run) exact dedup: new documents (doc_id ≥
    split_id, standing in for today's crawl) are admitted only if their
    normalized-text hash does not appear in the prior corpus (doc_id <
    split_id, standing in for the already-ingested fingerprint store).

    Plan shape: the prior corpus contributes ONLY its distinct hash set
    (at production scale: the persisted fingerprint table, bucketed by
    hash — see sources/bucketed.py), and admission is one left_anti
    equi-join on the hash — no rescan of prior text, no pairwise work.
    Output: each new doc with its hash and the admission bit."""
    hashed = documents.withColumn("text_hash", F.md5(normalized_text()))
    prior = (
        hashed.filter(F.col("doc_id") < split_id).select("text_hash").distinct()
    )
    new = hashed.filter(F.col("doc_id") >= split_id)
    dup = new.join(prior, on="text_hash", how="left_semi").select(
        "doc_id", F.lit(False).alias("admitted")
    )
    fresh = new.join(prior, on="text_hash", how="left_anti").select(
        "doc_id", F.lit(True).alias("admitted")
    )
    return (
        new.select("doc_id", "text_hash", "source")
        .join(dup.unionByName(fresh), on="doc_id")
        .select("doc_id", "text_hash", "source", "admitted")
    )


def incremental_dedup_sql(split_id: int = INCREMENTAL_SPLIT_ID) -> str:
    return f"""WITH h AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash
  FROM documents
),
prior AS (SELECT DISTINCT text_hash FROM h WHERE doc_id < {split_id})
SELECT doc_id, text_hash, source,
       NOT EXISTS (SELECT 1 FROM prior p WHERE p.text_hash = h.text_hash)
         AS admitted
FROM h WHERE doc_id >= {split_id}"""


# ------------------------------------ fuzzy eval-set contamination

# a WIDER eval slice than sampling.CONTAM_EVAL_MOD's exact check: near
# -dup leakage is rarer than shingle reuse, so the fuzzy detector holds
# out 10% to keep its oracle non-vacuous at test scale
CONTAM_FUZZY_EVAL_MOD = 10


def contamination_fuzzy(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    eval_mod: int = CONTAM_FUZZY_EVAL_MOD,
) -> DataFrame:
    """Fuzzy train-on-test leakage detector: eval documents
    (``doc_id % eval_mod == 0``) that NEAR-duplicate a training
    document — LSH band-bucket candidates restricted to CROSS-set
    pairs, then exact shingle-Jaccard verification.  Complements
    ``sampling.contamination_check`` (exact shingle reuse): this one
    catches paraphrase-level leakage a single shared shingle
    understates, with the same guarantee as ``minhash_lsh_pairs``
    (every reported pair's Jaccard is exact; candidates are LSH
    recall-bounded).

    Scale: the candidate join is CROSS-set only — never the
    within-train quadratic pair space the dedup query explores.  The
    eval side is a FRACTION of the corpus (not a fixed size), so its
    band keys are NOT broadcast-hinted: the bucket join shuffles on
    (band, key) and AQE picks the build side from measured sizes.
    Band buckets wider than ``MAX_BAND_DOCS`` are dropped up front
    (same cap + recall argument as ``minhash_lsh_pairs``), and the
    candidate/verification joins below carry NO broadcast hints — the
    candidate set is LSH-collision-bounded on real corpora but
    degenerate mass duplication across the eval/train cut could make
    it large, and a hinted broadcast cannot gracefully degrade; AQE
    promotes from measured sizes instead.  The verification joins are
    candidate-restricted before any shingle join, exactly like the
    dedup scale path."""
    keys = _cold_band_keys(documents)
    is_eval = F.col("doc_id") % eval_mod == 0
    ev = keys.filter(is_eval).select(
        "band", "key", F.col("doc_id").alias("eval_id")
    )
    tr = keys.filter(~is_eval).select(
        "band", "key", F.col("doc_id").alias("train_id")
    )
    cands = (
        tr.join(ev, on=["band", "key"])
        .select("eval_id", "train_id")
        .distinct()
    )
    sh = _shingles(documents, NGRAM_K)
    cand_ids = (
        cands.select(F.col("eval_id").alias("doc_id"))
        .unionByName(cands.select(F.col("train_id").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(cand_ids, on="doc_id", how="left_semi")
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    ev_sh = shc.select(F.col("doc_id").alias("eval_id"), "shingle")
    tr_sh = shc.select(F.col("doc_id").alias("train_id"), "shingle")
    common = (
        ev_sh.join(cands, on="eval_id")
        .join(tr_sh, on=["train_id", "shingle"])
        .groupBy("eval_id", "train_id")
        .agg(F.count("*").alias("n_common"))
    )
    se = sizes.select(
        F.col("doc_id").alias("eval_id"), F.col("n_sh").alias("e_n")
    )
    st = sizes.select(
        F.col("doc_id").alias("train_id"), F.col("n_sh").alias("t_n")
    )
    jac = F.round(
        F.col("n_common") / (F.col("e_n") + F.col("t_n") - F.col("n_common")),
        6,
    )
    return (
        common.join(se, on="eval_id")
        .join(st, on="train_id")
        .select("eval_id", "train_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def contamination_fuzzy_sql(
    threshold: float = JACCARD_THRESHOLD,
    eval_mod: int = CONTAM_FUZZY_EVAL_MOD,
) -> str:
    prelude, band_union = _lsh_sql_parts()
    return f"""{prelude},
keys AS ({band_union}),
hotb AS (SELECT band, key FROM keys
         GROUP BY band, key HAVING COUNT(*) > {MAX_BAND_DOCS}),
coldk AS (SELECT k.* FROM keys k WHERE NOT EXISTS
          (SELECT 1 FROM hotb h WHERE h.band = k.band AND h.key = k.key)),
cands AS (
  SELECT DISTINCT e.doc_id AS eval_id, t.doc_id AS train_id
  FROM coldk e JOIN coldk t ON e.band = t.band AND e.key = t.key
  WHERE e.doc_id % {eval_mod} = 0 AND t.doc_id % {eval_mod} <> 0
),
sh AS MATERIALIZED (SELECT doc_id, unnest(sh) AS shingle FROM shl),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT e.doc_id AS eval_id, t.doc_id AS train_id, COUNT(*) AS n_common
  FROM sh e JOIN sh t ON e.shingle = t.shingle
  WHERE e.doc_id % {eval_mod} = 0 AND t.doc_id % {eval_mod} <> 0
  GROUP BY 1, 2
)
SELECT c.eval_id, c.train_id,
       round(n_common / (se.n_sh + st.n_sh - n_common), 6) AS jaccard
FROM common c
JOIN cands USING (eval_id, train_id)
JOIN sizes se ON c.eval_id = se.doc_id
JOIN sizes st ON c.train_id = st.doc_id
WHERE round(n_common / (se.n_sh + st.n_sh - n_common), 6) >= {threshold}"""


# Gopher-style duplicated-n-gram keep threshold: documents whose
# duplicate-shingle fraction exceeds this are boilerplate/template
# suspects (the signal behind the "fraction of duplicate n-grams"
# repetition filters in Gopher / RefinedWeb quality pipelines).
DUP_NGRAM_MAX_PPM = 600_000


def dup_ngram_fraction(
    documents: DataFrame,
    k: int = NGRAM_K,
    max_dup_ppm: int = DUP_NGRAM_MAX_PPM,
) -> DataFrame:
    """Per-document duplicated-n-gram fraction: of a document's
    DISTINCT k-token shingles, how many also occur in at least one
    OTHER document — the corpus-level repetition signal quality
    pipelines filter on (docs_repetition_filter covers the
    within-document Gopher rules; this is the cross-document one).

    Plan: the shared shingle table (one explode), one groupBy(shingle)
    doc-frequency aggregate, one shingle-keyed join back (output size =
    the shingle table itself, never quadratic — unlike the pair miners
    there is no self-join), one groupBy(doc_id).  All counts and the
    ppm fraction are exact integers (truncating div — values are
    non-negative so Spark DIV and DuckDB // agree), so the oracle is
    bit-exact.  Skewed hot shingles concentrate their occurrence lists
    on one reducer in the join-back; AQE skew-join splits those
    partitions at runtime (no cap needed — the fan-out is linear).

    Returns (doc_id, n_shingles, dup_ngram_ppm, keep)."""
    sh = materialize(_shingles(documents, k))  # feeds docfreq + join-back
    docfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(docfreq, on="shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("long")).alias("n_dup"),
        )
    )
    ppm = F.expr("n_dup * 1000000 DIV n_shingles")
    return per_doc.select(
        "doc_id",
        "n_shingles",
        ppm.alias("dup_ngram_ppm"),
        (ppm <= max_dup_ppm).cast("int").alias("keep"),
    )


def dup_ngram_fraction_sql(
    k: int = NGRAM_K, max_dup_ppm: int = DUP_NGRAM_MAX_PPM
) -> str:
    return f"""WITH sh AS MATERIALIZED (
{_shingles_sql(k)}
),
docfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM sh JOIN docfreq USING (shingle) GROUP BY doc_id
)
SELECT doc_id, n_shingles,
       CAST(n_dup * 1000000 // n_shingles AS BIGINT) AS dup_ngram_ppm,
       CAST(CASE WHEN n_dup * 1000000 // n_shingles <= {max_dup_ppm}
            THEN 1 ELSE 0 END AS INT) AS keep
FROM per_doc"""


def minhash_estimate_eval(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    k: int = NGRAM_K,
    k_sig: int = MINHASH_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> DataFrame:
    """Sketch-calibration table: for every exact-Jaccard qualifying
    pair (the :func:`ngram_jaccard_pairs` result), how many of the
    ``k_sig`` MinHash signature components agree — the measured
    accuracy of the estimator the LSH path's banding is built on
    (E[matches/k] = true Jaccard; Broder 1997).  Deduplication at
    100 TB lives or dies on this curve: banding thresholds are chosen
    from the estimator's variance, and this table is the engine's own
    evidence instead of a textbook assumption.

    Output: (a_id, b_id, jaccard, mh_matches, est_ppm) — the exact
    score, the component-agreement count, and the integer-ppm estimate
    ``matches * 1e6 DIV k_sig``.  Everything is deterministic (md5
    permutations), so the DuckDB oracle recomputes it bit-for-bit."""
    pairs = ngram_jaccard_pairs(documents, threshold, k, max_shingle_docs)
    sigs = minhash_signatures(documents, k_sig)
    a_sig = sigs.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(k_sig)],
    )
    b_sig = sigs.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(k_sig)],
    )
    matches = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0)
        for i in range(k_sig)
    )
    return (
        pairs.join(a_sig, on="a_id")
        .join(b_sig, on="b_id")
        .select(
            "a_id",
            "b_id",
            "jaccard",
            matches.cast("int").alias("mh_matches"),
        )
        .withColumn("est_ppm", F.expr(f"mh_matches * 1000000 DIV {k_sig}"))
    )


def minhash_estimate_eval_sql(
    threshold: float = JACCARD_THRESHOLD,
    k: int = NGRAM_K,
    k_sig: int = MINHASH_K,
    max_shingle_docs: int = MAX_SHINGLE_DOCS,
) -> str:
    return f"""WITH sh AS MATERIALIZED (
{_shingles_sql(k)}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {max_shingle_docs}),
cold AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id,
         round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON common.a_id = sa.doc_id
  JOIN sizes sb ON common.b_id = sb.doc_id
  WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= {threshold}
),
mh AS MATERIALIZED (
  SELECT doc_id, i, MIN(md5(i || ':' || shingle)) AS mh
  FROM sh, range({k_sig}) t(i)
  GROUP BY doc_id, i
)
SELECT p.a_id, p.b_id, p.jaccard,
       CAST(COUNT(*) FILTER (ma.mh = mb.mh) AS INTEGER) AS mh_matches,
       CAST(COUNT(*) FILTER (ma.mh = mb.mh) * 1000000 // {k_sig} AS BIGINT)
         AS est_ppm
FROM pairs p
JOIN mh ma ON ma.doc_id = p.a_id
JOIN mh mb ON mb.doc_id = p.b_id AND mb.i = ma.i
GROUP BY p.a_id, p.b_id, p.jaccard"""


def dedup_funnel(
    documents: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """The curation FUNNEL a production dedup pipeline reports: one row
    per stage with documents in / kept / removed.  Stage 1 keeps one
    representative per exact-duplicate class (normalized-text md5);
    stage 2 runs MinHash+LSH component clustering on STAGE-1 SURVIVORS
    and keeps one representative per component.  Truly sequential —
    stage 2 sees only what stage 1 kept.  (A full-corpus shortcut is
    NOT sound here: exact dedup normalizes case/whitespace while
    shingles do not, so a case-variant exact class need not share an
    LSH component — caught by the unit fixture.)

    Output: (stage, method, docs_in, docs_kept, docs_removed), all
    BIGINT.  Single-row aggregates throughout — the stages' heavy
    lifting is the exact map and the component loop, both already
    scale-shaped (hash groupBy; pointer-jumping components over
    LSH-banded candidate edges)."""
    n_docs = documents.agg(F.count("*").alias("n"))
    reps = exact_dedup_map(documents).filter(
        F.col("doc_id") == F.col("canonical_id")
    )
    survivors = documents.join(
        reps.select("doc_id"), on="doc_id", how="left_semi"
    )
    exact_kept = reps.agg(F.count("*").alias("n"))
    cluster_kept = (
        dedup_clusters(survivors, threshold=threshold)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .agg(F.count("*").alias("n"))
    )
    r1 = (
        n_docs.crossJoin(
            exact_kept.select(F.col("n").alias("kept"))
        ).select(
            F.lit(1).alias("stage"),
            F.lit("exact_md5").alias("method"),
            F.col("n").cast("long").alias("docs_in"),
            F.col("kept").cast("long").alias("docs_kept"),
            (F.col("n") - F.col("kept")).cast("long").alias("docs_removed"),
        )
    )
    r2 = (
        exact_kept.crossJoin(
            cluster_kept.select(F.col("n").alias("kept"))
        ).select(
            F.lit(2).alias("stage"),
            F.lit("minhash_lsh_components").alias("method"),
            F.col("n").cast("long").alias("docs_in"),
            F.col("kept").cast("long").alias("docs_kept"),
            (F.col("n") - F.col("kept")).cast("long").alias("docs_removed"),
        )
    )
    return r1.unionByName(r2)


def dedup_funnel_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    # the LSH pair SQL re-sourced to the stage-1 survivors CTE; it
    # stays a complete WITH...SELECT and is embedded as a subquery
    # (DuckDB lets the inner scope see the outer CTEs)
    lsh = minhash_lsh_pairs_sql(threshold, source="survivors")
    return f"""WITH h AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash
  FROM documents
),
exact_reps AS (SELECT MIN(doc_id) AS doc_id FROM h GROUP BY text_hash),
survivors AS (
  SELECT d.* FROM documents d JOIN exact_reps USING (doc_id)
),
exact_kept AS (SELECT COUNT(*) AS n FROM exact_reps),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
pairs AS MATERIALIZED (
{lsh}
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  )
  SELECT * FROM r
),
clusters AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
  FROM survivors d
  LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
),
cluster_kept AS (
  SELECT COUNT(*) AS n FROM clusters WHERE doc_id = cluster_id
)
SELECT 1 AS stage, 'exact_md5' AS method,
       CAST(n_docs.n AS BIGINT) AS docs_in,
       CAST(exact_kept.n AS BIGINT) AS docs_kept,
       CAST(n_docs.n - exact_kept.n AS BIGINT) AS docs_removed
FROM n_docs CROSS JOIN exact_kept
UNION ALL
SELECT 2, 'minhash_lsh_components',
       CAST(exact_kept.n AS BIGINT),
       CAST(cluster_kept.n AS BIGINT),
       CAST(exact_kept.n - cluster_kept.n AS BIGINT)
FROM exact_kept CROSS JOIN cluster_kept"""


# ------------------------------------------------- URL canonical dedup
#
# Web-crawl curation's cheapest dedup stage (round-10 verdict task 3b):
# the same page is fetched under dozens of spellings — scheme case,
# WWW. prefixes, default ports, tracking query params, fragments,
# trailing slashes — and canonicalizing the URL collapses them BEFORE
# any content hashing runs (CCNet / C4 both dedup by normalized URL
# first; the fetch-cost win at 100 TB is that the payloads of the
# collapsed fetches never enter the content pipeline at all).
#
# The documents table has no URL column, so `attach_urls` synthesizes a
# deterministic messy corpus JVM-side (the attach_gif pattern): every
# group of four doc_ids shares one logical page spelled four ways —
# plain; SHOUTED scheme + WWW + explicit :80 + pure-tracking query;
# www + :443 + trailing slash + fragment; and a real ?page=2 variant
# (same path, DIFFERENT page — the canonicalizer must keep
# non-tracking params, so this one must NOT collapse).  The oracle
# reconstructs the expected canonical form arithmetically from doc_id
# — it never runs the canonicalizer — so any wrong regex in the Spark
# chain (host-only lowercasing, utm stripping, separator repair, port
# or slash handling) breaks the value hash.

URL_HOSTS = 97           # distinct hosts in the synthetic crawl
URL_TRACKING_RE = r"(?i)[?&]utm_[^&]*"  # tracking params, any case


def attach_urls(documents: DataFrame) -> DataFrame:
    """(doc_id, …) → (doc_id, url, n_chars): four messy spellings per
    logical page, all JVM `concat`/`when` (no UDF)."""
    g = (F.col("doc_id") / 4).cast("long")
    host = F.concat(
        F.lit("site"), (g % URL_HOSTS).cast("string"), F.lit(".example.com")
    )
    path = F.concat(F.lit("/p/"), (g / URL_HOSTS).cast("long").cast("string"))
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("https://"), host, path))
        .when(
            v == 1,
            F.concat(
                F.lit("HTTP://WWW."), F.upper(host), F.lit(":80"), path,
                F.lit("?utm_source=feed&utm_campaign=c"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://www."), host, F.lit(":443"), path,
                F.lit("/#section-"), F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), host, path,
                F.lit("?page=2&utm_medium=email"),
            )
        )
    )
    return documents.select("doc_id", url.alias("url"), "n_chars")


def canonicalize_url(url: Column) -> Column:
    """Messy URL → canonical form, entirely in JVM regex (whole-stage
    codegen; no Python in the hot path):

    1. drop the fragment;
    2. drop the scheme (case-insensitive);
    3. host part only: lowercase, strip one leading ``www.``, strip an
       explicit default port (:80/:443) — path case is PRESERVED;
    4. drop ``utm_*`` tracking params (any case), then repair the
       separator (first surviving param regains its ``?``);
    5. strip a single trailing slash.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"(?i)^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_extract(u, r"^([^/?#]*)", 1)
    # rest of the URL after the host (may be empty)
    rest = F.substring(u, F.length(host) + 1, F.lit(2147483647))
    host = F.lower(host)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_replace(rest, URL_TRACKING_RE, "")
    rest = F.regexp_replace(rest, r"^([^?]*)&", "$1?")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(host, rest)


def url_dedup(documents: DataFrame, with_urls: bool = False) -> DataFrame:
    """Canonical-URL dedup: group by ``canonicalize_url(url)``, keep
    the best document per page (longest text, then smallest doc_id) and
    count the collapsed spellings.

    Scale: canonicalization is per-row JVM regex; the dedup itself is
    ONE hash shuffle on the canonical key (the same linear shape as
    ``exact_dedup_map``) and the keep-best choice is a max_by inside
    the aggregate — no window over the corpus, no second shuffle."""
    src = documents if with_urls else attach_urls(documents)
    canon = src.select(
        canonicalize_url(F.col("url")).alias("canonical_url"),
        "doc_id",
        "n_chars",
    )
    # keep-best key as ONE bigint (longest text, then smallest doc_id):
    # DuckDB's max_by has no struct-key overload, so both engines rank
    # by the identical n_chars * 2^32 - doc_id arithmetic
    best = F.expr(
        "max_by(struct(doc_id, n_chars), n_chars * 4294967296 - doc_id)"
    )
    return canon.groupBy("canonical_url").agg(
        best.getField("doc_id").alias("kept_doc_id"),
        best.getField("n_chars").alias("kept_n_chars"),
        F.count("*").cast("long").alias("n_dups"),
    )


def url_dedup_sql() -> str:
    """Oracle: the EXPECTED canonical form rebuilt from doc_id
    arithmetic (never the canonicalizer), grouped the same way."""
    return f"""WITH pages AS (
  SELECT doc_id, n_chars,
         'site' || CAST((doc_id // 4) % {URL_HOSTS} AS VARCHAR)
         || '.example.com/p/'
         || CAST((doc_id // 4) // {URL_HOSTS} AS VARCHAR)
         || CASE WHEN doc_id % 4 = 3 THEN '?page=2' ELSE '' END
           AS canonical_url
  FROM documents
)
SELECT canonical_url,
       CAST(max_by(doc_id, n_chars * 4294967296 - doc_id) AS BIGINT)
         AS kept_doc_id,
       CAST(max_by(n_chars, n_chars * 4294967296 - doc_id) AS BIGINT)
         AS kept_n_chars,
       COUNT(*) AS n_dups
FROM pages GROUP BY canonical_url"""
