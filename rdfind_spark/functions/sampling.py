"""Corpus curation operators over the ``documents`` table: deterministic
train/val/test splits, stratified per-source sampling, and eval-set
contamination checks — the selection/leakage layer every training-data
pipeline needs between dedup and export.

Everything is hash-derived and deterministic: no RNG state, so the same
corpus always yields the same split/sample (reproducible pipelines,
resumable backfills), and every operator has an exact DuckDB oracle.

Hash discipline: ``md5`` only (bit-identical across Spark and DuckDB),
matching ``functions.text`` / ``functions.dedup``.  Counts and ranks are
emitted as integers — never engine-rounded floats — so oracle value
hashes are bit-stable (the ``events_retention`` lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdfind_spark.functions.text import SHINGLE_K, tokens_col

# Split fractions are encoded as boundaries on the first byte of
# md5("split:" || doc_id): 0x00-0xcc train (205/256 ≈ 80.1%),
# 0xcd-0xe5 val (25/256 ≈ 9.8%), 0xe6-0xff test (26/256 ≈ 10.2%).
# Byte-boundary arithmetic keeps the comparison a plain string compare
# in BOTH engines (lowercase hex is ASCII-ordered).
TRAIN_BOUND = "cd"
VAL_BOUND = "e6"

SAMPLE_K = 20  # stratified sample size per source
SAMPLE_SALT_BUCKETS = 64

CONTAM_EVAL_MOD = 50  # doc_id % MOD == 0 → held-out eval document


def train_split(documents: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment: the split is a pure
    function of ``md5('split:' || doc_id)``, so membership is stable
    under reruns, repartitioning, and incremental ingestion (a new
    document never moves an old one between splits — the property
    random-number splits lose).

    Scale: a stateless projection — no shuffle, whole-stage codegen,
    trivially parallel at any corpus size."""
    bucket = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    return documents.select(
        "doc_id",
        "source",
        F.when(bucket < TRAIN_BOUND, F.lit("train"))
        .when(bucket < VAL_BOUND, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def train_split_sql() -> str:
    return f"""SELECT doc_id, source,
       CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_BOUND}' THEN 'train'
            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '{VAL_BOUND}' THEN 'val'
            ELSE 'test' END AS split
FROM documents"""


def stratified_sample(documents: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """Deterministic stratified sample: the k documents per source with
    the smallest ``md5('samp:' || doc_id)`` — a hash-ordered "reservoir"
    that is reproducible and uniformly random with respect to content.

    Scale: a naive ``row_number() OVER (PARTITION BY source)`` puts each
    stratum on ONE task — with few large strata (the common case: a
    handful of crawl sources at billions of docs) that is a straggler by
    construction.  Two-phase top-k instead: per (source, salt) local
    top-k over ``SAMPLE_SALT_BUCKETS`` hash-salt buckets spreads every
    stratum across that many tasks, then the global top-k runs over the
    result-sized k × buckets survivors.  Same exact result."""
    h = F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    salted = documents.select("doc_id", "source", h.alias("h")).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(SAMPLE_SALT_BUCKETS))
    )
    w_local = Window.partitionBy("source", "salt").orderBy("h", "doc_id")
    local = (
        salted.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    w_global = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        local.withColumn("sample_rank", F.row_number().over(w_global))
        .filter(F.col("sample_rank") <= k)
        .select("doc_id", "source", "sample_rank")
    )


def stratified_sample_sql(k: int = SAMPLE_K) -> str:
    return f"""SELECT doc_id, source,
       CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS INT) AS sample_rank
FROM documents
QUALIFY sample_rank <= {k}"""


# Export-gate thresholds (sf-profiled so the gate is selective but not
# degenerate: at sf0.01 n_tokens p05=16/p50=56, distinct_ratio p05=0.31).
EXPORT_MIN_TOKENS = 20
EXPORT_MIN_DISTINCT_RATIO = 0.34
EXPORT_MAX_PUNCT_RATIO = 0.2


def export_train_corpus(documents: DataFrame) -> DataFrame:
    """The composed end-of-pipeline export: documents that (a) pass the
    cheap quality gates, (b) are the canonical member of their exact-
    duplicate group, and (c) fall in the train split — i.e. the row set
    a training job would actually read.  Composes the quality, dedup,
    and split operators in one plan to show they fuse.

    Scale: the gates are a stateless projection over one scan; the
    dedup canonical needs the one hash-groupBy exact dedup always needs;
    the split is hash-derived (no shuffle).  Catalyst pushes the gate
    filters below the canonical join, so the expensive side of the join
    carries only surviving docs."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    bucket = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    gated = documents.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("distinct_ratio"),
        F.round(punct / F.length("text"), 6).alias("punct_ratio"),
        bucket.alias("bucket"),
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("text_hash"),
    ).filter(
        (F.col("n_tokens") >= EXPORT_MIN_TOKENS)
        & (F.col("distinct_ratio") >= EXPORT_MIN_DISTINCT_RATIO)
        & (F.col("punct_ratio") <= EXPORT_MAX_PUNCT_RATIO)
        & (F.col("bucket") < TRAIN_BOUND)
    )
    canon = (
        documents.select(
            "doc_id",
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ).alias("text_hash"),
        )
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    return (
        gated.join(canon, on="text_hash")
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .select("doc_id", "source", "n_tokens")
    )


def export_train_corpus_sql() -> str:
    return f"""WITH t AS (
  SELECT doc_id, source, text,
         string_split_regex(trim(text), '\\s+') AS toks,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash
  FROM documents
),
gated AS (
  SELECT doc_id, source, text_hash, len(toks) AS n_tokens
  FROM t
  WHERE len(toks) >= {EXPORT_MIN_TOKENS}
    AND round(len(list_distinct(toks)) / len(toks), 6) >= {EXPORT_MIN_DISTINCT_RATIO}
    AND round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text), 6) <= {EXPORT_MAX_PUNCT_RATIO}
    AND substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_BOUND}'
),
canon AS (SELECT text_hash, MIN(doc_id) AS canonical_id FROM t GROUP BY text_hash)
SELECT doc_id, source, n_tokens
FROM gated JOIN canon USING (text_hash)
WHERE doc_id = canonical_id"""


SPAN_K = 10  # tokens per dedup span (C4 dedupes 3-sentence spans)


def span_dedup(documents: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Cross-corpus span-level dedup (the C4 recipe adapted to
    unpunctuated text): each document is cut into NON-overlapping
    ``k``-token spans (plus a final short remainder), every span keeps
    only its globally-first occurrence (ordered by ``(doc_id,
    span_idx)``), and documents are reassembled from their surviving
    spans.  Emits per-document span counts for audit plus the cleaned
    text.

    Scale shape: explode → first-occurrence via groupBy(span hash) +
    min(struct) + equi-join (NOT a row_number window per hash — a
    mega-duplicated span would serialize one task) → per-document
    reassembly with an ordered array_sort(collect_list) aggregate.
    Three shuffles, all partial-aggregated; span text rides the shuffle
    only as (hash → span) pairs bounded by the corpus itself."""
    toks = tokens_col(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    spans = documents.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * k + 1, k)),
            )
        ).alias("pos", "span"),
    ).select(
        "doc_id",
        (F.col("pos") + 1).alias("span_idx"),
        "span",
        F.md5("span").alias("sh"),
    )
    first = spans.groupBy("sh").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("first_occ")
    )
    marked = spans.join(first, on="sh").select(
        "doc_id",
        "span_idx",
        "span",
        (
            F.struct("doc_id", "span_idx") == F.col("first_occ")
        ).alias("keep"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dup_spans"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("span_idx", "span"))
                    )
                ),
                lambda x: x["span"],
            ),
            " ",
        ).alias("clean_text"),
    )


def span_dedup_sql(k: int = SPAN_K) -> str:
    return f"""WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS span_idx,
         array_to_string(toks[(i - 1) * {k} + 1 : i * {k}], ' ') AS span
  FROM t, UNNEST(range(1, CAST(ceil(len(toks) / {k}.0) AS BIGINT) + 1)) AS u(i)
),
first AS (
  SELECT md5(span) AS sh,
         MIN(ROW(doc_id, span_idx)) AS first_occ
  FROM spans GROUP BY md5(span)
),
marked AS (
  SELECT s.doc_id, s.span_idx, s.span,
         ROW(s.doc_id, s.span_idx) = f.first_occ AS keep
  FROM spans s JOIN first f ON md5(s.span) = f.sh
)
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_spans,
       COALESCE(string_agg(CASE WHEN keep THEN span END, ' ' ORDER BY span_idx), '')
         AS clean_text
FROM marked GROUP BY doc_id"""


# Source-mixture weights for the registered example query: a
# deterministic function of the source index so the mixture is
# reproducible without configuration (real pipelines pass their own).
MIX_FRACTIONS = (1.0, 0.5, 0.25, 0.125)


def mix_weight_of(source_index: int) -> float:
    return MIX_FRACTIONS[source_index % len(MIX_FRACTIONS)]


def _hex_bound(w: float) -> str:
    """4-hex-digit keep bound for weight ``w``; weights ≥ 1 use a
    sentinel that sorts above every hex string ('g' > 'f'), since the
    5-char '10000' would compare lexicographically BELOW e.g. 'ffff'."""
    if w >= 1.0:
        return "g000"
    return format(max(0, int(w * 65536)), "04x")


def mix_sources(
    documents: DataFrame, weights: dict[str, float] | None = None, default: float = 1.0
) -> DataFrame:
    """Deterministic source-mixture subsampling: keep each document of
    source ``s`` with probability ``weights[s]`` — decided by a pure
    hash of the doc id, so the mixture is reproducible, stable under
    reruns/repartitioning, and a document's fate never depends on scan
    order (the domain-weighting step of pretraining data recipes).

    The keep test compares the first 4 hex chars of ``md5('mix:' ||
    doc_id)`` against ``floor(weight × 65536)`` in hex — a plain string
    compare in both engines, no float RNG.  Stateless projection: no
    shuffle, fully codegen."""
    if weights is None:
        weights = {
            f"src{i}": mix_weight_of(i) for i in range(20)
        }
    h = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 4
    )
    frac = F.lit(default)
    bound = F.lit(_hex_bound(default))
    for src, w in sorted(weights.items()):
        cond = F.col("source") == src
        frac = F.when(cond, F.lit(float(w))).otherwise(frac)
        bound = F.when(cond, F.lit(_hex_bound(w))).otherwise(bound)
    return (
        documents.select(
            "doc_id",
            "source",
            F.round(frac, 6).alias("target_frac"),
            h.alias("h"),
            bound.alias("bound"),
        )
        .filter(F.col("h") < F.col("bound"))
        .select("doc_id", "source", "target_frac")
    )


def mix_sources_sql(weights: dict[str, float] | None = None, default: float = 1.0) -> str:
    if weights is None:
        weights = {f"src{i}": mix_weight_of(i) for i in range(20)}
    frac_cases = " ".join(
        f"WHEN source = '{s}' THEN {float(w)}" for s, w in sorted(weights.items())
    )
    bound_cases = " ".join(
        f"WHEN source = '{s}' THEN '{_hex_bound(w)}'"
        for s, w in sorted(weights.items())
    )
    dflt = _hex_bound(default)
    return f"""SELECT doc_id, source,
       round(CAST(CASE {frac_cases} ELSE {float(default)} END AS DOUBLE), 6)
         AS target_frac
FROM documents
WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE {bound_cases} ELSE '{dflt}' END"""


SEQ_LEN = 2048  # tokens per packed training sequence
PACK_BUCKETS = 256  # prefix-sum parallelism per source


def pack_sequences(documents: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Sequence packing: lay documents end-to-end in a deterministic
    hash order per source and assign each to the training sequence
    containing its start offset (``seq_id = start_offset // seq_len``)
    — the contiguous-packing step of a pretraining data pipeline.

    Scale: the natural formulation is a running ``SUM() OVER (PARTITION
    BY source ORDER BY ...)`` — one task per source, a straggler when a
    source holds billions of docs.  Hierarchical prefix sum instead:
    the order key's first byte splits every source into
    ``PACK_BUCKETS`` ranges (the bucket IS a prefix of the order key,
    so bucket-then-hash order equals global hash order), local cumsums
    run per (source, bucket) in parallel, and the per-bucket totals —
    result-sized: sources × 256 rows — produce broadcast offsets that
    lift local to global.  Exactly the classic two-pass parallel scan,
    in three DataFrame ops."""
    toks = tokens_col(F.col("text"))
    h = F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
    base = documents.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        h.alias("h"),
    ).withColumn(
        "bucket", F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    )
    w_local = (
        Window.partitionBy("source", "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    w_off = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("source", "bucket")
        .agg(F.sum("n_tokens").alias("tot"))
        .withColumn("off", F.coalesce(F.sum("tot").over(w_off), F.lit(0)))
        .select("source", "bucket", "off")
    )
    start = F.col("local_cum") + F.col("off") - F.col("n_tokens")
    return (
        local.join(F.broadcast(offsets), on=["source", "bucket"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            start.alias("start_offset"),
            F.expr(f"(local_cum + off - n_tokens) div {int(seq_len)}").alias(
                "seq_id"
            ),
        )
    )


def pack_sequences_sql(seq_len: int = SEQ_LEN) -> str:
    return f"""WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         md5('pack:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // {int(seq_len)} AS BIGINT) AS seq_id
FROM c"""


def _doc_shingles(documents: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle-md5) pairs: SHINGLE_K-token rolling
    windows, whole-text fallback for short documents — the same shingle
    definition as ``text.fingerprints`` so the two operators agree on
    what "content overlap" means."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    win = F.transform(
        F.sequence(F.lit(1), n - (SHINGLE_K - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, SHINGLE_K))),
    )
    sh = F.when(n >= SHINGLE_K, win).otherwise(
        F.array(F.md5(F.concat_ws(" ", toks)))
    )
    return documents.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("sh")
    )


def contamination_check(documents: DataFrame) -> DataFrame:
    """Train-on-test leakage detector: for each held-out eval document
    (``doc_id % CONTAM_EVAL_MOD == 0``), how many of its distinct
    shingles also occur anywhere in the training corpus (all other
    documents).  ``n_contaminated / n_shingles`` is the contamination
    fraction; emitting the integer pair keeps the result bit-stable
    across engines.

    Scale: the corpus side collapses to DISTINCT shingles before the
    join (map-side partial agg), and the join itself is an equi-semi
    join on the shingle hash — an inverted-index probe, never a doc ×
    doc comparison.  The eval side is a small fraction by construction,
    so at 100× the probe stays eval-sized while the corpus index
    shuffles once."""
    sh = _doc_shingles(documents)
    is_eval = F.col("doc_id") % CONTAM_EVAL_MOD == 0
    ev = sh.filter(is_eval)
    corpus = sh.filter(~is_eval).select("sh").distinct()
    totals = ev.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        ev.join(corpus, on="sh", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return totals.join(hits, on="doc_id", how="left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
    )


def contamination_check_sql() -> str:
    k = SHINGLE_K
    return f"""WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
s AS (
  SELECT doc_id, unnest(list_distinct(
      CASE WHEN len(toks) >= {k}
           THEN list_transform(range(1, len(toks) - {k - 2}),
                               i -> md5(array_to_string(toks[i:i+{k - 1}], ' ')))
           ELSE [md5(array_to_string(toks, ' '))] END)) AS sh
  FROM t
),
ev AS (SELECT * FROM s WHERE doc_id % {CONTAM_EVAL_MOD} = 0),
corpus AS (SELECT DISTINCT sh FROM s WHERE doc_id % {CONTAM_EVAL_MOD} <> 0)
SELECT ev.doc_id, COUNT(*) AS n_shingles,
       COUNT(corpus.sh) AS n_contaminated
FROM ev LEFT JOIN corpus ON ev.sh = corpus.sh
GROUP BY ev.doc_id"""


# ------------------------------------------------- DSIR importance weights

DSIR_TARGET_LANG = "en"  # the "target domain" sample the raw corpus is
# reweighted toward; any predicate over the corpus works the same way
DSIR_PPB = 1_000_000_000  # fixed-point scale for the probability ratio


def dsir_weights(documents: DataFrame, target_lang: str = DSIR_TARGET_LANG) -> DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    re-expressed exactly): score each raw document by how much its
    hashed-unigram profile looks like a target-domain sample, so a
    downstream weighted/top-k selection can shift the corpus mixture
    toward the target without training a classifier.

    weight(doc) = Σ_w c_doc(w) · ratio(w), where ratio(w) is the
    add-one-smoothed target/raw probability ratio in fixed-point:

        p_t(w) = (ct_target(w)+1) / (N_target+V)       (unigram LM)
        ratio(w) = (p_t(w)·PPB) · (N_raw+V) div (ct_raw(w)+1)

    All arithmetic is positive BIGINT with explicit staged ``div`` —
    bit-identical across engines (no logs, no doubles, no
    summation-order sensitivity; the reference pipeline's log-ratio
    ordering is monotone in this ratio for per-token scores, and the
    fixed-point loses only sub-ppb resolution).

    Plan shape (scale notes): ONE scan tokenizes; a single groupBy(tok)
    computes raw and target counts together (conditional aggregation —
    the target pass is free); corpus totals broadcast as a 1-row cross
    join; the per-doc profile joins the vocab table on the token key (a
    shuffle equi-join on both sides' natural key — no driver
    materialization, vocab never collected); final per-doc sum is an
    exact integer aggregate.  Every stage is linear in tokens.
    """
    toks = documents.select(
        "doc_id",
        "lang",
        F.explode(tokens_col(F.col("text"))).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(
        F.count("*").alias("ct_r"),
        F.count_if(F.col("lang") == target_lang).alias("ct_t"),
    )
    totals = vocab.agg(
        F.sum("ct_r").alias("n_r"),
        F.sum("ct_t").alias("n_t"),
        F.count("*").alias("v"),
    )
    ratio = vocab.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.expr(
            f"(ct_t + 1) * {DSIR_PPB} div (n_t + v) * (n_r + v) div (ct_r + 1)"
        ).alias("ratio_ppb"),
    )
    cdoc = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    scores = (
        cdoc.join(ratio, on="tok")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("ratio_ppb")).alias("dsir_score"),
        )
    )
    return documents.select("doc_id", "lang", "source").join(
        scores, on="doc_id"
    ).select("doc_id", "lang", "source", "n_tokens", "dsir_score")


def dsir_weights_sql(target_lang: str = DSIR_TARGET_LANG) -> str:
    # CASTs pin DuckDB's HUGEINT-promoting sums back to BIGINT; `//` is
    # floor division = Spark's `div` on the all-positive operands here.
    return f"""WITH toks AS (
  SELECT doc_id, lang, t.tok
  FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(tok)
  WHERE t.tok <> ''
),
vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS ct_r,
         CAST(count(*) FILTER (WHERE lang = '{target_lang}') AS BIGINT) AS ct_t
  FROM toks GROUP BY tok
),
tot AS (
  SELECT CAST(sum(ct_r) AS BIGINT) AS n_r, CAST(sum(ct_t) AS BIGINT) AS n_t,
         CAST(count(*) AS BIGINT) AS v
  FROM vocab
),
ratio AS (
  SELECT tok,
         (ct_t + 1) * {DSIR_PPB} // (n_t + v) * (n_r + v) // (ct_r + 1)
           AS ratio_ppb
  FROM vocab, tot
),
cdoc AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY doc_id, tok
),
score AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(sum(c * ratio_ppb) AS BIGINT) AS dsir_score
  FROM cdoc JOIN ratio USING (tok) GROUP BY doc_id
)
SELECT d.doc_id, d.lang, d.source, s.n_tokens, s.dsir_score
FROM documents d JOIN score s ON d.doc_id = s.doc_id"""
