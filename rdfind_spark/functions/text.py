"""Text-analysis operators over the ``documents`` table: token
counting, quality scoring, language identification, document
fingerprinting.

Design: everything is built-in column expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs in the hot path.  Each query has
a DuckDB-SQL rendering generated from the SAME constants (stopword and
marker lists, shingle width), so the driver oracle checks the Spark
plan, not a re-specification.

Hash discipline: only ``md5`` is used for content hashing because it is
bit-identical across Spark and DuckDB (``xxhash64``/``hash`` are
engine-specific).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ constants

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")

# language marker words for the n-gram/marker language-ID heuristic;
# tie-break priority = tuple order.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "and", "of", "fast", "slow")),
    ("fr", ("le", "la", "et", "de", "est", "avec")),
    ("de", ("der", "die", "und", "ist", "mit", "nicht")),
    ("es", ("el", "la", "y", "de", "es", "con")),
    ("zh", ("de5", "shi4", "he2", "zai4", "le5", "you3")),
)

SHINGLE_K = 5  # tokens per fingerprint shingle

_BPE_RE = r"\w+|[^\w\s]"


# ------------------------------------------------------------- builders


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document token census: whitespace tokens, BPE-ish regex
    tokens (word pieces + punctuation singletons), character count."""
    toks = tokens_col(F.col("text"))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def token_stats_sql() -> str:
    return """SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens,
       length(text) AS n_chars,
       len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_tokens
FROM documents"""


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals: stopword ratio, punctuation ratio,
    distinct-token ratio, mean token length — the standard cheap
    filters of web-scale corpus cleaning.  Ratios are rounded to 6
    decimals so threshold comparisons are stable across engines."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    return documents.select(
        "doc_id",
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(n_punct / F.length("text"), 6).alias("punct_ratio"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("distinct_ratio"),
        F.round((F.length("text") - n + 1) / n, 6).alias("mean_token_len"),
    )


def quality_scores_sql() -> str:
    stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents
)
SELECT doc_id,
       round(len(list_filter(toks, x -> x IN ({stoplist}))) / len(toks), 6) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text), 6) AS punct_ratio,
       round(len(list_distinct(toks)) / len(toks), 6) AS distinct_ratio,
       round((length(text) - len(toks) + 1) / len(toks), 6) AS mean_token_len
FROM t"""


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language identification: score each language by its
    marker hits, pick the best (ties resolved by LANG_MARKERS order).
    A real pipeline swaps the marker lists for character-n-gram
    profiles; the operator shape (pure column expressions, no UDF) is
    the point."""
    toks = tokens_col(F.col("text"))
    scores = []
    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(
                f"s_{lang}"
            )
        )
    scored = documents.select("doc_id", "lang", *scores)
    best = F.greatest(*[F.col(f"s_{lang}") for lang, _ in LANG_MARKERS])
    pick = None
    for lang, _ in reversed(LANG_MARKERS):
        cond = F.col(f"s_{lang}") == best
        pick = F.when(cond, F.lit(lang)) if pick is None else F.when(
            cond, F.lit(lang)
        ).otherwise(pick)
    # reversed + overwrite order makes the FIRST list entry win ties
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pick.alias("detected_lang"),
        best.alias("marker_hits"),
    )


def lang_id_sql() -> str:
    score_exprs = []
    for lang, markers in LANG_MARKERS:
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(toks, x -> x IN ({lst}))) AS s_{lang}"
        )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang, _ in LANG_MARKERS) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang, _ in LANG_MARKERS
    ) + " END"
    return f"""WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
s AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM t)
SELECT doc_id, lang AS labeled_lang, {case} AS detected_lang,
       {best} AS marker_hits
FROM s"""


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_LONGNUM_RE = r"\d{7,}"


def redact_text(documents: DataFrame) -> DataFrame:
    """PII-style redaction for training corpora: emails → ``<EMAIL>``,
    URLs → ``<URL>``, long digit runs (ids/phones) → ``<NUM>``, plus
    per-document match counts for audit.  Pure column expressions; the
    regexes are RE2/Java-compatible so the oracle runs them verbatim."""
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _URL_RE,
            "<URL>",
        ),
        _LONGNUM_RE,
        "<NUM>",
    )
    return documents.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_URL_RE), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_LONGNUM_RE), 0)).alias(
            "n_longnums"
        ),
    )


def redact_text_sql() -> str:
    return f"""SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_URL_RE}', '<URL>', 'g'),
           '{_LONGNUM_RE}', '<NUM>', 'g') AS clean_text,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_URL_RE}')) AS n_urls,
       len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS n_longnums
FROM documents"""


def fingerprints(documents: DataFrame) -> DataFrame:
    """Rolling-shingle document fingerprint: md5 of every SHINGLE_K-token
    window, keep the minimum (a 1-hash MinHash) — the standard cheap
    content fingerprint for fuzzy dedup.  Documents shorter than one
    shingle fall back to the md5 of the whole normalized text."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    win_hashes = F.transform(
        F.sequence(F.lit(1), n - (SHINGLE_K - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, SHINGLE_K))),
    )
    fp = F.when(n >= SHINGLE_K, F.array_min(win_hashes)).otherwise(
        F.md5(F.concat_ws(" ", toks))
    )
    return documents.select("doc_id", fp.alias("fingerprint"))


TFIDF_TOP_K = 5


def tfidf_keywords(documents: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k keywords by TF-IDF over the corpus.

    Classic two-aggregate shape: explode tokens → term frequency per
    (doc, term) [one shuffle, partial-aggregated], document frequency
    per term [second shuffle, term-sized], idf = ln(N/df) attached by a
    broadcast join (the term dictionary is vocabulary-sized, orders of
    magnitude below the corpus).  Ranking happens on the ROUNDED score
    (6 decimals) with term tie-break, so cross-engine ULP drift in
    ``ln`` cannot flip ranks.  Stopwords and bare punctuation are
    excluded from keyword candidacy."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.filter(
        tokens_col(F.lower(F.col("text"))),
        lambda t: ~F.array_contains(stop_arr, t) & t.rlike("[a-z0-9]"),
    )
    n_docs = documents.count()
    tf = (
        documents.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), on="term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "pos")
    )


def tfidf_keywords_sql(k: int = TFIDF_TOP_K) -> str:
    stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(term)
  WHERE t.term NOT IN ({stoplist}) AND regexp_matches(t.term, '[a-z0-9]')
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln((SELECT COUNT(*) FROM documents) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                     ORDER BY tfidf DESC, term ASC) AS INT) AS pos
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, pos FROM ranked WHERE pos <= {k}"""


# Gopher/C4-style corpus filter thresholds (compared on ROUNDED ratios
# so Spark and the oracle take the same branch at the boundary).
QF_MIN_TOKENS = 5
QF_MAX_TOKENS = 100_000
QF_MIN_MEAN_TOKEN_LEN = 2.0
QF_MAX_MEAN_TOKEN_LEN = 12.0
QF_MAX_PUNCT_RATIO = 0.3
QF_MIN_DISTINCT_RATIO = 0.2
QF_MAX_TOP_TOKEN_RATIO = 0.2


def quality_filter(documents: DataFrame) -> DataFrame:
    """Combined rule-based corpus filter (the Gopher/C4 recipe shape):
    each document gets every signal, a per-rule verdict, and the final
    ``keep`` bit with a compact reason string for audit — the decision
    operator a cleaning pipeline runs before training-data export.

    The repetition signal (most-common-token share) is computed by
    explode + two aggregations, NOT a per-row O(tokens × distinct)
    array expression — at corpus scale the shuffle is per-(doc, term)
    with map-side combine, which is the plan that survives 100×."""
    toks = tokens_col(F.lower(F.col("text")))
    n = F.size(toks)
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    top_tok = (
        documents.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_token_count"))
    )
    sig = documents.join(top_tok, on="doc_id").select(
        "doc_id",
        n.alias("n_tokens"),
        F.round((F.length("text") - n + 1) / n, 6).alias("mean_token_len"),
        F.round(n_punct / F.length("text"), 6).alias("punct_ratio"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("distinct_ratio"),
        F.round(F.col("top_token_count") / n, 6).alias("top_token_ratio"),
    )
    rules = [
        ("too_short", F.col("n_tokens") < QF_MIN_TOKENS),
        ("too_long", F.col("n_tokens") > QF_MAX_TOKENS),
        ("bad_token_len", (F.col("mean_token_len") < QF_MIN_MEAN_TOKEN_LEN)
         | (F.col("mean_token_len") > QF_MAX_MEAN_TOKEN_LEN)),
        ("too_much_punct", F.col("punct_ratio") > QF_MAX_PUNCT_RATIO),
        ("repetitive", (F.col("distinct_ratio") < QF_MIN_DISTINCT_RATIO)
         | (F.col("top_token_ratio") > QF_MAX_TOP_TOKEN_RATIO)),
    ]
    fails = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    return sig.select(
        "*",
        fails.alias("fail_reasons"),
        (fails == "").alias("keep"),
    )


def quality_filter_sql() -> str:
    return f"""WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
top_tok AS (
  SELECT doc_id, MAX(c) AS top_token_count FROM (
    SELECT doc_id, term, COUNT(*) AS c
    FROM t, UNNEST(toks) AS u(term) GROUP BY doc_id, term
  ) GROUP BY doc_id
),
sig AS (
  SELECT t.doc_id,
         len(toks) AS n_tokens,
         round((length(text) - len(toks) + 1) / len(toks), 6) AS mean_token_len,
         round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text), 6) AS punct_ratio,
         round(len(list_distinct(toks)) / len(toks), 6) AS distinct_ratio,
         round(top_token_count / len(toks), 6) AS top_token_ratio
  FROM t JOIN top_tok ON t.doc_id = top_tok.doc_id
),
flagged AS (
  SELECT *, concat_ws(',',
    CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short' END,
    CASE WHEN n_tokens > {QF_MAX_TOKENS} THEN 'too_long' END,
    CASE WHEN mean_token_len < {QF_MIN_MEAN_TOKEN_LEN}
           OR mean_token_len > {QF_MAX_MEAN_TOKEN_LEN} THEN 'bad_token_len' END,
    CASE WHEN punct_ratio > {QF_MAX_PUNCT_RATIO} THEN 'too_much_punct' END,
    CASE WHEN distinct_ratio < {QF_MIN_DISTINCT_RATIO}
           OR top_token_ratio > {QF_MAX_TOP_TOKEN_RATIO} THEN 'repetitive' END
  ) AS fail_reasons
  FROM sig
)
SELECT doc_id, n_tokens, mean_token_len, punct_ratio, distinct_ratio,
       top_token_ratio, fail_reasons, fail_reasons = '' AS keep
FROM flagged"""


def fingerprints_sql() -> str:
    k = SHINGLE_K
    return f"""WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
)
SELECT doc_id,
       CASE WHEN len(toks) >= {k}
            THEN list_min(list_transform(range(1, len(toks) - {k - 2}),
                          i -> md5(array_to_string(toks[i:i+{k - 1}], ' '))))
            ELSE md5(array_to_string(toks, ' '))
       END AS fingerprint
FROM t"""


# ------------------------------------------ repetition (Gopher-style)

# Discard bars, in parts-per-million of n-gram slots (integer-exact
# arithmetic in both engines — truncating division, no floats).  The
# Gopher rules (Rae et al. 2021, arXiv:2112.11446 table A1) bound the
# fraction of content covered by the single most frequent 2-gram (0.20
# there) and by duplicated longer n-grams; documents above either bar
# are boilerplate / template spam and poison LM training.  Bars here
# are tightened to this corpus's short word-salad documents (top-2gram
# share tops out at ~17%, duplicated trigrams at ~14%) so the keep bit
# actually discriminates instead of passing everything.
REP_MAX_TOP2GRAM_PPM = 100_000  # top word-bigram covers > 10% of slots
REP_MAX_DUP3GRAM_PPM = 50_000  # > 5% of trigram slots are repeats


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Per-document repetition census: the most frequent word-bigram's
    share of bigram slots and the share of trigram slots occupied by
    repeated trigrams (both in ppm, truncating-integer exact), plus the
    Gopher-style keep bit.

    Plan shape: one n-gram explode per arity → per-(doc, gram) count
    with map-side combine (repeats compress before the shuffle) →
    per-doc max/sum — two keyed aggregations joined back on doc_id,
    all linear in corpus size; no windows, no driver collects."""
    toks = tokens_col(F.col("text"))
    base = documents.select("doc_id", toks.alias("t"))

    def _gram_stats(n: int, out: list) -> DataFrame:
        grams = F.expr(
            f"transform(sequence(0, size(t) - {n}), "
            f"i -> concat_ws(' ', slice(t, i + 1, {n})))"
        )
        counts = (
            base.filter(F.size("t") >= n)
            .select("doc_id", F.explode(grams).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
        )
        return counts.groupBy("doc_id").agg(
            *[
                F.max("c").alias(o)
                if o.startswith("top")
                else F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(o)
                if o.startswith("dup")
                else F.sum("c").alias(o)
                for o in out
            ]
        )

    bi = _gram_stats(2, ["top_bi", "n_bi"])
    tri = _gram_stats(3, ["dup_tri", "n_tri"])
    ppm = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.expr(f"({num} * 1000000) div {den}")
    ).otherwise(F.lit(0))
    return (
        documents.select("doc_id", F.size(toks).alias("n_tokens"))
        .join(bi, on="doc_id", how="left")
        .join(tri, on="doc_id", how="left")
        .na.fill(0, ["top_bi", "n_bi", "dup_tri", "n_tri"])
        .select(
            "doc_id",
            "n_tokens",
            ppm("top_bi", "n_bi").alias("top2gram_ppm"),
            ppm("dup_tri", "n_tri").alias("dup3gram_ppm"),
        )
        .withColumn(
            "keep",
            (F.col("top2gram_ppm") <= REP_MAX_TOP2GRAM_PPM)
            & (F.col("dup3gram_ppm") <= REP_MAX_DUP3GRAM_PPM),
        )
    )


def repetition_stats_sql() -> str:
    def gram_cte(n: int) -> str:
        gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
        return f"""(
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, {gram} AS g
    FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {n - 1})) AS i
          FROM t WHERE len(toks) >= {n})
  ) GROUP BY doc_id, g
)"""

    return f"""WITH t AS (
  SELECT doc_id, string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
bi AS (
  SELECT doc_id, MAX(c) AS top_bi, CAST(SUM(c) AS BIGINT) AS n_bi
  FROM {gram_cte(2)} GROUP BY doc_id
),
tri AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tri,
         CAST(SUM(c) AS BIGINT) AS n_tri
  FROM {gram_cte(3)} GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
       CASE WHEN COALESCE(n_bi, 0) > 0
            THEN (COALESCE(top_bi, 0) * 1000000) // n_bi ELSE 0 END AS top2gram_ppm,
       CASE WHEN COALESCE(n_tri, 0) > 0
            THEN (COALESCE(dup_tri, 0) * 1000000) // n_tri ELSE 0 END AS dup3gram_ppm,
       (CASE WHEN COALESCE(n_bi, 0) > 0
             THEN (COALESCE(top_bi, 0) * 1000000) // n_bi ELSE 0 END)
         <= {REP_MAX_TOP2GRAM_PPM}
       AND (CASE WHEN COALESCE(n_tri, 0) > 0
                 THEN (COALESCE(dup_tri, 0) * 1000000) // n_tri ELSE 0 END)
         <= {REP_MAX_DUP3GRAM_PPM} AS keep
FROM t
LEFT JOIN bi ON bi.doc_id = t.doc_id
LEFT JOIN tri ON tri.doc_id = t.doc_id"""


# --- feature hashing (the hashing trick) -----------------------------------

FEATURE_HASH_DIM = 1024


def feature_hashing(
    documents: DataFrame, dim: int = FEATURE_HASH_DIM
) -> DataFrame:
    """Signed hashing-trick featurizer (Weinberger et al., ICML 2009
    "Feature Hashing for Large Scale Multitask Learning"): each
    document's lower-cased whitespace tokens hash into a fixed
    ``dim``-dimensional sparse vector — feature_id = first 8 md5 hex
    digits mod dim, sign = the 9th digit's high bit — and term
    frequencies accumulate WITH the sign, which is what makes the
    hashed inner product an unbiased estimator of the original
    (collisions cancel in expectation instead of inflating).  This is
    the vectorizer a DSIR-style importance sampler or a linear quality
    classifier runs at corpus scale: no vocabulary build, no
    dictionary broadcast, memory-bounded by construction.

    Output: (doc_id, feature_id, weight) — the sparse COO features,
    exact integers (md5 is bit-identical in Spark and DuckDB; the hex
    fold is the same ``conv``/``::BIGINT`` value both sides).
    Exact-zero weights (equal-mass sign collisions) are dropped: the
    canonical sparse form carries no explicit zeros.

    Scale shape: one explode + one map-side-combined groupBy on
    (doc_id, feature_id) — no join anywhere, no skew (md5 spreads the
    key space), output bounded by min(doc tokens, dim) rows per doc."""
    tf = (
        documents.select(
            "doc_id",
            F.explode(tokens_col(F.lower(F.col("text")))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    h = F.md5(F.col("tok"))
    fid = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim).alias(
        "feature_id"
    )
    signed = F.when(
        F.substring(h, 9, 1).isin(*list("01234567")), F.col("tf")
    ).otherwise(-F.col("tf"))
    return (
        tf.select("doc_id", fid, signed.alias("w"))
        .groupBy("doc_id", "feature_id")
        .agg(F.sum("w").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def feature_hashing_sql(dim: int = FEATURE_HASH_DIM) -> str:
    return f"""WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents)
  GROUP BY 1, 2
),
signed AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % {dim} AS feature_id,
         CASE WHEN substr(md5(tok), 9, 1) IN
                   ('0','1','2','3','4','5','6','7')
              THEN tf ELSE -tf END AS w
  FROM tf
)
SELECT doc_id, feature_id, CAST(SUM(w) AS BIGINT) AS weight
FROM signed GROUP BY 1, 2 HAVING SUM(w) <> 0"""
