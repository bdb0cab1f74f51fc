"""DuckDB oracle SQL generators.

Every declared query in ``__spark_entry__.queries()`` has an equivalent
ANSI-SQL rendering produced here from the SAME specs the Spark plans use
(``TRIPLE_SPEC``, ``CAPTURE_EMISSION``, ``GENERALIZATION_MAP``) — one
source of truth, so the oracle genuinely checks the Spark execution, not
a second hand-written spec.
"""

from __future__ import annotations

from rdfind_spark import condition_codes as cc
from rdfind_spark.operators.captures import capture_candidates_sql
from rdfind_spark.sources.triples import triple_view_sql


def _implies_sql(dep: str = "dep", ref: str = "ref") -> str:
    """SQL predicate: {dep} capture structurally implies {ref} capture."""
    clauses = [
        f"({dep}_code = {ref}_code AND {dep}_v1 = {ref}_v1 AND {dep}_v2 = {ref}_v2)"
    ]
    for bcode, gens in cc.GENERALIZATION_MAP.items():
        for ucode, value_index in gens:
            kept = f"{dep}_v1" if value_index == 1 else f"{dep}_v2"
            clauses.append(
                f"({dep}_code = {bcode} AND {ref}_code = {ucode} AND {ref}_v1 = {kept})"
            )
    return "(" + " OR ".join(clauses) + ")"


def _gen_pairs_sql(probe_code: str, probe_v1: str, big_code: str, big_v1: str, big_v2: str) -> str:
    """SQL predicate: unary capture (probe_code, probe_v1) is a
    generalization of binary capture (big_code, big_v1, big_v2)."""
    clauses = []
    for bcode, gens in cc.GENERALIZATION_MAP.items():
        for ucode, value_index in gens:
            kept = big_v1 if value_index == 1 else big_v2
            clauses.append(
                f"({big_code} = {bcode} AND {probe_code} = {ucode} AND {probe_v1} = {kept})"
            )
    return "(" + " OR ".join(clauses) + ")"


def cind_pipeline_ctes(
    min_support: int,
    projection: str | None = None,
    triples_sql: str | None = None,
) -> str:
    """The shared CTE chain: triples → candidates → supports → overlaps.

    ``triples_sql`` overrides the TPC-H star-schema melt with any SELECT
    producing (subj, pred, obj) — used by the Zipf-skew probe to run the
    identical oracle over a synthetic RDF-shaped fixture."""
    # AS MATERIALIZED: DuckDB inlines CTEs per reference; without it the
    # 17-scan triples CTE is duplicated into every reuse of capf/cinds1
    # (hundreds of parquet scan instances -> "too many open files").
    return f"""
triples AS MATERIALIZED (
{triples_sql or triple_view_sql()}
),
cand AS (
{capture_candidates_sql('triples', projection)}
),
dcap AS MATERIALIZED (SELECT DISTINCT join_value, code, v1, v2 FROM cand),
supp AS (SELECT code, v1, v2, COUNT(*) AS support FROM dcap GROUP BY code, v1, v2),
freq AS MATERIALIZED (SELECT * FROM supp WHERE support >= {min_support}),
capf AS MATERIALIZED (
  SELECT d.join_value, d.code, d.v1, d.v2, f.support FROM dcap d
  JOIN freq f ON d.code = f.code AND d.v1 = f.v1 AND d.v2 = f.v2
),
ov AS (
  SELECT a.code AS a_code, a.v1 AS a_v1, a.v2 AS a_v2, a.support AS a_support,
         b.code AS b_code, b.v1 AS b_v1, b.v2 AS b_v2, b.support AS b_support,
         COUNT(*) AS overlap
  FROM capf a JOIN capf b ON a.join_value = b.join_value
   AND (a.code, a.v1, a.v2) < (b.code, b.v1, b.v2)
  GROUP BY a_code, a_v1, a_v2, a_support, b_code, b_v1, b_v2, b_support
  HAVING COUNT(*) >= {min_support}
),
cinds0 AS (
  SELECT a_code AS dep_code, a_v1 AS dep_v1, a_v2 AS dep_v2,
         b_code AS ref_code, b_v1 AS ref_v1, b_v2 AS ref_v2,
         a_support AS support
  FROM ov WHERE overlap = a_support
  UNION ALL
  SELECT b_code, b_v1, b_v2, a_code, a_v1, a_v2, b_support
  FROM ov WHERE overlap = b_support
),
cinds1 AS MATERIALIZED (SELECT * FROM cinds0 WHERE NOT {_implies_sql('dep', 'ref')})
""".strip()


def _ar_filter_ctes(min_support: int) -> str:
    """CTEs deriving confidence-1.0 AR-implied CIND keys and the
    AR-filtered CIND set ``cinds2`` (G17; key arithmetic per
    ``rdfind_spark.operators.rules.ar_implied_cind_keys``)."""
    from rdfind_spark.operators.rules import _BINARY_SPLIT

    directed = []
    for bcode, (low, high) in _BINARY_SPLIT.items():
        directed.append(
            f"SELECT {low} AS ante_code, {high} AS cons_code, v1 AS antecedent, "
            f"v2 AS consequent, count AS support FROM ar_counts WHERE code = {bcode}"
        )
        directed.append(
            f"SELECT {high}, {low}, v2, v1, count FROM ar_counts WHERE code = {bcode}"
        )
    directed_sql = "\nUNION ALL ".join(directed)
    return f"""ar_conds AS (
{_condition_instances_sql()}
),
ar_counts AS MATERIALIZED (
  SELECT code, v1, v2, COUNT(*) AS count FROM ar_conds GROUP BY code, v1, v2
),
ar_unary AS (SELECT code AS ante_code, v1 AS antecedent, count AS ante_count
             FROM ar_counts WHERE code IN (1, 2, 4)),
ar_directed AS (
{directed_sql}
),
ar_implied AS (
  SELECT d.ante_code + (7 - d.ante_code - d.cons_code) * 8 AS dep_code,
         d.antecedent AS dep_v1,
         d.cons_code + (7 - d.ante_code - d.cons_code) * 8 AS ref_code,
         d.consequent AS ref_v1
  FROM ar_directed d
  JOIN ar_unary u ON d.ante_code = u.ante_code AND d.antecedent = u.antecedent
  WHERE d.support >= {min_support} AND d.support / u.ante_count >= 1.0
),
cinds2 AS MATERIALIZED (
  SELECT c.* FROM cinds1 c ANTI JOIN ar_implied i
    ON c.dep_code = i.dep_code AND c.dep_v1 = i.dep_v1
   AND c.ref_code = i.ref_code AND c.ref_v1 = i.ref_v1
)"""


def cind_sql(
    min_support: int = 10,
    minimal: bool = True,
    ar: bool = False,
    projection: str | None = None,
    triples_sql: str | None = None,
) -> str:
    """Full CIND discovery as one DuckDB query (tables pre-registered as
    views named region/nation/.../lineitem).  ``ar``: apply the G17
    association-rule filter before minimality, like the reference.
    ``projection``: restrict projected fields (subset of "spo").
    ``triples_sql``: alternate (subj, pred, obj) source (skew probe)."""
    base = f"WITH {cind_pipeline_ctes(min_support, projection, triples_sql)}"
    src = "cinds1"
    if ar:
        base += ",\n" + _ar_filter_ctes(min_support)
        src = "cinds2"
    if not minimal:
        return base + f"\nSELECT * FROM {src}"
    # Minimality as equi-key anti-joins (hash-joinable; a NOT EXISTS with
    # OR disjunctions would force a quadratic nested-loop plan) — the
    # same probe/killer expansion shape as the Spark plan.
    probe_branches = []
    killer_branches = []
    for bcode, gens in cc.GENERALIZATION_MAP.items():
        for ucode, value_index in gens:
            dep_kept = "dep_v1" if value_index == 1 else "dep_v2"
            ref_kept = "ref_v1" if value_index == 1 else "ref_v2"
            probe_branches.append(
                f"SELECT *, {ucode} AS g_code, {dep_kept} AS g_v1 "
                f"FROM {src} WHERE dep_code = {bcode}"
            )
            killer_branches.append(
                f"SELECT dep_code AS k_dep_code, dep_v1 AS k_dep_v1, "
                f"dep_v2 AS k_dep_v2, {ucode} AS k_ref_code, {ref_kept} AS k_ref_v1 "
                f"FROM {src} WHERE ref_code = {bcode}"
            )
    probe_sql = "\nUNION ALL ".join(probe_branches)
    killer_sql = "\nUNION ALL ".join(killer_branches)
    return (
        base
        + f""",
dep_probe AS (
{probe_sql}
),
bad_a AS (
  SELECT p.dep_code, p.dep_v1, p.dep_v2, p.ref_code, p.ref_v1, p.ref_v2, p.support
  FROM dep_probe p JOIN {src} k
    ON k.dep_code = p.g_code AND k.dep_v1 = p.g_v1 AND k.dep_v2 = ''
   AND k.ref_code = p.ref_code AND k.ref_v1 = p.ref_v1 AND k.ref_v2 = p.ref_v2
),
ref_killers AS (
{killer_sql}
),
bad_b AS (
  SELECT c.dep_code, c.dep_v1, c.dep_v2, c.ref_code, c.ref_v1, c.ref_v2, c.support
  FROM {src} c JOIN ref_killers k
    ON c.dep_code = k.k_dep_code AND c.dep_v1 = k.k_dep_v1 AND c.dep_v2 = k.k_dep_v2
   AND c.ref_code = k.k_ref_code AND c.ref_v1 = k.k_ref_v1 AND c.ref_v2 = ''
)
SELECT * FROM {src}
EXCEPT
SELECT * FROM (SELECT * FROM bad_a UNION ALL SELECT * FROM bad_b)"""
    )


def capture_supports_sql(min_support: int = 1) -> str:
    """Per-capture support counts (A10 analogue)."""
    return f"""WITH triples AS (
{triple_view_sql()}
),
cand AS (
{capture_candidates_sql('triples')}
),
dcap AS (SELECT DISTINCT join_value, code, v1, v2 FROM cand)
SELECT code, v1, v2, COUNT(*) AS support FROM dcap GROUP BY code, v1, v2
HAVING COUNT(*) >= {min_support}"""


def capture_overlaps_sql(min_support: int = 10) -> str:
    """Frequent-capture pairwise overlap counts (A6/G2 analogue)."""
    return f"WITH {cind_pipeline_ctes(min_support)}\nSELECT * FROM ov"


# ---------------------------------------------------------------- census


def _condition_instances_sql() -> str:
    from rdfind_spark.operators.census import CONDITION_TYPES

    selects = []
    for code, v1, v2 in CONDITION_TYPES:
        v2s = v2 if v2 else "''"
        selects.append(f"SELECT {code} AS code, {v1} AS v1, {v2s} AS v2 FROM triples")
    return "\nUNION ALL ".join(selects)


def _with_triples(body: str) -> str:
    return f"WITH triples AS MATERIALIZED (\n{triple_view_sql()}\n),\n{body}"


def condition_counts_sql(min_count: int = 1) -> str:
    having = f"HAVING COUNT(*) >= {min_count}" if min_count > 1 else ""
    return _with_triples(
        f"""conds AS (
{_condition_instances_sql()}
)
SELECT code, v1, v2, COUNT(*) AS count FROM conds GROUP BY code, v1, v2 {having}"""
    )


def condition_histogram_sql() -> str:
    return _with_triples(
        f"""conds AS (
{_condition_instances_sql()}
),
counts AS (SELECT code, v1, v2, COUNT(*) AS count FROM conds GROUP BY code, v1, v2)
SELECT code, COUNT(*) AS n_conditions, CAST(SUM(count) AS BIGINT) AS n_instances
FROM counts GROUP BY code"""
    )


def count_distinct_values_sql() -> str:
    return _with_triples(
        """vals AS (
  SELECT DISTINCT value FROM (
    SELECT subj AS value FROM triples
    UNION ALL SELECT pred FROM triples
    UNION ALL SELECT obj FROM triples
  )
)
SELECT COUNT(*) AS n_distinct,
       CAST(SUM(CASE WHEN value LIKE '%:%' THEN 1 ELSE 0 END) AS BIGINT) AS n_entity,
       CAST(SUM(CASE WHEN value LIKE '%:%' THEN 0 ELSE 1 END) AS BIGINT) AS n_literal
FROM vals"""
    )


def count_triples_sql() -> str:
    return (
        f"WITH triples AS (\n{triple_view_sql()}\n)\n"
        "SELECT COUNT(*) AS n_triples, "
        "COUNT(DISTINCT (subj, pred, obj)) AS n_distinct_triples FROM triples"
    )


def join_line_histogram_sql() -> str:
    return _with_triples(
        f"""cand AS (
{capture_candidates_sql('triples')}
),
dcap AS (SELECT DISTINCT join_value, code, v1, v2 FROM cand),
lines AS (SELECT join_value, COUNT(*) AS line_size FROM dcap GROUP BY join_value)
SELECT line_size, COUNT(*) AS frequency FROM lines GROUP BY line_size"""
    )


def association_rules_sql(min_support: int = 10, min_confidence: float = 1.0) -> str:
    from rdfind_spark.operators.rules import _BINARY_SPLIT

    directed = []
    for bcode, (low, high) in _BINARY_SPLIT.items():
        directed.append(
            f"SELECT {low} AS ante_code, {high} AS cons_code, v1 AS antecedent, "
            f"v2 AS consequent, count AS support FROM counts WHERE code = {bcode}"
        )
        directed.append(
            f"SELECT {high}, {low}, v2, v1, count FROM counts WHERE code = {bcode}"
        )
    directed_sql = "\nUNION ALL ".join(directed)
    return _with_triples(
        f"""conds AS (
{_condition_instances_sql()}
),
counts AS MATERIALIZED (SELECT code, v1, v2, COUNT(*) AS count FROM conds GROUP BY code, v1, v2),
unary AS (SELECT code AS ante_code, v1 AS antecedent, count AS ante_count
          FROM counts WHERE code IN (1, 2, 4)),
directed AS (
{directed_sql}
)
SELECT d.ante_code, d.cons_code, d.antecedent, d.consequent, d.support,
       d.support / u.ante_count AS confidence
FROM directed d JOIN unary u ON d.ante_code = u.ante_code AND d.antecedent = u.antecedent
WHERE d.support >= {min_support} AND d.support / u.ante_count >= {min_confidence}"""
    )
