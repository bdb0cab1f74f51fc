"""Capture-candidate explosion (the reference's ``CreateJoinPartners``
flatMap, ``operators/CreateJoinPartners.scala:86-147``, re-expressed
relationally per SURVEY.md §3.3).

Each triple yields ≤9 capture instances: for every projected field f
(the *join value*), one instance per unary condition on another field
and one for the binary condition on both other fields.  The emission
spec is derived from the condition-code algebra once and rendered both
to Spark (``F.inline``) and to oracle SQL — one source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfind_spark import condition_codes as cc

# triple column per field bit
_FIELD_COL = {cc.SUBJECT: "subj", cc.PREDICATE: "pred", cc.OBJECT: "obj"}


def _emission_spec() -> list[tuple[int, str, str, str | None]]:
    """[(code, join_col, v1_col, v2_col-or-None)] for all 9 valid codes."""
    out: list[tuple[int, str, str, str | None]] = []
    for proj in cc.FIELDS:
        others = [f for f in cc.FIELDS if f != proj]
        for g in others:
            out.append(
                (
                    cc.create_condition_code(g, proj),
                    _FIELD_COL[proj],
                    _FIELD_COL[g],
                    None,
                )
            )
        low, high = others  # FIELDS is bit-ascending, so low < high
        out.append(
            (
                cc.create_condition_code(low | high, proj),
                _FIELD_COL[proj],
                _FIELD_COL[low],
                _FIELD_COL[high],
            )
        )
    return out


CAPTURE_EMISSION = _emission_spec()

# '--projection' letters → projected-field bit (reference restricts which
# fields may be the *projected* side of a capture, RDFind.scala:701-702)
_PROJ_LETTER = {"s": cc.SUBJECT, "p": cc.PREDICATE, "o": cc.OBJECT}


def _spec_for(projection: str | None) -> list[tuple[int, str, str, str | None]]:
    if projection is None:
        return CAPTURE_EMISSION
    fields = {_PROJ_LETTER[ch] for ch in projection.lower()}
    return [
        e for e in CAPTURE_EMISSION if cc.secondary_condition(e[0]) in fields
    ]


def capture_candidates(triples: DataFrame, projection: str | None = None) -> DataFrame:
    """triples(subj, pred, obj) → (join_value, code, v1, v2); 9 rows per
    triple (3 per projected field kept).  Unary captures carry ``v2 =
    ''`` (empty-string discipline, see SURVEY §1.2).  ``projection``:
    subset of "spo" restricting the projected field (reference
    ``--projection``, ``programs/RDFind.scala:701-702``)."""
    structs = [
        F.struct(
            F.col(join_col).alias("join_value"),
            F.lit(code).alias("code"),
            F.col(v1_col).alias("v1"),
            (F.col(v2_col) if v2_col else F.lit("")).alias("v2"),
        )
        for code, join_col, v1_col, v2_col in _spec_for(projection)
    ]
    return triples.select(F.inline(F.array(*structs)))


def capture_candidates_sql(
    triples_rel: str = "triples", projection: str | None = None
) -> str:
    """The same 9-way emission as a SQL UNION ALL over ``triples_rel``
    (restricted like :func:`capture_candidates` when ``projection``)."""
    selects = []
    for code, join_col, v1_col, v2_col in _spec_for(projection):
        v2 = v2_col if v2_col else "''"
        selects.append(
            f"SELECT {join_col} AS join_value, {code} AS code, "
            f"{v1_col} AS v1, {v2} AS v2 FROM {triples_rel}"
        )
    return "\nUNION ALL ".join(selects)
