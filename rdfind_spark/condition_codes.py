"""Condition-code bit algebra for captures over RDF triples.

A *capture* is a projection+selection query over triples, e.g. ``s[p=v]``
("subjects of triples whose predicate is v").  It is encoded in a 6-bit
integer *condition code*:

* bits 0-2 — the *primary* conditions (the filtered fields): s=1, p=2, o=4
* bits 3-5 — the *secondary* condition (the projected field), same field
  order shifted left by 3: s=8, p=16, o=32

Validity: exactly 1-2 primary bits, exactly 1 secondary bit, and the
primary and secondary fields are disjoint.  The nine valid codes are

    unary  : 10 s[p] | 12 s[o] | 17 p[s] | 20 p[o] | 33 o[s] | 34 o[p]
    binary : 14 s[p,o] | 21 p[s,o] | 35 o[s,p]

Semantics reference (NOT copied — reimplemented from observed behavior):
``/root/reference/rdfind-algorithm/src/main/scala/de/hpi/isg/sodap/rdfind/util/ConditionCodes.scala``
with test vectors pinned by
``rdfind-algorithm/src/test/scala/.../ConditionCodes$Test.scala:10-34``.

For binary captures, condition value1 belongs to the *lower* primary bit's
field and value2 to the higher one (matches the reference's field order
s < p < o).

Everything here is pure Python so it can be used both driver-side and
inside Spark column expressions / oracle SQL generation.
"""

from __future__ import annotations

SUBJECT = 1
PREDICATE = 2
OBJECT = 4

PRIMARY_MASK = 0b000111
SECONDARY_MASK = 0b111000
SECONDARY_SHIFT = 3

FIELD_NAMES = {SUBJECT: "s", PREDICATE: "p", OBJECT: "o"}
FIELDS = (SUBJECT, PREDICATE, OBJECT)


def create_condition_code(primary: int, secondary: int) -> int:
    """Combine primary condition field bits and a projected field bit."""
    return (primary & PRIMARY_MASK) | ((secondary & PRIMARY_MASK) << SECONDARY_SHIFT)


def primary_conditions(code: int) -> int:
    """The filtered-field bits of a code (bits 0-2)."""
    return code & PRIMARY_MASK


def secondary_condition(code: int) -> int:
    """The projected-field bit of a code, unshifted to field space (1/2/4)."""
    return (code & SECONDARY_MASK) >> SECONDARY_SHIFT


def merge_codes(a: int, b: int) -> int:
    return a | b


def is_subcode(a: int, b: int) -> bool:
    """True when code ``a``'s bits are a subset of ``b``'s.

    For valid codes with equal secondary this means a's conditions are a
    subset of b's: the capture b selects a subset of the rows of a.
    """
    return (a & b) == a


def bit_count(x: int) -> int:
    return bin(x & 0xFFFFFFFF).count("1")


def lowest_one_bit(x: int) -> int:
    return x & -x


def is_unary_condition(code: int) -> bool:
    return bit_count(primary_conditions(code)) == 1


def is_binary_condition(code: int) -> bool:
    return bit_count(primary_conditions(code)) == 2


def is_valid_code(code: int) -> bool:
    """1-2 primary bits, exactly one secondary bit, disjoint fields."""
    prim = primary_conditions(code)
    sec = secondary_condition(code)
    if code != create_condition_code(prim, sec):  # stray bits above bit 5
        return False
    n_prim = bit_count(prim)
    return 1 <= n_prim <= 2 and bit_count(sec) == 1 and (prim & sec) == 0


def possible_secondary_fields(primary: int) -> int:
    """Field bits usable as projection for a given primary condition set
    (the complement of the condition fields)."""
    return PRIMARY_MASK & ~primary


def all_capture_codes_for_primary(primary: int) -> list[int]:
    """All valid capture codes with the given primary condition fields."""
    out = []
    rem = possible_secondary_fields(primary)
    while rem:
        bit = lowest_one_bit(rem)
        out.append(create_condition_code(primary, bit))
        rem &= rem - 1
    return out


VALID_UNARY_CODES = frozenset(
    c for c in range(64) if is_valid_code(c) and is_unary_condition(c)
)
VALID_BINARY_CODES = frozenset(
    c for c in range(64) if is_valid_code(c) and is_binary_condition(c)
)
VALID_CODES = VALID_UNARY_CODES | VALID_BINARY_CODES


def generalizations(code: int) -> list[tuple[int, int]]:
    """For a binary capture code, the two unary generalization codes.

    Returns ``[(unary_code, value_index), ...]`` where ``value_index`` is
    1 if the unary condition keeps the binary capture's value1 (the lower
    primary bit's value) and 2 if it keeps value2.  A binary capture is a
    subset of each of its generalizations: s[p=a,o=b] ⊆ s[p=a].
    """
    if not is_binary_condition(code):
        return []
    prim = primary_conditions(code)
    sec = secondary_condition(code)
    low = lowest_one_bit(prim)
    high = prim & ~low
    return [
        (create_condition_code(low, sec), 1),
        (create_condition_code(high, sec), 2),
    ]


# Static lattice map used by both the Spark plan and the DuckDB oracle SQL:
# binary code -> [(unary generalization code, which value it keeps), ...]
GENERALIZATION_MAP = {c: generalizations(c) for c in sorted(VALID_BINARY_CODES)}


def capture_implies(
    dep_code: int,
    dep_v1: str,
    dep_v2: str,
    ref_code: int,
    ref_v1: str,
    ref_v2: str,
) -> bool:
    """True when dep ⊆ ref holds *structurally* (a trivial CIND).

    That is the case when ref's conditions are a subset of dep's
    conditions (same projection, matching values): e.g.
    s[p=a,o=b] ⊆ s[p=a].  Equal captures also imply each other.
    """
    if not is_subcode(ref_code, dep_code):
        return False
    if ref_code == dep_code:
        return ref_v1 == dep_v1 and (ref_v2 or "") == (dep_v2 or "")
    # ref is a strict unary generalization of a binary dep
    for gen_code, value_index in generalizations(dep_code):
        if gen_code == ref_code:
            kept = dep_v1 if value_index == 1 else dep_v2
            return ref_v1 == kept
    return False


def format_capture(code: int, v1: str, v2: str | None = None) -> str:
    """Pretty-print a capture like ``s[p=v1, o=v2]``."""
    proj = FIELD_NAMES[secondary_condition(code)]
    prim = primary_conditions(code)
    parts = []
    values = [v1, v2]
    i = 0
    for field in FIELDS:
        if prim & field:
            parts.append(f"{FIELD_NAMES[field]}={values[i]}")
            i += 1
    return f"{proj}[{', '.join(parts)}]"


def format_cind(
    dep_code: int,
    dep_v1: str,
    dep_v2: str,
    ref_code: int,
    ref_v1: str,
    ref_v2: str,
    support: int | None = None,
) -> str:
    s = f"{format_capture(dep_code, dep_v1, dep_v2)} < {format_capture(ref_code, ref_v1, ref_v2)}"
    if support is not None:
        s += f" (support={support})"
    return s
