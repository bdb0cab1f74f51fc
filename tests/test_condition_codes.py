"""Pins the condition-code bit algebra to the reference's unit-test
vectors (FIXTURES.md §1; reference ConditionCodes$Test.scala:10-34)."""

from __future__ import annotations

import pytest

from rdfind_spark import condition_codes as cc

# Ground truth from the reference unit test.
VALID_UNARY = {10, 12, 17, 20, 33, 34}
VALID_BINARY = {14, 21, 35}
UNARY_CLASSIFICATION = {9, 10, 12, 17, 18, 20, 33, 34, 36}
BINARY_CLASSIFICATION = {11, 13, 14, 19, 21, 22, 35, 37, 38}


def test_valid_codes_exhaustive():
    valid = {c for c in range(256) if cc.is_valid_code(c)}
    assert valid == VALID_UNARY | VALID_BINARY


def test_valid_code_sets():
    assert cc.VALID_UNARY_CODES == VALID_UNARY
    assert cc.VALID_BINARY_CODES == VALID_BINARY


def test_unary_binary_classification():
    for code in UNARY_CLASSIFICATION:
        assert cc.is_unary_condition(code), code
        assert not cc.is_binary_condition(code), code
    for code in BINARY_CLASSIFICATION:
        assert cc.is_binary_condition(code), code
        assert not cc.is_unary_condition(code), code


def test_create_and_extract():
    code = cc.create_condition_code(cc.PREDICATE, cc.SUBJECT)
    assert code == 10
    assert cc.primary_conditions(code) == cc.PREDICATE
    assert cc.secondary_condition(code) == cc.SUBJECT


def test_all_capture_codes_for_primary():
    assert set(cc.all_capture_codes_for_primary(cc.PREDICATE)) == {10, 34}
    assert set(cc.all_capture_codes_for_primary(cc.SUBJECT | cc.OBJECT)) == {21}


def test_generalizations():
    assert cc.generalizations(14) == [(10, 1), (12, 2)]  # s[p,o] -> s[p], s[o]
    assert cc.generalizations(21) == [(17, 1), (20, 2)]  # p[s,o] -> p[s], p[o]
    assert cc.generalizations(35) == [(33, 1), (34, 2)]  # o[s,p] -> o[s], o[p]
    assert cc.generalizations(10) == []


def test_subcode():
    assert cc.is_subcode(10, 14)
    assert cc.is_subcode(12, 14)
    assert not cc.is_subcode(14, 10)
    assert not cc.is_subcode(10, 12)


@pytest.mark.parametrize(
    "dep,ref,expected",
    [
        ((14, "a", "b"), (10, "a", ""), True),  # s[p=a,o=b] ⊆ s[p=a]
        ((14, "a", "b"), (12, "b", ""), True),  # s[p=a,o=b] ⊆ s[o=b]
        ((14, "a", "b"), (12, "a", ""), False),  # wrong value
        ((14, "a", "b"), (10, "b", ""), False),
        ((10, "a", ""), (14, "a", "b"), False),  # refinement never implied
        ((10, "a", ""), (10, "a", ""), True),  # identical
        ((10, "a", ""), (34, "a", ""), False),  # different projection
        ((35, "x", "y"), (34, "y", ""), True),  # o[s=x,p=y] ⊆ o[p=y]
    ],
)
def test_capture_implies(dep, ref, expected):
    assert cc.capture_implies(*dep, *ref) is expected


def test_format():
    assert cc.format_capture(10, "v") == "s[p=v]"
    assert cc.format_capture(14, "a", "b") == "s[p=a, o=b]"
    assert cc.format_capture(21, "a", "b") == "p[s=a, o=b]"
    assert (
        cc.format_cind(14, "a", "b", 10, "a", "", 7)
        == "s[p=a, o=b] < s[p=a] (support=7)"
    )
