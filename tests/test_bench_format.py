"""The bench artifact contract: the driver records only the LAST
~2000 bytes of bench output, so the final JSON line must always parse
from inside that window — round 4's heavy numbers were lost to a
2.6 KB line.  Pins both the normal and the elided-degradation regime
without starting Spark."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import BENCH_QUERIES, HEAVY_QUERIES, format_result

HEAVY = HEAVY_QUERIES


def test_heavy_set_is_a_bench_subset():
    # bench.py's repeat loop silently skips names not in BENCH_QUERIES
    # (`if name not in queries ... continue`), so a rename/rotation
    # that orphans a HEAVY_QUERIES member would quietly strip its
    # min-of-2 protection — pin the subset relation
    assert HEAVY_QUERIES <= set(BENCH_QUERIES), (
        HEAVY_QUERIES - set(BENCH_QUERIES)
    )


def test_current_bench_list_fits_tail_capture():
    # worst realistic shape: every benched query present, 4-digit
    # timings, every heavy min-of-2
    timings = {n: 9999.9 for n in BENCH_QUERIES}
    runs = {n: (2 if n in HEAVY else 1) for n in BENCH_QUERIES}
    line = format_result(timings, runs, HEAVY, 0.1)
    assert len(line) <= 1800, len(line)
    d = json.loads(line)
    assert d["metric"] == "total_query_seconds"
    assert len(d["queries"]) == len(BENCH_QUERIES)
    assert sorted(d["min_of2"]) == sorted(HEAVY)
    # the churn-proof trend number: subtotal over the fixed heavy set
    assert d["heavies_subtotal"] == round(9999.9 * len(HEAVY), 1)


def test_oversized_bench_list_degrades_to_heavies_not_overflow():
    timings = {f"very_long_query_name_number_{i:03d}": 123.4 for i in range(90)}
    timings.update({n: 50.0 for n in HEAVY})
    runs = {n: 1 for n in timings}
    line = format_result(timings, runs, HEAVY, 0.1)
    assert len(line) <= 1800, len(line)
    d = json.loads(line)
    # total still covers EVERYTHING; per-query detail keeps the heavies
    assert d["value"] == round(sum(timings.values()), 1)
    assert set(d["queries"]) == HEAVY
    assert d["queries_elided"] == 90
    assert d["heavies_subtotal"] == round(50.0 * len(HEAVY), 1)


def test_repeat_order_is_cost_descending_with_top_exemption():
    """r11 verdict item 2: the min-of-2 repeat pass must order heavies
    by descending first-run cost so a bad-phase first draw on the most
    expensive heavy (the entry that most needs its second draw) is
    repeated FIRST, before cheaper heavies can spend the budget; main()
    additionally exempts index 0 from the budget check."""
    from bench import repeat_order_for

    timings = {n: float(i) for i, n in enumerate(BENCH_QUERIES)}
    # make one mid-list heavy the most expensive — it must come first
    expensive = sorted(HEAVY)[len(HEAVY) // 2]
    timings[expensive] = 99999.0
    order = repeat_order_for(timings, set(BENCH_QUERIES), HEAVY)
    assert set(order) == HEAVY  # every heavy is scheduled
    assert order[0] == expensive
    costs = [timings[n] for n in order]
    assert costs == sorted(costs, reverse=True)


def test_dropped_entries_never_include_heavies():
    """Round-10 verdict task 7: the tail-capture byte cap is paid by
    dropping ~1s entries, never a min-of-2 heavy — a heavy leaving the
    list would silently end its cross-round trend line.  The ledger
    also must not contradict the live list."""
    from bench import DROPPED_QUERIES

    assert DROPPED_QUERIES & HEAVY_QUERIES == set(), (
        DROPPED_QUERIES & HEAVY_QUERIES
    )
    assert DROPPED_QUERIES & set(BENCH_QUERIES) == set(), (
        DROPPED_QUERIES & set(BENCH_QUERIES)
    )
