"""Registry-order discipline (round-4 verdict #1, frozen round 5).

The driver's correctness harness checks exactly the FIRST 50 entries
of ``__spark_entry__.queries()``.  These tests pin the contract so a
future session cannot silently displace the drain order again:

- positions 1-50 are q51-q100 ascending (the oldest block that has
  never had a driver row);
- everything behind follows the deterministic drain order
  (q101-q413 ascending, then q01-q50, then q414+);
- new queries (q465+) sort into the tail BY NUMBER — the head is
  structurally unreachable for them;
- retired slots (q380, q453) are absent from the registry but their
  functions and oracles remain importable (still regression-tested).
"""

from __future__ import annotations

import re


def _qnum(name: str) -> int:
    return int(re.match(r"q(\d+)", name).group(1))


def test_head_50_is_oldest_unchecked_block():
    from watermark_remove_spark.queries import ORACLES, QUERIES

    names = list(QUERIES)
    head = names[:50]
    assert [_qnum(n) for n in head] == list(range(51, 101))
    # ORACLES iterates in the same order (the driver zips them)
    assert list(ORACLES) == [n for n in names if n in ORACLES]


def test_tail_follows_drain_order():
    from watermark_remove_spark.queries import QUERIES

    nums = [_qnum(n) for n in list(QUERIES)[50:]]
    drain = [x for x in nums if 101 <= x <= 413]
    green_old = [x for x in nums if x <= 50]
    green_new = [x for x in nums if x >= 414]
    # three contiguous, internally ascending segments in this order
    assert nums == drain + green_old + green_new
    assert drain == sorted(drain) and green_old == sorted(green_old)
    assert green_new == sorted(green_new)


def test_new_entries_cannot_reach_the_head():
    from watermark_remove_spark.queries._registry import _registry_order

    names = [f"q{i:d}_x" for i in range(51, 101)] + ["q465_new", "q999_new"]
    order = _registry_order(names)
    assert order[:50] == sorted(names[:50], key=_qnum)
    assert order[-2:] == ["q465_new", "q999_new"]


def test_retired_slots_absent_but_functions_remain():
    from watermark_remove_spark.queries import (
        ORACLES,
        QUERIES,
        q380_watermark_sizing_advisor,  # noqa: F401 — importable
        q453_sortedness_runs_audit,  # noqa: F401 — importable
    )
    from watermark_remove_spark.queries._registry import RETIRED

    assert RETIRED == {
        "q380_watermark_sizing_advisor",
        "q453_sortedness_runs_audit",
    }
    for name in RETIRED:
        assert name not in QUERIES and name not in ORACLES
