"""The driver samples the first 50 names from ``__spark_entry__.queries()``;
the entry module must therefore rotate ordering so never-driver-checked
catalog queries are sampled before already-green ones (VERDICT r4 #1).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from curw_mike_data_handler_spark import catalog  # noqa: E402


def _ever_checked() -> set[str]:
    seen: set[str] = set()
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        try:
            seen |= set(json.load(open(f)))
        except (OSError, ValueError):
            pass
    return seen


def test_rotation_preserves_catalog():
    q = entry.queries()
    assert set(q) == set(catalog.QUERIES)
    o = entry.oracle_sql()
    assert set(o) == set(catalog.ORACLE)


def test_never_checked_sampled_first():
    checked = _ever_checked()
    names = list(entry.queries())
    never = [n for n in names if n not in checked]
    if not never:
        return  # every query has driver signal — rotation's goal achieved
    # all never-checked names must sort before any checked name
    last_never = max(names.index(n) for n in never)
    first_checked = min(
        (names.index(n) for n in names if n in checked), default=len(names)
    )
    assert last_never < first_checked


def test_oracle_order_matches_query_order():
    q = list(entry.queries())
    o = list(entry.oracle_sql())
    assert o == [n for n in q if n in set(o)]
