"""Bench harness contracts: the driver parses ONE JSON line from a
~2000-char stdout tail, and round-over-round comparability rests on a
pinned common query set (r4 verdict #7)."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
from curw_mike_data_handler_spark import catalog  # noqa: E402

# md5 of the pinned common-100 names: common_warm_total is only
# comparable across rounds if this set never changes.  New queries
# APPEND to HEADLINE; never insert into or reorder the first 100.
COMMON_100_MD5 = "2b2cae5fdc9568583984b1815bdba1d2"


def test_common_100_is_pinned():
    assert len(bench.COMMON_100) == 100
    assert (
        hashlib.md5("\n".join(bench.COMMON_100).encode()).hexdigest()
        == COMMON_100_MD5
    ), "COMMON_100 changed — common_warm_total is no longer round-comparable"
    assert list(bench.COMMON_100) == bench.HEADLINE[:100]


def test_headline_queries_all_exist():
    missing = [n for n in bench.HEADLINE if n not in catalog.QUERIES]
    assert not missing, f"bench HEADLINE names not in catalog: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate names"


def test_compact_line_fits_driver_tail_at_any_scale():
    """The driver parses the JSON line from a ~2000-char stdout tail;
    the budgeted line must stay under that for the current catalog AND
    a pathologically larger one, and must parse back losslessly."""
    import json

    payload = {
        "metric": "headline_queries_total_wall",
        "value": 123.456,
        "warm_total": 99.9,
        "common_warm_total": 66.6,
        "sf": 0.1,
        "queries": {f"query_with_a_rather_long_name_{i:04d}": i * 0.37
                    for i in range(1, 501)},
    }
    line = bench.compact_line(payload)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["common_warm_total"] == 66.6
    assert parsed["omitted"] == 500 - len(parsed["queries"])
    # slowest-first: the biggest timing must be present
    assert "query_with_a_rather_long_name_0500" in parsed["queries"]

    # the real current catalog also fits
    real = {**payload, "queries": {n: 1.0 for n in bench.HEADLINE}}
    line2 = bench.compact_line(real)
    assert len(line2) <= 1800 and json.loads(line2)["omitted"] >= 0


def test_compact_line_pins_r12_membership():
    """r12 verdict #2: every name the r12 compact line carried must
    stay in the line whenever it is in the timings dict, so the
    driver's per-query round-over-round diff can't mislabel sped-up
    queries as dropped."""
    import json

    payload = {
        "metric": "headline_queries_total_wall",
        "value": 1.0,
        "warm_total": 1.0,
        "common_warm_total": 1.0,
        "sf": 0.1,
        # pathological: every pinned query is FAST (0.01s) and 400
        # other queries are slower — slowest-first alone would evict
        # all of them
        "queries": {
            **{n: 0.01 for n in bench.PINNED_COMPACT},
            **{f"other_query_{i:04d}": 5.0 + i * 0.01 for i in range(400)},
        },
    }
    line = bench.compact_line(payload)
    assert len(line) <= 1800
    parsed = json.loads(line)
    for name in bench.PINNED_COMPACT:
        assert name in parsed["queries"], name
