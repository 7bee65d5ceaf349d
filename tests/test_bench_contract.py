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
