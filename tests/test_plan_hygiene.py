"""Plan-hygiene meta-gate: every driver query's physical plan is free
of the scale-killer patterns that are invisible at test row counts —
a cartesian product, or a global (partition-less) window that funnels
all rows into one task. Catches regressions the row-count/value gates
cannot (they pass at sf0.001 and melt at 100 TB).
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

QUERY_NAMES = sorted(entry_mod.queries().keys())

# Window nodes whose windowspecdefinition has an empty partition list:
# "windowspecdefinition(col ASC..." (no partition exprs before the
# first ORDER BY column's sort direction) vs the partitioned form
# "windowspecdefinition(part_a, part_b, col ASC...". We detect the
# global form by a windowspecdefinition whose FIRST comma-separated
# argument already carries a sort direction.
_GLOBAL_WINDOW = re.compile(
    r"windowspecdefinition\(\s*[^,()]*\s+(ASC|DESC)\b"
)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_scale_killer_patterns(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan[:1500]}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join\n{plan[:1500]}"
    m = _GLOBAL_WINDOW.search(plan)
    assert not m, f"{name}: global (partition-less) window at: {plan[max(0, m.start()-200):m.end()+100]}"


def test_flagship_plan_hygiene(spark):
    df = entry_mod.entry(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert not _GLOBAL_WINDOW.search(plan)
