"""Unit tests for scripts/audit_plans.py's structural bounded-shape
detector — the logic that separates genuine 100 TB plan hazards from
shapes that stay bounded at any input size."""

import sys

sys.path.insert(0, "/root/repo/scripts")

from audit_plans import _bounded_reason, _subtree, structurally_bounded


SCALAR_FUNNEL = """\
HashAggregate(keys=[], functions=[sum(n#5L)], output=[tot#21L])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=57]
   +- HashAggregate(keys=[], functions=[partial_sum(n#5L)], output=[sum#51L])
      +- FileScan parquet [n#5L]"""

GLOBAL_SORT = """\
Sort [k#1L ASC NULLS FIRST], false, 0
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1518]
   +- FileScan parquet [k#1L]"""

BNL_SCALAR = """\
Project [a#1L]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1L]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=66]
      +- HashAggregate(keys=[], functions=[sum(x#2L)], output=[tot#3L])
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=60]
            +- HashAggregate(keys=[], functions=[partial_sum(x#2L)], output=[s#4L])
               +- FileScan parquet [x#2L]"""

BNL_RANGE = """\
Project [a#1L]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1L]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=66]
      +- Project [cast(id#21L as int) AS pos#22]
         +- Range (0, 4, step=1, splits=8)"""

BNL_TOPK = """\
Project [a#1L]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a#1L]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=66]
      +- TakeOrderedAndProject(limit=1, orderBy=[n#38L DESC], output=[lang#35,n#38L])
         +- HashAggregate(keys=[lang#35], functions=[count(1)], output=[lang#35, n#38L])"""

BNL_TABLE = """\
Project [doc_id#305L, cookie_name#313]
+- BroadcastNestedLoopJoin BuildRight, Inner, ((host#310 = domain#312) OR EndsWith(host#310, domain#312))
   :- FileScan parquet [doc_id#305L]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=742]
      +- FileScan parquet [domain#312,cookie_name#313]"""


def test_scalar_funnel_is_bounded():
    why = structurally_bounded(SCALAR_FUNNEL, "single_partition")
    assert why and "one partial row per task" in why


def test_global_sort_stays_flagged():
    assert structurally_bounded(GLOBAL_SORT, "single_partition") is None


def test_bnl_scalar_broadcast_is_bounded():
    why = structurally_bounded(BNL_SCALAR, "bnl_join")
    assert why and "scalar aggregate" in why


def test_bnl_small_range_is_bounded():
    why = structurally_bounded(BNL_RANGE, "bnl_join")
    assert why and "Range of 4 rows" in why


def test_bnl_topk_is_bounded():
    why = structurally_bounded(BNL_TOPK, "bnl_join")
    assert why and "limit=1" in why


def test_bnl_over_real_table_stays_flagged():
    assert structurally_bounded(BNL_TABLE, "bnl_join") is None


def test_one_unbounded_occurrence_poisons_the_plan():
    # a plan with one bounded and one unbounded BNL must stay flagged
    combined = BNL_SCALAR + "\n" + BNL_TABLE
    assert structurally_bounded(combined, "bnl_join") is None


def test_subtree_extent():
    lines = BNL_SCALAR.splitlines()
    sub = _subtree(lines, 1)  # the BNL node
    assert len(sub) == 6  # everything under it
    sub2 = _subtree(lines, 2)  # the probe-side FileScan leaf
    assert sub2 == []


def test_bounded_reason_priority():
    assert _bounded_reason(["   +- LocalTableScan [a#1]"]) is not None
    assert _bounded_reason(["   +- Range (0, 99999, step=1, splits=8)"]) is None
    assert _bounded_reason(["   +- FileScan parquet [a#1]"]) is None
