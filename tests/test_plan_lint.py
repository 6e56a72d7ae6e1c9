"""Registry-wide physical-plan lint: the scale smells that must never
appear in ANY query's plan, asserted in one sweep so a future operator
can't quietly regress to a quadratic join.

* ``CartesianProduct`` — always wrong here: every pairwise operator in
  the engine is banded/bucketed/broadcast by design.
* ``BroadcastNestedLoopJoin`` — allowed only where a tiny side is
  deliberately broadcast against a non-equi predicate (the brute-force
  cosine top-k probe: Q query vectors against the corpus, the documented
  correctness baseline). Everything else must plan hash or sort-merge
  joins on equi-keys.
"""

from __future__ import annotations

import pytest

from bigdata_hwk_spark import registry

SF = "/root/testdata/sf0.001"

# name -> reason a BroadcastNestedLoopJoin is the intended plan
BNLJ_ALLOWED = {
    "knn_cosine_topk": "Q fixed query vectors broadcast against the corpus "
                       "(correctness baseline; scale path is ann_*)",
}


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_quadratic_join_shapes(spark, name):
    plan = (
        registry.QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )
