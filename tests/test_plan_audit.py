"""Repo-wide physical-plan audit: every registry query's plan is built
(NOT executed) and scanned for scale-killers.

Red flags:
* ``CartesianProduct``  — an unconditioned join slipped in; at corpus
  scale this is O(n²) with no partitioning. Never allowed.
* ``BroadcastNestedLoopJoin`` — allowed ONLY where it is the intended
  design: the exact brute-force ANN baseline (broadcast-Q crossJoin is
  the point) and the blocked GEMM's block-pair replication join (136-row
  broadcast side, OR-predicate by construction). Anywhere else it means
  an equi-join degenerated into an every-pair scan (the round-1 ANN-LSH
  bug this suite now guards against).

The clips_* queries are excluded: constructing them runs the pipeline
(eager persist of the sha frame), which is exercised by its own tests —
this audit stays plan-only so it runs in seconds.
"""

from __future__ import annotations

import pytest

from data_quality_checker_spark import queries as registry

SF_DIR = "/root/testdata/sf0.001"

# queries whose construction executes work (pipeline persist, k-means
# fit, fixture generation) — audited by their own dedicated tests
_EXECUTES_ON_BUILD = {
    "clips_decisions_labels",
    "clips_findings_summary",
    "ann_ivf_topk",           # driver-side k-means sample/fit
    "minhash_verified_pairs",  # eager candidate persist
    "ml_recommendations",      # driver-side aggregate collect + assembly
}

# intended nested-loop designs (see module docstring), plus queries whose
# only NLJ is the scalar-subquery shape: a crossJoin against the broadcast
# of a ONE-ROW aggregate (IQR fence, grand total, last_day, branch
# counts). A 1-row broadcast side makes the "nested loop" a single pass
# over the big side — the correct plan for attaching a global scalar.
_NLJ_ALLOWED = {
    "ann_topk",
    "embed_neardup",
    "orders_profile",      # broadcast (q1, q3) fence row
    "documents_profile",   # broadcast dominant-class row
    "trend_daily",         # broadcast last_day row
    "set_ops_users",       # broadcast per-branch count rows
}


@pytest.mark.parametrize(
    "name", [n for n in registry.queries() if n not in _EXECUTES_ON_BUILD]
)
def test_no_scale_killer_joins(spark, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}:\n{plan[:1500]}"
    if name not in _NLJ_ALLOWED:
        # shape-based allowance: the auto hub-cap's 1-row broadcast
        # scalar join (condition references _cap#) is linear — the same
        # one-row-build-side scalar shape as the _NLJ_ALLOWED names
        import re

        for m in re.finditer(r"BroadcastNestedLoopJoin[^\n]*", plan):
            assert "_cap#" in m.group(0), f"{name}:\n{m.group(0)}"
