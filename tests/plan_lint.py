"""Registry-wide physical-plan lint.

Round-9 generalization of the per-query plan contracts (PLANS.md):
individual operators pin their plan shapes in dedicated tests
(broadcast-only bloom probes, zero-shuffle retrieval, join-free bucket
expansion, Exchange-SinglePartition-free global ranking, …), but an
entry that never got a dedicated test had no structural guard at all.
This lint runs over EVERY windowed entry in scripts/preflight.py and
rejects the three anti-pattern classes the verdicts grade hardest:

1. `CartesianProduct` — an unconditional scale-killer.  Deliberate
   tiny-dimension cross joins compile to BroadcastNestedLoopJoin, not
   CartesianProduct, so there is no legitimate hit.
2. `BatchEvalPython` / `PythonUDF` row-at-a-time evaluation — the repo's
   declared Python surface is Arrow-batched (ArrowEvalPython,
   mapInPandas/FlatMapGroupsInPandas, applyInPandasWithState), which
   this lint allows; a row-at-a-time UDF sneaking into any entry fails.
3. An `Exchange SinglePartition` whose CHILD is not row-bounded — the
   "global window over raw rows" funnel.  A single-partition exchange
   is fine when each upstream task emits a bounded row count (partial
   aggregates, local limits/top-k, a global-agg finalizer); it is a
   100 TB bottleneck when raw data rides it.  Bounded-child node
   classes are whitelisted by NAME; anything else fails unless the
   entry appears in SINGLE_PARTITION_OK with a written justification.

Used by tests/test_plan_lint.py (including red-team cases that build a
planted CartesianProduct / raw-row global window and demand hits) and
per-entry in scripts/preflight.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Node classes (SimpleName, 'Exec' suffix stripped) whose output is
# bounded per task, so funneling them into one partition is safe at any
# input scale: partial/final aggregates emit one row per group per
# task (group cardinality is the operator's own documented bound),
# limits and top-k emit <= k, Expand sits over an aggregate in every
# rollup/cube plan, and a 1-row range boundary scan is bounded by
# construction.
_BOUNDED_CHILD = {
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "LocalLimit",
    "GlobalLimit",
    "TakeOrderedAndProject",
    "Expand",
    "WindowGroupLimit",
    "LocalTableScan",  # literal frames are driver-bounded already
}

# Entries allowed to keep a SinglePartition exchange over a child the
# class list above doesn't cover.  Every entry here needs a reason that
# names the bound; additions without one should be treated as bugs.
SINGLE_PARTITION_OK: dict[str, str] = {
    # sort-based exact Pareto frontier: the exchange carries the
    # per-x-group aggregate's distinct-x rows through a Sort node (the
    # Sort is what hides the aggregate from the child check); input is
    # bounded by |distinct x| which the operator documents as the
    # frontier's own working set.
    "order_value_skyline": "prefix-max over distinct-x aggregate rows",
    # runs test: the lag window's child is BNLJ(daily-aggregate ⋈
    # 1-row in-plan median) — the broadcast side is exactly one row
    # and the probe side emits one row per day bucket (the operator's
    # documented hypertable bound), so per-task rows into the
    # exchange are calendar-bounded regardless of order volume.
    "daily_revenue_runs_test": (
        "sign sequence = day-bounded aggregate x 1-row median broadcast"
    ),
    # largest-remainder apportionment: the global ranking window's
    # child is BNLJ(per-class hash aggregate x 1-row budget
    # broadcast) — per-task rows into the exchange are bounded by
    # |license classes| (the operator's documented working set), the
    # same shape as neyman_allocation's whitelisted strata ranking.
    "license_token_budget": (
        "remainder ranking over |classes|-bounded aggregate x 1-row budget"
    ),
    # same largest-remainder window, |sources|-bounded
    "source_temperature_budget": (
        "remainder ranking over |sources|-bounded aggregate x 1-row budget"
    ),
    # floored variant of the same window: child is BNLJ(per-class hash
    # aggregate x 1-row floor/budget spec x 1-row weight totals) —
    # per-task rows into the exchange are bounded by |classes|
    "floored_mixture_budget": (
        "remainder ranking over |classes|-bounded aggregate x two 1-row"
        " budget/floor broadcasts"
    ),
}
# (the corresponding BNLJ reviews live in tests/test_plan_lint.py's
# BNLJ_WHITELIST — both lists must name an entry for it to ship with
# a 1-row broadcast under a single-partition window)


def _walk(node, visit) -> None:
    stack = [node]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(n.initialPlan())
            continue
        visit(n, cls)
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _first_non_pass_through(node):
    """Descend through nodes that cannot increase per-task row counts
    (projections, filters, sorts) to the node that determines how many
    rows each upstream task can emit into the exchange."""
    pass_through = {"Project", "Filter", "Sort", "ColumnarToRow", "InputAdapter", "WholeStageCodegen"}
    n = node
    while True:
        cls = n.getClass().getSimpleName().removesuffix("Exec")
        if cls.startswith("WholeStageCodegen"):
            cls = "WholeStageCodegen"
        if cls not in pass_through or n.children().size() != 1:
            return n, cls
        n = n.children().apply(0)


def lint_physical_plan(df: DataFrame, name: str) -> list[str]:
    """Returns failure strings — empty means the entry's initial
    physical plan has no cartesian product, no row-at-a-time Python
    UDF, and no unbounded single-partition funnel."""
    hits: list[str] = []

    def visit(n, cls) -> None:
        base = cls.removesuffix("Exec")
        if base == "CartesianProduct":
            hits.append(f"{name}: CartesianProduct in physical plan")
        elif base == "BatchEvalPython":
            hits.append(
                f"{name}: row-at-a-time Python UDF (BatchEvalPython) — "
                "use Arrow-batched pandas_udf / mapInPandas"
            )
        elif base == "ShuffleExchange":
            if str(n.outputPartitioning()) == "SinglePartition":
                child, child_cls = _first_non_pass_through(
                    n.children().apply(0)
                )
                if (
                    child_cls not in _BOUNDED_CHILD
                    and name not in SINGLE_PARTITION_OK
                ):
                    hits.append(
                        f"{name}: Exchange SinglePartition over "
                        f"{child_cls} (unbounded per-task rows) — bound "
                        "the input (partial agg / top-k) or whitelist "
                        "with a justification"
                    )

    _walk(df._jdf.queryExecution().executedPlan(), visit)
    return hits
