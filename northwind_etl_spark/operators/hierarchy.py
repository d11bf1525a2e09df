"""Hierarchy closure on Spark 4's native recursive CTE.

Spark 4 executes ``WITH RECURSIVE`` as an iterative union-loop over
the anchor + step relations (SPARK-24497), which is exactly the
DataFrame loop we would otherwise hand-write for transitive closure —
but planned by Catalyst, with the step join optimized per iteration
(broadcast when the frontier is small).  DuckDB implements the same
ANSI semantics, so the oracle can run the IDENTICAL query text — a
cross-engine check of the recursion itself, not just of a final
aggregate.

``descendant_closure`` expands an edge list (parent_key, child_key,
child_name) from a set of roots, producing one row per reachable node
with its depth and full materialized '/'-separated path.  Cycles are
the caller's responsibility (ANSI recursive CTEs do not terminate on
cyclic input; ``max_depth`` is the guard).

Scale shape: the per-iteration state is the frontier (rows added last
step) joined against the edge table on child=parent — an equi-join
Catalyst plans like any other, shuffling only the frontier when the
edge side is large.  Path strings grow with depth; for 100 TB
hierarchies keep paths as arrays of keys (cheap) and render strings
at the edge of the pipeline.

Verified: tests/test_hierarchy.py (planted 4-level tree: every node
reached exactly once, depths and paths exact, max_depth truncation)
plus the oracle-checked ``recursive_nation_hierarchy`` registry entry.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def closure_sql(
    edges_view: str,
    roots_view: str,
    *,
    max_depth: int,
) -> str:
    """The shared recursive-closure query text (identical on Spark and
    DuckDB; both implement ANSI WITH RECURSIVE union-all semantics).

    `edges_view(parent_key, child_key, child_name)` and
    `roots_view(key, name)` must already be registered/readable under
    those names in the engine running the text.
    """
    for v in (edges_view, roots_view):
        if not _IDENT.match(v):
            raise ValueError(f"view name {v!r} is not a plain identifier")
    return f"""
        WITH RECURSIVE closure(key, name, path, depth) AS (
            SELECT key, name, concat('/', name), 0
            FROM {roots_view}
            UNION ALL
            SELECT e.child_key, e.child_name,
                   concat(c.path, '/', e.child_name), c.depth + 1
            FROM closure c
            JOIN {edges_view} e ON e.parent_key = c.key
            WHERE c.depth < {int(max_depth)}
        )
        SELECT key, name, path, depth FROM closure
    """


def descendant_closure(
    spark: SparkSession,
    edges: DataFrame,
    roots: DataFrame,
    *,
    max_depth: int,
    view_prefix: str = "nes_closure",
) -> DataFrame:
    """Register the inputs and run the recursive closure natively."""
    ev, rv = f"{view_prefix}_edges", f"{view_prefix}_roots"
    edges.createOrReplaceTempView(ev)
    roots.createOrReplaceTempView(rv)
    return spark.sql(closure_sql(ev, rv, max_depth=max_depth))
