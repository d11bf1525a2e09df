"""Recursive-closure proofs (operators/hierarchy.py) on a planted
4-level tree: every node reached exactly once with exact depth/path,
max_depth truncation, and view-name validation."""

from __future__ import annotations

import pytest

from northwind_etl_spark.operators.hierarchy import (
    closure_sql,
    descendant_closure,
)


@pytest.fixture(scope="module")
def tree(spark):
    #        1 root
    #       /  \
    #      2    3
    #     / \    \
    #    4   5    6
    #    |
    #    7
    edges = spark.createDataFrame(
        [
            (1, 2, "b"),
            (1, 3, "c"),
            (2, 4, "d"),
            (2, 5, "e"),
            (3, 6, "f"),
            (4, 7, "g"),
        ],
        ["parent_key", "child_key", "child_name"],
    )
    roots = spark.createDataFrame([(1, "a")], ["key", "name"])
    return edges, roots


def test_full_closure(spark, tree):
    edges, roots = tree
    got = {
        r.key: (r.name, r.path, r.depth)
        for r in descendant_closure(spark, edges, roots, max_depth=10).collect()
    }
    assert got == {
        1: ("a", "/a", 0),
        2: ("b", "/a/b", 1),
        3: ("c", "/a/c", 1),
        4: ("d", "/a/b/d", 2),
        5: ("e", "/a/b/e", 2),
        6: ("f", "/a/c/f", 2),
        7: ("g", "/a/b/d/g", 3),
    }


def test_max_depth_truncates(spark, tree):
    edges, roots = tree
    got = descendant_closure(spark, edges, roots, max_depth=1).collect()
    assert sorted(r.key for r in got) == [1, 2, 3]
    assert max(r.depth for r in got) == 1


def test_multiple_roots(spark, tree):
    edges, _ = tree
    roots = spark.createDataFrame([(2, "b"), (3, "c")], ["key", "name"])
    got = {r.key: r.path for r in descendant_closure(spark, edges, roots, max_depth=5).collect()}
    assert got == {
        2: "/b",
        3: "/c",
        4: "/b/d",
        5: "/b/e",
        6: "/c/f",
        7: "/b/d/g",
    }


def test_view_name_validation():
    with pytest.raises(ValueError):
        closure_sql("edges; DROP TABLE x", "roots", max_depth=1)
    with pytest.raises(ValueError):
        closure_sql("edges", "ro ots", max_depth=1)
