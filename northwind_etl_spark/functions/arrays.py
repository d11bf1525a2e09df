"""Array expression helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_pairs(arr: Column | str, a_name: str, b_name: str) -> Column:
    """All ordered pairs (arr[i], arr[j]) with i < j as an array of
    structs — the array-LOCAL pair expansion used by the candidate
    generators (fuzzy blocking, basket affinity): a pair that doesn't
    exist never materializes as a row anywhere.

    The input array must already be sorted/deduped to the caller's
    pair semantics; the expression itself is order-preserving.  The
    1-based `element_at`/`slice` index arithmetic lives here ONCE so
    call sites cannot drift.  (dedup.py/ranges.py carry older inline
    twins fused into larger bucket expressions; new call sites should
    use this helper.)
    """
    col = F.col(arr) if isinstance(arr, str) else arr
    n = F.size(col)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(col, i + 1, n - i),
                lambda y: F.struct(
                    F.element_at(col, i).alias(a_name), y.alias(b_name)
                ),
            ),
        )
    )
