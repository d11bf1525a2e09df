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


# ---------------------------------------------------------------- literal
# arrays (r12 optimization round).  The natural PySpark spelling
# F.array(*[F.lit(x) for x in values]) costs 1-3 py4j round-trips PER
# ELEMENT at plan-build time — ~1 ms each, so a 1024-cell lookup table
# adds ~1-5 s of DRIVER latency to every query that embeds it (and the
# bench pays it once per rep; guide §1.2 counts driver time as part of
# the query).  Building the same literal as ONE parsed SQL expression
# is a single py4j call + one JVM parse (measured 0.006 s vs 4.8 s for
# the 1024-cell DECIMAL table) and produces the IDENTICAL literal
# value: string→double casts are correctly rounded (Java
# Double.parseDouble) and repr(float) round-trips, string→decimal
# casts parse the exact digits — proven equal element-wise against
# the F.lit spelling in tests/test_r13_opt.py.


def lit_double_array(values) -> Column:
    """array<double> literal in one parse; values must be finite."""
    vals = [float(v) for v in values]
    body = ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in vals)
    return F.expr(f"array({body})")


def lit_long_array(values) -> Column:
    """array<bigint> literal in one parse."""
    body = ",".join(f"{int(v)}L" for v in values)
    return F.expr(f"array({body})")


def lit_decimal_array(values, precision: int, scale: int) -> Column:
    """array<decimal(p,s)> literal in one parse.  `values` are exact
    decimal STRINGS (or Decimals); each element is CAST('…' AS
    DECIMAL(p,s)) — the very spelling the DuckDB oracles embed."""
    body = ",".join(
        f"CAST('{v}' AS DECIMAL({precision},{scale}))" for v in values
    )
    return F.expr(f"array({body})")


def lit_double_matrix_sql(rows) -> str:
    """The SQL text of an array<array<double>> literal — for callers
    that splice it into a larger hand-built SQL expression (r13: the
    PQ eval references its codebook from inside nested lambdas whose
    variable names must be explicit, so the whole expression is one
    parsed string)."""
    inner = ",".join(
        "array(" + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in row) + ")"
        for row in rows
    )
    return f"array({inner})"


def lit_double_matrix(rows) -> Column:
    """array<array<double>> literal (e.g. a frozen codebook) in one
    parse."""
    return F.expr(lit_double_matrix_sql(rows))
