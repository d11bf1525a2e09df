"""Local replica of the driver's DuckDB cross-check: run a Spark query
and its oracle SQL on the same parquet, compare row count, column names,
and order-insensitive values.  Used by tests/test_oracle_parity.py so
parity breaks surface locally before the driver sees them.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# Types the driver's canonicalizer is known to hash identically to the
# Spark side.  DuckDB promotes SUM(BIGINT) to HUGEINT (int128), which the
# driver renders differently from Spark's bigint even when values are
# equal — that cost two hash-fail rows in round 2 (VERDICT.md r02 §wrong).
# DECIMAL is rejected outright since round 9: `dp_noisy_nation_counts`
# (the only DECIMAL-output entry ever driver-windowed) hash-FAILED twice
# with bit-identical values on both sides, and a schema scan of all 172
# entries the driver ever hash-greenlit (r01–r08) found ZERO DECIMAL
# columns — the driver's canonicalizer does not hash cross-engine
# DECIMALs equal, and str()-based _norm_cell can never catch that class
# locally.  Emit exact decimals internally, release via ONE final
# correctly-rounded cast to DOUBLE (or a scaled BIGINT) on both sides.
# Reject such types locally so dtype drift fails in pytest first.
_SAFE_TYPE_RE = __import__("re").compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|DATE|BOOLEAN"
    r"|TIMESTAMP(_NS| WITH TIME ZONE)?)$"
)


def assert_safe_oracle_types(
    con: duckdb.DuckDBPyConnection, name: str, sql: str
) -> None:
    """Fail if any oracle result column has a DuckDB type outside the
    driver-safe set (e.g. HUGEINT from an uncast SUM)."""
    rel = con.sql(sql)
    bad = [
        f"{col}: {t}"
        for col, t in zip(rel.columns, rel.types)
        if not _SAFE_TYPE_RE.match(str(t))
    ]
    assert not bad, (
        f"oracle {name!r} emits driver-unsafe column type(s): {bad}; "
        "CAST them (DuckDB SUM(BIGINT) -> HUGEINT is the usual culprit)"
    )


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through repr to unify -0.0/0.0 and float32 artifacts
        return repr(round(v, 9))
    if isinstance(v, bool | int | str):
        return v
    return str(v)


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(canon, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, Any]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    result: dict[str, Any] = {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
    }
    result["count_match"] = len(s_rows) == len(d_rows)
    result["schema_match"] = sorted(s_cols) == sorted(d_cols)
    if result["count_match"] and result["schema_match"]:
        sc, dc = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
        result["value_match"] = sc == dc
        if not result["value_match"]:
            diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
            result["first_diffs"] = diffs[:3]
    else:
        result["value_match"] = False
    result["ok"] = result["count_match"] and result["schema_match"] and result["value_match"]
    return result
