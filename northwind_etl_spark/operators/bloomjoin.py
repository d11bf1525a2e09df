"""Bloom-filter runtime join pruning: shrink the big side BEFORE the
join shuffle.

The scale problem: ``fact ⋈ (filtered dim)`` shuffles the whole fact
table even when the dim filter keeps 1% of keys — the rows that will
never match still pay the network.  Spark's own runtime row-level
filtering (spark.sql.optimizer.runtime.bloomFilter.*) does this
opportunistically; this module is the explicit, plan-visible version so
the pruning is guaranteed and testable.

Mechanics (all DataFrame ops, zero driver-side state beyond the tiny
position table):

  build side:  k hash positions per key, pos_i = pmod(xxhash64(key, i), m)
               → DISTINCT positions (≤ k·|build| rows, ≪ m for sane m)
  probe side:  k broadcast LEFT SEMI joins, one per hash — a probe row
               survives iff ALL k of its positions are present.

That is exactly a Bloom filter (AND over k hashed membership bits) with
the bitset stored as a distinct-position table instead of packed words;
false-positive structure is identical, false negatives impossible.  The
caller then runs the EXACT join on the survivors, so results are exact
— the bloom only cuts shuffle input.

At 100 TB: the position table broadcasts (m ≤ a few million ints), the
k semi-joins are broadcast hash joins (no shuffle, whole-stage codegen),
and the real join's shuffle sees only candidate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_positions(build: DataFrame, key: str, *, m: int, k: int) -> DataFrame:
    """Distinct Bloom positions for the build side's keys (the 'bitset')."""
    pos = [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m)).alias("__pos")
        for i in range(k)
    ]
    stacked = build.select(F.explode(F.array(*pos)).alias("__pos"))
    return stacked.distinct()


def bloom_prefilter(
    probe: DataFrame,
    key: str,
    positions: DataFrame,
    *,
    m: int,
    k: int,
) -> DataFrame:
    """Keep probe rows whose key passes the Bloom membership test.

    No false negatives (every true match survives); false positives
    bounded by the standard (1 - e^{-kn/m})^k — the caller's exact join
    removes them.
    """
    out = probe
    for i in range(k):
        probe_pos = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m))
        out = out.join(
            F.broadcast(positions.withColumnRenamed("__pos", f"__pos_{i}")),
            on=probe_pos == F.col(f"__pos_{i}"),
            how="left_semi",
        )
    return out


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    probe_key: str,
    build_key: str,
    m: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Exact LEFT SEMI join probe⋉build with a Bloom pre-cut on the
    probe side.  Result-identical to ``probe.join(build, 'left_semi')``
    (pinned in tests); only the shuffle volume changes.
    """
    positions = bloom_positions(build.select(F.col(build_key).alias("__k")), "__k", m=m, k=k)
    candidates = bloom_prefilter(probe, probe_key, positions, m=m, k=k)
    return candidates.join(
        build.select(F.col(build_key).alias("__k")).distinct(),
        on=F.col(probe_key) == F.col("__k"),
        how="left_semi",
    )
