"""Classifier-evaluation statistics a training-data pipeline publishes
about its quality filters: exact ROC-AUC (Mann–Whitney with midranks)
and decile cumulative-gains / lift — the readouts that tell you
whether a keep/drop model is actually ranking documents, computed at
corpus scale with no global sort.

Cross-engine exactness: both statistics reduce to INTEGERS — rank
sums with tie midranks doubled to stay integral (2·midrank =
2·below + cnt + 1), positive counts, decile boundaries by integral
DIV — followed by a fixed chain of correctly-rounded double steps.
The DuckDB oracles replay the same integers via window functions.

Scale shape: AUC aggregates scores to the (score, cnt, pos) level
first, then rides operators/ranking.py::global_running_sum (the
two-phase range-partitioned prefix sum — no single-partition window
anywhere); gains ride global_row_number.  Driver state is P-row
offsets.  Score-count overflow is guarded in-plan (the cusum raise
pattern): the doubled rank sum multiplies counts by 2n, so n is
capped at 2^30 — past that, shard the eval by stratum (which is what
a 100 TB eval does anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _guarded_total(scored: DataFrame, limit: int) -> DataFrame:
    """1-row (n_total, n_pos_total) frame whose n_total column raises
    in-plan past `limit` — folded into a value every consumer reads so
    Catalyst cannot prune the guard."""
    t = scored.agg(
        F.count(F.lit(1)).cast("long").alias("__nt"),
        F.sum("pos").cast("long").alias("__npt"),
    )
    return t.select(
        F.when(F.col("__nt") < limit, F.col("__nt"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("mleval: n = "),
                    F.col("__nt").cast("string"),
                    F.lit(f" >= {limit} — doubled rank sums would"
                          " overflow BIGINT; shard the eval"),
                )
            )
        )
        .alias("__nt"),
        "__npt",
    )


def auc_exact(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "pos",
    *,
    max_rows: int = 2**30,
) -> DataFrame:
    """Exact ROC-AUC of `score_col` against binary `label_col`
    (1 = positive): the Mann–Whitney statistic with midrank tie
    handling,

        AUC = (S₂ − n₊(n₊+1)) / (2·n₊·n₋),
        S₂  = Σ_scores pos_s · (2·below_s + cnt_s + 1)

    where below_s is the exclusive prefix count over ascending score.
    Returns one row (n_pos, n_neg, auc).
    """
    from ..cache import persist_stage

    # base feeds two aggregations (the score-level rollup and the
    # row-count guard) — persist so the caller's scoring pipeline
    # runs once
    base = persist_stage(
        scored.select(
            F.col(score_col).alias("s"),
            F.col(label_col).cast("long").alias("pos"),
        )
    )
    bym = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("np"),
    )
    # guard folded into np — the column every downstream consumer
    # reads (a standalone guard column would be pruned by Catalyst;
    # the hits_fixed_point lesson)
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("__nt"))
    bym = bym.join(F.broadcast(tot)).select(
        "s",
        "cnt",
        F.when(F.col("__nt") < max_rows, F.col("np"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("auc_exact: n = "),
                    F.col("__nt").cast("string"),
                    F.lit(f" >= {max_rows} — doubled rank sums would"
                          " overflow BIGINT; shard the eval"),
                )
            )
        )
        .alias("np"),
    )
    from .ranking import global_running_sum

    run = global_running_sum(bym, [F.col("s").asc()], "cnt", out_col="cum")
    s2 = run.select(
        (
            F.col("np")
            * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
        )
        .cast("decimal(38,0)")
        .alias("term"),
        "cnt",
        "np",
    ).agg(
        F.sum("term").alias("s2"),
        F.sum("np").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).cast("long").alias("n_neg"),
    )
    npd = F.col("n_pos").cast("double")
    nnd = F.col("n_neg").cast("double")
    # single-class input has no ranking to score: pin to 0.5 (chance)
    # instead of releasing a NaN/Inf division — the kappa/alpha/z
    # degenerate-fallback discipline, mirrored in the oracle
    return s2.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (F.col("s2").cast("double") - npd * (npd + F.lit(1.0)))
            / (F.lit(2.0) * npd * nnd),
        )
        .otherwise(F.lit(0.5))
        .alias("auc"),
    )


def cumulative_gains(
    scored: DataFrame,
    score_col: str = "score",
    id_col: str = "doc_id",
    label_col: str = "pos",
    *,
    n_bins: int = 10,
    max_rows: int = 2**30,
) -> DataFrame:
    """Decile cumulative-gains table over descending `score_col`
    (ties broken by `id_col` — a total order): per bin, row and
    positive counts, the cumulative capture rate ("top 20% of docs by
    score hold X% of the positives") and the bin lift vs the base
    rate.  One distributed ranking + one n_bins-row aggregate.
    """
    from ..cache import persist_stage

    base = persist_stage(
        scored.select(
            F.col(score_col).alias("s"),
            F.col(id_col).alias("i"),
            F.col(label_col).cast("long").alias("pos"),
        )
    )
    guard = _guarded_total(base, max_rows)
    from .ranking import global_row_number

    ranked = global_row_number(
        base, [F.col("s").desc(), F.col("i").asc()], rank_col="__r"
    ).join(F.broadcast(guard))
    binned = ranked.select(
        F.expr(f"((__r - 1) * {int(n_bins)}) DIV __nt")
        .cast("int")
        .alias("bin"),
        "pos",
        "__nt",
        "__npt",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.max("__nt").alias("n_total"),
        F.max("__npt").alias("n_pos_total"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.withColumn("cum_pos", F.sum("n_pos").over(w).cast("long"))
    # zero positives anywhere -> no capture curve to normalize: pin
    # gain/lift to 0.0 (mirrored in the oracle) instead of NaN
    has_pos = F.col("n_pos_total") > 0
    return cum.select(
        "bin",
        "n_docs",
        "n_pos",
        "cum_pos",
        F.when(
            has_pos,
            F.col("cum_pos").cast("double")
            / F.col("n_pos_total").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("gain"),
        F.when(
            has_pos,
            (F.col("n_pos").cast("double") / F.col("n_docs").cast("double"))
            / (
                F.col("n_pos_total").cast("double")
                / F.col("n_total").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lift"),
    ).orderBy("bin")
