"""northwind_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of
``roberthpchao/Northwind-ETL`` (a single-node pandas/pyodbc star-schema
ETL pipeline; see SURVEY.md) as an idiomatic, cluster-scale PySpark
engine, plus the LLM-data-pipeline operator families (dedup, similarity
search, text analysis, multimodal columns, sessionization) mandated by
the project north star.

Design stance (SURVEY.md §7): declarative DataFrame/SQL plans, Catalyst
does the optimizing; broadcast joins for dimension lookups; decimal
arithmetic for money aggregates so results are order-independent and
oracle-reproducible; Pandas UDFs only where built-ins genuinely cannot
express the semantics (multimodal decode).
"""

__version__ = "0.1.0"

# Pandas UDFs defined in this package must reach Spark's Python workers
# even when the package is importable only on the driver (e.g. the
# correctness harness injects it via sys.path).  Registering the package
# for pickle-by-value makes cloudpickle ship the UDF bodies inside the
# serialized command instead of a module reference the workers can't
# resolve.
try:  # pragma: no cover - import-environment dependent
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; cwd-on-path still works
    pass
