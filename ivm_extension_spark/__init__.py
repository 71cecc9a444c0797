"""ivm_extension_spark — a PySpark-native incremental view maintenance (IVM) engine.

A from-scratch re-expression of the query surface of cwida/ivm-extension
(a DuckDB optimizer-extension prototype, see /root/reference) as an
idiomatic PySpark engine:

- base tables and delta tables (rows tagged with a boolean
  ``_duckdb_ivm_multiplicity`` column: true = insert, false = delete),
- views restricted to SELECT / WHERE / GROUP BY with SUM / COUNT
  (reference surface, README.md:33-36) plus the natural closure the
  reference's poster names as future work: joins (three-branch delta
  rule), AVG / MIN / MAX, and the merge ("upsert") step,
- the rewrite is pure DataFrame-to-DataFrame: Catalyst supplies predicate
  pushdown, column pruning and physical planning (no custom rules needed,
  SURVEY.md section 4).

Scale notes: every operator is expressed with built-in pyspark.sql
functions (JVM side, whole-stage codegen); aggregations are map-side
combinable; joins broadcast small dimension sides; no collect() in any
operator path.
"""

from ivm_extension_spark.engine import IVMEngine, MULT_COL
from ivm_extension_spark.operators.sketches import SketchSpec
from ivm_extension_spark.plans.viewdef import Aggregate, JoinSpec, ViewDef
from ivm_extension_spark.plans.sqlfront import parse_view_sql

__all__ = [
    "IVMEngine",
    "MULT_COL",
    "SketchSpec",
    "Aggregate",
    "JoinSpec",
    "ViewDef",
    "parse_view_sql",
]

__version__ = "0.1.0"
