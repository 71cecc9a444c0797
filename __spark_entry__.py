"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Delta-derivation convention (so Spark and the DuckDB oracle see the
SAME delta relation, derived deterministically from the base parquet):

    delta_lineitem = rows with l_orderkey % 10 = 0,
                     multiplicity = (l_linenumber % 2 = 0)
    delta_orders   = rows with o_orderkey % 10 = 0,
                     multiplicity = (o_custkey % 2 = 0)
    delta_customer = rows with c_custkey % 20 = 0,
                     multiplicity = (c_nationkey % 2 = 0)

Money sums are computed over exact integer cents
(cast(round(x * 100) as bigint)) so value hashes are deterministic
across engines regardless of floating-point summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.operators.rewrite import MULT_COL

TABLES = (
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
)

# (base-row predicate, multiplicity expression) per delta-bearing table —
# identical SQL text runs on both Spark and DuckDB.
DELTA_DEFS: dict[str, tuple[str, str]] = {
    "lineitem": ("l_orderkey % 10 = 0", "l_linenumber % 2 = 0"),
    "orders": ("o_orderkey % 10 = 0", "o_custkey % 2 = 0"),
    "customer": ("c_custkey % 20 = 0", "c_nationkey % 2 = 0"),
}


def _engine(spark: SparkSession, sf_dir: str, deltas: tuple[str, ...] = ()) -> IVMEngine:
    eng = IVMEngine(spark)
    for t in TABLES:
        eng.register_table(t, f"{sf_dir}/{t}.parquet")
    for t in deltas:
        pred, mult = DELTA_DEFS[t]
        d = eng.table(t).filter(F.expr(pred)).withColumn(MULT_COL, F.expr(mult))
        eng.register_delta(t, d)
    return eng


def _delta_sql(table: str) -> str:
    """DuckDB-side delta relation mirroring DELTA_DEFS."""
    pred, mult = DELTA_DEFS[table]
    return (
        f"(SELECT *, ({mult}) AS {MULT_COL} FROM {table} WHERE {pred})"
    )


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: IVM delta of the pricing-summary view (reference-shaped
    group-by SUM/COUNT, SURVEY.md 2d case 3) on sf0.001."""
    return _q_ivm_groupby(spark, "/root/testdata/sf0.001")


def _q_ivm_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir, deltas=("lineitem",))
    eng.create_immv(
        "pricing",
        sql="SELECT l_returnflag, l_linestatus, "
        "sum(cast(l_quantity AS bigint)) AS sum_qty, "
        "sum(cast(round(l_extendedprice * 100) AS bigint)) AS sum_base_cents, "
        "count(l_orderkey) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
        materialize=False,
    )
    return eng.ivm_upsert("pricing")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ivm_groupby_agg": _q_ivm_groupby,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ivm_groupby_agg": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   count(l_orderkey) AS count_order,
                   {MULT_COL}
            FROM {_delta_sql('lineitem')} d
            GROUP BY l_returnflag, l_linestatus, {MULT_COL}
        """,
    }
