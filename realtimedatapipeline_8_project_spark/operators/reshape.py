"""Reshaping / profiling operators (SURVEY §2.6 extension — the long-form
complement of ``pivot_event_types`` and the numeric half of the
data-quality profile family in relational.py).

* ``unpivot_metrics`` — wide->long melt of the lineitem measure columns
  (``DataFrame.unpivot``, Spark's Expand operator) followed by a long-form
  summary: the canonical metrics-table shape for dashboards.
* ``hist_price_profile`` — 20-bin equi-width histogram of order totals;
  bin bounds come from a single-row min/max aggregate broadcast back over
  the fact table (two passes, no driver action, no collect).

Scale notes: unpivot's Expand multiplies rows by the measure count
map-side (no shuffle; the following partial agg collapses it before the
exchange). The histogram is two scans of one column: the bounds aggregate
is all-partial (a few bytes per partition), the binning pass is pure
codegen arithmetic; both shuffles carry only (bin/flag, counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, oracle_dsum
from ..sources.tables import load_table

# --- wide -> long unpivot --------------------------------------------------

MEASURES = ("l_quantity", "l_extendedprice", "l_discount")


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    lin = load_table(spark, sf_dir, "lineitem")
    long = lin.unpivot(
        ids=["l_returnflag"],
        values=list(MEASURES),
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("val", "sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


_UNPIVOT_ARMS = "\nUNION ALL\n".join(
    f"SELECT l_returnflag, '{m}' AS metric, {m} AS val FROM lineitem"
    for m in MEASURES
)

ORACLE_UNPIVOT = f"""
WITH long AS (
{_UNPIVOT_ARMS}
)
SELECT l_returnflag, metric, COUNT(*) AS n,
       {oracle_dsum('val', 'sum_val')},
       MIN(val) AS min_val, MAX(val) AS max_val
FROM long
GROUP BY l_returnflag, metric
"""


# --- equi-width histogram --------------------------------------------------

N_BINS = 20


def q_hist_price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice: bin i covers
    [mn + i*w, mn + (i+1)*w) with the max value folded into the last bin.
    The bin expression is the same IEEE arithmetic in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
                * F.lit(float(N_BINS))
            ),
            F.lit(N_BINS - 1).cast("long"),
        ).alias("bin"),
        "o_totalprice",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


ORACLE_HIST = f"""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
)
SELECT LEAST(CAST(floor((o_totalprice - mn) / nullif(mx - mn, 0.0)
                        * {float(N_BINS)}) AS BIGINT),
             {N_BINS - 1}) AS bin,
       COUNT(*) AS n,
       {oracle_dsum('o_totalprice', 'sum_price')},
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM orders, bounds
GROUP BY 1
"""


QUERIES = {
    "unpivot_metrics": (q_unpivot_metrics, ORACLE_UNPIVOT),
    "hist_price_profile": (q_hist_price_profile, ORACLE_HIST),
}
