"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries are built on torchestra_spark (see SURVEY.md §2 for the
operator inventory being covered).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from torchestra_spark import (  # noqa: E402
    Clamp,
    CountLookup,
    Feature,
    IndexLookup,
    IntCountLookup,
    IntIndexLookup,
    IntRatioLookup,
    MeanScale,
    MinMaxScale,
    MinThreshold,
    NanToNum,
    Pipeline,
    RatioLookup,
    RobustScale,
    StandardScore,
    TDigestDistribution,
    TopK,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fitted feature vector over lineitem at sf0.001 —
    StandardScore/MinMaxScale/RobustScale on price columns + vocabulary
    index on the return flag, in one staged fit and one transform."""
    sf_dir = "/root/testdata/sf0.001"
    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline(
        {
            "price_z": Feature("l_extendedprice", [StandardScore(), NanToNum(), Clamp(-4.0, 4.0)]),
            "qty_mm": Feature("l_quantity", [MinMaxScale()]),
            "disc_r": Feature("l_discount", [RobustScale()]),
            "flag_idx": Feature("l_returnflag", [IndexLookup()]),
        }
    )
    out = pipe.fit_transform(li)
    return out.select("l_orderkey", "l_linenumber", "price_z", "qty_mm", "disc_r", "flag_idx")


# ------------------------------------------------------------------- queries
def _q_standard_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline({"price_z": Feature("l_extendedprice", [StandardScore()])})
    out = pipe.fit_transform(li)
    return out.select(
        "l_orderkey", "l_linenumber", F.round(F.col("price_z"), 6).alias("price_z")
    )


def _q_standard_score_ddof0(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pipe = Pipeline({"value_z": Feature("value", [StandardScore(ddof=0)])})
    out = pipe.fit_transform(ev)
    return out.select("event_id", F.round(F.col("value_z"), 6).alias("value_z"))


def _q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pipe = Pipeline({"value_mm": Feature("value", [MinMaxScale()])})
    out = pipe.fit_transform(ev)
    return out.select("event_id", F.round(F.col("value_mm"), 6).alias("value_mm"))


def _q_mean_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline({"qty_ms": Feature("l_quantity", [MeanScale()])})
    out = pipe.fit_transform(li)
    return out.select(
        "l_orderkey", "l_linenumber", F.round(F.col("qty_ms"), 6).alias("qty_ms")
    )


def _q_clamp_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline(
        {"price_c": Feature("l_extendedprice", [StandardScore(), NanToNum(), Clamp(-1.0, 1.0)])}
    )
    out = pipe.fit_transform(li)
    return out.select(
        "l_orderkey", "l_linenumber", F.round(F.col("price_c"), 6).alias("price_c")
    )


def _q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    # t-digest quantiles: no exact SQL oracle (rows-only check); pytest
    # asserts atol 1e-1 vs np.quantile (tests/test_scalers.py)
    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline({"price_r": Feature("l_extendedprice", [RobustScale()])})
    out = pipe.fit_transform(li)
    return out.select("l_orderkey", "l_linenumber", F.col("price_r"))


def _q_tdigest_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # t-digest cdf (QuantileBin): rows-only check; pytest asserts
    # atol 1e-2 vs exact ranks (tests/test_scalers.py)
    ev = _t(spark, sf_dir, "events")
    pipe = Pipeline({"value_q": Feature("value", [TDigestDistribution()])})
    out = pipe.fit_transform(ev)
    return out.select("event_id", F.col("value_q"))


def _q_count_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    pipe = Pipeline({"prio_cnt": Feature("o_orderpriority", [CountLookup()])})
    out = pipe.fit_transform(od)
    return out.select("o_orderkey", "prio_cnt")


def _q_count_lookup_min_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part")
    pipe = Pipeline({"brand_cnt": Feature("p_brand", [CountLookup(MinThreshold(5))])})
    out = pipe.fit_transform(pt)
    return out.select("p_partkey", "brand_cnt")


def _q_ratio_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    pipe = Pipeline({"seg_ratio": Feature("c_mktsegment", [RatioLookup()])})
    out = pipe.fit_transform(cu)
    return out.select("c_custkey", F.round(F.col("seg_ratio"), 9).alias("seg_ratio"))


def _q_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    pipe = Pipeline({"seg_idx": Feature("c_mktsegment", [IndexLookup()])})
    out = pipe.fit_transform(cu)
    return out.select("c_custkey", "seg_idx")


def _q_index_lookup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part")
    pipe = Pipeline({"brand_idx": Feature("p_brand", [IndexLookup(TopK(5))])})
    out = pipe.fit_transform(pt)
    return out.select("p_partkey", "brand_idx")


def _q_int_count_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline({"ln_cnt": Feature("l_linenumber", [IntCountLookup()])})
    out = pipe.fit_transform(li)
    return out.select("l_orderkey", "l_linenumber", "ln_cnt")


def _q_int_ratio_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part")
    pipe = Pipeline({"size_ratio": Feature("p_size", [IntRatioLookup()])})
    out = pipe.fit_transform(pt)
    return out.select("p_partkey", F.round(F.col("size_ratio"), 9).alias("size_ratio"))


def _q_int_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part")
    pipe = Pipeline({"size_idx": Feature("p_size", [IntIndexLookup()])})
    out = pipe.fit_transform(pt)
    return out.select("p_partkey", "size_idx")


def _q_pipeline_multi_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged multi-feature fit: scalers + vocab in one pipeline
    li = _t(spark, sf_dir, "lineitem")
    pipe = Pipeline(
        {
            "price_z": Feature("l_extendedprice", [StandardScore()]),
            "qty_mm": Feature("l_quantity", [MinMaxScale()]),
            "flag_idx": Feature("l_returnflag", [IndexLookup()]),
        }
    )
    out = pipe.fit_transform(li)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("price_z"), 6).alias("price_z"),
        F.round(F.col("qty_mm"), 6).alias("qty_mm"),
        "flag_idx",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "standard_score": _q_standard_score,
        "standard_score_ddof0": _q_standard_score_ddof0,
        "minmax_scale": _q_minmax_scale,
        "mean_scale": _q_mean_scale,
        "clamp_nan": _q_clamp_nan,
        "robust_scale": _q_robust_scale,
        "tdigest_cdf": _q_tdigest_cdf,
        "count_lookup": _q_count_lookup,
        "count_lookup_min_threshold": _q_count_lookup_min_threshold,
        "ratio_lookup": _q_ratio_lookup,
        "index_lookup": _q_index_lookup,
        "index_lookup_topk": _q_index_lookup_topk,
        "int_count_lookup": _q_int_count_lookup,
        "int_ratio_lookup": _q_int_ratio_lookup,
        "int_index_lookup": _q_int_index_lookup,
        "pipeline_multi_feature": _q_pipeline_multi_feature,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "standard_score": """
            SELECT l_orderkey, l_linenumber,
                   ROUND((l_extendedprice - AVG(l_extendedprice) OVER ())
                         / STDDEV_SAMP(l_extendedprice) OVER (), 6) AS price_z
            FROM lineitem
        """,
        "standard_score_ddof0": """
            SELECT event_id,
                   ROUND((value - AVG(value) OVER ()) / STDDEV_POP(value) OVER (), 6) AS value_z
            FROM events
        """,
        "minmax_scale": """
            SELECT event_id,
                   ROUND((value - MIN(value) OVER ())
                         / (MAX(value) OVER () - MIN(value) OVER ()), 6) AS value_mm
            FROM events
        """,
        "mean_scale": """
            SELECT l_orderkey, l_linenumber,
                   ROUND((l_quantity - AVG(l_quantity) OVER ())
                         / (MAX(l_quantity) OVER () - MIN(l_quantity) OVER ()), 6) AS qty_ms
            FROM lineitem
        """,
        "clamp_nan": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(LEAST(GREATEST(
                       (l_extendedprice - AVG(l_extendedprice) OVER ())
                       / STDDEV_SAMP(l_extendedprice) OVER (), -1.0), 1.0), 6) AS price_c
            FROM lineitem
        """,
        "count_lookup": """
            SELECT o.o_orderkey, COALESCE(v.cnt, 0) AS prio_cnt
            FROM orders o
            LEFT JOIN (SELECT o_orderpriority AS k, COUNT(*) AS cnt
                       FROM orders GROUP BY 1) v
              ON o.o_orderpriority = v.k
        """,
        "count_lookup_min_threshold": """
            SELECT p.p_partkey, COALESCE(v.cnt, 0) AS brand_cnt
            FROM part p
            LEFT JOIN (SELECT p_brand AS k, COUNT(*) AS cnt
                       FROM part GROUP BY 1 HAVING COUNT(*) >= 5) v
              ON p.p_brand = v.k
        """,
        "ratio_lookup": """
            SELECT c.c_custkey,
                   ROUND(COALESCE(v.cnt, 0) * 1.0 / (SELECT COUNT(*) FROM customer), 9)
                     AS seg_ratio
            FROM customer c
            LEFT JOIN (SELECT c_mktsegment AS k, COUNT(*) AS cnt
                       FROM customer GROUP BY 1) v
              ON c.c_mktsegment = v.k
        """,
        "index_lookup": """
            WITH v AS (
                SELECT c_mktsegment AS k,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, c_mktsegment ASC) + 1 AS idx
                FROM customer GROUP BY c_mktsegment
            )
            SELECT c.c_custkey, COALESCE(v.idx, 1) AS seg_idx
            FROM customer c LEFT JOIN v ON c.c_mktsegment = v.k
        """,
        "index_lookup_topk": """
            WITH v AS (
                SELECT k, idx FROM (
                    SELECT p_brand AS k,
                           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_brand ASC) + 1 AS idx
                    FROM part GROUP BY p_brand
                ) WHERE idx <= 6
            )
            SELECT p.p_partkey, COALESCE(v.idx, 1) AS brand_idx
            FROM part p LEFT JOIN v ON p.p_brand = v.k
        """,
        "int_count_lookup": """
            SELECT l.l_orderkey, l.l_linenumber, v.cnt AS ln_cnt
            FROM lineitem l
            JOIN (SELECT l_linenumber AS k, COUNT(*) AS cnt
                  FROM lineitem GROUP BY 1) v
              ON l.l_linenumber = v.k
        """,
        "int_ratio_lookup": """
            SELECT p.p_partkey,
                   ROUND(v.cnt * 1.0 / (SELECT COUNT(*) FROM part), 9) AS size_ratio
            FROM part p
            JOIN (SELECT p_size AS k, COUNT(*) AS cnt FROM part GROUP BY 1) v
              ON p.p_size = v.k
        """,
        "int_index_lookup": """
            WITH v AS (
                SELECT k, ROW_NUMBER() OVER (ORDER BY cnt DESC, CAST(k AS VARCHAR) ASC) + 1 AS idx
                FROM (SELECT p_size AS k, COUNT(*) AS cnt FROM part GROUP BY 1)
            )
            SELECT p.p_partkey, COALESCE(v.idx, 1) AS size_idx
            FROM part p LEFT JOIN v ON p.p_size = v.k
        """,
        "pipeline_multi_feature": """
            WITH v AS (
                SELECT l_returnflag AS k,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_returnflag ASC) + 1 AS idx
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l.l_orderkey, l.l_linenumber,
                   ROUND((l.l_extendedprice - AVG(l.l_extendedprice) OVER ())
                         / STDDEV_SAMP(l.l_extendedprice) OVER (), 6) AS price_z,
                   ROUND((l.l_quantity - MIN(l.l_quantity) OVER ())
                         / (MAX(l.l_quantity) OVER () - MIN(l.l_quantity) OVER ()), 6) AS qty_mm,
                   COALESCE(v.idx, 1) AS flag_idx
            FROM lineitem l LEFT JOIN v ON l.l_returnflag = v.k
        """,
    }
