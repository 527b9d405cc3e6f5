"""FeatureStore facade: end-to-end build -> leakage gate -> materialize
-> state reload, against the same pandas oracles as the unit pieces."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from torchestra_spark import Feature, IndexLookup, Pipeline, StandardScore
from torchestra_spark.featurestore import FeatureStore
from torchestra_spark.io.sources import feature_events

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


@pytest.fixture(scope="module")
def feats(spark, events):
    n = int(events.agg(F.max("user_id")).first()[0]) + 1
    return feature_events(spark, n_entities=n, seed=7, partitions=4).cache()


def _make_store():
    return (
        FeatureStore(entity="user_id", ts="ts", order_tiebreak="event_id")
        .add_lags("value", lags=(1,))
        .add_sessionization(gap_sec=6 * 3600.0)
        .add_pipeline(
            Pipeline(
                {
                    "value_z": Feature("value", [StandardScore()]),
                    "etype_idx": Feature("event_type", [IndexLookup()]),
                }
            )
        )
    )


def test_build_and_leakage_gate(spark, events, feats):
    store = _make_store().add_feature_table(feats, ts="feature_ts", name="f",
                                            value_cols=["fval"])
    fv = store.build(events)
    store.assert_leakage_free(fv)
    cols = set(fv.columns)
    assert {"fval", "f_matched_ts", "value_lag1", "session_id", "value_z", "etype_idx"} <= cols
    assert fv.count() == events.count()


def test_materialize_and_resume(spark, events, feats, tmp_path):
    store = _make_store().add_feature_table(feats, ts="feature_ts", name="f",
                                            value_cols=["fval"])
    fv = store.build(events)
    out = str(tmp_path / "fv")
    store.materialize(fv, out, n_buckets=4, wave_size=2)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # idempotent re-run
    store.materialize(fv, out, n_buckets=4, wave_size=2)
    assert spark.read.parquet(out).count() == events.count()


def test_state_reload_produces_identical_vectors(spark, events, feats, tmp_path):
    store = _make_store().add_feature_table(feats, ts="feature_ts", name="f",
                                            value_cols=["fval"])
    fv1 = store.build(events)
    p = str(tmp_path / "state.json")
    store.save_state(p)

    fresh = _make_store().add_feature_table(feats, ts="feature_ts", name="f",
                                            value_cols=["fval"]).load_state(p)
    fv2 = fresh.build(events, fit=False)
    a = fv1.select("event_id", "value_z").toPandas().sort_values("event_id")
    b = fv2.select("event_id", "value_z").toPandas().sort_values("event_id")
    assert np.allclose(a["value_z"].to_numpy(), b["value_z"].to_numpy(), equal_nan=True)


def test_bucketed_layout_removes_exchange(spark, tmp_path):
    """Window ops and same-bucketed joins over a bucketed table plan
    with NO Exchange on the bucketed side (the repeat-query payoff of
    the bucketed feature-store layout)."""
    from torchestra_spark.io.sources import read_bucketed, write_bucketed
    from torchestra_spark.operators.temporal import lag_lead

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    write_bucketed(ev, "ev_bucketed", "user_id", 8, sort_cols=["user_id", "ts"],
                   path=str(tmp_path / "ev_bucketed"))
    try:
        b = read_bucketed(spark, "ev_bucketed")

        # 1. entity window op: no exchange before the window sort
        plan = lag_lead(b, "user_id", "ts", "value", lags=(1,))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan

        # 2. groupBy(entity) aggregate: bucketed scan satisfies the
        #    cluster distribution -> single-stage agg, no exchange
        plan = b.groupBy("user_id").agg(F.avg("value"))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan

        # plain parquet scan DOES need the exchange (control)
        plan = lag_lead(ev, "user_id", "ts", "value", lags=(1,))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange hashpartitioning" in plan

        # results identical to the unbucketed path
        a = lag_lead(ev, "user_id", "ts", "value", lags=(1,)).select(
            "event_id", "value_lag1").toPandas().sort_values("event_id", ignore_index=True)
        c = lag_lead(b, "user_id", "ts", "value", lags=(1,)).select(
            "event_id", "value_lag1").toPandas().sort_values("event_id", ignore_index=True)
        assert np.allclose(a["value_lag1"], c["value_lag1"], equal_nan=True)
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")


def test_featurestore_rolling(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    store = FeatureStore(entity="user_id", ts="ts").add_rolling("value", 3600.0, ("mean", "count"))
    out = store.build(ev, fit=False)
    assert "value_roll_mean_3600s" in out.columns
    row = out.filter(F.col("value").isNotNull()).first()
    assert row["value_roll_count_3600s"] >= 1
