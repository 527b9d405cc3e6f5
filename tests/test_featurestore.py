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
