"""Edge-case semantics mirroring the reference's own degenerate-input
tests (test_normalization.py:546-596, test_lookups.py:90-104,259-265):
single data point, constant columns, empty transform batches."""

import math

import numpy as np
import pandas as pd
import pytest

from torchestra_spark import (
    Feature,
    IndexLookup,
    MinMaxScale,
    Pipeline,
    StandardScore,
    TDigestDistribution,
)


def test_single_point_fit(spark):
    # single data point: std undefined (ddof=1) like the reference's
    # n - ddof <= 0 -> nan; minmax delta 0 -> division by zero -> nan
    df = spark.createDataFrame(pd.DataFrame({"x": [5.0]}))
    pipe = Pipeline({"z": Feature("x", [StandardScore()]), "m": Feature("x", [MinMaxScale()])})
    out = pipe.fit_transform(df).collect()[0]
    assert math.isnan(out["z"])  # (5-5)/nan
    assert math.isnan(out["m"])  # 0/0


def test_constant_column(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [3.0] * 10}))
    pipe = Pipeline({"z": Feature("x", [StandardScore()])})
    out = pipe.fit_transform(df).collect()
    # (x - mean)/0 -> nan (0/0) — torch does the same for a 0-std column
    assert all(math.isnan(r["z"]) for r in out)


def test_tdigest_single_point(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [7.0]}))
    pipe = Pipeline({"q": Feature("x", [TDigestDistribution(compression=10)])})
    out = pipe.fit_transform(df).collect()[0]
    assert out["q"] == 0.5  # cdf at the single value (tdigest.py n==1 branch)


def test_empty_transform_batch(spark):
    # fit on data, transform an empty frame (test_lookups.py:259-265)
    train = spark.createDataFrame(pd.DataFrame({"k": ["a", "b", "a"]}))
    probe = train.filter("k = 'zzz'")
    pipe = Pipeline({"i": Feature("k", [IndexLookup()])})
    pipe.fit(train)
    assert pipe.transform(probe).count() == 0


def test_vocab_with_nulls(spark):
    # SQL NULL keys are excluded from the vocabulary; null maps to unknown
    train = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a", None, "b", None]})
    )
    pipe = Pipeline({"i": Feature("k", [IndexLookup()])})
    pipe.fit(train)
    op = pipe.features["i"].ops[0]
    assert set(op.lookup) == {"a", "b"}
    got = [r["i"] for r in pipe.transform(train).collect()]
    assert sorted(got) == [1, 1, 2, 2, 3]  # nulls -> unknown_idx=1


def test_single_vocab_fast_path(spark, monkeypatch):
    # one vocabulary in a wave must not pay the unpivot/explode
    train = spark.createDataFrame(pd.DataFrame({"k": ["a", "b", "a"]}))
    pipe = Pipeline({"i": Feature("k", [IndexLookup()])})
    pipe.fit(train)
    assert pipe.features["i"].ops[0].lookup == {"a": 2, "b": 3}
