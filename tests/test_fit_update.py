"""Incremental refit (Pipeline.fit_update): the reference's
combine_stats shard merge applied across fit calls.  fit(d1) +
fit_update(d2) must equal fit(d1 UNION d2) — exactly for scalar
moments and NoThreshold vocabularies, within sketch tolerance for
t-digest."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from torchestra_spark import Feature, IndexLookup, MinMaxScale, Pipeline, StandardScore
from torchestra_spark.operators.lookups import CountLookup, MinThreshold, RatioLookup
from torchestra_spark.operators.scalers import MeanScale, RobustScale, TDigestDistribution


@pytest.fixture(scope="module")
def halves(spark):
    rng = np.random.RandomState(3)
    d1 = pd.DataFrame(
        {"x": rng.lognormal(0, 1, 4000), "cat": rng.choice(list("abcde"), 4000)}
    )
    d2 = pd.DataFrame(
        {"x": rng.lognormal(0.5, 1.2, 6000), "cat": rng.choice(list("defgh"), 6000)}
    )
    return (
        spark.createDataFrame(d1).repartition(4),
        spark.createDataFrame(d2).repartition(4),
        spark.createDataFrame(pd.concat([d1, d2], ignore_index=True)).repartition(4),
    )


def test_scalar_update_equals_full_fit(spark, halves):
    s1, s2, full = halves
    za, zb, mm, ms = StandardScore(), StandardScore(), MinMaxScale(), MeanScale()
    inc = Pipeline({"z": Feature("x", [za]), "m": Feature("x", [mm]), "s": Feature("x", [ms])})
    inc.fit(s1).fit_update(s2)
    zf, mf, sf = StandardScore(), MinMaxScale(), MeanScale()
    ref = Pipeline({"z": Feature("x", [zf]), "m": Feature("x", [mf]), "s": Feature("x", [sf])})
    ref.fit(full)
    assert np.isclose(za.mean, zf.mean, rtol=1e-12)
    assert np.isclose(za.std, zf.std, rtol=1e-12)
    assert mm.vmin == mf.vmin and mm.vdelta == mf.vdelta
    assert np.isclose(ms.mean, sf.mean, rtol=1e-12) and ms.delta == sf.delta


def test_vocab_update_equals_full_fit(spark, halves):
    s1, s2, full = halves
    c, r, ix = CountLookup(), RatioLookup(), IndexLookup()
    inc = Pipeline({"c": Feature("cat", [c]), "r": Feature("cat", [r]), "i": Feature("cat", [ix])})
    inc.fit(s1).fit_update(s2)
    cf, rf, ixf = CountLookup(), RatioLookup(), IndexLookup()
    ref = Pipeline({"c": Feature("cat", [cf]), "r": Feature("cat", [rf]), "i": Feature("cat", [ixf])})
    ref.fit(full)
    assert c.counts == cf.counts and c.total == cf.total
    assert r.ratios == rf.ratios
    assert ix.lookup == ixf.lookup


def test_sketch_update_within_tolerance(spark, halves):
    s1, s2, full = halves
    rs, td = RobustScale(), TDigestDistribution()
    inc = Pipeline({"r": Feature("x", [rs]), "q": Feature("x", [td])})
    inc.fit(s1).fit_update(s2)
    rsf = RobustScale()
    Pipeline({"r": Feature("x", [rsf])}).fit(full)
    assert np.isclose(rs.median, rsf.median, rtol=0.02)
    assert np.isclose(rs.iqr, rsf.iqr, rtol=0.02)


def test_update_guards(spark, halves):
    s1, s2, _ = halves
    # stats-behind-stats whose upstream params shift with the delta ->
    # refuse (the downstream history was measured under the old params)
    two_wave = Pipeline(
        {"z": Feature("x", [StandardScore()]), "q": Feature("z", [TDigestDistribution()])}
    )
    two_wave.fit(s1)
    with pytest.raises(ValueError, match="parameters.*changed|changed.*upstream_rtol"):
        two_wave.fit_update(s2)
    # exact percentiles -> refuse
    pe = Pipeline({"r": Feature("x", [RobustScale(exact=True)])})
    pe.fit(s1)
    with pytest.raises(Exception, match="not mergeable"):
        pe.fit_update(s2)
    # update before fit -> refuse
    fresh = Pipeline({"z": Feature("x", [StandardScore()])})
    with pytest.raises(RuntimeError, match="prior fit"):
        fresh.fit_update(s2)


def test_min_threshold_update_crosses_threshold(spark):
    """A key above the threshold in every delta stays exact; the
    documented approximation only affects keys below threshold within
    each individual fit."""
    d1 = spark.createDataFrame(pd.DataFrame({"cat": ["a"] * 10 + ["b"] * 3}))
    d2 = spark.createDataFrame(pd.DataFrame({"cat": ["a"] * 5 + ["b"] * 4}))
    c = CountLookup(MinThreshold(3))
    Pipeline({"c": Feature("cat", [c])}).fit(d1).fit_update(d2)
    assert c.counts["a"] == 15
    assert c.counts["b"] == 7  # >= threshold in both deltas: exact


def test_meanscale_unweighted_shard_merge_parity(spark):
    """MeanScale(shard_merge='unweighted') replicates the reference's
    combine_stats (equal average of shard means, _normalization.py:54)
    across fit calls — three unequal shards average equally."""
    shards = [
        spark.createDataFrame([(float(v),) for v in vals], "x double")
        for vals in ([1.0, 3.0], [10.0] * 8, [100.0])
    ]
    op = MeanScale(shard_merge="unweighted")
    pipe = Pipeline({"m": Feature("x", [op])})
    pipe.fit(shards[0]).fit_update(shards[1]).fit_update(shards[2])
    assert op.mean == (2.0 + 10.0 + 100.0) / 3  # equal shard average
    assert op.delta == 100.0 - 1.0
    # default weighted mode gives the true full-data mean
    opw = MeanScale()
    pw = Pipeline({"m": Feature("x", [opw])})
    pw.fit(shards[0]).fit_update(shards[1]).fit_update(shards[2])
    assert np.isclose(opw.mean, (1 + 3 + 80 + 100) / 11)


def test_multiwave_update_frozen_upstream_equals_full_fit(spark):
    """Two-wave refit-safe case: the delta lies inside the historical
    min/max, so the upstream MinMaxScale params are unchanged by the
    merge and the downstream StandardScore delta stats merge EXACTLY."""
    rng = np.random.RandomState(4)
    d1 = pd.DataFrame({"x": np.r_[0.0, 100.0, rng.uniform(0, 100, 998)]})
    d2 = pd.DataFrame({"x": rng.uniform(10, 90, 500)})
    mm, z = MinMaxScale(), StandardScore()
    pipe = Pipeline({"m": Feature("x", [mm]), "z2": Feature("m", [z])})
    pipe.fit(spark.createDataFrame(d1)).fit_update(spark.createDataFrame(d2))
    mmf, zf = MinMaxScale(), StandardScore()
    ref = Pipeline({"m": Feature("x", [mmf]), "z2": Feature("m", [zf])})
    ref.fit(spark.createDataFrame(pd.concat([d1, d2], ignore_index=True)))
    assert mm.vmin == mmf.vmin and mm.vdelta == mmf.vdelta
    assert np.isclose(z.mean, zf.mean, rtol=1e-12)
    assert np.isclose(z.std, zf.std, rtol=1e-12)


def test_multiwave_update_changed_upstream(spark):
    """Delta outside the historical range shifts the upstream params:
    strict mode raises actionably; a generous upstream_rtol accepts the
    documented approximation and still merges."""
    rng = np.random.RandomState(5)
    d1 = pd.DataFrame({"x": np.r_[0.0, 100.0, rng.uniform(0, 100, 998)]})
    d3 = pd.DataFrame({"x": rng.uniform(50, 120, 500)})  # max grows past 100
    mm, z = MinMaxScale(), StandardScore()
    pipe = Pipeline({"m": Feature("x", [mm]), "z2": Feature("m", [z])})
    pipe.fit(spark.createDataFrame(d1))
    with pytest.raises(ValueError, match="upstream_rtol"):
        pipe.fit_update(spark.createDataFrame(d3))
    # fresh pipeline (the failed update already merged wave 1)
    mm2, z2 = MinMaxScale(), StandardScore()
    pipe2 = Pipeline({"m": Feature("x", [mm2]), "z2": Feature("m", [z2])})
    pipe2.fit(spark.createDataFrame(d1))
    pipe2.fit_update(spark.createDataFrame(d3), upstream_rtol=1.0)
    assert mm2.vdelta > 100.0  # upstream did move; accepted as approximate
