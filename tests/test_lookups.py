"""Vocabulary lookup goldens — verbatim reference fixtures
(/root/reference/src/torchestra/test_lookups.py:54-64,126,181-200,
268-288,397-416,475-504): exact-equality on counts, ratios, indices,
eliminator variants, empty-fit edge cases, and state round-trips."""

import numpy as np
import pandas as pd
import pytest

from torchestra_spark import (
    CountLookup,
    Feature,
    IndexLookup,
    IntCountLookup,
    IntIndexLookup,
    IntRatioLookup,
    MinThreshold,
    Pipeline,
    RatioLookup,
    RatioThreshold,
    TopK,
    sort_counts,
)

# test_lookups.py:56-57 fixture
SHARD1 = list("abacabdabcabd")
SHARD2 = list("abaeeedebcabd")
TRAIN = SHARD1 + SHARD2  # counts: a:8 b:7 c:3 d:4 e:4
PROBE = list("abcdef")

INT_TRAIN = [1, 2, 1, -3, 1, 2, 4, 1, 2, -3, 1, 2, 1, 2, 1, 5, 5, 5, 4, 5, 2, 3, 1, 2, 4]
INT_PROBE = [1, 2, 3, 4, 5, -3, 99]


@pytest.fixture(scope="module")
def train_df(spark):
    pdf = pd.DataFrame({"id": range(len(TRAIN)), "k": TRAIN})
    return spark.createDataFrame(pdf).repartition(2).cache()


@pytest.fixture(scope="module")
def probe_df(spark):
    pdf = pd.DataFrame({"id": range(len(PROBE)), "k": PROBE})
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="module")
def int_train_df(spark):
    pdf = pd.DataFrame({"id": range(len(INT_TRAIN)), "k": pd.array(INT_TRAIN, dtype="int64")})
    return spark.createDataFrame(pdf).repartition(2).cache()


@pytest.fixture(scope="module")
def int_probe_df(spark):
    pdf = pd.DataFrame({"id": range(len(INT_PROBE)), "k": pd.array(INT_PROBE, dtype="int64")})
    return spark.createDataFrame(pdf).cache()


def _col(df, name):
    return [r[name] for r in df.select("id", name).orderBy("id").collect()]


def _fit_probe(train, probe, op):
    pipe = Pipeline({"y": Feature("k", [op])})
    pipe.fit(train)
    return _col(pipe.transform(probe), "y"), pipe


def test_sort_counts_order():
    # count desc, stable alphabetical tiebreak (_lookups.py:547-551)
    assert sort_counts({"a": 8, "b": 7, "c": 3, "d": 4, "e": 4}) == ["a", "b", "d", "e", "c"]
    assert sort_counts({"c": 1, "a": 1, "b": 1}) == ["a", "b", "c"]


def test_count_lookup(train_df, probe_df):
    # golden test_lookups.py:61-64
    got, pipe = _fit_probe(train_df, probe_df, CountLookup())
    assert got == [8, 7, 3, 4, 4, 0]
    op = pipe.features["y"].ops[0]
    assert op.counts == {"a": 8, "b": 7, "c": 3, "d": 4, "e": 4}
    assert op.total == 26


def test_count_lookup_min_threshold(train_df, probe_df):
    # test_lookups.py:67-74 pattern
    got, _ = _fit_probe(train_df, probe_df, CountLookup(MinThreshold(5)))
    assert got == [8, 7, 0, 0, 0, 0]


def test_ratio_lookup(train_df, probe_df):
    # golden test_lookups.py:126
    got, _ = _fit_probe(train_df, probe_df, RatioLookup())
    assert np.allclose(got, [8 / 26, 7 / 26, 3 / 26, 4 / 26, 4 / 26, 0.0])


def test_ratio_lookup_ratio_threshold(train_df, probe_df):
    # keep ratio >= 4/26; denominator is the pre-elimination total
    got, pipe = _fit_probe(train_df, probe_df, RatioLookup(RatioThreshold(4 / 26)))
    op = pipe.features["y"].ops[0]
    assert op.total == 8 + 7 + 4 + 4
    assert np.allclose(got, [8 / 23, 7 / 23, 0.0, 4 / 23, 4 / 23, 0.0])


def test_index_lookup(train_df, probe_df):
    # golden test_lookups.py:188-189: vocab order a,b,d,e,c ->
    # indices 2,3,4,5,6 ; probe [a b c d e f] -> [2 3 6 4 5 1]
    got, pipe = _fit_probe(train_df, probe_df, IndexLookup())
    assert got == [2, 3, 6, 4, 5, 1]
    assert pipe.features["y"].ops[0].dictionary_size() == 7


def test_index_lookup_custom_indices(train_df, probe_df):
    # test_lookups.py:192-200: padding=3, unknown=0 -> taken {3,0},
    # assignment a->1, b->2, d->4, e->5, c->6
    got, _ = _fit_probe(train_df, probe_df, IndexLookup(padding_idx=3, unknown_idx=0))
    assert got == [1, 2, 6, 4, 5, 0]


def test_index_lookup_topk_stable_ties(spark, probe_df):
    # test_lookups.py:499-504: all-equal counts -> alphabetical top-k
    pdf = pd.DataFrame({"id": range(5), "k": ["e", "d", "c", "b", "a"]})
    train = spark.createDataFrame(pdf)
    got, pipe = _fit_probe(train, probe_df, IndexLookup(TopK(3)))
    op = pipe.features["y"].ops[0]
    assert set(op.lookup) == {"a", "b", "c"}
    assert got == [2, 3, 4, 1, 1, 1]


def test_index_lookup_empty_fit(spark, probe_df):
    # test_lookups.py:217-231: empty fit -> all unknown
    train = spark.createDataFrame(pd.DataFrame({"id": [0], "k": ["x"]})).filter("id < 0")
    got, pipe = _fit_probe(train, probe_df, IndexLookup())
    assert got == [1] * 6
    assert pipe.features["y"].ops[0].dictionary_size() == 2


def test_int_count_lookup(int_train_df, int_probe_df):
    counts = pd.Series(INT_TRAIN).value_counts().to_dict()
    got, _ = _fit_probe(int_train_df, int_probe_df, IntCountLookup())
    assert got == [counts.get(k, 0) for k in INT_PROBE]


def test_int_ratio_lookup(int_train_df, int_probe_df):
    counts = pd.Series(INT_TRAIN).value_counts().to_dict()
    total = len(INT_TRAIN)
    got, _ = _fit_probe(int_train_df, int_probe_df, IntRatioLookup())
    assert np.allclose(got, [counts.get(k, 0) / total for k in INT_PROBE])


def test_int_index_lookup(int_train_df, int_probe_df):
    # counts: 1:8, 2:7, 5:5? -> compute; ordering count desc then str(key) asc
    counts = pd.Series(INT_TRAIN).value_counts().to_dict()
    order = sort_counts({str(k): v for k, v in counts.items()})
    expect_lookup = {}
    taken = {0, 1}
    i = 0
    for k in order:
        while i in taken:
            i += 1
        expect_lookup[int(k)] = i
        i += 1
    got, pipe = _fit_probe(int_train_df, int_probe_df, IntIndexLookup())
    assert pipe.features["y"].ops[0].lookup == expect_lookup
    assert got == [expect_lookup.get(k, 1) for k in INT_PROBE]


def test_state_roundtrip(train_df, probe_df, int_train_df, int_probe_df, tmp_path):
    # test_lookups.py:77-87,203-214 pattern
    pipe = Pipeline(
        {
            "c": Feature("k", [CountLookup()]),
            "r": Feature("k", [RatioLookup(MinThreshold(4))]),
            "i": Feature("k", [IndexLookup(TopK(3))]),
        }
    )
    pipe.fit(train_df)
    out1 = pipe.transform(probe_df)
    path = str(tmp_path / "lk.json")
    pipe.save_state(path)
    fresh = Pipeline(
        {
            "c": Feature("k", [CountLookup()]),
            "r": Feature("k", [RatioLookup(MinThreshold(4))]),
            "i": Feature("k", [IndexLookup(TopK(3))]),
        }
    ).load_state(path)
    out2 = fresh.transform(probe_df)
    for c in ["c", "r", "i"]:
        assert _col(out1, c) == _col(out2, c), c


def test_shared_vocab_fit_is_one_wave(train_df):
    pipe = Pipeline(
        {
            "c": Feature("k", [CountLookup()]),
            "i": Feature("k", [IndexLookup()]),
        }
    )
    assert pipe.waves == [["c.0", "i.0"]]


def test_fused_lookups_single_arrow_crossing(spark):
    """fused_lookups == the k separate op.expr results, and the plan
    contains exactly ONE ArrowEvalPython stage (k=3 unfused has 3)."""
    from torchestra_spark.operators.lookups import fused_lookups
    from torchestra_spark.plans.pipeline import Feature, Pipeline

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "cat": ["a", "b", "a", "c", "a", "b"],
                "grp": ["x", "x", "y", "y", "y", "y"],
                "num": [1, 2, 1, 1, 3, 1],
            }
        )
    )
    c, r, ix = CountLookup(), RatioLookup(), IndexLookup()
    pipe = Pipeline(
        {"cat_cnt": Feature("cat", [c]), "grp_ratio": Feature("grp", [r]),
         "cat_idx": Feature("cat", [ix])}
    )
    pipe.fit(df)
    base = pipe.transform(df).orderBy("num", "cat", "grp").collect()
    fused = fused_lookups(
        df, {"cat_cnt": (c, "cat"), "grp_ratio": (r, "grp"), "cat_idx": (ix, "cat")}
    ).orderBy("num", "cat", "grp").collect()
    for b, f in zip(base, fused):
        assert b["cat_cnt"] == f["cat_cnt"]
        assert abs(b["grp_ratio"] - f["grp_ratio"]) < 1e-12
        assert b["cat_idx"] == f["cat_idx"]

    fused_df = fused_lookups(
        df, {"cat_cnt": (c, "cat"), "grp_ratio": (r, "grp"), "cat_idx": (ix, "cat")}
    )
    plan = fused_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_fused_lookups_broadcast_branch(spark):
    """Vocabularies above _BROADCAST_MIN ride a TorrentBroadcast inside
    the fused UDF — same results as the per-op exprs."""
    import numpy as np

    from torchestra_spark.operators.lookups import _BROADCAST_MIN, fused_lookups
    from torchestra_spark.plans.pipeline import Feature, Pipeline

    n = _BROADCAST_MIN + 500
    keys = [f"k{i:05d}" for i in range(n)]
    df = spark.createDataFrame(pd.DataFrame({"cat": keys * 2}))
    c, ix = CountLookup(), IndexLookup()
    pipe = Pipeline({"cnt": Feature("cat", [c]), "idx": Feature("cat", [ix])})
    pipe.fit(df)
    assert sum(len(s.mapping) for s in [c.mapping_spec(), ix.mapping_spec()]) >= _BROADCAST_MIN
    probe = spark.createDataFrame(pd.DataFrame({"cat": keys[:50] + ["unseen"]}))
    out = fused_lookups(probe, {"cnt": (c, "cat"), "idx": (ix, "cat")}).toPandas()
    assert (out.loc[out["cat"] != "unseen", "cnt"] == 2).all()
    assert (out.loc[out["cat"] == "unseen", "cnt"] == 0).all()
    assert (out.loc[out["cat"] == "unseen", "idx"] == 1).all()  # unknown_idx


def test_vocab_collect_cap(spark, monkeypatch):
    """An unbounded-cardinality vocabulary without an eliminator raises
    an actionable error instead of silently OOMing the driver."""
    from torchestra_spark.plans.pipeline import Feature, Pipeline

    monkeypatch.setattr(Pipeline, "_MAX_VOCAB", 10)
    df = spark.createDataFrame(pd.DataFrame({"cat": [f"k{i}" for i in range(50)]}))
    with pytest.raises(RuntimeError, match="Add an eliminator"):
        Pipeline({"c": Feature("cat", [CountLookup()])}).fit(df)
    # an eliminator that keeps it under the cap fits fine
    Pipeline({"c": Feature("cat", [CountLookup(TopK(5))])}).fit(df)


def test_hash_bucket_vocabulary_free(spark):
    from pyspark.sql import functions as F

    from torchestra_spark.operators.lookups import HashBucket

    rows = [(i, f"key{i}") for i in range(100)] + [(100, "key0"), (101, None)]
    df = spark.createDataFrame(rows, "id long, k string")
    for method in ("xxhash64", "poly31"):
        hb = HashBucket(n_buckets=4096, seed=3, method=method)
        out = {r.id: r.b for r in df.select("id", hb.expr(F.col("k")).alias("b")).collect()}
        assert out[100] == out[0], method           # same key -> same bucket
        assert out[101] == 0, method                # NULL -> reserved 0
        assert all(0 <= v <= 4095 for v in out.values()), method
        # 100 distinct keys spread over 4095 buckets: expect ~99 distinct
        assert len({out[i] for i in range(100)}) >= 90, method
        # state round-trip
        hb2 = HashBucket()
        hb2.set_state(hb.get_state())
        out2 = {r.id: r.b for r in df.select("id", hb2.expr(F.col("k")).alias("b")).collect()}
        assert out2 == out
