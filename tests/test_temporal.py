"""Temporal engine tests (FIXTURES.md F2): as-of join vs pandas
merge_asof oracle (both strategies + salted skew variant), zero
temporal leakage, lag/lead/fill-forward/sessionize vs pandas."""

import numpy as np
import pandas as pd
import pytest

from torchestra_spark.io.sources import feature_events
from torchestra_spark.operators.temporal import (
    asof_join,
    fill_forward,
    lag_lead,
    sessionize,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas().sort_values(["user_id", "ts", "event_id"], ignore_index=True)


@pytest.fixture(scope="module")
def feats(spark, events_pd):
    # feature side keyed to the same user_id domain as events
    n = int(events_pd["user_id"].max()) + 1
    return feature_events(spark, n_entities=n, seed=7, partitions=4).cache()


@pytest.fixture(scope="module")
def feats_pd(feats):
    return feats.toPandas().sort_values(["user_id", "feature_ts", "seq"], ignore_index=True)


def _oracle_asof(events_pd, feats_pd, tolerance=None):
    left = events_pd.sort_values("ts", kind="stable")
    right = feats_pd.sort_values("feature_ts", kind="stable")[["user_id", "feature_ts", "fval"]]
    out = pd.merge_asof(
        left,
        right,
        left_on="ts",
        right_on="feature_ts",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
    )
    return out.sort_values("event_id", ignore_index=True)


def _check_against_oracle(got_df, events_pd, feats_pd, tolerance=None):
    got = got_df.select("event_id", "ts", "user_id", "fval", "matched_feature_ts").toPandas()
    got = got.sort_values("event_id", ignore_index=True)
    exp = _oracle_asof(events_pd, feats_pd, tolerance)
    assert len(got) == len(exp)
    assert np.allclose(got["fval"].to_numpy(), exp["fval"].to_numpy(), equal_nan=True)
    gm = got["matched_feature_ts"]
    em = exp["feature_ts"]
    assert gm.isna().equals(em.isna())
    assert (gm.dropna().to_numpy() == em.dropna().to_numpy()).all()
    # zero temporal leakage
    ok = got["matched_feature_ts"].isna() | (got["matched_feature_ts"] <= got["ts"])
    assert ok.all(), "temporal leakage detected"


def test_asof_union(events, feats, events_pd, feats_pd):
    out = asof_join(events, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"])
    _check_against_oracle(out, events_pd, feats_pd)


def test_asof_union_salted(events, feats, events_pd, feats_pd):
    out = asof_join(events, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], salt_buckets=4)
    _check_against_oracle(out, events_pd, feats_pd)


def test_asof_merge_strategy(events, feats, events_pd, feats_pd):
    out = asof_join(events, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], strategy="merge_asof")
    _check_against_oracle(out, events_pd, feats_pd)


def test_asof_tolerance(events, feats, events_pd, feats_pd):
    tol = 3 * 86400.0
    out = asof_join(events, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], tolerance_sec=tol)
    _check_against_oracle(out, events_pd, feats_pd, tolerance=tol)


def test_asof_exact_match_included(spark):
    # exact-timestamp feature must match (allow_exact_matches semantics)
    lt = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "ts": [pd.Timestamp("2026-01-02")], "event_id": [0]})
    )
    rt = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": [1, 1], "feature_ts": [pd.Timestamp("2026-01-02"), pd.Timestamp("2026-01-01")],
             "fval": [2.0, 1.0]}
        )
    )
    out = asof_join(lt, rt, on="user_id", left_ts="ts", right_ts="feature_ts").collect()
    assert out[0]["fval"] == 2.0


def test_lag_lead(events, events_pd):
    out = lag_lead(events, "user_id", "ts", "value", lags=(1, 2), leads=(1,))
    got = out.select("event_id", "value_lag1", "value_lag2", "value_lead1").toPandas()
    got = got.sort_values("event_id", ignore_index=True)
    g = events_pd.sort_values(["user_id", "ts"], kind="stable").groupby("user_id")["value"]
    exp = events_pd.sort_values(["user_id", "ts"], kind="stable").assign(
        l1=g.shift(1), l2=g.shift(2), f1=g.shift(-1)
    ).sort_values("event_id", ignore_index=True)
    for a, b in [("value_lag1", "l1"), ("value_lag2", "l2"), ("value_lead1", "f1")]:
        assert np.allclose(got[a].to_numpy(), exp[b].to_numpy(), equal_nan=True)


def test_fill_forward(spark):
    pdf = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2, 2],
            "t": pd.to_datetime(
                ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04", "2026-01-01", "2026-01-02"]
            ),
            "v": [1.0, None, None, 4.0, None, 5.0],
        }
    )
    out = fill_forward(spark.createDataFrame(pdf), "u", "t", ["v"])
    got = out.orderBy("u", "t").toPandas()["v"].tolist()
    exp = pdf.sort_values(["u", "t"]).groupby("u")["v"].ffill().tolist()
    assert got == pytest.approx(exp, nan_ok=True)


def test_sessionize(events, events_pd):
    gap = 6 * 3600.0
    out = sessionize(events, "user_id", "ts", gap_sec=gap)
    got = out.select("event_id", "session_id").toPandas().sort_values("event_id", ignore_index=True)
    e = events_pd.sort_values(["user_id", "ts"], kind="stable")
    gaps = e.groupby("user_id")["ts"].diff().dt.total_seconds()
    boundary = gaps.isna() | (gaps > gap)
    exp = e.assign(sid=boundary.groupby(e["user_id"]).cumsum() - 1).sort_values(
        "event_id", ignore_index=True
    )
    assert got["session_id"].tolist() == exp["sid"].astype(int).tolist()


def test_asof_skew_entity(spark, feats, feats_pd):
    # hot entity: 500 probe rows on one user — salted and unsalted agree
    # (salt_threshold=100 forces the hot path for this key)
    probe = pd.DataFrame(
        {
            "event_id": np.arange(500),
            "user_id": np.zeros(500, dtype=np.int64),
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(500) * 97, unit="m"),
        }
    )
    lt = spark.createDataFrame(probe)
    a = asof_join(lt, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                  value_cols=["fval"]).toPandas().sort_values("event_id", ignore_index=True)
    b = asof_join(lt, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                  value_cols=["fval"], salt_buckets=8, salt_threshold=100).toPandas(
    ).sort_values("event_id", ignore_index=True)
    assert np.allclose(a["fval"].to_numpy(), b["fval"].to_numpy(), equal_nan=True)
    exp = _oracle_asof(probe, feats_pd)
    assert np.allclose(a["fval"].to_numpy(), exp["fval"].to_numpy(), equal_nan=True)


def test_asof_salt_mixed_hot_cold(spark, feats, feats_pd):
    # hot user 0 (300 rows) + cold users 1..5 (3 rows each): the salted
    # plan must replicate features only for the hot key and still match
    # the pandas oracle on every row
    hot = pd.DataFrame(
        {
            "event_id": np.arange(300),
            "user_id": np.zeros(300, dtype=np.int64),
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(300) * 131, unit="m"),
        }
    )
    cold = pd.DataFrame(
        {
            "event_id": 300 + np.arange(15),
            "user_id": np.repeat(np.arange(1, 6), 3),
            "ts": pd.Timestamp("2026-01-10") + pd.to_timedelta(np.arange(15) * 7, unit="h"),
        }
    )
    probe = pd.concat([hot, cold], ignore_index=True)
    lt = spark.createDataFrame(probe)
    out = asof_join(lt, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], salt_buckets=4, salt_threshold=100)
    got = out.toPandas().sort_values("event_id", ignore_index=True)
    exp = _oracle_asof(probe, feats_pd)
    assert len(got) == len(exp)
    assert np.allclose(got["fval"].to_numpy(), exp["fval"].to_numpy(), equal_nan=True)


def test_asof_broadcast_strategy(events, feats, events_pd, feats_pd):
    out = asof_join(events, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], strategy="broadcast")
    _check_against_oracle(out, events_pd, feats_pd)


def test_asof_broadcast_tolerance(events, feats, events_pd, feats_pd):
    tol = 3 * 86400.0
    out = asof_join(events, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], strategy="broadcast", tolerance_sec=tol)
    _check_against_oracle(out, events_pd, feats_pd, tolerance=tol)


def test_asof_broadcast_null_feature_ts_ignored(spark):
    """r8 review: a NULL feature ts must be DROPPED by the broadcast
    kernel (it has no point-in-time meaning), never corrupt the sorted
    key array and poison unrelated matches."""
    import pyspark.sql.functions as F

    lt = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-01-05 00:00:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rt = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", 10.0), (1, None, 99.0),
         (2, "2024-01-03 00:00:00", 20.0)],
        "user_id long, feature_ts string, fval double",
    ).withColumn("feature_ts", F.to_timestamp("feature_ts"))
    out = asof_join(lt, rt, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], strategy="broadcast").toPandas()
    got = dict(zip(out["user_id"], out["fval"]))
    assert got == {1: 10.0, 2: 20.0}


def test_asof_broadcast_pre_epoch_matched_ts(spark):
    """r8 review: a matched feature ts BEFORE 1970 is a real match —
    the unmatched sentinel must not blank it (old sentinel was -1 µs)."""
    import pyspark.sql.functions as F

    lt = spark.createDataFrame(
        [(1, "1980-01-01 00:00:00"), (2, "1980-01-01 00:00:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rt = spark.createDataFrame(
        [(1, "1969-12-31 23:59:59", 7.0)],
        "user_id long, feature_ts string, fval double",
    ).withColumn("feature_ts", F.to_timestamp("feature_ts"))
    out = asof_join(lt, rt, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], strategy="broadcast").toPandas()
    r1 = out[out["user_id"] == 1].iloc[0]
    r2 = out[out["user_id"] == 2].iloc[0]
    assert r1["fval"] == 7.0 and str(r1["matched_feature_ts"]).startswith("1969-12-31")
    assert pd.isna(r2["fval"]) and pd.isna(r2["matched_feature_ts"])


def test_interval_join(spark):
    from torchestra_spark.operators.temporal import interval_join

    dims = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "valid_from": pd.to_datetime(["2026-01-01", "2026-02-01", "2026-01-15"]),
            "valid_to": pd.to_datetime(["2026-02-01", "2026-03-01", "2026-02-15"]),
            "plan": ["free", "pro", "free"],
        }
    )
    probes = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["2026-01-10", "2026-02-01", "2026-03-05", "2026-01-20", "2026-01-01"]
            ),
        }
    )
    out = interval_join(
        spark.createDataFrame(probes), spark.createDataFrame(dims),
        on="user_id", left_ts="ts", valid_from="valid_from", valid_to="valid_to",
        value_cols=["plan"],
    )
    got = {r["event_id"]: r["plan"] for r in out.collect()}
    # boundary ts=2026-02-01 falls in the NEW era (>= from, < to)
    assert got == {0: "free", 1: "pro", 2: None, 3: "free", 4: None}


def test_asof_null_feature_value_not_skipped(spark):
    """A feature row whose value is SQL NULL must still win the as-of
    match (pandas merge_asof semantics): probe rows at/after it get
    (NULL value, its matched_ts) — not a stale older value."""
    left = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "ts": [pd.Timestamp("2024-01-03")]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "feature_ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
                "fval": [10.0, None],
            }
        )
    )
    for strategy in ("union", "merge_asof", "broadcast"):
        out = asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="feature_ts",
            value_cols=["fval"], strategy=strategy,
        ).collect()
        assert len(out) == 1, strategy
        row = out[0]
        assert row["fval"] is None, f"{strategy}: NULL feature value was skipped"
        assert str(row["matched_feature_ts"]).startswith("2024-01-02"), strategy


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_randomized_vs_merge_asof(spark, seed):
    """Randomized micro-corpus (duplicate timestamps, NULL values,
    unmatched entities, empty histories) vs pandas merge_asof, across
    all three strategies."""
    rng = np.random.RandomState(seed)
    n_e, n_p, n_f = 12, 300, 80
    probe = pd.DataFrame(
        {
            "event_id": np.arange(n_p),
            "user_id": rng.randint(0, n_e, n_p),
            "ts": pd.Timestamp("2026-03-01")
            + pd.to_timedelta(rng.randint(0, 10000, n_p) * 60, unit="s"),
        }
    )
    feats = pd.DataFrame(
        {
            # entities 0..7 only: 8..11 have empty histories
            "user_id": rng.randint(0, 8, n_f),
            "feature_ts": pd.Timestamp("2026-03-01")
            + pd.to_timedelta(rng.randint(0, 10000, n_f) * 60, unit="s"),
            "fval": np.where(rng.rand(n_f) < 0.15, np.nan, rng.randn(n_f)),
        }
    )
    # dedupe (entity, ts) on the feature side: at equal ts merge_asof
    # picks the last physical row while the engine picks the latest
    # matched row deterministically — dedupe makes the oracle unambiguous
    feats = feats.drop_duplicates(["user_id", "feature_ts"], keep="last")
    lt, rt = spark.createDataFrame(probe), spark.createDataFrame(feats)
    exp = pd.merge_asof(
        probe.sort_values("ts", kind="stable"),
        feats.sort_values("feature_ts", kind="stable"),
        left_on="ts", right_on="feature_ts", by="user_id", direction="backward",
    ).sort_values("event_id", ignore_index=True)
    for strategy in ("union", "merge_asof", "broadcast"):
        got = (
            asof_join(lt, rt, on="user_id", left_ts="ts", right_ts="feature_ts",
                      value_cols=["fval"], strategy=strategy)
            .toPandas().sort_values("event_id", ignore_index=True)
        )
        assert np.allclose(got["fval"].to_numpy(dtype=float),
                           exp["fval"].to_numpy(dtype=float), equal_nan=True), strategy
        gm, em = got["matched_feature_ts"], exp["feature_ts"]
        assert gm.isna().equals(em.isna()), strategy
        assert (gm.dropna().to_numpy() == em.dropna().to_numpy()).all(), strategy


def test_rolling_stats_vs_numpy(spark, events, events_pd):
    """Trailing 6h range-window mean/count vs a brute-force O(n^2) numpy
    oracle with the same inclusive-boundary semantics."""
    from torchestra_spark.operators.temporal import rolling_stats

    win = 6 * 3600.0
    out = rolling_stats(events, "user_id", "ts", "value", win, stats=("mean", "count"))
    got = (
        out.select("event_id", f"value_roll_mean_{int(win)}s", f"value_roll_count_{int(win)}s")
        .toPandas().sort_values("event_id", ignore_index=True)
    )
    e = events_pd
    sec = e["ts"].astype("int64").to_numpy() / 1e9
    uid = e["user_id"].to_numpy()
    val = e["value"].to_numpy()
    means = np.empty(len(e)); counts = np.empty(len(e), dtype=np.int64)
    for i in range(len(e)):
        m = (uid == uid[i]) & (sec >= sec[i] - win) & (sec <= sec[i])
        means[i] = np.nanmean(val[m]) if np.isfinite(val[m]).any() else np.nan
        counts[i] = np.isfinite(val[m]).sum()
    exp = e.assign(m=means, c=counts).sort_values("event_id", ignore_index=True)
    assert (got[f"value_roll_count_{int(win)}s"].to_numpy() == exp["c"].to_numpy()).all()
    assert np.allclose(
        got[f"value_roll_mean_{int(win)}s"].to_numpy(), exp["m"].to_numpy(), equal_nan=True
    )


def test_asof_broadcast_empty_feature_table(spark, events, events_pd):
    """Empty broadcast side: every probe row unmatched (all-NULL fval),
    no IndexError from gathering into zero-length arrays."""
    empty = spark.createDataFrame(
        [], schema="user_id bigint, feature_ts timestamp, fval double"
    )
    out = asof_join(events, empty, on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=["fval"], strategy="broadcast").toPandas()
    assert len(out) == len(events_pd)
    assert out["fval"].isna().all()


def test_hot_key_detection_sampled_and_exact(spark):
    """The sampled hot-key pre-pass (threshold >= 10k) must always
    catch a 2x-threshold key and never salt a cold one; below the
    sampling threshold counting is exact (r3 verdict item 7)."""
    from torchestra_spark.operators.temporal import _hot_keys

    rows = [("hot",)] * 20_000 + [("cold",)] * 200
    df = spark.createDataFrame(rows, "user_id string").repartition(8)
    # sampled path: threshold 10_000 -> fraction 0.05, cutoff 250
    keys = _hot_keys(df, "user_id", 10_000)
    assert "hot" in keys and "cold" not in keys
    # exact path: threshold 250 (< sampling min) counts every row
    keys2 = _hot_keys(df, "user_id", 250)
    assert "hot" in keys2 and "cold" not in keys2
    # exact path boundary: a key AT the threshold is hot (>=)
    keys3 = _hot_keys(df, "user_id", 200)
    assert sorted(keys3) == ["cold", "hot"]
