"""Point-in-time / temporal operators — the north-rule core.

The reference library has no temporal ops (its lookups are the only
join-like construct, /root/reference/src/torchestra/_lookups.py); these
extend its fit/transform engine into a point-in-time feature store over
entity x timestamp data, per the driver's north rule: as-of join with
explicit skew handling, lag/lead, fill-forward backfill, gap-based
sessionization — zero temporal leakage (every joined feature_ts <=
event ts).

Scale design notes
------------------
* ``asof_join`` default strategy is **union + window fill-forward**:
  one shuffle on the entity key, fully JVM-side (whole-stage codegen +
  a single window scan), no UDF.  At 1000 executors this is a plain
  hash-partitioned sort — the same cost profile as a sort-merge join.
* The ``merge_asof`` strategy co-partitions both sides by entity hash
  and runs ``pandas.merge_asof`` per partition inside ``applyInPandas``
  — useful when the probe side must keep all its columns wide.
* Skew: a single hot entity lands in one window partition.  The
  ``salt_buckets`` option splits each entity's *probe* rows into N
  hash(ts)-buckets and replicates the (much smaller) feature side into
  every bucket — preserving point-in-time order within each bucket
  while spreading the hot entity over N tasks.  AQE's skew-join
  splitting handles residual imbalance.
* Window ops (lag/lead/ffill/sessionize) are single-shuffle Catalyst
  window functions partitioned by entity.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ts_sec(col: Column) -> Column:
    """Timestamp -> epoch seconds (double).  TIMESTAMP_NTZ can't cast to
    numeric in Spark 4; route through TIMESTAMP (lossless under the
    engine's UTC session timezone, see session.py)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "feature_ts",
    value_cols: Optional[Sequence[str]] = None,
    tolerance_sec: Optional[float] = None,
    strategy: str = "auto",
    salt_buckets: int = 1,
    salt_threshold: Optional[int] = None,
    keep_right_ts: bool = True,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the latest right
    row of the same entity with ``right_ts <= left_ts`` (exact matches
    allowed — pandas ``merge_asof`` semantics).

    Leakage-free by construction: joined values only ever come from
    right rows at or before the probe timestamp.

    Precondition: probe timestamps must be non-null (a NULL event time
    has no point-in-time meaning); filter them upstream.

    Strategy (all three produce identical results — pytest equivalence
    + the same SQL oracle check every path):

    * ``"auto"`` (default): pick ``broadcast`` when the FEATURE side is
      provably small — Catalyst size estimate under
      ``TORCHESTRA_ASOF_AUTO_BROADCAST_BYTES`` (default 64 MB, 0
      disables) confirmed by an actual row count under the broadcast
      guardrail — else fall back to ``union``.  The same reasoning as
      Spark's own ``autoBroadcastJoinThreshold`` for equi-joins:
      broadcasting the side that fits removes the ONLY shuffle of the
      (wide, 10^12-row at scale) probe side.  Explicit ``salt_buckets``
      is a skew declaration for the shuffle path, so it forces union.
    * ``"union"``: union-tag + window fill-forward — one entity-hash
      shuffle of both sides, fully JVM-side.  The scale-out path when
      the feature side does NOT fit in executor memory.
    * ``"broadcast"``: force the broadcast kernel (raises above the
      row guardrail).
    * ``"merge_asof"``: cogrouped ``pandas.merge_asof`` per entity.

    Skew (``salt_buckets > 1``, union strategy): salting is applied only
    to **hot entities** — those with ``>= salt_threshold`` probe rows
    (default ``DEFAULT_SALT_THRESHOLD``).  Cold entities keep the plain
    single-bucket path, so the feature side is replicated xN only for
    the handful of keys that need it instead of the whole table.
    """
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in (on, right_ts)]
    )
    if strategy == "auto":
        n = _auto_broadcast_rows(right, salt_buckets)
        if n is not None:
            return _asof_broadcast(
                left, right, on, left_ts, right_ts, value_cols, tolerance_sec,
                keep_right_ts, precounted=n,
            )
        strategy = "union"
    if strategy == "union":
        return _asof_union(
            left, right, on, left_ts, right_ts, value_cols, tolerance_sec,
            salt_buckets, salt_threshold, keep_right_ts,
        )
    if strategy == "merge_asof":
        return _asof_merge(
            left, right, on, left_ts, right_ts, value_cols, tolerance_sec, keep_right_ts
        )
    if strategy == "broadcast":
        return _asof_broadcast(
            left, right, on, left_ts, right_ts, value_cols, tolerance_sec, keep_right_ts
        )
    raise ValueError(f"unknown strategy {strategy!r}")


# Auto-strategy gate: feature sides whose Catalyst size ESTIMATE is
# under this take the broadcast kernel (after a confirming count).
# Estimates can be wrong both ways after filters/aggregates: an
# overestimate only costs the (still-correct) union path, an
# underestimate is caught by the count confirmation — never an OOM'd
# broadcast.  0 disables auto-broadcast entirely (always union).
_AUTO_BROADCAST_MAX_BYTES = int(
    os.environ.get("TORCHESTRA_ASOF_AUTO_BROADCAST_BYTES", str(64 * 1024 * 1024))
)


def _auto_stats_small(right: DataFrame) -> bool:
    """Free Catalyst plan-statistics gate: True when the optimizer
    estimates ``right`` under the auto-broadcast byte threshold."""
    try:
        raw = right._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps scala.BigInt to a Python int; keep a string fallback
        est = raw if isinstance(raw, int) else int(str(raw))
    except Exception:  # pragma: no cover - stats are best-effort
        return False
    return est <= _AUTO_BROADCAST_MAX_BYTES


def _auto_broadcast_rows(right: DataFrame, salt_buckets: int) -> Optional[int]:
    """Row count of ``right`` when the auto strategy should broadcast
    it, else None (union).  Two-step decision: the free statistics gate,
    then one cheap count of the (estimated-small) side to confirm — so
    a huge feature table never pays a count just to be told to shuffle.
    Note the residual risk: both gates can be fooled together when
    Catalyst underestimates a <=5M-row frame of very wide rows (the
    row guardrail bounds rows, not bytes) — set
    TORCHESTRA_ASOF_AUTO_BROADCAST_BYTES=0 to force union for such
    workloads."""
    if salt_buckets > 1 or _AUTO_BROADCAST_MAX_BYTES <= 0:
        return None
    if not _auto_stats_small(right):
        return None
    n = right.count()
    return n if n <= _BROADCAST_MAX_ROWS else None


# Probe rows per entity above which a key counts as hot and gets salted.
# A cold entity's window partition sorts fine in one task; only keys
# beyond this actually skew a 1000-executor shuffle.
DEFAULT_SALT_THRESHOLD = 1_000_000


# Hot-key detection samples this fraction of the probe side once the
# threshold is large enough for sampling to be statistically safe —
# a 20-100x cheaper pre-pass on huge tables.  Salting is correctness-
# preserving for ANY key subset, so sampling can only cost a little
# skew protection at the threshold boundary, never correctness.
_SALT_SAMPLE_FRACTION = 0.05
_SALT_SAMPLE_MIN_THRESHOLD = 10_000  # below this, count exactly


def _hot_keys(left: DataFrame, on: str, threshold: int) -> list:
    """Entities with >= threshold probe rows, collected to the driver.
    One map-side-combined count per key (over a sample when the
    threshold is large); the result is <= total_rows/threshold keys —
    small by construction, so collecting (and later broadcasting) it is
    always safe.  Collecting lets the planner skip the whole salting
    machinery when nothing is hot."""
    src, cutoff = left, threshold
    if threshold >= _SALT_SAMPLE_MIN_THRESHOLD:
        src = left.sample(fraction=_SALT_SAMPLE_FRACTION, seed=7)
        # halved cutoff: catch keys whose sampled count undershoots
        cutoff = max(1, int(threshold * _SALT_SAMPLE_FRACTION * 0.5))
    rows = (
        src.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= cutoff)
        .select(F.col(on))
        .collect()
    )
    return [r[0] for r in rows]


def _hot_tagger(spark, on: str, hot_keys: list):
    """Returns a function adding a boolean ``__hot`` column marking the
    hot entities.  Skew-aware salting applies ONLY to these keys: hot
    probe rows route to hash(ts) % N buckets and hot feature rows
    replicate into all N buckets (each bucket sees the full feature
    history, so point-in-time order is preserved).  Cold entities stay
    in bucket 0 unreplicated — at a zipf distribution this keeps feature
    shuffle volume ~1x instead of xN."""
    if len(hot_keys) <= 10_000:
        # literal IN-set: stays inside whole-stage codegen
        def tag(df: DataFrame) -> DataFrame:
            return df.withColumn("__hot", F.col(on).isin(hot_keys))

        return tag
    # very wide hot sets ride a broadcast-join marker instead of a
    # mile-long literal expression
    hot_df = F.broadcast(
        spark.createDataFrame([(k,) for k in hot_keys], [on]).withColumn(
            "__hot_m", F.lit(True)
        )
    )

    def tag(df: DataFrame) -> DataFrame:
        return (
            df.join(hot_df.withColumnRenamed(on, "__hk"), df[on] == F.col("__hk"), "left")
            .withColumn("__hot", F.col("__hot_m").isNotNull())
            .drop("__hk", "__hot_m")
        )

    return tag


def _salt_probe(tagged: DataFrame, ts: str, bucket: str, salt_buckets: int) -> DataFrame:
    zero = F.lit(0).cast("bigint")
    return tagged.withColumn(
        bucket,
        F.when(F.col("__hot"), F.pmod(F.xxhash64(F.col(ts)), F.lit(salt_buckets))).otherwise(zero),
    ).drop("__hot")


def _salt_feature(tagged: DataFrame, bucket: str, salt_buckets: int) -> DataFrame:
    zero = F.lit(0).cast("bigint")
    return tagged.withColumn(
        bucket,
        F.explode(
            F.when(
                F.col("__hot"),
                F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"),
            ).otherwise(F.array(zero))
        ),
    ).drop("__hot")


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: List[str],
    tolerance_sec: Optional[float],
    salt_buckets: int,
    salt_threshold: Optional[int],
    keep_right_ts: bool,
) -> DataFrame:
    """Union-tag + fill-forward: one shuffle, no UDF.

    Both sides are unioned on a common (entity, ts) spine with a side
    tag; within each entity ordered by (ts, side) — feature rows sort
    *before* probe rows at equal ts so exact matches are visible — a
    ``last(value, ignorenulls=True)`` running window carries each
    feature value forward onto probe rows.
    """
    ts = "__ts"
    side = "__side"  # 0 = feature (sorts first at ties), 1 = probe
    l_cols = left.columns

    salted = salt_buckets > 1
    bucket = "__bucket"
    l_sel = [F.col(c) for c in l_cols]
    # All payload rides ONE struct per feature row: matched_ts + every
    # value column.  Filling forward last(struct, ignorenulls=True)
    # picks the latest *feature row as a whole*, so a feature row whose
    # value is SQL NULL still wins (the probe sees NULL value + its
    # matched_ts) — exact pandas merge_asof semantics.  Per-column
    # last(ignorenulls) would skip NULL values and pair a stale value
    # with a newer matched_ts.
    from pyspark.sql.types import StructField, StructType

    fv_type = StructType(
        [StructField("__mts", right.schema[right_ts].dataType)]
        + [StructField(f"__v_{c}", right.schema[c].dataType) for c in value_cols]
    )
    lhs = left.select(
        *l_sel,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(side),
        F.lit(None).cast(fv_type).alias("__fv"),
    )
    rhs = right.select(
        *[
            (F.col(on) if c == on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in l_cols
        ],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        ).alias("__fv"),
    )
    hot_keys = (
        _hot_keys(left, on, salt_threshold or DEFAULT_SALT_THRESHOLD) if salted else []
    )
    if salted and hot_keys:
        tag = _hot_tagger(left.sparkSession, on, hot_keys)
        lhs = _salt_probe(tag(lhs), ts, bucket, salt_buckets)
        rhs = _salt_feature(tag(rhs), bucket, salt_buckets)
        part = [on, bucket]
    else:
        part = [on]

    u = lhs.unionByName(rhs)
    w = Window.partitionBy(*part).orderBy(F.col(ts).asc(), F.col(side).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ff = F.last(F.col("__fv"), ignorenulls=True).over(w)
    filled = u.select(
        *l_cols,
        F.col(ts),
        F.col(side),
        *[ff[f"__v_{c}"].alias(f"__f_{c}") for c in value_cols],
        ff["__mts"].alias("__f_ts"),
    )
    out = filled.filter(F.col(side) == 1)
    if tolerance_sec is not None:
        in_tol = F.col("__f_ts").isNotNull() & (
            _ts_sec(F.col(ts)) - _ts_sec(F.col("__f_ts")) <= F.lit(float(tolerance_sec))
        )
        out = out.select(
            *l_cols,
            *[F.when(in_tol, F.col(f"__f_{c}")).alias(c) for c in value_cols],
            F.when(in_tol, F.col("__f_ts")).alias("__f_ts"),
        )
    else:
        out = out.select(
            *l_cols, *[F.col(f"__f_{c}").alias(c) for c in value_cols], F.col("__f_ts")
        )
    if keep_right_ts:
        out = out.withColumnRenamed("__f_ts", f"matched_{right_ts}")
    else:
        out = out.drop("__f_ts")
    return out


def asof_join_multi(
    left: DataFrame,
    tables: Sequence[dict],
    on: str,
    left_ts: str = "ts",
    salt_buckets: int = 1,
    salt_threshold: Optional[int] = None,
    strategy: str = "auto",
) -> DataFrame:
    """Fused backward as-of join of K feature tables onto one probe
    spine in ONE union + ONE entity-partitioned window pass.

    ``tables`` is a sequence of specs::

        dict(name="purch", df=purchases, ts="feature_ts",
             value_cols=None, tolerance_sec=None)

    Per table the semantics are exactly ``asof_join(strategy='union')``:
    latest right row with ``right_ts <= left_ts`` (exact ties match),
    emitted as the table's value columns plus ``{name}_matched_ts``.

    Why fused: the sequential loop shuffles the (wide, 10^12-row) probe
    spine once PER TABLE — k tables, k Exchanges of the big side.  Here
    every table's payload rides its own nullable struct column on one
    shared union spine; the K ``last(struct_k, ignorenulls=True)``
    window functions share a single window spec, so Catalyst evaluates
    them in ONE Window operator over ONE Exchange + sort of the spine.
    Per-table fill-forwards stay independent because rows of table j
    carry NULL in table k's struct and ``ignorenulls`` skips them.

    Skew: one shared hot-key pass over the probe side; hot probe rows
    split into hash(ts) buckets, every table's hot feature rows
    replicate into all buckets (cold keys pay nothing).

    Strategy: ``"auto"`` (default) chains the zero-shuffle broadcast
    kernel per table when EVERY feature side is provably small (the
    ``asof_join`` auto gate) — k broadcast matches pipeline inside one
    probe-scan stage, the probe spine never shuffles at all.  Otherwise
    (or with ``strategy="union"`` / explicit ``salt_buckets``) the
    fused one-union-one-window pass above.  Results are identical
    either way: each table's fill-forward is independent, so k chained
    broadcast matches compute exactly the k fused window columns."""
    from pyspark.sql.types import StructField, StructType

    specs = [dict(t) for t in tables]
    if not specs:
        return left
    ts = "__ts"
    side = "__side"  # 0 = feature (sorts first at ties), 1 = probe
    bucket = "__bucket"
    l_cols = left.columns
    out_names: List[str] = list(l_cols)
    for k, sp in enumerate(specs):
        right, rts = sp["df"], sp["ts"]
        sp["value_cols"] = list(
            sp.get("value_cols")
            or [c for c in right.columns if c not in (on, rts)]
        )
        sp["matched"] = f"{sp['name']}_matched_ts"
        for c in sp["value_cols"] + [sp["matched"]]:
            if c in out_names:
                raise ValueError(
                    f"asof_join_multi: output column {c!r} of table "
                    f"{sp['name']!r} collides with an earlier column; "
                    "pass value_cols / rename to disambiguate"
                )
            out_names.append(c)
        sp["fv"] = f"__fv{k}"
        sp["fv_type"] = StructType(
            [StructField("__mts", right.schema[rts].dataType)]
            + [StructField(f"__v_{c}", right.schema[c].dataType) for c in sp["value_cols"]]
        )

    if strategy == "auto":
        # all k FREE stats gates first — one oversized table decides
        # union without any count job having been paid (review r8)
        if (
            salt_buckets <= 1
            and _AUTO_BROADCAST_MAX_BYTES > 0
            and all(_auto_stats_small(sp["df"]) for sp in specs)
        ):
            counts = [sp["df"].count() for sp in specs]
            if all(n <= _BROADCAST_MAX_ROWS for n in counts):
                return _asof_broadcast_multi(left, specs, on, left_ts, counts)
    elif strategy != "union":
        raise ValueError(f"unknown strategy {strategy!r}")

    lhs = left.select(
        *[F.col(c) for c in l_cols],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(side),
        *[F.lit(None).cast(sp["fv_type"]).alias(sp["fv"]) for sp in specs],
    )
    sides = [lhs]
    for k, sp in enumerate(specs):
        right, rts = sp["df"], sp["ts"]
        sides.append(
            right.select(
                *[
                    (F.col(on) if c == on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
                    for c in l_cols
                ],
                F.col(rts).alias(ts),
                F.lit(0).alias(side),
                *[
                    (
                        F.struct(
                            F.col(rts).alias("__mts"),
                            *[F.col(c).alias(f"__v_{c}") for c in sp["value_cols"]],
                        )
                        if j == k
                        else F.lit(None).cast(specs[j]["fv_type"])
                    ).alias(specs[j]["fv"])
                    for j in range(len(specs))
                ],
            )
        )

    salted = salt_buckets > 1
    hot_keys = (
        _hot_keys(left, on, salt_threshold or DEFAULT_SALT_THRESHOLD) if salted else []
    )
    if salted and hot_keys:
        tag = _hot_tagger(left.sparkSession, on, hot_keys)
        sides = [_salt_probe(tag(sides[0]), ts, bucket, salt_buckets)] + [
            _salt_feature(tag(r), bucket, salt_buckets) for r in sides[1:]
        ]
        part = [on, bucket]
    else:
        part = [on]

    u = sides[0]
    for r in sides[1:]:
        u = u.unionByName(r)
    w = Window.partitionBy(*part).orderBy(F.col(ts).asc(), F.col(side).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    proj: List[Column] = [F.col(c) for c in l_cols]
    for sp in specs:
        ff = F.last(F.col(sp["fv"]), ignorenulls=True).over(w)
        tol = sp.get("tolerance_sec")
        if tol is not None:
            in_tol = ff["__mts"].isNotNull() & (
                _ts_sec(F.col(ts)) - _ts_sec(ff["__mts"]) <= F.lit(float(tol))
            )
            proj += [F.when(in_tol, ff[f"__v_{c}"]).alias(c) for c in sp["value_cols"]]
            proj.append(F.when(in_tol, ff["__mts"]).alias(sp["matched"]))
        else:
            proj += [ff[f"__v_{c}"].alias(c) for c in sp["value_cols"]]
            proj.append(ff["__mts"].alias(sp["matched"]))
    return u.select(*proj, F.col(side)).filter(F.col(side) == 1).drop(side)


def _asof_merge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: List[str],
    tolerance_sec: Optional[float],
    keep_right_ts: bool,
) -> DataFrame:
    """Co-partition by entity + per-partition ``pandas.merge_asof``
    (Arrow-batched, vectorized — no per-row Python).

    Partition-boundary-correct because partitioning is on the entity
    key only (never on time), so an entity's full feature history is
    visible to its probe rows.
    """
    l_cols = left.columns
    rv = right.select(
        F.col(on), F.col(right_ts), *[F.col(c) for c in value_cols]
    ).withColumnRenamed(right_ts, "__rts")
    lt = left.withColumn("__side", F.lit(1))
    rt = rv.withColumn("__side", F.lit(0))
    # single cogroup-style shuffle: tag and union, group by entity
    merged_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{c}` {right.schema[c].dataType.simpleString()}" for c in value_cols]
        + [f"`matched_{right_ts}` {right.schema[right_ts].dataType.simpleString()}"]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=l_cols + value_cols + [f"matched_{right_ts}"])
        lpdf = lpdf.sort_values(left_ts, kind="stable")
        rpdf = rpdf.sort_values("__rts", kind="stable")[["__rts"] + value_cols]
        out = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on="__rts",
            direction="backward",
            tolerance=pd.Timedelta(seconds=tolerance_sec) if tolerance_sec is not None else None,
        )
        out = out.rename(columns={"__rts": f"matched_{right_ts}"})
        return out[l_cols + value_cols + [f"matched_{right_ts}"]]

    out = (
        lt.groupBy(on)
        .cogroup(rt.groupBy(on))
        .applyInPandas(lambda lp, rp: merge(lp, rp), merged_schema)
    )
    if not keep_right_ts:
        out = out.drop(f"matched_{right_ts}")
    return out


# Broadcast guardrail: each feature row costs ~8B (ts) + 8-ish B per
# value column as contiguous numpy arrays, plus the entity index.  5M
# rows ~ a few hundred MB per executor — the realistic ceiling for a
# torrent-broadcast table that every Python worker must hold.
_BROADCAST_MAX_ROWS = 5_000_000


# "no match" marker for the broadcast kernels' matched-ts column:
# INT64_MIN micros (~year -290308) cannot collide with any real
# timestamp the engine can represent, unlike -1 (1 µs before epoch)
_TS_UNMATCHED = -(2**63)


def _bcast_build(right: DataFrame, on: str, right_ts: str, value_cols: List[str]) -> dict:
    """Flat broadcastable (entity-code, ts, values) arrays sorted by
    (code, ts): each entity's history is one contiguous block."""
    import numpy as np

    pdf = (
        right.select(
            F.col(on).alias("__e"),
            F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__t"),
            *[F.col(c) for c in value_cols],
        )
        # A NULL feature ts has no point-in-time meaning; keeping it
        # would also corrupt the kernel (pandas sorts NaN last, then
        # int64 conversion turns it into INT64_MIN, breaking the
        # sorted-key invariant searchsorted relies on) — drop it here,
        # matching the probe-side non-null precondition.
        .filter(F.col(right_ts).isNotNull())
        .toPandas()
        .sort_values(["__e", "__t"], kind="stable")
        .reset_index(drop=True)
    )
    # dense entity codes in sorted order -> the code column is itself
    # sorted, so each entity's history is one contiguous block
    codes_sorted, uniq = pd.factorize(pdf["__e"], sort=False)
    codes = codes_sorted.astype(np.int64)
    t = pdf["__t"].to_numpy(np.int64)
    ent_index = pd.Series(np.arange(len(uniq), dtype=np.int64), index=uniq)
    # rank-composed key (r8): key_i = code_i * (N+1) + global_rank(t_i)
    # is strictly increasing (codes ascend; within a code, t ascends and
    # the stable global rank preserves tie order), so ONE searchsorted
    # against it answers "latest row of THIS code with t <= probe_t" for
    # a whole batch — replacing the per-distinct-code Python loop that
    # dominated the match kernel.  Fits int64: codes and N are each
    # bounded by _BROADCAST_MAX_ROWS (5M < 2^23), product < 2^46.
    n = len(t)
    order = np.argsort(t, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    return {
        "codes": codes,
        "t": t,
        "t_sorted": t[order],
        "keys": codes * np.int64(n + 1) + rank,
        "vals": {c: pdf[c].to_numpy() for c in value_cols},
        "index": ent_index,
    }


def _bcast_match_idx(tb: dict, entity: pd.Series, ts_us: pd.Series, tol_us):
    """Vectorized backward-as-of match of a probe batch against a
    broadcast table: entity -> code via one C-level hash-map lookup,
    probe t -> global t rank via one ``searchsorted``, then ONE
    ``searchsorted`` of the composed (code, rank) keys against the
    table's precomputed strictly-increasing key array (``_bcast_build``)
    — no per-code loop, no pandas groupby, no per-row Python (the
    previous per-distinct-code loop was ~20k Python iterations per
    batch on a 20k-entity table and dominated the kernel).  Returns
    int64 row indices into the broadcast arrays, -1 where unmatched."""
    import numpy as np

    b_codes, b_t = tb["codes"], tb["t"]
    n_rows = len(entity)
    if len(b_t) == 0:
        # empty feature table: every probe row is unmatched — a gather
        # would index position 0 of zero-length arrays
        return np.full(n_rows, -1, dtype=np.int64)
    codes = tb["index"].reindex(entity.to_numpy()).to_numpy(np.float64)
    # unknown entity -> code -1: its composed key is < every table key
    # (ub <= N so -1*(N+1) + ub - 1 < 0), landing at p = -1 -> unmatched
    kc = np.where(np.isnan(codes), -1, codes).astype(np.int64)
    kt = ts_us.to_numpy(np.int64)
    n = np.int64(len(b_t) + 1)
    ub = np.searchsorted(tb["t_sorted"], kt, side="right")
    p = np.searchsorted(tb["keys"], kc * n + ub - 1, side="right") - 1
    gather = np.maximum(p, 0)
    valid = (p >= 0) & (b_codes[gather] == kc)
    if tol_us is not None:
        valid &= kt - b_t[gather] <= tol_us
    return np.where(valid, p, -1)


def _bcast_match_cols(
    tb: dict, entity: pd.Series, ts_us: pd.Series, tol_us, value_cols: List[str],
    matched_field: str,
) -> dict:
    """Column dict (values + matched-us) for one broadcast table."""
    import numpy as np

    out_idx = _bcast_match_idx(tb, entity, ts_us, tol_us)
    hit = out_idx >= 0
    gather = np.maximum(out_idx, 0)
    b_t, b_vals = tb["t"], tb["vals"]
    n_rows = len(entity)
    data = {}
    for c in value_cols:
        if len(b_t) == 0:
            col = pd.Series([None] * n_rows, dtype=object)
        else:
            # object dtype so unmatched rows (and NaN feature values)
            # cross Arrow as SQL NULL, not float NaN
            col = pd.Series(b_vals[c][gather].astype(object))
            col[~hit] = None
        data[c] = col
    # unmatched sentinel = INT64_MIN, NOT -1: -1 is a legitimate
    # pre-epoch timestamp_micros and would blank matched_ts while the
    # value columns are filled (review r8)
    out_ts = (
        np.full(n_rows, _TS_UNMATCHED, dtype=np.int64)
        if len(b_t) == 0
        else np.where(hit, b_t[gather], _TS_UNMATCHED)
    )
    data[matched_field] = pd.Series(out_ts)
    return data


def _asof_broadcast_multi(
    left: DataFrame, specs: Sequence[dict], on: str, left_ts: str, counts: Sequence[int]
) -> DataFrame:
    """Fused k-table broadcast as-of: ONE Arrow crossing matches every
    table (vs k chained pandas-UDF stages — k-fold fewer JVM<->Python
    transfers of the probe's (entity, ts) columns; guide §4.1).  The
    probe side is never shuffled.  Output columns/types are identical
    to the union-fused pass: l_cols, then per table value_cols +
    ``{name}_matched_ts``."""
    spark = left.sparkSession
    tables = []
    for sp, n in zip(specs, counts):
        if n > _BROADCAST_MAX_ROWS:  # caller gates; keep the guardrail
            raise ValueError(
                f"feature side {sp['name']!r} has {n} rows; too large to broadcast"
            )
        tables.append(_bcast_build(sp["df"], on, sp["ts"], sp["value_cols"]))
    bc = spark.sparkContext.broadcast(tables)
    tols = [
        None if sp.get("tolerance_sec") is None else int(sp["tolerance_sec"] * 1_000_000)
        for sp in specs
    ]
    all_vcols = [list(sp["value_cols"]) for sp in specs]
    fields = ", ".join(
        f"`{c}` {sp['df'].schema[c].dataType.simpleString()}"
        for sp in specs
        for c in sp["value_cols"]
    )
    fields += ", " + ", ".join(f"`__matched_us_{k}` bigint" for k in range(len(specs)))

    @F.pandas_udf(fields)
    def _match_all(entity: pd.Series, ts_us: pd.Series) -> pd.DataFrame:
        data = {}
        for k, tb in enumerate(bc.value):
            data.update(
                _bcast_match_cols(
                    tb, entity, ts_us, tols[k], all_vcols[k], f"__matched_us_{k}"
                )
            )
        return pd.DataFrame(data)

    l_cols = left.columns
    out = left.withColumn(
        "__m", _match_all(F.col(on), F.unix_micros(F.col(left_ts).cast("timestamp")))
    )
    sel: List[Column] = [F.col(c) for c in l_cols]
    for k, sp in enumerate(specs):
        sel += [F.col(f"__m.{c}").alias(c) for c in sp["value_cols"]]
        sel.append(
            F.when(
                F.col(f"__m.__matched_us_{k}") != F.lit(_TS_UNMATCHED),
                F.timestamp_micros(F.col(f"__m.__matched_us_{k}")).cast(
                    sp["df"].schema[sp["ts"]].dataType
                ),
            ).alias(sp["matched"])
        )
    return out.select(*sel)


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: List[str],
    tolerance_sec: Optional[float],
    keep_right_ts: bool,
    precounted: Optional[int] = None,
) -> DataFrame:
    """Broadcast as-of: when the feature side fits in executor memory
    (the common feature-store shape — features per entity are small even
    when the probe table is 10^12 rows), ship flat (entity-code, ts,
    values) arrays sorted by (code, ts) to every task and match fully
    vectorized per Arrow batch: entity -> code via one C-level hash-map
    lookup, block bounds via two ``searchsorted`` calls over the sorted
    code array, then one ``searchsorted`` per distinct code in the batch
    (numpy slices only — no pandas groupby, no per-row Python).  ZERO
    shuffle of the (wide) probe side — the same reasoning as
    broadcasting the small side of an equi-join.
    """
    spark = left.sparkSession
    n = precounted if precounted is not None else right.count()
    if n > _BROADCAST_MAX_ROWS:
        raise ValueError(
            f"feature side has {n} rows; too large to broadcast — use strategy='union'"
        )
    table = _bcast_build(right, on, right_ts, value_cols)
    bc = spark.sparkContext.broadcast(table)
    tol_us = None if tolerance_sec is None else int(tolerance_sec * 1_000_000)

    fields = ", ".join(
        [f"`{c}` {right.schema[c].dataType.simpleString()}" for c in value_cols]
        + ["`__matched_us` bigint"]
    )

    @F.pandas_udf(fields)
    def _match(entity: pd.Series, ts_us: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            _bcast_match_cols(bc.value, entity, ts_us, tol_us, value_cols, "__matched_us")
        )

    l_cols = left.columns
    out = left.withColumn(
        "__m", _match(F.col(on), F.unix_micros(F.col(left_ts).cast("timestamp")))
    )
    matched_ts = F.when(
        F.col("__m.__matched_us") != F.lit(_TS_UNMATCHED),
        F.timestamp_micros(F.col("__m.__matched_us")).cast(right.schema[right_ts].dataType),
    )
    sel = [F.col(c) for c in l_cols] + [F.col(f"__m.{c}").alias(c) for c in value_cols]
    if keep_right_ts:
        sel.append(matched_ts.alias(f"matched_{right_ts}"))
    return out.select(*sel)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    valid_from: str,
    valid_to: str,
    value_cols: Optional[Sequence[str]] = None,
    how: str = "left",
) -> DataFrame:
    """Point-in-interval (validity-window / SCD-2) join: attach the
    right row whose [valid_from, valid_to) interval contains the probe
    timestamp, per entity.

    Plan shape: equi hash join on the entity key + range predicate —
    one shuffle on `on`; AQE handles residual skew.  For guaranteed
    at-most-one match keep right intervals non-overlapping (standard
    SCD-2 invariant).
    """
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in (on, valid_from, valid_to)]
    )
    r = right.select(
        F.col(on).alias("__r_on"),
        F.col(valid_from).alias("__vf"),
        F.col(valid_to).alias("__vt"),
        *[F.col(c) for c in value_cols],
    )
    cond = (
        (left[on] == r["__r_on"])
        & (left[left_ts] >= r["__vf"])
        & (left[left_ts] < r["__vt"])
    )
    out = left.join(r, cond, how)
    return out.select(*left.columns, *value_cols,
                      F.col("__vf").alias(f"matched_{valid_from}"))


# --------------------------------------------------------------- window ops
def _order_cols(ts):
    return [ts] if isinstance(ts, str) else list(ts)


_ROLLING_FNS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev_samp,
}


def rolling_stats(
    df: DataFrame,
    entity: str,
    ts: str,
    value: str,
    window_sec: float,
    stats: Sequence[str] = ("mean", "min", "max", "count"),
    suffix: Optional[str] = None,
) -> DataFrame:
    """Trailing time-range window features: for each row, aggregate
    ``value`` over this entity's rows with ``ts`` in
    ``[row.ts - window_sec, row.ts]`` (both ends inclusive — rows at
    exactly the boundary or with equal timestamps are all included,
    independent of physical order, so results are deterministic under
    ties).

    One Catalyst range-frame window per call: a single entity-hash
    exchange + sort, all aggregates computed in the same frame pass —
    the classic "7-day rolling mean/min/max" feature at any scale.
    Leakage-free: the frame never looks past the current timestamp.
    """
    for s in stats:
        if s not in _ROLLING_FNS:
            raise ValueError(f"unknown stat {s!r}; choose from {sorted(_ROLLING_FNS)}")
    sfx = suffix if suffix is not None else f"_{int(window_sec)}s"
    # range frames need integral bounds: order by epoch micros (long)
    w = (
        Window.partitionBy(entity)
        .orderBy(F.unix_micros(F.col(ts).cast("timestamp")))
        .rangeBetween(-int(window_sec * 1_000_000), 0)
    )
    out = df
    for s in stats:
        out = out.withColumn(f"{value}_roll_{s}{sfx}", _ROLLING_FNS[s](F.col(value)).over(w))
    return out


def lag_lead(
    df: DataFrame,
    entity: str,
    ts,
    col: str,
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (),
) -> DataFrame:
    """lag/lead features per entity ordered by ts (SURVEY.md §2.8).
    ``ts`` may be a list of columns for deterministic tiebreaks."""
    w = Window.partitionBy(entity).orderBy(*_order_cols(ts))
    for k in lags:
        df = df.withColumn(f"{col}_lag{k}", F.lag(col, k).over(w))
    for k in leads:
        df = df.withColumn(f"{col}_lead{k}", F.lead(col, k).over(w))
    return df


def fill_forward(df: DataFrame, entity: str, ts, cols: Sequence[str]) -> DataFrame:
    """Backfill nulls with the latest prior non-null value per entity."""
    w = (
        Window.partitionBy(entity)
        .orderBy(*_order_cols(ts))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumns({c: F.last(F.col(c), ignorenulls=True).over(w) for c in cols})


def sessionize(
    df: DataFrame,
    entity: str,
    ts,
    gap_sec: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event of the same entity exceeds ``gap_sec``.
    Session ids are 0-based per entity (cumulative sum of boundaries).
    ``ts`` may be a list of columns (first must be the timestamp)."""
    order = _order_cols(ts)
    tcol = order[0]
    w = Window.partitionBy(entity).orderBy(*order)
    gap = _ts_sec(F.col(tcol)) - F.lag(_ts_sec(F.col(tcol))).over(w)
    boundary = F.when(gap.isNull() | (gap > F.lit(float(gap_sec))), 1).otherwise(0)
    run = (
        Window.partitionBy(entity)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(session_col, F.sum(boundary).over(run) - F.lit(1))
