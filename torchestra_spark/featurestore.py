"""Point-in-time feature store facade — the north-star product surface.

Ties the engine together: as-of joins of feature tables onto an event
spine (leakage-free), window features (lag/lead, fill-forward,
sessionization), fitted normalization/vocabulary pipelines, state
artifacts, and checkpointed resumable materialization.

    store = FeatureStore(entity="user_id", ts="ts")
    store.add_feature_table(purchases, ts="feature_ts", name="purch")
    store.add_lags("value", lags=(1, 2))
    store.add_sessionization(gap_sec=1800)
    store.add_pipeline(Pipeline({
        "value_z": Feature("value", [StandardScore()]),
    }))
    fv = store.build(events)                       # fit + transform
    store.materialize(fv, "/out", resume=True)     # checkpointed write
    store.save_state("/out/_state.json")
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from torchestra_spark.checkpoint import CheckpointedWriter
from torchestra_spark.operators.temporal import (
    asof_join,
    asof_join_multi,
    fill_forward,
    lag_lead,
    rolling_stats,
    sessionize,
)
from torchestra_spark.plans.pipeline import Pipeline
from torchestra_spark.state import StateArtifact


class FeatureStore:
    def __init__(self, entity: str, ts: str, order_tiebreak: Optional[str] = None):
        self.entity = entity
        self.ts = ts
        self._order = [ts] + ([order_tiebreak] if order_tiebreak else [])
        self._feature_tables: List[Tuple[str, DataFrame, str, dict]] = []
        self._lags: List[Tuple[str, Sequence[int], Sequence[int]]] = []
        self._rolling: List[Tuple[str, float, Tuple[str, ...]]] = []
        self._ffill: List[str] = []
        self._session_gap: Optional[float] = None
        self._pipeline: Optional[Pipeline] = None

    # ------------------------------------------------------------ declaration
    def add_feature_table(
        self,
        df: DataFrame,
        ts: str,
        name: str,
        value_cols: Optional[Sequence[str]] = None,
        strategy: str = "union",
        tolerance_sec: Optional[float] = None,
        salt_buckets: int = 1,
        salt_threshold: Optional[int] = None,
    ) -> "FeatureStore":
        """Point-in-time join this table's latest values (<= event ts)."""
        self._feature_tables.append(
            (
                name,
                df,
                ts,
                dict(
                    value_cols=list(value_cols) if value_cols else None,
                    strategy=strategy,
                    tolerance_sec=tolerance_sec,
                    salt_buckets=salt_buckets,
                    salt_threshold=salt_threshold,
                ),
            )
        )
        return self

    def add_lags(self, col: str, lags: Sequence[int] = (1,), leads: Sequence[int] = ()) -> "FeatureStore":
        self._lags.append((col, tuple(lags), tuple(leads)))
        return self

    def add_fill_forward(self, *cols: str) -> "FeatureStore":
        self._ffill.extend(cols)
        return self

    def add_sessionization(self, gap_sec: float) -> "FeatureStore":
        self._session_gap = gap_sec
        return self

    def add_rolling(
        self, col: str, window_sec: float, stats: Sequence[str] = ("mean", "min", "max", "count")
    ) -> "FeatureStore":
        """Trailing time-range window features over ``col`` (one
        range-frame pass per declaration)."""
        self._rolling.append((col, float(window_sec), tuple(stats)))
        return self

    def add_pipeline(self, pipeline: Pipeline) -> "FeatureStore":
        self._pipeline = pipeline
        return self

    # ------------------------------------------------------------- execution
    def build(self, events: DataFrame, fit: bool = True) -> DataFrame:
        """Assemble the feature vector: as-of joins -> window features ->
        fitted pipeline transform.  ``fit=False`` reuses loaded state."""
        df = events
        is_union = [
            kw.get("strategy", "union") == "union"
            for _n, _f, _t, kw in self._feature_tables
        ]
        fused = [t for t, u in zip(self._feature_tables, is_union) if u]
        rest = [t for t, u in zip(self._feature_tables, is_union) if not u]
        # an EXPLICIT strategy='union' on any fused table is a user
        # declaration that its feature side must not be collected —
        # honor it by pinning the whole fused pass to union; tables
        # that left strategy unset ride the library default (auto)
        fused_strategy = (
            "union"
            if any(kw.get("strategy") == "union" for _n, _f, _t, kw in fused)
            else "auto"
        )
        if len(fused) >= 2:
            # ONE union + ONE entity-partitioned window pass for all
            # union-strategy tables: k tables would otherwise shuffle
            # the (wide) probe spine k times
            df = asof_join_multi(
                df,
                [
                    dict(
                        name=name, df=ft, ts=fts,
                        value_cols=kw.get("value_cols"),
                        tolerance_sec=kw.get("tolerance_sec"),
                    )
                    for name, ft, fts, kw in fused
                ],
                on=self.entity,
                left_ts=self.ts,
                salt_buckets=max(kw.get("salt_buckets", 1) for _n, _f, _t, kw in fused),
                # most sensitive (lowest) explicit threshold wins — one
                # shared hot-key pass covers every fused table
                salt_threshold=min(
                    (kw["salt_threshold"] for _n, _f, _t, kw in fused
                     if kw.get("salt_threshold") is not None),
                    default=None,
                ),
                strategy=fused_strategy,
            )
        else:
            rest = self._feature_tables
        for name, ft, fts, kw in rest:
            df = asof_join(df, ft, on=self.entity, left_ts=self.ts, right_ts=fts, **kw)
            df = df.withColumnRenamed(f"matched_{fts}", f"{name}_matched_ts")
        for col, lags, leads in self._lags:
            df = lag_lead(df, self.entity, self._order, col, lags=lags, leads=leads)
        for col, win, stats in self._rolling:
            df = rolling_stats(df, self.entity, self.ts, col, win, stats=stats)
        if self._ffill:
            df = fill_forward(df, self.entity, self._order, self._ffill)
        if self._session_gap is not None:
            df = sessionize(df, self.entity, self._order, self._session_gap)
        if self._pipeline is not None:
            if fit:
                self._pipeline.fit(df)
            df = self._pipeline.transform(df)
        return df

    def serve_stream(self, events_stream: DataFrame) -> DataFrame:
        """Serve the store to a LIVE event stream: every feature table
        joins point-in-time via the broadcast as-of strategy (a static
        feature snapshot shipped to every task + vectorized searchsorted
        match — zero shuffle of the stream, streaming-legal because no
        batch-only op touches the stream side), then the batch-fitted
        pipeline's transforms apply unchanged (pure Column exprs over
        frozen state).

        Requirements: ``build(events, fit=True)`` (or ``load_state``)
        must have run first so pipeline state is frozen, and each
        feature table must fit the broadcast budget — the same contract
        as ``asof_join(strategy='broadcast')``.  Window features (lags,
        rolling, sessionization) are fit-time history ops; for their
        streaming twins use ``streaming.stream_sessionize_ids`` /
        ``stream_windowed_stats`` explicitly."""
        out = events_stream
        for name, ft, fts, kw in self._feature_tables:
            out = asof_join(
                out, ft, on=self.entity, left_ts=self.ts, right_ts=fts,
                value_cols=kw.get("value_cols"),
                tolerance_sec=kw.get("tolerance_sec"),
                strategy="broadcast",
            )
            out = out.withColumnRenamed(f"matched_{fts}", f"{name}_matched_ts")
        if self._pipeline is not None:
            out = self._pipeline.transform(out)
        return out

    def assert_leakage_free(self, built: DataFrame) -> None:
        """Hard gate: every matched feature timestamp <= event ts."""
        for name, _ft, _fts, _kw in self._feature_tables:
            c = f"{name}_matched_ts"
            n = built.filter(F.col(c) > F.col(self.ts)).count()
            if n:
                raise AssertionError(f"temporal leakage: {n} rows in {c}")

    def materialize(
        self,
        built: DataFrame,
        path: str,
        n_buckets: int = 64,
        wave_size: int = 16,
        fingerprint: str = "",
    ) -> None:
        """Checkpointed, resumable bucketed write keyed on the entity."""
        CheckpointedWriter(
            path, key_col=self.entity, n_buckets=n_buckets,
            wave_size=wave_size, fingerprint=fingerprint,
        ).run(built)

    # ------------------------------------------------------------------ state
    def save_state(self, path: str) -> None:
        if self._pipeline is not None:
            self._pipeline.save_state(path)
        else:
            StateArtifact({}).save(path)

    def load_state(self, path: str) -> "FeatureStore":
        if self._pipeline is not None:
            self._pipeline.load_state(path)
        return self
