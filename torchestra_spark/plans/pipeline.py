"""Pipeline composition + staged fit planner.

The reference composes ops with Sequential/Parallel into a torch.fx
graph and fits stateful ops in dependency *waves* via StatsPlan
(/root/reference/src/torchestra/_pipes.py, _stats_plan.py).  Here the
composition is a set of named **features**, each a chain of ops applied
to an input column or to another feature's output:

    Pipeline({
        "price_z":  Feature("l_extendedprice", [StandardScore(), Clamp(-4, 4)]),
        "price_q":  Feature("price_z", [TDigestDistribution()]),   # stats-behind-stats
        "seg_idx":  Feature("c_mktsegment", [IndexLookup(TopK(3))]),
    })

* chains = the reference Sequential (deps accumulate left->right,
  _stats_plan.py:35-38);
* several features rooted at the same input = the reference Parallel
  (branches share only *prior* deps, _stats_plan.py:29-33);
* a feature rooted at another feature = Sequential chaining across
  named outputs.

Fit executes one dependency wave at a time (Kahn-style, mirroring
_stats_plan.py:89-102).  Within a wave everything is batched for
minimal passes over the data:

* all SCALAR_AGG fits -> **one** ``df.agg(...)`` (single scan; Catalyst
  hash aggregate does partial/merge — the reference's calculate/combine
  split);
* all VOCAB fits -> one unpivot + ``groupBy(op, key).count()`` job
  (single shuffle for every vocabulary in the wave), eliminators pushed
  as Spark predicates before the driver collect;
* all SKETCH fits -> one ``mapInPandas`` pass emitting per-partition
  t-digest centroids, merged on the driver in partition order (the
  reference's shard merge, _normalization.py:601-613).

Transform compiles every feature into Column expressions applied in
dependency order — one logical projection, optimized by Catalyst into a
single whole-stage-codegen'd select (plus Arrow UDF stages where lookups
/ digests need their broadcast state).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence, Set, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from torchestra_spark.core import (
    FitKind,
    FittedTransform,
    MultiTransform,
    Transform,
    type_kind,
)
from torchestra_spark.operators.lookups import Eliminator
from torchestra_spark.state import StateArtifact


class Feature:
    """A named chain of ops over one input reference (source column name
    or another feature's name) — or over SEVERAL references, in which
    case the first op must be a :class:`~torchestra_spark.core.
    MultiTransform` head that fuses the N inputs into one column (the
    reference's ``Parallel(into=tuple)`` + ``TupleAsArgs`` shape,
    _pipes.py:107-149, 306-336)::

        Feature(["l_extendedprice", "l_quantity"], [Ratio(), StandardScore()])

    Downstream ops (including stateful ones — the StandardScore above is
    fit over the composed ratio expression) chain on the head's single
    output exactly like a single-input feature."""

    def __init__(self, input_ref, ops: Optional[Sequence[Transform]] = None):
        if isinstance(input_ref, str):
            self.input_refs: List[str] = [input_ref]
        else:
            self.input_refs = [str(r) for r in input_ref]
            if not self.input_refs:
                raise ValueError("Feature needs at least one input reference")
        self.ops: List[Transform] = list(ops or [])
        if len(self.input_refs) > 1:
            if not self.ops or not isinstance(self.ops[0], MultiTransform):
                raise TypeError(
                    f"multi-input Feature({self.input_refs!r}) requires a "
                    "MultiTransform head as its first op"
                )
            head = self.ops[0]
            if head.n_inputs is not None and head.n_inputs != len(self.input_refs):
                raise ValueError(
                    f"{type(head).__name__} takes {head.n_inputs} inputs but "
                    f"the Feature references {len(self.input_refs)} columns"
                )
            if isinstance(head, FittedTransform):
                raise TypeError("a MultiTransform head cannot be a FittedTransform")
        # a MultiTransform anywhere else would only surface at compose/
        # fit time as an opaque arity TypeError from expr(); reject it
        # at construction with an actionable message instead
        tail_start = 1 if len(self.input_refs) > 1 else 0
        for i, op in enumerate(self.ops[tail_start:], start=tail_start):
            if isinstance(op, MultiTransform):
                where = (
                    f"a single-input Feature({self.input_refs[0]!r})"
                    if len(self.input_refs) == 1
                    else f"position {i} of a multi-input Feature"
                )
                raise TypeError(
                    f"{type(op).__name__} is a MultiTransform and cannot sit in "
                    f"{where}: multi-input ops fuse N input references and are "
                    "only valid as the FIRST op of a multi-input Feature — "
                    "write Feature(['a', 'b'], [" + type(op).__name__ + "(), ...])"
                )

    @property
    def input_ref(self) -> str:
        """Single-input accessor (back-compat); raises on multi-input."""
        if len(self.input_refs) != 1:
            raise ValueError("multi-input Feature has no single input_ref")
        return self.input_refs[0]

    def __repr__(self) -> str:  # pragma: no cover
        refs = self.input_refs[0] if len(self.input_refs) == 1 else self.input_refs
        return f"Feature({refs!r}, {self.ops!r})"


def combine_features(*feature_sets: Dict[str, Feature]) -> Dict[str, Feature]:
    """Merge feature sets into one Pipeline spec, raising on output-name
    collisions — the reference's CombineDicts (merging parallel branch
    outputs with a duplicate-key assertion, _debugging.py:26-42).  Use
    it to assemble a Pipeline from independently-authored feature
    groups::

        Pipeline(combine_features(price_features, category_features))
    """
    out: Dict[str, Feature] = {}
    for fs in feature_sets:
        for name, feat in fs.items():
            if name in out:
                raise ValueError(
                    f"duplicate feature name {name!r} when combining feature sets"
                )
            out[name] = feat
    return out


def _params_close(a: Any, b: Any, rtol: float) -> bool:
    """Structural comparison of two op get_state() payloads: floats
    within rtol (nan == nan), containers recursively, everything else
    exact — decides whether an upstream op's parameters 'changed' for
    the multi-wave fit_update safety check."""
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if np.isnan(fa) or np.isnan(fb):
            return np.isnan(fa) and np.isnan(fb)
        return bool(np.isclose(fa, fb, rtol=rtol, atol=0.0))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_params_close(a[k], b[k], rtol) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_params_close(x, y, rtol) for x, y in zip(a, b))
    return a == b


class Pipeline:
    def __init__(self, features: Dict[str, Feature]):
        self.features = dict(features)
        self._validate()
        # dependency map: stats-op path -> set of upstream stats-op paths
        # (reference StatsPlan.dependencies, _stats_plan.py:20-48)
        self.dependencies = self._find_stats_ops()
        self.stats_op_paths = list(self.dependencies.keys())
        self.waves = list(self._build_waves())

    # ------------------------------------------------------------- structure
    def _validate(self) -> None:
        # DFS cycle check over the (possibly multi-parent) feature DAG
        state: Dict[str, int] = {}  # 1 = visiting, 2 = done

        def visit(name: str) -> None:
            if state.get(name) == 2:
                return
            if state.get(name) == 1:
                raise ValueError(f"feature cycle through {name!r}")
            state[name] = 1
            for ref in self.features[name].input_refs:
                if ref in self.features:
                    visit(ref)
            state[name] = 2

        for name in self.features:
            visit(name)

    def _op(self, path: str) -> Transform:
        name, _, idx = path.rpartition(".")
        return self.features[name].ops[int(idx)]

    def _upstream_stats(self, ref: str) -> List[str]:
        """All stats-op paths upstream of (and including) feature `ref`."""
        if ref not in self.features:
            return []
        feat = self.features[ref]
        out = self._inherited_stats(feat)
        out += [
            f"{ref}.{i}" for i, op in enumerate(feat.ops) if isinstance(op, FittedTransform)
        ]
        return out

    def _inherited_stats(self, feat: Feature) -> List[str]:
        """Order-preserving dedup union of upstream stats paths across
        ALL of a feature's input references."""
        out: List[str] = []
        seen: Set[str] = set()
        for ref in feat.input_refs:
            for p in self._upstream_stats(ref):
                if p not in seen:
                    seen.add(p)
                    out.append(p)
        return out

    def _find_stats_ops(self) -> Dict[str, Set[str]]:
        deps: Dict[str, Set[str]] = {}
        for name, feat in self.features.items():
            inherited = self._inherited_stats(feat)
            chain: List[str] = list(inherited)
            for i, op in enumerate(feat.ops):
                if isinstance(op, FittedTransform):
                    path = f"{name}.{i}"
                    deps[path] = set(chain)
                    chain.append(path)
        return deps

    def _build_waves(self) -> Iterator[List[str]]:
        # Kahn-style waves, reference _stats_plan.py:89-102
        resolved: Set[str] = set()
        while len(resolved) < len(self.stats_op_paths):
            wave = [
                p
                for p in self.stats_op_paths
                if p not in resolved and self.dependencies[p].issubset(resolved)
            ]
            if not wave:  # pragma: no cover - cycle guard
                raise RuntimeError("unresolvable stats dependencies")
            resolved.update(wave)
            yield wave

    # ---------------------------------------------------------- expressions
    def _input_expr(self, path: str) -> Column:
        """Composed Column feeding the op at `path` (the reference's
        minimal input-prefix subgraph, _stats_plan.py:63-87)."""
        name, _, idx = path.rpartition(".")
        return self._compose(name, upto=int(idx))

    def _compose(self, name: str, upto: Optional[int] = None) -> Column:
        feat = self.features[name]

        def ref_col(ref: str) -> Column:
            return self._compose(ref) if ref in self.features else F.col(ref)

        ops = feat.ops if upto is None else feat.ops[:upto]
        if len(feat.input_refs) > 1:
            if not ops:
                # a stats op cannot sit AT the head of a multi-input
                # feature (head must be stateless, enforced in Feature),
                # so upto >= 1 always includes the head here
                raise ValueError(
                    f"multi-input feature {name!r} cannot be composed "
                    "without its MultiTransform head"
                )
            col = ops[0].expr(*[ref_col(r) for r in feat.input_refs])
            ops = ops[1:]
        else:
            col = ref_col(feat.input_refs[0])
        for op in ops:
            col = op.expr(col)
        return col

    def output_expr(self, name: str) -> Column:
        """Fully-composed expression for a feature (requires fit)."""
        return self._compose(name)

    # ------------------------------------------------------------ bind check
    def validate_schema(self, schema) -> None:
        """Bind-time composition check (the reference asserts adjacent
        modules' input/output type annotations at composition,
        _pipes.py:143-146): every feature's source column must exist,
        and each op's declared ``input_kinds`` must accept the kind
        flowing into it.  Raises before any Spark job runs."""
        field_names = set(schema.fieldNames())
        kinds: Dict[str, str] = {}
        for name in self._feature_order():
            feat = self.features[name]

            def ref_kind(ref: str) -> str:
                if ref in self.features:
                    return kinds[ref]
                if ref in field_names:
                    return type_kind(schema[ref].dataType)
                raise ValueError(
                    f"feature {name!r}: input {ref!r} is neither a feature nor a "
                    f"column of the input schema {sorted(field_names)}"
                )

            if len(feat.input_refs) > 1:
                head = feat.ops[0]
                accepted = getattr(head, "input_kinds", None)
                for ref in feat.input_refs:
                    k = ref_kind(ref)
                    if accepted and k != "unknown" and k not in accepted:
                        raise TypeError(
                            f"feature {name!r} head ({type(head).__name__}) "
                            f"accepts {accepted} but input {ref!r} is {k!r}"
                        )
                kind = getattr(head, "output_kind", None) or "unknown"
                rest = list(enumerate(feat.ops))[1:]
            else:
                kind = ref_kind(feat.input_refs[0])
                rest = list(enumerate(feat.ops))
            for i, op in rest:
                accepted = getattr(op, "input_kinds", None)
                if accepted and kind != "unknown" and kind not in accepted:
                    raise TypeError(
                        f"feature {name!r} op {i} ({type(op).__name__}) accepts "
                        f"{accepted} but receives {kind!r} "
                        f"(from {feat.input_refs!r})"
                    )
                kind = getattr(op, "output_kind", None) or kind
            kinds[name] = kind

    # ----------------------------------------------------------------- fit
    def fit(self, df: DataFrame) -> "Pipeline":
        self.validate_schema(df.schema)
        for wave in self.waves:
            self._fit_wave(df, wave)
        return self

    def fit_update(self, df: DataFrame, upstream_rtol: float = 0.0) -> "Pipeline":
        """Incremental refit: collect this delta's statistics and merge
        them into the previous fit via each op's ``merge_stats`` — the
        reference's combine_stats shard merge applied across fit calls
        (daily feature-store refresh without rescanning history).

        Exactness: scalar moments and NoThreshold vocabularies merge
        exactly; t-digest merges within sketch tolerance; pruning
        eliminators re-prune the merged dict (per-fit pushdown pruning
        makes cross-delta threshold crossings approximate); exact
        percentiles raise.

        Stats-behind-stats chains (multi-wave) are refit-safe ONLY when
        the upstream ops' parameters come out of the delta merge
        unchanged (within ``upstream_rtol`` for numeric params): the
        downstream delta statistics are then computed under the same
        upstream transform the historical statistics used, so the merge
        stays exact.  That is the common daily-refresh shape — a frozen
        vocabulary / saturated quantile sketch upstream, rolling counts
        or moments downstream.  If an upstream op's parameters DID
        change, merging downstream would silently mix statistics
        measured under two different transforms, so this raises an
        actionable error instead (run a full ``fit`` over history, or
        pass a larger ``upstream_rtol`` to accept the drift as an
        approximation — the error bound on downstream moments is then
        O(rtol) of the upstream param shift)."""
        self.validate_schema(df.schema)
        changed: Set[str] = set()
        for wave in self.waves:
            for p in wave:
                bad = sorted(self.dependencies[p] & changed)
                if bad:
                    raise ValueError(
                        f"fit_update: op {p!r} depends on {bad}, whose parameters "
                        f"changed in this delta (beyond upstream_rtol="
                        f"{upstream_rtol}); its historical statistics were "
                        "measured under the OLD upstream transform and cannot "
                        "be merged exactly. Run a full fit() over history, or "
                        "raise upstream_rtol to accept the approximation. "
                        "NOTE: earlier waves of this pipeline have already "
                        "been delta-merged."
                    )
            is_upstream = [p for p in wave if any(p in self.dependencies[q] for q in self.stats_op_paths)]
            before = {p: self._op(p).get_state() for p in is_upstream}
            self._fit_wave(df, wave, update=True)
            changed |= {
                p
                for p in is_upstream
                if not _params_close(before[p], self._op(p).get_state(), upstream_rtol)
            }
        return self

    @staticmethod
    def _finalize(op: FittedTransform, stats: Any, update: bool) -> None:
        if update:
            prev = getattr(op, "_raw_stats", None)
            if prev is None:
                raise RuntimeError(
                    f"{type(op).__name__}: fit_update requires a prior fit in "
                    "this process (raw statistics are not persisted in state)"
                )
            stats = op.merge_stats(prev, stats)
        op._raw_stats = stats
        op.fit_finalize(stats)

    def fit_transform(self, df: DataFrame, keep_input: bool = True) -> DataFrame:
        return self.fit(df).transform(df, keep_input=keep_input)

    def _fit_wave(self, df: DataFrame, wave: List[str], update: bool = False) -> None:
        scalar: List[Tuple[str, FittedTransform, Column]] = []
        vocab: List[Tuple[str, FittedTransform, Column]] = []
        sketch: List[Tuple[str, FittedTransform, Column]] = []
        grouped: List[Tuple[str, FittedTransform, Column]] = []
        for path in wave:
            op = self._op(path)
            assert isinstance(op, FittedTransform)
            col = self._input_expr(path)
            if op.fit_kind is FitKind.SCALAR_AGG:
                scalar.append((path, op, col))
            elif op.fit_kind is FitKind.VOCAB:
                vocab.append((path, op, col))
            elif op.fit_kind is FitKind.SKETCH:
                sketch.append((path, op, col))
            elif op.fit_kind is FitKind.GROUPED:
                grouped.append((path, op, col))
            else:  # pragma: no cover
                raise ValueError(op.fit_kind)

        if scalar:
            self._fit_scalar(df, scalar, update)
        if vocab:
            self._fit_vocab(df, vocab, update)
        if sketch:
            self._fit_sketch(df, sketch, update)
        if grouped:
            self._fit_grouped(df, grouped, update)

    @staticmethod
    def _fit_scalar(df: DataFrame, ops: List[Tuple[str, FittedTransform, Column]], update: bool = False) -> None:
        """One df.agg for every scalar-stat op in the wave (shared scan)."""
        aggs: List[Column] = []
        slots: List[Tuple[FittedTransform, List[str]]] = []
        for j, (_path, op, col) in enumerate(ops):
            names = []
            for stat_name, agg in op.fit_aggs(col).items():
                alias = f"s{j}__{stat_name}"
                aggs.append(agg.alias(alias))
                names.append(stat_name)
            slots.append((op, names))
        row = df.agg(*aggs).collect()[0].asDict()
        for j, (op, names) in enumerate(slots):
            Pipeline._finalize(op, {n: row[f"s{j}__{n}"] for n in names}, update)

    # Hard ceiling on vocabulary rows collected to the driver: above
    # this, a fit would OOM the driver silently — raise an actionable
    # error instead (add a TopK/MinThreshold eliminator).  Override via
    # SPARK_GRAFT_MAX_VOCAB.
    _MAX_VOCAB = int(__import__("os").environ.get("SPARK_GRAFT_MAX_VOCAB", 10_000_000))

    @staticmethod
    def _collect_vocab(df: DataFrame, what: str) -> list:
        cap = Pipeline._MAX_VOCAB
        rows = df.limit(cap + 1).collect()
        if len(rows) > cap:
            raise RuntimeError(
                f"{what}: vocabulary exceeds {cap} surviving keys — the "
                "driver cannot hold it.  Add an eliminator (TopK / "
                "MinThreshold / RatioThreshold) or raise SPARK_GRAFT_MAX_VOCAB."
            )
        return rows

    @staticmethod
    def _fit_vocab(df: DataFrame, ops: List[Tuple[str, FittedTransform, Column]], update: bool = False) -> None:
        """One unpivot + groupBy job for every vocabulary in the wave;
        eliminators applied Spark-side before the collect.  A lone
        vocabulary skips the unpivot (plain groupBy, no explode)."""
        if len(ops) == 1:
            _path, op, col = ops[0]
            elim: Eliminator = getattr(op, "eliminator")
            counts = (
                df.select(col.cast("string").alias("key"))
                .filter(F.col("key").isNotNull())
                .groupBy("key")
                .agg(F.count("*").alias("cnt"))
            )
            rows = Pipeline._collect_vocab(
                elim.prune_spark(counts, "key", "cnt", group_cols=[]), _path
            )
            Pipeline._finalize(op, {r["key"]: r["cnt"] for r in rows}, update)
            return
        structs = [
            F.struct(F.lit(j).alias("op"), col.cast("string").alias("key"))
            for j, (_p, _o, col) in enumerate(ops)
        ]
        pairs = df.select(F.explode(F.array(*structs)).alias("kv")).select("kv.op", "kv.key")
        counts = (
            pairs.filter(F.col("key").isNotNull()).groupBy("op", "key").agg(F.count("*").alias("cnt"))
        )
        counts.persist()
        try:
            pruned = None
            for j, (_path, op, _col) in enumerate(ops):
                elim: Eliminator = getattr(op, "eliminator")
                sub = counts.filter(F.col("op") == j)
                sub = elim.prune_spark(sub, "key", "cnt", group_cols=[])
                pruned = sub if pruned is None else pruned.unionAll(sub)
            rows = Pipeline._collect_vocab(pruned, "vocab wave")
        finally:
            counts.unpersist()
        by_op: Dict[int, Dict[str, int]] = {j: {} for j in range(len(ops))}
        for r in rows:
            by_op[r["op"]][r["key"]] = r["cnt"]
        for j, (_path, op, _col) in enumerate(ops):
            Pipeline._finalize(op, by_op[j], update)


    @staticmethod
    def _fit_grouped(
        df: DataFrame, ops: List[Tuple[str, FittedTransform, Column]], update: bool = False
    ) -> None:
        """Per-group scalar fits: ONE groupBy(group_col).agg per distinct
        group column (all ops sharing a group column share the scan and
        the shuffle); collected dicts are bounded by the same cap as
        vocabularies (a group column IS a vocabulary)."""
        by_group: Dict[str, List[Tuple[str, FittedTransform, Column]]] = {}
        for path, op, col in ops:
            by_group.setdefault(op.group_col, []).append((path, op, col))
        for gcol, group_ops in by_group.items():
            aggs: List[Column] = []
            slots: List[Tuple[FittedTransform, List[str]]] = []
            for j, (_path, op, col) in enumerate(group_ops):
                names = []
                for stat_name, agg in op.fit_aggs(col).items():
                    aggs.append(agg.alias(f"g{j}__{stat_name}"))
                    names.append(stat_name)
                slots.append((op, names))
            rows = Pipeline._collect_vocab(
                df.groupBy(F.col(gcol).cast("string").alias("__g")).agg(*aggs),
                f"grouped fit on {gcol!r}",
            )
            for j, (op, names) in enumerate(slots):
                stats = {
                    r["__g"]: {n: r[f"g{j}__{n}"] for n in names}
                    for r in rows
                    if r["__g"] is not None
                }
                Pipeline._finalize(op, stats, update)

    # above this many input partitions, per-partition sketch partials are
    # tree-merged executor-side into <= this many runs before the driver
    # collect — the collect stays O(FANIN * 2*compression) rows no matter
    # how many partitions the 100 TB scan has
    _SKETCH_FANIN = 64

    @staticmethod
    def _fit_sketch(df: DataFrame, ops: List[Tuple[str, FittedTransform, Column]], update: bool = False) -> None:
        """One mapInPandas pass -> per-partition t-digest centroids for
        every sketch op in the wave; contiguous partition runs are merged
        executor-side when the partition count is large (deterministic:
        runs merge in partition order, like the reference's sequential
        shard merge); driver merge in run order."""
        from pyspark import TaskContext

        sketchers = [op for (_p, op, _c) in ops]
        sel = df.select(*[col.cast("double").alias(f"c{j}") for j, (_p, _o, col) in enumerate(ops)])
        # A small/single-file table would run the WHOLE sketch on one
        # task (r8: a single-row-group parquet cannot split, so the fit
        # was serial).  ``sel`` is just the cast doubles — a 1-to-N
        # round-robin shuffle of it is ~16 B/row and unlocks a fully
        # parallel fit; a no-op at scale where scans carry >> cores
        # partitions.  Digest partials differ by partitioning (as they
        # already do across input layouts); the merge discipline and the
        # sketch's checked accuracy tolerance are partition-independent.
        from torchestra_spark.functions.dedup import _ensure_parallelism

        sel = _ensure_parallelism(sel)
        n_ops = len(ops)

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else 0
            digests = [sketchers[j]._td.new_digest() for j in range(n_ops)]
            for pdf in batches:
                for j in range(n_ops):
                    vals = pdf[f"c{j}"].to_numpy(dtype=np.float64, na_value=np.nan)
                    sketchers[j]._td.add_values(digests[j], vals[~np.isnan(vals)])
            out = []
            for j in range(n_ops):
                d = digests[j]
                sketchers[j]._td._process(d)
                k = d.n_processed
                out.append(
                    pd.DataFrame(
                        {
                            "op": np.full(k, j, dtype=np.int32),
                            "pid": np.full(k, pid, dtype=np.int32),
                            "mean": d.processed_means[:k],
                            "weight": d.processed_weights[:k],
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"op": [], "pid": [], "mean": [], "weight": []}
            )

        centroid_schema = "op int, pid int, mean double, weight double"
        rows_df = sel.mapInPandas(build, centroid_schema)

        n_parts = sel.rdd.getNumPartitions()
        if n_parts > Pipeline._SKETCH_FANIN:
            import math as _math

            group_size = _math.ceil(n_parts / Pipeline._SKETCH_FANIN)

            def merge_run(pdf: pd.DataFrame) -> pd.DataFrame:
                # one (op, gid) group = a contiguous pid run; merge its
                # digests in pid order, emit one digest's centroids
                j = int(pdf["op"].iloc[0])
                gid = int(pdf["pid"].iloc[0]) // group_size
                td = sketchers[j]._td
                t = td.new_digest()
                for pid in sorted(pdf["pid"].unique()):
                    # processed centroids are mean-ascending; restore order
                    sub = pdf[pdf["pid"] == pid].sort_values("mean", kind="stable")
                    d = td.new_digest()
                    k = len(sub)
                    d.processed_means[:k] = sub["mean"].to_numpy()
                    d.processed_weights[:k] = sub["weight"].to_numpy()
                    d.n_processed = k
                    d.processed_weight = float(sub["weight"].sum())
                    if k:
                        d.mean_min = float(sub["mean"].iloc[0])
                        d.mean_max = float(sub["mean"].iloc[-1])
                    td.merge_digests(t, d)
                td._process(t)
                k = t.n_processed
                return pd.DataFrame(
                    {
                        "op": np.full(k, j, dtype=np.int32),
                        "pid": np.full(k, gid, dtype=np.int32),
                        "mean": t.processed_means[:k],
                        "weight": t.processed_weights[:k],
                    }
                )

            rows_df = rows_df.withColumn(
                "gid", (F.col("pid") / group_size).cast("int")
            ).groupBy("op", "gid").applyInPandas(
                lambda pdf: merge_run(pdf.drop(columns=["gid"])), centroid_schema
            )

        # Arrow transfer + numpy grouping (r8): a Row-based collect of
        # FANIN * 2*compression centroid rows plus a Python row loop was
        # the slow half of the fit once the sketch pass itself ran
        # parallel.  Order guarantees are unchanged: toPandas preserves
        # partition-concatenation order, so rows within one (op, pid)
        # stay in their emitted mean-ascending order, and np.unique
        # yields pids sorted (the reference's shard-merge order).
        pdf_rows = rows_df.toPandas()
        ops_arr = pdf_rows["op"].to_numpy()
        pid_arr = pdf_rows["pid"].to_numpy()
        mean_arr = pdf_rows["mean"].to_numpy()
        weight_arr = pdf_rows["weight"].to_numpy()
        for j, (_path, op, _col) in enumerate(ops):
            opm = ops_arr == j
            pj, mj, wj = pid_arr[opm], mean_arr[opm], weight_arr[opm]
            partials = []
            for pid in np.unique(pj):
                pm = pj == pid
                means, weights = mj[pm], wj[pm]
                d = op._td.new_digest()
                k = len(means)
                d.processed_means[:k] = means
                d.processed_weights[:k] = weights
                d.n_processed = k
                d.processed_weight = float(np.sum(weights))
                if k:
                    d.mean_min = float(means[0])
                    d.mean_max = float(means[-1])
                partials.append(d)
            Pipeline._finalize(op, partials, update)

    # ------------------------------------------------------------ transform
    def transform(self, df: DataFrame, keep_input: bool = True) -> DataFrame:
        """Dependency-ordered withColumns; Catalyst collapses the
        projections into one select, and its ExtractPythonUDFs rule
        batches all independent pandas UDFs at that level into ONE
        ArrowEvalPython stage — k lookups already share a single Arrow
        crossing with no engine-side fusion (measured: an explicit
        struct-fused UDF is ~25% SLOWER than letting Catalyst coalesce;
        see bench lookups_fused vs lookups_unfused and
        tests/test_pipeline_plan.py::test_transform_single_arrow_stage).
        ``fused_lookups`` remains available for plans where lookups land
        in different projection levels."""
        self.validate_schema(df.schema)
        order = self._feature_order()
        for name in order:
            feat = self.features[name]
            # prior feature outputs are materialized columns here, so a
            # plain F.col works for feature refs and source columns alike
            if len(feat.input_refs) > 1:
                col = feat.ops[0].expr(*[F.col(r) for r in feat.input_refs])
                rest = feat.ops[1:]
            else:
                col = F.col(feat.input_refs[0])
                rest = feat.ops
            for op in rest:
                col = op.expr(col)
            df = df.withColumn(name, col)
        if not keep_input:
            df = df.select(*order)
        return df

    def _feature_order(self) -> List[str]:
        out: List[str] = []
        visiting: Set[str] = set()

        def visit(name: str) -> None:
            if name in out:
                return
            if name in visiting:  # pragma: no cover - guarded in _validate
                raise ValueError("cycle")
            visiting.add(name)
            for ref in self.features[name].input_refs:
                if ref in self.features:
                    visit(ref)
            visiting.discard(name)
            out.append(name)

        for name in self.features:
            visit(name)
        return out

    # ---------------------------------------------------------------- state
    def save_state(self, path: str) -> None:
        states: Dict[str, Dict[str, Any]] = {}
        for name, feat in self.features.items():
            for i, op in enumerate(feat.ops):
                if isinstance(op, FittedTransform):
                    states[f"{name}.{i}"] = op.get_state()
        StateArtifact(states).save(path)

    def load_state(self, path: str) -> "Pipeline":
        artifact = StateArtifact.load(path)
        for op_path, state in artifact.states.items():
            op = self._op(op_path)
            op.set_state(state)
        return self
