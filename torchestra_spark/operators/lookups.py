"""Categorical lookup operators + vocabulary eliminators.

Semantics from /root/reference/src/torchestra/_lookups.py.  Fit is a
``groupBy(key).count()`` (Spark's hash aggregate = the reference's
count-dict partial/merge, _lookups.py:31-61); eliminators are pushed
into Spark as HAVING-style predicates / top-k windows *before* the
vocabulary is collected, so only the surviving (small) vocabulary ever
reaches the driver.  Transforms apply the broadcast vocabulary dict in
an Arrow-batched pandas UDF (``Series.map`` — vectorized, no per-row
Python) — the broadcast-hash-join-in-spirit of _lookups.py:219-220.

Ordering parity: ``sort_counts`` replicates the reference's
``_sort_counts`` (_lookups.py:547-551) — keys sorted ascending, then a
*stable* descending sort on counts — i.e. count DESC, key ASC.  Spark's
UTF-8 binary string ordering equals Python's code-point ordering, so the
Spark-side TopK window (`row_number` over count DESC, key ASC) keeps
exact tie parity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from torchestra_spark.core import FitKind, FittedTransform, Transform


def sort_counts(counts: Dict[str, int]) -> List[str]:
    """Reference `_sort_counts` (_lookups.py:547-551): count DESC with
    stable alphabetical (code-point) tiebreak."""
    keys = sorted(counts.keys())
    return sorted(keys, key=lambda k: -counts[k])  # python sort is stable


# --------------------------------------------------------------- eliminators
class Eliminator:
    """Vocabulary pruning predicate (reference _lookups.py:477-551).

    ``prune_dict`` is the exact driver-side semantics over a full counts
    dict; ``prune_spark`` applies the same predicate inside Spark on the
    (key, cnt) aggregate *before* collecting — so unbounded cardinality
    never reaches the driver.  Ratio thresholds are computed against the
    pre-elimination total, like the reference (_lookups.py:518-524).
    """

    def prune_dict(self, counts: Dict[str, int]) -> Dict[str, int]:
        raise NotImplementedError

    def prune_spark(self, df: DataFrame, key: str, cnt: str, group_cols: List[str]) -> DataFrame:
        raise NotImplementedError

    def get_state(self) -> Dict[str, Any]:
        return {"kind": type(self).__name__}


class NoThreshold(Eliminator):
    """Identity — _lookups.py:477-483."""

    def prune_dict(self, counts: Dict[str, int]) -> Dict[str, int]:
        return counts

    def prune_spark(self, df: DataFrame, key: str, cnt: str, group_cols: List[str]) -> DataFrame:
        return df


class MinThreshold(Eliminator):
    """Keep count >= threshold — _lookups.py:486-503."""

    def __init__(self, threshold: int):
        self.threshold = threshold

    def prune_dict(self, counts: Dict[str, int]) -> Dict[str, int]:
        return {k: v for k, v in counts.items() if v >= self.threshold}

    def prune_spark(self, df: DataFrame, key: str, cnt: str, group_cols: List[str]) -> DataFrame:
        return df.filter(F.col(cnt) >= F.lit(int(self.threshold)))

    def get_state(self) -> Dict[str, Any]:
        return {"kind": "MinThreshold", "threshold": self.threshold}


class RatioThreshold(Eliminator):
    """Keep count/total >= threshold (total = pre-elimination sum) —
    _lookups.py:506-524."""

    def __init__(self, threshold: float):
        self.threshold = threshold

    def prune_dict(self, counts: Dict[str, int]) -> Dict[str, int]:
        total = sum(counts.values())
        return {k: v for k, v in counts.items() if v / total >= self.threshold}

    def prune_spark(self, df: DataFrame, key: str, cnt: str, group_cols: List[str]) -> DataFrame:
        if not group_cols:
            # global total via a 1-row scalar aggregate broadcast back
            # onto the counts — not a partition-less sum window that
            # would funnel every distinct key through one task
            total = df.agg(F.sum(F.col(cnt)).alias("__total"))
            return (
                df.crossJoin(F.broadcast(total))
                .filter(F.col(cnt) / F.col("__total") >= F.lit(float(self.threshold)))
                .drop("__total")
            )
        w = Window.partitionBy(*[F.col(c) for c in group_cols])
        total = F.sum(F.col(cnt)).over(w)
        return (
            df.withColumn("__total", total)
            .filter(F.col(cnt) / F.col("__total") >= F.lit(float(self.threshold)))
            .drop("__total")
        )

    def get_state(self) -> Dict[str, Any]:
        return {"kind": "RatioThreshold", "threshold": self.threshold}


class TopK(Eliminator):
    """Top-k by count, ties alphabetical (stable) — _lookups.py:527-544."""

    def __init__(self, k: int):
        self.k = k

    def prune_dict(self, counts: Dict[str, int]) -> Dict[str, int]:
        return {k: counts[k] for k in sort_counts(counts)[: self.k]}

    def prune_spark(self, df: DataFrame, key: str, cnt: str, group_cols: List[str]) -> DataFrame:
        if not group_cols:
            # orderBy + limit compiles to TakeOrderedAndProject: every
            # partition keeps a partial top-k and the driver merges k
            # rows per partition — no single-partition ranking window,
            # so a web-scale distinct-key set never funnels through one
            # task.  Tie rule (count DESC, key ASC) is identical to
            # _sort_counts / the row_number formulation it replaces.
            return df.orderBy(F.col(cnt).desc(), F.col(key).asc()).limit(int(self.k))
        w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
            F.col(cnt).desc(), F.col(key).asc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= F.lit(int(self.k)))
            .drop("__rn")
        )

    def get_state(self) -> Dict[str, Any]:
        return {"kind": "TopK", "k": self.k}


def eliminator_from_state(state: Dict[str, Any]) -> Eliminator:
    kind = state["kind"]
    if kind == "NoThreshold":
        return NoThreshold()
    if kind == "MinThreshold":
        return MinThreshold(state["threshold"])
    if kind == "RatioThreshold":
        return RatioThreshold(state["threshold"])
    if kind == "TopK":
        return TopK(state["k"])
    raise ValueError(f"unknown eliminator {kind!r}")


# ------------------------------------------------------------- broadcast map
_BROADCAST_MIN = 1024  # below this, ship the dict in the UDF closure


class MappingSpec:
    """The portable essence of a fitted lookup: (dict, OOV default,
    output Spark type, int-keyed?).  Lets k lookups fuse into ONE Arrow
    crossing (``fused_lookups``) instead of k pandas UDF stages — the
    reference's operator-stacking rationale (MeanScale.stack,
    _normalization.py:71-88) applied to the transform side."""

    def __init__(self, mapping: Dict[Any, Any], default: Any, out_type: str, int_keys: bool):
        self.mapping = mapping
        self.default = default
        self.out_type = out_type
        self.int_keys = int_keys


def fused_lookups(df: "DataFrame", outputs: Dict[str, tuple]) -> "DataFrame":
    """Apply k fitted lookups in ONE pandas UDF / ONE Arrow crossing.

    ``outputs`` maps output column name -> (fitted lookup op, input
    column name).  All k broadcast dicts ride one TorrentBroadcast and
    the UDF returns a struct of the k results, unpacked into plain
    columns.

    MEASURED CAVEAT: Catalyst's ExtractPythonUDFs already batches k
    independent ``op.expr`` pandas UDFs at the same projection into ONE
    ArrowEvalPython stage (one Arrow crossing), and that coalesced plan
    is ~25% FASTER than this struct-building UDF (bench lookups_fused
    vs lookups_unfused).  Use this only when lookups end up in
    DIFFERENT projection levels (e.g. a lookup consuming another UDF's
    output forces a stage split) or when consolidating k broadcasts
    matters more than CPU.
    """
    spark = SparkSession.getActiveSession()
    names = list(outputs.keys())
    specs = []
    in_cols = []
    for out in names:
        op, col_name = outputs[out]
        specs.append(op.mapping_spec())
        in_cols.append(F.col(col_name))
    payload = [(s.mapping, s.default, s.out_type, s.int_keys) for s in specs]
    bc = None
    if spark is not None and sum(len(s.mapping) for s in specs) >= _BROADCAST_MIN:
        bc = spark.sparkContext.broadcast(payload)
        payload = None  # keep the dicts out of the pickled task closure

    fields = ", ".join(f"`{out}` {s.out_type}" for out, s in zip(names, specs))

    @F.pandas_udf(fields)
    def _apply(*cols: pd.Series) -> pd.DataFrame:
        ps = bc.value if bc is not None else payload
        data = {}
        for out, (d, default, out_type, int_keys), s in zip(names, ps, cols):
            if int_keys:
                s = s.astype("int64")
            o = s.map(d)
            if default is not None:
                o = o.fillna(default)
            if out_type == "bigint":
                o = o.astype("int64")
            data[out] = o
        return pd.DataFrame(data)

    tmp = "__fused"
    out_df = df.withColumn(tmp, _apply(*in_cols))
    for out in names:
        out_df = out_df.withColumn(out, F.col(f"{tmp}.{out}"))
    return out_df.drop(tmp)


def _map_udf(vocab: Dict[str, Any], default: Any, out_type: str, int_keys: bool) -> "F.udf":
    """Arrow-vectorized dict application.  Large vocabularies ride a
    TorrentBroadcast instead of the task closure."""
    spark = SparkSession.getActiveSession()
    bc = None
    if spark is not None and len(vocab) >= _BROADCAST_MIN:
        bc = spark.sparkContext.broadcast(vocab)
        vocab = None  # keep the dict out of the pickled task closure

    @F.pandas_udf(out_type)
    def _apply(s: pd.Series) -> pd.Series:
        d = bc.value if bc is not None else vocab
        if int_keys:
            s = s.astype("int64")
        out = s.map(d)
        if default is not None:
            out = out.fillna(default)
        if out_type == "bigint":
            out = out.astype("int64")
        return out

    return _apply



def _merge_counts(old: Dict[str, int], new: Dict[str, int], eliminator: "Eliminator") -> Dict[str, int]:
    """Counter-add two collected vocab payloads, then re-apply the
    eliminator over the merged dict — combine_stats across fit calls.
    Exact for NoThreshold; with pruning eliminators the per-fit Spark
    pushdown has already dropped sub-threshold keys within each fit, so
    an incrementally-updated vocabulary can undercount keys that only
    cross the threshold across deltas (documented approximation)."""
    merged = dict(old)
    for k, v in new.items():
        merged[k] = merged.get(k, 0) + v
    return eliminator.prune_dict(merged)


# ----------------------------------------------------------------- string ops
class CountLookup(FittedTransform):
    """string -> training-set count (0 if absent) — _lookups.py:6-77."""

    fit_kind = FitKind.VOCAB
    int_keys = False
    input_kinds = ("string",)
    output_kind = "numeric"

    def __init__(self, eliminator: Optional[Eliminator] = None):
        super().__init__()
        self.eliminator = eliminator or NoThreshold()
        self.counts: Dict[str, int] = {"": 0}
        self.total = 0

    def fit_finalize(self, pruned_counts: Dict[str, int]) -> None:
        # counts arrive already pruned (eliminator pushed into Spark);
        # mirrors apply_stats post-elimination (_lookups.py:63-74)
        self.total = sum(pruned_counts.values())
        self.counts = dict(pruned_counts) if self.total > 0 else {"": 0}
        self._fitted = True

    def expr(self, col: Column) -> Column:
        self._require_fitted()
        return _map_udf(self.counts, 0, "bigint", self.int_keys)(col)

    def mapping_spec(self) -> "MappingSpec":
        self._require_fitted()
        return MappingSpec(self.counts, 0, "bigint", self.int_keys)

    def merge_stats(self, old: Dict[str, int], new: Dict[str, int]) -> Dict[str, int]:
        return _merge_counts(old, new, self.eliminator)


    def get_state(self) -> Dict[str, Any]:
        return {"counts": self.counts, "total": self.total, "eliminator": self.eliminator.get_state()}

    def set_state(self, state: Dict[str, Any]) -> None:
        self.counts = dict(state["counts"])
        self.total = int(state["total"])
        self.eliminator = eliminator_from_state(state["eliminator"])
        self._fitted = True


class RatioLookup(FittedTransform):
    """string -> count/total (0.0 if total==0) — _lookups.py:80-134."""

    fit_kind = FitKind.VOCAB
    int_keys = False
    input_kinds = ("string",)
    output_kind = "numeric"

    def __init__(self, eliminator: Optional[Eliminator] = None):
        super().__init__()
        self.eliminator = eliminator or NoThreshold()
        self.ratios: Dict[str, float] = {}
        self.total = 0

    def fit_finalize(self, pruned_counts: Dict[str, int]) -> None:
        self.total = sum(pruned_counts.values())
        self.ratios = (
            {k: v / self.total for k, v in pruned_counts.items()} if self.total > 0 else {}
        )
        self._fitted = True

    def expr(self, col: Column) -> Column:
        self._require_fitted()
        if self.total == 0:
            return F.lit(0.0)
        return _map_udf(self.ratios, 0.0, "double", self.int_keys)(col)

    def mapping_spec(self) -> "MappingSpec":
        self._require_fitted()
        return MappingSpec(self.ratios, 0.0, "double", self.int_keys)

    def merge_stats(self, old: Dict[str, int], new: Dict[str, int]) -> Dict[str, int]:
        return _merge_counts(old, new, self.eliminator)


    def get_state(self) -> Dict[str, Any]:
        return {"ratios": self.ratios, "total": self.total, "eliminator": self.eliminator.get_state()}

    def set_state(self, state: Dict[str, Any]) -> None:
        self.ratios = dict(state["ratios"])
        self.total = int(state["total"])
        self.eliminator = eliminator_from_state(state["eliminator"])
        self._fitted = True


class IndexLookup(FittedTransform):
    """string -> dense index — _lookups.py:137-220.

    Vocabulary ordered by count DESC / key ASC (``sort_counts``), index
    assignment skips the reserved ``padding_idx``/``unknown_idx``; OOV
    maps to ``unknown_idx``.  This is the CategoryMapping-via-broadcast-
    vocabulary primitive of the north star.
    """

    fit_kind = FitKind.VOCAB
    int_keys = False
    input_kinds = ("string",)
    output_kind = "numeric"

    def __init__(
        self,
        eliminator: Optional[Eliminator] = None,
        padding_idx: int = 0,
        unknown_idx: int = 1,
    ):
        super().__init__()
        self.eliminator = eliminator or NoThreshold()
        self.padding_idx = padding_idx
        self.unknown_idx = unknown_idx
        self.lookup: Dict[str, int] = {"": self.unknown_idx}

    def dictionary_size(self) -> int:
        # _lookups.py:161-170
        if len(self.lookup) == 1 and self.lookup.get("", self.padding_idx) == self.unknown_idx:
            return 2
        return len(self.lookup) + 2

    def fit_finalize(self, pruned_counts: Dict[str, int]) -> None:
        # _lookups.py:197-217
        if sum(pruned_counts.values()) < 1:
            self.lookup = {"": self.unknown_idx}
            self._fitted = True
            return
        self.lookup = {}
        taken = {self.padding_idx, self.unknown_idx}
        for k in sort_counts(pruned_counts):
            i = len(self.lookup)
            while i in taken:
                i += 1
            self.lookup[k] = i
            taken.add(i)
        self._fitted = True

    def expr(self, col: Column) -> Column:
        self._require_fitted()
        return _map_udf(self.lookup, self.unknown_idx, "bigint", self.int_keys)(col)

    def mapping_spec(self) -> "MappingSpec":
        self._require_fitted()
        return MappingSpec(self.lookup, self.unknown_idx, "bigint", self.int_keys)

    def merge_stats(self, old: Dict[str, int], new: Dict[str, int]) -> Dict[str, int]:
        return _merge_counts(old, new, self.eliminator)


    def get_state(self) -> Dict[str, Any]:
        return {
            "lookup": self.lookup,
            "padding_idx": self.padding_idx,
            "unknown_idx": self.unknown_idx,
            "eliminator": self.eliminator.get_state(),
        }

    def set_state(self, state: Dict[str, Any]) -> None:
        self.lookup = {k: int(v) for k, v in state["lookup"].items()}
        self.padding_idx = int(state["padding_idx"])
        self.unknown_idx = int(state["unknown_idx"])
        self.eliminator = eliminator_from_state(state["eliminator"])
        self._fitted = True


# ----------------------------------------------------------------- int ops
# The reference's Int variants round-trip keys through str() for the
# eliminator (_lookups.py:298-299,454), so tie ordering is on the string
# form of the integer ("10" < "2").  The planner feeds all vocab fits as
# string keys, which reproduces that exactly; the fitted dicts below key
# on the original ints (the dense-offset-array storage of the reference
# is an implementation detail we don't copy — a broadcast hash map scales
# better for sparse key ranges).


class IntCountLookup(CountLookup):
    """int -> count — _lookups.py:223-314; OOV -> 0 (mask semantics
    _lookups.py:310-314 equal dict-default-0)."""

    int_keys = True
    input_kinds = ("numeric",)

    def fit_finalize(self, pruned_counts: Dict[str, int]) -> None:
        int_counts = {int(k): v for k, v in pruned_counts.items()}
        self.total = sum(int_counts.values())
        self.counts = int_counts
        self._fitted = True

    def get_state(self) -> Dict[str, Any]:
        return {
            "counts": {str(k): v for k, v in self.counts.items()},
            "total": self.total,
            "eliminator": self.eliminator.get_state(),
        }

    def set_state(self, state: Dict[str, Any]) -> None:
        self.counts = {int(k): int(v) for k, v in state["counts"].items()}
        self.total = int(state["total"])
        self.eliminator = eliminator_from_state(state["eliminator"])
        self._fitted = True


class IntRatioLookup(RatioLookup):
    """int -> count/total — _lookups.py:317-373."""

    int_keys = True
    input_kinds = ("numeric",)

    def fit_finalize(self, pruned_counts: Dict[str, int]) -> None:
        int_counts = {int(k): v for k, v in pruned_counts.items()}
        self.total = sum(int_counts.values())
        self.ratios = (
            {k: v / self.total for k, v in int_counts.items()} if self.total > 0 else {}
        )
        self._fitted = True

    def get_state(self) -> Dict[str, Any]:
        return {
            "ratios": {str(k): v for k, v in self.ratios.items()},
            "total": self.total,
            "eliminator": self.eliminator.get_state(),
        }

    def set_state(self, state: Dict[str, Any]) -> None:
        self.ratios = {int(k): float(v) for k, v in state["ratios"].items()}
        self.total = int(state["total"])
        self.eliminator = eliminator_from_state(state["eliminator"])
        self._fitted = True


class IntIndexLookup(IndexLookup):
    """int -> dense index — _lookups.py:376-474; same reserved-index
    rules, key ordering on str(key) (_lookups.py:454-455)."""

    int_keys = True
    input_kinds = ("numeric",)

    def dictionary_size(self) -> int:
        # _lookups.py:411-418
        if not self.lookup or self.lookup == {"": self.unknown_idx}:
            return 2
        return len(self.lookup) + 2

    def fit_finalize(self, pruned_counts: Dict[str, int]) -> None:
        # ordering on the *string* keys, assignment to int keys
        # (_lookups.py:454-467)
        str_keys = sort_counts(pruned_counts)
        if len(str_keys) < 1:
            self.lookup = {}
            self._fitted = True
            return
        self.lookup = {}
        taken = {self.padding_idx, self.unknown_idx}
        i = 0
        for k in str_keys:
            while i in taken:
                i += 1
            self.lookup[int(k)] = i
            i += 1
        self._fitted = True

    def get_state(self) -> Dict[str, Any]:
        return {
            "lookup": {str(k): v for k, v in self.lookup.items()},
            "padding_idx": self.padding_idx,
            "unknown_idx": self.unknown_idx,
            "eliminator": self.eliminator.get_state(),
        }

    def set_state(self, state: Dict[str, Any]) -> None:
        self.lookup = {int(k): int(v) for k, v in state["lookup"].items()}
        self.padding_idx = int(state["padding_idx"])
        self.unknown_idx = int(state["unknown_idx"])
        self.eliminator = eliminator_from_state(state["eliminator"])
        self._fitted = True


class HashBucket(Transform):
    """Vocabulary-FREE categorical encoding (the hashing trick):
    ``bucket = hash(value) mod (n_buckets - 1) + 1`` — index 0 is
    reserved for NULL (mirroring the lookups' reserved index 0), so
    non-null keys spread over n_buckets - 1 buckets and the output
    domain is exactly [0, n_buckets).

    The scale-first alternative to IndexLookup: no fit pass, no
    vocabulary state, no driver collect — a 10^9-cardinality key column
    encodes in one codegen'd expression, at the cost of hash collisions
    (rate ~ cardinality / n_buckets, the standard trade-off).

    ``method="xxhash64"`` (default) is JVM-side; ``method="poly31"``
    uses the engine's SQL-expressible polynomial string hash
    (functions/text.token_hash) so the DuckDB oracle can replay the
    encoding bit-for-bit."""

    input_kinds = ("string", "numeric")
    output_kind = "numeric"

    def __init__(self, n_buckets: int = 1 << 20, seed: int = 42, method: str = "xxhash64"):
        if n_buckets < 2:
            raise ValueError("n_buckets must be >= 2")
        self.n_buckets = int(n_buckets)
        self.seed = int(seed)
        self.method = method

    def expr(self, col: Column) -> Column:
        if self.method == "xxhash64":
            h = F.xxhash64(col, F.lit(self.seed))
        elif self.method == "poly31":
            from torchestra_spark.functions.text import token_hash

            h = token_hash(col.cast("string")) + F.lit(self.seed)
        else:
            raise ValueError(f"unknown method {self.method!r}")
        bucket = F.pmod(h, F.lit(self.n_buckets - 1)) + 1
        return F.when(col.isNull(), F.lit(0)).otherwise(bucket).cast("long")

    def get_state(self) -> Dict[str, Any]:
        return {"n_buckets": self.n_buckets, "seed": self.seed, "method": self.method}

    def set_state(self, state: Dict[str, Any]) -> None:
        self.n_buckets = int(state["n_buckets"])
        self.seed = int(state["seed"])
        self.method = state.get("method", "xxhash64")
