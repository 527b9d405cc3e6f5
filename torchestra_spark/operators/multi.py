"""Multi-input (tuple-as-args) transforms.

The reference routes tuple outputs of a ``Parallel(into=tuple)`` branch
into multi-argument modules via ``TupleAsArgs``
(/root/reference/src/torchestra/_pipes.py:107-149, 306-336; multi-arg
cases in test_pipes.py).  Spark has no tuples-in-flight — a multi-input
op here is simply a Catalyst expression over N named columns, composed
as the HEAD of a multi-input ``Feature``::

    Pipeline({
        "price_per_qty": Feature(["l_extendedprice", "l_quantity"],
                                 [Ratio(), StandardScore()]),
    })

Everything stays a pure Column expression: whole-stage codegen, no UDF,
no extra scan — the planner fits downstream stateful ops (the
StandardScore above) over the composed expression exactly like any
single-input chain.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from torchestra_spark.core import MultiTransform


class Ratio(MultiTransform):
    """a / b as double; NULL when the denominator is 0 or NULL (explicit
    ``when`` guard so the semantics don't depend on ANSI mode, and the
    SQL oracle replays it as CASE WHEN b = 0 THEN NULL ELSE a/b END)."""

    n_inputs = 2
    input_kinds = ("numeric", "boolean")
    output_kind = "numeric"

    def expr(self, a: Column, b: Column) -> Column:
        bd = b.cast("double")
        return F.when(bd != 0, a.cast("double") / bd)


class Diff(MultiTransform):
    """a - b as double — e.g. (event_ts - feature_ts) staleness or
    price-minus-cost margin features."""

    n_inputs = 2
    input_kinds = ("numeric", "boolean")
    output_kind = "numeric"

    def expr(self, a: Column, b: Column) -> Column:
        return a.cast("double") - b.cast("double")


class Product(MultiTransform):
    """Product of N columns as double — the classic interaction
    feature."""

    input_kinds = ("numeric", "boolean")
    output_kind = "numeric"

    def expr(self, *cols: Column) -> Column:
        if len(cols) < 2:
            raise ValueError("Product needs >= 2 inputs")
        out = cols[0].cast("double")
        for c in cols[1:]:
            out = out * c.cast("double")
        return out


class SumOf(MultiTransform):
    """Sum of N columns as double (NULL propagates like SQL ``+``)."""

    input_kinds = ("numeric", "boolean")
    output_kind = "numeric"

    def expr(self, *cols: Column) -> Column:
        if len(cols) < 2:
            raise ValueError("SumOf needs >= 2 inputs")
        out = cols[0].cast("double")
        for c in cols[1:]:
            out = out + c.cast("double")
        return out


class LinearCombination(MultiTransform):
    """sum_i w_i * x_i + bias over N columns — a fixed-weight scoring
    head (e.g. a hand-tuned quality score over component signals)."""

    input_kinds = ("numeric", "boolean")
    output_kind = "numeric"

    def __init__(self, weights: Sequence[float], bias: float = 0.0):
        self.weights = [float(w) for w in weights]
        self.bias = float(bias)
        self.n_inputs: Optional[int] = len(self.weights)

    def expr(self, *cols: Column) -> Column:
        if len(cols) != len(self.weights):
            raise ValueError(
                f"LinearCombination has {len(self.weights)} weights but "
                f"received {len(cols)} inputs"
            )
        out = F.lit(self.bias)
        for w, c in zip(self.weights, cols):
            out = out + F.lit(w) * c.cast("double")
        return out

    def __repr__(self) -> str:  # pragma: no cover
        return f"LinearCombination({self.weights!r}, bias={self.bias!r})"


class Greatest(MultiTransform):
    """greatest(x_1..x_N) as double (SQL GREATEST null semantics:
    NULLs ignored unless all inputs are NULL)."""

    input_kinds = ("numeric", "boolean")
    output_kind = "numeric"

    def expr(self, *cols: Column) -> Column:
        if len(cols) < 2:
            raise ValueError("Greatest needs >= 2 inputs")
        return F.greatest(*[c.cast("double") for c in cols])


class Least(MultiTransform):
    """least(x_1..x_N) as double (SQL LEAST null semantics)."""

    input_kinds = ("numeric", "boolean")
    output_kind = "numeric"

    def expr(self, *cols: Column) -> Column:
        if len(cols) < 2:
            raise ValueError("Least needs >= 2 inputs")
        return F.least(*[c.cast("double") for c in cols])
