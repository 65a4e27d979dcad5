"""Bind-once helper for higher-order Column expressions.

Referencing an array-valued expression INSIDE a higher-order-function
lambda re-evaluates it per element: lambdas are interpreted outside
whole-stage codegen, so common-subexpression elimination never sees
them. For an expression like ``tokens_col`` (three regexp passes +
split) probed at every window position, that turns a linear scan into
O(positions) full re-tokenizes per row — measured 28x on the parser
phrase twin and quadratic in the highlight fragment scorer.

``bind_once(col, fn)`` evaluates ``col`` exactly once per row and hands
the materialized value to ``fn`` as a lambda variable (the one thing
HOF lambdas DO evaluate once): it wraps the value in a single-element
array, runs ``transform`` with ``fn``, and takes element 0. Nesting is
fine — PySpark generates fresh lambda-variable names per level.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` once per row; pass the bound value to ``fn``."""
    return F.transform(F.array(col), fn)[0]
