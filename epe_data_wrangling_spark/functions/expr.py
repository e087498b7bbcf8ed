"""Expression-level let-binding for Catalyst.

Catalyst's common-subexpression elimination does not unify repeated
subtrees referenced inside higher-order-function lambda bodies: an
expression like ``slice(words, i, n)`` inside ``transform()``
re-evaluates ``words`` (a regex split) once per lambda application,
turning an O(n) array pass into O(n²) regex splits. The same applies
to any duplicated subtree in a wide projection (e.g. one md5 feeding
16 hash projections is otherwise inlined — and evaluated — 16×).

``bind`` forces single evaluation: wrap the value in a one-element
array, apply the consumer as a ``transform`` lambda (lambda-variable
arguments ARE evaluated once per element), and unwrap with
``element_at``. Pure Catalyst, whole-stage-codegen friendly, and
semantically the identity — oracles never change.

Measured on the documents corpus at sf0.1 (5k docs, local[32]):
``word_shingles`` 2.6 s → 0.4 s per pass.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(value: Column, fn: Callable[[Column], Column]) -> Column:
    """``let v = value in fn(v)`` — evaluate ``value`` exactly once no
    matter how many times ``fn``'s body references it."""
    return F.element_at(F.transform(F.array(value), fn), 1)
