"""Stratified ("dual") sort.

Reference pattern (``src/analytics.py:238-242``, ``src/kpis.py:126-130``):
rows with balance > 0 ordered by balance descending, then rows with
balance <= 0 ordered by name ascending, concatenated. Spark-first: a single
``orderBy`` over computed keys — no union of two sorted halves, one shuffle,
fully parallel range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dual_sort_keys(amount: Column, name: Column) -> list[Column]:
    """Sort keys implementing the stratified sort as one total order."""
    in_tail = (amount <= 0) | amount.isNull()
    return [
        in_tail.cast("int").asc(),            # head stratum first
        F.when(~in_tail, -amount).asc(),       # head: amount desc
        F.when(in_tail, name).asc_nulls_last() # tail: name asc
    ]
