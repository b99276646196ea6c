"""Skew-aware join: key salting.

AQE's skew-join splitting handles most skew at runtime; salting is the
explicit fallback for pathological hot keys (one customer with 10% of all
movements) or for engines/stages where AQE cannot intervene (e.g. a
stateful streaming join).

Mechanics: the skewed (large) side gets a random-but-deterministic salt in
``[0, n_salts)`` appended to its key; the small side is exploded n_salts
times so every salted key finds its match. The hot key's rows now spread
over n_salts shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(large: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``key`` with the large side salted.

    The salt is derived from a hash of the full row position via
    ``monotonically_increasing_id`` — deterministic within a run, uniform
    across partitions. The small side is exploded, so its size multiplies
    by ``n_salts``: keep it to genuinely-small dimension frames.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # outer joins would surface each unmatched small-side row once per
        # salt replica — n_salts duplicates instead of one row
        raise ValueError(f"salted_join supports inner/left/semi/anti, not {how!r}")
    salted_large = large.withColumn(
        "_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted_large.join(exploded_small, [key, "_salt"], how)
    return out.drop("_salt")
