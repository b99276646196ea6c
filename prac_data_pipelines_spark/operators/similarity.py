"""Vector-similarity operators over embedding columns (array<float>).

All arithmetic is JVM-side higher-order expressions in double precision
(sequential accumulation — reproducible bit-for-bit on any engine that
evaluates the same formula; the float32 of the raw column is upcast first).

Scale design:
- ``cosine_expr``/brute force is the correctness baseline: a crossJoin that
  is only viable when one side is small (broadcast the query set).
- ``sign_bucket_expr`` is the LSH scale path: vectors co-partitioned by a
  short sign-bit bucket key so the pair join touches only within-bucket
  candidates — the same structure that shards ANN over 1000 executors.
"""

from __future__ import annotations


def dot_expr(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            f"0D, (acc, v) -> acc + v)")


def norm_expr(a: str) -> str:
    return f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def cosine_expr(a: str, b: str) -> str:
    """PRECONDITION (ADVICE-r10): both vectors must have non-zero norm.
    A zero vector yields 0/0 = NaN, and NaN-vs-number ORDERING DIVERGES
    between the engines' ranking idioms: Spark's sort/struct comparators
    treat NaN as GREATEST, so an in-row fold over (-sim, id) structs
    ranks a NaN sim LAST, while the row_number(ORDER BY sim DESC) form
    (and the DuckDB SQL twins) rank NaN FIRST.  The harness generator
    never emits zero embeddings and k-means/PQ means of unit-norm-ish
    data never collapse to zero, so no registered query can hit this;
    any future caller feeding unnormalized external vectors must filter
    or nanvl-guard zero norms BEFORE ranking on this expression."""
    return f"({dot_expr(a, b)} / ({norm_expr(a)} * {norm_expr(b)}))"


def sign_bucket_expr(a: str, bits: int, offset: int = 0) -> str:
    """Axis-sign LSH bucket: sign bits of ``bits`` dims starting after
    ``offset``. One table alone has low recall (any near-zero dim flips
    its sign under noise); use several tables at different offsets and
    union their candidates (see queries/vector.py LSH_TABLES)."""
    return (f"aggregate(transform(slice({a}, {offset + 1}, {bits}), "
            f"v -> CASE WHEN v >= 0 THEN 1L ELSE 0L END), "
            f"0L, (acc, s) -> acc * 2 + s)")


# DuckDB twins (same formulas, same accumulation order).

def sql_dot_expr(a: str, b: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            f"x -> (x[1]::DOUBLE) * (x[2]::DOUBLE)))")


def sql_norm_expr(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, v -> (v::DOUBLE) * (v::DOUBLE))))"


def sql_cosine_expr(a: str, b: str) -> str:
    return f"({sql_dot_expr(a, b)} / ({sql_norm_expr(a)} * {sql_norm_expr(b)}))"


def sql_sign_bucket_expr(a: str, bits: int, offset: int = 0) -> str:
    return (f"list_reduce(list_prepend(0, "
            f"list_transform({a}[{offset + 1}:{offset + bits}], "
            f"v -> CASE WHEN v >= 0 THEN 1 ELSE 0 END)), (acc, s) -> acc * 2 + s)::BIGINT")
