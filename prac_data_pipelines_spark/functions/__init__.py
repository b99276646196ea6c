"""Engine function library — the stable expression-level API surface.

Re-exports the expression builders used across plans and queries so
downstream users import from one place:

    from prac_data_pipelines_spark.functions import r2, bucketize, cosine_expr
"""

from ..operators.buckets import (
    bucket_order_expr,
    bucket_order_sql,
    bucketize,
    bucketize_sql,
)
from ..operators.rounding import r2, r4, r6, rn, sql_r2, sql_r4, sql_r6, sql_rn
from ..operators.similarity import (
    cosine_expr,
    dot_expr,
    norm_expr,
    sign_bucket_expr,
    sql_cosine_expr,
    sql_dot_expr,
    sql_norm_expr,
    sql_sign_bucket_expr,
)

__all__ = [
    "bucket_order_expr", "bucket_order_sql", "bucketize", "bucketize_sql",
    "r2", "r4", "r6", "rn", "sql_r2", "sql_r4", "sql_r6", "sql_rn",
    "cosine_expr", "dot_expr", "norm_expr", "sign_bucket_expr",
    "sql_cosine_expr", "sql_dot_expr", "sql_norm_expr", "sql_sign_bucket_expr",
]
