from .buckets import bucketize, bucket_order_expr
from .totals import with_total_row
from .sorting import dual_sort_keys
from .stats import zscore_columns
from .windows import running_balance, pareto_abc, band_groups
from .profile import column_profile

__all__ = [
    "bucketize",
    "bucket_order_expr",
    "with_total_row",
    "dual_sort_keys",
    "zscore_columns",
    "running_balance",
    "pareto_abc",
    "band_groups",
    "column_profile",
]
