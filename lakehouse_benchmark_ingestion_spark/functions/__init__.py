from .hashing import bucket_expr, row_salt_expr, salt_expr
from .zorder import hilbert_key_udf, morton_key_udf, with_cluster_key

__all__ = [
    "bucket_expr",
    "row_salt_expr",
    "salt_expr",
    "hilbert_key_udf",
    "morton_key_udf",
    "with_cluster_key",
]
