from .tokens import (
    MERGE_FINAL_ORACLE_SQL,
    TOKENS_ORACLE_SQL,
    UPDATES_ORACLE_SQL,
    tokens_df,
    updates_df,
)
from .tpch import TPCH_TABLES, load_table, register_views

__all__ = [
    "MERGE_FINAL_ORACLE_SQL",
    "TOKENS_ORACLE_SQL",
    "UPDATES_ORACLE_SQL",
    "TPCH_TABLES",
    "load_table",
    "register_views",
    "tokens_df",
    "updates_df",
]
