from .money import decimal_avg, decimal_sum
from .texttools import punct_count_expr, token_count_expr, tokens_expr
from .vectors import cosine_expr, dot_expr, norm_expr, to_double_expr

__all__ = [
    "decimal_sum",
    "decimal_avg",
    "tokens_expr",
    "token_count_expr",
    "punct_count_expr",
    "to_double_expr",
    "dot_expr",
    "norm_expr",
    "cosine_expr",
]
