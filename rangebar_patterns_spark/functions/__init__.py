from .quantiles import (
    duck_q6_expr,
    q6_from_sorted_array,
    rolling_excl_quantile,
)

__all__ = ["duck_q6_expr", "q6_from_sorted_array", "rolling_excl_quantile"]
