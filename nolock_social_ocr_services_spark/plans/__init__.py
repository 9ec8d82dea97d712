from .inspect import (  # noqa: F401
    arrow_eval_count,
    exchange_count,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_count,
)
