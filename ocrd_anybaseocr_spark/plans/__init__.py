from .inspect import assert_no_exchange, count_exchanges, explain_str, pushed_filters
