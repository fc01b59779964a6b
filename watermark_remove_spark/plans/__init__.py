from .audit import (  # noqa: F401
    assert_broadcast_join,
    assert_no_column_read,
    assert_pushed_filters,
    plan_of,
)
