"""Plan inspection and assertions (scale guardrails)."""

from .asserts import (  # noqa: F401
    assert_broadcast_join,
    assert_no_python_eval,
    assert_pushed_filters,
    assert_read_schema_only,
    formatted_plan,
)
