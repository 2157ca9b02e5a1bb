"""Plan inspection utilities — the engine's "did Catalyst do what we
designed for?" toolkit.

At 100 TB the difference between a right and wrong physical plan is hours
vs days; these helpers make plan properties ASSERTABLE so tests and CI can
pin them: scans prune columns and push filters, dimension joins broadcast,
no operator degenerates to a nested-loop join or an unpartitioned window
outside the presentation ops.
"""

from kevinlang_spark.plans.inspect import (
    executed_plan,
    scan_columns,
    pushed_filters,
    assert_no_cartesian,
    assert_broadcast_join,
    assert_columns_pruned,
    assert_whole_stage_codegen,
)

__all__ = [
    "executed_plan",
    "scan_columns",
    "pushed_filters",
    "assert_no_cartesian",
    "assert_broadcast_join",
    "assert_columns_pruned",
    "assert_whole_stage_codegen",
]
