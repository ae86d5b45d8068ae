"""Physical-plan audit helpers.

The engine's scale guarantees are properties of the PLAN, not the results:
filters below the window, WindowGroupLimit before the exchange, broadcast on
the small side, no Exchange on bucketed joins, partition pruning on IVF
probes. These helpers make those properties assertable in tests and
inspectable in notebooks.
"""

from .audit import (
    explain_formatted,
    physical_plan,
    assert_no_exchange,
    assert_broadcast_join,
    assert_partial_window_group_limit,
    count_exchanges,
)

__all__ = [
    "explain_formatted",
    "physical_plan",
    "assert_no_exchange",
    "assert_broadcast_join",
    "assert_partial_window_group_limit",
    "count_exchanges",
]
