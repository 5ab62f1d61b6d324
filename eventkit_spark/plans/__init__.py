from .audit import assert_broadcast_join, assert_pushed_filter, physical_plan

__all__ = ["assert_broadcast_join", "assert_pushed_filter", "physical_plan"]
