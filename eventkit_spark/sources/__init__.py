from .bucketed import assert_colocated, drop_table, save_bucketed
from .create import aiterate, marble, range_, repeat, sequence, timerange, timer, wait
from .tables import from_dataframe, load_events, load_table

__all__ = [
    "aiterate",
    "assert_colocated",
    "drop_table",
    "save_bucketed",
    "from_dataframe",
    "load_events",
    "load_table",
    "marble",
    "range_",
    "repeat",
    "sequence",
    "timer",
    "timerange",
    "wait",
]
