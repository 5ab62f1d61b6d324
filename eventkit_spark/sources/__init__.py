from .create import marble, range_, repeat, sequence, timerange, timer
from .tables import from_dataframe, load_events, load_table

__all__ = [
    "from_dataframe",
    "load_events",
    "load_table",
    "marble",
    "range_",
    "repeat",
    "sequence",
    "timer",
    "timerange",
]
