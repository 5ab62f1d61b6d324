"""eventkit_spark — a PySpark-native analytics engine with the stream
operator surface of erdewit/eventkit, re-expressed Spark-first.

See SURVEY.md for the operator inventory and the reference-to-Spark
mapping; every operator cites the reference file:line it reproduces.
"""

from .frame import EventFrame
from .session import get_spark

__all__ = ["EventFrame", "get_spark"]
__version__ = "0.1.0"
