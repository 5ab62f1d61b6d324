"""Bulk plan audit of every declared query (guide §7.2).

For each query in ``__spark_entry__.queries()``: count Exchange /
BroadcastExchange nodes, Python-boundary nodes (BatchEvalPython /
ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas), sorts, and the
widest parquet ReadSchema. Emits one JSON line per query to stdout so
the output diffs cleanly between rounds.

Usage: python scripts/plan_audit.py [sf_dir] [name...]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = sys.argv[2:]

    import __spark_entry__ as entrymod
    from eventkit_spark.session import get_spark

    spark = get_spark("plan_audit")
    qs = entrymod.queries()
    todo = names or [n for n in qs]
    for name in todo:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({"q": name, "error": f"{type(ex).__name__}: {ex}"[:150]}))
            continue
        head = plan.split("\n\n", 1)[0]
        stats = {
            "q": name,
            "exchanges": len(re.findall(r"\bExchange\b", head)),
            "bcast": len(re.findall(r"BroadcastExchange", head)),
            "sorts": len(re.findall(r"\bSort\b", head)),
            "py": len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
                    r"|MapInPandas|FlatMapCoGroupsInPandas|MapInArrow",
                    head,
                )
            ),
            "scan_widths": [
                len(s.split(","))
                for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
            ],
        }
        print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
