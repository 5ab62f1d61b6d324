"""Async map: apply a coroutine function to every row with bounded
concurrency — the reference's async ``Map``
(eventkit/ops/transform.py:214-288: ``timeout``, ``ordered``,
``task_limit``).

Engine formulation: ``mapInPandas`` streams Arrow batches into a worker
that runs one asyncio loop per batch; within a batch up to ``task_limit``
coroutines run concurrently (semaphore), each bounded by ``timeout``
(asyncio.wait_for). Failures/timeouts emit NULL (the reference's
NO_VALUE, event.py:849). ``ordered=False`` emits in completion order
within the batch — like the reference, output order is then explicitly
not guaranteed (tests/transform_test.py:100-115 asserts set equality).

Scale: concurrency is per input partition, so total in-flight work is
``task_limit * partitions`` — the natural distributed generalization of
the reference's single-loop task_limit. I/O-bound enrichment (HTTP
lookups, model endpoints) keeps all cores busy without a thread per row.
"""

from __future__ import annotations

import asyncio
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import functions as F

from .common import meta_cols


def map_async(
    ef,
    coro_fn: Callable,
    return_type: str,
    timeout: float | None = None,
    ordered: bool = True,
    task_limit: int | None = None,
    name: str = "value",
):
    value_cols = list(ef.value_cols)
    keep = meta_cols(ef)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            sem = asyncio.Semaphore(task_limit) if task_limit else None

            async def one(idx, args):
                if sem:
                    async with sem:
                        return idx, await _guarded(args)
                return idx, await _guarded(args)

            async def _guarded(args):
                try:
                    if timeout is not None:
                        return await asyncio.wait_for(coro_fn(*args), timeout)
                    return await coro_fn(*args)
                except Exception:  # noqa: BLE001 - NO_VALUE semantics
                    return None

            tasks = [
                asyncio.ensure_future(one(i, tuple(row[c] for c in value_cols)))
                for i, (_, row) in enumerate(pdf.iterrows())
            ]
            results: list = [None] * len(tasks)
            if ordered:
                for t in tasks:
                    i, v = await t
                    results[i] = v
                order = range(len(tasks))
            else:
                order = []
                for t in asyncio.as_completed(tasks):
                    i, v = await t
                    results[i] = v
                    order.append(i)
            out = pdf[keep].iloc[list(order)].copy() if not ordered else pdf[keep].copy()
            out[name] = [results[i] for i in order]
            return out

        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield asyncio.run(run_batch(pdf))

    schema_fields = []
    for c in keep:
        schema_fields.append(f"{c} {ef.df.schema[c].dataType.simpleString()}")
    schema_fields.append(f"{name} {return_type}")
    out_schema = ", ".join(schema_fields)

    df = ef.df.select(*keep, *value_cols).mapInPandas(kernel, schema=out_schema)
    return ef._with(df=df, value_cols=[name])
