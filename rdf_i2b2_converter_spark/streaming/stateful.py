"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2 J); a continuously-
crawled corpus needs cross-batch state. Two operators:

- ``dedup_pages_stream``: exactly-once page admission — a url seen in any
  earlier micro-batch is dropped (recrawls are the norm in CC-style feeds).
  State per url: a seen flag. This is the streaming counterpart of D2
  (keep-first dedup, postprod.bash:103).
- ``entity_count_stream``: running mention totals per surface — the
  streaming counterpart of the batch counters (D7).

State is Spark-managed (HDFS-backed state store on a cluster); keys are
urls/surfaces — high-cardinality and hash-partitioned, so state shards
evenly across executors.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PAGE_OUT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)
SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType())])

COUNT_OUT = T.StructType(
    [
        T.StructField("surface", T.StringType()),
        T.StructField("total", T.LongType()),
    ]
)
COUNT_STATE = T.StructType([T.StructField("total", T.LongType())])


def _dedup_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return iter(())
    state.update((True,))
    first = next(pdfs, None)
    if first is None or len(first) == 0:
        return iter(())
    return iter([first.iloc[[0]][["url", "text", "lang"]]])


def dedup_pages_stream(pages_stream: DataFrame) -> DataFrame:
    """Admit each url exactly once across the whole stream lifetime."""
    return (
        pages_stream.select("url", "text", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            _dedup_fn, PAGE_OUT, SEEN_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


def _count_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    inc = 0
    for pdf in pdfs:
        inc += int(pdf["n_occurrences"].sum())
    total = (state.get[0] if state.exists else 0) + inc
    state.update((total,))
    return iter([pd.DataFrame({"surface": [key[0]], "total": [total]})])


def entity_count_stream(mentions_stream: DataFrame) -> DataFrame:
    """Running total of occurrences per surface (update-mode output)."""
    return (
        mentions_stream.select("surface", "n_occurrences")
        .groupBy("surface")
        .applyInPandasWithState(
            _count_fn, COUNT_OUT, COUNT_STATE, "update", GroupStateTimeout.NoTimeout
        )
    )
