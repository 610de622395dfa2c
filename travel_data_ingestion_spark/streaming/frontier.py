"""Streaming politeness scheduler — the t22 batch operator's twin.

A live crawler doesn't have its whole frontier up front: URLs arrive
continuously (discovery, sitemap recursion, re-crawl), and the
scheduler must keep assigning per-host issue slots WITHOUT restarting
the count each micro-batch. That cross-batch per-host counter is
exactly custom streaming state: ``applyInPandasWithState`` keyed by
host, state = (issued so far, budget-remaining view of max_per_host).

Semantics (matching ``llm.robots.schedule_frontier`` where the two are
comparable):

- only ``allowed`` rows are scheduled; within one micro-batch a host's
  rows are processed in ``url`` order (deterministic); across batches
  the issue order is ARRIVAL order — equal to the batch operator's
  global url order whenever arrival respects it (the batch twin
  equality the tests pin);
- ``fetch_seq`` continues across micro-batches (state);
  ``fetch_after = fetch_seq * coalesce(crawl_delay, default_delay)``
  — an offset in seconds from the host's first fetch, not wall clock,
  so outputs are replay-deterministic;
- ``max_per_host`` caps the TOTAL issued per host across the stream's
  lifetime (the budget is state, not a per-batch window).

State per host is one long — bounded regardless of frontier size; the
shuffle is host-keyed, the same partitioning the batch pipeline uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

INPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("allowed", BooleanType()),
        StructField("crawl_delay", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("fetch_seq", LongType()),
        StructField("fetch_after", DoubleType()),
    ]
)

STATE_SCHEMA = StructType([StructField("issued", LongType())])


def _make_scheduler(default_delay: float, max_per_host: int | None):
    def schedule(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        issued = state.get[0] if state.exists else 0
        hosts, urls, seqs, afters = [], [], [], []
        for pdf in pdfs:
            pdf = pdf[pdf["allowed"].fillna(False)]
            if not len(pdf):
                continue
            for _, row in pdf.sort_values("url").iterrows():
                if max_per_host is not None and issued >= max_per_host:
                    break
                delay = row["crawl_delay"]
                if pd.isna(delay):
                    delay = default_delay
                hosts.append(host)
                urls.append(row["url"])
                seqs.append(issued)
                afters.append(float(issued) * float(delay))
                issued += 1
        state.update((issued,))
        yield pd.DataFrame(
            {
                "host": hosts,
                "url": urls,
                "fetch_seq": pd.array(seqs, dtype="int64"),
                "fetch_after": pd.array(afters, dtype="float64"),
            }
        )

    return schedule


def scheduled_frontier_stream(
    stream: DataFrame,
    default_delay: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """Attach the stateful per-host scheduler to a filtered-frontier
    stream with columns (host, url, allowed, crawl_delay)."""
    return stream.groupBy("host").applyInPandasWithState(
        _make_scheduler(default_delay, max_per_host),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
