"""Custom stateful streaming operator: per-host politeness throttle.

The reference binds each host to one curl handle so at most one transfer
per host is in flight (Url_classifier.cc:70-94); the batch engine maps
that to a per-round budget window (operators/frontier.py). This is the
STREAMING form of the same invariant, built on
``applyInPandasWithState`` (Spark's arbitrary-stateful-processing API):

* group the URL stream by host;
* state per host = the FIFO backlog (url, seq) that exceeded the budget
  in earlier micro-batches, capped like the classifier's overflow queue
  (Url_classifier.cc:102-121 drops to an overflow structure when a host
  queue is full — here rows beyond ``state_cap`` are dropped and counted);
* each micro-batch emits at most ``budget`` URLs per host in seq order —
  backlog first, then new arrivals — and re-arms a processing-time
  timeout so a host with backlog keeps draining even when no new URLs
  arrive for it.

Scale notes: state lives in the state store keyed by host (RocksDB at
scale), sized by the backlog cap, never by the stream; the shuffle is the
groupBy(host) hash partition — the same key the batch politeness window
shuffles on.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("seq", LongType()),
        StructField("emitted_pos", IntegerType()),  # 1..budget within this batch
        StructField("dropped_so_far", LongType()),  # cumulative overflow drops
    ]
)

# state: parallel arrays (urls, seqs) of the deferred backlog + drop counter
STATE_SCHEMA = StructType(
    [
        StructField("urls", StringType()),  # \n-joined (state rows must be flat)
        StructField("seqs", StringType()),  # comma-joined
        StructField("dropped", LongType()),
    ]
)


def _throttle_fn(budget: int, state_cap: int, timeout_ms: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        backlog: list[tuple[str, int]] = []
        dropped = 0
        if state.exists:
            urls_s, seqs_s, dropped = state.get
            if urls_s:
                backlog = list(
                    zip(urls_s.split("\n"), (int(x) for x in seqs_s.split(",")))
                )
        if not state.hasTimedOut:
            fresh: list[tuple[str, int]] = []
            for pdf in pdfs:
                fresh.extend(zip(pdf["url"], (int(s) for s in pdf["seq"])))
            fresh.sort(key=lambda t: t[1])
            backlog.extend(fresh)  # backlog is already seq-ordered; arrivals after
        emit, rest = backlog[:budget], backlog[budget:]
        if len(rest) > state_cap:  # overflow-queue analog: drop + count
            dropped += len(rest) - state_cap
            rest = rest[:state_cap]
        # state persists ONLY while a backlog remains: a drained host must
        # not keep re-arming its timeout just to carry the drop counter
        # (state-store growth + a never-idle query — ADVICE round 2). The
        # counter rides along in the output instead; drops can only happen
        # in a batch that also emits (drop requires backlog > budget+cap),
        # so the final cumulative value is always emitted before removal.
        if rest:
            state.update(
                (
                    "\n".join(u for u, _ in rest),
                    ",".join(str(s) for _, s in rest),
                    dropped,
                )
            )
            state.setTimeoutDuration(timeout_ms)  # keep draining without input
        elif state.exists:
            state.remove()
        if emit:
            yield pd.DataFrame(
                {
                    "host": [host] * len(emit),
                    "url": [u for u, _ in emit],
                    "seq": [s for _, s in emit],
                    "emitted_pos": list(range(1, len(emit) + 1)),
                    "dropped_so_far": [dropped] * len(emit),
                }
            )

    return fn


def politeness_throttle(
    urls: DataFrame, budget: int, state_cap: int = 100_000, timeout_ms: int = 100
) -> DataFrame:
    """Streaming (host, url, seq) → at most ``budget`` rows per host per
    micro-batch, FIFO by seq, backlog carried in the state store."""
    return urls.groupBy("host").applyInPandasWithState(
        _throttle_fn(budget, state_cap, timeout_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
