"""Streaming per-host politeness throttle (applyInPandasWithState).

Drives the operator through a real streaming query: files arrive one per
micro-batch (maxFilesPerTrigger=1 + availableNow), the state store carries
each host's backlog across batches, and the processing-time timeout keeps
draining hosts that get no new input.
"""

import time

import pytest
from pyspark.sql import functions as F

from mycelium_spark.streaming.politeness_stream import politeness_throttle

BUDGET = 2


def _run_stream(spark, src_dir, ckpt_dir, n_expected=7):
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src_dir))
    )
    urls = lines.select(
        F.split("value", " ")[0].alias("host"),
        F.split("value", " ")[1].alias("url"),
        F.split("value", " ")[2].cast("long").alias("seq"),
    )
    out = politeness_throttle(urls, BUDGET, timeout_ms=1)
    batches: list[tuple[int, list]] = []

    def sink(df, bid):
        batches.append((bid, df.collect()))

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt_dir))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # the stateful query keeps scheduling drain batches while timeouts are
    # armed; poll until the expected total arrives, then stop
    for _ in range(180):
        time.sleep(0.5)
        if sum(len(rows) for _, rows in batches) >= n_expected:
            break
    q.stop()
    return batches


def test_throttle_budget_and_fifo(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch file 1: 5 urls for hot host + 1 for cold; later file: cold only
    with open(src / "a.txt", "w") as f:
        for i in range(5):
            f.write(f"hot.example http://hot.example/p{i} {i}\n")
        f.write("cold.example http://cold.example/x 0\n")
    with open(src / "b.txt", "w") as f:
        f.write("cold.example http://cold.example/y 1\n")

    batches = _run_stream(spark, src, tmp_path / "ckpt")
    rows = [r for _, b in batches for r in b]
    # everything eventually emitted exactly once
    hot = sorted(r["seq"] for r in rows if r["host"] == "hot.example")
    cold = sorted(r["seq"] for r in rows if r["host"] == "cold.example")
    assert hot == [0, 1, 2, 3, 4]
    assert cold == [0, 1]
    # per-host per-batch budget invariant
    for _, b in batches:
        per_host = {}
        for r in b:
            per_host[r["host"]] = per_host.get(r["host"], 0) + 1
        assert all(n <= BUDGET for n in per_host.values()), b
    # FIFO: hot host's seqs emitted in nondecreasing batch order
    order = [
        (bid, r["seq"]) for bid, b in batches for r in b if r["host"] == "hot.example"
    ]
    assert [s for _, s in sorted(order, key=lambda t: (t[0], t[1]))] == [0, 1, 2, 3, 4]
    # the hot backlog needed >= 3 batches at budget 2 (state carried across)
    hot_batches = {bid for bid, b in batches for r in b if r["host"] == "hot.example"}
    assert len(hot_batches) >= 3


class _FakeState:
    """Minimal GroupState double for unit-driving the throttle kernel."""

    def __init__(self):
        self._v = None
        self.exists = False
        self.hasTimedOut = False
        self.removed = False
        self.timeout_armed = 0

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v = None
        self.exists = False
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_armed += 1


def _feed(fn, state, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["url", "seq"]) if rows else None
    it = iter([pdf]) if pdf is not None else iter([])
    out = list(fn(("h.example",), it, state))
    return [tuple(r) for o in out for r in o[["url", "seq", "dropped_so_far"]].itertuples(index=False)]


def test_state_removed_after_drain_even_with_drops(spark):
    from mycelium_spark.streaming.politeness_stream import _throttle_fn

    fn = _throttle_fn(budget=2, state_cap=1, timeout_ms=5)
    st = _FakeState()
    # 5 arrivals, budget 2, cap 1 → emit 2, keep 1, drop 2
    out1 = _feed(fn, st, [(f"u{i}", i) for i in range(5)])
    assert [u for u, _, _ in out1] == ["u0", "u1"]
    assert out1[0][2] == 2  # dropped_so_far emitted with the rows
    assert st.exists and st.timeout_armed == 1
    # drain batch (timeout fire, no input): backlog empties → state REMOVED
    st.hasTimedOut = True
    out2 = _feed(fn, st, [])
    assert [u for u, _, _ in out2] == ["u2"]
    assert out2[0][2] == 2  # final cumulative drop count rode out
    assert st.removed and not st.exists
    assert st.timeout_armed == 1  # no re-arm after drain: query can idle
