"""Pure-Python frontier scheduler simulator — the crawl-ordering oracle.

Reimplements the reference's per-host politeness queue
(behavioral spec: /root/reference/src/crawler/Url_classifier.{hh,cc}):

* N per-host FIFO subqueues; a pushed URL goes to the FIRST subqueue whose
  bound host matches, else the first EMPTY subqueue (in table insertion
  order) claims the host, else the overflow priority queue
  (Url_classifier.cc:70-94);
* the overflow queue is a ``std::priority_queue`` max-heap ordered by raw
  (unnormalized) hostname — lexicographically greatest host drains first
  (Url_classifier.cc:112-115); equal-host entries drain in the heap's pop
  order, which for parity is reproduced here with the exact libstdc++
  ``push_heap``/``pop_heap``/``__adjust_heap`` algorithms (std::priority_queue
  is NOT stable, so overflow URLs of one host are generally NOT FIFO —
  a reference quirk the oracle must reproduce);
* ``peek(n)`` on an empty subqueue drains ALL consecutive top entries of the
  same (greatest) host into subqueue n and rebinds it
  (Url_classifier.cc:134-171);
* hosts are the RAW parsed hosts — normalization happens at schedule time in
  the crawler (crawler.cc:806-807), so case-variant hosts occupy separate
  queues.

The full crawl interleave additionally depends on fetch timing; the
canonical schedule used as the oracle is round-robin: each handle pops one
URL per cycle (handle 0..N-1), which is the event loop's behavior when all
fetches complete within one scheduler tick.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

from ..functions.url import Url, UrlParseError


# --- exact libstdc++ heap algorithms (bits/stl_heap.h) ---
def _push_heap(heap: list, comp) -> None:
    value = heap[-1]
    hole = len(heap) - 1
    parent = (hole - 1) // 2
    while hole > 0 and comp(heap[parent], value):
        heap[hole] = heap[parent]
        hole = parent
        parent = (hole - 1) // 2
    heap[hole] = value


def _adjust_heap(heap: list, hole: int, length: int, value, comp) -> None:
    top = hole
    second = hole
    while second < (length - 1) // 2:
        second = 2 * (second + 1)
        if comp(heap[second], heap[second - 1]):
            second -= 1
        heap[hole] = heap[second]
        hole = second
    if (length & 1) == 0 and second == (length - 2) // 2:
        second = 2 * (second + 1)
        heap[hole] = heap[second - 1]
        hole = second - 1
    # sift value back up from hole (bounded by top)
    parent = (hole - 1) // 2
    while hole > top and comp(heap[parent], value):
        heap[hole] = heap[parent]
        hole = parent
        parent = (hole - 1) // 2
    heap[hole] = value


def _pop_heap(heap: list, comp):
    result = heap[0]
    value = heap.pop()
    if heap:
        _adjust_heap(heap, 0, len(heap), value, comp)
    return result


@dataclass
class _Entry:
    host: bytes
    url: str
    seq: int


def _comp(a: _Entry, b: _Entry) -> bool:
    """Compare_hostname: left.host() < right.host() (Url_classifier.cc:112-115)."""
    return a.host < b.host


class UrlClassifier:
    """Faithful port of Url_classifier for small-corpus ordering oracles."""

    def __init__(self, n: int):
        self.hosts: list[bytes | None] = [None] * n  # bound host per subqueue
        self.queues: list[deque[_Entry]] = [deque() for _ in range(n)]
        self.top_q: list[_Entry] = []
        self._seq = 0

    def push(self, url: str) -> None:
        u = Url(url)
        entry = _Entry(u.host(), url, self._seq)
        self._seq += 1
        # existing subqueue bound to this host? boost ordered_non_unique
        # find() returns the first element with equal key in insertion order
        for i, h in enumerate(self.hosts):
            if h == entry.host and h is not None:
                self.queues[i].append(entry)
                return
        # first empty subqueue claims the host (table seq order)
        for i, q in enumerate(self.queues):
            if not q:
                self.hosts[i] = entry.host
                q.append(entry)
                return
        self.top_q.append(entry)
        _push_heap(self.top_q, _comp)

    def peek(self, num: int) -> str | None:
        q = self.queues[num]
        if not q and not self.top_q:
            return None  # 'empty' (caller treats as nothing to do)
        if not q:
            # drain all consecutive greatest-host entries (Url_classifier.cc:141-151)
            host = self.top_q[0].host
            self.hosts[num] = host
            while self.top_q and self.top_q[0].host == host:
                q.append(_pop_heap(self.top_q, _comp))
        return q[0].url

    def pop(self, num: int) -> None:
        q = self.queues[num]
        if not q:
            raise RuntimeError("empty classifying queue")
        q.popleft()

    def empty(self) -> bool:
        return not self.top_q and all(not q for q in self.queues)

    def size(self) -> int:
        return len(self.top_q) + sum(len(q) for q in self.queues)

    def q_len(self, num: int) -> int:
        return len(self.queues[num])

    def q_len_top(self) -> int:
        return len(self.top_q)


def simulate_crawl_order(
    seed_urls: list[str], parallel: int
) -> tuple[list[tuple[int, str]], list[str]]:
    """Canonical round-robin schedule over the classifier.

    Seeds are filtered like the TCP ingest (absolute + http only,
    crawler.cc:1297); invalid URLs dropped (crawler.cc:1303-1306).

    Returns (pop_order, rejected): pop_order is [(queue_num, url)] in global
    pop sequence; rejected the dropped seed lines.
    """
    clf = UrlClassifier(parallel)
    rejected = []
    for line in seed_urls:
        try:
            u = Url(line)
        except UrlParseError:
            rejected.append(line)
            continue
        if u.absolute() and u.scheme() == b"http":
            clf.push(line)
        else:
            rejected.append(line)
    order: list[tuple[int, str]] = []
    while not clf.empty():
        progressed = False
        for num in range(parallel):
            url = clf.peek(num)
            if url is not None and clf.q_len(num) > 0:
                order.append((num, url))
                clf.pop(num)
                progressed = True
        if not progressed:  # pragma: no cover - defensive
            break
    return order, rejected
