"""Frontier classifier simulator tests (SURVEY.md §2.4 scenarios)."""

from mycelium_spark.operators.simulator import UrlClassifier, simulate_crawl_order


def u(host, path="/"):
    return f"http://{host}{path}"


def test_fewer_hosts_than_queues():
    order, rejected = simulate_crawl_order(
        [u("a.com", "/1"), u("b.com", "/1"), u("a.com", "/2")], parallel=4
    )
    assert rejected == []
    # a.com binds queue 0, b.com queue 1; per-host FIFO preserved
    assert order == [(0, u("a.com", "/1")), (1, u("b.com", "/1")), (0, u("a.com", "/2"))]


def test_overflow_drains_greatest_host_first():
    clf = UrlClassifier(1)
    for host in ("a.com", "b.com", "c.com"):
        clf.push(u(host))
    # queue 0 claimed by a.com; b and c overflow
    assert clf.q_len_top() == 2
    assert clf.peek(0) == u("a.com")
    clf.pop(0)
    # drain: lexicographically greatest host first → c.com before b.com
    assert clf.peek(0) == u("c.com")
    clf.pop(0)
    assert clf.peek(0) == u("b.com")
    clf.pop(0)
    assert clf.empty()


def test_host_rebinding_after_drain():
    clf = UrlClassifier(2)
    clf.push(u("a.com", "/1"))
    clf.push(u("b.com", "/1"))
    clf.push(u("c.com", "/1"))  # overflows
    clf.push(u("c.com", "/2"))  # overflows to same host
    clf.pop(0)  # a.com done
    # peek(0) drains all c.com entries and rebinds queue 0
    assert clf.peek(0) == u("c.com", "/1")
    assert clf.q_len(0) == 2
    # a push for c.com now lands in queue 0
    clf.push(u("c.com", "/3"))
    assert clf.q_len(0) == 3


def test_seed_filtering():
    order, rejected = simulate_crawl_order(
        ["https://secure.com/", "ftp://f.com/x", "http://ok.com/", "::: not a url"],
        parallel=2,
    )
    assert [url for _, url in order] == ["http://ok.com/"]
    assert len(rejected) == 3


def test_case_variant_hosts_are_distinct_queues():
    # classifier operates on raw hosts (normalization happens later)
    order, _ = simulate_crawl_order(
        [u("A.com", "/1"), u("a.com", "/2")], parallel=4
    )
    assert order == [(0, u("A.com", "/1")), (1, u("a.com", "/2"))]


def test_hot_host_fifo():
    seeds = [u("hot.com", f"/{i}") for i in range(10)] + [u("b.com", "/x")]
    order, _ = simulate_crawl_order(seeds, parallel=2)
    hot = [url for _, url in order if "hot.com" in url]
    assert hot == [u("hot.com", f"/{i}") for i in range(10)]


def test_duplicate_urls_not_dedup_by_classifier():
    # the classifier never dedups (dedup is the store's job, Doc.cc:79)
    order, _ = simulate_crawl_order([u("a.com"), u("a.com")], parallel=1)
    assert len(order) == 2
