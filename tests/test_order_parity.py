"""Crawl-ordering parity: the distributed engine vs the reference-classifier
simulator (north rule: "same crawl ordering and URL-seen set under the same
seed list + politeness budget").

Scope, per SURVEY.md §2.4: the reference's full global interleave is
inherently sequential and timing-dependent; the distributed engine
guarantees (a) per-host FIFO order identical to the classifier's per-host
order and (b) an identical URL-seen SET. Both are asserted here against the
pure-Python port of Url_classifier.
"""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from mycelium_spark.operators.frontier import politeness_schedule
from mycelium_spark.operators.simulator import simulate_crawl_order
from mycelium_spark.functions.url import Url


def _seed_list():
    urls = []
    hosts = ["alpha.example", "beta.example", "Gamma.example", "hot.example"]
    k = 0
    for i in range(60):
        host = hosts[3] if i % 2 == 0 else hosts[i % 3]
        urls.append(f"http://{host}/p{k}")
        k += 1
    urls.append("https://skip.example/x")
    urls.append("ftp://skip.example/y")
    return urls


@pytest.mark.parametrize("budget", [1, 3, 8])
def test_per_host_fifo_matches_classifier(spark, budget):
    seeds = _seed_list()
    # simulator: reference-exact classifier, canonical round-robin schedule
    order, rejected = simulate_crawl_order(seeds, parallel=4)
    sim_by_host = defaultdict(list)
    for _, url in order:
        sim_by_host[Url(url).host().decode()].append(url)

    # engine: frontier rows (seq = arrival), politeness rounds of `budget`
    rows = [(i, u) for i, u in enumerate(seeds) if u not in rejected]
    frontier = spark.createDataFrame(rows, ["seq", "url"]).withColumn(
        "host", F.expr("parse_url(url, 'HOST')")
    )
    # for a static frontier the engine's multi-round schedule is fully
    # determined by host_pos: round k schedules host_pos in (k*B, (k+1)*B];
    # equivalently per-host order == host_pos order. One job suffices —
    # but exercise the salted plan for the budget cut itself.
    eng_by_host = defaultdict(list)
    scheduled, deferred = politeness_schedule(frontier, budget, salt=4)
    first = scheduled.select("host", "host_pos", "url").collect()
    rest = (
        politeness_schedule(deferred, 10**9, salt=1)[0]
        .select("host", "host_pos", "url")
        .collect()
    )
    for r in sorted(first, key=lambda r: (r.host, r.host_pos)):
        eng_by_host[r.host].append(r.url)
    for r in sorted(rest, key=lambda r: (r.host, r.host_pos)):
        eng_by_host[r.host].append(r.url)

    # per-host sequences identical (raw hosts in the classifier; the seeds
    # here use distinct case so raw==engine host keying coincides)
    assert set(sim_by_host) == set(eng_by_host)
    for host in sim_by_host:
        assert eng_by_host[host] == sim_by_host[host], host

    # identical URL-seen set
    assert {u for v in eng_by_host.values() for u in v} == {u for _, u in order}


def test_salted_schedule_equals_plain(spark):
    # the two-phase skew plan must produce the identical scheduled set + order
    rows = [(i, f"http://h{i % 7}.example/p{i}", f"h{i % 7}.example") for i in range(500)]
    frontier = spark.createDataFrame(rows, ["seq", "url", "host"])
    plain, pdef = politeness_schedule(frontier, 13, salt=1)
    salted, sdef = politeness_schedule(frontier, 13, salt=8)
    a = sorted((r.host, r.host_pos, r.url) for r in plain.collect())
    b = sorted((r.host, r.host_pos, r.url) for r in salted.collect())
    assert a == b
    assert sorted(r.url for r in pdef.collect()) == sorted(r.url for r in sdef.collect())
