"""Composed discovery pipeline: every gate visibly removes its class
and the budget binds."""

from mycelium_spark.plans import entries as E

SF_DIR = "/root/testdata/sf0.01"


def test_discovery_gates_and_budget(spark):
    out = E.QUERIES["discovery_pipeline"](spark, SF_DIR).collect()
    hosts = {r["host"]: r for r in out}
    # the blocked domain never earns a quota row
    assert "badsite.test" not in hosts
    # quotas sum exactly to the round budget (largest-remainder law)
    assert sum(r["quota"] for r in out) == E._DISC_BUDGET
    # every host schedules within both its candidates and its quota
    for r in out:
        assert 0 <= r["scheduled"] <= min(r["n_candidates"], r["quota"])
    # sitemap hosts survive (site0.test carries seeds and links)
    assert any(h.startswith("site") for h in hosts)


def test_discovery_removes_trap_and_keyword_urls(spark):
    docs = E._read(spark, SF_DIR, "documents")
    robots, pages = E._sm_frames(docs)
    from mycelium_spark.sources import sitemap as sm

    seeds = sm.sitemap_seeds(robots, pages)
    n_seed_locs = seeds.select("loc").distinct().count()
    out = E.QUERIES["discovery_pipeline"](spark, SF_DIR).collect()
    total_scheduled_pool = sum(r["n_candidates"] for r in out)
    # candidates after gating exceed the seed pool (links add mass) but
    # are strictly below the raw union (traps/keywords/seen removed)
    links = docs.selectExpr(f"{E._DISC_LINK_URL} AS url").distinct().count()
    assert n_seed_locs < total_scheduled_pool < n_seed_locs + links
