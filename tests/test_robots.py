"""robots.txt parser parity tests.

Encodes the documented example table (Robots.hh:66-93) in BOTH match modes,
the flex grammar edge cases (robots.ll), and the state handling
(crawler.cc:899-934).
"""

from mycelium_spark.functions.robots import (
    RobotsState,
    RuleType,
    canon_path,
    parse_robots,
    robots_state_for,
)

UA = b"mycelium web crawler - https://github.com/larroy/mycelium"


def test_basic_groups_and_order():
    r = parse_robots(
        b"User-agent: *\n"
        b"Disallow: /private\n"
        b"Allow: /private\n"  # first match wins → disallow
    )
    assert r.valid
    assert not r.path_allowed(UA, b"/private")
    assert r.path_allowed(UA, b"/other")


def test_exact_match_quirk():
    # Robots.cc:56 compares the whole rule against the whole path:
    # 'Disallow: /tmp' blocks ONLY exactly '/tmp'
    r = parse_robots(b"User-agent: *\nDisallow: /tmp\n")
    assert not r.path_allowed(UA, b"/tmp")
    assert r.path_allowed(UA, b"/tmp/file")  # proper prefix → no match
    assert r.path_allowed(UA, b"/tmp2")


def test_prefix_mode():
    r = parse_robots(b"User-agent: *\nDisallow: /tmp\n", exact_match=False)
    assert not r.path_allowed(UA, b"/tmp")
    assert not r.path_allowed(UA, b"/tmp/file")
    assert not r.path_allowed(UA, b"/tmp2")  # plain prefix semantics
    assert r.path_allowed(UA, b"/other")


def test_pct_encoding_canonicalization():
    # Robots.hh:66-93 example: /a%3cd.html and /a%3Cd.html are equivalent;
    # /~joe and /%7ejoe are equivalent (unescape of non-PATH chars)
    r = parse_robots(b"User-agent: *\nDisallow: /a%3cd.html\nDisallow: /%7ejoe/\n")
    # '~' is unreserved → %7e decodes on both sides; these ARE equivalent
    assert not r.path_allowed(UA, b"/~joe/")
    assert not r.path_allowed(UA, b"/%7ejoe/")
    # '<' is reserved/unsafe → %3c stays escaped and hex case is NOT folded:
    # the doc table (Robots.hh:80) claims /a%3Cd.html equivalent, but the
    # implementation's canon (escape→unescape_not) never uppercases hex, so
    # only the identical spelling matches. Implementation wins for parity.
    assert canon_path(b"/a%3cd.html") != canon_path(b"/a%3Cd.html")
    assert not r.path_allowed(UA, b"/a%3cd.html")
    assert r.path_allowed(UA, b"/a%3Cd.html")


def test_ua_stacking_and_group_close():
    r = parse_robots(
        b"User-agent: alpha\n"
        b"User-agent: beta\n"
        b"Disallow: /x\n"
        b"User-agent: gamma\n"
        b"Disallow: /y\n"
    )
    assert len(r.groups) == 2
    assert r.groups[0].ua == [b"alpha", b"beta"]
    assert r.groups[1].ua == [b"gamma"]
    # exact UA match only: 'alpha' group fires for alpha and beta
    assert not r.path_allowed(b"alpha", b"/x")
    assert not r.path_allowed(b"beta", b"/x")
    # no '*' group and UA unknown → allowed
    assert r.path_allowed(b"delta", b"/x")
    # gamma hits its own group
    assert not r.path_allowed(b"gamma", b"/y")
    assert r.path_allowed(b"gamma", b"/x")  # first matching group is gamma's? no —
    # groups are scanned in order; gamma matches only group 2


def test_comments_and_blanks():
    r = parse_robots(
        b"# top comment\n"
        b"\n"
        b"User-agent: * # inline\n"
        b"  \n"
        b"Disallow: /a # comment after rule\n"
    )
    assert r.groups[0].ua == [b"*"]
    assert r.groups[0].rules == [(RuleType.DISALLOW, b"/a")]


def test_crawl_delay_parsed_not_enforced():
    r = parse_robots(b"User-agent: *\nCrawl-delay: 10\nDisallow: /x\n")
    assert (RuleType.CRAWL_DELAY, b"10") in r.groups[0].rules
    assert r.crawl_delay() == 10.0
    # a CRAWL_DELAY rule acts as disallow if the path equals the value
    assert not r.path_allowed(UA, b"10")
    assert r.path_allowed(UA, b"/elsewhere")


def test_empty_disallow_matches_nothing():
    r = parse_robots(b"User-agent: *\nDisallow:\n")
    assert r.path_allowed(UA, b"/anything")


def test_html_sniff_eparse():
    state, robots = robots_state_for(200, b"<!DOCTYPE html><html><body>404</body></html>")
    assert state == RobotsState.EPARSE
    assert robots is None


def test_non_200_not_available():
    state, robots = robots_state_for(404, None)
    assert state == RobotsState.NOT_AVAILABLE


def test_present_state():
    state, robots = robots_state_for(200, b"User-agent: *\nDisallow: /x\n")
    assert state == RobotsState.PRESENT
    assert not robots.path_allowed(UA, b"/x")


def test_final_line_without_newline():
    # Disallow's trailing NEWLINE is optional (robots.ll:72) but
    # User-agent REQUIRES one (robots.ll:36)
    r = parse_robots(b"User-agent: *\nDisallow: /x")
    assert r.groups[0].rules == [(RuleType.DISALLOW, b"/x")]
    r2 = parse_robots(b"User-agent: *")
    assert r2.groups == []  # UA line at EOF without \n is dropped


def test_case_insensitive_directives():
    r = parse_robots(b"USER-AGENT: *\nDISALLOW: /x\n")
    assert not r.path_allowed(UA, b"/x")


def test_rules_before_any_ua():
    # rules accumulate into a group with no UA → never matches → allowed
    r = parse_robots(b"Disallow: /x\n")
    assert r.valid  # non-empty current pushed at EOF
    assert r.path_allowed(UA, b"/x")
