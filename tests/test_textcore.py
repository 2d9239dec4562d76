"""Unit tests for the pure contract core (SURVEY.md §5.2 layer 1)."""

import hashlib

from crawler_spark.textcore import (
    LimitTier,
    Rule,
    canonicalize,
    extract_links,
    extract_spans,
    host_round_cap,
    initial_carry,
    seen_key,
    task_budget,
    tier_carry_after,
)


def test_canonicalize():
    assert canonicalize("HTTP://Books.Example.COM:80/a?b=2&a=1#frag") == (
        "http://books.example.com/a?a=1&b=2"
    )
    assert canonicalize("https://X.io:443/") == "https://x.io/"
    assert canonicalize("http://x.io") == "http://x.io/"
    # idempotent
    u = canonicalize("http://a.b/p?z=1&y=2")
    assert canonicalize(u) == u


def test_seen_key_md5_parity():
    # parity with spider/request.go:113-117: md5(URL + Method) hex
    url, method = "http://x.io/a", "GET"
    assert seen_key(url, method) == hashlib.md5((url + method).encode()).hexdigest()


def test_budget_math_douban():
    # douban_book: 1 req/3s burst 1 AND 20 req/60s burst 20
    # (parse/doubanbook/book.go:17-20) over 60s rounds
    tiers = [LimitTier(1, 3, 1), LimitTier(20, 60, 20)]
    carries = [initial_carry(t) for t in tiers]
    # round 1: tier1 = (3+60)//3 = 21, tier2 = (1200+1200)//60 = 40 -> 21... but
    # min is 21? tier2 allows 40 -> budget 21? No: min(21, 40) = 21.
    assert task_budget(carries, tiers, 60) == 21
    used = 21
    carries = [tier_carry_after(c, t, 60, used) for c, t in zip(carries, tiers)]
    assert carries[0] == 0  # 3 + 60 - 63
    assert carries[1] == min(1200, 1200 + 1200 - 1260)  # 1140
    # round 2: tier1 (0+60)//3 = 20, tier2 (1140+1200)//60 = 39 -> 20
    assert task_budget(carries, tiers, 60) == 20


def test_host_round_cap():
    assert host_round_cap(5000, 60) == 12
    assert host_round_cap(0, 60) > 1 << 30


def test_extract_links_order_and_prefix():
    rule = Rule(
        task="t",
        rule="r",
        link_regex=r'<a href="([^"]+)" t="([^"]+)">',
        url_prefix="http://h",
    )
    body = '<a href="/x" t="A"> .. <a href="http://e/y" t="B"> .. <a href="/z" t="C">'
    links = extract_links(body, rule)
    # left-to-right non-overlapping, like Go FindAllSubmatch
    assert links == [("http://h/x", "A"), ("http://e/y", "B"), ("http://h/z", "C")]


def test_extract_spans_interleaving():
    rule = Rule(task="t", rule="r", link_regex=r'<a href="([^"]+)">')
    body = 'intro <a href="/l1"> mid <img src="m://i.png"/> tail'
    spans = extract_spans(body, rule)
    kinds = [s[0] for s in spans]
    assert kinds == ["text", "link", "text", "media", "text"]
    # offsets are document order and strictly increasing
    offs = [s[3] for s in spans]
    assert offs == sorted(offs)
    link = [s for s in spans if s[0] == "link"][0]
    assert link[1] == "/l1" and link[2] == ""
    media = [s for s in spans if s[0] == "media"][0]
    assert media[2] == "m://i.png" and media[1] == ""
