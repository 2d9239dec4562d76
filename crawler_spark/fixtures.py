"""Deterministic synthetic web-graph fixtures (FIXTURES.md §2-6).

Replaces live HTTP (reference fetch collect/collect.go:42-83) with a seeded
corpus whose bodies embed outlinks in the same regex-extractable form the
reference parsers consume. Everything is derived from md5 of stable strings —
no RNG state, so any subset regenerates identically at any scale.

Site layout (douban-like 3 levels + a filtered group site,
parse/doubanbook/book.go + parse/doubangroup/group.go behaviors):

- http://books.example.com/            tag root (seed, priority 1)
    -> /booklist/<t>?page=<p>          rule: tag      -> booklist (prio 10)
    -> /book/<id>  (title carried)     rule: booklist -> detail   (prio 100)
    detail pages: item fields (book_name, author, pages, price) + media spans
- http://groups.example.com/           topic pages linking topic pages
    rule: group -> group, filter_regex gate, emits matching URL as the item
    (GetSunRoom semantics, parse/doubangroup/group.go:57-71)

Deliberate hazards:
- some outlinks are messy (uppercase host, :80 port, fragment, unsorted
  query) but canonically equal to clean ones -> exercises canonicalization
  + seen-set dedup
- ~3% of pages have short bodies (<6000 chars) -> validity failure + retry
  (engine/schedule.go:364-372, 431-447)
- ~2% have status 500 -> fetch failure + retry
- books host has robots disallow prefix /private/; some tag pages link there
- media host serves <img> refs only (media spans)
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from .textcore import LimitTier, Rule, TaskCfg, canonicalize, host_of, seen_key

BOOKS = "http://books.example.com"
GROUPS = "http://groups.example.com"
MEDIA = "img://media.example.net"

FILLER_WORDS = (
    "crawl frontier spark shuffle partition parquet arrow vector batch "
    "round budget token bucket robots polite host depth priority queue "
    "bloom filter anti join window rank seq lineage snapshot resume"
).split()


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


_POOL_N = 1 << 12
_POOL_TEXT: str | None = None
_POOL_OFFSETS: list[int] | None = None


def _pool() -> tuple[str, list[int]]:
    """Deterministic ~25KB word pool + per-word char offsets, built once.

    Filler is then an O(n_chars) slice instead of O(n_words) md5 calls —
    the difference between seconds and minutes when generating 10^5-page
    bench corpora."""
    global _POOL_TEXT, _POOL_OFFSETS
    if _POOL_TEXT is None:
        words = [
            FILLER_WORDS[_h(f"pool:{i}") % len(FILLER_WORDS)] for i in range(_POOL_N)
        ]
        offsets, pos = [], 0
        for w in words:
            offsets.append(pos)
            pos += len(w) + 1
        _POOL_TEXT = " ".join(words) + " "
        _POOL_OFFSETS = offsets
    return _POOL_TEXT, _POOL_OFFSETS


def _filler(tag: str, n_chars: int) -> str:
    """Deterministic word salad of ~n_chars (pool slice keyed by md5(tag))."""
    text, offsets = _pool()
    start = offsets[_h(f"fill:{tag}") % _POOL_N]
    need = n_chars
    out = []
    pos = start
    while need > 0:
        take = min(need, len(text) - pos)
        out.append(text[pos : pos + take])
        need -= take
        pos = 0
    return "".join(out).strip()


@dataclass
class Fixture:
    web_graph: list[dict]  # url, host, status, body, latency_ms
    seeds: list[dict]  # frontier rows (seq assigned)
    tasks: list[TaskCfg]
    rules: list[Rule]
    robots: list[dict]  # host, disallow_prefixes, crawl_delay_ms
    round_s: int
    # pages served as GBK-encoded bytes (write_fixture stores them in a
    # body_bytes binary column; GraphFetcher sniffs + transcodes — the
    # DeterminEncoding path, collect/collect.go:85-97). The in-memory str
    # body stays authoritative for the oracle.
    gbk_urls: set[str] = None  # type: ignore[assignment]


def _page(url: str, body_core: str, *, pad_to: int = 6200) -> dict:
    """Build a web_graph row; hash of url decides hazard class."""
    h = _h("hazard:" + url)
    status = 200
    if h % 100 < 2:
        status = 500
    body = body_core
    if h % 100 in (2, 3, 4):  # short body -> validity failure
        body = body_core[:1000]
    elif len(body) < pad_to:
        body = body + "\n" + _filler(url, pad_to - len(body))
    return {
        "url": url,
        "host": host_of(url),
        "status": status,
        "body": body,
        "latency_ms": int(h % 90) + 10,
    }


def _messy(url: str, salt: str) -> str:
    """A non-canonical spelling of `url` (canonically equal)."""
    h = _h("messy:" + salt + url)
    u = url.replace("http://", "HTTP://", 1) if h % 2 else url
    u = u.replace(".example.com", ".EXAMPLE.com:80", 1)
    if "?" in u:
        base, q = u.split("?", 1)
        u = base + "?" + "&".join(reversed(q.split("&")))
    return u + "#frag" + str(h % 7)


def make_fixture(
    n_tags: int = 3,
    lists_per_tag: int = 3,
    books_per_list: int = 8,
    n_topics: int = 40,
    round_s: int = 60,
    book_limits: tuple[tuple[int, int, int], ...] = ((1, 3, 1), (20, 60, 20)),
    group_limits: tuple[tuple[int, int, int], ...] = ((10, 60, 10),),
) -> Fixture:
    pages: list[dict] = []
    gbk_urls: set[str] = set()

    # --- books site -------------------------------------------------------
    tag_links = []
    for t in range(n_tags):
        for p in range(lists_per_tag):
            tag_links.append((f"/booklist/{t}?page={p}&sort=hot", f"tag{t}p{p}"))
    # a disallowed link and a messy duplicate of a real link
    root_body = "<h1>Book tags</h1>\n" + "\n".join(
        f'<a href="{u}">{name}</a>' for u, name in tag_links
    )
    root_body += f'\n<a href="/private/admin?x=1">admin</a>'
    root_body += f'\n<a href="{_messy(BOOKS + tag_links[0][0], "root")}">dup</a>'
    pages.append(_page(BOOKS + "/", root_body))

    book_id = 0
    for t in range(n_tags):
        for p in range(lists_per_tag):
            list_url = f"{BOOKS}/booklist/{t}?page={p}&sort=hot"
            rows = []
            for b in range(books_per_list):
                title = f"Book {t}-{p}-{b}"
                link = f"/book/{book_id}"
                if _h(f"dupbook:{t}:{p}:{b}") % 5 == 0 and book_id > 0:
                    # duplicate: link an existing book (cross-list dedup)
                    link = f"/book/{max(0, book_id - 3)}"
                    title = f"Book dup of {link}"
                else:
                    book_id += 1
                rows.append(f'<a href="{link}" title="{title}">{title}</a>')
            body = f"<h2>List {t}/{p}</h2>\n" + "\n".join(rows)
            if t == 0 and p == 0:
                # one list page is served as GBK bytes (write_fixture
                # encodes it): meta tag for the charset sniff + CJK text
                # that round-trips only if the transcode is correct
                body = (
                    '<meta charset="gbk">\n<h2>图书列表 List 0/0 网页</h2>\n'
                    + "\n".join(rows)
                )
                gbk_urls.add(list_url)
            pages.append(_page(list_url, body))

    for bid in range(book_id):
        url = f"{BOOKS}/book/{bid}"
        author = f"Author {_h('a' + str(bid)) % 50}"
        npages = 100 + _h("p" + str(bid)) % 900
        price = f"{10 + _h('$' + str(bid)) % 90}.{_h('c' + str(bid)) % 100:02d}"
        body = (
            f"<h1>Book {bid}</h1>\n"
            f'<meta name="author" content="{author}">\n'
            f'<img src="{MEDIA}/cover{bid}.jpg"/>\n'
            f"<span>pages: {npages}</span>\n"
            f"<span>price: ¥{price}</span>\n"
            + _filler("bookbody" + str(bid), 3000)
            + f'\n<img src="{MEDIA}/sample{bid}.png"/>\n'
        )
        pages.append(_page(url, body))

    # --- groups site (self-linking topic graph with content filter) ------
    for i in range(n_topics):
        url = f"{GROUPS}/topic/{i}"
        nbr = [(i * 3 + 1 + k) % n_topics for k in range(3)]
        body = f"<h1>Topic {i}</h1>\n" + "\n".join(
            f'<a href="{GROUPS}/topic/{j}">topic {j}</a>' for j in nbr
        )
        if _h("sun:" + str(i)) % 3 == 0:
            body += "\n<p>this flat has a sunroom view</p>"
        pages.append(_page(url, body))
    groups_root = GROUPS + "/"
    pages.append(
        _page(
            groups_root,
            "<h1>Topics</h1>\n"
            + "\n".join(
                f'<a href="{GROUPS}/topic/{i}">topic {i}</a>'
                for i in range(0, n_topics, max(1, n_topics // 8))
            ),
        )
    )

    tasks = [
        TaskCfg(
            name="book_task",
            reload=False,
            max_depth=5,
            limits=tuple(LimitTier(*t) for t in book_limits),
        ),
        TaskCfg(
            name="group_task",
            reload=False,
            max_depth=3,
            limits=tuple(LimitTier(*t) for t in group_limits),
        ),
    ]

    rules = [
        Rule(
            task="book_task",
            rule="tag",
            link_regex=r'<a href="(/booklist/[^"]+)">([^<]+)</a>',
            url_prefix=BOOKS,
            next_rule="booklist",
            next_priority=10,
        ),
        Rule(
            task="book_task",
            rule="booklist",
            link_regex=r'<a href="(/book/[^"]+)" title="([^"]+)">',
            url_prefix=BOOKS,
            next_rule="detail",
            next_priority=100,
            carry_field="book_name",
        ),
        Rule(
            task="book_task",
            rule="detail",
            item_fields=("book_name", "author", "pages", "price"),
            item_regexes={
                "author": r'<meta name="author" content="([^"]+)">',
                "pages": r"pages: (\d+)",
                "price": r"price: ¥([\d.]+)",
            },
        ),
        Rule(
            task="group_task",
            rule="group",
            link_regex=r'<a href="(http://groups\.example\.com/topic/[^"]+)">',
            next_rule="group",
            next_priority=0,
            filter_regex="sunroom",
            emit_url_as="url",
        ),
    ]

    robots = [
        {"host": "books.example.com", "disallow_prefixes": ["/private/"], "crawl_delay_ms": 0},
        {"host": "groups.example.com", "disallow_prefixes": [], "crawl_delay_ms": 5000},
    ]

    seeds = []
    for i, (url, task, rule, prio) in enumerate(
        [(BOOKS + "/", "book_task", "tag", 1), (groups_root, "group_task", "group", 1)]
    ):
        curl = canonicalize(url)
        seeds.append(
            {
                "url": url,
                "curl": curl,
                "host": host_of(url),
                "method": "GET",
                "key": seen_key(curl),
                "task": task,
                "rule": rule,
                "depth": 0,
                "priority": prio,
                "seq": i,
                "attempt": 0,
                "tmp": {},
            }
        )

    return Fixture(
        web_graph=pages, seeds=seeds, tasks=tasks, rules=rules, robots=robots,
        round_s=round_s, gbk_urls=gbk_urls,
    )


# --------------------------------------------------------------------------
# Parquet materialization
# --------------------------------------------------------------------------


def write_fixture(fx: Fixture, out_dir: str, spark) -> None:
    from . import schemas

    os.makedirs(out_dir, exist_ok=True)
    gbk = fx.gbk_urls or set()
    if gbk:
        # serve marked pages as raw GBK bytes: the str body is the
        # oracle's truth; the parquet carries only the encoded bytes, so
        # the engine MUST transcode correctly to stay byte-equal
        rows = [
            {**p, "body": None, "body_bytes": p["body"].encode("gbk")}
            if p["url"] in gbk
            else {**p, "body_bytes": None}
            for p in fx.web_graph
        ]
        wg_schema = schemas.WEB_GRAPH_BYTES
    else:
        rows = fx.web_graph
        wg_schema = schemas.WEB_GRAPH
    spark.createDataFrame(rows, wg_schema).repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/web_graph")
    spark.createDataFrame(fx.seeds, schemas.FRONTIER).write.mode("overwrite").parquet(
        f"{out_dir}/seeds"
    )
    spark.createDataFrame(
        [
            {
                "name": t.name,
                "reload": t.reload,
                "max_depth": t.max_depth,
                "limits": [
                    {"event_count": l.event_count, "event_dur_s": l.event_dur_s, "bucket": l.bucket}
                    for l in t.limits
                ],
                "closed": t.closed,
            }
            for t in fx.tasks
        ],
        schemas.TASKS,
    ).write.mode("overwrite").parquet(f"{out_dir}/tasks")
    spark.createDataFrame(
        [
            {
                "task": r.task,
                "rule": r.rule,
                "link_regex": r.link_regex,
                "url_prefix": r.url_prefix,
                "next_rule": r.next_rule,
                "next_priority": r.next_priority,
                "carry_field": r.carry_field,
                "item_fields": list(r.item_fields),
                "item_regexes": dict(r.item_regexes),
                "filter_regex": r.filter_regex,
                "emit_url_as": r.emit_url_as,
            }
            for r in fx.rules
        ],
        schemas.RULES,
    ).write.mode("overwrite").parquet(f"{out_dir}/rules")
    spark.createDataFrame(fx.robots, schemas.ROBOTS).write.mode("overwrite").parquet(
        f"{out_dir}/robots"
    )
