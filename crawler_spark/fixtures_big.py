"""Distributed bench-scale synthetic web graph.

The unit/golden fixtures (fixtures.py) are driver-generated — right for
oracle comparison, far too slow for a 10^5..10^6-page bench corpus. This
module generates the same site layout distributedly: a spec frame of
(kind, id) rows fans out through ``mapInPandas`` and each executor renders
its pages' bodies locally. Bodies are deterministic functions of the URL
alone, so the corpus is independent of partitioning and regenerates
identically at any parallelism — the precondition for the N-vs-4N scaling
comparison (BASELINE.json: same input, two cluster sizes).

Differences from the small fixture, all bench-motivated:
- the groups root links to EVERY topic (stride 1), so the crawl saturates
  in a few fat waves instead of a long breadth-first tail of tiny rounds;
- robots crawl-delay is 0 (politeness still exercised via task budgets):
  the bench measures throughput, not the delay arithmetic, which the
  golden/property layers already pin;
- body size is a parameter (``pad_to``) so the per-page parse/shuffle work
  can be scaled until compute dominates fixed per-round driver latency.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .fixtures import BOOKS, GROUPS, MEDIA, _filler, _h, _page
from .textcore import LimitTier, Rule, TaskCfg, canonicalize, host_of, seen_key


def big_web_graph(
    spark: SparkSession,
    n_tags: int = 40,
    lists_per_tag: int = 25,
    books_per_list: int = 60,
    n_topics: int = 30_000,
    pad_to: int = 6200,
    parallelism: int | None = None,
) -> DataFrame:
    n_lists = n_tags * lists_per_tag
    n_books = n_lists * books_per_list
    parallelism = parallelism or int(spark.conf.get("spark.sql.shuffle.partitions"))

    kinds = [("root", 1), ("list", n_lists), ("book", n_books),
             ("topic", n_topics), ("groot", 1)]
    spec = reduce(
        DataFrame.unionByName,
        [
            spark.range(n).selectExpr(f"'{k}' AS kind", "id")
            for k, n in kinds
        ],
    ).repartition(parallelism)

    def render(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for kind, i in zip(pdf["kind"], pdf["id"]):
                i = int(i)
                if kind == "root":
                    body = "<h1>Book tags</h1>\n" + "\n".join(
                        f'<a href="/booklist/{t}?page={p}&sort=hot">tag{t}p{p}</a>'
                        for t in range(n_tags)
                        for p in range(lists_per_tag)
                    )
                    body += '\n<a href="/private/admin?x=1">admin</a>'
                    rows.append(_page(BOOKS + "/", body, pad_to=pad_to))
                elif kind == "list":
                    t, p = divmod(i, lists_per_tag)
                    url = f"{BOOKS}/booklist/{t}?page={p}&sort=hot"
                    links = []
                    for b in range(books_per_list):
                        bid = i * books_per_list + b
                        if _h(f"dupbook:{bid}") % 17 == 0 and bid > 3:
                            bid = bid - 3  # cross-list duplicate link
                        links.append(
                            f'<a href="/book/{bid}" title="Book {bid}">Book {bid}</a>'
                        )
                    rows.append(
                        _page(url, f"<h2>List {t}/{p}</h2>\n" + "\n".join(links),
                              pad_to=pad_to)
                    )
                elif kind == "book":
                    url = f"{BOOKS}/book/{i}"
                    author = f"Author {_h('a' + str(i)) % 500}"
                    npages = 100 + _h("p" + str(i)) % 900
                    price = f"{10 + _h('$' + str(i)) % 90}.{_h('c' + str(i)) % 100:02d}"
                    body = (
                        f"<h1>Book {i}</h1>\n"
                        f'<meta name="author" content="{author}">\n'
                        f'<img src="{MEDIA}/cover{i}.jpg"/>\n'
                        f"<span>pages: {npages}</span>\n"
                        f"<span>price: ¥{price}</span>\n"
                        + _filler("bookbody" + str(i), max(1000, pad_to // 2))
                        + f'\n<img src="{MEDIA}/sample{i}.png"/>\n'
                    )
                    rows.append(_page(url, body, pad_to=pad_to))
                elif kind == "topic":
                    url = f"{GROUPS}/topic/{i}"
                    nbr = [(i * 3 + 1 + k) % n_topics for k in range(3)]
                    body = f"<h1>Topic {i}</h1>\n" + "\n".join(
                        f'<a href="{GROUPS}/topic/{j}">topic {j}</a>' for j in nbr
                    )
                    if _h("sun:" + str(i)) % 3 == 0:
                        body += "\n<p>this flat has a sunroom view</p>"
                    rows.append(_page(url, body, pad_to=pad_to))
                else:  # groot — links to every topic: few fat waves
                    body = "<h1>Topics</h1>\n" + "\n".join(
                        f'<a href="{GROUPS}/topic/{j}">topic {j}</a>'
                        for j in range(n_topics)
                    )
                    rows.append(_page(GROUPS + "/", body, pad_to=pad_to))
            yield pd.DataFrame(rows, columns=[f.name for f in schemas.WEB_GRAPH.fields])

    return spec.mapInPandas(render, schemas.WEB_GRAPH)


def bench_tasks_rules_robots(
    task_budget_per_round: int = 200_000,
) -> tuple[list[TaskCfg], list[Rule], list[dict]]:
    """Same rule set as fixtures.make_fixture, bench-scale budgets."""
    b = task_budget_per_round
    tasks = [
        TaskCfg(name="book_task", reload=False, max_depth=5,
                limits=(LimitTier(b, 60, b),)),
        TaskCfg(name="group_task", reload=False, max_depth=3,
                limits=(LimitTier(b, 60, b),)),
    ]
    rules = [
        Rule(task="book_task", rule="tag",
             link_regex=r'<a href="(/booklist/[^"]+)">([^<]+)</a>',
             url_prefix=BOOKS, next_rule="booklist", next_priority=10),
        Rule(task="book_task", rule="booklist",
             link_regex=r'<a href="(/book/[^"]+)" title="([^"]+)">',
             url_prefix=BOOKS, next_rule="detail", next_priority=100,
             carry_field="book_name"),
        Rule(task="book_task", rule="detail",
             item_fields=("book_name", "author", "pages", "price"),
             item_regexes={
                 "author": r'<meta name="author" content="([^"]+)">',
                 "pages": r"pages: (\d+)",
                 "price": r"price: ¥([\d.]+)",
             }),
        Rule(task="group_task", rule="group",
             link_regex=r'<a href="(http://groups\.example\.com/topic/[^"]+)">',
             next_rule="group", next_priority=0,
             filter_regex="sunroom", emit_url_as="url"),
    ]
    robots = [
        {"host": "books.example.com", "disallow_prefixes": ["/private/"],
         "crawl_delay_ms": 0},
        {"host": "groups.example.com", "disallow_prefixes": [],
         "crawl_delay_ms": 0},
    ]
    return tasks, rules, robots


def fat_frontier(spark: SparkSession, n_books: int, parallelism: int | None = None) -> DataFrame:
    """A frontier of ALL book-detail URLs at depth 0 — the steady-state
    fat-wave shape of a 10^10-URL crawl, injected directly as the seed
    frontier table (north_rule: 'same seed list' = same frontier). One
    engine round then exercises the whole wave pipeline (dedup, budgeted
    top-k, salted fetch, parse, span documents, metrics, commit) at a
    scale where parallel compute dominates fixed per-round driver latency,
    which is what the N-vs-4N scaling criterion is about."""
    parallelism = parallelism or int(spark.conf.get("spark.sql.shuffle.partitions"))
    url = f"concat('{BOOKS}/book/', id)"
    return (
        spark.range(n_books)
        .repartition(parallelism)
        .selectExpr(
            f"{url} AS url",
            f"{url} AS curl",  # already canonical
            "'books.example.com' AS host",
            "'GET' AS method",
            f"md5(concat({url}, 'GET')) AS key",
            "'book_task' AS task",
            "'detail' AS rule",
            "CAST(0 AS INT) AS depth",
            "CAST(100 AS INT) AS priority",
            "id AS seq",
            "CAST(0 AS INT) AS attempt",
            "map() AS tmp",
        )
        .selectExpr(
            "url", "curl", "host", "method", "key", "task", "rule",
            "depth", "priority", "seq", "attempt",
            "CAST(tmp AS map<string,string>) AS tmp",
        )
    )


def bench_seeds(spark: SparkSession) -> DataFrame:
    rows = []
    for i, (url, task, rule, prio) in enumerate(
        [(BOOKS + "/", "book_task", "tag", 1), (GROUPS + "/", "group_task", "group", 1)]
    ):
        curl = canonicalize(url)
        rows.append(
            {
                "url": url, "curl": curl, "host": host_of(url), "method": "GET",
                "key": seen_key(curl), "task": task, "rule": rule,
                "depth": 0, "priority": prio, "seq": i, "attempt": 0, "tmp": {},
            }
        )
    return spark.createDataFrame(rows, schemas.FRONTIER)


def clustered_embeddings(
    spark: SparkSession,
    n: int = 2000,
    dim: int = 64,
    k_clusters: int = 32,
    sigma: float = 0.05,
    seed: int = 20260821,
) -> DataFrame:
    """(vec_id, embedding float[], label): a deterministic
    mixture-of-Gaussians embedding corpus — the CLUSTERED counterpart of
    the isotropic /root/testdata embeddings table (same schema, matched
    N/dim by default), for the ANN index-selection study's second
    measurement regime (VERDICT r4 item 3).

    Real embedding corpora live on clustered manifolds; the published
    IVFPQ result that residual encoding beats shared codebooks (Jégou et
    al., PAMI 2011 §V-A) holds in exactly this regime, while SCALE.md's
    isotropic table measures the regime where it loses. Geometry:
    ``k_clusters`` unit-norm centers drawn from an isotropic Gaussian
    (pairwise distance concentrates at sqrt(2)), points = center +
    per-dim N(0, sigma^2) noise; at the sigma=0.05/dim=64 defaults the
    expected within-cluster distance is sqrt(2*dim)*sigma ~ 0.57 —
    compact clusters with overlapping tails, so nearest neighbors are
    intra-cluster but cell boundaries still matter. Cluster sizes are
    round-robin (n/k each), labels carry ground truth.

    Determinism: a single seeded NumPy generator; same (n, dim,
    k_clusters, sigma, seed) -> byte-identical corpus on every call, so
    studies and tests reproduce exactly. Generated driver-side (n*dim
    floats — a fixture, not an operator; the 10^10-scale corpus this
    stands in for arrives as a parquet/Iceberg table, not from a
    generator)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % k_clusters
    pts = centers[labels] + sigma * rng.standard_normal((n, dim))
    pts = pts.astype("float32")
    rows = [
        (int(i), [float(x) for x in pts[i]], int(labels[i])) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
