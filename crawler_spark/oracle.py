"""Pure-Python reference-semantics oracle (SURVEY.md §5.2).

Re-implements the reference crawler's fetch-parse-store loop
(engine/schedule.go:324-447) as deterministic batch micro-rounds and
produces golden outputs the Spark engine must match exactly:
crawl order, final URL-seen set, span documents, extracted items,
per-round metrics.

The deterministic micro-round CONTRACT (the reference's order is only
defined up to goroutine interleaving + random sleep, spider/request.go:88-90;
this contract pins the disabled-jitter, batch-equivalent semantics —
SURVEY.md §7.3 hard part 1):

Per round r (duration round_s seconds):
 1. Expire: drop frontier rows with depth > task.max_depth or task closed
    (Request.Check, spider/request.go:100-107) — consume no budget.
 2. Dedup: drop rows whose key is in `seen` unless task.reload
    (engine/schedule.go:343-348) — consume no budget. Within-round key
    duplicates keep the first by (-priority, seq); later duplicates are
    dropped (the reference pops-and-skips them after the first marks
    visited; outcome identical).
 3. Task budget: B_t = min over limit tiers of admissible count
    (MultiLimiter semantics, limiter/limiter.go:33-41; exact integer token
    math in textcore.tier_available). Select per task the first B_t rows
    ordered by (-priority, seq) — the two-class priority-first FIFO
    (engine/schedule.go:254-264) generalized to integer priorities.
 4. Host cap (north_rule politeness addition): within the selected union,
    per host keep the first floor(round_s*1000/crawl_delay_ms) rows by
    (-priority, seq); cut rows STAY in the frontier for later rounds.
 5. Mark all wave keys seen BEFORE fetching (engine/schedule.go:351).
 6. Fetch = lookup of the canonical URL in the synthetic web graph
    (simulated HTTP resolves the canonical form). ok := status==200 and
    len(body) >= 6000 (engine/schedule.go:364-372).
 7. Failures: unmark seen if not reload; first failure (attempt 0) →
    re-enqueue with attempt=1; second → permanent failure
    (SetFailure, engine/schedule.go:431-447).
 8. Parse ok pages with the row's rule (rules-as-data): links get
    depth+1, the rule's next_rule/next_priority, carried tmp; robots
    disallow filtering applies at enqueue (north_rule addition). Items
    and span documents are emitted (textcore.extract_*).
 9. Seq assignment: new links sorted by (parent_seq, match_idx) get
    seq = max_seq + rank; retries follow, sorted by original seq.
10. Crawl order within the round = final wave sorted by (-priority, seq).

Stops when the frontier is empty or max_rounds is hit.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from urllib.parse import urlsplit

from .textcore import (
    Rule,
    TaskCfg,
    canonicalize,
    extract_items,
    extract_links,
    extract_spans,
    host_of,
    robots_allowed,
    seen_key,
    task_budget,
    tier_carry_after,
    initial_carry,
    host_round_cap,
    MIN_BODY_LEN,
)


@dataclass
class OracleResult:
    order: list[tuple[int, str, int]] = field(default_factory=list)  # (i, curl, round)
    # (round, priority, seq, curl) — the engine's order-table projection,
    # used to inline an equality oracle for the E2E driver query
    order_full: list[tuple[int, int, int, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    documents: list[tuple[str, list[tuple[str, str, str, int]]]] = field(default_factory=list)
    results: list[dict] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    failures: list[tuple[str, str]] = field(default_factory=list)  # (key, url)
    rounds: int = 0


class OracleCtl:
    """Between-rounds task control handed to ``run_oracle(on_round=...)``.

    Mirrors CrawlEngine.set_task_closed / run_task (the etcd-watch
    runTasks/deleteTasks analog, engine/schedule.go:449-563) so an engine
    run driven by the same schedule is row-equal to the oracle.
    """

    def __init__(self, taskmap: dict, frontier: list[dict], max_seq: int):
        self.taskmap = taskmap
        self.frontier = frontier
        self.max_seq = max_seq

    def close_task(self, name: str) -> None:
        self.taskmap[name] = replace(self.taskmap[name], closed=True)

    def open_task(self, name: str) -> None:
        self.taskmap[name] = replace(self.taskmap[name], closed=False)

    def push_seeds(self, name: str, seed_rows: list[dict]) -> None:
        self.open_task(name)
        for r in seed_rows:
            rr = dict(r)
            self.max_seq += 1
            rr["seq"] = self.max_seq
            rr.setdefault("attempt", 0)
            self.frontier.append(rr)


def run_oracle(
    seeds: list[dict],
    web_graph: list[dict],
    tasks: list[TaskCfg],
    rules: list[Rule],
    robots: list[dict],
    round_s: int = 60,
    max_rounds: int = 10_000,
    on_round=None,
    host_budget_overrides: dict[str, int] | None = None,
) -> OracleResult:
    graph = {canonicalize(p["url"]): p for p in web_graph}
    taskmap = {t.name: t for t in tasks}
    rulemap = {(r.task, r.rule): r for r in rules}
    robots_map = {r["host"]: r for r in robots}

    frontier: list[dict] = [dict(s) for s in seeds]
    max_seq = max((s["seq"] for s in seeds), default=-1)
    carries: dict[str, list[int]] = {
        t.name: [initial_carry(tier) for tier in t.limits] for t in tasks
    }
    failed_once: set[str] = set()
    res = OracleResult()
    fetch_i = 0

    for rnd in range(1, max_rounds + 1):
        # 1-2. expire + dedup
        kept: list[dict] = []
        for f in frontier:
            t = taskmap[f["task"]]
            if t.closed or f["depth"] > t.max_depth:
                continue
            if not t.reload and f["key"] in res.seen:
                continue
            kept.append(f)
        # within-round duplicate keys: first by (-priority, seq) wins
        kept.sort(key=lambda f: (-f["priority"], f["seq"]))
        seen_keys_round: set[str] = set()
        dedup: list[dict] = []
        for f in kept:
            if not taskmap[f["task"]].reload:
                if f["key"] in seen_keys_round:
                    continue
                seen_keys_round.add(f["key"])
            dedup.append(f)
        if not dedup:
            break

        # 3. per-task budget selection
        selected: list[dict] = []
        deferred: list[dict] = []
        for t in tasks:
            rows = [f for f in dedup if f["task"] == t.name]
            b = task_budget(carries[t.name], list(t.limits), round_s)
            selected.extend(rows[:b])
            deferred.extend(rows[b:])

        # 4. host cap pass
        selected.sort(key=lambda f: (-f["priority"], f["seq"]))
        host_counts: dict[str, int] = {}
        wave: list[dict] = []
        for f in selected:
            cap = host_round_cap(
                robots_map.get(f["host"], {}).get("crawl_delay_ms", 0), round_s
            )
            if host_budget_overrides and f["host"] in host_budget_overrides:
                # revisit-plan path: effective cap = min(politeness, plan)
                cap = min(cap, host_budget_overrides[f["host"]])
            c = host_counts.get(f["host"], 0)
            if c < cap:
                host_counts[f["host"]] = c + 1
                wave.append(f)
            else:
                deferred.append(f)

        # budget consumption = final per-task wave sizes
        used: dict[str, int] = {}
        for f in wave:
            used[f["task"]] = used.get(f["task"], 0) + 1
        for t in tasks:
            carries[t.name] = [
                tier_carry_after(c, tier, round_s, used.get(t.name, 0))
                for c, tier in zip(carries[t.name], t.limits)
            ]

        if not wave:
            # budgets can make an all-deferred round; frontier unchanged
            frontier = deferred
            res.rounds = rnd
            continue

        # 5. mark seen before fetch
        for f in wave:
            res.seen.add(f["key"])

        # 6-8. fetch + parse
        new_links: list[dict] = []
        retries: list[dict] = []
        m: dict[str, dict] = {
            t.name: dict(round=rnd, task=t.name, selected=0, fetched_ok=0,
                         failed=0, retried=0, new_links=0, items=0)
            for t in tasks
        }
        for f in wave:
            res.order.append((fetch_i, f["curl"], rnd))
            res.order_full.append((rnd, f["priority"], f["seq"], f["curl"]))
            fetch_i += 1
            t = taskmap[f["task"]]
            m[t.name]["selected"] += 1
            page = graph.get(f["curl"])
            status = page["status"] if page else 404
            body = page["body"] if page else ""
            if status != 200 or len(body) < MIN_BODY_LEN:
                m[t.name]["failed"] += 1
                if not t.reload:
                    res.seen.discard(f["key"])
                if f["key"] not in failed_once:
                    failed_once.add(f["key"])
                    retries.append({**f, "attempt": 1})
                    m[t.name]["retried"] += 1
                else:
                    res.failures.append((f["key"], f["curl"]))
                continue
            m[t.name]["fetched_ok"] += 1
            rule = rulemap[(f["task"], f["rule"])]
            # spans document
            res.documents.append((f["curl"], extract_spans(body, rule)))
            # items
            for item in extract_items(body, f["curl"], f.get("tmp"), rule):
                res.results.append(
                    {"task": f["task"], "rule": f["rule"], "url": f["curl"],
                     "round": rnd, "data": dict(item)}
                )
                m[t.name]["items"] += 1
            # links
            for match_idx, (url, carry) in enumerate(extract_links(body, rule)):
                curl = canonicalize(url)
                h = host_of(curl)
                rb = robots_map.get(h)
                if rb and not robots_allowed(urlsplit(curl).path, rb["disallow_prefixes"]):
                    continue
                tmp = dict(f.get("tmp") or {})
                if rule.carry_field and carry:
                    tmp[rule.carry_field] = carry
                new_links.append(
                    {
                        "url": url,
                        "curl": curl,
                        "host": h,
                        "method": "GET",
                        "key": seen_key(curl),
                        "task": f["task"],
                        "rule": rule.next_rule or f["rule"],
                        "depth": f["depth"] + 1,
                        "priority": rule.next_priority,
                        "attempt": 0,
                        "tmp": tmp,
                        "_parent_seq": f["seq"],
                        "_match_idx": match_idx,
                    }
                )
                m[t.name]["new_links"] += 1

        # 9. seq assignment: links by (parent_seq, match_idx), then retries
        new_links.sort(key=lambda l: (l["_parent_seq"], l["_match_idx"]))
        for l in new_links:
            max_seq += 1
            l["seq"] = max_seq
            l.pop("_parent_seq")
            l.pop("_match_idx")
        retries.sort(key=lambda f: f["seq"])
        for f in retries:
            max_seq += 1
            f["seq"] = max_seq

        frontier = deferred + new_links + retries
        res.metrics.extend(m[t.name] for t in tasks if m[t.name]["selected"])
        res.rounds = rnd

        # dynamic task control between rounds (etcd watch analog; see
        # OracleCtl). Seeds pushed here get seqs after this round's
        # links/retries — identical stamping to the engine's round-start
        # pending-seed drain.
        if on_round is not None:
            ctl = OracleCtl(taskmap, frontier, max_seq)
            on_round(rnd, ctl)
            max_seq = ctl.max_seq

    return res
