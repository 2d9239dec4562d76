"""Pure deterministic core shared by the Spark engine and the oracle.

These functions define the engine's *semantic contract*: URL
canonicalization, seen-set keying, link/item/span extraction, and
token-bucket budget arithmetic. The pure-Python oracle (oracle.py) and the
Spark operators (operators/*.py) both call exactly this code, so
"engine == oracle" reduces to "the distributed dataflow reproduces the same
set/order algebra" — which is what the tests check.

Reference semantics reproduced (with file:line citations):
- seen key = md5(url + method)            spider/request.go:113-117
- link extraction = FindAllSubmatch order (left-to-right, non-overlapping)
  with group-1 URL and optional group-2 carried value
                                          parse/doubanbook/book.go:60-109
- item extraction = first submatch per named regex
                                          parse/doubanbook/book.go:111-140
- body-validity threshold 6000 bytes      engine/schedule.go:364-372
- multi-tier token bucket                 limiter/limiter.go:11-45
Canonicalization is a north_rule addition (BASELINE.json): lowercase host,
strip fragment, strip default port, sort query params.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit, urlunsplit

# --------------------------------------------------------------------------
# URL canonicalization + seen key
# --------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}

MIN_BODY_LEN = 6000  # engine/schedule.go:364


def canonicalize(url: str) -> str:
    """Lowercase scheme+host, strip default port, drop fragment, sort query."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and netloc.endswith(default):
        netloc = netloc[: -len(default)]
    query = "&".join(sorted(q for q in parts.query.split("&") if q))
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def seen_key(curl: str, method: str = "GET") -> str:
    """md5(canonical_url + method), parity with spider/request.go:113-117."""
    return hashlib.md5((curl + method).encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# Rules-as-data
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Rule:
    """One Trunk entry (spider/parse.go:10-14) expressed as data."""

    task: str
    rule: str
    link_regex: str | None = None
    url_prefix: str = ""
    next_rule: str | None = None
    next_priority: int = 0
    carry_field: str | None = None
    item_fields: tuple[str, ...] = ()
    item_regexes: dict[str, str] = field(default_factory=dict)
    filter_regex: str | None = None
    emit_url_as: str | None = None  # doubangroup GetSunRoom emits the URL itself


@dataclass(frozen=True)
class LimitTier:
    """rate.Limiter(Every(event_dur/event_count), bucket) — limiter/limiter.go:16-18."""

    event_count: int
    event_dur_s: int
    bucket: int


@dataclass(frozen=True)
class TaskCfg:
    name: str
    reload: bool = False
    max_depth: int = 5  # spider/option.go:25
    limits: tuple[LimitTier, ...] = ()
    closed: bool = False
    # sent verbatim as the Cookie header on every request of this task
    # (spider/task.go:10,18 Cookie; collect/collect.go:65-67)
    cookie: str = ""


# --------------------------------------------------------------------------
# Extraction (applied per body; the Spark side maps this over Arrow batches)
# --------------------------------------------------------------------------

# Media spans in synthetic bodies; real-world equivalent would be <img>/<video>
# tags. The interleaved text+media document shape is the north_rule payload.
MEDIA_REGEX = re.compile(r'<img src="([^"]+)"\s*/?>')


def extract_links(body: str, rule: Rule) -> list[tuple[str, str]]:
    """(url, carried_value) per match, FindAllSubmatch order.

    Go's FindAllSubmatch returns left-to-right non-overlapping matches —
    re.finditer has identical semantics (SURVEY.md §7.3 hard part 4).
    """
    if not rule.link_regex:
        return []
    out: list[tuple[str, str]] = []
    for m in re.finditer(rule.link_regex, body):
        url = m.group(1)
        if rule.url_prefix and not url.startswith(("http://", "https://")):
            url = rule.url_prefix + url  # parse/doubanbook/book.go:71
        carry = m.group(2) if m.re.groups >= 2 and m.group(2) is not None else ""
        out.append((url, carry))
    return out


def extract_items(
    body: str, url: str, tmp: dict[str, str] | None, rule: Rule
) -> list[dict[str, str]]:
    """First-submatch projection per field (parse/doubanbook/book.go:111-140).

    filter_regex gates emission (parse/doubangroup/group.go:57-71); when
    emit_url_as is set the item is the URL itself (GetSunRoom behavior).
    """
    if rule.filter_regex is not None and not re.search(rule.filter_regex, body):
        return []
    if rule.emit_url_as:
        return [{rule.emit_url_as: url}]
    if not rule.item_fields:
        return []
    data: dict[str, str] = {}
    for f in rule.item_fields:
        pat = rule.item_regexes.get(f)
        if pat:
            m = re.search(pat, body)
            data[f] = m.group(1) if m else ""
        elif tmp and f in tmp:
            data[f] = tmp[f]  # carried field, e.g. book_name (book.go:128)
        else:
            data[f] = ""
    return [data]


def extract_spans(body: str, rule: Rule) -> list[tuple[str, str, str, int]]:
    """Interleaved (kind, text, media_ref, offset) spans — input_hint shape.

    kind ∈ {text, link, media}; offsets are character offsets into the body;
    array order == document order. text spans carry the raw segment between
    structural matches; link spans carry the matched URL in `text`; media
    spans carry the ref in `media_ref`.
    """
    marks: list[tuple[int, int, str, str, str]] = []
    if rule.link_regex:
        for m in re.finditer(rule.link_regex, body):
            marks.append((m.start(), m.end(), "link", m.group(1), ""))
    for m in MEDIA_REGEX.finditer(body):
        marks.append((m.start(), m.end(), "media", "", m.group(1)))
    marks.sort(key=lambda t: (t[0], t[1]))
    spans: list[tuple[str, str, str, int]] = []
    pos = 0
    for start, end, kind, text, ref in marks:
        if start < pos:  # overlapping structural match; keep first
            continue
        if start > pos:
            seg = body[pos:start]
            if seg.strip():
                spans.append(("text", seg, "", pos))
        spans.append((kind, text, ref, start))
        pos = end
    if pos < len(body):
        seg = body[pos:]
        if seg.strip():
            spans.append(("text", seg, "", pos))
    return spans


# --------------------------------------------------------------------------
# Token-bucket budget arithmetic (exact integers; limiter/limiter.go:11-45)
# --------------------------------------------------------------------------


def tier_available(carry_num: int, tier: LimitTier, round_s: int) -> int:
    """Requests admissible this round by one tier.

    Integer token math with denominator event_dur_s: carry_num is
    stored_tokens * event_dur_s. Over a round of round_s seconds a bucket
    holding carry admits floor((carry + rate*T)) = (carry_num +
    event_count*T) // event_dur_s. Exact in int64 for both oracle and Spark.
    """
    return (carry_num + tier.event_count * round_s) // tier.event_dur_s


def tier_carry_after(carry_num: int, tier: LimitTier, round_s: int, used: int) -> int:
    """End-of-round stored tokens, capped at the burst bucket."""
    accrued = carry_num + tier.event_count * round_s - used * tier.event_dur_s
    return min(tier.bucket * tier.event_dur_s, accrued)


def task_budget(carries: list[int], tiers: list[LimitTier], round_s: int) -> int:
    """MultiLimiter = wait on ALL tiers → budget is the min (limiter.go:33-41)."""
    if not tiers:
        return 1 << 40
    return min(tier_available(c, t, round_s) for c, t in zip(carries, tiers))


def initial_carry(tier: LimitTier) -> int:
    """rate.NewLimiter starts with a full bucket."""
    return tier.bucket * tier.event_dur_s


def host_round_cap(crawl_delay_ms: int, round_s: int) -> int:
    """Per-host fetches per round given a robots crawl-delay."""
    if crawl_delay_ms <= 0:
        return 1 << 40
    return (round_s * 1000) // crawl_delay_ms


def robots_allowed(path: str, disallow_prefixes: list[str]) -> bool:
    return not any(p and path.startswith(p) for p in disallow_prefixes)
