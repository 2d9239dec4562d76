"""Pure-JVM (whole-stage-codegen) parse path — zero Python on the hot path.

Produces the exact same ``_p`` struct as operators/parse.make_parse_udf
(links / item / interleaved spans; parity targets textcore.extract_links /
extract_items / extract_spans, reference parse/doubanbook/book.go:60-140),
but from Spark SQL expressions only: ``regexp_extract_all`` for links and
item fields, and a sentinel-replace → split → ``transform`` → ``aggregate``
pipeline for the interleaved text/media span sequence with exact character
offsets.

Why: the pandas-UDF parse is Arrow-vectorized, but it still ships every
body (8 KB × wave) across the JVM↔Python boundary and burns Python-side
memory bandwidth — measured as the ONLY stage that refuses to scale with
cores (1.3× at 4× cores, vs 3.2× for the JVM fetch join). Regex work
inside codegen scales with executor cores and never leaves the JVM.

Span trick (positions without a position-returning regex function):

1. ``regexp_replace(body, link_re, S+'L'+P+'$0'+P+'$1'+S)`` — each link
   match becomes a sentinel-framed record carrying the FULL matched text
   (for exact offset advance) and group 1;
2. same for the media regex (S+'M'+…);
3. ``split`` on S → alternating text pieces and match records, decoded by
   a ``transform`` into (txt | kind, full, g1) structs;
4. one ``aggregate`` walks the pieces, carrying (pos, spans): text pieces
   advance pos by their length (emitting a span only when they contain a
   non-space, Python ``seg.strip()`` parity via ``rlike '\\S'``); match
   records emit their span at pos and advance by length(full-match).

Domain / fallback contract (checked by ``rules_jvm_ok``):

- bodies must not contain the sentinel control chars \\x01/\\x02 (true of
  HTML/text corpora; binary payloads ride media columns, never ``body``);
- the link and media regexes must not produce overlapping matches (true
  for HTML-shaped ``<a …>`` / ``<img …>`` structures) — Python resolves
  overlaps by first-start-wins, the replace pipeline by link-pass-first;
- the rule regexes must be Java-regex compatible.

Rule sets outside the domain fall back to the Arrow-batched pandas UDF
(operators/parse.py) — same output schema, engine-transparent. The golden
E2E suite and tests/test_parse_jvm.py pin byte-parity of the two paths.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..textcore import MEDIA_REGEX, Rule

_S = "\x01"  # record sentinel
_P = "\x02"  # field separator

_SPAN_ARR = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
_EMPTY_SPANS = f"cast(array() as {_SPAN_ARR})"

_EMPTY_ITEM = "cast(null as map<string,string>)"
_EMPTY_STR_ARR = "cast(array() as array<string>)"
_EMPTY_INT_ARR = "cast(array() as array<int>)"


def _q(s: str) -> str:
    """SQL single-quoted literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _jlet(var: str, value: str, body: str) -> str:
    """let-binding via a 1-element HOF lambda (see operators/canon._let):
    ``value`` evaluates once, references in ``body`` are variable lookups."""
    return f"element_at(transform(array({value}), {var} -> {body}), 1)"


def rules_jvm_ok(rules: list[Rule]) -> bool:
    """Are all rules inside the JVM fast path's domain?

    Java-regex compatibility of the Python patterns is the only check we
    can do statically: reject patterns using Python-only constructs. The
    non-overlap and sentinel-free-body assumptions are corpus properties,
    asserted by the parity suite.
    """
    for r in rules:
        for p in (r.link_regex, r.filter_regex, *r.item_regexes.values()):
            if not p:
                continue
            if "(?P<" in p or "(?#" in p:
                return False  # Python-only spellings
            try:
                _re.compile(p)
            except _re.error:
                return False
    return True


def _dispatch(rules: list[Rule], arm) -> str:
    """CASE over (task, rule) — O(#rules) plan size; rules are per-task
    parser configs (a few dozen at most), never data-scale like hosts."""
    arms = " ".join(
        f"WHEN task = {_q(r.task)} AND rule = {_q(r.rule)} THEN {arm(r)}"
        for r in rules
    )
    return f"CASE {arms} "


def _item_expr(r: Rule, b: str, curl: str, tmp: str) -> str:
    if not (r.item_fields or r.emit_url_as):
        return _EMPTY_ITEM
    if r.emit_url_as:
        mp = f"map({_q(r.emit_url_as)}, {curl})"
    else:
        kvs = []
        for fld in r.item_fields:
            pat = r.item_regexes.get(fld)
            val = (
                f"regexp_extract({b}, {_q(pat)}, 1)"
                if pat
                else f"coalesce(element_at({tmp}, {_q(fld)}), '')"
            )
            kvs.append(f"{_q(fld)}, {val}")
        mp = f"map({', '.join(kvs)})"
    if r.filter_regex:
        return f"if({b} rlike {_q(r.filter_regex)}, {mp}, {_EMPTY_ITEM})"
    return mp


def _combined_expr(r: Rule, b: str) -> str:
    """Sentinel pipeline -> struct<u,c,sp> (links, carries, spans) from ONE
    link-regex pass over the body.

    The link replacement captures $0 (full match, for exact offset
    advance), $1 (URL) and — when the rule regex has one — $2 (carry), so
    link URLS and CARRIES are derived from the decoded pieces instead of
    two additional full-body ``regexp_extract_all`` passes (the body is
    the fat-wave unit of work; every avoided pass is ~8 KB x |wave| of
    regex scanning). Offsets are a prefix sum over piece LENGTHS (an
    int-array aggregate), then the span structs are built in one linear
    ``zip_with`` + ``filter`` pass — the previous formulation carried the
    growing span-struct array through ``aggregate``/``array_append``,
    O(pieces^2) struct copies per body, measured as the dominant per-row
    cost on fat waves.
    """
    marked = b
    ngroups = _re.compile(r.link_regex).groups if r.link_regex else 0
    if r.link_regex:
        g2 = "$2" if ngroups >= 2 else ""
        repl_l = _q(f"{_S}L{_P}$0{_P}$1{_P}{g2}{_S}")
        marked = f"regexp_replace({marked}, {_q(r.link_regex)}, {repl_l})"
    repl_m = _q(f"{_S}M{_P}$0{_P}$1{_P}{_S}")
    marked = f"regexp_replace({marked}, {_q(MEDIA_REGEX.pattern)}, {repl_m})"
    sep = _q(_P)
    is_match = f"(startswith(p, {_q('L' + _P)}) OR startswith(p, {_q('M' + _P)}))"
    # decode each piece once: match records -> (null, kind, full, g1, g2),
    # text pieces -> (p, null, null, null, null). The split runs ONCE per
    # piece (let-bound) — the match replacement always writes exactly 4
    # P-separated fields, so element_at indices are total.
    decoded = (
        "named_struct('txt', cast(null as string),"
        " 'k', element_at(_f, 1), 'full', element_at(_f, 2),"
        " 'g1', element_at(_f, 3), 'g2', element_at(_f, 4))"
    )
    pieces = (
        f"transform(split({marked}, {_q(_S)}), p -> if({is_match},"
        f" {_jlet('_f', f'split(p, {sep})', decoded)},"
        f" named_struct('txt', p, 'k', cast(null as string),"
        f"  'full', cast(null as string), 'g1', cast(null as string),"
        f"  'g2', cast(null as string))))"
    )
    lens = "transform(_pc, e -> if(e.txt IS NULL, length(e.full), length(e.txt)))"
    # Start offsets = prefix sum over piece lengths, TWO-LEVEL so it stays
    # linear: a naive aggregate+array_append over all n pieces copies the
    # growing array every step — O(n^2) element copies, measured 14s for a
    # single 20k-link hub page (a crawl's seed/index pages are exactly that
    # shape). Chunking by C bounds every array_append to C elements:
    # chunk totals are O(n) adds, the chunk-base prefix is O((n/C)^2) over
    # a tiny array, per-chunk offsets are O(n*C) copies total.
    C = 256
    chunk_base = (
        f"aggregate(transform(sequence(0, _nch - 1),"
        f" ci -> aggregate(slice(_ln, ci * {C} + 1, {C}), 0, (a, x) -> a + x)),"
        f" array(0), (a, x) -> array_append(a, element_at(a, -1) + x))"
    )
    per_chunk = (
        f"aggregate(slice(_ln, ci * {C} + 1, {C}),"
        f" array(element_at(_cb, ci + 1)),"
        f" (a, x) -> array_append(a, element_at(a, -1) + x))"
    )
    offs = (
        f"flatten(transform(sequence(0, _nch - 1), ci -> "
        + _jlet("_cs", per_chunk, "slice(_cs, 1, size(_cs) - 1)")
        + "))"
    )
    span_or_null = (
        "if(e.txt IS NULL,"
        " named_struct("
        "  'kind', if(e.k = 'L', 'link', 'media'),"
        "  'text', if(e.k = 'L', e.g1, ''),"
        "  'media_ref', if(e.k = 'M', e.g1, ''),"
        "  'offset', o),"
        " if(e.txt rlike '\\\\S',"
        "  named_struct('kind', 'text', 'text', e.txt, 'media_ref', '',"
        "   'offset', o),"
        "  cast(null as struct<kind:string,text:string,media_ref:string,offset:int>)))"
    )
    spans = (
        f"filter(zip_with(_pc, _of, (e, o) -> {span_or_null}),"
        f" x -> x IS NOT NULL)"
    )
    if r.url_prefix:
        pre = _q(r.url_prefix)
        url = (
            f"if(startswith(e.g1, 'http://') OR startswith(e.g1, 'https://'),"
            f" e.g1, concat({pre}, e.g1))"
        )
    else:
        url = "e.g1"
    body_expr = (
        f"named_struct("
        f"'u', transform(_lk, e -> {url}),"
        f"'c', transform(_lk, e -> e.g2),"
        f"'sp', {spans})"
    )
    nch = f"greatest(1, cast(ceil(size(_ln) / {C}.0) as int))"
    return _jlet(
        "_pc", pieces,
        _jlet("_ln", lens,
              _jlet("_nch", nch,
                    _jlet("_cb", chunk_base,
                          _jlet("_of", offs,
                                _jlet("_lk", "filter(_pc, e -> e.k = 'L')",
                                      body_expr))))),
    )


def with_jvm_parse(
    df: DataFrame,
    rules: list[Rule],
    b: str = "body",
    curl: str = "curl",
    tmp: str = "tmp",
    out: str = "_p",
) -> DataFrame:
    """Add the ``_p`` parse struct via pure codegen expressions.

    ``b`` may be an expression (e.g. the ok-masked body); NULL body rows
    get the same empty-arrays/null-item struct as the pandas path.
    """
    empty_comb = (
        f"named_struct('u', {_EMPTY_STR_ARR}, 'c', {_EMPTY_STR_ARR},"
        f" 'sp', {_EMPTY_SPANS})"
    )
    comb = _dispatch(rules, lambda r: _combined_expr(r, b)) + f"ELSE {empty_comb} END"
    df = df.withColumn("_cb", F.expr(f"if({b} IS NULL, {empty_comb}, {comb})"))
    item = (
        f"if({b} IS NULL, {_EMPTY_ITEM}, "
        + _dispatch(rules, lambda r: _item_expr(r, b, curl, tmp))
        + f"ELSE {_EMPTY_ITEM} END)"
    )
    p_expr = (
        "named_struct("
        "'l_url', _cb.u, 'l_carry', _cb.c,"
        "'l_idx', if(size(_cb.u) = 0, " + _EMPTY_INT_ARR + ","
        " cast(sequence(0, size(_cb.u) - 1) as array<int>)),"
        f"'item', {item},"
        "'s_kind', transform(_cb.sp, x -> x.kind),"
        "'s_text', transform(_cb.sp, x -> x.text),"
        "'s_ref', transform(_cb.sp, x -> x.media_ref),"
        "'s_off', transform(_cb.sp, x -> x.offset))"
    )
    return df.withColumn(out, F.expr(p_expr)).drop("_cb")
