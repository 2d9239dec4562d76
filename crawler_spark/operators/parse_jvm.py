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


def _urls_expr(r: Rule, b: str) -> str:
    if not r.link_regex:
        return _EMPTY_STR_ARR
    urls = f"regexp_extract_all({b}, {_q(r.link_regex)}, 1)"
    if r.url_prefix:
        pre = _q(r.url_prefix)
        urls = (
            f"transform({urls}, u -> if(startswith(u, 'http://') OR "
            f"startswith(u, 'https://'), u, concat({pre}, u)))"
        )
    return urls


def _carries_expr(r: Rule, b: str) -> str:
    if not r.link_regex:
        return _EMPTY_STR_ARR
    if _re.compile(r.link_regex).groups >= 2:
        return f"regexp_extract_all({b}, {_q(r.link_regex)}, 2)"
    return f"transform(regexp_extract_all({b}, {_q(r.link_regex)}, 1), x -> '')"


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


def _spans_expr(r: Rule, b: str) -> str:
    """Sentinel pipeline -> array<span struct> (see module docstring)."""
    marked = b
    if r.link_regex:
        repl_l = _q(f"{_S}L{_P}$0{_P}$1{_S}")
        marked = f"regexp_replace({marked}, {_q(r.link_regex)}, {repl_l})"
    repl_m = _q(f"{_S}M{_P}$0{_P}$1{_S}")
    marked = f"regexp_replace({marked}, {_q(MEDIA_REGEX.pattern)}, {repl_m})"
    sep = _q(_P)
    is_match = f"(startswith(p, {_q('L' + _P)}) OR startswith(p, {_q('M' + _P)}))"
    # decode each piece once: match records -> (null, kind, full, g1),
    # text pieces -> (p, null, null, null)
    pieces = (
        f"transform(split({marked}, {_q(_S)}), p -> if({is_match},"
        f" named_struct('txt', cast(null as string),"
        f"  'k', element_at(split(p, {sep}), 1),"
        f"  'full', element_at(split(p, {sep}), 2),"
        f"  'g1', element_at(split(p, {sep}), 3)),"
        f" named_struct('txt', p, 'k', cast(null as string),"
        f"  'full', cast(null as string), 'g1', cast(null as string))))"
    )
    match_span = (
        "named_struct("
        "'kind', if(e.k = 'L', 'link', 'media'),"
        "'text', if(e.k = 'L', e.g1, ''),"
        "'media_ref', if(e.k = 'M', e.g1, ''),"
        "'offset', st.pos)"
    )
    text_span = (
        "named_struct('kind', 'text', 'text', e.txt, 'media_ref', '',"
        " 'offset', st.pos)"
    )
    return (
        f"aggregate({pieces},"
        f" named_struct('pos', 0, 'sp', {_EMPTY_SPANS}),"
        f" (st, e) -> if(e.txt IS NULL,"
        f"  named_struct('pos', st.pos + length(e.full),"
        f"   'sp', array_append(st.sp, {match_span})),"
        f"  named_struct('pos', st.pos + length(e.txt),"
        f"   'sp', if(e.txt rlike '\\\\S',"
        f"    array_append(st.sp, {text_span}), st.sp))),"
        f" st -> st.sp)"
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
    spans = _dispatch(rules, lambda r: _spans_expr(r, b)) + f"ELSE {_EMPTY_SPANS} END"
    df = df.withColumn("_sp", F.expr(f"if({b} IS NULL, {_EMPTY_SPANS}, {spans})"))
    struct_expr = (
        "named_struct("
        f"'l_url', if({b} IS NULL, {_EMPTY_STR_ARR}, "
        + _dispatch(rules, lambda r: _urls_expr(r, b))
        + f"ELSE {_EMPTY_STR_ARR} END),"
        f"'l_carry', if({b} IS NULL, {_EMPTY_STR_ARR}, "
        + _dispatch(rules, lambda r: _carries_expr(r, b))
        + f"ELSE {_EMPTY_STR_ARR} END),"
        f"'item', if({b} IS NULL, {_EMPTY_ITEM}, "
        + _dispatch(rules, lambda r: _item_expr(r, b, curl, tmp))
        + f"ELSE {_EMPTY_ITEM} END),"
        "'s_kind', transform(_sp, x -> x.kind),"
        "'s_text', transform(_sp, x -> x.text),"
        "'s_ref', transform(_sp, x -> x.media_ref),"
        "'s_off', transform(_sp, x -> x.offset))"
    )
    # l_idx depends only on l_url's size; add it by rebuilding the struct
    # with a second expression would re-evaluate urls — instead compute the
    # struct once, then append l_idx from it (cheap array op).
    df = df.withColumn("_p0", F.expr(struct_expr)).drop("_sp")
    p_with_idx = (
        "named_struct("
        "'l_url', _p0.l_url, 'l_carry', _p0.l_carry,"
        "'l_idx', if(size(_p0.l_url) = 0, " + _EMPTY_INT_ARR + ","
        " cast(sequence(0, size(_p0.l_url) - 1) as array<int>)),"
        "'item', _p0.item,"
        "'s_kind', _p0.s_kind, 's_text', _p0.s_text,"
        "'s_ref', _p0.s_ref, 's_off', _p0.s_off)"
    )
    return df.withColumn(out, F.expr(p_with_idx)).drop("_p0")
