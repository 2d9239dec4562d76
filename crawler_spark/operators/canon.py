"""URL canonicalization + seen-key columns.

Canonicalization (north_rule: lowercase host, strip fragment/default port,
sort query params) is implemented as PURE Spark SQL expressions — string
ops inside whole-stage codegen, no Python boundary — because it sits on
the hottest path (every discovered link, every round). The expressions
reproduce ``textcore.canonicalize`` (the function the oracle calls)
exactly; the golden E2E suite and the ``crawl_canonical_keys`` DuckDB
oracle (messy-spelling inputs) pin the parity.

A pandas-UDF variant (``canonicalize_udf``) wrapping the textcore function
is kept for cross-checking and for URL shapes outside the SQL fast path.
The seen key stays JVM-side: ``F.md5(concat(curl, method))`` matches the
reference's md5(URL+Method) (spider/request.go:113-117).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyspark.sql.types import StringType

from ..textcore import canonicalize, host_of


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize)


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)


def _netloc_split(after: str, scheme: str) -> tuple[str, str, str, str]:
    """(netloc, path, sorted_query) exprs over ``after`` = post-authority-
    marker text; default-port strip keyed on ``scheme`` (SQL expr or "''").

    urlsplit semantics: netloc runs to the first of '/', '?', '#';
    fragment starts at the first '#'; query between the first '?' and the
    fragment; path defaults to '/'.
    """
    nofrag = f"if(instr({after}, '#') > 0, left({after}, instr({after}, '#') - 1), {after})"
    cut = (
        f"least(if(instr({nofrag}, '/') = 0, length({nofrag}) + 1, instr({nofrag}, '/')),"
        f" if(instr({nofrag}, '?') = 0, length({nofrag}) + 1, instr({nofrag}, '?')))"
    )
    netloc_raw = f"lower(left({nofrag}, {cut} - 1))"
    rest = f"substring({nofrag}, {cut})"  # path[?query] ('' if none)
    default_port = f"if({scheme} = 'http', ':80', if({scheme} = 'https', ':443', ''))"
    netloc = (
        f"if({default_port} <> '' AND endswith({netloc_raw}, {default_port}),"
        f" left({netloc_raw}, length({netloc_raw}) - length({default_port})), {netloc_raw})"
    )
    qpos = f"instr({rest}, '?')"
    path = f"if({qpos} > 0, left({rest}, {qpos} - 1), {rest})"
    path = f"if({path} = '', '/', {path})"
    query = f"if({qpos} > 0, substring({rest}, {qpos} + 1), '')"
    sorted_q = f"array_join(array_sort(filter(split({query}, '&'), x -> x <> '')), '&')"
    return netloc, path, sorted_q, rest


def _canon_exprs(url: str = "url") -> dict[str, str]:
    """SQL fragments mirroring textcore.canonicalize / host_of exactly on
    the URL shapes a crawl frontier carries:

    1. absolute  ``scheme://netloc/path?q#f``
    2. scheme-relative  ``//netloc/path`` (urlsplit: netloc, empty scheme —
       no default-port strip because _DEFAULT_PORTS keys on http/https)
    3. relative / path-only  ``path?q#f`` (urlsplit: everything is path;
       fragment still stripped, query still sorted, '' -> '/')

    The whitespace trim is ``\\s``-regex both ends (Python ``str.strip()``
    strips tab/newline too; SQL ``trim`` only strips spaces). Outside this
    domain (mailto:, data:, malformed-IPv6 ValueError edges) use
    ``canonicalize_udf`` — tests/test_textcore.py pins the SQL/Python
    parity corpus.
    """
    u = f"regexp_replace({url}, '^\\\\s+|\\\\s+$', '')"
    has_scheme = f"instr({u}, '://') > 0"
    is_protorel = f"startswith({u}, '//')"

    # case 1: scheme://...
    scheme = f"lower(left({u}, instr({u}, '://') - 1))"
    after1 = f"substring({u}, instr({u}, '://') + 3)"
    netloc1, path1, q1, _ = _netloc_split(after1, scheme)
    curl1 = (
        f"concat({scheme}, '://', {netloc1}, {path1},"
        f" if({q1} = '', '', concat('?', {q1})))"
    )

    # case 2: //netloc/... (empty scheme; urlunsplit re-emits the '//')
    after2 = f"substring({u}, 3)"
    netloc2, path2, q2, rest2 = _netloc_split(after2, "''")
    # urlsplit path is '' when nothing follows the netloc; canonicalize's
    # `path or '/'` then yields '/', same as case 1 — _netloc_split did it.
    # urlunsplit re-emits '//' ONLY when netloc is nonempty: with an empty
    # netloc the path is emitted verbatim ('///x' -> '/x', '////x' -> '//x').
    curl2 = (
        f"if({netloc2} = '',"
        f" concat({path2}, if({q2} = '', '', concat('?', {q2}))),"
        f" concat('//', {netloc2}, {path2},"
        f" if({q2} = '', '', concat('?', {q2}))))"
    )

    # case 3: pure path (no netloc): strip fragment, sort query, '' -> '/'
    nofrag3 = f"if(instr({u}, '#') > 0, left({u}, instr({u}, '#') - 1), {u})"
    qpos3 = f"instr({nofrag3}, '?')"
    path3 = f"if({qpos3} > 0, left({nofrag3}, {qpos3} - 1), {nofrag3})"
    path3 = f"if({path3} = '', '/', {path3})"
    query3 = f"if({qpos3} > 0, substring({nofrag3}, {qpos3} + 1), '')"
    q3 = f"array_join(array_sort(filter(split({query3}, '&'), x -> x <> '')), '&')"
    curl3 = f"concat({path3}, if({q3} = '', '', concat('?', {q3})))"

    curl = (
        f"CASE WHEN {has_scheme} THEN {curl1} "
        f"WHEN {is_protorel} THEN {curl2} "
        f"ELSE {curl3} END"
    )
    # host parity target is host_of(curl) — the oracle re-parses the
    # CANONICAL url (oracle.py:247). For case 2 with an empty netloc the
    # canonical form is the bare path; when that path itself starts with
    # '//' (e.g. '////x' -> '//x'), re-parsing finds a netloc in it.
    sub2 = f"substring({path2}, 3)"
    host2b = (
        f"lower(left({sub2},"
        f" if(instr({sub2}, '/') = 0, length({sub2}) + 1, instr({sub2}, '/')) - 1))"
    )
    host2 = (
        f"if({netloc2} <> '', {netloc2},"
        f" if(startswith({path2}, '//'), {host2b}, ''))"
    )
    host = (
        f"CASE WHEN {has_scheme} THEN {netloc1} "
        f"WHEN {is_protorel} THEN {host2} "
        f"ELSE '' END"
    )
    return {"curl": curl, "host": host}


def canonical_col(url_col: str = "url") -> Column:
    return F.expr(_canon_exprs(url_col)["curl"])


def host_col(url_col: str = "url") -> Column:
    return F.expr(_canon_exprs(url_col)["host"])


def seen_key_col(curl: Column, method: Column) -> Column:
    return F.md5(F.concat(curl, method))


def with_canonical(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add curl/host/key columns to a frame of raw URLs (all JVM-side)."""
    ex = _canon_exprs(url_col)
    return (
        df.withColumn("curl", F.expr(ex["curl"]))
        .withColumn("host", F.expr(ex["host"]).cast("string"))
        .withColumn("key", seen_key_col(F.col("curl"), F.col("method")))
    )
