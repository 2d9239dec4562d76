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


def _canon_exprs(url: str = "url") -> dict[str, str]:
    """SQL fragments mirroring textcore.canonicalize / host_of.

    urlsplit semantics: netloc runs from after '://' to the first of
    '/', '?', '#'; fragment starts at the first '#'; query between the
    first '?' (after netloc) and the fragment; path defaults to '/'.
    """
    u = f"trim({url})"
    after = f"substring({u}, instr({u}, '://') + 3)"
    nofrag = f"if(instr({after}, '#') > 0, left({after}, instr({after}, '#') - 1), {after})"
    # end of netloc: first '/' or '?' in nofrag (0 if none)
    cut = (
        f"least(if(instr({nofrag}, '/') = 0, length({nofrag}) + 1, instr({nofrag}, '/')),"
        f" if(instr({nofrag}, '?') = 0, length({nofrag}) + 1, instr({nofrag}, '?')))"
    )
    netloc_raw = f"lower(left({nofrag}, {cut} - 1))"
    rest = f"substring({nofrag}, {cut})"  # path[?query] ('' if none)
    scheme = f"lower(left({u}, instr({u}, '://') - 1))"
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
    curl = (
        f"concat({scheme}, '://', {netloc}, {path},"
        f" if({sorted_q} = '', '', concat('?', {sorted_q})))"
    )
    return {"curl": curl, "host": netloc}


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
