"""URL canonicalization + seen-key columns.

Canonicalization (north_rule: lowercase host, strip fragment/default port,
sort query params) runs as an Arrow-batched pandas UDF over textcore's pure
function — the same code the oracle calls, so parity is by construction.
The seen key itself stays JVM-side: ``F.md5(concat(curl, method))`` matches
the reference's md5(URL+Method) (spider/request.go:113-117).
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


def seen_key_col(curl: Column, method: Column) -> Column:
    return F.md5(F.concat(curl, method))


def with_canonical(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add curl/host/key columns to a frame of raw URLs."""
    return (
        df.withColumn("curl", canonicalize_udf(F.col(url_col)))
        .withColumn("host", host_udf(F.col("curl")))
        .withColumn("key", seen_key_col(F.col("curl"), F.col("method")))
    )
