"""agni-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of gouthamve/agni (Prometheus long-term
storage), re-expressed Spark-first.

The reference (see /root/reference, SURVEY.md) is a remote-read server
over S3-hosted TSDB blocks. Its query capability is *selection*:
time-range pruning + label-matcher filtering via an inverted index +
sorted cross-block merge. Here that becomes a Catalyst plan over
Parquet/Delta-style time-partitioned tables:

- block               <-> time-partitioned Parquet directory
- inverted index      <-> predicate pushdown + partition pruning
- matcher algebra     <-> semi/anti-joins on an exploded labels table
- cross-block merge   <-> UNION ALL scan + ORDER BY
- remote read         <-> protocol layer compiling matchers to DataFrames

Beyond reference parity, `agni_spark.functions` adds the PromQL-style
compute tier (rate/increase/aggregations/topk) and the LLM-data-pipeline
tier (dedup, similarity search, text analysis, multimodal plumbing),
each designed for 100 TB scale (broadcast dims, no driver-side loops,
AQE-friendly shuffles).
"""

from agni_spark.matchers import Matcher, eq, neq, re_match, re_no_match, prefix
from agni_spark.querier import Querier

__all__ = [
    "Matcher",
    "Querier",
    "eq",
    "neq",
    "re_match",
    "re_no_match",
    "prefix",
]

__version__ = "0.1.0"
