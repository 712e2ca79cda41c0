"""I6: host back-pressure / circuit breaker, Spark-native.

Reference behavior (tlgs/crawler/crawler.cpp:163-167): a host whose
``host_timeout_count_`` exceeds 3 is skipped — "Do not crawl hosts
known to be down" — and the work loop naturally disperses a batch
across hosts (360-URL batches sampled over the whole frontier,
crawler.cpp:101-119) so no single capsule is hammered.

A crawler process keeps that state in a hash map; a distributed batch
engine expresses the same policy declaratively over the work frontier:

- **circuit breaker**: anti-join the frontier against hosts whose
  accumulated failure count exceeds ``max_failures``
- **politeness rounds**: within each host, number the surviving items
  (stable priority order) and assign round = (rank-1) // per_host_cap
  — executing rounds in ascending order guarantees at most
  ``per_host_cap`` concurrent fetches per host, for ANY frontier
  size, with one window shuffle keyed by host (bounded per-host
  fan-in; the Zipf-head host's partition is capped by its own
  frontier share, not the corpus)

Pure window/join expressions — no state, no UDF; the same plan holds
at 10^12-row frontiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_HOST_FAILURES = 3  # crawler.cpp:166: "timeout->second > 3" skips


def breaker_hosts(
    failures: DataFrame,
    host_col: str = "host",
    fail_col: str = "n_failures",
    max_failures: int = MAX_HOST_FAILURES,
) -> DataFrame:
    """Hosts currently tripped: accumulated failures > max_failures."""
    return (
        failures.groupBy(host_col)
        .agg(F.sum(fail_col).alias("_nf"))
        .filter(F.col("_nf") > max_failures)
        .select(host_col)
    )


def polite_schedule(
    frontier: DataFrame,
    failures: DataFrame | None = None,
    host_col: str = "host",
    id_col: str = "item_id",
    priority_col: str | None = None,
    per_host_cap: int = 2,
    max_failures: int = MAX_HOST_FAILURES,
) -> DataFrame:
    """→ frontier columns + ``round`` (int): the earliest politeness
    round the item may run in. Tripped hosts are dropped entirely
    (circuit breaker); within a host, items are ordered by
    (priority desc NULLS LAST, id asc) and packed ``per_host_cap``
    per round."""
    out = frontier
    if failures is not None:
        tripped = breaker_hosts(failures, host_col, max_failures=max_failures)
        out = out.join(F.broadcast(tripped), host_col, "left_anti")
    order = [F.asc(id_col)]
    if priority_col is not None:
        order = [F.desc_nulls_last(priority_col), F.asc(id_col)]
    w = Window.partitionBy(host_col).orderBy(*order)
    return out.withColumn(
        "round",
        ((F.row_number().over(w) - 1) / F.lit(per_host_cap)).cast("int"),
    )
