"""Custom stateful streaming operator: per-domain incremental mention
statistics via applyInPandasWithState.

The reference's tri-training loop carries driver-side state between pool
iterations (extension-set sizes, adaptive thresholds — tri_train.py:
220-247, 287-288). In a streaming engine that state lives in the store:
each micro-batch of voted mentions updates a per-domain running record
(total mentions, distinct-ish sentence count, first/last event time),
emitted in `update` mode after every batch. Recovery is exactly-once via
the query's checkpointLocation — the stateful analog of the batch
pipeline's per-stage snapshots.

Scale: state is keyed by domain (power-law key, but the record is a few
longs — hot keys cost update traffic, not memory); the groupBy shuffle is
the single keyed exchange in the stream.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_mentions long, n_rows long, first_ms long, last_ms long"
OUTPUT_SCHEMA = (
    "domain string, n_mentions long, n_batches long, "
    "first_seen timestamp, last_seen timestamp"
)


def _update(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_mentions, n_batches, first_ms, last_ms = state.get
    else:
        n_mentions, n_batches, first_ms, last_ms = 0, 0, None, None
    seen_rows = False
    for pdf in pdfs:
        if len(pdf) == 0:
            # an empty chunk must not poison the timestamps: min()/max()
            # of an empty series is NaT, whose .value is INT64_MIN
            continue
        seen_rows = True
        n_mentions += len(pdf)
        # dropna BEFORE min/max: a non-empty chunk whose warc_ts values
        # are ALL null (e.g. jsonl pages whose ts failed to parse) would
        # otherwise hit the same NaT poison the empty-chunk guard above
        # documents (NaT.value == INT64_MIN). Null-ts rows still count
        # as mentions; they just don't move the time bounds.
        ts = pd.to_datetime(pdf["warc_ts"]).dropna()
        if len(ts):
            lo = int(ts.min().value // 1_000_000)
            hi = int(ts.max().value // 1_000_000)
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
    if not seen_rows:
        # Zero-row invocation: nothing to emit or count, REGARDLESS of
        # whether state exists. Unreachable under NoTimeout for existing
        # groups today, but if a timeout is ever configured a timed-out
        # group is invoked with no rows and must not bump n_batches or
        # re-emit an unchanged row.
        return
    n_batches += 1
    state.update((n_mentions, n_batches, first_ms, last_ms))
    yield pd.DataFrame({
        "domain": [key[0]],
        "n_mentions": [n_mentions],
        "n_batches": [n_batches],
        # first_ms stays None when every row so far had a null warc_ts —
        # emit NaT (-> SQL null) rather than crashing on Timestamp(None).
        "first_seen": [pd.Timestamp(first_ms, unit="ms")
                       if first_ms is not None else pd.NaT],
        "last_seen": [pd.Timestamp(last_ms, unit="ms")
                      if last_ms is not None else pd.NaT],
    })


def domain_mention_state_stream(mentions: DataFrame) -> DataFrame:
    """mentions stream (url, warc_ts, ...) -> per-domain running stats.

    Emits one updated row per domain per micro-batch that touched it
    (update output mode). State schema: (n_mentions, n_batches,
    first_ms, last_ms).
    """
    with_domain = mentions.withColumn(
        "domain", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    )
    return with_domain.groupBy("domain").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
