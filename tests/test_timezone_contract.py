"""Session-timezone hostility gate for the contract's temporal queries.

The r01 driver red on q10_sessionize was environmental, not logical: the
query cast TIMESTAMP_NTZ through unix epoch, which interprets wall time
in spark.sql.session.timeZone — UTC in the local gate (session.get_spark
pins it), but not necessarily in the driver's harness. The fix was
interval arithmetic on NTZ values; this test pins the fix for EVERY
contract query that touches timestamps or dates, by re-running each one
under a deliberately hostile session timezone (America/New_York — DST
transitions shift epoch-based wall-time math by an hour twice a year)
on BOTH engines and demanding the same repr-exact canonical frame the
driver hashes:

  spark@UTC == spark@NY == duckdb@NY

If any of these queries regresses into a session-tz-dependent cast, the
spark@UTC vs spark@NY leg fails even when both engines agree with each
other inside one zone.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
HOSTILE_TZ = "America/New_York"

# Every queries() entry whose plan reads a timestamp/date column or
# emits a temporal-derived value (ts windows, date_trunc/hour, date
# filters, as-of gaps). Temporal-free queries are covered by the main
# contract gate; re-running them here would only add runtime.
TEMPORAL_QUERIES = [
    "q01_pricing_summary",   # l_shipdate filter (date comparison)
    "q10_sessionize",        # NTZ lag gaps vs INTERVAL literal
    "q18_events_hourly",     # date_trunc('hour', ts) in the output
    "q33_promo_revenue",     # o_orderdate range filter
    "q41_asof_join",         # backward as-of on ts, gap in the output
    "q43_funnel",            # first-completion ts columns in the output
    "q44_rollup",            # hour(ts) grouping key
    "q51_range_join",        # bucketized interval join, ts outputs
    "q52_cohort_retention",  # date_trunc('week') cohorts + day diffs
]


def _canon():
    spec = importlib.util.spec_from_file_location(
        "check_contract", "/root/repo/scripts/check_contract.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.canon


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TEMPORAL_QUERIES)
def test_temporal_query_is_timezone_proof(spark, duck, name):
    canon = _canon()
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    base_tz = spark.conf.get("spark.sql.session.timeZone")
    assert base_tz == "UTC"  # get_spark pins it; the gate relies on that
    utc_df = canon(fn(spark, SF_DIR).toPandas())

    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    try:
        ny_df = canon(fn(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.session.timeZone", base_tz)

    duck.execute(f"SET TimeZone='{HOSTILE_TZ}'")
    try:
        oracle_ny = canon(duck.execute(sql).fetchdf())
    finally:
        duck.execute("SET TimeZone='UTC'")

    assert utc_df.equals(ny_df), (
        f"{name}: Spark result depends on spark.sql.session.timeZone"
    )
    assert ny_df.equals(oracle_ny), (
        f"{name}: engines diverge under {HOSTILE_TZ}"
    )
