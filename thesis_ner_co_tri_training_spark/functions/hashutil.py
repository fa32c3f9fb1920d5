"""The engine's canonical engine-portable hash.

`md5_long(*cols)` maps its '|'-joined string inputs to a 60-bit
non-negative BIGINT via the first 15 hex digits of md5 — reproducible in
ANY engine with md5 (DuckDB oracle form:
`('0x' || substr(md5(x), 1, 15))::BIGINT`), unlike xxhash64, which only
Spark implements. Every md5-hash site in the engine (minhash/simhash md5
twins, training-mix sampling) MUST route through this helper: the exact
byte recipe (separator, substring width, radix) is part of the
cross-engine oracle contract, so a drifting copy would silently break
hash parity.

NULL semantics note: concat_ws SKIPS null inputs (two rows differing
only in a null column can collide). Callers that need null-propagating
semantics (e.g. mix_corpus's per-key fate) must gate on isNotNull()
outside the helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MD5_LONG_MAX = float(1 << 60)  # exclusive upper bound of md5_long + 1


def md5_long(*cols: Column) -> Column:
    """60-bit non-negative BIGINT from the '|'-joined inputs (md5 hex
    prefix). Oracle twin: ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("bigint")


def md5_uniform(*cols: Column) -> Column:
    """Uniform double in [0, 1) derived from md5_long — deterministic
    per input across engines, retries and partition layouts."""
    return md5_long(*cols).cast("double") / F.lit(MD5_LONG_MAX)
