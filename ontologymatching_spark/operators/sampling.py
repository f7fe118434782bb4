"""Deterministic stratified sampling — the domain-mixing step of a
training-data pipeline (sample each stratum — language, source, quality
bucket — at its own rate to hit a target mixture).

Membership is decided by an md5-derived uniform in [0,1) on the row key, so
the sample is reproducible across runs, engines, partitionings and cluster
sizes (no RNG state), composable (a 0.5 sample of a 0.5 sample re-uses the
same coin → idempotent subsetting needs distinct salts), and exactly
mirrorable in the DuckDB oracle. Pure codegen — one filter, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def hash_uniform_col(key: Column, salt: str = "") -> Column:
    """md5-derived uniform in [0,1): first 32 bits of md5(salt||key) /
    2^32. Engine-portable (DuckDB: ('0x'||substr(md5(...),1,8))::BIGINT)."""
    from ..functions.spark_sims import md5int_col

    return md5int_col(
        F.concat(F.lit(salt), key.cast("string"))
    ) / F.lit(_DENOM)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row iff hash_uniform(salt||key) < rate[stratum]; strata
    missing from ``rates`` fall back to ``default_rate``. The expected kept
    fraction per stratum equals its rate; actual membership is a pure
    function of the key, so re-runs and resumes see the identical sample."""
    rate: Column = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_uniform_col(F.col(key_col), salt) < rate)
