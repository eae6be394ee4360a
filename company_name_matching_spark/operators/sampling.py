"""Deterministic corpus sampling for training-data pipelines.

A web-scale training pipeline never samples with ``rand()``: the sample
must be reproducible across reruns, resumable mid-job, and consistent
between engines (the Spark job and the DuckDB/Python audit of it). Both
operators here key every decision off ``md5`` of a stable row key, so
the same row makes the same cut on every engine, every run, at every
parallelism level.

Scale notes (100 TB): both operators are embarrassingly parallel.
``hash_sample`` is a pure filter — no shuffle at all, fully pushed into
the scan stage. ``quota_per_key`` shuffles once on the quota key; skewed
keys (one giant ``source``) are bounded because ``row_number`` only ever
materializes ``n`` winners per key and the sort inside each key is a
single window pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# the sampling decision space: the first 8 hex chars of md5 ≈ uniform
# over 16^8. Comparing HEX STRINGS lexicographically (both Spark and
# DuckDB emit lowercase hex) avoids any engine-specific hex→int parsing.
_SPACE = 16 ** 8


def _hex_threshold(rate: float) -> str:
    """8-hex-digit cut so that P[md5_prefix < cut] == round(rate*16^8)/16^8."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(round(rate * _SPACE)), _SPACE - 1), "08x")


def sample_mark(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean column: does this row make the deterministic ``rate`` cut?

    md5(salt || key) first-8-hex < threshold. Changing ``salt`` draws an
    independent sample (e.g. train/holdout splits from one pass)."""
    digest = F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))
    return F.substring(digest, 1, 8) < F.lit(_hex_threshold(rate))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``.

    Pure narrow filter: no shuffle, no rand(), no state — rerunning on
    the same corpus (or on each incremental partition separately) always
    selects the same rows, which is what makes downstream training-data
    lineage auditable. Reference analogy: the reference pipeline's
    fixed-seed evaluation subsets (reference test fixtures draw stable
    labeled subsets); here the stability comes from content hashing, so
    it survives repartitioning and engine changes too.
    """
    return df.where(sample_mark(F.col(key_col), rate, salt))


def quota_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``n`` rows per ``key_col``, chosen by a deterministic
    hash order (md5 of the id, id as tiebreak — md5 collisions on
    distinct ids don't break the total order).

    This is the per-host / per-source cap every crawl pipeline applies
    before training (one domain must not dominate the corpus) and the
    per-language quota of balanced-mixture sampling. One shuffle on the
    quota key; winners-only materialization bounds the output at
    ``n * n_keys`` regardless of skew.
    """
    digest = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    w = Window.partitionBy(key_col).orderBy(digest, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
