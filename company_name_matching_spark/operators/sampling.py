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


def _digest_prefix(key: Column, salt: str = "") -> Column:
    """First 8 lowercase-hex chars of md5(salt || key) — the shared
    uniform decision variable of every sampler here (and of their
    DuckDB twins, which state the identical expression)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary")), 1, 8
    )


def sample_mark_rate(key: Column, rate: Column, salt: str = "") -> Column:
    """``sample_mark`` with a COLUMN-valued rate (per-group sampling
    rates computed from the data, e.g. temperature resampling).

    The threshold string is built row-side from the rate —
    ``format('%08x', floor(rate · 16⁸))`` — with only IEEE-exact steps
    (multiply of a correctly-rounded double by 2³², floor, hex print of
    an exact integer), so a DuckDB oracle computing the same rate
    produces the same threshold byte-for-byte. ``rate ≥ 1`` keeps the
    row unconditionally (its threshold would need 9 hex digits)."""
    thr = F.format_string("%08x", F.floor(rate * F.lit(float(_SPACE))))
    return (rate >= 1.0) | (_digest_prefix(key, salt) < thr)


def temperature_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    tau: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-based group rebalancing — the multilingual-LLM
    sampling rule (Conneau & Lample '19 §3.1; mT5/XLM-R style): resample
    so group (language/source) shares go from ``p_g`` to
    ``p_g^τ / Σ p^τ``. With τ < 1 rare groups are upweighted; since a
    batch pipeline cannot upsample by filtering, rates are normalized so
    the rarest group keeps 100% and every other group keeps
    ``(n_min/n_g)^(1-τ)`` — the standard downsample-to-temperature
    formulation.

    Deterministic: each row's fate is ``md5(salt‖key) < f(rate_g)``, so
    the sample is reproducible across reruns/engines/partitionings.
    τ = 0.5 (the common choice) computes rates as ``sqrt(n_min/n_g)`` —
    sqrt and division are IEEE-correctly-rounded in both the JVM and
    DuckDB, making the whole decision bit-portable; other τ go through
    ``pow`` (documented cross-engine last-ulp caveat).

    Scale: one count aggregation to a group-bounded dim (languages /
    crawl sources — thousands at most), broadcast back; the filter
    itself is narrow. The rates dim uses an unpartitioned window for
    ``n_min`` — bounded by the group count, never by the corpus.
    Output keeps ``sample_rate`` (the group's unrounded rate) for audit.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    n_min = F.min("_n").over(Window.partitionBy())
    if tau == 0.5:
        rate = F.sqrt(n_min / F.col("_n"))
    else:
        rate = F.pow(n_min / F.col("_n"), 1.0 - tau)
    rates = counts.select(group_col, rate.alias("sample_rate"))
    return df.join(F.broadcast(rates), group_col).where(
        sample_mark_rate(F.col(key_col), F.col("sample_rate"), salt)
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one hash draw per row,
    bucketed by cumulative-fraction cuts in ``fractions`` order (the
    last split absorbs the remainder, so fractions need not sum to
    exactly 1.0 in floating point). Disjoint + exhaustive by
    construction; adding rows later never reassigns existing rows —
    the property that keeps eval splits stable as a corpus grows.

    Pure narrow projection (no shuffle); the cut strings are computed
    driver-side by the same ``_hex_threshold`` the Bernoulli sampler
    uses, so a SQL twin embeds identical literals."""
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    prefix = _digest_prefix(F.col(key_col), salt)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = prefix < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(names[-1]))


def keep_top_fraction(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    num: int = 9,
    den: int = 10,
) -> DataFrame:
    """Keep the top ``num/den`` fraction of rows per group by
    ``(score desc, id asc)`` — the per-language "drop the bottom decile
    by quality" gate of a training-data filter chain.

    The cutoff is the RANK form ``den·rank ≤ num·n + (den-1)``
    (⇔ rank ≤ ⌈num·n/den⌉) — pure integer arithmetic, no float
    fraction-of-count anywhere, so it is exactly reproducible in any
    engine (a float ``ceil(0.9·n)`` flips at exact multiples:
    0.9·10 = 9.000000000000002 in binary). Every group keeps at least
    one row. One shuffle on the group key; both window functions share
    that single partitioning."""
    if not (0 < num < den):
        raise ValueError(f"need 0 < num < den, got {num}/{den}")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    rank = F.row_number().over(w)
    return (
        df.withColumn("_rn", rank)
        .withColumn("_n", n)
        .where(F.lit(den) * F.col("_rn") <= F.lit(num) * F.col("_n") + F.lit(den - 1))
        .drop("_rn", "_n")
    )
