"""Reproducible sampling for training-data pipelines.

``df.sample(fraction, seed)`` is NOT reproducible across runs at scale:
its Bernoulli draw is seeded per partition index, so any change in file
layout, split sizes, or parallelism reshuffles which rows are kept.
A data pipeline needs sample membership to be a pure function of the ROW
— so re-runs, backfills, and incremental extensions of the corpus agree
on every row forever.

``hash_sample`` gates on a cryptographic hash of a stable key: a row is
in the sample iff ``md5(key) < threshold``. Membership is deterministic,
partition-independent, composable (a 1/4 sample of a 1/2 sample is an
exact 1/8 sample when thresholds nest), and engine-portable (md5 hex
compares identically everywhere — which also makes it DuckDB-oracle
checkable, unlike xxhash64 gating).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def hash_gate(key: Column, threshold_hex: str) -> Column:
    """Membership predicate: md5(key) lexicographically below the hex
    threshold. ``threshold_hex`` of length k keeps ~int(threshold,16)/16^k
    of rows (e.g. '28' → 0x28/256 ≈ 15.6%, '1' → 1/16 = 6.25%)."""
    return F.md5(key.cast("string").cast("binary")) < F.lit(threshold_hex.lower())


def hash_sample(df: DataFrame, key_col: str, threshold_hex: str) -> DataFrame:
    """Deterministic row-content sample (see module docstring).

    Scale: the gate is a scan-side codegen predicate — no shuffle, no
    state; the md5 cost is per-row but the predicate prunes before any
    downstream join or explode. For selective samples this makes the
    whole downstream pipeline pay fraction-proportional cost.
    """
    return df.where(hash_gate(F.col(key_col), threshold_hex))


def deterministic_shuffle(
    df: DataFrame, key_col: str, num_partitions: int = 64
) -> DataFrame:
    """Reproducible global shuffle for training-data ordering: total
    order by ``md5(key)`` — effectively random with respect to any
    content attribute, yet a pure function of the row, so every re-run
    (and every engine) produces the SAME order.

    Scale: the single-partition trap here is a global
    ``row_number()``/``orderBy().collect()`` — instead this is
    ``repartitionByRange`` on the hash (range exchange via sampled
    boundaries) + ``sortWithinPartitions``: written out, part-00000 …
    part-NNNNN concatenate to the totally-ordered corpus, with no
    operator ever seeing more than one partition. This is how an epoch's
    example order is fixed at 100 TB.
    """
    h = F.md5(F.col(key_col).cast("string").cast("binary")).alias("__shuffle_key")
    return (
        df.select("*", h)
        .repartitionByRange(num_partitions, F.col("__shuffle_key"))
        .sortWithinPartitions("__shuffle_key")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    thresholds: dict[str, str],
) -> DataFrame:
    """Per-stratum deterministic sampling — corpus mixing by downsampling
    each stratum (language, source, domain) at its own rate, e.g. keep 25%
    of 'en' but 6% of 'de' to hit a target language mix.

    ``thresholds`` maps stratum value → hex gate for :func:`hash_gate`;
    strata absent from the map are dropped entirely (rate 0). Same
    guarantees as ``hash_sample``: membership is a pure per-row function,
    so the mix is stable under re-runs and corpus growth, and nested
    thresholds compose (shrinking one stratum's hex prefix only ever
    removes rows from it).

    Scale: still a scan-side codegen predicate (a CASE over literal
    thresholds — no join, no shuffle); strata count is assumed
    literal-sized (languages/sources), not data-sized.
    """
    if not thresholds:
        raise ValueError("thresholds must map at least one stratum to a gate")
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    gate = F.lit(False)
    for stratum, thr in thresholds.items():
        gate = F.when(
            F.col(stratum_col) == stratum, h < F.lit(thr.lower())
        ).otherwise(gate)
    return df.where(gate)
