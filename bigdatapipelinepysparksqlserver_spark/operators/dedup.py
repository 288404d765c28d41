"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

All pure DataFrame/Catalyst expressions (xxhash64, transform, explode) —
zero Python UDFs, so the whole pipeline stays inside whole-stage codegen
and Tungsten. These are the LLM-training-data dedup primitives designed for
100 TB corpora: every shuffle key is a fixed-width hash, never a document
body.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..caching import (
    scoped_local_checkpoint,
    scoped_persist,
    scoped_release,
    tracked_local_checkpoint,
)


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups keyed by md5(text).

    Scale: shuffle payload is (hash16B, id8B) per doc; map-side partial agg
    collapses same-partition dups before the exchange.
    """
    return df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash")).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


def ngram_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Explode each document into word n-gram shingles (id, shingle).

    Single-space tokenization (mirrors the DuckDB oracle's string_split);
    documents with < n words produce no shingles.

    The split is PROJECTED to a column before the transform lambda: HOF
    lambda bodies are interpreted with no common-subexpression
    elimination, so an inlined ``split(...)`` expression would re-split
    the document once per ``element_at`` — n re-splits per shingle,
    measured ~10× slower at n=8. A bound column reference is O(1).

    Built as one ``F.expr`` string: the Python-lambda HOF form costs
    dozens of Py4J round-trips per plan build (construction latency was
    measured to DOMINATE this operator's warm wall time — ~1.3 s of the
    2.2 s total was driver-side Column construction, not execution).
    """
    gram = "concat_ws(' ', " + ", ".join(
        f"element_at(__words, i + {k + 1})" for k in range(n)
    ) + ")"
    shingles = (
        f"CASE WHEN size(__words) >= {n} THEN "
        f"transform(sequence(0, size(__words) - {n}), i -> {gram}) "
        "ELSE CAST(array() AS array<string>) END"
    )
    return df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("__words")
    ).select(F.col(id_col), F.explode(F.expr(shingles)).alias("shingle"))


# Engine-portable MinHash family: base(s) = first 8 hex chars of md5(s)
# as an integer in [0, 2^32) — computable identically in Spark
# (conv(substring(md5(s),1,8),16,10)) and DuckDB
# (CAST('0x'||substr(md5(s),1,8) AS BIGINT)) — then permutation k is the
# affine map (a_k·base + b_k) mod P over the Mersenne prime P = 2^31−1.
# a_k ≤ P−1 and base < 2^32 keep a_k·base + b_k < 2^63: exact BIGINT
# arithmetic on both engines, no overflow, no engine-specific hash.
MINHASH_P = (1 << 31) - 1


def minhash_affine_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) pairs from a fixed-seed 64-bit LCG —
    literal constants, identical in the Spark plan and the oracle SQL."""
    p = MINHASH_P
    state = 0x5DEECE66D
    out = []
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = state % (p - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state % p
        out.append((a, b))
    return out


def minhash_signatures(
    shingled: DataFrame, id_col: str, num_hashes: int = 64
) -> DataFrame:
    """num_hashes MinHash values per doc from (id, shingle) pairs.

    The variable-length shingle string is hashed ONCE (md5 → 32-bit
    base), then each permutation is a two-multiply affine map over that
    fixed-width value — cheaper than re-hashing the string per
    permutation, and (unlike the earlier xxhash64 family) reproducible
    outside the JVM, which is what makes the LSH pipeline
    oracle-checkable in DuckDB. One shuffle (groupBy id) computes all
    signatures via map-side partial MIN.

    A map-only array formulation (transform + array_min per permutation)
    was benchmarked and REJECTED: Spark's higher-order functions are
    interpreted, not codegen'd, so it costs more CPU than this form saves
    in shuffle — and the shuffle here is already doc-cardinality thanks to
    partial aggregation.
    """
    base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    hashed = shingled.withColumn("__hb", base)
    # one F.expr per aggregate (JVM-side parse), not Column arithmetic:
    # 64 Python-built min((a*hb+b)%P) Columns cost ~500 Py4J round-trips
    # (~0.7 s) per plan build — measured as the largest single
    # contributor to this operator's warm wall time.
    mins = [
        F.expr(f"min(({a}L * __hb + {b}L) % {MINHASH_P}L)").alias(f"mh{k}")
        for k, (a, b) in enumerate(minhash_affine_constants(num_hashes))
    ]
    return hashed.groupBy(id_col).agg(*mins)


class PairBudgetExceeded(RuntimeError):
    """An exact (deliberately quadratic) baseline refused to run because
    its pre-flight pair estimate exceeds the caller's budget — the
    contractual bound that keeps the baselines from silently consuming a
    cluster at scale. The message names the near-linear scale path to
    use instead."""


def pair_budget_guard(
    keyed: DataFrame,
    bucket_cols: list[str],
    budget: int,
    scale_path: str,
) -> int:
    """Pre-flight for bucket-grouped pair enumeration: exact expected
    pair count Σ_buckets c·(c−1)/2 from ONE groupBy-count aggregate
    (24-byte rows, map-side combined — the same shuffle key the
    enumeration itself uses, so the check costs a small fraction of the
    work it may veto). Returns the estimate; raises
    :class:`PairBudgetExceeded` with guidance when it exceeds
    ``budget``.

    The per-bucket term aggregates as DECIMAL(38,0) (c·(c−1), halved in
    exact integer arithmetic on the driver) rather than SQL ``/ 2`` —
    double division would accumulate the SUM as DOUBLE and lose integer
    exactness past 2^53 pairs, making the returned count and the budget
    comparison approximate exactly where the guard matters most.

    This is how the fixed-parameter quadratic baselines
    (`dedup_ngram_jaccard`, `emb_neardup_exact`, and the fixed-bits
    LSH/SimHash twins) stay REGISTERED at any scale: below budget they
    run and verify the approximate paths; above it they fail fast with
    the scale path's name instead of stalling a 1000-executor cluster
    on an N² expansion.
    """
    twice = (
        keyed.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).alias("p2"))
        .first()["p2"]
    )
    est = int(twice or 0) // 2
    if est > budget:
        raise PairBudgetExceeded(
            f"estimated {est:,} candidate pairs exceeds the {budget:,} pair"
            f" budget for an exact-baseline run — use the near-linear scale"
            f" path instead: {scale_path}"
        )
    return est


def grouped_pair_enumeration(
    keyed: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    bucket_cap: int = 4096,
) -> DataFrame:
    """Enumerate (id1 < id2) co-occurrence pairs per bucket — one row per
    (bucket, pair) — with the two-tier mega-bucket guard.

    Input: (bucket_cols..., id) rows. One (bucket) shuffle builds the
    bucket table (persisted: multiple consumers, and upstream subtrees
    with HOF lambdas defeat exchange reuse); buckets ≤ ``bucket_cap``
    expand pairs in-row, larger ones re-explode into a distributed
    bucket-keyed self-join so no single task materializes a quadratic
    expansion. Consumers dedup (LSH candidates) or count (exact
    intersection sizes) downstream.
    """
    # persist: two consumers (small/big branch) — the operator returns a
    # LAZY plan over both branches, so it cannot unpersist eagerly.
    # Lifecycle is owned by the caching scope (caching.py): the harness
    # calls release_caches() after materializing the consuming query,
    # keeping memory flat across repeated invocations in one session.
    buckets_all = scoped_persist(
        keyed.groupBy(*bucket_cols)
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("ids"))
        .where(F.size("ids") > 1)
    )
    buckets = buckets_all.where(F.size("ids") <= bucket_cap)
    # r12: index-ordered pair expansion as TWO chained explodes
    # (posexplode each element, explode the array tail after it) instead
    # of the nested transform/struct lambdas — higher-order-function
    # lambdas are interpreted per element while Generate is whole-stage-
    # codegen'd (guide §4.1; same rewrite as the co-purchase basket
    # expansion). Identical pair multiset: both enumerate (i < j) index
    # pairs of the same sorted array.
    small_pairs = (
        buckets.select(F.posexplode("ids").alias("__i", "id1"), "ids")
        .select(
            "id1",
            F.explode(
                F.expr("slice(ids, __i + 2, size(ids) - __i - 1)")
            ).alias("id2"),
        )
    )
    big = buckets_all.where(F.size("ids") > bucket_cap).select(
        *bucket_cols, F.explode("ids").alias("__id")
    )
    a = big.select(*bucket_cols, F.col("__id").alias("id1"))
    b = big.select(*bucket_cols, F.col("__id").alias("id2"))
    big_pairs = (
        a.join(b, bucket_cols).where(F.col("id1") < F.col("id2")).select("id1", "id2")
    )
    return small_pairs.unionByName(big_pairs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    bucket_cap: int = 4096,
) -> DataFrame:
    """LSH banding: equal band-hash in any band → candidate pair (id1 < id2).

    Scale: candidate generation is near-linear instead of the exact
    form's quadratic shingle-join. Two-tier enumeration with EXACT
    semantics at any bucket size:

    * buckets ≤ ``bucket_cap``: one shuffle on (band, bh) into
      groupBy + collect_list + in-row pair expansion — no self-join
      (which would evaluate the signature subtree twice: HOF lambda ids
      defeat exchange reuse) and no extra shuffles. A bucket is an LSH
      collision group, small by construction, so this is ~all the data.
    * buckets > ``bucket_cap`` (degenerate boilerplate that upstream
      exact-dedup should have removed, but might not have): their ids
      re-explode and pair up via a (band, bh)-keyed distributed
      SELF-JOIN — quadratic in the bucket, but spread across tasks by
      the shuffle (AQE skew-split applies). The cap bounds TASK MEMORY,
      not recall — no pairs are dropped.

    The branch happens AFTER one aggregation (cheap: the branch point is
    the bucket table, doc-cardinality ids, persisted) rather than via a
    pre-aggregation size pass — the quadratic pair EXPANSION is what
    OOMs a task at realistic degeneracy (n=10⁴ ids → ~10⁸ structs in ONE
    row), while the id list itself is 8 bytes/doc and only stresses
    memory at absurd (≥10⁸-doc) bucket sizes. Contrast
    ``embedding_near_duplicates``, whose per-entry payload is a whole
    vector — THERE the branch must happen before any collect.
    """
    exploded = band_rows(signatures, id_col, num_hashes, bands)
    return grouped_pair_enumeration(
        exploded, ["band", "bh"], id_col, bucket_cap=bucket_cap
    ).distinct()


def band_rows(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Unpivot a signature table to (id, band, band-hash) rows — the LSH
    bucket key relation shared by self-dedup (pair enumeration) and
    incremental dedup (batch-probe join).

    stack() unpivots all bands in ONE parsed expression — same plan as
    the explode-of-struct-array form but without bands×struct-arity
    Py4J calls at build time.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "a remainder would silently drop trailing minhash columns"
        )
    rows_per_band = num_hashes // bands
    stack_args = ", ".join(
        f"{b}, xxhash64("
        + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")"
        for b in range(bands)
    )
    return signatures.select(
        F.col(id_col),
        F.expr(f"stack({bands}, {stack_args})").alias("band", "bh"),
    )


def shingle_array_from_words(words: Column, n: int = 3) -> Column:
    """Distinct word-n-gram shingle set from an ALREADY-PROJECTED words
    column (map-side, no explode).

    ``words`` must be a bound column reference, not an inline ``split``
    expression — HOF lambdas are interpreted without common-subexpression
    elimination, so an inline split re-executes per element (see
    :func:`ngram_shingles`). Built as one parsed expression to keep plan
    construction off the Py4J hot path.
    """
    w = words._jc.toString()  # column name, e.g. "__words"
    gram = "concat_ws(' ', " + ", ".join(
        f"element_at({w}, i + {k + 1})" for k in range(n)
    ) + ")"
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({w}) - {n}), i -> {gram})) "
        "ELSE CAST(array() AS array<string>) END"
    )


def pairwise_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard for an explicit (id1, id2) candidate list, computed
    per pair by array intersection — the verify stage of the LSH path.

    Scale: cost is proportional to CANDIDATES, never corpus. Each side of
    the pair list joins the docs table once (shingle arrays are computed
    below the join, once per doc, and travel as data); the Jaccard itself
    is a row-local array_intersect — no shingle-level shuffle, no
    post-aggregation semi-join, ~3 stages total. A doc appearing in k
    candidate pairs is replicated k times; LSH banding keeps k small by
    construction (bucket collisions), which is the operator's contract.
    """
    sh = docs.select(
        F.col(id_col).alias("__id"),
        F.split(F.trim(F.col(text_col)), " ").alias("__words"),
    ).select(
        F.col("__id"),
        shingle_array_from_words(F.col("__words"), shingle_n).alias("__sh"),
    )
    s1 = sh.select(F.col("__id").alias("id1"), F.col("__sh").alias("__sh1"))
    s2 = sh.select(F.col("__id").alias("id2"), F.col("__sh").alias("__sh2"))
    inter = F.size(F.array_intersect(F.col("__sh1"), F.col("__sh2")))
    union = F.size("__sh1") + F.size("__sh2") - inter
    jac = inter.cast("double") / union
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash→LSH→exact-verify near-duplicate pairs (the 100 TB dedup path).

    Returns (id1, id2, jaccard rounded to 6dp) for verified pairs ≥ threshold.
    """
    # exploded + groupBy-MIN signatures, NOT the array variant: Spark's
    # higher-order functions (transform/aggregate) are interpreted, so the
    # "shuffle-free" array form spends more CPU than it saves in exchange.
    # The groupBy's map-side partial MIN collapses the shuffle to
    # ~num_hashes longs per (doc, source partition) — doc-cardinality, not
    # shingle-cardinality — which scales fine.
    shingled = ngram_shingles(df, text_col=text_col, id_col=id_col, n=shingle_n)
    sigs = minhash_signatures(shingled, id_col=id_col, num_hashes=num_hashes)
    # persist: two consumers (doc prune + verify) must not recompute the
    # LSH subtree. The operator returns a lazy plan referencing cands, so
    # eager unpersist would defeat the cache — lifecycle is owned by the
    # caching scope (caching.py, released by the harness post-collect).
    cands = scoped_persist(
        lsh_candidate_pairs(sigs, id_col=id_col, num_hashes=num_hashes, bands=bands)
    )
    # one explode pass, no distinct: the semi-join's broadcast hash set
    # dedups build-side keys itself, so a distinct here would add an
    # exchange just to shrink an already-tiny broadcast payload.
    cand_ids = cands.select(
        F.explode(F.array(F.col("id1"), F.col("id2"))).alias(id_col)
    )
    # verify cost must be proportional to CANDIDATES, not corpus: prune the
    # docs table to candidate ids (broadcast semi-join reaches the parquet
    # scan), then each pair fetches its two shingle sets by id join and
    # intersects row-locally.
    cand_docs = df.join(F.broadcast(cand_ids), id_col, "left_semi")
    pairs = pairwise_jaccard(
        cand_docs, cands, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    )
    return pairs.where(F.col("jaccard") >= threshold).select(
        "id1", "id2", F.round("jaccard", 6).alias("jaccard")
    )


def minhash_band_store(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """The persistable LSH index of a corpus: (id, band, bh) rows.

    This is the artifact a production corpus maintains alongside the
    documents (computed once per doc at ingest, appended per batch):
    incremental dedup then probes it directly instead of re-hashing the
    whole base corpus per batch — see
    :func:`minhash_near_duplicates_incremental` (``base_bands=``) and
    ``streaming.cdc.foreach_batch_online_corpus_dedup`` for the
    continuously-maintained form. Fixed-width rows (8 B id + band int +
    8 B hash), bands× the corpus cardinality.
    """
    sigs = minhash_signatures(
        ngram_shingles(docs, text_col=text_col, id_col=id_col, n=shingle_n),
        id_col=id_col, num_hashes=num_hashes,
    )
    return band_rows(sigs, id_col, num_hashes, bands)


def minhash_band_store_bucketed(
    spark,
    docs: DataFrame,
    table: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    num_buckets: int = 32,
    path: "str | None" = None,
) -> DataFrame:
    """The band index as a BUCKETED catalog table — the disk layout that
    removes the base-side shuffle from every future incremental probe.

    :func:`minhash_near_duplicates_incremental` joins batch band rows
    against the base index on (band, bh). With the index stored as a
    plain parquet file both sides shuffle per probe — at 100 TB the base
    side is ``bands × corpus`` rows and re-shuffling it per ingest batch
    is the dominant cost of the join. Bucketing the store by (band, bh)
    (the hash partitioning baked into the file layout) makes
    the stored side Exchange-FREE at probe time: only the batch-sized
    probe side shuffles, so per-batch join cost is O(batch) network no
    matter how large the corpus index grows. Paid once at ingest, like
    all bucketing (see ``sources.lake.write_bucketed_table``). Bucketed
    AND sorted on (band, bh) — both join keys, as Spark's co-partition
    check requires — so the sort-merge probe reads pre-sorted buckets.

    Returns the re-read table DataFrame, ready to pass as
    ``base_bands=``. Appending a new accepted batch = re-write of the
    table (or insertInto for true appends); the streaming form keeps
    per-batch directories instead because exactly-once replay needs
    batch-scoped overwrites.
    """
    from ..sources.lake import write_bucketed_table

    store = minhash_band_store(
        docs, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
    )
    write_bucketed_table(
        spark, store, table, bucket_col=["band", "bh"], num_buckets=num_buckets,
        sort_col=["band", "bh"], path=path,
    )
    return spark.table(table)


def minhash_near_duplicates_incremental(
    base: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    base_bands: "DataFrame | None" = None,
) -> DataFrame:
    """Incremental corpus dedup: near-dup pairs introduced by a NEW
    batch against an existing base corpus (and within the batch) —
    without ever enumerating base-base pairs.

    This is how a 100 TB corpus is actually deduplicated day to day:
    re-running self-dedup over base+batch re-pays the whole corpus's
    candidate enumeration for a 0.1 % delta. Here the batch's band rows
    PROBE the corpus bucket relation with a bucket-keyed join whose
    build side is the (small) batch — broadcast by AQE under the
    threshold, plain shuffle join beyond — so candidate work is
    O(batch × bucket hit size), linear in the batch. A mega bucket in
    the base costs bucket_size candidates per probing batch doc —
    linear, not quadratic, so no cap tier is needed on this path.

    In production the base's signature/band relation is a STORED
    artifact maintained alongside the corpus (computed once per doc at
    ingest — :func:`minhash_band_store`, appended per accepted batch):
    pass it as ``base_bands`` and the base corpus is never re-hashed —
    per-batch cost is then O(batch) hashing + a bucket join against the
    fixed-width index. With ``base_bands=None`` the index is recomputed
    from ``base``, keeping the call self-contained and oracle-checkable.

    Returns (id1 < id2, jaccard ≥ threshold) pairs where at least one
    side is a batch doc — exactly the restriction of
    :func:`minhash_near_duplicates` over base ∪ batch to pairs touching
    the batch (LSH candidacy of a pair is pairwise, so probing only
    batch buckets loses nothing; equality is pytest-asserted).

    PRECONDITION: base and batch doc ids must be DISJOINT. A re-ingested
    doc sharing a base id would be excluded from candidacy against its
    old version by the ``__pid != __cid`` self-filter, and the
    base∪batch docs relation would carry duplicate ids into the verify
    joins, duplicating pair rows. This is the natural contract of an
    append-only ingest (the streaming sink assigns fresh ids per batch
    and relies on it); updates-in-place need a delete+reinsert under a
    NEW id, exactly as the CDC lake path does.
    """
    b_sides = batch.select(F.col(id_col), F.col(text_col))
    a_sides = base.select(F.col(id_col), F.col(text_col))
    if base_bands is None:
        base_bands = minhash_band_store(
            a_sides, text_col, id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        )
    probe = scoped_persist(
        minhash_band_store(
            b_sides, text_col, id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        ).select("band", "bh", F.col(id_col).alias("__pid"))
    )
    # TWO joins, not one join against (base ∪ batch): unioning the base
    # index with the probe rows would erase the base relation's physical
    # layout — in particular a BUCKETED band store
    # (minhash_band_store_bucketed) joins here Exchange-free on its side,
    # which a union would forfeit. probe×(base∪probe) ≡ (probe×base) ∪
    # (probe×probe), and the batch-batch join is batch-sized.
    # No broadcast HINT on either: the probe side is small by contract
    # but not by construction — AQE broadcasts it when it is actually
    # under the threshold and falls back to a bucket-keyed shuffle join
    # when a giant backfill batch arrives, the correct plan there.
    vs_base = probe.join(
        base_bands.select("band", "bh", F.col(id_col).alias("__cid")),
        ["band", "bh"],
    )
    vs_batch = probe.join(
        probe.select("band", "bh", F.col("__pid").alias("__cid")),
        ["band", "bh"],
    )
    cands = scoped_persist(
        vs_base.unionByName(vs_batch)
        .where(F.col("__pid") != F.col("__cid"))
        .select(
            F.least("__pid", "__cid").alias("id1"),
            F.greatest("__pid", "__cid").alias("id2"),
        )
        .distinct()
    )
    docs = a_sides.unionByName(b_sides)
    cand_ids = cands.select(
        F.explode(F.array(F.col("id1"), F.col("id2"))).alias(id_col)
    )
    # no broadcast HINT on the semi-join either (unlike the self-dedup
    # path, whose candidate set is corpus-bounded): candidates here scale
    # with the batch, and this function explicitly contemplates giant
    # backfill batches — a forced broadcast would OOM exactly then. AQE
    # broadcasts when the candidate list is actually small.
    cand_docs = docs.join(cand_ids, id_col, "left_semi")
    pairs = pairwise_jaccard(
        cand_docs, cands, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    )
    return pairs.where(F.col("jaccard") >= threshold).select(
        "id1", "id2", F.round("jaccard", 6).alias("jaccard")
    )


def minhash_near_duplicates_collapsed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact-collapse → MinHash near-dup on DISTINCT texts — the
    boilerplate-proof production shape of :func:`minhash_near_duplicates`.

    The adversarial input for pairwise near-dup is a mega-cluster of
    IDENTICAL boilerplate (cookie banners, license headers): k identical
    docs land in the same LSH buckets and force C(k,2) candidate pairs —
    the mega-bucket guard bounds task memory but the WORK stays quadratic,
    because the pair contract demands quadratic output. Collapsing exact
    duplicates first (md5 groupBy — one fixed-width-key shuffle) reduces
    the cluster to ONE representative, so the LSH/verify stages only ever
    see distinct texts: cost becomes linear in distinct docs, which is the
    scaling a 100 TB crawl (30–50 % exact-dup by most published crawl
    stats) actually needs.

    Returns GROUP-level matches: (rep1, rep2, jaccard, count1, count2)
    where repN is the canonical (min) id of an exact-dup group and countN
    its member size. Pairwise output over members is deliberately NOT
    re-expanded — within-group pairs are jaccard=1.0 by construction and
    cross-group member pairs all share their groups' jaccard, so the
    group-level row carries the same information in O(groups) instead of
    O(members²) rows. (For truly NEAR-identical mega-clusters — perturbed
    boilerplate, no two docs byte-equal — quadratic candidate work is
    information-theoretically forced by the pair contract; the production
    tool there is the cluster view (``connected_components_star``) fed by
    a banding config tuned so one exact verify per bucket edge suffices,
    and the mega-bucket guard keeps those tasks memory-bounded.)
    """
    # min(text) == the group's one distinct text (all members byte-equal);
    # min, not first(), so the representative row is deterministic in any
    # engine — the oracle SQL uses the same MIN.
    groups = df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("__h")).agg(
        F.min(id_col).alias(id_col),
        F.min(text_col).alias(text_col),
        F.count(F.lit(1)).alias("__cnt"),
    )
    reps = scoped_persist(groups.select(id_col, text_col))
    counts = groups.select(F.col(id_col).alias("__rid"), "__cnt")
    pairs = minhash_near_duplicates(
        reps,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    return (
        pairs.join(counts.withColumnRenamed("__rid", "id1"), "id1")
        .withColumnRenamed("__cnt", "count1")
        .join(counts.withColumnRenamed("__rid", "id2"), "id2")
        .withColumnRenamed("__cnt", "count2")
        .select(
            F.col("id1").alias("rep1"),
            F.col("id2").alias("rep2"),
            "jaccard",
            "count1",
            "count2",
        )
    )


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 60
) -> DataFrame:
    """60-bit SimHash per document from distinct-word hashes.

    bit_i(sig) = sign of Σ_tokens (±1 by bit_i(h(token))); computed as
    `bits` conditional SUM aggregates in a single groupBy — one shuffle,
    all map-side combinable. The token hash is the ENGINE-PORTABLE
    60-bit md5-hex-prefix (15 hex chars → BIGINT, same construction as
    the MinHash base but wider), so the whole signature — and the
    Hamming-blocked pair search over it — replays exactly in DuckDB SQL;
    60 bits also keeps the signature in a signed BIGINT.
    """
    # hash BEFORE the distinct: the (id, token) dedup shuffle then carries
    # fixed 8-byte hashes instead of variable-length token strings, and the
    # downstream bit tests reuse the same column.
    tokens = (
        df.select(
            F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok")
        )
        .select(
            F.col(id_col),
            F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
            .cast("long")
            .alias("__h"),
        )
        .distinct()
    )
    # F.expr per aggregate / one folded expr for the sign recombination:
    # the Column-arithmetic form costs ~bits×6 Py4J round-trips per plan
    # build (see minhash_signatures for the measurement).
    sums = [
        F.expr(
            f"sum(CASE WHEN (shiftright(__h, {i}) & 1L) = 1L THEN 1 ELSE -1 END)"
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tokens.groupBy(id_col).agg(*sums)
    sig = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}L ELSE 0L END)" for i in range(bits)
    )
    return agg.select(F.col(id_col), F.expr(sig).cast("long").alias("simhash"))


def hamming_neighbors(
    signatures: DataFrame,
    id_col: str,
    max_distance: int = 3,
    bucket_cap: int = 2048,
    pair_budget: int | None = None,
    scale_path: str = "",
) -> DataFrame:
    """SimHash pairs within a Hamming radius, bucketed by 16-bit sub-blocks.

    Pigeonhole: two 64-bit signatures within distance 3 share at least one
    of four 16-bit blocks exactly — bucket per block, enumerate in-bucket
    pairs, then verify with bit_count.

    Scale: (block, value) rows go through the SHARED two-tier
    :func:`grouped_pair_enumeration` carrying IDS ONLY (in-row expansion
    under ``bucket_cap``, distributed self-join above — a hot block value
    never materializes a quadratic struct array in one task), then the
    8-byte signatures REJOIN for the bit_count verify,
    candidate-proportionally. The alternatives both lose at scale: 4
    self-joins of the signature relation evaluate and shuffle the
    signature aggregation 8×, and the pre-r4 struct-collect form carried
    (id, simhash) payload structs through the bucket rows with no
    mega-bucket tier. The final distinct (inside the enumeration +
    here via dropDuplicates on id pairs) dedups pairs colliding in
    several blocks before the verify.

    ``pair_budget``: the FIXED 16-bit block space caps buckets at 2^16
    per block, so in-bucket candidate pairs grow ~N²/2^16 — quadratic
    past ~10⁶ docs no matter how the plan is shaped. Passing a budget
    runs :func:`pair_budget_guard` on the (blk, val) enumeration key
    BEFORE any expansion, raising :class:`PairBudgetExceeded` naming
    ``scale_path`` (the policy-width :func:`hamming_neighbors_wide`
    form) past it — the contractual bound that keeps the fixed-width
    form registered at any corpus size.
    """
    # persist: the signature relation now has THREE consumers (block
    # explode + both verify rejoin sides) and its subtree is a full
    # token-explode aggregation — without the cache it would recompute
    # per consumer (projection-different parents defeat ReuseExchange).
    # Lifecycle owned by the caching scope (caching.py); the cached
    # relation is 9 bytes/doc.
    signatures = scoped_persist(signatures)
    stack_args = ", ".join(
        f"{b}, shiftright(simhash, {b * 16}) & 65535L" for b in range(4)
    )
    exploded = signatures.select(
        F.col(id_col),
        F.expr(f"stack(4, {stack_args})").alias("blk", "val"),
    )
    if pair_budget is not None:
        pair_budget_guard(exploded, ["blk", "val"], pair_budget, scale_path)
    pairs = grouped_pair_enumeration(
        exploded, ["blk", "val"], id_col, bucket_cap=bucket_cap
    ).dropDuplicates(["id1", "id2"])
    s1 = signatures.select(F.col(id_col).alias("id1"), F.col("simhash").alias("sh1"))
    s2 = signatures.select(F.col(id_col).alias("id2"), F.col("simhash").alias("sh2"))
    dist = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .where(dist <= max_distance)
        .select("id1", "id2", dist.alias("hamming_distance"))
    )


def simhash_signatures_wide(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """120-bit SimHash as TWO 60-bit words — the policy-sizable form.

    The single-word :func:`simhash_signatures` caps the Hamming-blocking
    bucket space at 2^15 per block (60 bits / 4 pigeonhole blocks), so
    in-bucket candidate pairs grow ~N²/2^15 — quadratic past ~10⁶ docs.
    This variant takes BOTH md5 halves (hex chars 1-15 and 16-30 → two
    60-bit words, 120 signature bits), letting
    :func:`hamming_neighbors_wide` widen its blocks with the corpus:
    block width w supports bucket spaces up to 2^30, i.e. constant
    occupancy out to ~80·2^30 ≈ 10¹¹ docs under the
    ``recommended_bits`` policy (operators/similarity.py — the same
    occupancy math governs both LSH families).

    Same engine-portable construction as the narrow form (md5-hex
    prefix → BIGINT, per-bit ±1 conditional sums in ONE groupBy — 120
    map-side-combinable aggregates), so the whole wide signature
    replays in DuckDB. Output: (id, simhash0, simhash1), word 0 =
    hash bits 0-59, word 1 = bits 60-119.
    """
    tokens = (
        df.select(
            F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok")
        )
        .select(F.col(id_col), F.md5(F.col("tok")).alias("__m"))
        .select(
            F.col(id_col),
            F.conv(F.substring("__m", 1, 15), 16, 10).cast("long").alias("__h0"),
            F.conv(F.substring("__m", 16, 15), 16, 10).cast("long").alias("__h1"),
        )
        .distinct()
    )
    sums = [
        F.expr(
            f"sum(CASE WHEN (shiftright(__h{w}, {i}) & 1L) = 1L THEN 1 ELSE -1 END)"
        ).alias(f"s{w}_{i}")
        for w in (0, 1)
        for i in range(60)
    ]
    agg = tokens.groupBy(id_col).agg(*sums)
    sigs = [
        " + ".join(
            f"(CASE WHEN s{w}_{i} > 0 THEN {1 << i}L ELSE 0L END)" for i in range(60)
        )
        for w in (0, 1)
    ]
    return agg.select(
        F.col(id_col),
        F.expr(sigs[0]).cast("long").alias("simhash0"),
        F.expr(sigs[1]).cast("long").alias("simhash1"),
    )


def hamming_neighbors_wide(
    signatures: DataFrame,
    id_col: str,
    max_distance: int = 3,
    block_bits: int = 15,
    bucket_cap: int = 2048,
) -> DataFrame:
    """Hamming pairs over the 120-bit wide signature with POLICY-SIZED
    block width — the scale form of :func:`hamming_neighbors`.

    Four pigeonhole blocks, two per word (block i of word w = bits
    [i·block_bits, (i+1)·block_bits), i ∈ {0,1}) — disjoint bit
    subsets of the 120-bit signature, so distance ≤ ``max_distance``
    (= 3) still guarantees an exact match in ≥ 1 block, for ANY block
    width: narrower blocks only ADD candidates (verified away by the
    full 120-bit bit_count), wider blocks shrink buckets. Size
    ``block_bits`` with ``recommended_bits(n_docs, max_bits=30)`` —
    bucket space 2^block_bits then grows ∝ N, keeping per-bucket
    occupancy (and candidate pairs per doc) constant where the fixed
    16-bit blocking's pairs grow quadratically.

    Same two-tier id-only enumeration + candidate-proportional
    signature rejoin as the narrow form.
    """
    if not 4 <= block_bits <= 30:
        raise ValueError(f"block_bits must be in [4, 30], got {block_bits}")
    signatures = scoped_persist(signatures)
    mask = (1 << block_bits) - 1
    stack_args = ", ".join(
        f"{2 * w + i}, (shiftright(simhash{w}, {i * block_bits}) & {mask}L)"
        for w in (0, 1)
        for i in (0, 1)
    )
    exploded = signatures.select(
        F.col(id_col),
        F.expr(f"stack(4, {stack_args})").alias("blk", "val"),
    )
    pairs = grouped_pair_enumeration(
        exploded, ["blk", "val"], id_col, bucket_cap=bucket_cap
    ).dropDuplicates(["id1", "id2"])
    s1 = signatures.select(
        F.col(id_col).alias("id1"),
        F.col("simhash0").alias("a0"),
        F.col("simhash1").alias("a1"),
    )
    s2 = signatures.select(
        F.col(id_col).alias("id2"),
        F.col("simhash0").alias("b0"),
        F.col("simhash1").alias("b1"),
    )
    dist = F.bit_count(F.col("a0").bitwiseXOR(F.col("b0"))) + F.bit_count(
        F.col("a1").bitwiseXOR(F.col("b1"))
    )
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .where(dist <= max_distance)
        .select("id1", "id2", dist.cast("int").alias("hamming_distance"))
    )


def connected_components(
    edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate clusters from a pair list: connected components by
    iterative min-label propagation. Returns (doc_id, component) where
    ``component`` is the smallest doc id reachable from ``doc_id`` —
    i.e. the cluster's canonical representative.

    This is the step that turns pairwise near-dup MATCHES into dedup
    GROUPS (keep the canonical doc, drop the rest). It is genuinely
    iterative — no single SQL expression computes transitive closure —
    so it runs a driver loop of DataFrame rounds:

    label_{t+1}(v) = min(label_t(v), min over neighbors u of label_t(u))

    converging in O(diameter) rounds; near-dup graphs are unions of
    small dense clusters, so the diameter — and the round count — is
    tiny regardless of corpus size. Each round is one join + one
    groupBy on the (small) edge list, with the previous labels
    localCheckpoint()ed to sever the exponentially deepening lineage
    (the classic iterative-algorithm failure mode). Convergence is
    detected by an exact per-round change count; ``max_iter`` bounds
    pathological chains — if the cap is hit, a chain longer than
    ``max_iter`` hops keeps more than one label (components OVER-split,
    never wrongly merged; raise ``max_iter`` or pre-collapse exact dups
    if corpus graphs ever get that stringy).
    """
    sym = edges.select(
        F.col(id1).alias("src"), F.col(id2).alias("dst")
    ).unionByName(edges.select(F.col(id2).alias("src"), F.col(id1).alias("dst")))
    sym = sym.persist()
    labels, free_prev = tracked_local_checkpoint(
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["doc_id"])
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated, free_new = tracked_local_checkpoint(
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component"))
                .cast("long")
                .alias("__changed"),
            )
        )  # sever lineage: O(1) plan depth per round
        changed = updated.agg(F.sum("__changed")).first()[0] or 0
        # round materialized (the checkpoint is eager) → free the
        # previous round's blocks now instead of stranding one per round
        free_prev()
        free_prev = free_new
        labels = updated.drop("__changed")
        if changed == 0:
            break
    sym.unpersist()
    # the returned plan projects the FINAL checkpoint — its free handle
    # joins the caching scope (a freed checkpoint is unexecutable, so
    # the harness releases it only after materialization)
    scoped_release(free_prev)
    return labels


def connected_components_star(
    edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewriting (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14). Returns (doc_id, component) like
    :func:`connected_components`, with component = the cluster minimum.

    Why a second algorithm: min-label propagation needs O(diameter)
    rounds — fine for near-dup graphs (unions of small dense cliques),
    pathological for stringy graphs (a length-L chain takes L rounds,
    each a full shuffle). Star contraction halves tree heights every
    round and provably converges in O(log² n) rounds (O(log n) in
    practice) *independent of diameter* — the right default at 100 TB
    where one adversarial chain would otherwise serialize the job.

    Each round is two groupBy+join passes over the edge list, no
    collect_list (high-degree nodes never materialize their
    neighborhood in one row — the min is a map-side-combinable agg):

      large-star: m(u) = min(Γ(u) ∪ {u}) over the SYMMETRIC edge set;
                  every neighbor v > u re-attaches to m(u).
      small-star: on (hi, lo)-oriented edges, m(hi) = min(Γ≤(hi));
                  hi and its smaller neighbors all re-attach to m(hi).

    Both preserve connectivity and strictly shrink a potential
    function, so the fixed point — star graphs rooted at each
    component's minimum — is reached without oscillation. Convergence
    is detected by the STAR-FOREST test itself (r11): the edge set is
    a fixed point iff no ``lo`` endpoint also appears as a ``hi`` (all
    (hi, lo) rows keep hi > lo, so a component whose lo-set and hi-set
    are disjoint is exactly a star rooted at its minimum — the fixed
    point the rounds provably reach). The test is one map-side-
    combinable aggregate over the round's checkpointed output (union
    both endpoint roles, group by node, nonempty both-roles set ⇒ not
    yet a star), so it replaces the old (edge-count, hash-sum)
    fingerprint — which could only detect a fixed point by running one
    EXTRA full round and comparing — and the loop now stops one round
    (≈ 6 exchanges over the edge list) earlier, with the same exact
    output. Checked BEFORE each round too, so an already-contracted
    input (all-pair-components near-dup boards) skips the loop
    entirely. Per-round localCheckpoint severs lineage;
    each round EAGERLY materializes its checkpoint and then frees the
    previous round's blocks (r5 — the loop used to strand one
    edge-list-sized checkpoint per round until GC noticed). The inputs
    the FINAL lazy plan still references (base edges, node list, last
    round) are registered in the caching scope, released by the harness
    after materialization — unpersisting them here would strand the
    returned plan on lineage a localCheckpoint no longer has.
    """
    deduped = scoped_local_checkpoint(
        edges.select(
            F.greatest(F.col(id1), F.col(id2)).alias("hi"),
            F.least(F.col(id1), F.col(id2)).alias("lo"),
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )
    nodes = scoped_persist(
        deduped.select(F.col("hi").alias("doc_id"))
        .union(deduped.select("lo"))
        .distinct()
    )
    def _is_star_forest(df: DataFrame) -> bool:
        # hi > lo holds for every row, so the edge set is the fixed
        # point (stars rooted at each component minimum) iff (a) no
        # node plays both roles AND (b) every hi appears in exactly one
        # edge — a hi carrying two distinct lo's is an uncontracted
        # wedge (e.g. {(2,0),(2,1)}: roles disjoint, still one round
        # from the fixpoint {(1,0),(2,0)}). Rows are distinct, so
        # SUM(role) counts a hi's edges. One union + one node-keyed
        # aggregate, map-side-combinable; take(1) on violations.
        viol = (
            df.select(F.col("hi").alias("n"), F.lit(1).alias("s"))
            .union(df.select(F.col("lo"), F.lit(0)))
            .groupBy("n")
            .agg(F.min("s").alias("mn"), F.sum("s").alias("nhi"))
            .where((F.col("mn") == 0) & (F.col("nhi") > 0) | (F.col("nhi") > 1))
        )
        return viol.isEmpty()

    cur = deduped
    free_prev = None  # never free deduped mid-loop: nodes reads it lazily
    for _ in range(max_iter):
        if _is_star_forest(cur):
            break
        # large-star over the symmetrized edges: (v, m(u)) for v > u
        sym = cur.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            cur.select(F.col("lo"), F.col("hi"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star on the (hi, lo) orientation large-star guarantees
        # (m ≤ u < v): hi and all its smaller neighbors attach to the min
        m2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        with_min = large.join(m2, "hi")
        small, free_new = tracked_local_checkpoint(
            with_min.where(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(with_min.select("hi", F.col("m")))
            .distinct()
        )
        # this round's checkpoint is materialized (eager) — the PREVIOUS
        # round's blocks are unreachable from any future plan: free now
        if free_prev is not None:
            free_prev()
        free_prev = free_new
        cur = small
    labels = nodes.join(
        cur.select(F.col("hi").alias("doc_id"), F.col("lo").alias("component")),
        "doc_id",
        "left",
    ).select("doc_id", F.coalesce("component", "doc_id").alias("component"))
    # the returned LAZY plan reads nodes and cur: both stay cached until
    # the harness releases the scope post-materialization (cur is a
    # lineage-severed checkpoint — freeing it here would make the plan
    # unexecutable, and nodes would silently recompute)
    if free_prev is not None:
        scoped_release(free_prev)
    return labels
