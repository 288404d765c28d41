"""Lexical retrieval over the documents corpus — distributed BM25.

The training-data use case is query-relevance mining: given a handful
of probe terms, rank a 100 TB corpus by BM25 (Robertson/Sparck-Jones
idf, k1/b term-frequency saturation and length normalization) to pull
topical slices without an embedding index. Spark-first shape:

- corpus statistics (N, avgdl, per-term document frequency) are ONE
  aggregate each over map-side-computed token arrays — dl never
  explodes, and df explodes only the PROBE TERMS' postings
  (candidate-proportional, the same contract as decontaminate's
  broadcast probe n-grams);
- idf weights are model-sized scalars computed driver-side (python
  ``math.log`` — control-plane, like the IVF codebook collect) and
  baked into the scoring projection as literals;
- per-candidate scores are a FIXED-ORDER sum of per-term
  contributions (one conditional-agg column per probe term), so the
  double arithmetic is reproducible across engines — which is what
  lets a DuckDB oracle replay the ranking bit-for-bit.

Tokenization matches `token_doc_freq` (lower, split on
``[^a-z0-9]+``, drop empties) so df here and doc-freq there agree.
"""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TOKEN_SPLIT = "[^a-z0-9]+"

_TOKEN_RE = re.compile(r"[a-z0-9]+\Z")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _checked_terms(query_terms: list[str], where: str) -> list[str]:
    """Stable-order dedup + up-front validation of probe terms.

    Terms double as column-name suffixes (``tf_<term>``) and as
    equality literals against the lowercased tokenizer output, so a
    term that is not itself a single lowercase token is ALWAYS a caller
    bug: ``3.5`` would make ``F.col("tf_3.5")`` parse the dot as a
    struct access (AnalysisException deep in the plan), and ``Spark``
    would silently score tf=0 against the lowered tokens. Reject both
    loudly here, with the tokenizer's own alphabet in the message.
    """
    if not query_terms:
        raise ValueError(f"{where}: empty query_terms")
    terms = list(dict.fromkeys(query_terms))
    bad = [t for t in terms if not _TOKEN_RE.match(t or "")]
    if bad:
        raise ValueError(
            f"{where}: query terms must be single lowercase tokens matching"
            f" [a-z0-9]+ (the tokenizer's alphabet — split on {TOKEN_SPLIT!r}"
            f" after lower()); tokenize/normalize these first: {bad!r}"
        )
    return terms


def _words(text_col: str):
    # text_col is interpolated into a SQL expression string — restrict it
    # to a plain identifier so a malformed/hostile name can't change the
    # expression's meaning.
    if not _IDENT_RE.match(text_col):
        raise ValueError(f"text_col must be a plain identifier, got {text_col!r}")
    return F.expr(
        f"filter(split(lower(trim({text_col})), '{TOKEN_SPLIT}'), x -> x != '')"
    )


def _kept_terms(
    terms: list[str], dfs: dict, n: int, max_df_ratio: float | None, where: str
) -> list[str]:
    """df-threshold guard: drop probe terms present in more than
    ``max_df_ratio`` of the corpus (standard BM25 stopword practice —
    a corpus-df term's idf ≈ ln(1 + (1−r)/r) carries little signal and
    its postings list is corpus-sized, the one skew hazard a
    term-bucketed retrieval store has). ``None`` disables the guard.
    Raises if EVERY term is dropped — an all-stopword probe is a
    caller bug, not an empty result.
    """
    if max_df_ratio is None:
        return terms
    if not 0.0 < max_df_ratio <= 1.0:
        raise ValueError(f"{where}: max_df_ratio must be in (0, 1], got {max_df_ratio}")
    kept = [t for t in terms if float(dfs.get(t, 0)) <= max_df_ratio * float(n)]
    if not kept:
        raise ValueError(
            f"{where}: every probe term exceeds max_df_ratio={max_df_ratio}"
            f" (dfs={ {t: dfs.get(t, 0) for t in terms} }, n={n}) — an"
            " all-stopword query has no lexical signal; raise the ratio or"
            " probe rarer terms"
        )
    return kept


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Top-``top_n`` docs by BM25 for ``query_terms`` (docs containing
    none of the terms are not candidates). Returns
    (id, dl, tf_<term>..., score) ordered by score desc, id asc.

    idf_t = ln(1 + (N − df_t + ½)/(df_t + ½)) — the non-negative RSJ
    form; tf saturation k1, length normalization b over dl/avgdl.

    ``max_df_ratio`` (optional) drops terms with df > ratio·N from
    scoring AND candidacy (see :func:`_kept_terms`); the tf columns of
    dropped terms stay in the output schema (schema stability) as
    literal 0 — the convention the store probe is FORCED into (it
    never reads a dropped term's postings), adopted here so probe ≡
    scan holds column-for-column under the guard.
    """
    terms = _checked_terms(query_terms, "bm25_search")

    def term_eq(t: str):
        # single-arg lambda: a 2-arg callable would be treated as the
        # (element, index) form and bind the index where the term goes
        return lambda x: x == F.lit(t)

    w = docs.select(F.col(id_col), _words(text_col).alias("__ws")).select(
        F.col(id_col),
        F.size("__ws").alias("__dl"),
        *[F.size(F.filter("__ws", term_eq(t))).alias(f"tf_{t}") for t in terms],
    )
    # corpus stats: exact integer sums → reproducible double ratios
    stats = w.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__dl").alias("sdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}") for t in terms],
    ).first()
    n = int(stats["n"])
    avgdl = float(stats["sdl"]) / float(n) if n else 1.0
    dfs = {t: int(stats[f"df_{t}"]) for t in terms}
    scored_terms = _kept_terms(terms, dfs, n, max_df_ratio, "bm25_search")
    idf = {
        t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in scored_terms
    }
    # fixed-order contribution sum: reproducible double arithmetic
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for t in scored_terms:
        tf = F.col(f"tf_{t}").cast("double")
        contrib = F.lit(idf[t]) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = contrib if score is None else score + contrib
    cand = w.where(
        F.greatest(*[F.col(f"tf_{t}") for t in scored_terms]) > 0
        if len(scored_terms) > 1
        else F.col(f"tf_{scored_terms[0]}") > 0
    )
    return (
        cand.select(
            F.col(id_col),
            F.col("__dl").alias("dl"),
            *[
                (
                    F.col(f"tf_{t}")
                    if t in scored_terms
                    else F.lit(0).alias(f"tf_{t}")
                )
                for t in terms
            ],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_n)
    )


def bm25_search_batch(
    docs: DataFrame,
    queries: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Top-``top_n`` docs per query for a BATCH of BM25 queries in ONE
    corpus pass — the shape a relevance-mining pipeline actually runs
    ("pull topical slices for these 200 topics"), where per-query
    :func:`bm25_search` calls would each re-tokenize 100 TB.

    Plan: one map-side token pass computes dl and tf for the UNION of
    all queries' terms; one scalar aggregate yields every term's df;
    each query's fixed-order score expression is then a projection over
    the shared tf columns, emitted as per-(doc, query) rows via a
    struct-array explode (rows multiply by |queries|, never by corpus
    re-scans); per-query top-n is a window rank PARTITIONED BY query_id
    (no global sort, no partition-less window). ``max_df_ratio``
    applies per query with the same kept-term rule as the scalar form
    — a query whose terms are ALL over-threshold yields no rows rather
    than raising (a batch must not die on one stopword topic; the
    empty slice is its verdict).

    Output: (query_id, id, dl, score, rank), rank 1-based per query.
    """
    if not queries:
        raise ValueError("bm25_search_batch: empty query batch")
    per_q = {
        str(qid): _checked_terms(terms, f"bm25_search_batch[{qid}]")
        for qid, terms in queries.items()
    }
    all_terms = list(dict.fromkeys(t for ts in per_q.values() for t in ts))

    def term_eq(t: str):
        return lambda x: x == F.lit(t)

    w = docs.select(F.col(id_col), _words(text_col).alias("__ws")).select(
        F.col(id_col),
        F.size("__ws").alias("__dl"),
        *[
            F.size(F.filter("__ws", term_eq(t))).alias(f"tf_{t}")
            for t in all_terms
        ],
    )
    stats = w.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in all_terms
        ],
    ).first()
    n = int(stats["n"])
    avgdl = float(stats["sdl"]) / float(n) if n else 1.0
    dfs = {t: int(stats[f"df_{t}"]) for t in all_terms}
    idf = {
        t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in all_terms
    }
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.lit(avgdl)
    )
    structs = []
    for qid in sorted(per_q):
        try:
            kept = _kept_terms(
                per_q[qid], dfs, n, max_df_ratio, f"bm25_search_batch[{qid}]"
            )
        except ValueError:
            continue  # all-stopword topic: empty slice, not a dead batch
        score = None
        for t in kept:
            tf = F.col(f"tf_{t}").cast("double")
            contrib = F.lit(idf[t]) * tf * F.lit(k1 + 1.0) / (tf + norm)
            score = contrib if score is None else score + contrib
        cand = (
            F.greatest(*[F.col(f"tf_{t}") for t in kept]) > 0
            if len(kept) > 1
            else F.col(f"tf_{kept[0]}") > 0
        )
        structs.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                F.round(score, 6).alias("score"),
                cand.alias("cand"),
            )
        )
    if not structs:
        raise ValueError(
            "bm25_search_batch: every query in the batch is all-stopword"
            f" under max_df_ratio={max_df_ratio}"
        )
    from pyspark.sql import Window

    exploded = w.select(
        F.col(id_col),
        F.col("__dl").alias("dl"),
        F.explode(F.array(*structs)).alias("q"),
    ).where(F.col("q.cand"))
    rank_w = Window.partitionBy("q.query_id").orderBy(
        F.col("q.score").desc(), F.col(id_col).asc()
    )
    return (
        exploded.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col(id_col),
            "dl",
            F.col("q.score").alias("score"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# persistable inverted-postings store — the repeated-search form
# ---------------------------------------------------------------------------


def _store_relations(
    docs: DataFrame, text_col: str, id_col: str, num_buckets: int
):
    """(postings, doclens, stats, termstats) relations for one corpus
    (or one ingest batch) — the shared tokenize-once step of the store
    writers. Postings are sorted by term WITHIN each bucket partition
    so parquet row-group min/max stats on ``term`` can skip a hot
    term's neighbors (the row-group-level half of the skew guard).

    Each posting row CARRIES the document's length (classic
    postings-with-doclen layout, +4 bytes/row at build time): the probe
    then scores candidates without ever joining the corpus-sized
    doclens relation — measured at 5 M docs, that join dominated BOTH
    guarded and unguarded probes (~4.5 s each) because a k-row
    candidate set still streams every doclens row through the join;
    with dl inline the probe's read set is exactly the probed terms'
    postings. ``doclens`` stays in the store as the (id → dl) side
    artifact (stats recomputation, diagnostics), just off the probe
    path.

    r11, two measured changes:

    - the aggregated posting rows are PERSISTED for the duration of the
      build, so ``termstats`` (an aggregate OVER postings) no longer
      re-runs the tokenize + explode + (term, id) aggregation — the
      heaviest chain in the build — a second time. The tokenized
      relation itself is deliberately NOT cached: measured A/B,
      persisting token arrays (serialize + columnar convert + read
      back) costs more than the scan-side re-tokenize it saves.
    - the write relation hash-clusters on ``bucket`` EXPLICITLY before
      the partitioned write. The old shape leaned on AQE coalescing to
      keep the task count (and therefore files-per-bucket-dir) low —
      but a persisted subtree pins its output partitioning (AQE cannot
      re-plan through an InMemoryRelation), so the write fanned out to
      tasks × buckets tiny files (measured: the build went 5.2 s →
      9.2 s from commit overhead alone). The explicit repartition is
      also the correct 100 TB layout independent of caching: one
      writer task per bucket hash share ⇒ ~1 file per bucket dir
      instead of shuffle-partitions × buckets (guide §6's
      write-distribution-mode=hash). Sort stays (bucket, term) within
      write partitions for row-group pruning of non-probed terms.
    """
    from ..caching import scoped_persist

    w = docs.select(
        F.col(id_col).alias("id"), _words(text_col).alias("__ws")
    ).select("id", F.size("__ws").alias("dl"), F.col("__ws"))
    lens = w.select("id", "dl")
    base = scoped_persist(
        w.select("id", "dl", F.explode("__ws").alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
        )
    )
    postings = base.repartition(F.col("bucket")).sortWithinPartitions(
        "bucket", "term"
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    termstats = base.groupBy("bucket", "term").agg(
        F.count(F.lit(1)).alias("df")
    )
    return postings, lens, stats, termstats


def build_postings_store(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> None:
    """The persistable index form of :func:`bm25_search`, completing the
    retrieval surface the way `minhash_band_store` does for dedup and
    `write_ivf_partitioned` does for ANN: pay one corpus tokenization
    at ingest, then every search reads only its probe terms' partitions.

    Layout under ``path``:

    - ``postings/bucket=B/`` — (term, id, tf) rows, partitioned by a
      64-bit-hash term bucket: a probe's ``bucket IN (…)`` predicate
      prunes at the file-listing level (Hive partition pruning), so a
      k-term query reads ≤ k of ``num_buckets`` partition directories
      no matter how large the corpus; term-sorted within each bucket
      for row-group pruning of non-probed terms;
    - ``doclens/`` — (id, dl) fixed-width rows (side artifact for stats
      recomputation/diagnostics; probes read dl from the posting rows);
    - ``stats/`` — one row (n_docs, total_dl): exact integers, so the
      probe side reproduces avgdl bit-for-bit;
    - ``termstats/bucket=B/`` — (term, df) per bucket: the probe
      learns every term's document frequency from a vocabulary-sized
      read BEFORE touching postings, which is what lets the
      ``max_df_ratio`` skew guard drop a corpus-df stopword term
      WITHOUT reading its corpus-sized postings list.

    The store is rebuilt per corpus version; for daily ingest use the
    append form :func:`postings_store_append_batch` (batch=N layer,
    same contract as `ivf_store_append_batch`).

    r11/r12 persist economics: ``_store_relations`` persists the
    aggregated posting rows, so the postings write and termstats are
    cache-fed (the two heaviest chains). doclens still re-tokenizes
    from the scan BY DESIGN — it needs every doc (including zero-term
    docs, which the postings aggregate drops), and the measured A/B in
    ``_store_relations`` found caching the raw token arrays costs more
    than the scan-side re-tokenize it saves. stats is aggregated from
    the just-written doclens parquet (r12) — exact integer COUNT/SUM
    over identical rows, zero extra tokenize. Net: two tokenize passes
    per build (postings+termstats share one, doclens the other), not
    four.
    """
    postings, lens, _stats, termstats = _store_relations(
        docs, text_col, id_col, num_buckets
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    lens.write.mode("overwrite").parquet(f"{path}/doclens")
    # stats from the just-written doclens parquet, not a third tokenize
    # pass (r12): COUNT/SUM over the identical (id, dl) rows are exact
    # integers, so the stored stats row is bit-identical to aggregating
    # the in-flight relation — but the read set is the fixed-width
    # doclens files instead of a full corpus re-tokenize.
    docs.sparkSession.read.parquet(f"{path}/doclens").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).write.mode("overwrite").parquet(f"{path}/stats")
    termstats.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/termstats"
    )


def postings_store_append_batch(
    docs: DataFrame,
    path: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> None:
    """Append one ingest batch to a GROWING postings store — the
    incremental form of :func:`build_postings_store`, mirroring
    ``ivf_store_append_batch``: a daily-ingest corpus tokenizes only
    the new batch, never re-tokenizing the base.

    Layout adds a ``batch=N`` partition level above every relation
    (``postings/batch=N/bucket=B/`` …): partition discovery unions the
    batches transparently on the probe side, and a probe's
    ``bucket IN (…)`` predicate still prunes at the file-listing level
    inside every batch directory. Each relation overwrites the batch's
    OWN subdirectory (never appends files into shared dirs), so
    replaying a batch after a crash is idempotent — the exactly-once
    pattern the streaming corpus-dedup store uses.

    Correctness contract (pytest-asserted): with batch doc-id sets
    DISJOINT (same precondition as ``minhash_near_duplicates_
    incremental`` — ids are global by construction upstream), probe
    results over append(A)+append(B) are BIT-EQUAL to a rebuild over
    A∪B: global n_docs/total_dl are sums of per-batch exact integers,
    global df is the sum of per-batch dfs (disjoint docs ⇒ no double
    counting), and per-(term, doc) tf rows live in exactly one batch.
    A store is either flat (rebuild) or batched (append-only from
    batch 0) — never both under one ``path``. Persist economics as in
    :func:`build_postings_store` (one tokenize pass per batch, not 4 —
    owned by ``_store_relations``).
    """
    postings, lens, _stats, termstats = _store_relations(
        docs, text_col, id_col, num_buckets
    )
    b = f"batch={batch_id}"
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings/{b}"
    )
    lens.write.mode("overwrite").parquet(f"{path}/doclens/{b}")
    # this batch's stats from its just-written doclens files (r12, same
    # bit-identical read-back as build_postings_store — one fewer
    # tokenize pass per batch)
    docs.sparkSession.read.parquet(f"{path}/doclens/{b}").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).write.mode("overwrite").parquet(f"{path}/stats/{b}")
    termstats.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/termstats/{b}"
    )


def bm25_from_store(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    num_buckets: int = 64,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """BM25 top-``top_n`` over a :func:`build_postings_store` /
    :func:`postings_store_append_batch` store — pytest-asserted equal
    to the corpus-scan :func:`bm25_search` (which is itself
    DuckDB-oracle-backed, so the store path inherits the cross-engine
    proof transitively), for both flat and batched layouts.

    Scale: the probe computes its buckets driver-side (k integers) and
    reads ONLY those partition directories; df per term comes from the
    vocabulary-sized ``termstats`` relation (bucket-pruned — never a
    scan of postings rows), summed across batches (disjoint batch
    doc-ids make the sum exact). The candidate set is the KEPT probe
    terms' postings rows, which carry their doc's dl inline — no join
    against the corpus-sized doclens relation, so the probe's entire
    read set is (probed postings + bucket-pruned termstats + one stats
    row). Nothing in the probe touches document text.

    ``max_df_ratio`` is the store-side SKEW GUARD: a stopword probe
    term's postings list is corpus-sized (the one unbounded object a
    term-bucketed store contains), and because df is known from
    termstats BEFORE the postings scan, an over-threshold term is
    dropped from the ``term IN (…)`` pushed predicate — its postings
    are never read, decoded, or pivoted. Probe cost is then bounded by
    the kept terms' postings (+ a vocabulary-bucket-sized termstats
    read) regardless of what the user probes. Same rule as
    :func:`bm25_search` so probe ≡ scan still holds under the guard.
    """
    terms = _checked_terms(query_terms, "bm25_from_store")
    st = (
        spark.read.parquet(f"{path}/stats")
        .agg(F.sum("n_docs").alias("n"), F.sum("total_dl").alias("sdl"))
        .first()
    )
    n = int(st["n"] or 0)
    avgdl = float(st["sdl"]) / float(n) if n else 1.0
    # probe buckets via the SAME hash the writer used — computed in the
    # JVM on literal one-row data (control-plane job, k rows)
    probe = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int").alias("b")
    )
    # one control-plane collect for BOTH bucket sets (r11: was two jobs)
    term_bucket = {r["term"]: int(r["b"]) for r in probe.collect()}
    buckets = sorted(set(term_bucket.values()))
    dfs = {
        r["term"]: int(r["sdf"])
        for r in (
            spark.read.parquet(f"{path}/termstats")
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("df").alias("sdf"))
            .collect()
        )
    }
    scored_terms = _kept_terms(terms, dfs, n, max_df_ratio, "bm25_from_store")
    idf = {
        t: math.log(1.0 + (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in scored_terms
    }
    kept_buckets = sorted({term_bucket[t] for t in scored_terms})
    postings = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("bucket").isin(kept_buckets))
        .where(F.col("term").isin(scored_terms))
    )
    # pivot probe postings to one column per KEPT term (fixed-order sum,
    # same expression shape as bm25_search); dropped terms keep a
    # constant tf column for schema stability with the scan form. dl
    # rides in the posting rows (identical for every posting of a doc),
    # so the candidate set never joins the corpus-sized doclens relation
    # — the probe's read set is exactly the kept terms' postings.
    cand = postings.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0)).alias(
                f"tf_{t}"
            )
            for t in scored_terms
        ],
        F.max("dl").alias("dl"),
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for t in scored_terms:
        tf = F.col(f"tf_{t}").cast("double")
        contrib = F.lit(idf[t]) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = contrib if score is None else score + contrib
    return (
        cand.select(
            "id",
            "dl",
            *[
                (
                    F.col(f"tf_{t}")
                    if t in scored_terms
                    # dropped term: postings never read → tf literally 0
                    # (same convention as the scan form under the guard)
                    else F.lit(0).cast("long").alias(f"tf_{t}")
                )
                for t in terms
            ],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(top_n)
    )


def rrf_hybrid_search(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
    top_lex: int = 20,
    top_vec: int = 20,
    rrf_k: int = 60,
    top_n: int = 10,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval via Reciprocal Rank Fusion
    (Cormack et al. 2009): fuse the BM25 ranking for ``query_terms``
    with the cosine ranking against ``query_vec`` as ``Σ 1/(rrf_k +
    rank)`` over the lists a doc appears in — the standard RAG-pipeline
    first stage, robust to the two scores' incomparable scales because
    only RANKS enter the fusion.

    Returns (doc_id, lex_rank, vec_rank, rrf_score) — null rank where a
    doc appears in only one list — top ``top_n`` by fused score with
    doc_id tie-break. Both leg rankings order by their 6-dp-rounded
    score (the BM25 output contract; mirrored for cosine) so ranks are
    engine-reproducible.

    Scale: each leg is its existing distributed search (BM25 corpus
    scan/store probe; cosine scan with a LITERAL query vector —
    constant-folded norm, no join, no shuffle of vector payloads); only
    the two ranked lists — top_lex + top_vec ROWS, query-sized by
    construction at any corpus size — are collected to assign ranks
    driver-side (the same control-plane unit as the BM25 idf scalars),
    re-literalized, and fused with one tiny full-outer equi-join. No
    global window anywhere: the per-leg top-k lower to
    TakeOrderedAndProject.
    """
    from .similarity import cosine

    spark = docs.sparkSession
    lex_rows = bm25_search(
        docs, query_terms, text_col=text_col, id_col=doc_id_col,
        k1=k1, b=b, top_n=top_lex, max_df_ratio=max_df_ratio,
    ).select(doc_id_col).collect()
    lex = [(int(r[doc_id_col]), i + 1) for i, r in enumerate(lex_rows)]
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    vec_rows = (
        vectors.select(
            F.col(vec_id_col).alias(doc_id_col),
            F.round(cosine(F.col(vec_col), qlit), 6).alias("__cos"),
        )
        .orderBy(F.col("__cos").desc(), F.col(doc_id_col).asc())
        .limit(top_vec)
        .select(doc_id_col)
        .collect()
    )
    vec = [(int(r[doc_id_col]), i + 1) for i, r in enumerate(vec_rows)]
    l_df = spark.createDataFrame(lex, f"{doc_id_col} long, lex_rank int")
    v_df = spark.createDataFrame(vec, f"{doc_id_col} long, vec_rank int")
    fused = l_df.join(v_df, doc_id_col, "full_outer").select(
        doc_id_col,
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col(doc_id_col).asc()
    ).limit(top_n)
