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


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """Top-``top_n`` docs by BM25 for ``query_terms`` (docs containing
    none of the terms are not candidates). Returns
    (id, dl, tf_<term>..., score) ordered by score desc, id asc.

    idf_t = ln(1 + (N − df_t + ½)/(df_t + ½)) — the non-negative RSJ
    form; tf saturation k1, length normalization b over dl/avgdl.
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
    idf = {
        t: math.log(
            1.0 + (n - int(stats[f"df_{t}"]) + 0.5) / (int(stats[f"df_{t}"]) + 0.5)
        )
        for t in terms
    }
    # fixed-order contribution sum: reproducible double arithmetic
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        contrib = F.lit(idf[t]) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = contrib if score is None else score + contrib
    cand = w.where(
        F.greatest(*[F.col(f"tf_{t}") for t in terms]) > 0
        if len(terms) > 1
        else F.col(f"tf_{terms[0]}") > 0
    )
    return (
        cand.select(
            F.col(id_col),
            F.col("__dl").alias("dl"),
            *[F.col(f"tf_{t}") for t in terms],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_n)
    )


# ---------------------------------------------------------------------------
# persistable inverted-postings store — the repeated-search form
# ---------------------------------------------------------------------------


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
      no matter how large the corpus;
    - ``doclens/`` — (id, dl) fixed-width rows (the BM25 length
      normalization side);
    - ``stats/`` — one row (n_docs, total_dl): exact integers, so the
      probe side reproduces avgdl bit-for-bit.

    The store is rebuilt per corpus version (same contract as the other
    index artifacts — append via a ``batch=N`` layer if incremental
    ingest is needed, exactly like `ivf_store_append_batch`).
    """
    w = docs.select(F.col(id_col).alias("id"), _words(text_col).alias("__ws"))
    lens = w.select("id", F.size("__ws").alias("dl"))
    postings = (
        w.select("id", F.explode("__ws").alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
        )
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    lens.write.mode("overwrite").parquet(f"{path}/doclens")
    lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_from_store(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    num_buckets: int = 64,
) -> DataFrame:
    """BM25 top-``top_n`` over a :func:`build_postings_store` store —
    pytest-asserted equal to the corpus-scan :func:`bm25_search` (which
    is itself DuckDB-oracle-backed, so the store path inherits the
    cross-engine proof transitively).

    Scale: the probe computes its buckets driver-side (k integers) and
    reads ONLY those partition directories; df per term is an exact
    count over the probed postings (term-cardinality rows, never
    corpus); the candidate set is the probed postings' doc ids, joined
    to fixed-width doclens. Nothing in the probe touches document text.
    """
    terms = _checked_terms(query_terms, "bm25_from_store")
    st = spark.read.parquet(f"{path}/stats").first()
    n = int(st["n_docs"])
    avgdl = float(st["total_dl"]) / float(n) if n else 1.0
    # probe buckets via the SAME hash the writer used — computed in the
    # JVM on literal one-row data (control-plane job, k rows)
    probe = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int").alias("b")
    )
    buckets = sorted({int(r["b"]) for r in probe.collect()})
    postings = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(terms))
    )
    dfs = {
        r["term"]: int(r["df"])
        for r in postings.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    idf = {
        t: math.log(1.0 + (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
    }
    # pivot probe postings to one column per term (fixed-order sum, same
    # expression shape as bm25_search)
    pivoted = postings.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0)).alias(
                f"tf_{t}"
            )
            for t in terms
        ]
    )
    lens = spark.read.parquet(f"{path}/doclens")
    cand = pivoted.join(lens, "id")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        contrib = F.lit(idf[t]) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = contrib if score is None else score + contrib
    return (
        cand.select(
            "id",
            "dl",
            *[F.col(f"tf_{t}") for t in terms],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(top_n)
    )
