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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TOKEN_SPLIT = "[^a-z0-9]+"


def _words(text_col: str):
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
    if not query_terms:
        raise ValueError("bm25_search: empty query_terms")
    terms = list(dict.fromkeys(query_terms))  # stable-order dedup
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
