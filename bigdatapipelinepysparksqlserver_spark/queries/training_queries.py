"""Training-data pipeline query surface — repetition filtering, chunking,
stratified corpus mixing, PII scrubbing, benchmark decontamination.

These extend the reference's ELT capability set (SURVEY §2) with the
operations a 100 TB LLM-corpus pipeline runs between raw ingest and
training: quality gates (repetition), example prep (token-window
chunking), mix control (per-stratum deterministic sampling), compliance
(PII scrub), and eval hygiene (n-gram decontamination). Every query has
a DuckDB oracle; the shared tokenizer is single-space word split, the
shared regex dialect is Java∩RE2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.sampling import stratified_sample
from ..operators.text import (
    EMAIL_REGEX,
    PHONE_REGEX,
    chunk_documents,
    ngram_probe_hits,
    repetition_scores,
    scrub_pii,
)
from ..sources.catalog import Catalog
from .registry import query

REPETITION_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents
),
stats AS (
  SELECT doc_id, len(w) AS n_words,
         ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE), 6)
           AS distinct_word_ratio
  FROM words
),
bg AS (
  SELECT doc_id, w[CAST(t.i AS INT)] || ' ' || w[CAST(t.i AS INT) + 1] AS bigram
  FROM words, UNNEST(range(1, len(w))) AS t(i)
),
bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
bgt AS (
  SELECT doc_id,
         ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
           AS top_bigram_fraction
  FROM bgc GROUP BY doc_id
)
SELECT s.doc_id, s.n_words, s.distinct_word_ratio, b.top_bigram_fraction
FROM stats s LEFT JOIN bgt b USING (doc_id)
"""


@query("text_repetition_score", oracle=REPETITION_ORACLE, headline=True)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: distinct-word ratio +
    top-bigram dominance per document."""
    docs = Catalog(spark, sf_dir).documents
    return repetition_scores(docs, text_col="text", id_col="doc_id")


CHUNK_W, CHUNK_S = 32, 16

CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(trim(text), ' ') AS words,
         len(string_split(trim(text), ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, words, n,
         CASE WHEN n <= {CHUNK_W} THEN 1
              ELSE CAST(CEIL(CAST(n - {CHUNK_W} AS DOUBLE) / {CHUNK_S}) AS INT) + 1
         END AS n_chunks
  FROM w
)
SELECT doc_id,
       CAST(t.i AS INT) AS chunk_index,
       CAST(LEAST({CHUNK_W}, n - t.i * {CHUNK_S}) AS INT) AS chunk_tokens,
       md5(array_to_string(
             words[CAST(t.i * {CHUNK_S} + 1 AS INT) : CAST(t.i * {CHUNK_S} + {CHUNK_W} AS INT)],
             ' ')) AS chunk_md5
FROM c, UNNEST(range(0, n_chunks)) AS t(i)
"""


@query("doc_chunks", oracle=CHUNK_ORACLE)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token / stride-16 training windows per document
    (map-side explode, chunk identity as md5)."""
    docs = Catalog(spark, sf_dir).documents
    return chunk_documents(
        docs, text_col="text", id_col="doc_id", window=CHUNK_W, stride=CHUNK_S
    )


# per-language keep rates: en 25%, de 12.5%, fr 6.25%, es 3.125%
MIX_THRESHOLDS = {"en": "40", "de": "20", "fr": "10", "es": "08"}

MIX_ORACLE = """
SELECT lang,
       COUNT(*) AS kept_docs,
       SUM(n_chars) AS kept_chars
FROM documents
WHERE CASE lang
        WHEN 'en' THEN md5(CAST(doc_id AS VARCHAR)) < '40'
        WHEN 'de' THEN md5(CAST(doc_id AS VARCHAR)) < '20'
        WHEN 'fr' THEN md5(CAST(doc_id AS VARCHAR)) < '10'
        WHEN 'es' THEN md5(CAST(doc_id AS VARCHAR)) < '08'
        ELSE FALSE
      END
GROUP BY lang
"""


@query("corpus_mix_sample", oracle=MIX_ORACLE)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language corpus mixing: each language keeps its
    own md5-gated fraction (en 1/4 … es 1/32), summarized per language.
    The mix is reproducible under re-runs, repartitioning, and corpus
    growth — a pure per-row membership function."""
    docs = Catalog(spark, sf_dir).documents
    return (
        stratified_sample(docs, "lang", "doc_id", MIX_THRESHOLDS)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


SCRUB_ORACLE = f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{EMAIL_REGEX}')) AS n_emails,
  len(regexp_extract_all(text, '{PHONE_REGEX}')) AS n_phones,
  md5(regexp_replace(regexp_replace(text, '{EMAIL_REGEX}', '<EMAIL>', 'g'),
                     '{PHONE_REGEX}', '<PHONE>', 'g')) AS scrubbed_md5
FROM documents
"""


@query("scrub_pii", oracle=SCRUB_ORACLE)
def scrub_pii_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction with per-doc hit counts (compliance gate;
    scan-speed regex, no shuffle)."""
    docs = Catalog(spark, sf_dir).documents
    return scrub_pii(docs, text_col="text", id_col="doc_id")


PROBE_N = 8

DECONTAMINATE_ORACLE = f"""
WITH probes AS (
  SELECT array_to_string((string_split(trim(text), ' '))[1:{PROBE_N}], ' ') AS probe
  FROM documents WHERE doc_id < 3
),
grams AS (
  SELECT doc_id,
         array_to_string(w[CAST(t.i AS INT) : CAST(t.i AS INT) + {PROBE_N} - 1], ' ') AS gram
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       UNNEST(range(1, len(w) - {PROBE_N} + 2)) AS t(i)
)
SELECT g.doc_id, COUNT(DISTINCT p.probe) AS n_probe_hits
FROM grams g JOIN probes p ON g.gram = p.probe
GROUP BY g.doc_id
"""


@query("decontaminate", oracle=DECONTAMINATE_ORACLE, headline=True)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag documents containing any probe
    8-gram (here: the first 8 words of docs 0-2 stand in for an eval
    set). Broadcast hash join on exploded n-grams — one corpus pass
    regardless of probe count."""
    docs = Catalog(spark, sf_dir).documents
    probes = docs.where(F.col("doc_id") < 3).select(
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), " "), 1, PROBE_N)
        ).alias("probe")
    )
    return ngram_probe_hits(
        docs, probes, text_col="text", id_col="doc_id", n=PROBE_N
    )
