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
from pyspark.sql import DataFrame, SparkSession, Window

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
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
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


FUNNEL_ORACLE = """
WITH scored AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split(trim(text), ' ')) END AS n_words,
    CAST(len(list_distinct(string_split(lower(trim(text)), ' '))) AS DOUBLE)
      / CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE) AS dwr
  FROM documents
)
SELECT COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN n_words >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
       CAST(SUM(CASE WHEN n_words >= 20 AND dwr >= 0.30 THEN 1 ELSE 0 END) AS BIGINT) AS n_final
FROM scored
"""


@query("corpus_filter_funnel", oracle=FUNNEL_ORACLE)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning funnel report: how many documents survive each
    cumulative quality gate (length, then repetition). One scan-side
    conditional aggregation — the per-stage drop report every corpus
    pipeline publishes, with no extra passes over the data."""
    docs = Catalog(spark, sf_dir).documents
    t = F.trim(F.col("text"))
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " "))
    )
    low_words = F.split(F.lower(t), " ")
    dwr = F.size(F.array_distinct(low_words)).cast("double") / F.size(
        low_words
    ).cast("double")
    len_ok = n_words >= 20
    final_ok = len_ok & (dwr >= 0.30)
    return docs.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(len_ok.cast("bigint")).alias("n_len_ok"),
        F.sum(final_ok.cast("bigint")).alias("n_final"),
    )


TOP_DOCS_ORACLE = r"""
WITH scored AS (
  SELECT doc_id, lang,
    ROUND(
      0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE))
    + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
             / CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE))
    + 0.3 * least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) / 64.0, 1.0)
    , 6) AS quality_score
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, quality_score,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY quality_score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT lang, rank, doc_id, quality_score FROM ranked WHERE rank <= 5
"""


@query("top_docs_per_lang", oracle=TOP_DOCS_ORACLE)
def top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 documents by quality score (deterministic
    doc_id tie-break) — operator composition: quality scoring feeding a
    per-group top-k. Spark plans the rank-filter as WindowGroupLimit
    (per-partition partial top-k before the shuffle), so the exchange
    carries ≤ k rows per (lang, input partition), not the corpus."""
    from ..operators.text import quality_scores

    docs = Catalog(spark, sf_dir).documents
    scored = quality_scores(docs, text_col="text", id_col="doc_id", keep=("lang",))
    w = Window.partitionBy("lang").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("lang", "rank", "doc_id", "quality_score")
    )


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
    regardless of probe count.

    .. deprecated:: r11
        Prefer :func:`decontaminate_spans` for screening: the exact
        8-gram probe misses one-token-edited contamination that the
        winnow-based span probe catches (pytest-pinned in
        tests/test_training_ops.py). This exact form remains for
        byte-identical-leak audits, where a hit is proof, not signal.
    """
    docs = Catalog(spark, sf_dir).documents
    probes = docs.where(F.col("doc_id") < 3).select(
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), " "), 1, PROBE_N)
        ).alias("probe")
    )
    return ngram_probe_hits(
        docs, probes, text_col="text", id_col="doc_id", n=PROBE_N
    )


SPANS_DF_CAP = 50
SPANS_TOP_K = 20

DECONT_SPANS_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), t -> t <> '') AS tk
  FROM documents
),
base AS (SELECT doc_id, tk, len(tk) - 2 AS ng FROM toks WHERE len(tk) >= 6),
grams AS (
  SELECT doc_id, ng, i.i AS pos,
         CAST(('0x' || substr(
            md5(array_to_string(list_slice(tk, i.i, i.i + 2), ' ')), 1, 10))
          AS BIGINT) AS h
  FROM base, UNNEST(range(1, ng + 1)) AS i(i)
),
sel AS (
  SELECT DISTINCT doc_id,
         MIN(h * 1048576 + (1048575 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS s
  FROM grams
  QUALIFY pos <= ng - 3
),
fps AS (SELECT DISTINCT doc_id, s // 1048576 AS fp_hash FROM sel),
eval AS (SELECT doc_id AS eval_id, fp_hash FROM fps WHERE doc_id < 3),
surv AS (
  SELECT f.doc_id, f.fp_hash
  FROM fps f JOIN (SELECT DISTINCT fp_hash FROM eval) e USING (fp_hash)
),
hc AS (SELECT fp_hash FROM surv GROUP BY 1 HAVING COUNT(*) <= {cap}),
hits AS (
  SELECT s.doc_id, e.eval_id
  FROM surv s JOIN hc USING (fp_hash) JOIN eval e USING (fp_hash)
)
SELECT doc_id, eval_id, CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM hits
GROUP BY 1, 2
ORDER BY shared_fps DESC, doc_id, eval_id
LIMIT {k}
""".format(cap=SPANS_DF_CAP, k=SPANS_TOP_K)


@query("decontaminate_spans", oracle=DECONT_SPANS_ORACLE, headline=True)
def decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (fuzzy) decontamination — the winnowing upgrade of
    :func:`decontaminate`: a corpus document sharing ANY ≥ 6-token run
    with an eval item (docs 0-2 stand in for the eval set) collides on
    a winnowed fingerprint, so contamination survives edits that break
    the exact 8-gram probe (one changed token inside the probe window
    blinds ``ngram_probe_hits``; the MOSS guarantee has no such single
    point of failure — only spans shorter than w+k−1 escape).

    Scale: eval fingerprints BROADCAST (eval sets are KBs–MBs); the
    corpus is fingerprinted and probed in one pass — no corpus-wide
    shuffle before the join, and post-join rows ∝ contamination. The
    df-cap stop-gram guard (50) keeps an eval item quoting boilerplate
    from flagging the whole corpus; it is computed over join survivors
    (provably equal to the corpus df for surviving hashes), never as a
    corpus-wide frequency pass.
    """
    from ..operators.text import decontaminate_spans as _spans

    docs = Catalog(spark, sf_dir).documents
    eval_docs = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    out = _spans(docs, eval_docs, df_cap=SPANS_DF_CAP)
    return out.orderBy(
        F.col("shared_fps").desc(), "doc_id", "eval_id"
    ).limit(SPANS_TOP_K)


# Stored-index probe twin: the oracle replays the BUILD-time stop-gram
# cap (df over the FULL corpus fps <= cap), which keeps a superset of
# the inline form's survivor-cap for eval-matching hashes — identical
# join results, as the equivalence pytest also pins.
DECONT_STORE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), t -> t <> '') AS tk
  FROM documents
),
base AS (SELECT doc_id, tk, len(tk) - 2 AS ng FROM toks WHERE len(tk) >= 6),
grams AS (
  SELECT doc_id, ng, i.i AS pos,
         CAST(('0x' || substr(
            md5(array_to_string(list_slice(tk, i.i, i.i + 2), ' ')), 1, 10))
          AS BIGINT) AS h
  FROM base, UNNEST(range(1, ng + 1)) AS i(i)
),
sel AS (
  SELECT DISTINCT doc_id,
         MIN(h * 1048576 + (1048575 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS s
  FROM grams
  QUALIFY pos <= ng - 3
),
fps AS (SELECT DISTINCT doc_id, s // 1048576 AS fp_hash FROM sel),
capped AS (
  SELECT f.doc_id, f.fp_hash
  FROM fps f JOIN (
    SELECT fp_hash FROM fps GROUP BY 1 HAVING COUNT(*) <= {cap}
  ) k USING (fp_hash)
),
eval AS (SELECT doc_id AS eval_id, fp_hash FROM fps WHERE doc_id < 3)
SELECT c.doc_id, e.eval_id, CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM capped c JOIN eval e USING (fp_hash)
GROUP BY 1, 2
ORDER BY shared_fps DESC, doc_id, eval_id
LIMIT {k}
""".format(cap=SPANS_DF_CAP, k=SPANS_TOP_K)


@query("decontaminate_spans_store_probe", oracle=DECONT_STORE_ORACLE)
def decontaminate_spans_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REPEATED-USE decontamination path graded end-to-end: build
    the corpus winnow index as a bucketed catalog table (stop-gram
    df-cap paid once at build), probe the eval set's broadcast
    fingerprints against it — the same economics as bm25_store_probe:
    build-per-call dominates the graded wall, while the probe alone is
    one broadcast hash join over the stored relation, Exchange-free,
    with the corpus never re-fingerprinted across eval suites.
    """
    from ..operators.text import (
        decontaminate_spans_stored,
        winnow_store_bucketed,
    )
    from .storepaths import process_scoped_store_path

    docs = Catalog(spark, sf_dir).documents
    eval_docs = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    # process-scoped PATH (shared tmp, swept across dead harnesses) +
    # session-scoped table name (catalogs are per-process); the table
    # is left registered so the returned plan stays lazy — the next
    # call's write_bucketed_table replaces it
    winnow_store_bucketed(
        spark, docs, "decont_span_store", df_cap=SPANS_DF_CAP,
        path=process_scoped_store_path("decont_span_store", sf_dir),
    )
    out = decontaminate_spans_stored(spark, "decont_span_store", eval_docs)
    return out.orderBy(
        F.col("shared_fps").desc(), "doc_id", "eval_id"
    ).limit(SPANS_TOP_K)


DECONT_APPLY_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), t -> t <> '') AS tk
  FROM documents
),
base AS (SELECT doc_id, tk, len(tk) - 2 AS ng FROM toks WHERE len(tk) >= 6),
grams AS (
  SELECT doc_id, ng, i.i AS pos,
         CAST(('0x' || substr(
            md5(array_to_string(list_slice(tk, i.i, i.i + 2), ' ')), 1, 10))
          AS BIGINT) AS h
  FROM base, UNNEST(range(1, ng + 1)) AS i(i)
),
sel AS (
  SELECT DISTINCT doc_id,
         MIN(h * 1048576 + (1048575 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS s
  FROM grams
  QUALIFY pos <= ng - 3
),
fps AS (SELECT DISTINCT doc_id, s // 1048576 AS fp_hash FROM sel),
eval AS (SELECT doc_id AS eval_id, fp_hash FROM fps WHERE doc_id < 3),
surv AS (
  SELECT f.doc_id, f.fp_hash
  FROM fps f JOIN (SELECT DISTINCT fp_hash FROM eval) e USING (fp_hash)
),
hc AS (SELECT fp_hash FROM surv GROUP BY 1 HAVING COUNT(*) <= {cap}),
flagged AS (
  SELECT DISTINCT s.doc_id
  FROM surv s JOIN hc USING (fp_hash)
)
SELECT d.source AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(f.doc_id) AS BIGINT) AS n_flagged,
       CAST(COUNT(*) - COUNT(f.doc_id) AS BIGINT) AS n_surviving
FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
GROUP BY 1
""".format(cap=SPANS_DF_CAP)


@query("decontaminate_spans_apply", oracle=DECONT_APPLY_ORACLE)
def decontaminate_spans_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY form of span decontamination: per-source corpus
    census after dropping every document that shares a winnowed
    fingerprint span with the eval set — the funnel report a training
    pipeline publishes next to the drop itself (the surviving corpus
    is the same anti-join without the aggregate).

    Scale: everything up to the flagged set is the decontaminate_spans
    plan (one corpus fingerprint pass, broadcast eval probe); the
    census is one left-anti-shaped aggregate keyed on 8-byte doc ids.
    """
    from ..operators.text import decontaminate_spans as _spans

    docs = Catalog(spark, sf_dir).documents
    eval_docs = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    flagged = (
        _spans(docs, eval_docs, df_cap=SPANS_DF_CAP)
        .select("doc_id")
        .distinct()
    )
    return (
        docs.select("doc_id", "source")
        .join(flagged.withColumn("__f", F.lit(1)), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__f").alias("n_flagged"),
            (F.count(F.lit(1)) - F.count("__f")).alias("n_surviving"),
        )
    )


PACK_BUDGET = 256

PACK_ORACLE = f"""
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
),
chunks AS (
  SELECT doc_id,
         CAST(t.i AS INT) AS chunk_index,
         CAST(LEAST({CHUNK_W}, n - t.i * {CHUNK_S}) AS INT) AS chunk_tokens,
         md5(array_to_string(
               words[CAST(t.i * {CHUNK_S} + 1 AS INT) : CAST(t.i * {CHUNK_S} + {CHUNK_W} AS INT)],
               ' ')) AS chunk_md5
  FROM c, UNNEST(range(0, n_chunks)) AS t(i)
),
laid AS (
  SELECT substr(chunk_md5, 1, 1) AS shard, chunk_tokens,
         SUM(chunk_tokens) OVER (
           PARTITION BY substr(chunk_md5, 1, 1)
           ORDER BY chunk_md5, doc_id, chunk_index
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM chunks
)
SELECT shard,
       CAST(FLOOR((cum - chunk_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(chunk_tokens) AS BIGINT) AS seq_tokens
FROM laid
GROUP BY shard, seq_id
"""


@query("doc_pack_plan", oracle=PACK_ORACLE)
def doc_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan: lay chunks out in content-addressed (md5)
    order and draw a sequence boundary every 256 tokens — the example-prep
    step that turns variable-length chunks into fixed-budget training
    sequences. Prefix-sum packing instead of best-fit keeps it one window
    per md5 shard (16^k independent shards), and the md5 ordering doubles
    as the corpus shuffle."""
    from ..operators.text import pack_chunks

    docs = Catalog(spark, sf_dir).documents
    chunks = chunk_documents(
        docs, text_col="text", id_col="doc_id", window=CHUNK_W, stride=CHUNK_S
    )
    return pack_chunks(chunks, budget=PACK_BUDGET, shard_hex_chars=1)


TOKEN_DF_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, t.tok AS token
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+') AS arr
        FROM documents),
       UNNEST(arr) AS t(tok)
  WHERE t.tok <> ''
)
SELECT token, COUNT(*) AS doc_freq
FROM toks
GROUP BY token
ORDER BY doc_freq DESC, token ASC
LIMIT 50
"""


@query("token_doc_freq", oracle=TOKEN_DF_ORACLE)
def token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary report: top-50 tokens by document frequency.

    Scale: tokens are distinct-ed INSIDE each document before the explode
    (array_distinct — map-side, no Expand), so the shuffle carries at most
    one row per (doc, term); partial aggregation then collapses the
    stopword skew per partition before the exchange, and the final top-50
    plans as TakeOrderedAndProject (no global sort)."""
    docs = Catalog(spark, sf_dir).documents
    toks = docs.select(
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), "[^a-z0-9]+"))
        ).alias("token")
    ).where(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("token").asc())
        .limit(50)
    )


CLASSIFIER_ORACLE = """
WITH toks AS (
  SELECT doc_id, t.tok AS token
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+') AS arr
        FROM documents),
       UNNEST(arr) AS t(tok)
  WHERE t.tok <> ''
),
weighted AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(token), 1, 3)) AS INT) % 61 AS DOUBLE)
           / 30.0 - 1.0 AS w
  FROM toks
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(1.0 / (1.0 + EXP(-4.0 * AVG(w))), 6) AS quality_prob
FROM weighted
GROUP BY doc_id
"""


@query("quality_classifier_score", oracle=CLASSIFIER_ORACLE)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words linear classifier (frozen stand-in weights)
    scoring every document — the model-based quality gate of a corpus
    pipeline, with the learned-weight swap point left as a broadcast
    join."""
    from ..operators.text import classifier_scores

    docs = Catalog(spark, sf_dir).documents
    return classifier_scores(docs, text_col="text", id_col="doc_id")


SPAN_DUP_ORACLE = f"""
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
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(
               words[CAST(t.i * {CHUNK_S} + 1 AS INT) : CAST(t.i * {CHUNK_S} + {CHUNK_W} AS INT)],
               ' ')) AS chunk_md5
  FROM c, UNNEST(range(0, n_chunks)) AS t(i)
)
SELECT chunk_md5,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences
FROM chunks
GROUP BY chunk_md5
HAVING COUNT(DISTINCT doc_id) >= 2
"""


@query("chunk_span_dups", oracle=SPAN_DUP_ORACLE)
def chunk_span_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: token windows whose md5 appears in
    ≥2 documents — the boilerplate/template detector that feeds span-level
    (rather than whole-document) dedup.

    Scale: rides the map-only chunker; the shuffle key is the 16-byte
    chunk hash and partial aggregation collapses within-partition repeats
    first. The HAVING prunes to the (rare) repeated spans before any
    downstream use."""
    docs = Catalog(spark, sf_dir).documents
    chunks = chunk_documents(
        docs, text_col="text", id_col="doc_id", window=CHUNK_W, stride=CHUNK_S
    )
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
    )


# Budgets straddle the per-source supply at every local SF (25 docs ×
# ~100 tokens per source at sf0.01, ~10× either way at the neighbors):
# src0 is cut mid-bucket at all SFs, src1 exhausts below budget at the
# small SFs, src2's zero budget keeps nothing, src5 is cut deep.
MIX_BUDGETS = {"src0": 800, "src1": 2500, "src2": 0, "src5": 5000}

TOKEN_BUDGET_MIX_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source,
    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
      AS tokens,
    md5('mix:' || CAST(doc_id AS VARCHAR)) AS okey
  FROM documents
  WHERE source IN ('src0', 'src1', 'src2', 'src5')
),
b (source, budget) AS (
  VALUES ('src0', 800), ('src1', 2500), ('src2', 0), ('src5', 5000)
),
c AS (
  SELECT d.doc_id, d.source, d.tokens, b.budget,
    SUM(d.tokens) OVER (PARTITION BY d.source ORDER BY d.okey, d.doc_id)
      - d.tokens AS pre
  FROM d JOIN b ON b.source = d.source
)
SELECT doc_id, source, tokens FROM c WHERE pre < budget
"""


@query("token_budget_mix", oracle=TOKEN_BUDGET_MIX_ORACLE)
def token_budget_mix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction by TOKEN BUDGET: per source, keep
    documents in deterministic md5 order until the budget is filled
    (the crossing document included — coverage ≥ budget when supply
    suffices). The rate-based mix (`corpus_mix_sample`) answers "keep
    X% of each source"; this answers the question a data-mixing recipe
    actually states — "N billion tokens of web, M of books".

    Scale: NOT a per-source running-sum window (that serializes a 10 TB
    source through one task). Selection is split on the order key's hex
    prefix: a sources × 256 bucket-sum aggregate is prefix-summed
    driver-side, whole buckets pass/drop at the scan, and only the one
    BOUNDARY bucket per source — 1/256 of it — runs the window (see
    ``operators/sampling.py:token_budget_mix``).
    """
    from ..operators.sampling import token_budget_mix

    docs = Catalog(spark, sf_dir).documents
    return token_budget_mix(docs, MIX_BUDGETS)


BIGRAM_LM_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents
),
v AS (SELECT COUNT(DISTINCT u.w) AS vocab FROM w, UNNEST(w.ws) AS u(w)),
bg AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15) AS BIGINT) AS bgh,
    CAST('0x' || substr(md5(ws[i]), 1, 15) AS BIGINT) AS ctxh
  FROM w, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
),
cb AS (SELECT bgh, COUNT(*) AS c FROM bg GROUP BY bgh),
cc AS (SELECT ctxh, COUNT(*) AS c FROM bg GROUP BY ctxh),
m AS (
  SELECT bg.doc_id,
    CAST(ROUND(log2((cb.c + 1.0) / (cc.c + 1.0 * (SELECT vocab FROM v)))
               * 1000000.0, 0) AS BIGINT) AS milli
  FROM bg JOIN cb USING (bgh) JOIN cc USING (ctxh)
)
SELECT doc_id, COUNT(*) AS n_bigrams,
  ROUND(CAST(SUM(milli) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS avg_log2p
FROM m GROUP BY doc_id
"""


@query("bigram_lm_score", oracle=BIGRAM_LM_ORACLE)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM quality scoring — the KenLM/CCNet
    perplexity-filter stage: add-1-smoothed bigram conditionals trained
    on the corpus itself, every document scored by mean
    log2 P(w_i | w_{i-1}).

    Determinism contract: per-bigram logp = one division + log2 over
    EXACT integer counts, immediately integer-scaled (round(logp·10⁶));
    per-doc totals are integer sums — no double ever crosses an
    unordered aggregate, so both engines land on identical 6-dp
    values. Joins ride 60-bit md5-prefix keys (8-byte shuffle rows;
    collisions merge counts identically cross-engine).
    """
    from ..operators.text import bigram_lm_scores

    docs = Catalog(spark, sf_dir).documents
    return bigram_lm_scores(docs)


CONTAMINATION_ORACLE = """
WITH toks AS (
  SELECT source, string_split(lower(trim(text)), ' ') AS ws FROM documents
),
fp AS (
  SELECT DISTINCT source,
    CAST('0x' || substr(
      md5(list_aggregate(ws[i : i+7], 'string_agg', ' ')), 1, 15) AS BIGINT)
      AS h
  FROM toks, UNNEST(range(1, len(ws) - 6)) t(i)
  WHERE len(ws) >= 8
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS shared_ngrams
FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
"""


@query("source_contamination_matrix", oracle=CONTAMINATION_ORACLE)
def source_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source span-level contamination: distinct shared 8-grams
    per source pair. Exact-dup matrices are empty on curated corpora
    (verified on this one); span overlap is where recycling shows —
    the diagnostic that decides which source pair needs cross-source
    dedup before mixing. Corpus collapses to distinct (source, gram
    hash) before the hash-keyed self-join, so per-hash fanout is
    bounded by the source count."""
    from ..operators.text import source_ngram_overlap

    return source_ngram_overlap(Catalog(spark, sf_dir).documents, n=8)


LM_PROBE_DOCS = 20
LM_OOV_TEXT = "zzqa zzqb zzqa zzqc"  # every bigram + context unseen

BIGRAM_LM_STORE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents
),
v AS (SELECT COUNT(DISTINCT u.w) AS vocab FROM w, UNNEST(w.ws) AS u(w)),
cbg AS (
  SELECT CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15) AS BIGINT)
           AS bgh,
         CAST('0x' || substr(md5(ws[i]), 1, 15) AS BIGINT) AS ctxh
  FROM w, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
),
cb AS (SELECT bgh, COUNT(*) AS c FROM cbg GROUP BY bgh),
cc AS (SELECT ctxh, COUNT(*) AS c FROM cbg GROUP BY ctxh),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {LM_PROBE_DOCS}
  UNION ALL SELECT -1 AS doc_id, '{LM_OOV_TEXT}' AS text
),
bw AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM batch
),
bbg AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15) AS BIGINT) AS bgh,
    CAST('0x' || substr(md5(ws[i]), 1, 15) AS BIGINT) AS ctxh
  FROM bw, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
),
m AS (
  SELECT b.doc_id,
    CAST(ROUND(log2(
      (COALESCE(cb.c, 0) + 1.0)
      / (COALESCE(cc.c, 0) + 1.0 * (SELECT vocab FROM v))
    ) * 1000000.0, 0) AS BIGINT) AS milli
  FROM bbg b
  LEFT JOIN cb ON cb.bgh = b.bgh
  LEFT JOIN cc ON cc.ctxh = b.ctxh
)
SELECT doc_id, COUNT(*) AS n_bigrams,
  ROUND(CAST(SUM(milli) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS avg_log2p
FROM m GROUP BY doc_id
"""


@query("bigram_lm_store_probe", oracle=BIGRAM_LM_STORE_ORACLE)
def bigram_lm_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-LM form graded end-to-end: train the bigram LM on
    the corpus (three exact-integer relations on disk), then score an
    ingest batch — the first 20 corpus docs PLUS a literal all-OOV doc
    — against the STORE. The OOV doc takes the LEFT-join/COALESCE
    branch the self-scoring query (`bigram_lm_score`) can never reach:
    every bigram backs off to the add-1 floor log2(1/V). Build+probe
    per call so the graded query covers the whole cycle; production
    amortizes the build over every batch (`build_bigram_lm_store` /
    `bigram_lm_score_from_store`).
    """
    from ..operators.text import (
        bigram_lm_score_from_store,
        build_bigram_lm_store,
    )
    from .storepaths import process_scoped_store_path

    docs = Catalog(spark, sf_dir).documents
    store = process_scoped_store_path("bigram_lm_store", sf_dir)
    build_bigram_lm_store(docs, store)
    batch = (
        docs.where(F.col("doc_id") < LM_PROBE_DOCS)
        .select("doc_id", "text")
        .unionByName(
            docs.sparkSession.createDataFrame(
                [(-1, LM_OOV_TEXT)], "doc_id long, text string"
            )
        )
    )
    return bigram_lm_score_from_store(spark, store, batch)


EVAL_SAMPLE_K = 5

EVAL_SAMPLE_ORACLE = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY md5('gk:' || CAST(doc_id AS VARCHAR)), doc_id
    ) AS rk
  FROM documents
) WHERE rk <= {EVAL_SAMPLE_K}
"""


@query("eval_sample_per_source", oracle=EVAL_SAMPLE_ORACLE)
def eval_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample (k=5 per source) — the
    human-eval draw. Rate sampling (`sample_documents`) can't hit a
    fixed per-group budget; rank-in-hash-order can, and Spark lowers
    the rank ≤ k filter to a per-partition WindowGroupLimit BELOW the
    exchange, so at most k rows per (group, task) ever shuffle."""
    from ..operators.sampling import per_group_sample_k

    docs = Catalog(spark, sf_dir).documents
    return per_group_sample_k(docs, "source", "doc_id", EVAL_SAMPLE_K).select(
        "doc_id", "source"
    )


# train/val/test hex boundaries: ~95.7% / ~2.0% / ~2.3% of md5 space
SPLIT_BOUNDS = (("train", "f5"), ("val", "fa"), ("test", None))

CORPUS_SPLIT_ORACLE = """
WITH labeled AS (
  SELECT source, n_chars,
    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'f5' THEN 'train'
         WHEN md5(CAST(doc_id AS VARCHAR)) < 'fa' THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT split, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum
FROM labeled
GROUP BY split, source
"""


@query("corpus_split_counts", oracle=CORPUS_SPLIT_ORACLE)
def corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split scoreboard — docs and chars
    per (split, source). The split label is a pure function of the doc
    id (``hash_split``), so the assignment survives re-runs, layout
    changes, and corpus growth; the scoreboard is what a release
    checklist reads to confirm val/test didn't starve on any source.

    Scale: label is a scan-side CASE over one md5 (no shuffle); the
    groupBy keys are (3 splits × sources) — map-side partials collapse
    each task to that constant before the exchange.
    """
    from ..operators.sampling import hash_split

    docs = Catalog(spark, sf_dir).documents
    return hash_split(docs, "doc_id", SPLIT_BOUNDS).groupBy(
        "split", "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_sum"),
    )


LEAKAGE_SAFE_SPLIT_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(string_split(text, ' ')[1:4], ' ')) AS fp
  FROM documents
),
reps AS (
  SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp
),
lab AS (
  SELECT f.doc_id, f.fp,
    CASE WHEN md5(CAST(r.rep AS VARCHAR)) < 'f5' THEN 'train'
         WHEN md5(CAST(r.rep AS VARCHAR)) < 'fa' THEN 'val'
         ELSE 'test' END AS split,
    CASE WHEN md5(CAST(f.doc_id AS VARCHAR)) < 'f5' THEN 'train'
         WHEN md5(CAST(f.doc_id AS VARCHAR)) < 'fa' THEN 'val'
         ELSE 'test' END AS naive
  FROM fp f JOIN reps r USING (fp)
)
SELECT split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT fp) AS n_groups,
       CAST(SUM(CASE WHEN naive <> split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rerouted
FROM lab GROUP BY split
"""


@query("leakage_safe_split", oracle=LEAKAGE_SAFE_SPLIT_ORACLE)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage fix: assign train/val/test by the hash of each
    content GROUP's representative, not the doc's own id — so related
    documents can never straddle splits (the classic corpus bug: a test
    doc whose near-duplicate sits in train). The group key here is an
    opening-shingle fingerprint (md5 of the first 4 tokens — a cheap
    boilerplate-family proxy that actually groups this corpus at every
    SF; substitute any cluster relation, e.g. `dedup_clusters` output,
    for production near-dup semantics). Scoreboard per split: docs,
    groups, and how many docs the group-keyed split re-routed relative
    to the naive per-doc split (nonzero exactly when leakage WOULD have
    happened). The no-straddle invariant itself is pytest-asserted
    group-by-group.

    Scale: fingerprints are scan-side; the groupBy-MIN and the
    fp-equality join share one 16-byte-key shuffle layout (text never
    moves); both split labels are scan-side CASEs over md5.
    """
    from ..operators.sampling import hash_split

    docs = Catalog(spark, sf_dir).documents
    fp = docs.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 4), " "
            ).cast("binary")
        ).alias("fp"),
    )
    reps = fp.groupBy("fp").agg(F.min("doc_id").alias("rep"))
    lab = fp.join(reps, "fp")
    lab = hash_split(lab, "rep", SPLIT_BOUNDS, label_col="split")
    lab = hash_split(lab, "doc_id", SPLIT_BOUNDS, label_col="naive")
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_groups"),
        F.sum((F.col("naive") != F.col("split")).cast("long")).alias(
            "n_rerouted"
        ),
    )


# --------------------------------------------------------------------------
# temperature-weighted source mixing (the multilingual-LM sampling recipe)
# --------------------------------------------------------------------------

MIX_ALPHA = 0.3  # the mT5/XLM-R default temperature

TEMPERATURE_MIX_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, source,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tokens
  FROM documents
),
tot AS (
  SELECT source, CAST(SUM(tokens) AS BIGINT) AS tokens_total FROM toks GROUP BY source
),
w AS (
  SELECT source, tokens_total,
         POW(CAST(tokens_total AS DOUBLE)
             / SUM(CAST(tokens_total AS DOUBLE)) OVER (),
             {MIX_ALPHA} - 1.0) AS wgt
  FROM tot
),
r AS (
  SELECT source, tokens_total, ROUND(wgt / MAX(wgt) OVER (), 6) AS rate
  FROM w
),
kept AS (
  SELECT t.source, t.tokens
  FROM toks t JOIN r USING (source)
  WHERE CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        < CAST(FLOOR(r.rate * 1152921504606846976.0) AS BIGINT)
)
SELECT r.source, r.tokens_total, r.rate,
       COUNT(*) AS docs_kept,
       CAST(SUM(k.tokens) AS BIGINT) AS tokens_kept
FROM kept k JOIN r USING (source)
GROUP BY r.source, r.tokens_total, r.rate
"""


@query("temperature_mix_report", oracle=TEMPERATURE_MIX_ORACLE)
def temperature_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing at alpha=0.3 (the mT5/XLM-R
    recipe): per-source keep rates ∝ share^(alpha-1) so kept tokens
    follow share^alpha — low-resource sources upweighted, membership a
    deterministic md5 gate. The scoreboard (rates, kept docs/tokens
    per source) is the audit artifact a mixing run publishes.

    Oracle is SF-adaptive: DuckDB recomputes the shares, the POW
    weights, and the 6-dp rates from its own token sums — one static
    string valid at every SF; the 60-bit md5-prefix gate replays with
    FLOOR (Python int() truncates where SQL CAST rounds).
    """
    from ..operators.sampling import temperature_mix

    docs = Catalog(spark, sf_dir).documents
    return temperature_mix(docs, alpha=MIX_ALPHA)


# --------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis top-k)
# --------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 10

WEIGHTED_SAMPLE_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, source,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tokens
  FROM documents
),
k AS (
  SELECT doc_id, source, tokens,
         ROUND(POW(
           CAST(CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
                                    1, 15) AS BIGINT) AS DOUBLE)
           / 1152921504606846976.0,
           1.0 / CAST(tokens AS DOUBLE)), 12) AS sample_key
  FROM t WHERE tokens > 0
)
SELECT source, doc_id, tokens, sample_key
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY sample_key DESC, doc_id ASC) AS rk
  FROM k
) WHERE rk <= {WEIGHTED_SAMPLE_K}
"""


@query("weighted_sample_per_source", oracle=WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted sample of 10 docs per source WITHOUT replacement
    (Efraimidis-Spirakis u^(1/w) top-k): longer documents are
    proportionally likelier, membership is a pure function of the
    corpus — the draw a curation pipeline uses when "uniform by doc"
    over-represents short documents' text distribution.

    Scale: rank ≤ k lowers to WindowGroupLimit below the exchange —
    at most k rows per (source, task) shuffle; the md5 draw and the
    POW key are scan-side codegen expressions.
    """
    from ..operators.sampling import weighted_sample_k
    from ..operators.text import _ws_token_count

    docs = Catalog(spark, sf_dir).documents
    base = docs.select(
        "doc_id",
        "source",
        _ws_token_count(F.col("text")).cast("bigint").alias("tokens"),
    )
    return weighted_sample_k(
        base, "source", "doc_id", F.col("tokens"), WEIGHTED_SAMPLE_K
    ).select("source", "doc_id", "tokens", "sample_key")


# --------------------------------------------------------------------------
# classifier calibration: heuristic quality by model-score decile
# --------------------------------------------------------------------------

_DEC_EDGES = "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]"

CALIBRATION_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, t.tok AS token
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+') AS arr
        FROM documents),
       UNNEST(arr) AS t(tok)
  WHERE t.tok <> ''
),
weighted AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(token), 1, 3)) AS INT) % 61 AS DOUBLE)
           / 30.0 - 1.0 AS w
  FROM toks
),
cls AS (
  SELECT doc_id, ROUND(1.0 / (1.0 + EXP(-4.0 * AVG(w))), 6) AS prob
  FROM weighted GROUP BY doc_id
),
q AS (
  SELECT doc_id,
    ROUND(
      0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE))
    + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
             / CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE))
    + 0.3 * least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) / 64.0, 1.0)
    , 6) AS quality_score
  FROM documents
),
e AS (
  SELECT list_transform(quantile_cont(prob, {_DEC_EDGES}),
                        x -> round(x, 6)) AS ed
  FROM cls
),
b AS (
  SELECT c.prob, q.quality_score,
         1 + (CASE WHEN c.prob >= ed[1] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[2] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[3] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[4] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[5] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[6] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[7] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[8] THEN 1 ELSE 0 END)
           + (CASE WHEN c.prob >= ed[9] THEN 1 ELSE 0 END) AS decile
  FROM cls c JOIN q USING (doc_id), e
)
SELECT decile,
       COUNT(*) AS n_docs,
       ROUND(CAST(CAST(SUM(CAST(ROUND(prob * 1000000.0, 0) AS BIGINT))
                  AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS mean_prob,
       ROUND(CAST(CAST(SUM(CAST(ROUND(quality_score * 1000000.0, 0) AS BIGINT))
                  AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS mean_quality
FROM b GROUP BY decile
"""


@query("classifier_calibration", oracle=CALIBRATION_ORACLE)
def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration table: documents binned into model-score
    deciles (exact interpolated percentile edges of the classifier's
    quality_prob), each decile reporting mean model score vs mean
    HEURISTIC quality — the eval artifact that answers "is the learned
    gate monotone against the rule-based one, and where does it
    disagree" before a filtering threshold ships.

    Determinism: both means accumulate 1e6-scaled BIGINTs of the
    already-6-dp scores (exact, order-free — the bigram-LM pattern),
    divided out in one fixed-order double expression; decile edges are
    6-dp-rounded percentiles broadcast as a 1-row relation (the
    doc_length_deciles shape — never a global NTILE window).

    Scale: the classifier leg is the explode + map-side-collapsed
    doc aggregate it always is; the heuristic leg is scan-side; the
    doc_id join shuffles doc-sized score pairs (16 B/row), and the
    final groupBy collapses to ≤ 10 rows per task map-side.
    """
    from ..operators.text import classifier_scores, quality_scores

    docs = Catalog(spark, sf_dir).documents
    cls = classifier_scores(docs, "text", "doc_id").select(
        "doc_id", F.col("quality_prob").alias("prob")
    )
    q = quality_scores(docs, "text", "doc_id").select("doc_id", "quality_score")
    edges = cls.agg(
        F.expr(
            f"transform(percentile(prob, array({_DEC_EDGES[1:-1]})),"
            " x -> round(x, 6))"
        ).alias("ed")
    )
    j = cls.join(q, "doc_id").crossJoin(F.broadcast(edges))
    dec = F.lit(1)
    for i in range(1, 10):
        dec = dec + (F.col("prob") >= F.element_at("ed", i)).cast("int")
    scaled = lambda c: F.round(F.col(c) * 1e6, 0).cast("bigint")  # noqa: E731
    return (
        j.select(dec.alias("decile"), scaled("prob").alias("ps"),
                 scaled("quality_score").alias("qs"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("ps").cast("double") / F.lit(1e6) / F.count(F.lit(1)), 6
            ).alias("mean_prob"),
            F.round(
                F.sum("qs").cast("double") / F.lit(1e6) / F.count(F.lit(1)), 6
            ).alias("mean_quality"),
        )
    )


# --------------------------------------------------------------------------
# trigram LM with stupid backoff — the order-3 upgrade of the stored
# bigram gate (VERDICT r7 #7)
# --------------------------------------------------------------------------

TRIGRAM_OOV_TEXT = "zzqa zzqb zzqa zzqc zzqd"  # every trigram fully OOV

TRIGRAM_LM_STORE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents
),
st AS (
  SELECT COUNT(u.w) AS n_tokens, COUNT(DISTINCT u.w) AS vocab
  FROM w, UNNEST(w.ws) AS u(w)
),
ctg AS (
  SELECT CAST('0x' || substr(
           md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15) AS BIGINT)
         AS tgh
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
c3 AS (SELECT tgh, COUNT(*) AS c3 FROM ctg GROUP BY tgh),
cbg AS (
  SELECT CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15) AS BIGINT)
           AS bgh
  FROM w, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
),
c2 AS (SELECT bgh, COUNT(*) AS c2 FROM cbg GROUP BY bgh),
cug AS (
  SELECT CAST('0x' || substr(md5(u.w), 1, 15) AS BIGINT) AS ugh
  FROM w, UNNEST(w.ws) AS u(w)
),
c1 AS (SELECT ugh, COUNT(*) AS c1 FROM cug GROUP BY ugh),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {LM_PROBE_DOCS}
  UNION ALL SELECT -1 AS doc_id, '{TRIGRAM_OOV_TEXT}' AS text
  UNION ALL SELECT -2 AS doc_id, 'zzqa ' || text AS text
             FROM documents WHERE doc_id = 0
),
bw AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM batch
),
btg AS (
  SELECT doc_id,
    CAST('0x' || substr(
      md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15) AS BIGINT)
      AS tgh,
    CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15) AS BIGINT)
      AS c12h,
    CAST('0x' || substr(md5(ws[i+1] || ' ' || ws[i+2]), 1, 15) AS BIGINT)
      AS b23h,
    CAST('0x' || substr(md5(ws[i+1]), 1, 15) AS BIGINT) AS c2h,
    CAST('0x' || substr(md5(ws[i+2]), 1, 15) AS BIGINT) AS w3h
  FROM bw, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
m AS (
  SELECT b.doc_id,
    COALESCE(t3.c3, 0) AS c3, COALESCE(p12.c2, 0) AS c12,
    COALESCE(p23.c2, 0) AS c23, COALESCE(u2.c1, 0) AS cw2,
    COALESCE(u3.c1, 0) AS cw3
  FROM btg b
  LEFT JOIN c3 t3 ON t3.tgh = b.tgh
  LEFT JOIN c2 p12 ON p12.bgh = b.c12h
  LEFT JOIN c2 p23 ON p23.bgh = b.b23h
  LEFT JOIN c1 u2 ON u2.ugh = b.c2h
  LEFT JOIN c1 u3 ON u3.ugh = b.w3h
),
sc AS (
  SELECT doc_id,
    CASE WHEN c3 > 0 THEN 3 WHEN c23 > 0 THEN 2 ELSE 1 END AS br,
    CAST(ROUND(
      CASE
        WHEN c3 > 0 THEN log2(CAST(c3 AS DOUBLE) / CAST(c12 AS DOUBLE))
        WHEN c23 > 0 THEN log2(0.4 * (CAST(c23 AS DOUBLE)
                                      / CAST(cw2 AS DOUBLE)))
        ELSE log2(0.16000000000000003 * ((CAST(cw3 AS DOUBLE) + 1.0)
             / CAST((SELECT n_tokens + vocab FROM st) AS DOUBLE)))
      END * 1000000.0, 0) AS BIGINT) AS milli
  FROM m
)
SELECT doc_id,
  COUNT(*) AS n_trigrams,
  CAST(SUM(CASE WHEN br = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits3,
  CAST(SUM(CASE WHEN br = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff2,
  CAST(SUM(CASE WHEN br = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_floor,
  ROUND(CAST(SUM(milli) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS avg_log2p
FROM sc GROUP BY doc_id
"""


@query("trigram_lm_store_probe", oracle=TRIGRAM_LM_STORE_ORACLE)
def trigram_lm_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram LM with stupid backoff (Brants et al. 2007), stored and
    probed end to end — the order-3 upgrade of `bigram_lm_store_probe`
    and the honest distributed step toward the CCNet-style 5-gram KenLM
    gate. The probe batch exercises EVERY branch: the first 20 corpus
    docs hit the trigram conditional (self-trained, every trigram
    stored), a literal all-OOV doc (-1) takes the α²·add-1 unigram
    floor, and doc 0 prefixed with one OOV token (-2) forces exactly
    one α·bigram backoff (trigram 'zzqa w1 w2' unseen, bigram 'w1 w2'
    seen) with the rest trigram hits — the per-doc branch counts
    (n_hits3/n_backoff2/n_floor) make the routing itself graded.

    Determinism: every branch is one fixed-operand-order double
    expression over exact integer counts, integer-scaled per trigram
    (round·10⁶ → BIGINT) before the order-free per-doc sum (the bigram
    family's contract, one order up — α² is spelled 0.4*0.4's exact
    double 0.16000000000000003 in BOTH engines).

    Scale: build = three hash-keyed map-side-combined counts + one
    scalar row, each hash-sorted for row-group pruning; probe =
    broadcast batch against five count relations; nothing grows with
    batch count. Build+probe per call (graded-cycle convention).
    """
    from ..operators.text import (
        build_trigram_lm_store,
        trigram_lm_score_from_store,
    )
    from .storepaths import process_scoped_store_path

    docs = Catalog(spark, sf_dir).documents
    store = process_scoped_store_path("trigram_lm_store", sf_dir)
    build_trigram_lm_store(docs, store)
    batch = (
        docs.where(F.col("doc_id") < LM_PROBE_DOCS)
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(
                [(-1, TRIGRAM_OOV_TEXT)], "doc_id long, text string"
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") == 0).select(
                F.lit(-2).cast("long").alias("doc_id"),
                F.concat(F.lit("zzqa "), F.col("text")).alias("text"),
            )
        )
    )
    return trigram_lm_score_from_store(spark, store, batch)


# ---------------------------------------------------------------------------
# BPE tokenizer training (operators/text.py bpe_train) — an 8-round
# iterative vocabulary build replayed EXACTLY by the oracle as unrolled
# MATERIALIZED CTEs (inlined CTEs would re-expand the round chain
# exponentially — each round references the previous one several
# times; MATERIALIZED keeps the oracle linear in rounds, the same
# reason the PageRank oracle stays 3 rounds deep but this one can
# afford 8). Merge application is a literal space-padded replace —
# byte-identical semantics in Spark and DuckDB (left-to-right,
# non-overlapping, scan resumes after the replacement).
# ---------------------------------------------------------------------------

BPE_ROUNDS = 8


def _bpe_round_sql(r: int, px: str = "") -> str:
    prev = f"{px}s{r - 1}"
    return f"""
{px}p{r} AS MATERIALIZED (
  SELECT pr.a AS a, pr.b AS b, SUM(freq) AS pc
  FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(l)),
                  i -> struct_pack(a := l[i], b := l[i + 1]))) AS pr
    FROM (SELECT freq, string_split(state, ' ') AS l FROM {prev})
  )
  GROUP BY 1, 2
),
{px}m{r} AS MATERIALIZED (SELECT a, b, pc FROM {px}p{r} ORDER BY pc DESC, a, b LIMIT 1),
{px}s{r} AS MATERIALIZED (
  SELECT word, freq,
         trim(COALESCE(replace(' ' || state || ' ',
              ' ' || (SELECT a FROM {px}m{r}) || ' ' || (SELECT b FROM {px}m{r}) || ' ',
              ' ' || (SELECT a FROM {px}m{r}) || (SELECT b FROM {px}m{r}) || ' '),
              state)) AS state
  FROM {prev}
)"""


def _bpe_cte_block(px: str = "", doc_filter: str = "") -> str:
    """The wc/s0/round CTE chain with every CTE name prefixed ``px``
    (so two independent trainings can share one WITH) and an optional
    WHERE clause on the documents scan."""
    return f"""{px}wc AS MATERIALIZED (
  SELECT tok AS word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents
    {doc_filter}
  ) WHERE tok <> '' GROUP BY 1
),
{px}s0 AS MATERIALIZED (
  SELECT word, freq, rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS state
  FROM {px}wc
),{",".join(_bpe_round_sql(r, px) for r in range(1, BPE_ROUNDS + 1))}"""


_BPE_CTES = "\nWITH " + _bpe_cte_block() + "\n"

BPE_MERGES_ORACLE = _BPE_CTES + " UNION ALL ".join(
    f"SELECT {r} AS merge_round, a AS sym_a, b AS sym_b,"
    f" CAST(pc AS BIGINT) AS pair_count FROM m{r}"
    for r in range(1, BPE_ROUNDS + 1)
)

BPE_VOCAB_ORACLE = _BPE_CTES + f"""
SELECT tok AS token, CAST(SUM(freq) AS BIGINT) AS corpus_count,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
FROM (SELECT word, freq, unnest(string_split(state, ' ')) AS tok FROM s{BPE_ROUNDS})
GROUP BY 1 ORDER BY corpus_count DESC, token LIMIT 20
"""


def _bpe_trained(spark: SparkSession, sf_dir: str):
    from ..caching import scoped_persist
    from ..operators.text import bpe_train, word_counts

    docs = Catalog(spark, sf_dir).documents
    wc = scoped_persist(word_counts(docs))
    return bpe_train(wc, BPE_ROUNDS)


@query("bpe_train_merges", oracle=BPE_MERGES_ORACLE)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: round, symbol pair, exact weighted pair
    count. K rows assembled from K one-row control-plane argmax
    collects (the per-round scalar handoff — the corpus never crosses
    the driver; the word dictionary never does either).

    Scale: ONE corpus-sized shuffle total (word_counts, map-side
    combined); each of the 8 rounds is a dictionary-sized integer-sum
    shuffle. At 100 TB the dictionary is Heaps-law sub-linear and the
    round cost is independent of corpus growth past it — measured flat
    vs corpus in the 100x slope row.
    """
    merges, _ = _bpe_trained(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_round int, sym_a string, sym_b string, pair_count bigint"
    )


@query("bpe_vocab_top", oracle=BPE_VOCAB_ORACLE)
def bpe_vocab_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens under the trained 8-merge BPE vocabulary —
    the fully distributed consumer of the merge table: the final
    segmentation state is a lazy chain of 8 literal replaces over the
    persisted dictionary, exploded and re-aggregated with exact
    integer weights. A wrong merge at ANY round changes this table, so
    the oracle transitively pins the whole training loop.
    """
    _, state = _bpe_trained(spark, sf_dir)
    return (
        state.select("word", "freq", F.explode(F.split("state", " ")).alias("token"))
        .groupBy("token")
        .agg(
            F.sum("freq").alias("corpus_count"),
            F.count_distinct("word").alias("n_words"),
        )
        .orderBy(F.desc("corpus_count"), "token")
        .limit(20)
    )


BPE_TOKEN_COUNT_ORACLE = _BPE_CTES + f"""
, seg AS MATERIALIZED (
  SELECT word, len(string_split(state, ' ')) AS n_syms FROM s{BPE_ROUNDS}
)
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(seg.n_syms) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(seg.n_syms) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS tokens_per_word
FROM (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word FROM documents
) d JOIN seg USING (word)
WHERE d.word <> ''
GROUP BY 1
"""


@query("bpe_token_count", oracle=BPE_TOKEN_COUNT_ORACLE)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE vocabulary back to the corpus: per-document
    token counts under the 8-merge tokenizer (the number that actually
    feeds token budgets once the tokenizer is learned, closing the
    train -> apply loop next to token_budget_mix's whitespace counts).

    Scale: the trained segmentation is a DICTIONARY-sized relation
    (word -> symbol count) broadcast to the corpus-side word explode —
    the corpus never shuffles by word; the only wide exchange is the
    doc-keyed count, map-side combined because explode keeps a doc's
    words in one partition. At a real corpus the dictionary is
    Heaps-law sub-linear; at the replica-scaled rehearsal it grows
    100x and the broadcast still holds (measured row).
    """
    docs = Catalog(spark, sf_dir).documents
    _, state = _bpe_trained(spark, sf_dir)
    seg = state.select(
        "word", F.size(F.split("state", " ")).alias("n_syms")
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("tokens_per_word"),
        )
    )


# At 100 TB nobody trains a tokenizer on the full corpus — you train on
# a deterministic sample and need to KNOW the sample was big enough.
# This audit trains twice (full corpus vs md5-gated half) and compares
# the merge tables round by round, in-engine and oracle-replayed: the
# agreement column is the measured answer to "was the sample
# representative", the same philosophy as dedup_minhash_recall
# (measure the approximation against truth, don't assert it).

BPE_SAMPLE_FILTER_SQL = (
    "WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 2 = 0"
)

BPE_SAMPLE_AUDIT_ORACLE = (
    "\nWITH "
    + _bpe_cte_block(px="f")
    + ",\n"
    + _bpe_cte_block(px="g", doc_filter=BPE_SAMPLE_FILTER_SQL)
    + "\n"
    + " UNION ALL ".join(
        f"""SELECT {r} AS merge_round,
       (SELECT a FROM fm{r}) AS full_a, (SELECT b FROM fm{r}) AS full_b,
       (SELECT a FROM gm{r}) AS sample_a, (SELECT b FROM gm{r}) AS sample_b,
       CAST((SELECT a FROM fm{r}) = (SELECT a FROM gm{r})
            AND (SELECT b FROM fm{r}) = (SELECT b FROM gm{r}) AS BOOLEAN)
         AS agree"""
        for r in range(1, BPE_ROUNDS + 1)
    )
)


@query("bpe_sample_audit", oracle=BPE_SAMPLE_AUDIT_ORACLE)
def bpe_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-by-round agreement between the full-corpus BPE merge table
    and one trained on a deterministic 50% document sample (md5 hash
    gate — both engines materialize the identical sample). Disagreement
    at round r means the sample's pair statistics diverge at that
    vocabulary depth — the signal to widen the sample BEFORE shipping
    the tokenizer.

    Scale: the sampled training is the production path (corpus → dict
    once, over half the data); the full training is the audit's truth
    side, run at audit time only. Both dictionaries are vocabulary-
    sized; the comparison is 8 rows.
    """
    from ..caching import scoped_persist
    from ..operators.text import bpe_train, word_counts

    docs = Catalog(spark, sf_dir).documents
    gate = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2
        == 0
    )
    full_m, _ = bpe_train(
        scoped_persist(word_counts(docs)), BPE_ROUNDS
    )
    samp_m, _ = bpe_train(
        scoped_persist(word_counts(docs.where(gate))), BPE_ROUNDS
    )
    # Align by round, padded to BPE_ROUNDS: either training may stop
    # early on vocabulary exhaustion (empty pair relation), and the
    # oracle's scalar subqueries then yield NULL symbols with a NULL
    # agree (NULL = x). A plain zip would silently truncate rows the
    # oracle still emits. Unreachable on the real corpus (8 merges
    # never exhaust it) but pinned for degenerate inputs.
    full_by_r = {r: (a, b) for (r, a, b, _c) in full_m}
    samp_by_r = {r: (a, b) for (r, a, b, _c) in samp_m}
    rows = []
    for r in range(1, BPE_ROUNDS + 1):
        fa, fb = full_by_r.get(r, (None, None))
        sa, sb = samp_by_r.get(r, (None, None))
        agree = (
            None
            if None in (fa, fb, sa, sb)
            else (fa == sa and fb == sb)
        )
        rows.append((r, fa, fb, sa, sb, agree))
    return spark.createDataFrame(
        rows,
        "merge_round int, full_a string, full_b string,"
        " sample_a string, sample_b string, agree boolean",
    )
