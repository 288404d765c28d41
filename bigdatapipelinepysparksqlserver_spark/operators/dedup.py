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
    """
    words = F.split(F.trim(F.col(text_col)), " ")
    idx = F.sequence(F.lit(0), F.size(words) - n)  # 0-based start positions

    def gram(i: Column) -> Column:
        parts = [F.element_at(words, i + k + 1) for k in range(n)]  # element_at is 1-based
        return F.concat_ws(" ", *parts)

    shingles = F.when(F.size(words) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )
    return df.select(F.col(id_col), F.explode(shingles).alias("shingle"))


def minhash_signatures(
    shingled: DataFrame, id_col: str, num_hashes: int = 64
) -> DataFrame:
    """num_hashes MinHash values per doc from (id, shingle) pairs.

    Permutation k ≙ xxhash64(k, h) over the shingle's 64-bit hash h —
    the variable-length shingle string is hashed ONCE, then each
    permutation hashes a fixed 12-byte (int, long) pair, which is
    several× cheaper than re-hashing the string per permutation. One
    shuffle (groupBy id) computes all signatures via map-side partial MIN.
    """
    hashed = shingled.withColumn("__sh64", F.xxhash64(F.col("shingle")))
    mins = [
        F.min(F.xxhash64(F.lit(k), F.col("__sh64"))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """LSH banding: equal band-hash in any band → candidate pair (id1 < id2).

    Scale: the self-join key is (band_index, band_hash) — candidate
    generation is near-linear instead of the exact form's quadratic
    shingle-join. Degenerate buckets (boilerplate-heavy corpora) are the
    known skew risk; AQE skew-join splitting handles moderate cases, salting
    the band key is the escape hatch.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "a remainder would silently drop trailing minhash columns"
        )
    rows_per_band = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = signatures.select(F.col(id_col), *band_cols)
    exploded = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bh")) for b in range(bands)])
        ).alias("e"),
    ).select(F.col(id_col), F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )


def exact_jaccard(
    shingled: DataFrame,
    id_col: str,
    pairs: DataFrame | None,
    prefiltered: bool = False,
) -> DataFrame:
    """Exact Jaccard for (id1, id2) pairs from distinct shingle sets.

    ``pairs=None`` computes all co-shingled pairs (quadratic baseline);
    otherwise restricted to the given candidates (the LSH path).

    Scale: when ``pairs`` is given, the shingle table is semi-joined on the
    candidate doc-id set BEFORE the self-join — Catalyst cannot push a
    semi-join on post-aggregation (id1, id2) below the join+groupBy, so
    pruning must happen on the inputs. The self-join is then quadratic only
    in candidate docs (LSH-bucket collisions), not the whole corpus.
    ``prefiltered=True`` asserts the caller already restricted ``shingled``
    to candidate docs (skips the redundant semi-join).
    """
    sh = shingled.select(F.col(id_col).alias("doc_id"), "shingle").distinct()
    if pairs is not None and not prefiltered:
        cand_ids = (
            pairs.select(F.col("id1").alias("doc_id"))
            .union(pairs.select(F.col("id2").alias("doc_id")))
            .distinct()
        )
        sh = sh.join(cand_ids, "doc_id", "left_semi")
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if pairs is not None:
        # the candidate docs can still co-shingle with pairs outside the LSH
        # candidate list; keep only the candidate pairs themselves.
        inter = inter.join(pairs, ["id1", "id2"], "left_semi")
    jac = F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(card.select(F.col("doc_id").alias("id1"), F.col("n").alias("n1")), "id1")
        .join(card.select(F.col("doc_id").alias("id2"), F.col("n").alias("n2")), "id2")
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
    shingled = ngram_shingles(df, text_col=text_col, id_col=id_col, n=shingle_n)
    sigs = minhash_signatures(shingled, id_col=id_col, num_hashes=num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col=id_col, num_hashes=num_hashes, bands=bands)
    # the candidate list feeds two consumers (doc pruning + pair filter);
    # persist the tiny (id1,id2) table so the expensive shingle→minhash→band
    # subtree runs ONCE per action instead of once per consumer.
    cands = cands.persist()
    # verify cost must be proportional to CANDIDATES, not corpus: re-shingle
    # only candidate docs (semi-join pushes the prune into the documents
    # scan, before the explode) rather than filtering the full shingle table.
    cand_ids = (
        cands.select(F.col("id1").alias(id_col))
        .union(cands.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    cand_docs = df.join(cand_ids, id_col, "left_semi")
    cand_shingled = ngram_shingles(cand_docs, text_col=text_col, id_col=id_col, n=shingle_n)
    verified = exact_jaccard(
        cand_shingled.withColumnRenamed(id_col, "doc_id"), "doc_id", cands, prefiltered=True
    )
    return verified.where(F.col("jaccard") >= threshold).select(
        "id1", "id2", F.round("jaccard", 6).alias("jaccard")
    )


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 63
) -> DataFrame:
    """63-bit SimHash per document from distinct-word hashes.

    bit_i(sig) = sign of Σ_tokens (±1 by bit_i(xxhash64(token))); computed as
    `bits` conditional SUM aggregates in a single groupBy — one shuffle, all
    map-side combinable. 63 bits keeps the signature in a signed BIGINT.
    """
    tokens = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok")
    ).distinct()
    h = F.xxhash64(F.col("tok"))
    sums = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
            f"b{i}"
        )
        for i in range(bits)
    ]
    agg = tokens.groupBy(id_col).agg(*sums)
    sig = reduce(
        lambda acc, i: acc + F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)),
        range(1, bits),
        F.when(F.col("b0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def hamming_neighbors(signatures: DataFrame, id_col: str, max_distance: int = 3) -> DataFrame:
    """SimHash pairs within a Hamming radius, bucketed by 16-bit sub-blocks.

    Pigeonhole: two 64-bit signatures within distance 3 share at least one of
    four 16-bit blocks exactly — join per block, then verify with bit_count.
    """
    blocks = [
        F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias(f"blk{b}")
        for b in range(4)
    ]
    tagged = signatures.select(F.col(id_col).alias("doc_id"), "simhash", *blocks)
    pairs = None
    for b in range(4):
        a_side = tagged.select(
            F.col("doc_id").alias("id1"), F.col("simhash").alias("sh1"), F.col(f"blk{b}").alias("k")
        )
        b_side = tagged.select(
            F.col("doc_id").alias("id2"), F.col("simhash").alias("sh2"), F.col(f"blk{b}").alias("k")
        )
        p = a_side.join(b_side, ["k"]).where(F.col("id1") < F.col("id2")).drop("k")
        pairs = p if pairs is None else pairs.unionByName(p)
    dist = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return (
        pairs.distinct()
        .where(dist <= max_distance)
        .select("id1", "id2", dist.alias("hamming_distance"))
    )
