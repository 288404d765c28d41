"""End-to-end corpus build pipeline (clean → scrub → dedup → mix →
chunk → pack → write)."""

from __future__ import annotations

from bigdatapipelinepysparksqlserver_spark.corpus import build_corpus


def _docs(spark):
    long_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
    long_b = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(25))
    rows = [
        (1, long_a, "en"),  # survives everything
        (2, long_a, "en"),  # exact duplicate of 1 → dropped by dedup
        (3, "too short", "en"),  # fails the length gate
        (4, "spam " * 60, "en"),  # fails the repetition gate
        (5, long_b + " mail me at a@b.com now please thanks", "de"),  # scrubbed
        (6, long_b + " unique german tail here today friend", "de"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_build_corpus_funnel_and_dedup(spark, tmp_path):
    out = str(tmp_path / "corpus")
    report = build_corpus(
        spark,
        _docs(spark),
        out,
        mix_thresholds={"en": "ff", "de": "ff"},  # keep-all mix for this test
    )
    assert report["n_raw"] == 6
    assert report["n_quality"] == 4  # docs 3 and 4 gated out
    assert report["n_dedup"] == 3  # the duplicate pair collapsed
    assert report["n_mixed"] == 3
    assert report["n_sequences"] >= 1
    assert report["n_chunks"] >= report["n_sequences"]
    assert report["total_tokens"] > 0

    packed = spark.read.parquet(out)
    assert packed.columns == ["shard", "seq_id", "n_chunks", "seq_tokens"]
    # token conservation into the written corpus
    assert (
        packed.groupBy().sum("seq_tokens").first()[0] == report["total_tokens"]
    )


def test_build_corpus_scrubs_pii_before_hashing(spark, tmp_path):
    """The PII address must not reach the corpus: doc 5's email is
    redacted before chunk md5s are computed."""
    out = str(tmp_path / "corpus2")
    build_corpus(
        spark, _docs(spark), out, mix_thresholds={"en": "ff", "de": "ff"}
    )
    # rebuild with the email pre-redacted by hand: identical output
    import pyspark.sql.functions as F

    pre = _docs(spark).withColumn(
        "text", F.regexp_replace("text", "a@b\\.com", "<EMAIL>")
    )
    out_pre = str(tmp_path / "corpus3")
    build_corpus(spark, pre, out_pre, mix_thresholds={"en": "ff", "de": "ff"})
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, spark.read.parquet(out_pre).collect()))
    assert a == b


def test_build_corpus_deterministic_across_runs(spark, tmp_path):
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    ra = build_corpus(spark, _docs(spark), a_dir)
    rb = build_corpus(spark, _docs(spark).repartition(7), b_dir)
    assert ra == rb
    a = sorted(map(tuple, spark.read.parquet(a_dir).collect()))
    b = sorted(map(tuple, spark.read.parquet(b_dir).collect()))
    assert a == b


def test_tfidf_top_terms_contract(spark):
    """Exactly k terms per source, scores nonnegative and nonincreasing
    within a source, and a term present in EVERY doc (df = N) can only
    surface with score 0 (idf floor)."""
    from collections import defaultdict

    from bigdatapipelinepysparksqlserver_spark.queries import REGISTRY
    from bigdatapipelinepysparksqlserver_spark.queries.text_queries import (
        TFIDF_TOP_K,
    )

    rows = REGISTRY["tfidf_top_terms"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_src = defaultdict(list)
    for r in rows:
        assert r["tfidf"] >= 0.0
        by_src[r["source"]].append(r["tfidf"])
    for scores in by_src.values():
        assert len(scores) == TFIDF_TOP_K
        assert scores == sorted(scores, reverse=True)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_term_pairs_matches_bruteforce(spark):
    """FastSS blocking + verify ≡ brute-force Levenshtein at k=1 and
    k=2 over a vocabulary seeded with real near-pairs (substitution,
    insertion, deletion, transposition, and far-apart controls)."""
    import random

    from bigdatapipelinepysparksqlserver_spark.operators.text import (
        fuzzy_term_pairs,
    )

    rng = random.Random(11)
    base = [
        "stream", "streams", "stream1", "sream", "scream", "steam",
        "batch", "patch", "match", "watch", "abc", "acb", "bac",
        "window", "widow", "windows", "xylophone", "zzzzz",
    ]
    # add random junk that mostly pairs with nothing
    base += [
        "".join(rng.choice("abcdef") for _ in range(rng.randrange(3, 9)))
        for _ in range(40)
    ]
    vocab = sorted(set(t for t in base if len(t) >= 3))
    df = spark.createDataFrame([(t,) for t in vocab], "term string")
    for k in (1, 2):
        want = {
            (a, b)
            for i, a in enumerate(vocab)
            for b in vocab[i + 1 :]
            if _lev(a, b) <= k
        }
        got = {
            (r["term_a"], r["term_b"])
            for r in fuzzy_term_pairs(df, min_len=3, max_dist=k).collect()
        }
        assert got == want, f"k={k}: {got ^ want}"


def test_fuzzy_term_pairs_budget_guard(spark):
    """A shrunken pair budget must fail fast, naming the scale path."""
    import pytest

    from bigdatapipelinepysparksqlserver_spark.operators.dedup import (
        PairBudgetExceeded,
    )
    from bigdatapipelinepysparksqlserver_spark.operators.text import (
        fuzzy_term_pairs,
    )

    df = spark.createDataFrame(
        [("aaa",), ("aab",), ("aba",), ("baa",), ("aac",)], "term string"
    )
    with pytest.raises(PairBudgetExceeded, match="length-band"):
        fuzzy_term_pairs(
            df,
            max_dist=2,
            pair_budget=1,
            scale_path="length-band prefilter",
        ).collect()


def test_html_extract_hand_built(spark):
    """html_extract against hand-computed expectations: boilerplate nav
    (link-dense) and short headings drop, body lines keep, entities
    decode in single-pass order (&amp;lt; -> &lt;), empty/whitespace
    lines count but never keep, and a page of ONLY boilerplate yields
    empty text with zero kept lines."""
    import pyspark.sql.functions as F

    from bigdatapipelinepysparksqlserver_spark.operators.text import (
        html_extract,
    )

    page = "\n".join(
        [
            '<nav><a href="/">Home</a> <a href="/a">A</a> <a href="/b">B</a></nav>',
            "<h1>Tiny heading</h1>",
            "<p>This body line has plenty of real tokens to keep around</p>",
            '<p>One <a href="/x">link</a> inside a long enough body line is fine</p>',
            "<p>Entities: &amp;lt; decodes to &lt; and &quot;quotes&quot; survive fine</p>",
            "   ",
            '<footer><a href="/tos">Terms</a> <a href="/p">P</a></footer>',
        ]
    )
    boiler = "\n".join(
        ['<nav><a href="/">x</a></nav>', "<h1>Hi</h1>"]
    )
    df = spark.createDataFrame([(1, page), (2, boiler)], "id long, html string")
    got = {
        r.id: r
        for r in df.select(
            "id", html_extract(F.col("html")).alias("e")
        ).select("id", "e.*").collect()
    }
    r = got[1]
    assert r.n_lines == 7
    # kept: the two body lines + the entity line
    assert r.n_kept == 3
    assert r.n_links == 3 + 1 + 2  # nav 3, body-with-link 1, footer 2
    lines = r.text.split("\n")
    assert lines[0] == "This body line has plenty of real tokens to keep around"
    assert lines[1] == "One link inside a long enough body line is fine"
    # single-pass decode: '&amp;lt;' -> '&lt;' (NOT '<'), '&lt;' -> '<'
    assert lines[2] == 'Entities: &lt; decodes to < and "quotes" survive fine'
    b = got[2]
    assert (b.n_kept, b.text) == (0, "")
