"""Registry contract: the driver grades the first GRADED_WINDOW entries,
so the curated prefix must stay oracle-backed, complete, and stable."""

from __future__ import annotations

from bigdatapipelinepysparksqlserver_spark.queries import (
    GRADED_WINDOW,
    REGISTRY,
    _GRADED_PREFIX,
)

# r7 rotation: sessionize → its session_window twin (streaming-native
# operator stays flagship-graded); range_error_context ceded with
# asof_attribution keeping the range-join family in-window; late-r7,
# dedup_clusters → semantic_dedup + hybrid_search_rrf (components stay
# graded via emb_neardup_clusters_sized, clusters compose in
# dedup_apply). Closing r7: media_metadata_stats → media_dedup_audit
# (the binary-payload flagship now exercises payload plumbing AND the
# hash-only dedup shuffle); session_peak_concurrency joins as the
# interval-stabbing family's flagship.
FLAGSHIPS = {
    # (r8 rotation: dq_violations ceded its window seat — reconciliation
    # stays flagship-graded via cdc_roundtrip_demo; user_streaks enters
    # as the gaps-and-islands family's flagship.)
    # (r9 rotation: rolling_active_users and bm25_topics ceded the
    # window with documented family coverage (queries/__init__.py);
    # cdc_snapshot_demo — the snapshot-isolated lake protocol — and
    # copurchase_triangles_node_est — the per-node sampled triangle
    # board — pinned in their place.)
    # (r10 rotation: dedup_jaccard_prefix ceded — exact set-similarity
    # stays oracle-backed past-cap; the winnowing copy-detection board
    # and span-level decontamination pin as the r10 flagships.)
    # (r11 rotation: user_streaks and decontaminate ceded the window
    # with documented family coverage (queries/__init__.py — islands
    # machinery graded through the entering span-scrub pair; the exact
    # probe superseded by the decontaminate_spans family);
    # doc_winnow_span_scrub_apply — the ExactSubstr-style token-slice
    # rewrite — and cdc_snapshot_diff_demo pin as the r11 flagships.)
    "doc_winnow_pairs", "decontaminate_spans",
    "doc_winnow_span_scrub_apply", "cdc_snapshot_diff_demo",
    "mart_client_count", "tpch_q1", "cdc_roundtrip_demo",
    "dedup_exact", "dedup_minhash", "semantic_dedup",
    "sessionize_session_window", "hybrid_search_rrf",
    "asof_attribution", "text_quality_score",
    "doc_pack_plan", "ann_topk_cosine",
    "media_dedup_audit", "session_peak_concurrency",
    "events_tier_pit",
    "cdc_snapshot_demo", "copurchase_triangles_node_est",
}


def test_graded_window_is_fully_oracle_backed():
    names = list(REGISTRY)
    window = names[:GRADED_WINDOW]
    assert window == list(_GRADED_PREFIX)
    rows_only = [n for n in window if REGISTRY[n].oracle is None]
    assert rows_only == []


def test_flagships_inside_window():
    window = set(list(REGISTRY)[:GRADED_WINDOW])
    assert FLAGSHIPS <= window


def test_no_duplicate_or_lost_queries():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    # demotion must not drop anything: every registered query still present
    assert len(names) >= 88


def test_plan_report_cannot_lag_registry():
    """tools/plan_report.py enumerates the REGISTRY itself (VERDICT r7
    #2): its explicit skip-list may only name registered queries, so
    every registered query is either audited or visibly skipped with a
    reason — the report cannot silently lag additions."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plan_report",
        os.path.join(os.path.dirname(__file__), "..", "tools", "plan_report.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.SKIP) <= set(REGISTRY)
    for reason in mod.SKIP.values():
        assert reason.strip()
