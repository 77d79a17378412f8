"""Tests for tools/ — currently the audit-sweep cache key.

The --changed-only cache must invalidate a query's key when ANY code
that can alter its result changes: the builder's own plans module,
any sibling plans module it (transitively) imports, or any shared
non-plans helper module (sources/ loaders, operators/, functions/).
r8's key hashed only the builder module + oracle — the closing sweep
had to run un-flagged because a loader edit was invisible
(VERDICT r8 #4)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from audit_sweep import _plan_hashes  # noqa: E402


def test_helper_edit_changes_every_cache_key():
    """Editing a shared non-plans module (the sources loader) must
    change the cache key of EVERY query — all builders read tables
    through it."""
    base = _plan_hashes()
    edited = _plan_hashes(
        source_overrides={"sources/__init__.py": "# edited helper\n"}
    )
    assert base.keys() == edited.keys()
    unchanged = [n for n in base if base[n] == edited[n]]
    assert not unchanged, f"unchanged keys after helper edit: {unchanged[:5]}"


def test_sibling_plans_import_is_transitive():
    """dedup imports QUALITY_RAW_SQL from text_analysis, and
    graph -> similarity -> dedup: a text_analysis edit must
    invalidate dedup AND graph queries, while a module with no
    import path to it (windows) keeps its key."""
    base = _plan_hashes()
    edited = _plan_hashes(
        source_overrides={
            "plans/text_analysis.py": "from .registry import register\n"
        }
    )
    assert base["dedup_survivors_quality"] != edited["dedup_survivors_quality"]
    assert base["graph_pagerank_neardup"] != edited["graph_pagerank_neardup"]
    assert base["window_running_and_lag"] == edited["window_running_and_lag"]


def test_own_module_edit_changes_only_its_dependents():
    """Editing a LEAF plans module (windows.py imports only registry)
    must not touch unrelated modules' keys."""
    base = _plan_hashes()
    edited = _plan_hashes(
        source_overrides={"plans/windows.py": "from .registry import register\n"}
    )
    assert base["window_running_and_lag"] != edited["window_running_and_lag"]
    assert base["dedup_exact"] == edited["dedup_exact"]
    assert base["q1_pricing_summary"] == edited["q1_pricing_summary"]
