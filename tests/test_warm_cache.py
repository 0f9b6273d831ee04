"""serving_cache lifecycle: MANIFEST provenance, --check, --prune
(tools/warm_cache.py). Pure host-side logic — no jax device work."""

import importlib.util
import json
import os
import sys

import pytest


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "warm_cache.py")
    spec = importlib.util.spec_from_file_location("warm_cache", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def tool(monkeypatch):
    mod = _load_tool()
    # pin the "current" versions so tests don't depend on the installed jax
    monkeypatch.setattr(mod, "_versions", lambda: {
        "jax": "1.2.3", "jaxlib": "1.2.3", "backend": "tpu"})
    return mod


def _make_cache(tmp_path, entries, versions=None, budget=128):
    d = tmp_path / "sc"
    d.mkdir()
    for name, size in entries.items():
        (d / name).write_bytes(b"x" * size)
    if versions is not None:
        (d / "MANIFEST.json").write_text(json.dumps({
            "versions": versions,
            "entries": sorted(entries),
            "total_bytes": sum(entries.values()),
            "budget_mb": budget,
        }))
    return str(d)


def test_check_ok_when_versions_match(tool, tmp_path):
    d = _make_cache(tmp_path, {"a-cache": 10, "b-cache": 20},
                    versions={"jax": "1.2.3", "jaxlib": "1.2.3"})
    assert tool.check(d, budget_mb=128) == 0


def test_check_fails_on_version_mismatch_and_prune_clears(tool, tmp_path):
    d = _make_cache(tmp_path, {"a-cache": 10},
                    versions={"jax": "1.2.3", "jaxlib": "0.0.1"})
    assert tool.check(d, budget_mb=128) != 0
    assert tool.prune(d) == 0
    # everything unreachable -> entries AND the stale manifest are gone
    assert os.listdir(d) == []


def test_check_fails_over_budget(tool, tmp_path):
    d = _make_cache(tmp_path, {"a-cache": 3_000_000},
                    versions={"jax": "1.2.3", "jaxlib": "1.2.3"})
    assert tool.check(d, budget_mb=2) != 0


def test_check_flags_unmanifested_entries(tool, tmp_path):
    d = _make_cache(tmp_path, {"a-cache": 10},
                    versions={"jax": "1.2.3", "jaxlib": "1.2.3"})
    with open(os.path.join(d, "stray-cache"), "wb") as f:
        f.write(b"y" * 5)
    assert tool.check(d, budget_mb=128) != 0
    assert tool.prune(d) == 0
    # live entry + manifest survive; only the stray goes
    assert sorted(os.listdir(d)) == ["MANIFEST.json", "a-cache"]


def test_prune_without_manifest_forces_rewarm(tool, tmp_path):
    d = _make_cache(tmp_path, {"a-cache": 10}, versions=None)
    assert tool.check(d, budget_mb=128) != 0  # entries but no provenance
    assert tool.prune(d) == 0
    assert os.listdir(d) == []


def test_repo_cache_passes_its_own_check():
    """The COMMITTED serving_cache must always be live for the committed
    environment: manifest present, entries listed, inside the budget.
    (Versions are checked against the real installed jax on purpose — a
    jax upgrade in the image should fail this test until a re-warm.)"""
    mod = _load_tool()
    repo = os.path.join(os.path.dirname(__file__), "..")
    sc = os.path.join(repo, "serving_cache")
    if not os.path.isdir(sc):
        pytest.skip("no committed serving_cache")
    man = mod._load_manifest(sc)
    assert man is not None, "committed serving_cache lacks MANIFEST.json"
    assert mod.check(sc, budget_mb=float(man.get("budget_mb", 128))) == 0


def test_check_fails_on_manifest_entries_missing_from_disk(tool, tmp_path):
    # gutted cache: manifest intact, entry files deleted — must NOT pass,
    # or a fresh run silently pays the full cold compile --check guards
    d = _make_cache(tmp_path, {"a-cache": 10, "b-cache": 20},
                    versions={"jax": "1.2.3", "jaxlib": "1.2.3"})
    os.remove(os.path.join(d, "b-cache"))
    assert tool.check(d, budget_mb=128) != 0
