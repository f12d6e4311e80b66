"""Index lifecycle CLI (tools/admin.py) — the Katta.java admin
surface (listIndexes/check/listErrors/showStructure/removeIndex,
Katta.java:729-921) over the parquet index layout."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(*args):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "admin.py"), *args],
        capture_output=True, text=True,
    )
    return out.returncode, json.loads(out.stdout)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    from katta_spark.corpus import synthetic_corpus
    from katta_spark.index import build_index

    d = tmp_path_factory.mktemp("admin") / "idx"
    build_index(spark, synthetic_corpus(spark, 800), str(d),
                n_groups=2, block_range=256)
    return d


def test_admin_list_and_show(idx):
    rc, out = run_cli("list", str(idx.parent))
    assert rc == 0 and out["n"] == 1
    row = out["indexes"][0]
    assert row["status"] == "DEPLOYED"
    assert row["n_docs"] == 800
    assert row["groups"] == 2
    assert row["bytes"] > 0 and row["n_postings"] > 0

    rc, shown = run_cli("show", str(idx))
    assert rc == 0
    assert shown["stats"]["n_docs"] == 800
    assert len(shown["manifest"]) == 2
    assert set(shown["layout"]) >= {"docs", "postings", "terms"}


def test_admin_check_healthy_then_detects_damage(idx, tmp_path):
    import shutil

    rc, out = run_cli("check", str(idx))
    assert rc == 0 and out["ok"] and out["problems"] == []

    rc, out = run_cli("errors", str(idx))
    assert rc == 0 and out["n"] == 0

    # damage a copy: drop one group's postings partition
    dmg = tmp_path / "dmg"
    shutil.copytree(idx, dmg)
    victim = next((dmg / "postings").glob("commit=*/group=*"))
    shutil.rmtree(victim)
    rc, out = run_cli("check", str(dmg))
    assert rc == 1 and not out["ok"]
    assert any("postings" in s for s in out["problems"])


def test_admin_remove_requires_yes(idx, tmp_path):
    import shutil

    victim = tmp_path / "victim"
    shutil.copytree(idx, victim)
    rc, out = run_cli("remove", str(victim))
    assert rc == 1 and not out["ok"] and victim.exists()
    rc, out = run_cli("remove", str(victim), "--yes")
    assert rc == 0 and out["ok"] and not victim.exists()


def test_admin_html_status_page(idx, tmp_path):
    """katta-ui substitution: one command renders a static HTML
    status page listing every index with status/health/groups/docs/
    commits plus per-index check + error sections."""
    out_file = tmp_path / "status.html"
    rc, out = run_cli("html", str(idx.parent), "--out", str(out_file))
    assert rc == 0 and out["ok"]
    page = out_file.read_text()
    assert page.lstrip().startswith("<!doctype html")
    assert str(idx) in page              # index listed
    assert "DEPLOYED" in page            # Katta status column
    assert ">OK<" in page                # health column from check
    assert "no problems" in page         # per-index check section
    assert "no deploy errors" in page    # per-index errors section
    assert "800" in page.replace(",", "")  # doc count rendered
    # no --metrics: the serving-metrics section is absent
    assert "serving metrics" not in page


def test_admin_html_renders_serving_metrics(idx, tmp_path):
    """Round 5: a ShardedSearcher.metrics() snapshot (dumped by the
    serving process) renders as the operational-counters section —
    scatters, retries, replica failovers, failures, cache hit rates,
    per-shard node rows."""
    from katta_spark.index.serve import ShardedSearcher

    sh = ShardedSearcher([str(idx)])
    try:
        sh.count(["import"])
        sh.count(["import"])  # scache hit
        snap = sh.metrics()
    finally:
        sh.close()
    mpath = tmp_path / "metrics.json"
    mpath.write_text(json.dumps(snap))
    out_file = tmp_path / "status_m.html"
    rc, out = run_cli("html", str(idx.parent), "--out", str(out_file),
                      "--metrics", str(mpath))
    assert rc == 0 and out["ok"]
    page = out_file.read_text()
    assert "serving metrics" in page
    assert "replica failovers" in page
    assert "scache hit rate" in page and "50%" in page
    assert "per-shard nodes" in page
    assert "qcache hit rate" in page
