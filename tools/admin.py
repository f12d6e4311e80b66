"""Index lifecycle CLI — the Katta admin front door re-expressed for
this engine's parquet index layout.

The reference ships a command-line admin surface on the master
(katta-core/src/main/java/com/ivyft/katta/Katta.java:729-921):
``listIndexes`` (name, status, #shards, #docs, size), ``check``
(deployment health), ``listErrors``, ``showStructure``,
``removeIndex``.  ZooKeeper state doesn't exist here — an index IS a
directory (docs/ postings/ terms/ manifest/ stats.json), so every
command is a pure metadata/pyarrow read, no Spark session, no JVM:

    python tools/admin.py list  <root>      # all indexes under root
    python tools/admin.py show  <index>     # structure + per-commit/group detail
    python tools/admin.py check <index>     # health: layout, counts, catalog
    python tools/admin.py errors <index>    # manifest rows with bad status
    python tools/admin.py remove <index> --yes

Output is one JSON document per command (scriptable, like the
reference's plain-text tables but parseable).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _dir_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def _is_index(p: Path) -> bool:
    return (p / "stats.json").is_file() and (p / "manifest").is_dir()


def _load(p: Path) -> tuple[dict, list[dict]]:
    from katta_spark.index.build import load_manifest

    stats = json.loads((p / "stats.json").read_text())
    return stats, load_manifest(str(p))


def _tomb_count(p: Path) -> int:
    d = p / "tombstones"
    if not d.is_dir():
        return 0
    import pyarrow.dataset as pa_ds

    return pa_ds.dataset(str(d), format="parquet").count_rows()


def _bad_rows(manifest: list[dict]) -> list[dict]:
    return [m for m in manifest
            if m.get("status") not in (None, "ok", "done")]


def _summary(p: Path) -> dict:
    stats, manifest = _load(p)
    bad = _bad_rows(manifest)
    return {
        "index": str(p),
        "status": "ERROR" if bad else "DEPLOYED",  # Katta's states
        "n_docs": stats["n_docs"],
        "tombstones": _tomb_count(p),
        "commits": stats.get("commits", []),
        "groups": len({m["group"] for m in manifest}),
        "n_postings": sum(m.get("n_postings", 0) for m in manifest),
        "bytes": _dir_bytes(p),
        "positions": bool(stats.get("positions")),
        "id_bits": bool(stats.get("id_bits")),
    }


def cmd_list(root: str) -> dict:
    """listIndexes (Katta.java:758-789): every index under ``root``
    with the reference's columns (name, status, #shards->groups,
    #docs, size)."""
    rootp = Path(root)
    dirs = [rootp] if _is_index(rootp) else sorted(
        p for p in rootp.rglob("stats.json")
        if _is_index(p.parent)
    )
    rows = [_summary(p if isinstance(p, Path) and _is_index(p)
                     else p.parent) for p in dirs]
    return {"indexes": rows, "n": len(rows)}


def cmd_show(index: str) -> dict:
    """showStructure: stats + the per-(commit, group) manifest rows —
    lineage, posting/doc counts, bytes, build wall."""
    p = Path(index)
    stats, manifest = _load(p)
    return {
        "index": str(p),
        "stats": stats,
        "tombstones": _tomb_count(p),
        "manifest": manifest,
        "layout": {
            d: _dir_bytes(p / d)
            for d in ("docs", "postings", "terms", "manifest")
            if (p / d).exists()
        },
    }


def cmd_check(index: str) -> dict:
    """Deployment-health analogue of ``check`` (Katta.java:826-871):
    layout present, datasets readable, doc count consistent with
    stats, every manifest group present on disk, terms catalog
    readable and df sane for a sampled term."""
    import pyarrow.dataset as pa_ds

    p = Path(index)
    problems: list[str] = []
    if not _is_index(p):
        return {"ok": False, "problems": ["not an index directory"]}
    stats, manifest = _load(p)
    for d in ("docs", "postings", "terms"):
        if not (p / d).is_dir():
            problems.append(f"missing {d}/")
    if not problems:
        docs = pa_ds.dataset(str(p / "docs"), format="parquet",
                             partitioning="hive")
        n = docs.count_rows()
        if n != int(stats["n_docs"]):
            problems.append(
                f"docs rows {n} != stats.n_docs {stats['n_docs']}"
            )
        post = pa_ds.dataset(str(p / "postings"), format="parquet",
                             partitioning="hive")
        on_disk = {
            (f.rsplit("commit=", 1)[1].split("/")[0],
             int(f.rsplit("group=", 1)[1].split("/")[0]))
            for f in post.files if "commit=" in f and "group=" in f
        }
        for m in manifest:
            if (str(m["commit"]), int(m["group"])) not in on_disk:
                problems.append(
                    f"manifest {m['commit']}/g{m['group']} has no "
                    f"postings files"
                )
        terms = pa_ds.dataset(str(p / "terms"), format="parquet")
        tt = terms.head(1)
        if tt.num_rows:
            df_val = tt.column("df")[0].as_py()
            if not (0 < df_val <= int(stats["n_docs"])):
                problems.append(
                    f"catalog df {df_val} out of range (n_docs "
                    f"{stats['n_docs']})"
                )
    return {"ok": not problems, "index": str(p), "problems": problems}


def cmd_errors(index: str) -> dict:
    """listErrors: manifest rows whose status is not ok — the
    per-shard deploy-error listing."""
    _, manifest = _load(Path(index))
    bad = _bad_rows(manifest)
    return {"errors": bad, "n": len(bad)}


def cmd_remove(index: str, yes: bool) -> dict:
    """removeIndex — refuses without --yes (the reference prompts)."""
    p = Path(index)
    if not _is_index(p):
        return {"ok": False, "error": "not an index directory"}
    if not yes:
        return {"ok": False, "error": "pass --yes to remove",
                "index": str(p)}
    shutil.rmtree(p)
    return {"ok": True, "removed": str(p)}


def _esc(s: object) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _metrics_section(metrics_path: str | None) -> str:
    """Render a serving-metrics snapshot (round 5) — the operational
    counters the scatter client exposes via ShardedSearcher.metrics()
    (scatters, dead-worker retries, replica failovers, shard
    failures, scatter/result-cache hit rates, per-shard node
    metrics).  A serving process dumps the snapshot with
    ``json.dump(sh.metrics(), open(path, "w"))``; the page renders it
    when ``--metrics`` is passed — the katta-ui node-status view's
    counters, minus the ZooKeeper liveness it can't have offline."""
    if not metrics_path:
        return ""
    try:
        m = json.loads(Path(metrics_path).read_text())
    except Exception as e:  # unreadable snapshot: render the problem
        return (f"<h2>serving metrics</h2><p class='bad'>unreadable "
                f"snapshot {_esc(metrics_path)}: {_esc(e)}</p>")

    def rate(h, mi):
        tot = (h or 0) + (mi or 0)
        return f"{(h or 0) / tot:.0%}" if tot else "-"

    head = (
        "<h2>serving metrics</h2><table><tr>"
        "<th>scatters</th><th>retries</th><th>replica failovers</th>"
        "<th>shard failures</th><th>scache hit rate</th>"
        "<th>last failed shards</th></tr>"
        "<tr><td>{sc}</td><td>{rt}</td><td>{fo}</td><td>{fl}</td>"
        "<td>{hr}</td><td>{lf}</td></tr></table>".format(
            sc=m.get("n_scatters", 0), rt=m.get("n_retries", 0),
            fo=m.get("n_replica_failovers", 0),
            fl=m.get("n_shard_failures", 0),
            hr=rate(m.get("scache_hits"), m.get("scache_misses")),
            lf=_esc(", ".join(m.get("last_shards_failed", [])) or "-"),
        )
    )
    per = m.get("per_shard") or []
    if not per:
        return head
    rows = "".join(
        "<tr><td>{i}</td><td>{d:,}</td><td>{t:,}</td><td>{qr}</td>"
        "<td>{qe}</td></tr>".format(
            i=i, d=s.get("n_docs", 0), t=s.get("tombstones", 0),
            qr=rate(s.get("qcache_hits"), s.get("qcache_misses")),
            qe=s.get("qcache_entries", 0),
        )
        for i, s in enumerate(per)
    )
    return (head + "<h3>per-shard nodes</h3><table><tr><th>shard</th>"
            "<th>docs</th><th>tombstones</th><th>qcache hit rate</th>"
            "<th>qcache entries</th></tr>" + rows + "</table>")


def cmd_html(root: str, out_path: str | None = None,
             metrics_path: str | None = None) -> dict:
    """Static HTML status page — the katta-ui substitution (the
    reference bundles a Jetty webapp whose index view lists every
    deployed index with status/#shards/#docs and per-index detail;
    katta-ui/.../Booster.java boots it against ZooKeeper state).
    Here cluster state IS the directory tree, so the page is a pure
    render of cmd_list + per-index cmd_check/cmd_errors: no server,
    no deps — one self-contained file to drop behind any static
    host.  ``metrics_path`` adds the serving-tier counters section
    from a ShardedSearcher.metrics() snapshot."""
    listing = cmd_list(root)
    rows, details = [], []
    for s in listing["indexes"]:
        chk = cmd_check(s["index"])
        err = cmd_errors(s["index"])
        health = "OK" if chk["ok"] else "UNHEALTHY"
        rows.append(
            "<tr><td><a href='#i{n}'>{name}</a></td><td>{st}</td>"
            "<td class='{hc}'>{h}</td><td>{g}</td><td>{d:,}</td>"
            "<td>{t:,}</td><td>{c}</td><td>{mb:.1f}</td></tr>".format(
                n=len(rows), name=_esc(s["index"]), st=_esc(s["status"]),
                hc="ok" if chk["ok"] else "bad", h=health,
                g=s["groups"], d=s["n_docs"], t=s["tombstones"],
                c=_esc(", ".join(map(str, s["commits"])) or "-"),
                mb=s["bytes"] / 1e6,
            )
        )
        problems = "".join(
            f"<li>{_esc(p)}</li>" for p in chk.get("problems", [])
        ) or "<li class='ok'>no problems</li>"
        errs = "".join(
            f"<li>{_esc(json.dumps(e, default=str))}</li>"
            for e in err["errors"]
        ) or "<li class='ok'>no deploy errors</li>"
        details.append(
            f"<h2 id='i{len(details)}'>{_esc(s['index'])}</h2>"
            f"<p>positions={s['positions']} id_bits={s['id_bits']} "
            f"postings={s['n_postings']:,}</p>"
            f"<h3>check</h3><ul>{problems}</ul>"
            f"<h3>errors</h3><ul>{errs}</ul>"
        )
    html = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>katta_spark indexes</title><style>"
        "body{font-family:sans-serif;margin:2em;color:#222}"
        "table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:4px 10px;text-align:left}th{background:#eee}"
        ".ok{color:#0a0}.bad{color:#c00;font-weight:bold}"
        "</style></head><body>"
        f"<h1>Indexes under {_esc(root)} ({listing['n']})</h1>"
        "<table><tr><th>index</th><th>status</th><th>health</th>"
        "<th>groups</th><th>docs</th><th>tombstones</th>"
        "<th>commits</th><th>MB</th></tr>"
        + "".join(rows) + "</table>"
        + _metrics_section(metrics_path)
        + "".join(details)
        + "</body></html>"
    )
    if out_path:
        Path(out_path).write_text(html)
    return {"ok": True, "n": listing["n"],
            "out": out_path, "html": None if out_path else html}


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("list", "show", "check", "errors"):
        s = sub.add_parser(name)
        s.add_argument("path")
    s = sub.add_parser("remove")
    s.add_argument("path")
    s.add_argument("--yes", action="store_true")
    s = sub.add_parser("html")
    s.add_argument("path")
    s.add_argument("--out", default=None)
    s.add_argument("--metrics", default=None,
                   help="ShardedSearcher.metrics() JSON snapshot to "
                        "render as the serving-metrics section")
    a = ap.parse_args()
    fn = {
        "list": lambda: cmd_list(a.path),
        "show": lambda: cmd_show(a.path),
        "check": lambda: cmd_check(a.path),
        "errors": lambda: cmd_errors(a.path),
        "remove": lambda: cmd_remove(a.path, a.yes),
        "html": lambda: cmd_html(a.path, a.out,
                                 getattr(a, "metrics", None)),
    }[a.cmd]
    out = fn()
    if a.cmd == "html" and a.out:
        print(json.dumps({"ok": True, "out": a.out}, indent=1))
    else:
        print(json.dumps(out, indent=1, default=str))
    return 0 if out.get("ok", True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
