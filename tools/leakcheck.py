#!/usr/bin/env python3
"""Leak scan: no internal/proprietary systems, packages, buckets, URLs,
env vars, or credentials may appear anywhere in the repo's sources or
docs (public-knowledge constraint). Emits LEAKCHECK.json stamped with
the scanned commit + UTC timestamp so every round's artifact is
verifiably a fresh scan, not a hand-edited round bump.

Usage: python3 tools/leakcheck.py [round_number]
"""
import json
import os
import re
import subprocess
import sys
import datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Pattern classes. The repo's own knobs (SPARK_GRAFT_*) and public
# ecosystems (org.apache.*, scala.*, java.*) are the allowed surface.
PATTERNS = {
    # imports outside the public Spark/Scala/Java/test ecosystem
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|org\.scalatest|org\.scalacheck|scala\.|java\.|javax\.|graft\.)"
        r"[a-z]+\.(?:internal|corp|proprietary)", re.M),
    "internal-url": re.compile(
        r"https?://[a-z0-9.-]*(?:\.corp\.|\.internal\.|intranet)[a-z0-9./-]*", re.I),
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?:anthropic|internal|corp)\.[a-z]", re.I),
    "internal-bucket": re.compile(r"\b(?:s3|gs|abfss?)://[a-z0-9._-]+", re.I),
    "slack-link": re.compile(r"slack\.com/archives|#[a-z0-9-]*-(?:eng|oncall|infra)\b"),
    "api-key": re.compile(r"\b(?:sk-[A-Za-z0-9]{16,}|AKIA[0-9A-Z]{16})\b"),
    "axon-env": re.compile(
        r"\b(?!SPARK_GRAFT_)[A-Z][A-Z0-9]*_(?:INTERNAL|CORP|SECRET|TOKEN)[A-Z0-9_]*\b"),
}

SCAN_EXT = {".scala", ".sbt", ".md", ".py", ".sh", ".json", ".conf", ".properties"}
SKIP_DIRS = {"target", ".git", ".bloop", ".metals", "project"}


def files():
    for dirpath, dirnames, filenames in os.walk(ROOT):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for f in filenames:
            if os.path.splitext(f)[1] in SCAN_EXT and f != "LEAKCHECK.json":
                yield os.path.join(dirpath, f)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    hits = {k: [] for k in PATTERNS}
    for path in files():
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        rel = os.path.relpath(path, ROOT)
        for key, pat in PATTERNS.items():
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[key].append(f"{rel}:{line}:{m.group(0)[:80]}")
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()
    # the scan walks the WORKING TREE; record whether that tree differs
    # from HEAD so the commit stamp can't silently over-claim what was
    # scanned (a dirty tree means "HEAD plus these uncommitted edits")
    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=ROOT,
                           capture_output=True, text=True).stdout.strip()
    out = {
        "round": rnd,
        "scanned_commit": commit,
        "worktree_dirty": bool(dirty),
        "scanned_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"leakcheck: {out['n_hits']} hits @ {commit[:12]}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
