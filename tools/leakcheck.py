#!/usr/bin/env python3
"""Self-evidencing leak check (round-12 ADVICE): scan the repo's source
for the seven leak categories and write LEAKCHECK.json WITH provenance —
a run timestamp and the HEAD commit hash — so each round's zero-hit
claim is distinguishable from a hand-edited round-number bump.

Usage: python3 tools/leakcheck.py [round] [--out FILE]

Default output is LEAKCHECK.json; pass --out LEAKCHECK_SELF.json for
the builder-owned committed snapshot — the driver overwrites
LEAKCHECK.json at round close (stripping the provenance stamp, seen in
round 13), so the self-evidencing copy lives under a name only the
builder writes.

Categories mirror the driver-side checker's names. Everything here must
derive from public knowledge only; a hit is a line in committed source
that references a non-public system, URL, bucket, or credential shape.
"""
import datetime
import json
import os
import re
import subprocess
import sys

PATTERNS = {
    # imports rooted at an external reverse-domain package that is not a
    # public dependency of this build (org.apache/scalatest/scalacheck).
    # Relative imports (import spark.implicits._, import VectorOps._)
    # have no reverse-domain root and are local by construction.
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|org\.scalatest|org\.scalacheck)"
        r"(?:com|net|io|ai|dev|org)\.[a-z]"),
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|www\.w3\.org|json-schema\.org|"
        r"maven\.apache\.org|spark\.apache\.org|github\.com|arxiv\.org|"
        r"duckdb\.org|docs\.|"
        # RFC-2606 reserved documentation domains (round-16 ADVICE): let
        # fixture-rendered URLs be written as ONE contiguous literal so
        # the scanner sees every URL the source constructs, instead of
        # sources splitting literals to dodge this pattern.
        r"[a-z0-9.-]*example\.(?:com|org|net)\b)"),
    "internal-pkg2": re.compile(r"\b(?:com|net|io)\.(?!fasterxml|github)[a-z]+\.internal\b"),
    "internal-bucket": re.compile(r"\b(?:s3|gs|s3a|abfss?)://[a-z0-9._-]+"),
    "slack-link": re.compile(r"slack\.com|app\.slack|#[a-z0-9-]*-(?:eng|team|infra)\b"),
    "api-key": re.compile(r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|xox[bap]-)"),
    "axon-env": re.compile(r"\b[A-Z]+_(?:INTERNAL|CORP|PROD)_[A-Z_]+\b"),
}

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "README.md"]
EXTS = {".scala", ".sbt", ".py", ".md", ".sql", ".json", ".conf"}


def files():
    for d in SCAN_DIRS:
        for root, _, names in os.walk(d):
            for n in names:
                if os.path.splitext(n)[1] in EXTS:
                    yield os.path.join(root, n)
    for f in SCAN_FILES:
        if os.path.exists(f):
            yield f


def main(rnd, out="LEAKCHECK.json"):
    hits = {k: [] for k in PATTERNS}
    for path in files():
        try:
            lines = open(path, encoding="utf-8", errors="replace").read().splitlines()
        except OSError:
            continue
        for i, line in enumerate(lines, 1):
            for cat, pat in PATTERNS.items():
                if pat.search(line):
                    hits[cat].append(f"{path}:{i}: {line.strip()[:160]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()
    rec = {
        "round": rnd,
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "head": head,
        "tool": "tools/leakcheck.py",
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(rec, open(out, "w"), indent=2)
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    for v in hits.values():
        for h in v:
            print("HIT", h, file=sys.stderr)
    return 0 if rec["n_hits"] == 0 else 1


if __name__ == "__main__":
    args = sys.argv[1:]
    out = "LEAKCHECK.json"
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(main(int(args[0]) if args else 0, out))
