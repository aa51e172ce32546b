#!/usr/bin/env python3
"""Scan the repo for non-public references and write LEAKCHECK.json.

Everything in this library must derive from public knowledge (Spark API,
the public reference repo, published papers). This checker greps every
git-tracked text file for seven categories of non-public residue and writes
an artifact that carries its own provenance (git commit, UTC timestamp,
files-scanned count) so a recorded run is distinguishable from a hand-edited
counter bump.

Usage: tools/leakcheck.py <round-number>
"""
import datetime
import json
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# Public hosts that are expected to appear (docs, papers, license headers).
PUBLIC_HOST = re.compile(
    r"(apache\.org|github\.com|githubusercontent\.com|arxiv\.org|acm\.org|"
    r"ieee\.org|vldb\.org|wikipedia\.org|w3\.org|ncbi\.nlm\.nih\.gov|"
    r"rgd\.mcw\.edu|genome\.ucsc\.edu|ebi\.ac\.uk|graphql\.org|json\.org|"
    r"example\.(com|org)|localhost|127\.0\.0\.1|scala-lang\.org|scala-sbt\.org|"
    r"duckdb\.org|openjdk\.org|oracle\.com|python\.org|maven\.org|mcw\.edu|"
    r"creativecommons\.org|gnu\.org|opensource\.org|doi\.org|sciencedirect\.com|"
    r"springer\.com|nature\.com|biorxiv\.org|ensembl\.org)",
    re.I)

CATEGORIES = {
    # imports/packages that could only come from a non-public codebase
    "internal-import": re.compile(
        r"^\s*(import|from)\s+(com\.anthropic|anthropic|claude_|internal\.|corp\.)", re.M),
    "internal-url": re.compile(r"https?://[\w.-]+\.(corp|internal|intranet|local)\b", re.I),
    "internal-pkg2": re.compile(r'"@[\w-]+/(internal|private)-', re.I),
    "internal-bucket": re.compile(r"\b(s3|gs|abfss?)://[\w.-]+", re.I),
    "slack-link": re.compile(r"(slack\.com/archives|app\.slack\.com|\bgo/[a-z][\w-]{2,})\b"),
    "api-key": re.compile(
        r"\b(AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36}|sk-[A-Za-z0-9]{20,}|xox[bap]-[\w-]{10,})\b"),
    # environment variables that don't belong to Spark/SBT/this repo's SPARK_GRAFT_* contract
    "axon-env": re.compile(r"\b(ANTHROPIC|CLAUDE|AXON)_[A-Z_]+\b"),
}

TEXT_SUFFIXES = {
    ".scala", ".sbt", ".py", ".sh", ".md", ".json", ".txt", ".yml", ".yaml",
    ".properties", ".conf", ".sql", ".csv", ".tsv",
}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=REPO, capture_output=True, text=True)
    return [
        REPO / p
        for p in out.stdout.splitlines()
        if pathlib.Path(p).suffix in TEXT_SUFFIXES
        # the checker's own pattern table would otherwise always self-hit
        and p != "tools/leakcheck.py"
    ]


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in CATEGORIES}
    files = tracked_files()
    for f in files:
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                frag = m.group(0)
                if cat == "internal-url" and PUBLIC_HOST.search(frag):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f.relative_to(REPO)}:{line}: {frag[:120]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    artifact = {
        "round": rnd,
        "ran_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "git_head": head,
        "files_scanned": len(files),
        "tool": "tools/leakcheck.py",
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (REPO / "LEAKCHECK.json").write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"LEAKCHECK round {rnd}: {artifact['n_hits']} hits over {len(files)} files @ {head[:9]}")
    if artifact["n_hits"]:
        for cat, v in hits.items():
            for h in v:
                print(f"  [{cat}] {h}")
        sys.exit(1)


if __name__ == "__main__":
    main()
