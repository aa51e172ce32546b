#!/usr/bin/env python3
"""Regenerate COVERAGE.md's headline counts from artifacts, not intent.

Round-5 lesson: the headline claimed "116/116 pass" while the latest
CORRECTNESS file held 110 entries — the count was synced from a pre-break
state by hand. This script derives every number it writes:

  - pass/checked:   the newest CORRECTNESS_r*.json in the repo root
                    (or a file passed via --correctness)
  - registered:     distinct "qNN_name" keys in src/main/scala/graft/queries/
                    (the maps SparkEntry.queries unions)
  - specs:          --specs N (copy the count from the `sbt test` summary line);
                    left untouched when not given

Usage: tools/sync_coverage.py [--correctness F] [--specs N] [--check]
  --check exits 1 (without writing) if COVERAGE.md's headline disagrees with
  the artifacts — usable as a drift gate.
"""
import argparse
import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
QUERY_SRC = REPO / "src/main/scala/graft/queries"


def registered_queries():
    keys = set()
    for f in QUERY_SRC.glob("*.scala"):
        keys.update(re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->', f.read_text()))
    return keys


def latest_correctness(explicit):
    if explicit:
        return pathlib.Path(explicit)
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if not files:
        sys.exit("no CORRECTNESS_r*.json found and no --correctness given")
    return files[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--correctness")
    ap.add_argument("--specs", type=int)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    cf = latest_correctness(args.correctness)
    rows = json.loads(cf.read_text())
    passed = sum(
        1
        for v in rows.values()
        if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
    )
    checked = len(rows)
    registered = registered_queries()
    absent = sorted(registered - set(rows))
    failed = sorted(
        k
        for k, v in rows.items()
        if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    )

    headline = (
        f"driver (`Verify` → DuckDB hash-compare): **{passed}/{checked} checked queries pass** "
        f"per `{cf.name}`, of **{len(registered)} registered**"
    )
    if absent:
        headline += f" ({len(absent)} absent from that round's artifact: {', '.join(absent)})"
    if failed:
        headline += f"; FAILING: {', '.join(failed)}"
    headline += "."

    cov = REPO / "COVERAGE.md"
    text = cov.read_text()
    # The headline sentence lives on the "driver (`Verify` ..." line; the spec
    # count on the "specs run under `sbt test`" fragment that follows it.
    spec_frag = (
        f"Specs run under `sbt test` (**{args.specs} green**)."
        if args.specs
        else None
    )
    pattern = re.compile(r"driver \(`Verify`[^\n]*\n?", re.S)
    m = pattern.search(text)
    if not m:
        sys.exit("COVERAGE.md headline anchor 'driver (`Verify`' not found")
    replacement = headline
    if spec_frag:
        replacement += " " + spec_frag
    else:
        # keep whatever spec-count sentence already follows on that line
        tail = re.search(r"[Ss]pecs run under `sbt test`[^.\n]*\.", m.group(0))
        if tail:
            replacement += " " + tail.group(0)
    replacement += "\n"
    new_text = text[: m.start()] + replacement + text[m.end():]

    if args.check:
        if new_text != text:
            print("COVERAGE.md headline is out of sync with artifacts:")
            print("  expected: " + replacement.strip())
            sys.exit(1)
        print("COVERAGE.md headline in sync")
        return

    cov.write_text(new_text)
    print("wrote headline: " + replacement.strip())


if __name__ == "__main__":
    main()
