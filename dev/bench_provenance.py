#!/usr/bin/env python3
"""Bench-number provenance check (r8 verdict item #8).

Sweep totals on this VM swing 160-245 s same-build, so a quoted number
is only meaningful together with WHICH run produced it.  This check
enforces the mechanical half of that discipline:

  1. every "measured results" section in BASELINE.md must name its
     source run file (a `BENCH_r*.json` / `BENCH_DETAIL.json` mention,
     or an explicit run label like "close-out sweep" / "quiet-machine
     run" / "mid-round ... run" tying the table to a named run in the
     section prose);
  2. REPORT.md must open with a `Source:` line naming its input file;
  3. every run file named anywhere in BASELINE.md / REPORT.md must
     exist in the repo (no dangling provenance).

Run from the repo root:  python3 dev/bench_provenance.py
Exit 0 = clean, 1 = violations (listed on stdout).
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_FILE = re.compile(r"BENCH_(?:r\d+|DETAIL)[a-z0-9_]*\.json", re.I)
# Prose run labels that count as naming a run when a section also
# anchors them ("close-out sweep", "quiet-machine run", ...).
RUN_LABEL = re.compile(
    r"close-out (?:run|sweep|detail)|quiet(?:-machine)?(?: |-)run|"
    r"mid-round [a-z-]*\s*run|committed BENCH_DETAIL", re.I)


def sections(md):
    """(header, body) pairs for every '## ' section."""
    out, cur, buf = [], None, []
    for line in md.splitlines():
        if line.startswith("## "):
            if cur is not None:
                out.append((cur, "\n".join(buf)))
            cur, buf = line[3:].strip(), []
        elif cur is not None:
            buf.append(line)
    if cur is not None:
        out.append((cur, "\n".join(buf)))
    return out


def main():
    problems = []
    named_files = set()

    baseline = open(os.path.join(ROOT, "BASELINE.md")).read()
    for header, body in sections(baseline):
        if "measured results" not in header.lower():
            continue
        named_files.update(RUN_FILE.findall(body))
        if not (RUN_FILE.search(body) or RUN_LABEL.search(body)):
            problems.append(
                f"BASELINE.md section '{header}' quotes numbers without "
                "naming a source run file or run label")

    report_path = os.path.join(ROOT, "REPORT.md")
    if os.path.exists(report_path):
        report = open(report_path).read()
        named_files.update(RUN_FILE.findall(report))
        head = "\n".join(report.splitlines()[:6])
        if not re.search(r"^Source:.*\.json", head, re.M):
            problems.append(
                "REPORT.md does not open with a 'Source: <file>.json' line")

    for f in sorted(named_files):
        if not os.path.exists(os.path.join(ROOT, f)):
            problems.append(f"named run file does not exist in repo: {f}")

    if problems:
        print("bench provenance: %d problem(s)" % len(problems))
        for p in problems:
            print("  - " + p)
        return 1
    print("bench provenance: clean (%d run files referenced, all present)"
          % len(named_files))
    return 0


if __name__ == "__main__":
    sys.exit(main())
