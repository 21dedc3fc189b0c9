#!/usr/bin/env python3
"""Retry pass for SCALECHECKS.md: every non-ok row (NOT-RUN / NO-OUTPUT)
is re-run ALONE in its own subprocess with the full per-query timeout,
and the table row is patched in place. A chunked sweep can lose 3
innocent queries to one slow chunk-mate; this pass gives each one its
own clock. Queries that still cannot finish stay honestly NOT-RUN.

Usage: python3 scripts/scale_retry.py [sf_dir] [timeout_s] [md_file]
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TIMEOUT = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
PATH = os.path.join(REPO, sys.argv[3] if len(sys.argv) > 3 else "SCALECHECKS.md")


def main():
    with open(PATH) as fh:
        lines = fh.read().splitlines()
    row_re = re.compile(r"^\| (\d+) \| (\S+) \| (\S+) \| (.*) \|$")
    retry = []
    for i, ln in enumerate(lines):
        m = row_re.match(ln)
        if m and m.group(3) != "ok":
            retry.append((i, m.group(1), m.group(2)))
    print(f"retrying {len(retry)} non-ok rows singly (timeout {TIMEOUT}s each)")
    for i, pos, name in retry:
        out = ""
        timed_out = False
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "scripts", "check_queries.py"),
                    SF,
                    name,
                ],
                capture_output=True,
                text=True,
                timeout=TIMEOUT,
            )
            out = proc.stdout
        except subprocess.TimeoutExpired as e:
            timed_out = True
            out = (e.stdout or b"").decode("utf-8", "replace") if isinstance(
                e.stdout, bytes
            ) else (e.stdout or "")
        m = re.search(rf"RESULT {re.escape(name)} (ok rows=(\d+)|MISMATCH.*)", out)
        if m and m.group(1).startswith("ok"):
            lines[i] = f"| {pos} | {name} | ok | {m.group(2)} (solo retry) |"
            print(f"RETRY {name} ok rows={m.group(2)}")
        elif m:
            lines[i] = f"| {pos} | {name} | MISMATCH | {m.group(1)[:160]} |"
            print(f"RETRY {name} MISMATCH")
        else:
            why = f"solo timeout {TIMEOUT}s" if timed_out else "solo: no output"
            lines[i] = f"| {pos} | {name} | NOT-RUN | {why} |"
            print(f"RETRY {name} still NOT-RUN ({why})")
    # refresh the headline ok-count
    n_ok = sum(1 for ln in lines if row_re.match(ln) and row_re.match(ln).group(3) == "ok")
    n_all = sum(1 for ln in lines if row_re.match(ln))
    for i, ln in enumerate(lines):
        if ln.startswith("**") and "ok**" in ln:
            lines[i] = f"**{n_ok}/{n_all} ok** ({n_all - n_ok} other)"
            break
    with open(PATH, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"RESULT SCALECHECKS.md {n_ok}/{n_all} ok after retry")


if __name__ == "__main__":
    main()
