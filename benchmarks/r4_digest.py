"""Digest the round-4 TPU queue's logs into one compact report.

Reads benchmarks/logs/*.log (written by round4_tpu_queue.sh), pulls the
final JSON line (benches) or pytest summary (suites) from each, plus
recipe_ablation.json, and prints a single human-readable table — the
one-stop input for updating PERFORMANCE.md / MIGRATION.md after the
queue drains.

Run: python benchmarks/r4_digest.py   (no TPU needed)
"""

from __future__ import annotations

import json
import os
import re
import sys

LOGDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_json_line(path):
    try:
        with open(path, errors="replace") as f:
            lines = f.read().splitlines()
    except OSError:
        return None
    for line in reversed(lines):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def pytest_summary(path):
    try:
        with open(path, errors="replace") as f:
            txt = f.read()
    except OSError:
        return None
    m = re.findall(r"^(\d+ (?:passed|failed).*)$", txt, re.M)
    return m[-1] if m else (txt.splitlines()[-1] if txt else None)


def main():
    if not os.path.isdir(LOGDIR):
        print("no benchmarks/logs/ — queue has not run", file=sys.stderr)
        return 1

    def show(name, payload):
        print(f"\n== {name}")
        if payload is None:
            print("   (no result)")
        elif isinstance(payload, dict):
            for k, v in payload.items():
                print(f"   {k}: {v}")
        else:
            print(f"   {payload}")

    for name in ("parity", "suite"):
        show(name, pytest_summary(os.path.join(LOGDIR, f"{name}.log")))

    bench = last_json_line(os.path.join(LOGDIR, "bench.log"))
    show("bench", bench)

    for name in sorted(os.listdir(LOGDIR)):
        if name.startswith(("detprofile", "warpbench", "serving",
                            "detgen")) and name.endswith(".log"):
            show(name[:-4], last_json_line(os.path.join(LOGDIR, name)))

    ab = os.path.join(ROOT, "recipe_ablation.json")
    if os.path.exists(ab):
        with open(ab) as f:
            rows = json.load(f)
        print("\n== recipe ablations (val mAP / AP50 / train mAP)")
        for k, r in rows.items():
            print(f"   {k:24s} {r.get('val_mAP')!s:>8} "
                  f"{r.get('val_AP50')!s:>8} {r.get('train_mAP')!s:>8}  "
                  f"{r.get('overrides')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
