#!/usr/bin/env python
"""Merge evaluation report.json files from multiple hosts/jobs.

Each pod host (or manually-sharded job, --subset_start/--subset_end) writes
its own `report.json` (evaluation.py) with per-run {avg_psnr, num_samples,
wall_seconds}. This merges them into global sample-weighted numbers:

  python tools/aggregate_reports.py host0/report.json host1/report.json

Prints one merged JSON report; runs missing from some hosts aggregate over
the hosts that ran them.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def aggregate(reports: list[dict]) -> dict:
    acc = defaultdict(lambda: {"psnr_sum": 0.0, "n": 0, "wall": 0.0,
                               "errors": []})
    for rep in reports:
        for run, stats in rep.items():
            a = acc[run]
            if "error" in stats:
                a["errors"].append(stats["error"])
                continue
            n = int(stats.get("num_samples", 0))
            a["psnr_sum"] += float(stats.get("avg_psnr", 0.0)) * n
            a["n"] += n
            a["wall"] = max(a["wall"], float(stats.get("wall_seconds", 0.0)))

    out = {}
    for run, a in sorted(acc.items()):
        # uniform schema even when every host errored (num_samples == 0)
        entry = dict(
            avg_psnr=a["psnr_sum"] / a["n"] if a["n"] else None,
            num_samples=a["n"],
            # hosts run concurrently: global wall = slowest host
            wall_seconds=a["wall"],
            images_per_second=a["n"] / a["wall"] if a["wall"] else 0.0,
        )
        if a["errors"]:
            entry["errors"] = a["errors"]
        out[run] = entry
    return out


def main(argv=None):
    paths = argv if argv is not None else sys.argv[1:]
    if not paths:
        print(__doc__)
        return None
    merged = aggregate([json.load(open(p)) for p in paths])
    print(json.dumps(merged, indent=2))
    return merged


if __name__ == "__main__":
    main()
