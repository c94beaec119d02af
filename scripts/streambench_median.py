#!/usr/bin/env python3
"""Merge N StreamBench run JSONs into a per-pipeline median file.

StreamBench single runs are +/-20-30% noisy and drift up within one JVM
(later pipelines measure slower), so a committed single run invites noise
adjudication every round. This merges per-pipeline MEDIAN seconds across
separate JVM invocations (medianing across invocations also averages out
the within-run drift) and recomputes rows_per_sec from the median wall.

Usage: streambench_median.py out.json run1.json run2.json [run3.json ...]
"""
import json
import statistics
import sys


def main() -> None:
    out, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    if len(runs) < 2:
        sys.exit("need at least 2 run files")
    base = runs[0]
    merged = {k: v for k, v in base.items() if k != "pipelines"}
    merged["method"] = f"median_of_{len(runs)}"
    # union of pipeline names across runs (a newer run may carry rows an
    # older one predates — each name medians over the runs that have it)
    names = {}
    for r in runs:
        for name in r["pipelines"]:
            names.setdefault(name, None)
    pipes = {}
    for name in names:
        row = next(r["pipelines"][name] for r in runs if name in r["pipelines"])
        secs = [r["pipelines"][name]["sec"] for r in runs if name in r["pipelines"]]
        med = statistics.median(secs)
        rows = row.get("rows", base.get("rows"))
        pipes[name] = {
            "sec": round(med, 3),
            "rows_per_sec": round(rows / med, 3),
            "runs_sec": [round(s, 3) for s in secs],
        }
        if "rows" in row:
            pipes[name]["rows"] = row["rows"]
    merged["pipelines"] = pipes
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    for name, row in pipes.items():
        print(f"[median] {name}: {row['sec']} s ({row['rows_per_sec']} rows/s) "
              f"from {row['runs_sec']}")


if __name__ == "__main__":
    main()
