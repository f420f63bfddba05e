"""Copy a hard-benchmark run's test-set results into the committed record
(benchmarks/hard_benchmark_record.json) with provenance.

    python tools/record_hard_benchmark.py --id cranio_hard \
        [--separation 6] [--note "..."]

outputs/ is gitignored (run dirs are large and driver-cleaned), so the
regression band test (tests/test_hard_synthetic.py::
test_flagship_hard_record_bands) pins on this committed copy instead.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--id", type=str, required=True)
    parser.add_argument("--output_path", type=str, default=REPO)
    parser.add_argument("--separation", type=float, default=None)
    parser.add_argument("--note", type=str, default="")
    args = parser.parse_args()

    run_dir = os.path.join(args.output_path, "outputs", args.id)
    with open(os.path.join(run_dir, "accuracies.json")) as f:
        accs = json.load(f)
    report_path = os.path.join(run_dir, "classification_report.json")
    reports = {}
    if os.path.exists(report_path):
        with open(report_path) as f:
            reports = json.load(f)
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=REPO).stdout.strip()
    except Exception:
        rev = "unknown"

    record = {
        "run_id": args.id,
        "accuracies": accs,
        "per_class_f1": {name: {cls: round(r["f1-score"], 4)
                                for cls, r in rep.items()
                                if isinstance(r, dict) and len(cls) == 1}
                         for name, rep in reports.items()},
        "config": "configurations/craniofacial_hard.yaml",
        "dataset": "tools/make_synthetic_dataset.py --out data_hard "
                   "--n 200 --hard"
                   + (f" --separation {args.separation}"
                      if args.separation is not None else ""),
        "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_rev": rev,
        "note": args.note,
    }
    out = os.path.join(REPO, "benchmarks", "hard_benchmark_record.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"recorded {accs} → {out}")


if __name__ == "__main__":
    main()
