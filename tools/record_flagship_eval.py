"""Copy a flagship run's quantitative evaluation into the committed
record (benchmarks/flagship_eval_record.json) with provenance.

    python tools/record_flagship_eval.py --id cranio_r5 [--note "..."]

The north star requires "matched reconstruction-mm error and demo
classification accuracy" alongside the throughput record; outputs/ is
gitignored and driver-cleaned, so the committed copy is what the band
test (tests/test_golden.py::test_flagship_eval_record) pins. The run is
the full reference schedule (configurations/craniofacial.yaml: 600
epochs, batch 4, 17,039-vertex template) on the synthetic dataset.
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
    parser.add_argument("--note", type=str, default="")
    args = parser.parse_args()

    run_dir = os.path.join(args.output_path, "outputs", args.id)
    with open(os.path.join(run_dir, "eval_metrics.json")) as f:
        metrics = json.load(f)
    accs = {}
    acc_path = os.path.join(run_dir, "accuracies.json")
    if os.path.exists(acc_path):
        with open(acc_path) as f:
            accs = json.load(f)
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=REPO).stdout.strip()
    except Exception:
        rev = "unknown"

    record = {
        "run_id": args.id,
        "recon_errors_mm": metrics["recon_errors"],
        "diversity": metrics.get("diversity"),
        "accuracies": accs,
        "config": "configurations/craniofacial.yaml",
        "dataset": "tools/make_synthetic_dataset.py --out data_synth "
                   "--n 60",
        "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_rev": rev,
        "note": args.note,
    }
    out = os.path.join(REPO, "benchmarks", "flagship_eval_record.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"recorded recon {metrics['recon_errors']} → {out}")


if __name__ == "__main__":
    main()
