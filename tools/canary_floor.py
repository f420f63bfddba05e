"""Long-running canary-floor sampler: hunt for a genuinely quiet chip
window and record the minimum observed canary times.

    python tools/canary_floor.py [--hours 3] [--interval 120]
                                 [--out benchmarks/canary_floor.json]

The shared tunneled v5e has minutes-long (sometimes session-long)
noisy-neighbor episodes. bench.py's contention correction needs QUIET
denominators for its canaries; the matmul (2.1 ms) and thin-row gather
(1.4 ms) floors were measured in genuinely quiet round-1/2 windows, but
the HBM *stream* canary (benchmarks/_common.make_stream_canary) was added
during a contended stretch and its denominator is a spec-derived seed
(STREAM_QUIET_MS). This tool samples all three canaries every --interval
seconds for --hours, keeping the running minimum per canary — over a long
enough window the minimum converges on the true quiet floor. Output JSON:

    {"matmul_ms": ..., "gather_ms": ..., "stream_ms": ...,   # minima
     "best_stream_sample": {matmul_ms, gather_ms, stream_ms, utc},
     "n_samples": ..., "sampled_hours": ...}   # accumulated over resumes

best_stream_sample is the full concurrent sample at the lowest stream_ms
seen, so "stream floor measured while matmul sat at its known 2.1 ms
floor" is checkable from the file. bench.py uses the recorded stream_ms
floor as its quiet-window gate denominator; promote it into
benchmarks/_common.STREAM_QUIET_MS only with that concurrency evidence.

STEP-FLOOR BRACKET SANITY (round 5): the flagship step samples
(--step: step_ms / step_fp32_ms) are SLOPE-timed — contention easing
between the short and long scan runs can deflate the slope and produce a
fastest-ever "step" inside the noisiest-ever window (observed: a 15.60 ms
step sample whose concurrent matmul canary read 70 ms ≈ 23× quiet — a
timing artifact, not a floor). A step sample therefore only counts toward
the recorded step floors when its concurrent generic canaries are within
--sanity_factor (default 2×) of the best levels this chip has been
observed at; every step sample is kept as a candidate
("step_candidates"), the floors are re-resolved against the CURRENT
generic floors each tick (a candidate accepted early in a loud fresh
session is demoted once quieter windows reveal it was bracketed by
contention), and the fastest *rejected* sample is recorded separately
("best_step_sample_rejected") for the audit trail. The generic canaries
themselves are plain loop averages — contention can only make them
slower — so their running minima need no gating.

``--revalidate`` re-resolves an existing record against this policy
without sampling (no TPU needed): synthesizes candidates from the
recorded best samples, demotes any bracket-contended step floor, writes
the cleaned record, and exits.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GENERIC_KEYS = ("matmul_ms", "gather_ms", "stream_ms")
STEP_KEYS = ("step_ms", "step_fp32_ms")
MAX_CANDIDATES_PER_KEY = 25


def _utc_now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def _atomic_write_json(path: str, obj: dict):
    """bench.py reads this file while the sampler runs — never leave a
    torn write visible."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def candidate_bracket(cand: dict, floors: dict, sanity: float):
    """None when the candidate's concurrent generic canaries are all
    within ``sanity`` × the best observed level, else the name of the
    first canary that breaks the bracket."""
    for k in GENERIC_KEYS:
        ref = floors.get(k, float("inf"))
        v = cand.get(k)
        if v is None or not math.isfinite(ref):
            continue
        if v > sanity * ref:
            return k
    return None


def prune_candidates(cands: list) -> list:
    """Keep the union of the MAX_CANDIDATES_PER_KEY smallest candidates
    by each step key — everything else can never become a floor."""
    keep = set()
    for key in STEP_KEYS:
        ranked = sorted(
            (i for i, c in enumerate(cands)
             if isinstance(c.get(key), (int, float))),
            key=lambda i: cands[i][key])
        keep.update(ranked[:MAX_CANDIDATES_PER_KEY])
    return [c for i, c in enumerate(cands) if i in keep]


def resolve_step_record(cands: list, floors: dict, sanity: float):
    """(step_floors, best_sample, best_rejected) from the candidate list
    against the CURRENT generic floors. best_rejected is the fastest
    bracket-contended step sample when it beats every sane one — the
    audit-trail entry that says what the gate refused and why."""
    sane, insane = [], []
    for c in cands:
        (insane if candidate_bracket(c, floors, sanity) else sane).append(c)
    step_floors = {}
    for key in STEP_KEYS:
        vals = [c[key] for c in sane
                if isinstance(c.get(key), (int, float))]
        if vals:
            step_floors[key] = min(vals)
    stepped = [c for c in sane if isinstance(c.get("step_ms"),
                                             (int, float))]
    best = min(stepped, key=lambda c: c["step_ms"]) if stepped else None
    rejected = None
    r_stepped = [c for c in insane if isinstance(c.get("step_ms"),
                                                 (int, float))]
    if r_stepped:
        r = min(r_stepped, key=lambda c: c["step_ms"])
        if best is None or r["step_ms"] < best["step_ms"]:
            rejected = {**r, "rejected_canary":
                        candidate_bracket(r, floors, sanity)}
    return step_floors, best, rejected


def load_record(path: str):
    """Previous session state: (generic floors, legacy step floors,
    candidates, counters). Candidate provenance is synthesized from the
    recorded best samples for pre-round-5 files."""
    floors = {k: float("inf") for k in GENERIC_KEYS}
    legacy_step, cands, n, sampled_s = {}, [], 0, 0.0
    best_stream = None
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        for k, v in prev.items():
            if not (k.endswith("_ms") and isinstance(v, (int, float))):
                continue
            if k in STEP_KEYS:
                legacy_step[k] = v
            else:
                floors.setdefault(k, float("inf"))
                floors[k] = min(floors[k], v)
        n = int(prev.get("n_samples", 0))
        sampled_s = float(prev.get("sampled_hours", 0.0)) * 3600
        best_stream = prev.get("best_stream_sample")
        cands = [c for c in prev.get("step_candidates", [])
                 if isinstance(c, dict)]
        if not cands:
            for s in (prev.get("best_step_sample"),
                      prev.get("best_stream_sample")):
                if isinstance(s, dict) and any(k in s for k in STEP_KEYS):
                    cands.append({k: v for k, v in s.items()
                                  if k.endswith("_ms") or k == "utc"})
    return floors, legacy_step, cands, n, sampled_s, best_stream


def build_output(floors, legacy_step, cands, n, hours, best_stream,
                 sanity):
    step_floors, best_step, rejected = resolve_step_record(
        cands, floors, sanity)
    # a legacy floor with no candidate provenance cannot be validated —
    # carry it rather than lose a prior session's data; candidate-derived
    # values always take precedence (they are the validated record)
    merged_step = {**legacy_step, **step_floors}
    out = {**{k: round(v, 4) for k, v in floors.items()
              if math.isfinite(v)},
           **{k: round(v, 4) for k, v in merged_step.items()},
           "n_samples": n,
           "best_stream_sample": best_stream,
           "sampled_hours": round(hours, 2),
           "sanity_factor": sanity}
    if cands:
        out["step_candidates"] = cands
    if best_step is not None:
        out["best_step_sample"] = best_step
    if rejected is not None:
        out["best_step_sample_rejected"] = rejected
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--hours", type=float, default=3.0)
    parser.add_argument("--interval", type=float, default=120.0)
    parser.add_argument("--out", type=str,
                        default=os.path.join(REPO, "benchmarks",
                                             "canary_floor.json"))
    parser.add_argument("--step", action="store_true",
                        help="also sample the flagship scanned train step "
                        "(slope-timed ms/step) each interval — the running "
                        "minimum over bracket-sane samples is the MEASURED "
                        "quiet step floor that the bench headline and "
                        "roofline comparison need")
    parser.add_argument("--sanity_factor", type=float, default=2.0,
                        help="a step sample only counts toward the floor "
                        "when every concurrent generic canary is within "
                        "this factor of its best observed level (slope-"
                        "timed step readings under contended brackets are "
                        "artifacts)")
    parser.add_argument("--revalidate", action="store_true",
                        help="re-resolve the existing record against the "
                        "bracket-sanity policy and exit (no sampling, no "
                        "TPU)")
    parser.add_argument("--on_quiet", type=str, default=None,
                        help="shell command to run (bounded 30 min) when a "
                        "sample shows the step regime genuinely quiet "
                        "(fp32 step within --quiet_threshold of its "
                        "measured floor; requires --step) — the moment to "
                        "capture quiet-chip artifacts (roofline snapshot, "
                        "bench) that plateau weeks make unobtainable")
    parser.add_argument("--quiet_threshold", type=float, default=1.3)
    parser.add_argument("--on_quiet_cooldown_s", type=float, default=7200.0)
    args = parser.parse_args(argv)
    if args.on_quiet and not args.step:
        parser.error("--on_quiet requires --step (the fp32 step sample "
                     "is the quiet detector)")

    floors, legacy_step, cands, n, sampled_s, best_stream = \
        load_record(args.out)

    if args.revalidate:
        out = build_output(floors, legacy_step, cands, n,
                           sampled_s / 3600, best_stream,
                           args.sanity_factor)
        _atomic_write_json(args.out, out)
        kept = {k: out.get(k) for k in STEP_KEYS if k in out}
        rej = out.get("best_step_sample_rejected")
        print(f"[floor] revalidated {args.out}: step floors {kept}"
              + (f"; rejected {rej['step_ms']:.3f} ms sample "
                 f"(bracket: {rej['rejected_canary']})" if rej else ""),
              flush=True)
        return

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    if jax.devices()[0].platform != "tpu":
        raise SystemExit("canary_floor: default platform is not TPU — "
                         "refusing to record host-CPU floors")
    import numpy as np

    from benchmarks._common import (make_ell_gather_canary,
                                    make_flagship_step_timer,
                                    make_matmul_canary, make_stream_canary)

    rng = np.random.default_rng(0)
    canaries = {"matmul_ms": make_matmul_canary(rng),
                "gather_ms": make_ell_gather_canary(rng),
                "stream_ms": make_stream_canary(rng)}
    if args.step:
        from benchmarks._common import FP32_STEP_QUIET_MS
        canaries["step_ms"] = make_flagship_step_timer(rng)
        # the fp32 formulation too: its quiet floor is the step-regime
        # contention denominator bench.py normalizes with — a sampled
        # floor at ~FP32_STEP_QUIET_MS validates that anchor directly
        canaries["step_fp32_ms"] = make_flagship_step_timer(
            rng, compute_dtype="float32")

    last_quiet_run = None       # --on_quiet cooldown anchor (None =
    # never ran, so the first quiet window always triggers)
    t_start = time.time()
    t_end = t_start + args.hours * 3600

    def current_step_floor(key):
        sf, _, _ = resolve_step_record(cands, floors, args.sanity_factor)
        return sf.get(key, legacy_step.get(key, float("inf")))

    while time.time() < t_end:
        sample = {}
        try:
            for k, fn in canaries.items():
                sample[k] = fn()
        except Exception as e:  # tunnel dropped mid-sample — wait it out
            print(f"[floor] sample failed ({type(e).__name__}: {e}); "
                  "retrying next interval", flush=True)
            time.sleep(args.interval)
            continue
        n += 1
        # pre-update fp32 floor: the on_quiet "dramatic improvement"
        # detector compares the new sample against what was known BEFORE
        prev_fp32_floor = current_step_floor("step_fp32_ms")
        improved = [k for k in sample if k in floors
                    and sample[k] < floors[k]]
        for k in improved:
            floors[k] = sample[k]
        if best_stream is None \
                or sample["stream_ms"] < best_stream["stream_ms"]:
            best_stream = {
                **{k: round(v, 4) for k, v in sample.items()},
                "utc": _utc_now()}
        if any(k in sample for k in STEP_KEYS):
            cands.append({**{k: round(v, 4) for k, v in sample.items()},
                          "utc": _utc_now()})
            cands = prune_candidates(cands)
        line = "  ".join(f"{k} {sample[k]:.3f}" for k in sample)
        bracket = candidate_bracket(sample, floors, args.sanity_factor)
        print(f"[floor] #{n} {line}"
              + (f"  ← new floor: {','.join(improved)}" if improved else "")
              + (f"  [step bracket contended: {bracket}]"
                 if bracket and args.step else ""),
              flush=True)
        hours = (sampled_s + time.time() - t_start) / 3600
        out = build_output(floors, legacy_step, cands, n, hours,
                           best_stream, args.sanity_factor)
        _atomic_write_json(args.out, out)
        # quiet-window opportunist: the plateau can last whole sessions,
        # so when the step regime IS quiet, immediately capture the
        # artifacts that need a quiet chip (see --on_quiet). Fires on
        # EITHER detector: near the quiet anchor (genuine quiet — the
        # anchor is derived, so this may never trigger on a chip that
        # never clears), OR dramatically below the best level this
        # sampler has itself recorded (<70% of the observed floor) — a
        # regime improvement worth capturing even if still above the
        # anchor. Bracket-contended samples never trigger it: a slope
        # artifact must not capture "quiet-chip" artifacts on a loud chip.
        if args.on_quiet and "step_fp32_ms" in sample and bracket is None \
                and (sample["step_fp32_ms"] / FP32_STEP_QUIET_MS
                     <= args.quiet_threshold
                     or (math.isfinite(prev_fp32_floor)
                         and sample["step_fp32_ms"]
                         < 0.7 * prev_fp32_floor)) \
                and (last_quiet_run is None or time.time() - last_quiet_run
                     > args.on_quiet_cooldown_s):
            last_quiet_run = time.time()
            print(f"[floor] QUIET WINDOW (fp32 step "
                  f"{sample['step_fp32_ms']:.2f} ms ≤ "
                  f"{args.quiet_threshold}×{FP32_STEP_QUIET_MS}) — "
                  f"running: {args.on_quiet}", flush=True)
            try:
                res = subprocess.run(args.on_quiet, shell=True,
                                     capture_output=True, text=True,
                                     timeout=1800, cwd=REPO)
                tail = "\n".join((res.stdout + res.stderr)
                                 .strip().splitlines()[-6:])
                print(f"[floor] on_quiet exit {res.returncode}:\n{tail}",
                      flush=True)
            except subprocess.TimeoutExpired:
                print("[floor] on_quiet timed out after 30 min", flush=True)
        time.sleep(args.interval)

    print(f"[floor] done: {n} samples, floors "
          + ", ".join(f"{k}={v:.3f}" for k, v in floors.items()
                      if math.isfinite(v)), flush=True)


if __name__ == "__main__":
    main()
