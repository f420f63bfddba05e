"""HTTP serving for a trained run — the deployment entry point.

    python tools/serve.py --id=run1 [--output_path=.] [--port 8008]
    python tools/serve.py --id=ens1          # ensemble dir (ensemble.json
                                             # present): /diagnose returns the
                                             # cross-member consensus; single-
                                             # model endpoints 400 toward the
                                             # member run dirs
                          [--max_batch 16] [--platform cpu] [--no_warmup]

Endpoints (JSON in/out; vertices may also be posted as a raw .npy body
with Content-Type: application/octet-stream):

    GET  /healthz       → {"ok": true, ...service stats}
    POST /encode        {"vertices": [[x,y,z]...] | [[[x,y,z]...]...]}
                        → {"latent": [[...]...]}
    POST /diagnose      same body (+ optional "model": qda|lda|svm|mlp,
                        "n_samples": K, "seed") → per-mesh {label,
                        posteriors, mahalanobis, latent}; n_samples > 0
                        (VAE runs) adds an "uncertainty" block — the
                        encoder posterior sampled K times, every sample
                        classified: label agreement, vote counts,
                        posterior mean/std, predictive entropy
    POST /saliency      same body (+ optional "model",
                        "include_vertex_saliency": false) → per-mesh
                        diagnosis + gradient attribution: saliency_label
                        vs saliency_reference_class margin, per-region
                        attribution table, per-vertex nats/mm map
    POST /reconstruct   same body → {vertices, vertex_errors_mm,
                        mean_error_mm, latent}
    POST /decode        {"latent": [[...]...]} → {"vertices": ...}
    POST /fit           {"vertices": [[x,y,z]...] (UNREGISTERED scan, any
                        count), "landmarks": [[x,y,z]×K] (the template
                        landmark set picked on the scan), optional lr/
                        iterations/n_restarts/seed/model} → {z, vertices,
                        chamfer_mm2, landmark_mse_mm2, aligned_scan,
                        diagnosis} — the full clinical intake workflow
    POST /plan          {"vertices": [[x,y,z]...] (ONE registered patient
                        mesh) | "latent": [...], optional n_p_to_3std/
                        n_linspace/model/decode_key_meshes/include_paths}
                        → {diagnosis, z_patient, z_3std/z_2std/z_1std/
                        z_mean_target, procedure_distances, target_meshes}
                        — surgical planning (reference test.py:652-748)

The service pads every request to a static batch bucket so XLA programs
are compiled once per bucket (at startup, unless --no_warmup) and reused
for every request — see craniofacialsd_vae_tpu/serving.py.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _json_default(o):
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    raise TypeError(f"not serializable: {type(o)}")


def make_handler(service):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stats via /healthz
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload, default=_json_default).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            ctype = self.headers.get("Content-Type", "application/json")
            if ctype.startswith("application/octet-stream"):
                arr = np.load(io.BytesIO(raw), allow_pickle=False)
                return {"vertices": arr}
            return json.loads(raw or b"{}")

        def do_GET(self):
            if self.path == "/healthz":
                stats = service.stats()
                stats["ok"] = True
                self._reply(200, stats)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                body = self._read_body()
                if self.path == "/encode":
                    mu = service.encode(np.asarray(body["vertices"],
                                                   np.float32))
                    self._reply(200, {"latent": mu})
                elif self.path == "/diagnose":
                    opts = body if isinstance(body, dict) else {}
                    reports = service.diagnose(
                        np.asarray(body["vertices"], np.float32),
                        model=opts.get("model", "qda"),
                        n_samples=int(opts.get("n_samples", 0)),
                        seed=int(opts.get("seed", 0)))
                    self._reply(200, {"reports": reports})
                elif self.path == "/saliency":
                    reports = service.saliency(
                        np.asarray(body["vertices"], np.float32),
                        include_vertex_saliency=bool(
                            body.get("include_vertex_saliency", True))
                        if isinstance(body, dict) else True,
                        model=body.get("model", "qda")
                        if isinstance(body, dict) else "qda")
                    self._reply(200, {"reports": reports})
                elif self.path == "/reconstruct":
                    out = service.reconstruct(
                        np.asarray(body["vertices"], np.float32))
                    self._reply(200, out)
                elif self.path == "/decode":
                    out = service.decode(np.asarray(body["latent"],
                                                    np.float32))
                    self._reply(200, {"vertices": out})
                elif self.path == "/fit":
                    out = service.fit(
                        np.asarray(body["vertices"], np.float32),
                        np.asarray(body["landmarks"], np.float32),
                        lr=float(body.get("lr", 5e-3)),
                        iterations=int(body.get("iterations", 250)),
                        n_restarts=int(body.get("n_restarts", 16)),
                        seed=int(body.get("seed", 0)),
                        model=body.get("model", "qda"))
                    self._reply(200, out)
                elif self.path == "/plan":
                    out = service.plan(
                        vertices=(np.asarray(body["vertices"], np.float32)
                                  if "vertices" in body else None),
                        latent=(np.asarray(body["latent"], np.float32)
                                if "latent" in body else None),
                        n_p_to_3std=int(body.get("n_p_to_3std", 8)),
                        n_linspace=int(body.get("n_linspace", 5000)),
                        model=body.get("model", "qda"),
                        decode_key_meshes=bool(
                            body.get("decode_key_meshes", True)),
                        include_paths=bool(body.get("include_paths",
                                                    False)))
                    self._reply(200, out)
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # surface errors to the client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--id", type=str, default=None)
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--run_dir", type=str, default=None,
                        help="explicit run dir (overrides --id)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--max_batch", type=int, default=16)
    parser.add_argument("--healthy_class", type=str, default="n")
    parser.add_argument("--no_warmup", action="store_true")
    parser.add_argument("--warm_fit", action="store_true",
                        help="also compile the fit-intake program at "
                             "startup (the service's largest compile — "
                             "minutes on a cold cache; one bucket serves "
                             "every scan size that subsamples into it)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard each request's batch axis over ALL "
                             "visible devices (params replicated) — batch "
                             "screening throughput scales with the chip "
                             "mesh; max_batch must be a multiple of the "
                             "device count")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu); the axon "
                             "TPU plugin ignores JAX_PLATFORMS")
    args = parser.parse_args(argv)

    run_dir = args.run_dir or os.path.join(args.output_path, "outputs",
                                           args.id or "")
    if not args.run_dir and not args.id:
        parser.error("--id or --run_dir required")

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    setup_jax(platform=args.platform)
    from craniofacialsd_vae_tpu.serving import (DiagnosisService,
                                                EnsembleService)

    if os.path.exists(os.path.join(run_dir, "ensemble.json")):
        # a tools/train_ensemble.py output dir: consensus /diagnose over
        # all members; single-model endpoints 400 with a pointer to the
        # member run dirs
        service = EnsembleService.from_ensemble_dir(
            run_dir, healthy_class=args.healthy_class,
            max_batch=args.max_batch, warm=not args.no_warmup,
            data_parallel=args.data_parallel)
        print(f"ensemble of {service.n_members} members", flush=True)
    else:
        service = DiagnosisService.from_run_dir(
            run_dir, healthy_class=args.healthy_class,
            max_batch=args.max_batch, warm=not args.no_warmup,
            data_parallel=args.data_parallel)
    if args.warm_fit:
        if isinstance(service, EnsembleService):
            print("--warm_fit skipped: fit is a single-model request — "
                  "serve a member run dir for the fit intake", flush=True)
        else:
            import time as _time
            t0 = _time.time()
            service.warmup_fit()
            print(f"fit program warm ({_time.time() - t0:.0f}s)",
                  flush=True)

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    import jax
    print(f"serving {run_dir} on http://{args.host}:{server.server_port} "
          f"({jax.devices()[0].platform}, buckets {service.buckets})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
