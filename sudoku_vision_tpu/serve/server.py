"""HTTP inference server: frames in, recognized + solved grids out.

Deployment-frontend parity (reference web/src/main.ts capture->process
flow :237 and ios ScanPipeline.processFrame :110): POST an image, get
back the recognized 81-digit grid, per-cell confidences, top-3
alternatives, corners, solution and timings as JSON.

Serving design (TPU-first):
  * Shape bucketing — every request is letterboxed on host to ONE
    canonical resolution, so the device graph compiles once per batch
    bucket instead of once per client resolution (arbitrary camera
    sizes would otherwise stall minutes per novel shape).
  * A dynamic micro-batcher coalesces concurrent requests into one
    padded device batch (condition-variable queue, N-ms window, padded
    to a compiled bucket size) — the TPU graph is batched and a lone
    frame wastes most of its throughput.
  * Real probabilities — the graph returns the (81, 10) softmax, so the
    beam-search conflict resolver consumes true top-k alternatives
    (reference run_v2's predict_cells_with_alternatives, run_v2.py:149)
    and the client gets alternatives for its correction UI.
  * Multi-chip — with >1 visible device the batched graph is sharded
    over the mesh's "data" axis (parallel/shard.py); buckets are
    multiples of the data-axis size.

Endpoints:
  POST /scan      body: image file (jpeg/png)  -> full pipeline JSON
  POST /scan?session=<id>  streaming session: the server keeps Kalman
                  stabilizer + motion-detector + identical-grids-gate
                  state across the client's frame stream and fires the
                  solve ONCE per stable segment (the reference's live
                  loop: ios ScanPipeline.swift:245 3-stable-frames gate,
                  web main.ts:183 rAF loop, cv/stabilizer.py:161).
                  Once locked + motionless, frames ride the
                  detection-free fast graph (temporal reuse,
                  pipeline/graph.py::perceive_at); add &pipeline=1 to
                  double-buffer dispatch (results lag one frame, the
                  device round-trip overlaps the client's next capture)
  POST /solve     body: {"puzzle": "81 chars"} -> solver-only JSON
  GET  /healthz   liveness + device + bucket warmup info
  GET  /          the scanner page (static/scanner.html)

Run:
    python -m sudoku_vision_tpu.serve.server [--port 8602] [--model v3]

stdlib http.server only — zero new dependencies; the host side is IO
glue, all compute is the jitted graph + the C++ solver.
"""

from __future__ import annotations

import argparse
import collections
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

DEFAULT_CANONICAL = (1512, 2016)  # (H, W): golden-image half scale, 4:3
PAD_GRAY = 131  # flat filler tone; featureless for the line lattice


def letterbox(img: np.ndarray, canonical: tuple[int, int]):
    """Scale-to-fit + pad an (h, w, 3) uint8 BGR image to canonical (H, W).

    Returns (canvas, scale, (off_x, off_y)) such that
    x_orig = (x_canvas - off_x) / scale.
    """
    from PIL import Image

    ch, cw = canonical
    h, w = img.shape[:2]
    scale = min(cw / w, ch / h)
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    if (nw, nh) != (w, h):
        pil = Image.fromarray(img[..., ::-1]).resize((nw, nh),
                                                     Image.BILINEAR)
        resized = np.asarray(pil)[..., ::-1]
    else:
        resized = img
    canvas = np.full((ch, cw, 3), PAD_GRAY, np.uint8)
    off_x = (cw - nw) // 2
    off_y = (ch - nh) // 2
    canvas[off_y:off_y + nh, off_x:off_x + nw] = resized
    return canvas, scale, (off_x, off_y)


class MicroBatcher:
    """Coalesces concurrent submissions into padded device batches.

    One worker thread drains a condition-variable queue: it takes the
    first pending frame, collects more for up to `window_ms`, pads the
    batch to the smallest compiled bucket, runs ONE device call, and
    fans results back out. `n_coalesced` in each result records how many
    real frames shared the call (the load test asserts > 1 under
    concurrency).
    """

    def __init__(self, runner, buckets, window_ms: float = 6.0):
        self._runner = runner          # (B, H, W, 3) np.uint8 -> tuple of np arrays
        self._buckets = sorted(buckets)
        self._window = window_ms / 1e3
        self._q: collections.deque = collections.deque()
        self._cv = threading.Condition()
        self._stats = {"calls": 0, "frames": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, frame: np.ndarray):
        slot = {"event": threading.Event()}
        with self._cv:
            self._q.append((frame, slot))
            self._cv.notify()
        slot["event"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["out"]

    @property
    def stats(self):
        s = dict(self._stats)
        s["avg_frames_per_call"] = (
            round(s["frames"] / s["calls"], 2) if s["calls"] else 0.0)
        return s

    def _loop(self):
        while True:
            with self._cv:
                while not self._q:
                    self._cv.wait()
                batch = [self._q.popleft()]
            deadline = time.monotonic() + self._window
            max_b = self._buckets[-1]
            while len(batch) < max_b:
                remaining = deadline - time.monotonic()
                with self._cv:
                    if self._q:
                        batch.append(self._q.popleft())
                        continue
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                    if self._q:
                        batch.append(self._q.popleft())
            frames = [f for f, _ in batch]
            bucket = next(b for b in self._buckets if b >= len(frames))
            padded = frames + [frames[0]] * (bucket - len(frames))
            try:
                # A payload may be a TUPLE of per-frame arrays (the
                # temporal-reuse fast path ships frame + corners +
                # boundaries); each component stacks independently.
                if isinstance(padded[0], tuple):
                    outs = self._runner(*(
                        np.stack([p[k] for p in padded])
                        for k in range(len(padded[0]))))
                else:
                    outs = self._runner(np.stack(padded))
            except Exception as e:  # propagate to every waiter
                for _, slot in batch:
                    slot["error"] = e
                    slot["event"].set()
                continue
            self._stats["calls"] += 1
            self._stats["frames"] += len(frames)
            for i, (_, slot) in enumerate(batch):
                slot["out"] = tuple(o[i] for o in outs) + (len(frames),)
                slot["event"].set()


class InferenceEngine:
    """Owns the jitted batched graph, buckets, and the micro-batcher."""

    def __init__(self, model_name: str = "v3",
                 canonical: tuple[int, int] = DEFAULT_CANONICAL,
                 buckets=(1, 2, 4, 8), window_ms: float = 6.0,
                 prewarm: bool = True, orient: str = "fixed",
                 n_devices: int | None = None):
        import jax

        from sudoku_vision_tpu.pipeline.run_v2 import load_model

        (self.model, self.variables, self.temperature, self.ckpt,
         self.use_clahe) = load_model(model_name)
        from sudoku_vision_tpu.ml.disambig17 import load_aux17

        # 1v7 specialist (ml/disambig17.py): blended in-graph for
        # low-confidence {1,7} reads; trained on the no-CLAHE preproc.
        self.aux17 = load_aux17() if not self.use_clahe else None
        self.canonical = canonical
        # "auto" classifies all 4 quarter-turn readings (sideways /
        # upside-down phones) for ~3 extra CNN passes per frame.
        self.orient = orient
        self._fns: dict[int, object] = {}
        self._fn_lock = threading.Lock()
        self._warm: set[int] = set()

        # n_devices=1 forces the single-device graphs on a multi-device
        # host (the virtual-mesh CI exercising the pipelined path).
        self.n_devices = (len(jax.devices()) if n_devices is None
                          else n_devices)
        if self.n_devices > 1:
            from sudoku_vision_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(self.n_devices, model=1)
            step = self.n_devices
            buckets = sorted({max(b, step) - max(b, step) % step or step
                              for b in buckets})
        else:
            self.mesh = None
        self.buckets = tuple(sorted(set(buckets)))
        self.batcher = MicroBatcher(self._run_batch, self.buckets, window_ms)
        self.fast_batcher = MicroBatcher(self._run_batch_at, self.buckets,
                                         window_ms)
        if prewarm:
            threading.Thread(target=self._prewarm, daemon=True).start()

    # -- device side ------------------------------------------------------

    def _fn_for(self, b: int):
        import jax
        import jax.numpy as jnp

        from sudoku_vision_tpu.pipeline.graph import perceive

        with self._fn_lock:
            if b in self._fns:
                return self._fns[b]
            model, variables = self.model, self.variables
            t = jnp.float32(self.temperature)
            uc = self.use_clahe
            if self.mesh is not None:
                from sudoku_vision_tpu.parallel.shard import (
                    sharded_perceive_fn,
                )

                fn, _ = sharded_perceive_fn(
                    model, variables, self.mesh,
                    temperature=self.temperature, use_clahe=uc,
                    orient=self.orient, packed_bgr=True,
                    aux17=self.aux17)
            else:
                orient = self.orient

                aux17 = self.aux17

                @jax.jit
                def fn(imgs):
                    out = jax.vmap(lambda im: perceive(
                        im, model, variables, temperature=t,
                        use_clahe=uc, orient=orient,
                        packed_bgr=True, aux17=aux17))(imgs)
                    return (out.digits, out.confidence, out.probs,
                            out.corners, out.grid_found,
                            out.boundaries_y, out.boundaries_x)

            self._fns[b] = fn
            return fn

    def _fn_at_for(self, b: int):
        """Jitted temporal-reuse graph: warp -> extract -> CNN at GIVEN
        corners + boundaries (detection skipped; see
        pipeline/graph.py::perceive_at)."""
        import jax

        from sudoku_vision_tpu.pipeline.graph import perceive_at

        with self._fn_lock:
            key = ("at", b)
            if key in self._fns:
                return self._fns[key]
            model, variables = self.model, self.variables
            import jax.numpy as jnp

            t = jnp.float32(self.temperature)
            uc = self.use_clahe
            if self.mesh is not None:
                from sudoku_vision_tpu.parallel.shard import (
                    sharded_perceive_at_fn,
                )

                fn, _ = sharded_perceive_at_fn(
                    model, variables, self.mesh,
                    temperature=self.temperature, use_clahe=uc,
                    packed_bgr=True, aux17=self.aux17)
            else:
                aux17 = self.aux17

                @jax.jit
                def fn(imgs, corners, bys, bxs):
                    out = jax.vmap(lambda im, c, by, bx: perceive_at(
                        im, c, by, bx, model, variables, temperature=t,
                        use_clahe=uc, packed_bgr=True,
                        aux17=aux17))(imgs, corners, bys, bxs)
                    return out.digits, out.confidence, out.probs

            self._fns[key] = fn
            return fn

    def _run_batch(self, frames: np.ndarray):
        """(B, H, W, 3) uint8 -> tuple of host np arrays (one device call)."""
        import jax.numpy as jnp

        b, fh, fw = frames.shape[:3]
        fn = self._fn_for(b)
        # Row-packed BGR: free on the host ndarray, lands on device in
        # the Pallas gray+pool streaming layout (ops/pallas_pool.py).
        dev = jnp.asarray(frames.reshape(b, fh, fw * 3))
        if self.mesh is not None:
            from sudoku_vision_tpu.parallel.shard import device_put_frames

            dev = device_put_frames(dev, self.mesh)
        digits, conf, probs, corners, found, bys, bxs = fn(dev)
        # One fetch per output; np.asarray is the sync point (axon's
        # block_until_ready is a no-op — always fetch what you need).
        return (np.asarray(digits), np.asarray(conf), np.asarray(probs),
                np.asarray(corners), np.asarray(found),
                np.asarray(bys), np.asarray(bxs))

    def _run_batch_at(self, frames: np.ndarray, corners: np.ndarray,
                      bys: np.ndarray, bxs: np.ndarray):
        """Temporal-reuse device call: detection skipped."""
        import jax.numpy as jnp

        b, fh, fw = frames.shape[:3]
        fn = self._fn_at_for(b)
        args = (jnp.asarray(frames.reshape(b, fh, fw * 3)),
                jnp.asarray(corners, jnp.float32),
                jnp.asarray(bys, jnp.float32),
                jnp.asarray(bxs, jnp.float32))
        if self.mesh is not None:
            from sudoku_vision_tpu.parallel.shard import device_put_frames

            args = tuple(device_put_frames(a, self.mesh) for a in args)
        digits, conf, probs = fn(*args)
        return (np.asarray(digits), np.asarray(conf), np.asarray(probs))

    @property
    def supports_fast_path(self) -> bool:
        """Temporal reuse is fixed-orientation only: a locked scene's
        orientation was resolved at lock time, and orient='auto'
        engines keep the full graph."""
        return self.orient == "fixed"

    @property
    def supports_pipelined(self) -> bool:
        """Pipelined sessions dispatch single frames directly (no
        micro-batching), which needs the single-device graphs — mesh
        buckets start at n_devices."""
        return self.mesh is None

    def dispatch_frame(self, canvas: np.ndarray, locked: dict | None):
        """ASYNC single-frame dispatch: returns device handles
        immediately (jax dispatch is asynchronous); the caller fetches
        with np.asarray when the NEXT frame arrives. This is the
        double-buffered live path: the measured ~24 ms tunnel
        round-trip overlaps with the client's capture + handling of
        the previous result instead of serializing behind it
        (bench.py stream_fps: 168 vs ~40 fps submit-and-wait).
        Bypasses the micro-batcher — a pipelined session trades
        cross-client coalescing for intra-session overlap."""
        import jax.numpy as jnp

        fh, fw = canvas.shape[:2]
        dev = jnp.asarray(canvas.reshape(1, fh, fw * 3))
        if locked is not None:
            fn = self._fn_at_for(1)
            handles = fn(dev,
                         jnp.asarray(locked["corners"], jnp.float32)[None],
                         jnp.asarray(locked["b_y"], jnp.float32)[None],
                         jnp.asarray(locked["b_x"], jnp.float32)[None])
        else:
            handles = self._fn_for(1)(dev)
        for h in handles:
            try:
                h.copy_to_host_async()
            except Exception:
                pass
        return handles

    def _prewarm(self):
        ch, cw = self.canonical
        for b in self.buckets:
            try:
                self._run_batch(np.full((b, ch, cw, 3), PAD_GRAY, np.uint8))
                self._warm.add(b)
            except Exception:
                pass
        if not self.supports_fast_path:
            return
        corners = np.array([[10, 10], [cw - 10, 10], [cw - 10, ch - 10],
                            [10, ch - 10]], np.float32)
        bnd = (np.arange(10, dtype=np.float32) * 50.0)
        for b in self.buckets:
            try:
                self._run_batch_at(
                    np.full((b, ch, cw, 3), PAD_GRAY, np.uint8),
                    np.tile(corners, (b, 1, 1)),
                    np.tile(bnd, (b, 1)), np.tile(bnd, (b, 1)))
            except Exception:
                pass

    @property
    def warm_buckets(self):
        return sorted(self._warm)

    # -- request side -----------------------------------------------------

    def scan(self, img_bgr: np.ndarray, top_k: int = 3) -> dict:
        t0 = time.perf_counter()
        canvas, scale, (off_x, off_y) = letterbox(img_bgr, self.canonical)
        digits, conf, probs, corners, found, _by, _bx, n_coalesced = \
            self.batcher.submit(canvas)
        t1 = time.perf_counter()

        digits = digits.reshape(9, 9).astype(np.int64)
        conf = conf.reshape(81).astype(np.float64)
        probs = probs.reshape(81, 10).astype(np.float64)
        # Map corners back to the client's original pixel grid.
        corners_orig = (np.asarray(corners, np.float64)
                        - np.array([off_x, off_y])) / scale
        found = bool(found)

        result = {
            "grid_found": found,
            "recognized_grid": "".join(map(str, digits.reshape(-1))),
            "confidence": conf.round(3).tolist(),
            "corners": corners_orig.round(1).tolist(),
            "n_coalesced": int(n_coalesced),
            "time_graph_ms": round((t1 - t0) * 1e3, 1),
        }
        # Top-k alternatives per cell for the correction UI (reference
        # predict_cells_with_alternatives, run_v2.py:149).
        order = np.argsort(-probs, axis=1)[:, :top_k]
        result["alternatives"] = [
            [[int(d), round(float(probs[i, d]), 4)] for d in order[i]]
            for i in range(81)
        ]
        if found:
            result.update(self.reason_and_solve(digits, probs))
        else:
            result["status"] = "detection_failed"
        result["time_total_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        return result

    @staticmethod
    def reason_and_solve(digits: np.ndarray, probs: np.ndarray) -> dict:
        """Validation -> beam correction -> solver-escalation -> solve
        (the reference run_v2 reasoning chain, shared by the single-shot
        and session paths)."""
        from sudoku_vision_tpu import solver as native_solver
        from sudoku_vision_tpu.reasoning import (
            resolve_conflicts, resolve_with_solver, validate_predictions,
        )

        validation = validate_predictions(digits)
        work = digits
        corrected = False
        if not validation.is_valid:
            res = resolve_conflicts(digits, probs)
            work = res.grid
            if not res.success:
                # Solver-backed escalation for confidently-wrong
                # reads (alternatives below the beam's 0.1 floor).
                esc = resolve_with_solver(work, probs)
                if esc.success:
                    work = esc.grid
            corrected = not np.array_equal(work, digits)
        sres = native_solver.solve(work, timeout_s=5.0)
        status = sres.status_name
        if sres.solved and native_solver.count_solutions(work, 2) > 1:
            # Uniqueness gate (same as run_v2): several solutions mean
            # a given was erased upstream — restore from CNN evidence
            # or report the ambiguity rather than a coin-flip answer.
            from sudoku_vision_tpu.reasoning import restore_erased_givens

            rest = restore_erased_givens(work, probs.reshape(81, 10))
            if rest.corrections:
                r2 = native_solver.solve(rest.grid, timeout_s=5.0)
                if r2.solved:
                    work = rest.grid
                    corrected = True
                    sres = r2
            if not rest.success:
                status = "ambiguous"
        sol_str = ("".join(map(str, sres.grid.reshape(-1)))
                   if sres.solved else None)
        if status == "ambiguous":
            # An ambiguous grid has SEVERAL solutions; presenting one
            # under the "solution" key renders exactly like a real
            # answer (advisor finding, round 4). Ship it under
            # "tentative_solution" instead so clients must opt in to
            # showing it — and show it differently (scanner.js
            # renders tentative cells dimmed with an explicit hint).
            return {"corrected": corrected, "status": status,
                    "solution": None, "tentative_solution": sol_str}
        return {"corrected": corrected, "status": status,
                "solution": sol_str}


class ScanSession:
    """Server-side state for one client's live frame stream.

    The reference keeps its live-scanning state on the client (ios
    ScanPipeline.swift:245 requires 3 identical consecutive recognized
    grids; cv/stabilizer.py:161 Kalman-smooths corners; :251
    MotionDetector pauses processing while the camera moves). In the
    TPU inversion the server owns the graph, so it owns that state too:
    each frame POSTed with ?session=<id> advances a Kalman corner
    stabilizer, a motion gate that skips device work while the scene
    moves, and an identical-grids run counter; the solve fires exactly
    ONCE per stable segment (re-firing only when a DIFFERENT stable
    grid appears).
    """

    def __init__(self, engine: InferenceEngine,
                 required_stable: int = 3,
                 motion_threshold: float = 20.0):
        # motion_threshold: mean abs diff on the ~160px pooled gray.
        # Measured on 480x640 scenes: 2px hand jitter = ~8, 8px = ~19,
        # scene change = >100 — 20 passes jitter, trips real motion.
        from sudoku_vision_tpu.cv.stabilizer import (
            GridStabilizer, MotionDetector,
        )

        self.engine = engine
        self.required_stable = required_stable
        self.stabilizer = GridStabilizer()
        self.motion = MotionDetector(threshold=motion_threshold)
        self.run = 0
        self.prev_digits: np.ndarray | None = None
        self.solved_grid: np.ndarray | None = None
        self.last_solve: dict | None = None
        self.n_frames = 0
        self.last_used = time.monotonic()
        self._lock = threading.Lock()
        # Temporal reuse: locked corners + refined boundaries (canvas
        # coords) from the last stable full detect; None = full graph.
        self.locked: dict | None = None
        self.redetect_every = 8
        # Pipelined mode: the in-flight frame's device handles + meta
        # (results lag dispatch by exactly one frame).
        self._pending: dict | None = None

    def process(self, img_bgr: np.ndarray,
                pipelined: bool = False) -> dict:
        with self._lock:
            if pipelined and self.engine.supports_pipelined:
                return self._process_pipelined(img_bgr)
            return self._process(img_bgr)

    # -- shared pieces ----------------------------------------------------

    def _begin(self, img_bgr):
        self.n_frames += 1
        self.last_used = time.monotonic()
        t0 = time.perf_counter()
        canvas, scale, off = letterbox(img_bgr, self.engine.canonical)
        out: dict = {"frame": self.n_frames, "solved_now": False,
                     "required_stable": self.required_stable}
        return t0, canvas, scale, off, out

    def _use_fast(self) -> bool:
        # Temporal-reuse fast path: the stabilizer locked the corners
        # and the motion gate is quiet, so detection (~40% of the
        # frame budget) cannot produce anything new — run only
        # warp->extract->CNN at the locked corners + boundaries
        # (pipeline/graph.py::perceive_at). A full detect still runs
        # every `redetect_every` frames as drift insurance, and any
        # digits change on the fast path drops the lock (a scene could
        # in principle change without tripping the motion gate).
        return (self.locked is not None
                and self.n_frames % self.redetect_every != 0)

    def _absorb_fast(self, digits, out, corners_at_dispatch):
        digits = digits.reshape(81).astype(np.int64)
        out["detect_skipped"] = True
        out["corners_stable"] = True
        if (self.prev_digits is not None
                and not np.array_equal(digits, self.prev_digits)):
            self.locked = None         # verify with a full detect next
        return digits, True, corners_at_dispatch

    def _absorb_full(self, digits, corners, found, b_y, b_x, out):
        digits = digits.reshape(81).astype(np.int64)
        found = bool(found)
        stab = self.stabilizer.update(np.asarray(corners, np.float32),
                                      found)
        corners_canvas = np.asarray(stab.corners, np.float32)
        out["corners_stable"] = bool(stab.is_stable)
        if found and stab.is_stable and self.engine.supports_fast_path:
            self.locked = {"corners": corners_canvas,
                           "b_y": np.asarray(b_y, np.float32),
                           "b_x": np.asarray(b_x, np.float32)}
        else:
            self.locked = None
        return digits, found, corners_canvas

    def _post(self, out, digits, conf, probs, corners_canvas, found,
              scale, off, t0):
        """Everything after perception: corner mapping, the
        identical-consecutive-grids gate (ScanPipeline.swift:245), and
        the one-solve-per-stable-segment logic."""
        off_x, off_y = off
        corners_sm = (np.asarray(corners_canvas, np.float64)
                      - np.array([off_x, off_y])) / scale
        out["grid_found"] = found
        out["corners"] = corners_sm.round(1).tolist()
        out.setdefault("corners_stable", self.locked is not None)

        if not found:
            self.run = 0
            self.prev_digits = None
            out["state"] = "searching"
            out["time_total_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 1)
            return out

        if (self.prev_digits is not None
                and np.array_equal(digits, self.prev_digits)):
            self.run += 1
        else:
            self.run = 1
        self.prev_digits = digits

        out["recognized_grid"] = "".join(map(str, digits))
        out["stable_run"] = self.run

        gate = self.run >= self.required_stable
        is_new = (self.solved_grid is None
                  or not np.array_equal(digits, self.solved_grid))
        if gate and is_new:
            solve = InferenceEngine.reason_and_solve(
                digits.reshape(9, 9), probs.reshape(81, 10))
            solve["confidence"] = conf.reshape(81).round(3).tolist()
            self.solved_grid = digits
            self.last_solve = solve
            out.update(solve)
            out["solved_now"] = True
            out["state"] = "solved"
        elif gate and self.last_solve is not None:
            out.update(self.last_solve)
            out["state"] = "solved"
        else:
            out["state"] = "stabilizing"
        out["time_total_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        return out

    # -- synchronous mode (micro-batched, coalesces across clients) -------

    def _process(self, img_bgr: np.ndarray) -> dict:
        t0, canvas, scale, off, out = self._begin(img_bgr)

        # Motion gate BEFORE any device perception work (reference
        # MotionDetector pauses processing; CameraManager frame-skip).
        if self.motion.update(canvas.mean(axis=2)):
            self.run = 0
            self.prev_digits = None
            self.locked = None         # corners may move: re-detect
            out["state"] = "motion"
            out["time_total_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 1)
            return out

        if self._use_fast():
            corners0 = self.locked["corners"]
            digits, conf, probs = self.engine.fast_batcher.submit(
                (canvas, corners0,
                 self.locked["b_y"], self.locked["b_x"]))[:3]
            digits, found, corners_canvas = self._absorb_fast(
                digits, out, corners0)
        else:
            digits, conf, probs, corners, found, b_y, b_x, _ = \
                self.engine.batcher.submit(canvas)
            digits, found, corners_canvas = self._absorb_full(
                digits, corners, found, b_y, b_x, out)
        return self._post(out, digits, conf, probs, corners_canvas,
                          found, scale, off, t0)

    # -- pipelined mode (double-buffered async dispatch) -------------------

    def _process_pipelined(self, img_bgr: np.ndarray) -> dict:
        """Dispatch THIS frame asynchronously, return the PREVIOUS
        frame's completed result (VERDICT r4 #5): the ~24 ms device
        round-trip of frame N overlaps the client's handling of frame
        N-1's response and its capture of frame N+1, instead of
        serializing the live loop at ~40 fps. Results lag dispatch by
        one frame — invisible at live rates. Enabled per request via
        /scan?session=<id>&pipeline=1."""
        t0, canvas, scale, off, out = self._begin(img_bgr)
        out["pipelined"] = True

        if self.motion.update(canvas.mean(axis=2)):
            if self._pending is not None:
                self._drain_pending()
            self.run = 0
            self.prev_digits = None
            self.locked = None
            out["state"] = "motion"
            out["time_total_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 1)
            return out

        use_fast = (self._use_fast()
                    and self.engine.supports_fast_path)
        snapshot = self.locked if use_fast else None
        handles = self.engine.dispatch_frame(canvas, snapshot)
        entry = {"handles": handles, "use_fast": use_fast,
                 "corners": None if snapshot is None
                 else snapshot["corners"],
                 "scale": scale, "off": off, "frame": self.n_frames}
        prev, self._pending = self._pending, entry
        if prev is None:
            out["state"] = "pipeline_fill"
            out["time_total_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 1)
            return out
        out["result_frame"] = prev["frame"]
        return self._finalize(prev, out, t0)

    def _finalize(self, entry, out, t0) -> dict:
        h = [np.asarray(x)[0] for x in entry["handles"]]
        if entry["use_fast"]:
            digits, conf, probs = h
            digits, found, corners_canvas = self._absorb_fast(
                digits, out, entry["corners"])
        else:
            digits, conf, probs, corners, found, b_y, b_x = h
            digits, found, corners_canvas = self._absorb_full(
                digits, corners, found, b_y, b_x, out)
        return self._post(out, digits, conf, probs, corners_canvas,
                          found, entry["scale"], entry["off"], t0)

    def _drain_pending(self):
        """Fetch-and-drop the in-flight frame (keeps the device queue
        clean across a motion reset)."""
        entry, self._pending = self._pending, None
        for x in entry["handles"]:
            np.asarray(x)


class SessionRegistry:
    """id -> ScanSession with idle expiry (one per streaming client)."""

    def __init__(self, engine: InferenceEngine, ttl_s: float = 120.0,
                 max_sessions: int = 64):
        self.engine = engine
        self.ttl = ttl_s
        self.max_sessions = max_sessions
        self._sessions: dict[str, ScanSession] = {}
        self._lock = threading.Lock()

    def get(self, sid: str, required_stable: int = 3) -> ScanSession:
        now = time.monotonic()
        with self._lock:
            dead = [k for k, s in self._sessions.items()
                    if now - s.last_used > self.ttl]
            for k in dead:
                del self._sessions[k]
            if sid not in self._sessions:
                if len(self._sessions) >= self.max_sessions:
                    oldest = min(self._sessions,
                                 key=lambda k: self._sessions[k].last_used)
                    del self._sessions[oldest]
                self._sessions[sid] = ScanSession(
                    self.engine, required_stable=required_stable)
            return self._sessions[sid]

    @property
    def stats(self):
        with self._lock:
            return {"active": len(self._sessions)}


def make_handler(engine: InferenceEngine):
    static_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "static")
    sessions = SessionRegistry(engine)

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

        def _static(self, name, ctype):
            try:
                with open(os.path.join(static_dir, name), "rb") as f:
                    body = f.read()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except OSError:
                self._json({"error": f"{name} missing"}, 404)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json({
                    "ok": True,
                    "devices": [str(d) for d in jax.devices()],
                    "n_devices": engine.n_devices,
                    "checkpoint": engine.ckpt,
                    "canonical": list(engine.canonical),
                    "buckets": list(engine.buckets),
                    "warm_buckets": engine.warm_buckets,
                    "batcher": engine.batcher.stats,
                    "sessions": sessions.stats,
                })
            elif self.path in ("/", "/scanner.html"):
                self._static("scanner.html", "text/html")
            elif self.path == "/scanner.js":
                self._static("scanner.js", "application/javascript")
            elif self.path == "/sudoku.js":
                self._static("sudoku.js", "application/javascript")
            elif self.path == "/digit_weights.js":
                self._static("digit_weights.js", "application/javascript")
            elif self.path == "/sudoku.wasm":
                self._static("sudoku.wasm", "application/wasm")
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
                res = native_solver.solve(grid, timeout_s=5.0)
                self._json({
                    "status": res.status_name,
                    "solution": ("".join(map(str, res.grid.reshape(-1)))
                                 if res.solved else None),
                    "time_ms": round((time.perf_counter() - t0) * 1e3, 3),
                })
            elif self.path == "/scan" or self.path.startswith("/scan?"):
                try:
                    from PIL import Image

                    img = np.asarray(Image.open(io.BytesIO(body))
                                     .convert("RGB"))[..., ::-1]
                except Exception:
                    return self._json({"error": "bad image"}, 400)
                img = np.ascontiguousarray(img)
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                sid = (q.get("session") or [None])[0]
                if sid:
                    stable = int((q.get("stable") or [3])[0])
                    pipelined = (q.get("pipeline") or ["0"])[0] == "1"
                    sess = sessions.get(sid, required_stable=stable)
                    self._json(sess.process(img, pipelined=pipelined))
                else:
                    self._json(engine.scan(img))
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def main(argv=None) -> int:
    from sudoku_vision_tpu.utils import jax_cache

    jax_cache.enable()
    p = argparse.ArgumentParser(description="TPU sudoku-vision server")
    p.add_argument("--port", type=int, default=8602)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--model", default="v3")
    p.add_argument("--canonical", default=None,
                   help="HxW serving resolution (default 1512x2016)")
    p.add_argument("--window-ms", type=float, default=6.0)
    p.add_argument("--buckets", default="1,2,4,8")
    p.add_argument("--no-prewarm", action="store_true")
    p.add_argument("--orient", choices=("fixed", "auto"), default="fixed",
                   help="auto = classify all 4 quarter-turn readings "
                        "(sideways/upside-down phones)")
    args = p.parse_args(argv)
    canonical = DEFAULT_CANONICAL
    if args.canonical:
        h, w = (int(t) for t in args.canonical.split("x"))
        canonical = (h, w)
    engine = InferenceEngine(
        args.model, canonical=canonical,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        window_ms=args.window_ms, prewarm=not args.no_prewarm,
        orient=args.orient)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(engine))
    print(f"serving on http://{args.host}:{args.port} "
          f"(checkpoint: {engine.ckpt}, canonical {canonical}, "
          f"buckets {engine.buckets}, devices {engine.n_devices})")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
