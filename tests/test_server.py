"""Headless end-to-end test of the serving layer + scanner client contract.

The image has no JS engine or browser, so this is the analog of the
reference's Puppeteer test (reference web/test-browser.mjs:42-56 — load a
fixture image, drive the full pipeline, poll for the solution): it boots
the real HTTP server, POSTs a synthetic sudoku photograph to /scan, and
asserts the recognized + solved grids; then it drives the manual-
correction flow (edit a cell -> re-solve via /solve) exactly as
scanner.js does, and a threaded load test proves the micro-batcher
coalesces concurrent requests into one device call.
"""

import io
import json
import random
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from sudoku_vision_tpu.ml.generate_scenes import render_scene

CANONICAL = (480, 640)


@pytest.fixture(scope="module")
def server():
    from sudoku_vision_tpu.serve.server import InferenceEngine, make_handler

    engine = InferenceEngine(
        "v3", canonical=CANONICAL, buckets=(1, 2, 4, 8),
        window_ms=60.0, prewarm=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    yield base, engine
    httpd.shutdown()


def _post(base, path, body, ctype="application/octet-stream", timeout=1200):
    req = urllib.request.Request(
        base + path, data=body, headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.read(), r.headers.get("Content-Type")


def _scene_jpeg(seed=5, category="printed_clean"):
    rng = random.Random(seed)
    img, truth = render_scene(rng, size=CANONICAL, category=category)
    buf = io.BytesIO()
    Image.fromarray(img[..., ::-1]).save(buf, format="JPEG", quality=92)
    return buf.getvalue(), truth


def test_scan_end_to_end(server):
    base, _ = server
    jpeg, truth = _scene_jpeg()
    data = _post(base, "/scan", jpeg)
    assert data["grid_found"] is True
    assert data["status"] == "solved"
    assert data["recognized_grid"] == truth["puzzle"]
    assert data["solution"] == truth["solution"]
    assert len(data["confidence"]) == 81
    assert len(data["alternatives"]) == 81
    assert all(len(a) == 3 for a in data["alternatives"])
    # Corners map back to the ORIGINAL image coordinates.
    det = np.array(data["corners"])
    gt = np.array(truth["corners"])
    assert np.abs(det - gt).max() < 12.0


def test_manual_correction_resolves(server):
    """The ManualEntryView parity flow scanner.js implements: corrupt a
    recognized cell, re-solve via /solve, then correct it back."""
    base, _ = server
    jpeg, truth = _scene_jpeg(seed=6)
    data = _post(base, "/scan", jpeg)
    rec = data["recognized_grid"]
    assert data["status"] == "solved"
    # Find a given cell and a digit that breaks its row.
    idx = rec.index(next(c for c in rec if c != "0"))
    row = idx // 9
    row_digits = {rec[row * 9 + c] for c in range(9)} - {"0", rec[idx]}
    wrong = next(d for d in "123456789"
                 if d != rec[idx] and d in row_digits)
    corrupted = rec[:idx] + wrong + rec[idx + 1:]
    bad = _post(base, "/solve", json.dumps({"puzzle": corrupted}).encode(),
                "application/json")
    assert bad["status"] in ("invalid", "unsolvable")
    assert bad["solution"] is None
    # applyEdit back to the true digit -> solved again.
    fixed = corrupted[:idx] + rec[idx] + corrupted[idx + 1:]
    good = _post(base, "/solve", json.dumps({"puzzle": fixed}).encode(),
                 "application/json")
    assert good["status"] == "solved"
    assert good["solution"] == truth["solution"]


def test_microbatcher_coalesces(server):
    """Concurrent /scan requests must share device calls (>1 frame/call),
    proving the micro-batcher docstring true under load."""
    base, engine = server
    jpeg, _ = _scene_jpeg(seed=7)
    n = 6
    with ThreadPoolExecutor(max_workers=n) as pool:
        results = list(pool.map(
            lambda _: _post(base, "/scan", jpeg), range(n)))
    assert all(r["grid_found"] for r in results)
    assert max(r["n_coalesced"] for r in results) > 1
    health = json.loads(_get(base, "/healthz")[0])
    assert health["batcher"]["avg_frames_per_call"] > 1.0


def test_healthz_and_static_pages(server):
    base, engine = server
    health = json.loads(_get(base, "/healthz")[0])
    assert health["ok"] and health["n_devices"] == 8  # virtual CPU mesh
    assert health["canonical"] == list(CANONICAL)
    html, ctype = _get(base, "/")
    assert b"scanner.js" in html and "text/html" in ctype
    js, ctype = _get(base, "/scanner.js")
    assert "javascript" in ctype
    # Client contract: endpoints, correction flow, live overlay loop.
    for marker in (b"/scan", b"/solve", b"applyEdit", b"alternatives",
                   b"liveDetectTick", b"drawCorners", b"commitEdit"):
        assert marker in js, f"scanner.js missing {marker!r}"
    # Browser-local solver assets (scanner.js's offline fallback loads
    # /sudoku.js which instantiates /sudoku.wasm — test_wasm_artifact.py
    # executes the artifact itself against the native oracle).
    loader, ctype = _get(base, "/sudoku.js")
    assert "javascript" in ctype and b"SudokuSolver" in loader
    wasm, ctype = _get(base, "/sudoku.wasm")
    assert ctype == "application/wasm"
    assert wasm[:8] == b"\x00asm\x01\x00\x00\x00"


def test_letterbox_roundtrip():
    from sudoku_vision_tpu.serve.server import letterbox

    img = np.full((300, 500, 3), 200, np.uint8)
    canvas, scale, (ox, oy) = letterbox(img, (480, 640))
    assert canvas.shape == (480, 640, 3)
    # A point at the input center maps to the canvas center region and back.
    x_canvas = 250 * scale + ox
    assert abs((x_canvas - ox) / scale - 250) < 1e-6
    # Content occupies the scaled box.
    nh, nw = round(300 * scale), round(500 * scale)
    assert canvas[oy + nh // 2, ox + nw // 2, 0] == 200


# ------------------------------------------------------ streaming session

def _jittered_frames(n=8, seed=11, amp=2):
    """One scene photographed n times with small camera jitter: np.roll
    by <=amp px per frame (grid digits identical, corners move)."""
    rng = random.Random(seed)
    img, truth = render_scene(rng, size=CANONICAL, category="printed_clean")
    jr = np.random.default_rng(seed)
    frames = []
    shifts = []
    for _ in range(n):
        dy, dx = int(jr.integers(-amp, amp + 1)), int(
            jr.integers(-amp, amp + 1))
        frames.append(np.roll(img, (dy, dx), axis=(0, 1)))
        shifts.append((dy, dx))
    return frames, shifts, truth


def _jpeg(frame):
    buf = io.BytesIO()
    Image.fromarray(frame[..., ::-1]).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def test_session_fires_one_solve_at_gate_frame(server):
    """The streaming contract (reference ios ScanPipeline.swift:245 +
    cv/stabilizer.py:161): N jittered frames of one scene -> exactly one
    solve, at the 3-identical-grids gate frame, with Kalman-smoothed
    corners; subsequent frames keep reporting the cached solution
    without re-solving."""
    base, _ = server
    frames, shifts, truth = _jittered_frames(n=8)
    results = [_post(base, "/scan?session=s-gate", _jpeg(f))
               for f in frames]

    solves = [r["solved_now"] for r in results]
    assert sum(solves) == 1, solves
    # every session frame advertises the gate depth (the live client
    # renders "locking… (run/required)" from these two fields)
    assert all(r["required_stable"] == 3 for r in results)
    gate_idx = solves.index(True)
    # the gate cannot fire before 3 identical consecutive recognized
    # grids exist (frame index >= 2)
    assert gate_idx >= 2
    assert results[gate_idx]["stable_run"] >= 3
    assert results[gate_idx]["status"] == "solved"
    assert results[gate_idx]["solution"] == truth["solution"]
    assert results[gate_idx]["recognized_grid"] == truth["puzzle"]
    # after the gate: state stays solved, cached solution, NO re-solve
    for r in results[gate_idx + 1:]:
        assert r["state"] == "solved"
        assert r["solved_now"] is False
        assert r["solution"] == truth["solution"]

    # corners are smoothed toward the true (unjittered) corners
    gt = np.array(truth["corners"], np.float64)
    last = np.array(results[-1]["corners"])
    assert np.abs(last - gt).max() < 12.0


def test_session_motion_gate_skips_device_work(server):
    """A moving-camera frame must pause processing (reference
    MotionDetector cv/stabilizer.py:251): state == motion, no
    recognition fields, and the stability run restarts after."""
    base, engine = server
    frames, _, truth = _jittered_frames(n=6, seed=12)
    calls_before = engine.batcher.stats["frames"]
    fast_before = engine.fast_batcher.stats["frames"]
    r1 = _post(base, "/scan?session=s-motion", _jpeg(frames[0]))
    assert r1["state"] in ("stabilizing", "searching")
    # violent scene change -> motion gate
    moved = 255 - frames[1]
    r2 = _post(base, "/scan?session=s-motion", _jpeg(moved))
    assert r2["state"] == "motion"
    assert "recognized_grid" not in r2
    # ... and back again (inverse is another big diff -> still motion)
    r3 = _post(base, "/scan?session=s-motion", _jpeg(frames[2]))
    assert r3["state"] == "motion"
    # once still, the run restarts from 1 and must rebuild to the gate
    rs = [_post(base, "/scan?session=s-motion", _jpeg(f))
          for f in frames[3:]]
    assert rs[0].get("stable_run") in (None, 1)
    # motion frames did NOT hit the device graph (full OR fast: once
    # the stabilizer locks, still frames ride the detection-free fast
    # graph — both count as perception work here)
    frames_used = (engine.batcher.stats["frames"] - calls_before
                   + engine.fast_batcher.stats["frames"] - fast_before)
    assert frames_used == 1 + len(rs), (
        "motion frames must skip the perception graph")


def test_session_temporal_reuse_skips_detection_when_locked(server):
    """VERDICT r4 #4: once the stabilizer locks and the motion gate is
    quiet, frames must run the detection-free fast graph
    (pipeline/graph.py::perceive_at) — same digits, same solve, detect
    stage skipped — with a periodic full re-detect as drift insurance
    and instant fallback on motion."""
    base, engine = server
    jpeg, truth = _scene_jpeg(seed=31)
    full0 = engine.batcher.stats["frames"]
    fast0 = engine.fast_batcher.stats["frames"]
    results = [_post(base, "/scan?session=s-reuse", jpeg)
               for _ in range(10)]
    # stabilizer locks after 3 detections; every following frame except
    # the periodic re-detect (frame 8 of 10) skips detection
    skipped = [bool(r.get("detect_skipped")) for r in results]
    assert not any(skipped[:3])
    assert sum(skipped) >= 5, skipped
    assert sum(1 for s in skipped if not s) <= 4
    full_used = engine.batcher.stats["frames"] - full0
    fast_used = engine.fast_batcher.stats["frames"] - fast0
    assert full_used == len(results) - sum(skipped)
    assert fast_used == sum(skipped)
    # identical recognition + exactly one solve across both graph paths
    recs = {r["recognized_grid"] for r in results if "recognized_grid"
            in r}
    assert recs == {truth["puzzle"]}
    assert sum(r["solved_now"] for r in results) == 1
    solved = [r for r in results if r.get("state") == "solved"]
    assert all(r["solution"] == truth["solution"] for r in solved)
    # motion drops the lock -> next frame is a full detect again
    moved = 255 - np.asarray(
        Image.open(io.BytesIO(jpeg)).convert("RGB"))[..., ::-1]
    r_m = _post(base, "/scan?session=s-reuse", _jpeg(moved))
    assert r_m["state"] == "motion"
    r_back = _post(base, "/scan?session=s-reuse", jpeg)
    assert not r_back.get("detect_skipped")


def test_perceive_at_matches_full_graph():
    """The fast graph must reproduce the full graph's reading exactly
    when fed the corners + boundaries the full graph produced (same
    pooled image, same sampling chain -> bit-identical digits)."""
    import jax
    import jax.numpy as jnp

    from sudoku_vision_tpu.pipeline.graph import perceive, perceive_at
    from sudoku_vision_tpu.pipeline.run_v2 import load_model

    model, variables, temperature, _, use_clahe = load_model("v3")
    rng = random.Random(77)
    img, truth = render_scene(rng, size=CANONICAL,
                              category="printed_clean")
    packed = jnp.asarray(img.reshape(CANONICAL[0], CANONICAL[1] * 3))
    t = jnp.float32(temperature)
    full = jax.jit(lambda im: perceive(
        im, model, variables, temperature=t, use_clahe=use_clahe,
        packed_bgr=True))(packed)
    assert bool(full.grid_found)
    fast = jax.jit(lambda im, c, by, bx: perceive_at(
        im, c, by, bx, model, variables, temperature=t,
        use_clahe=use_clahe, packed_bgr=True))(
        packed, full.corners, full.boundaries_y, full.boundaries_x)
    np.testing.assert_array_equal(np.asarray(full.digits),
                                  np.asarray(fast.digits))
    np.testing.assert_array_equal(np.asarray(full.cells),
                                  np.asarray(fast.cells))
    np.testing.assert_allclose(np.asarray(full.probs),
                               np.asarray(fast.probs), atol=1e-5)


def test_session_pipelined_double_buffering(server):
    """VERDICT r4 #5: /scan?session&pipeline=1 dispatches frame N
    asynchronously and returns frame N-1's completed result — same
    state machine, results lag exactly one frame, motion still resets,
    and the solve fires once with the true solution."""
    from sudoku_vision_tpu.serve.server import InferenceEngine, \
        make_handler

    engine = InferenceEngine("v3", canonical=CANONICAL, buckets=(1,),
                             window_ms=10.0, prewarm=False, n_devices=1)
    assert engine.supports_pipelined
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    jpeg, truth = _scene_jpeg(seed=43)
    url = "/scan?session=s-pipe&pipeline=1"
    results = [_post(base, url, jpeg) for _ in range(9)]
    assert results[0]["state"] == "pipeline_fill"
    # one-frame lag: response i carries the result of dispatch i-1
    for i, r in enumerate(results[1:], start=1):
        assert r["result_frame"] == i
        assert r["pipelined"] is True
    recs = {r["recognized_grid"] for r in results[1:]
            if "recognized_grid" in r}
    assert recs == {truth["puzzle"]}
    assert sum(r["solved_now"] for r in results) == 1
    solved = [r for r in results if r.get("state") == "solved"]
    assert solved and all(r["solution"] == truth["solution"]
                          for r in solved)
    # the fast path engages inside the pipelined mode too
    assert any(r.get("detect_skipped") for r in results)
    # motion resets (and drains the in-flight frame cleanly)
    moved = 255 - np.asarray(
        Image.open(io.BytesIO(jpeg)).convert("RGB"))[..., ::-1]
    r_m = _post(base, url, _jpeg(moved))
    assert r_m["state"] == "motion"
    r1 = _post(base, url, jpeg)              # inverse flip: still motion
    assert r1["state"] == "motion"
    r2 = _post(base, url, jpeg)
    assert r2["state"] == "pipeline_fill"    # pipeline refills
    httpd.shutdown()


def test_session_isolated_from_single_shot(server):
    """/scan without ?session= keeps the stateless contract."""
    base, _ = server
    jpeg, truth = _scene_jpeg()
    data = _post(base, "/scan", jpeg)
    assert "solved_now" not in data
    assert data["status"] == "solved"
