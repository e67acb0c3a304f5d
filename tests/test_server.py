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
