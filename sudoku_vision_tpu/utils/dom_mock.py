"""Mock browser for executing scanner.js's DOM/async glue under test.

Plays the role Puppeteer plays for the reference (reference
web/test-browser.mjs:42): a document/canvas/fetch/timer environment the
shipped app file runs against, with every interaction observable from
the test. DOM nodes are plain dicts (utils/js_app.py's host interop):
the glue reads/writes properties and calls methods exactly as it would
in a browser, and the test inspects the same dicts afterwards.

Fidelity decisions, stated explicitly:
  * All callbacks settle synchronously (script onload, canvas toBlob,
    promise executors) — js_app's `await` unwraps already-settled
    promises, so the glue's control flow (try/catch fallbacks, promise
    chains) executes exactly, without a real event loop.
  * `fetch('/scan')` / `fetch('/solve')` honor `server_up`; static
    assets (/sudoku.js, /digit_weights.js via script tags, /sudoku.wasm
    via fetch) are always served from the shipped static dir — the
    offline story assumes browser-cached assets, and this is where the
    REAL artifacts enter: sudoku.js executes in the interpreter and
    instantiates the REAL sudoku.wasm through utils/wasm_vm.
  * setInterval stores callbacks; tests fire ticks explicitly
    (`fire_timers()`), keeping live-loop tests deterministic.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from sudoku_vision_tpu.utils.js_app import _JSThrow, UNDEFINED


class BrowserHarness:
    def __init__(self, static_dir: str):
        self.static_dir = static_dir
        self.env = None              # set via attach()
        self.server_up = True
        self.routes: dict[str, Any] = {}   # path -> dict | callable(blob)
        self.fetch_log: list[tuple[str, Any]] = []
        self.timers: dict[int, tuple[Any, float]] = {}
        self._timer_seq = 0
        self._clock = [0.0]
        self.camera_pixels: np.ndarray | None = None  # (H, W) gray
        self.elements: dict[str, dict] = {}
        self._frame_pixels: np.ndarray | None = None
        self._build_elements()
        self.globals = self._build_globals()

    def attach(self, env) -> None:
        self.env = env

    # ------------------------------------------------------------ DOM

    def _build_elements(self) -> None:
        els = self.elements

        def text_el(eid):
            els[eid] = {"textContent": ""}

        for eid in ("status", "hint", "editor-title"):
            text_el(eid)
        els["editor"] = {"style": {"display": "none"}}
        keys = {"innerHTML": "", "_children": []}
        keys["appendChild"] = lambda ch: (keys["_children"].append(ch),
                                          UNDEFINED)[1]
        els["editor-keys"] = keys
        els["video"] = {"videoWidth": 0, "videoHeight": 0,
                        "srcObject": None}
        els["start"] = {"onclick": UNDEFINED}
        els["capture"] = {"onclick": UNDEFINED}
        els["file"] = {"onchange": UNDEFINED}
        els["grid"] = self._make_table()
        els["overlay"] = self._make_overlay()
        els["frame"] = self._make_frame_canvas()

    def _make_table(self) -> dict:
        tbl = {"rows": [], "onclick": UNDEFINED}

        def insert_row():
            tr = {"cells": [], "rowIndex": len(tbl["rows"])}

            def insert_cell():
                td = {
                    "textContent": "", "className": "",
                    "cellIndex": len(tr["cells"]), "parentNode": tr,
                }
                td["classList"] = {"add": lambda name, td=td: (
                    td.__setitem__(
                        "className",
                        (td["className"] + " " + name).strip()),
                    UNDEFINED)[1]}
                td["closest"] = lambda sel, td=td: td
                tr["cells"].append(td)
                return td

            tr["insertCell"] = insert_cell
            tbl["rows"].append(tr)
            return tr

        tbl["insertRow"] = insert_row
        return tbl

    def _make_overlay(self) -> dict:
        ov = {"clientWidth": 320, "clientHeight": 240,
              "width": 0, "height": 0}
        ops: list = []
        ctx = {"_ops": ops, "strokeStyle": "", "lineWidth": 0}
        for name in ("clearRect", "beginPath", "moveTo", "lineTo",
                     "closePath", "stroke"):
            ctx[name] = (lambda *a, _n=name: (ops.append((_n, a)),
                                              UNDEFINED)[1])
        ov["getContext"] = lambda kind: ctx
        ov["_ctx"] = ctx
        return ov

    def _make_frame_canvas(self) -> dict:
        c = {"width": 0, "height": 0}

        def draw_image(img, *rest):
            if isinstance(img, dict) and img.get("_pixels") is not None:
                self._frame_pixels = img["_pixels"]
            elif img is self.elements["video"]:
                self._frame_pixels = self.camera_pixels

        def get_image_data(x, y, w, h):
            px = self._frame_pixels
            assert px is not None, "getImageData before drawImage"
            g = np.asarray(px)
            rgba = np.empty((g.shape[0], g.shape[1], 4), np.float64)
            rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = g
            rgba[..., 3] = 255
            return {"data": rgba.reshape(-1).tolist()}

        ctx = {"drawImage": draw_image, "getImageData": get_image_data}

        def to_blob(cb, *a):
            cb({"_pixels": self._frame_pixels
                if self._frame_pixels is not None else self.camera_pixels})
            return UNDEFINED

        c["getContext"] = lambda kind: ctx
        c["toBlob"] = to_blob
        return c

    # ------------------------------------------------------------ globals

    def _append_script(self, s: dict):
        src = s.get("src", "")
        path = os.path.join(self.static_dir, src.lstrip("/"))
        if not os.path.exists(path):
            onerr = s.get("onerror")
            if callable(onerr):
                onerr({"message": f"404 {src}"})
            return UNDEFINED
        if src.endswith(".js"):
            with open(path) as f:
                self.env.exec_source(f.read())
        onload = s.get("onload")
        if callable(onload):
            onload()
        return UNDEFINED

    def _fetch(self, url: str, opts=UNDEFINED):
        path = url.split("?")[0]
        self.fetch_log.append((url, opts))
        if path == "/sudoku.wasm":
            # Static asset — served even "offline" (browser cache role).
            fpath = os.path.join(self.static_dir, "sudoku.wasm")
            if not os.path.exists(fpath):
                raise _JSThrow({"name": "TypeError",
                                "message": "Failed to fetch"})
            with open(fpath, "rb") as f:
                blob = f.read()
            return {"ok": True, "status": 200,
                    "arrayBuffer": lambda: blob}
        if not self.server_up:
            raise _JSThrow({"name": "TypeError",
                            "message": "Failed to fetch"})
        handler = self.routes.get(path)
        if handler is None:
            return {"ok": False, "status": 404,
                    "json": lambda: {"error": "not found"}}
        body = opts.get("body") if isinstance(opts, dict) else UNDEFINED
        resp = handler(body) if callable(handler) else handler
        return {"ok": True, "status": 200, "json": lambda: resp}

    def _wasm_instantiate(self, blob: bytes, imports):
        from sudoku_vision_tpu.utils import wasm_vm

        vm = wasm_vm.WasmModule(blob)
        exports: dict[str, Any] = {}
        for name, (kind, _idx) in vm.exports.items():
            if kind == "func":
                def make(name=name):
                    def f(*args):
                        r = vm.call(name, *[int(a) for a in args])
                        return UNDEFINED if r is None else r
                    return f
                exports[name] = make()
            elif kind == "memory":
                exports[name] = {"_wasm_memory": True}
        return {"instance": {"exports": exports}}

    def _build_globals(self) -> dict:
        doc_listeners: list = []
        document = {
            "getElementById": lambda eid: self.elements.get(eid, UNDEFINED),
            "createElement": lambda tag: (
                {"src": "", "onload": UNDEFINED, "onerror": UNDEFINED}
                if tag == "script" else
                {"textContent": "", "className": "", "onclick": UNDEFINED}),
            "head": {"appendChild": self._append_script},
            "addEventListener": lambda ev, fn: (doc_listeners.append(
                (ev, fn)), UNDEFINED)[1],
            "_listeners": doc_listeners,
            "readyState": "complete",
        }

        def set_interval(fn, ms):
            self._timer_seq += 1
            self.timers[self._timer_seq] = (fn, ms)
            return self._timer_seq

        def clear_interval(tid):
            self.timers.pop(int(tid), None)
            return UNDEFINED

        def now():
            self._clock[0] += 7.0
            return self._clock[0]

        def get_user_media(constraints=UNDEFINED):
            self._gum_constraints = constraints
            return {"_stream": True, "getTracks": lambda: []}

        def create_image_bitmap(blob):
            px = blob["_pixels"]
            return {"width": int(np.asarray(px).shape[1]),
                    "height": int(np.asarray(px).shape[0]),
                    "_pixels": px}

        window: dict = {}
        return {
            "window": window,
            "document": document,
            "navigator": {"mediaDevices": {"getUserMedia": get_user_media}},
            "fetch": self._fetch,
            "performance": {"now": now},
            "setInterval": set_interval,
            "clearInterval": clear_interval,
            "createImageBitmap": create_image_bitmap,
            "WebAssembly": {"instantiate": self._wasm_instantiate},
        }

    # ------------------------------------------------------------ helpers

    def fire_timers(self) -> int:
        """Invoke every registered interval callback once."""
        n = 0
        for fn, _ms in list(self.timers.values()):
            fn()
            n += 1
        return n

    def el(self, eid: str) -> dict:
        return self.elements[eid]

    def status_text(self) -> str:
        return self.elements["status"]["textContent"]

    def cell(self, i: int) -> dict:
        return self.elements["grid"]["rows"][i // 9]["cells"][i % 9]

    def click_cell(self, i: int):
        td = self.cell(i)
        return self.elements["grid"]["onclick"]({
            "target": {"closest": lambda sel, td=td: td}})

    def upload(self, pixels: np.ndarray):
        """Drive the file-input path with a gray (H, W) frame."""
        blob = {"_pixels": pixels}
        return self.elements["file"]["onchange"](
            {"target": {"files": [blob]}})
