/* Scanner client logic.
 *
 * Capability parity with the reference frontends:
 *  - live grid-detection overlay while the camera runs (reference
 *    web/src/main.ts:183 startGridDetection rAF loop +
 *    gridDetector.ts:135 drawGridOverlay — here the detection happens
 *    server-side, so the loop is rate-limited to ~2 Hz on a downscaled
 *    frame instead of per-rAF);
 *  - capture/upload -> recognized + solved grid rendering
 *    (main.ts:237 captureAndProcess, :313 displaySolution);
 *  - manual correction of recognized cells with top-3 alternatives and
 *    automatic re-solve (reference ios/.../ManualEntryView.swift).
 *
 * Pure helpers (applyEdit, classForCell, gridFromScan) are exported via
 * window.SV for the contract test (tests/test_server.py checks this
 * file references the endpoints and exports the helpers).
 */
'use strict';

// ---------- pure helpers ----------

// Merge a manual edit into the recognized grid string.
function applyEdit(rec, index, digit) {
  if (index < 0 || index > 80 || digit < 0 || digit > 9) return rec;
  return rec.slice(0, index) + String(digit) + rec.slice(index + 1);
}

// Display class for a cell given recognized/solution digits + confidence.
function classForCell(recDigit, confidence, edited) {
  if (edited) return 'given';
  if (recDigit === '0') return 'solved';
  return confidence < 0.7 ? 'lowconf' : 'given';
}

// Extract the render model from a /scan response.
function gridFromScan(data) {
  return {
    rec: data.recognized_grid,
    sol: data.solution || data.recognized_grid,
    conf: data.confidence,
    alts: data.alternatives || null,
    status: data.status,
  };
}

// Map the WASM module's solve() return code to the /solve status
// vocabulary (native/solver/src/wasm_api.cpp: 1 = solved,
// 0 = unsolvable, -1 = invalid — the reference wasm contract,
// reference solver/src/wasm_api.c:40).
function statusFromRc(rc) {
  return rc === 1 ? 'solved' : (rc === 0 ? 'unsolvable' : 'invalid');
}

// Decide where a solve should run: the server when reachable, the local
// WASM module when loaded, otherwise fail with a message. Pure decision
// logic for the fallback chain in commitEdit/solveLocal.
function solveRoute(serverReachable, wasmState) {
  if (serverReachable) return 'server';
  if (wasmState === false) return 'fail';
  return 'wasm';
}

// ---------- local WASM solver fallback ----------
//
// Capability parity with the reference's browser-local solving
// (web/src/solver.ts: dynamic sudoku.js load + cwrap bindings). The
// module is emitted toolchain-free by `make -C native/solver wasm`
// (native/solver/emit_wasm.py assembles sudoku.wasm; sudoku.js is the
// hand-written loader standing in for the MODULARIZE glue); if the
// load fails, solving stays on POST /solve. Returns {status, solution}
// like the endpoint.
let _wasm = null;            // resolved module, false = unavailable
async function solveLocal(rec) {
  if (_wasm === false) return null;
  if (_wasm === null) {
    try {
      if (typeof SudokuSolver === 'undefined') {
        await new Promise((ok, err) => {
          const s = document.createElement('script');
          s.src = '/sudoku.js';
          s.onload = ok;
          s.onerror = err;
          document.head.appendChild(s);
        });
      }
      _wasm = await SudokuSolver();
    } catch (e) {
      _wasm = false;
      return null;
    }
  }
  const m = _wasm;
  const setCell = m.cwrap('set_cell', null, ['number', 'number', 'number']);
  const getCell = m.cwrap('get_cell', 'number', ['number', 'number']);
  m.cwrap('clear_grid', null, [])();
  for (let i = 0; i < 81; i++) {
    setCell((i / 9) | 0, i % 9, Number(rec[i]));
  }
  const rc = m.cwrap('solve', 'number', [])();
  if (rc !== 1) return {status: statusFromRc(rc), solution: null};
  let sol = '';
  for (let i = 0; i < 81; i++) sol += String(getCell((i / 9) | 0, i % 9));
  return {status: statusFromRc(rc), solution: sol};
}

// ---------- DOM app (skipped when loaded without a document) ----------

function initApp() {
  const video = document.getElementById('video');
  const overlay = document.getElementById('overlay');
  const statusEl = document.getElementById('status');
  const hintEl = document.getElementById('hint');
  const tbl = document.getElementById('grid');
  const editor = document.getElementById('editor');
  const editorTitle = document.getElementById('editor-title');
  const editorKeys = document.getElementById('editor-keys');

  for (let r = 0; r < 9; r++) {
    const tr = tbl.insertRow();
    for (let c = 0; c < 9; c++) tr.insertCell();
  }

  const state = {
    rec: null,          // recognized 81-char string (with manual edits)
    conf: null,
    alts: null,
    sol: null,
    edited: new Set(),  // indices the user corrected
    editing: -1,
    liveTimer: null,
  };

  // ----- rendering -----

  function render() {
    const sol = state.sol || state.rec;
    for (let i = 0; i < 81; i++) {
      const td = tbl.rows[(i / 9) | 0].cells[i % 9];
      td.textContent = sol[i] === '0' ? '' : sol[i];
      td.className = classForCell(state.rec[i], state.conf[i],
                                  state.edited.has(i));
      if (i === state.editing) td.classList.add('editing');
    }
  }

  // ----- manual correction (ManualEntryView parity) -----

  function openEditor(i) {
    state.editing = i;
    editor.style.display = 'block';
    const cur = state.rec[i];
    editorTitle.textContent =
        `cell r${((i / 9) | 0) + 1}c${(i % 9) + 1} — recognized "${cur}"` +
        ` (conf ${(state.conf[i] * 100).toFixed(0)}%)`;
    editorKeys.innerHTML = '';
    const altDigits = new Set(
        (state.alts && state.alts[i] || []).map(a => a[0]));
    for (let d = 0; d <= 9; d++) {
      const b = document.createElement('button');
      b.textContent = d === 0 ? 'empty' : String(d);
      if (altDigits.has(d) && String(d) !== cur) b.className = 'alt';
      b.onclick = () => commitEdit(i, d);
      editorKeys.appendChild(b);
    }
    render();
  }

  async function commitEdit(i, digit) {
    state.rec = applyEdit(state.rec, i, digit);
    state.edited.add(i);
    state.editing = -1;
    editor.style.display = 'none';
    statusEl.textContent = 're-solving…';
    let data;
    try {
      const res = await fetch('/solve', {
        method: 'POST',
        headers: {'Content-Type': 'application/json'},
        body: JSON.stringify({puzzle: state.rec}),
      });
      data = await res.json();
    } catch (e) {
      // Server unreachable: solve locally in WASM when the module was
      // built (reference web/src/solver.ts behavior).
      data = await solveLocal(state.rec);
      if (!data) {
        statusEl.textContent = 'solve failed: server unreachable';
        return;
      }
      data.time_ms = 'local';
    }
    state.sol = data.solution || state.rec;
    statusEl.textContent = data.status === 'solved'
        ? `re-solved in ${data.time_ms} ms`
        : `after edit: ${data.status}`;
    render();
  }

  tbl.onclick = (e) => {
    const td = e.target.closest('td');
    if (!td || !state.rec) return;
    openEditor(td.parentNode.rowIndex * 9 + td.cellIndex);
  };

  // ----- scan flow -----

  async function send(blob) {
    statusEl.textContent = 'scanning on TPU…';
    const t0 = performance.now();
    const res = await fetch('/scan', {method: 'POST', body: blob});
    const data = await res.json();
    const ms = (performance.now() - t0).toFixed(0);
    if (!data.grid_found) { statusEl.textContent = 'no grid found'; return; }
    const m = gridFromScan(data);
    state.rec = m.rec; state.sol = m.sol; state.conf = m.conf;
    state.alts = m.alts; state.edited = new Set(); state.editing = -1;
    statusEl.textContent =
        `${m.status} · graph ${data.time_graph_ms} ms · round-trip ${ms} ms` +
        (data.n_coalesced > 1 ? ` · batch of ${data.n_coalesced}` : '');
    hintEl.textContent =
        'tap any cell to correct it (red = low confidence)';
    render();
  }

  // ----- live detection overlay -----

  function drawCorners(corners, sw, sh) {
    const ctx = overlay.getContext('2d');
    overlay.width = overlay.clientWidth;
    overlay.height = overlay.clientHeight;
    ctx.clearRect(0, 0, overlay.width, overlay.height);
    if (!corners) return;
    const sx = overlay.width / sw, sy = overlay.height / sh;
    ctx.strokeStyle = '#4be38b';
    ctx.lineWidth = 3;
    ctx.beginPath();
    corners.forEach(([x, y], k) => {
      if (k === 0) ctx.moveTo(x * sx, y * sy);
      else ctx.lineTo(x * sx, y * sy);
    });
    ctx.closePath();
    ctx.stroke();
  }

  async function liveDetectTick() {
    if (!video.videoWidth) return;
    const c = document.getElementById('frame');
    const scale = 480 / Math.max(video.videoWidth, video.videoHeight);
    c.width = Math.round(video.videoWidth * scale);
    c.height = Math.round(video.videoHeight * scale);
    c.getContext('2d').drawImage(video, 0, 0, c.width, c.height);
    const blob = await new Promise(
        r => c.toBlob(r, 'image/jpeg', 0.7));
    try {
      const res = await fetch('/scan', {method: 'POST', body: blob});
      const data = await res.json();
      drawCorners(data.grid_found ? data.corners : null, c.width, c.height);
      hintEl.textContent = data.grid_found
          ? 'grid locked — press capture' : 'point at a sudoku grid';
    } catch (e) { /* server busy; next tick retries */ }
  }

  document.getElementById('start').onclick = async () => {
    const stream = await navigator.mediaDevices.getUserMedia(
        {video: {facingMode: 'environment', width: 1280, height: 960}});
    video.srcObject = stream;
    if (state.liveTimer) clearInterval(state.liveTimer);
    state.liveTimer = setInterval(liveDetectTick, 600);
  };

  document.getElementById('capture').onclick = () => {
    const c = document.getElementById('frame');
    c.width = video.videoWidth; c.height = video.videoHeight;
    c.getContext('2d').drawImage(video, 0, 0);
    c.toBlob(send, 'image/jpeg', 0.92);
  };

  document.getElementById('file').onchange = e => {
    if (e.target.files[0]) send(e.target.files[0]);
  };
}

if (typeof window !== 'undefined') {
  window.SV = {applyEdit, classForCell, gridFromScan, statusFromRc,
               solveRoute, solveLocal};
  if (typeof document !== 'undefined' && document.getElementById) {
    document.addEventListener('DOMContentLoaded', initApp);
    if (document.readyState !== 'loading') initApp();
  }
}
