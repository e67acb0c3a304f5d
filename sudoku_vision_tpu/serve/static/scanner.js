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
// `tentative` marks solver-filled cells of an AMBIGUOUS scan (several
// solutions exist) so they render distinctly from a real answer.
function classForCell(recDigit, confidence, edited, tentative) {
  if (edited) return 'given';
  if (recDigit === '0') return tentative ? 'tentative' : 'solved';
  return confidence < 0.7 ? 'lowconf' : 'given';
}

// Extract the render model from a /scan response. An ambiguous scan
// carries its best-effort grid under tentative_solution (never
// "solution" — the server withholds that key so a multi-solution
// coin-flip cannot render like a real answer).
function gridFromScan(data) {
  return {
    rec: data.recognized_grid,
    sol: data.solution || data.tentative_solution || data.recognized_grid,
    conf: data.confidence,
    alts: data.alternatives || null,
    status: data.status,
    ambiguous: data.status === 'ambiguous',
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

// Hint line for the live streaming loop, from the server session's
// state machine (serve/server.py ScanSession: motion / searching /
// stabilizing / solved). Pure so the js_subset tests pin the exact
// strings the live overlay shows.
function hintForSession(state, run, required) {
  if (state === 'solved') return 'solved — hold to keep scanning';
  if (state === 'stabilizing') {
    return 'locking… (' + run + '/' + required + ')';
  }
  if (state === 'motion') return 'hold still…';
  return 'point at a sudoku grid';
}

// ---------- offline perception (pure helpers) ----------
//
// Capability parity with the reference's fully client-side pipeline
// (reference web/src/cv/gridDetector.ts + cellExtractor.ts +
// ml/preprocessor.ts + ml/digitClassifier.ts): when the server is
// unreachable the scanner detects, extracts, classifies and solves
// locally. Detection mirrors the TPU pipeline's own design (threshold
// -> largest connected ink region -> extreme-point quad, cv/grid.py);
// cell preprocessing is BIT-EXACT with the device graph's no-CLAHE
// canonical preproc (integer fixed-point gaussian taps + shift,
// ops/threshold.py adaptive_threshold); classification is a tiny int8
// MLP distilled from the flagship (served as /digit_weights.js,
// emitted by ml/train_tiny.py). Everything here is executed under test
// by utils/js_subset.py against numpy oracles.

// Box-mean downscale by integer factor f -> {d, w, h}.
function offDownscale(gray, w, h, f) {
  const ow = (w / f) | 0;
  const oh = (h / f) | 0;
  const d = [];
  for (let y = 0; y < oh; y++) {
    for (let x = 0; x < ow; x++) {
      let s = 0;
      for (let dy = 0; dy < f; dy++) {
        for (let dx = 0; dx < f; dx++) {
          s += gray[(y * f + dy) * w + x * f + dx];
        }
      }
      d.push(s / (f * f));
    }
  }
  return {d: d, w: ow, h: oh};
}

// Largest 4-connected ink component -> corner quad via extreme points
// (the cv/grid.py region-isolation + extreme-corner design, host-side).
// "Ink" = a pixel locally darker than its BRIGHT neighborhood (px <
// local mean - 8, like the pipeline's adaptive threshold — catches
// grid lines diluted by the downscale); the neighborhood must be
// paper-bright, so a dark table backdrop around the page is not ink.
// Local mean via integral image, 15x15 box.
// Returns [[x,y] tl, tr, br, bl] in FULL-RES coordinates, or null.
function offCorners(gray, w, h) {
  let f = ((w < h ? w : h) / 160) | 0;
  if (f < 1) f = 1;
  const s = offDownscale(gray, w, h, f);
  let mean = 0;
  for (let i = 0; i < s.d.length; i++) mean += s.d[i];
  mean = mean / s.d.length;
  // paper brightness = mean of the bright class
  let pm = 0;
  let pn = 0;
  for (let i = 0; i < s.d.length; i++) {
    if (s.d[i] > mean) { pm += s.d[i]; pn++; }
  }
  if (pn === 0) return null;
  pm = pm / pn;
  // integral image for the 15x15 local mean
  const iw = s.w + 1;
  const integ = [];
  for (let i = 0; i < iw * (s.h + 1); i++) integ.push(0);
  for (let y = 0; y < s.h; y++) {
    let row = 0;
    for (let x = 0; x < s.w; x++) {
      row += s.d[y * s.w + x];
      integ[(y + 1) * iw + x + 1] = integ[y * iw + x + 1] + row;
    }
  }
  const r = 7;
  const ink = [];
  for (let y = 0; y < s.h; y++) {
    for (let x = 0; x < s.w; x++) {
      let x0 = x - r; let y0 = y - r;
      let x1 = x + r + 1; let y1 = y + r + 1;
      if (x0 < 0) x0 = 0;
      if (y0 < 0) y0 = 0;
      if (x1 > s.w) x1 = s.w;
      if (y1 > s.h) y1 = s.h;
      const area = (x1 - x0) * (y1 - y0);
      const loc = (integ[y1 * iw + x1] - integ[y0 * iw + x1] -
                   integ[y1 * iw + x0] + integ[y0 * iw + x0]) / area;
      const px = s.d[y * s.w + x];
      ink.push(px < loc - 8 && loc > pm * 0.8 ? 1 : 0);
    }
  }
  // BFS labeling, keep the largest component's pixels.
  const seen = [];
  for (let i = 0; i < ink.length; i++) seen.push(0);
  let best = null;
  let bestN = 0;
  for (let i = 0; i < ink.length; i++) {
    if (ink[i] === 0 || seen[i] === 1) continue;
    const queue = [i];
    const comp = [];
    seen[i] = 1;
    let qi = 0;
    while (qi < queue.length) {
      const p = queue[qi];
      qi++;
      comp.push(p);
      const px = p % s.w;
      const py = (p / s.w) | 0;
      if (px > 0 && ink[p - 1] === 1 && seen[p - 1] === 0) {
        seen[p - 1] = 1; queue.push(p - 1);
      }
      if (px < s.w - 1 && ink[p + 1] === 1 && seen[p + 1] === 0) {
        seen[p + 1] = 1; queue.push(p + 1);
      }
      if (py > 0 && ink[p - s.w] === 1 && seen[p - s.w] === 0) {
        seen[p - s.w] = 1; queue.push(p - s.w);
      }
      if (py < s.h - 1 && ink[p + s.w] === 1 && seen[p + s.w] === 0) {
        seen[p + s.w] = 1; queue.push(p + s.w);
      }
    }
    if (comp.length > bestN) { bestN = comp.length; best = comp; }
  }
  // A real grid region covers a meaningful share of the frame.
  if (best === null || bestN < s.d.length * 0.02) return null;
  let tl = -1; let tr = -1; let br = -1; let bl = -1;
  let vTl = Infinity; let vTr = -Infinity; let vBr = -Infinity;
  let vBl = Infinity;
  for (let k = 0; k < best.length; k++) {
    const p = best[k];
    const x = p % s.w;
    const y = (p / s.w) | 0;
    if (x + y < vTl) { vTl = x + y; tl = p; }
    if (x - y > vTr) { vTr = x - y; tr = p; }
    if (x + y > vBr) { vBr = x + y; br = p; }
    if (x - y < vBl) { vBl = x - y; bl = p; }
  }
  const up = [];
  const pts = [tl, tr, br, bl];
  for (let k = 0; k < 4; k++) {
    const p = pts[k];
    up.push([(p % s.w) * f + f / 2, ((p / s.w) | 0) * f + f / 2]);
  }
  return up;
}

// Projective map coefficients: unit square (u,v) -> quad (Heckbert's
// closed form; same math as the 8x8 homography solve in ops/warp.py).
function offQuadMap(q) {
  const x0 = q[0][0]; const y0 = q[0][1];
  const x1 = q[1][0]; const y1 = q[1][1];
  const x2 = q[2][0]; const y2 = q[2][1];
  const x3 = q[3][0]; const y3 = q[3][1];
  const dx1 = x1 - x2; const dy1 = y1 - y2;
  const dx2 = x3 - x2; const dy2 = y3 - y2;
  const sx = x0 - x1 + x2 - x3;
  const sy = y0 - y1 + y2 - y3;
  const den = dx1 * dy2 - dx2 * dy1;
  const g = (sx * dy2 - dx2 * sy) / den;
  const h = (dx1 * sy - sx * dy1) / den;
  return {
    a: x1 - x0 + g * x1, b: x3 - x0 + h * x3, c: x0,
    d: y1 - y0 + g * y1, e: y3 - y0 + h * y3, f: y0,
    g: g, h: h,
  };
}

// Bilinear sample with replicate border.
function offSample(gray, w, h, x, y) {
  let x0 = Math.floor(x);
  let y0 = Math.floor(y);
  const fx = x - x0;
  const fy = y - y0;
  let x1 = x0 + 1;
  let y1 = y0 + 1;
  if (x0 < 0) x0 = 0;
  if (y0 < 0) y0 = 0;
  if (x1 < 0) x1 = 0;
  if (y1 < 0) y1 = 0;
  if (x0 > w - 1) x0 = w - 1;
  if (x1 > w - 1) x1 = w - 1;
  if (y0 > h - 1) y0 = h - 1;
  if (y1 > h - 1) y1 = h - 1;
  const p00 = gray[y0 * w + x0];
  const p01 = gray[y0 * w + x1];
  const p10 = gray[y1 * w + x0];
  const p11 = gray[y1 * w + x1];
  return p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy) +
         p10 * (1 - fx) * fy + p11 * fx * fy;
}

// 81 cells of 28x28 rounded-u8 grays, sampled through the quad map on
// the reference cell geometry: warp 450, 50px cells, 10% margin
// (cv/extract.py contract) — warp+crop+resize as ONE gather, the same
// fusion the device graph does.
function offExtractCells(gray, w, h, corners) {
  const m = offQuadMap(corners);
  const cells = [];
  for (let r = 0; r < 9; r++) {
    for (let c = 0; c < 9; c++) {
      const cell = [];
      for (let i = 0; i < 28; i++) {
        for (let j = 0; j < 28; j++) {
          const u = (c * 50 + 5 + (j + 0.5) * (40 / 28)) / 450;
          const v = (r * 50 + 5 + (i + 0.5) * (40 / 28)) / 450;
          const den = m.g * u + m.h * v + 1;
          const sx = (m.a * u + m.b * v + m.c) / den;
          const sy = (m.d * u + m.e * v + m.f) / den;
          cell.push(Math.round(offSample(gray, w, h, sx, sy)));
        }
      }
      cells.push(cell);
    }
  }
  return cells;
}

// The canonical no-CLAHE cell preproc, BIT-EXACT with the device graph
// (ops/threshold.py adaptive_threshold: 11-tap fixed-point gaussian
// [2,7,17,31,45,52,45,31,17,7,2]/256 separable with replicate border,
// mean = (acc + 32768) >> 16, binary = src > mean - 2, then invert and
// normalize to {-1, +1}) — cv/extract.py preprocess_cells_for_model.
function offPreprocCell(cell) {
  const taps = [2, 7, 17, 31, 45, 52, 45, 31, 17, 7, 2];
  const tmp = [];
  for (let y = 0; y < 28; y++) {
    for (let x = 0; x < 28; x++) {
      let acc = 0;
      for (let k = -5; k <= 5; k++) {
        let xx = x + k;
        if (xx < 0) xx = 0;
        if (xx > 27) xx = 27;
        acc += taps[k + 5] * cell[y * 28 + xx];
      }
      tmp.push(acc);
    }
  }
  const out = [];
  for (let x = 0; x < 28; x++) {
    for (let y = 0; y < 28; y++) {
      let acc = 0;
      for (let k = -5; k <= 5; k++) {
        let yy = y + k;
        if (yy < 0) yy = 0;
        if (yy > 27) yy = 27;
        acc += taps[k + 5] * tmp[yy * 28 + x];
      }
      const mean = (acc + 32768) >> 16;
      // BINARY: above local mean - C -> 255 (paper), else 0 (ink);
      // invert -> ink = 1 -> normalize to +1.
      out.push(cell[y * 28 + x] > mean - 2 ? -1 : 1);
    }
  }
  // out is column-major from the second pass; fix to row-major.
  const rm = [];
  for (let y = 0; y < 28; y++) {
    for (let x = 0; x < 28; x++) rm.push(out[x * 28 + y]);
  }
  return rm;
}

// Ink fraction in the center region (empty-cell heuristic,
// cv/extract.py cells_empty_mask role).
function offInkFraction(pre) {
  let ink = 0;
  let n = 0;
  for (let y = 5; y < 23; y++) {
    for (let x = 5; x < 23; x++) {
      n++;
      if (pre[y * 28 + x] > 0) ink++;
    }
  }
  return ink / n;
}

// Tiny int8 MLP: 28x28 {-1,1} -> 784 -> relu(96) -> 10 logits ->
// {digit, conf}. No pooling: thin binary strokes do not survive a 2x2
// mean pool. Weights from /digit_weights.js (ml/train_tiny.py:
// distilled from the flagship, int8 per-layer scale). Since the input
// is +-1, the first matmul accumulates signed INTEGER weight sums —
// exact in both JS doubles and the numpy oracle.
function offClassifyCell(pre, wts) {
  const h1 = [];
  for (let j = 0; j < 96; j++) {
    let s = 0;
    for (let i = 0; i < 784; i++) s += pre[i] * wts.w1[i * 96 + j];
    s = s * wts.s1 + wts.b1[j];
    h1.push(s > 0 ? s : 0);
  }
  let bestD = 0;
  let bestV = -Infinity;
  let denom = 0;
  const logits = [];
  for (let k = 0; k < 10; k++) {
    let s = 0;
    for (let j = 0; j < 96; j++) s += h1[j] * wts.w2[j * 10 + k];
    s = s * wts.s2 + wts.b2[k];
    logits.push(s);
    if (s > bestV) { bestV = s; bestD = k; }
  }
  for (let k = 0; k < 10; k++) denom += Math.exp(logits[k] - bestV);
  return {digit: bestD, conf: 1 / denom};
}

// Full offline scan: gray frame -> {found, corners, rec, conf}.
function offScan(gray, w, h, wts) {
  const corners = offCorners(gray, w, h);
  if (corners === null) return {found: false, corners: null,
                                rec: null, conf: null};
  const cells = offExtractCells(gray, w, h, corners);
  let rec = '';
  const conf = [];
  for (let i = 0; i < 81; i++) {
    const pre = offPreprocCell(cells[i]);
    if (offInkFraction(pre) < 0.02) {
      rec += '0';
      conf.push(1);
      continue;
    }
    const r = offClassifyCell(pre, wts);
    rec += String(r.digit);
    conf.push(r.conf);
  }
  return {found: true, corners: corners, rec: rec, conf: conf};
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
    ambiguous: false,   // scan had several solutions (sol is tentative)
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
                                  state.edited.has(i), state.ambiguous);
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
    state.sol = data.solution || data.tentative_solution || state.rec;
    state.ambiguous = data.status === 'ambiguous';
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

  // Offline fallback: camera-to-solution with the server down
  // (reference web app's fully client-side pipeline). Glue only —
  // every decision ran through the pure off* helpers above.
  let _weights = null;
  async function scanOffline(blob) {
    const img = await createImageBitmap(blob);
    const c = document.getElementById('frame');
    c.width = img.width; c.height = img.height;
    const ctx = c.getContext('2d');
    ctx.drawImage(img, 0, 0);
    const d = ctx.getImageData(0, 0, c.width, c.height).data;
    const gray = new Array(c.width * c.height);
    for (let i = 0; i < gray.length; i++) {
      gray[i] = (d[4 * i] + d[4 * i + 1] + d[4 * i + 2]) / 3;
    }
    if (!_weights) {
      if (typeof digitWeights === 'undefined') {
        await new Promise((ok, err) => {
          const s = document.createElement('script');
          s.src = '/digit_weights.js';
          s.onload = ok;
          s.onerror = err;
          document.head.appendChild(s);
        });
      }
      _weights = digitWeights();
    }
    const res = offScan(gray, c.width, c.height, _weights);
    if (!res.found) return null;
    const solved = await solveLocal(res.rec);
    return {
      grid_found: true, recognized_grid: res.rec, confidence: res.conf,
      corners: res.corners, alternatives: null, offline: true,
      status: solved ? solved.status : 'unsolvable',
      solution: solved ? solved.solution : null,
      time_graph_ms: 'local',
    };
  }

  function showScan(data, ms) {
    const m = gridFromScan(data);
    state.rec = m.rec; state.sol = m.sol; state.conf = m.conf;
    state.alts = m.alts; state.edited = new Set(); state.editing = -1;
    state.ambiguous = m.ambiguous;
    statusEl.textContent = m.status +
        (data.time_graph_ms !== undefined
             ? ` · graph ${data.time_graph_ms} ms` : '') +
        ` · round-trip ${ms} ms` +
        (data.n_coalesced > 1 ? ` · batch of ${data.n_coalesced}` : '');
    hintEl.textContent = m.ambiguous
        ? 'several solutions fit this scan — dimmed digits are ' +
          'TENTATIVE; correct a cell (a missed given?) to disambiguate'
        : 'tap any cell to correct it (red = low confidence)';
    render();
  }

  async function send(blob) {
    statusEl.textContent = 'scanning on TPU…';
    const t0 = performance.now();
    let data;
    try {
      const res = await fetch('/scan', {method: 'POST', body: blob});
      data = await res.json();
    } catch (e) {
      statusEl.textContent = 'server unreachable — scanning locally…';
      data = await scanOffline(blob);
      if (!data) {
        statusEl.textContent = 'offline scan: no grid found';
        return;
      }
    }
    const ms = (performance.now() - t0).toFixed(0);
    if (!data.grid_found) { statusEl.textContent = 'no grid found'; return; }
    showScan(data, ms);
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

  // Streaming live loop: one server-side session carries the Kalman
  // corner stabilizer, the motion gate, and the 3-identical-grids
  // counter (serve/server.py ScanSession — the TPU inversion of ios
  // ScanPipeline.swift:245, which keeps this state on the phone). The
  // solve fires exactly once per stable segment and renders WITHOUT
  // pressing capture.
  // Entropy-mixed id: performance.now() alone starts near 0 on every
  // page load, so two tabs could collide and share one ScanSession,
  // corrupting each other's stabilizer state (advisor finding).
  const sid = 'live-' + Date.now().toString(36) + '-' +
      Math.random().toString(36).slice(2, 10);
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
      // pipeline=1: the server dispatches this frame asynchronously
      // and answers with the PREVIOUS frame's completed result, so
      // the device round-trip overlaps our capture of the next frame
      // (the double-buffered live path; results lag one frame).
      const res = await fetch('/scan?session=' + sid + '&pipeline=1',
                              {method: 'POST', body: blob});
      const data = await res.json();
      drawCorners(data.grid_found ? data.corners : null, c.width, c.height);
      hintEl.textContent = hintForSession(
          data.state, data.stable_run, data.required_stable);
      if (data.solved_now) showScan(data, data.time_total_ms);
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
               solveRoute, hintForSession, solveLocal, offScan,
               offCorners, offExtractCells, offPreprocCell,
               offClassifyCell};
  if (typeof document !== 'undefined' && document.getElementById) {
    document.addEventListener('DOMContentLoaded', initApp);
    if (document.readyState !== 'loading') initApp();
  }
}
