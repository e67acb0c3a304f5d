#!/usr/bin/env python3
"""Emit sudoku.wasm with zero toolchain: a hand-assembled WebAssembly module.

The reference ships a browser solver module built by emscripten
(reference solver/Makefile.wasm + solver/src/wasm_api.c:8-49, loaded by
web/src/solver.ts). This image has no emcc/clang/node, so instead of
leaving the artifact env-gated, this script assembles the module
directly: it emits the WASM 1.0 binary format (LEB128 sections,
structured control flow, i32 ops) from Python and writes
serve/static/sudoku.wasm, which the hand-written loader
serve/static/sudoku.js exposes as the same `SudokuSolver()` factory the
emscripten MODULARIZE glue would provide (scanner.js consumes only
`module.cwrap(name, ...)`).

Export surface (contract of native/solver/src/wasm_api.cpp, itself
capability-parity with reference solver/src/wasm_api.c):

    set_cell(row, col, value)           store into the static 81-cell grid
    get_cell(row, col) -> i32           read back (-1 out of range)
    clear_grid()
    solve() -> i32                      1 solved / 0 unsolvable / -1 invalid
    is_valid() -> i32                   1 / 0
    cell_candidates(row, col) -> i32    bitmask of legal digits (0 invalid)

The solver algorithm inside the module is the bitmask + MRV backtracking
core of native/solver/src/sudoku.cpp re-expressed in raw wasm: per-unit
uint32 used-digit masks, candidate mask = ~(row|col|box) & 0x3FE,
minimum-remaining-values cell choice, recursive try/undo. (No
naked/hidden-single propagation pass: MRV + bitmasks alone solve the
"evil" tier in well under a millisecond, and the wasm contract is the
JS-facing API, not the internal search order.)

Semantics matched against the native library (asserted in
tests/test_wasm_artifact.py by running this artifact in the in-repo
interpreter sudoku_vision_tpu/utils/wasm_vm.py against libsudoku.so):
  * solve() return codes and that the grid holds the solution after
    success and is unchanged after failure;
  * cell_candidates: filled cell -> 1<<digit, empty -> peer-exclusion
    mask (sudoku.cpp::cell_cands), any invalid grid -> 0
    (wasm_api.cpp::cell_candidates);
  * out-of-range digits (v < 0 or v > 9) make the grid invalid
    (sudoku.cpp::init_state).

Memory layout (one 64 KiB page, exported as `memory`):
    0    .. 324   grid[81]     i32, row-major
    400  .. 436   rowmask[9]   i32, bit d set iff digit d used in row
    440  .. 476   colmask[9]
    480  .. 516   boxmask[9]

Deterministic: re-running bit-identically reproduces the checked-in
artifact (asserted in tests), so `make -C native/solver wasm` is
reproducible without emscripten.
"""
from __future__ import annotations

import os
import sys

# ---------------------------------------------------------------- encoding

I32 = 0x7F
EMPTY = 0x40  # void blocktype


def uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not b & 0x40) or (n == -1 and b & 0x40):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


def vec(items: list[bytes]) -> bytes:
    return uleb(len(items)) + b"".join(items)


def section(sid: int, content: bytes) -> bytes:
    return bytes([sid]) + uleb(len(content)) + content


def name(s: str) -> bytes:
    b = s.encode()
    return uleb(len(b)) + b


# ---------------------------------------------------------------- body DSL


class Body:
    """Builds one function body. All values are i32; `locals_` counts the
    extra locals beyond the parameters (wasm numbers params first)."""

    def __init__(self, locals_: int = 0):
        self.n_locals = locals_
        self.b = bytearray()

    # -- encoded output
    def encode(self) -> bytes:
        decls = vec([uleb(self.n_locals) + bytes([I32])]) if self.n_locals \
            else vec([])
        body = decls + bytes(self.b) + b"\x0B"  # end
        return uleb(len(body)) + body

    # -- raw emit helpers
    def op(self, *bs: int) -> "Body":
        self.b.extend(bs)
        return self

    def get(self, i): return self.op(0x20, *uleb(i))
    def set(self, i): return self.op(0x21, *uleb(i))
    def tee(self, i): return self.op(0x22, *uleb(i))
    def i32(self, n): return self.op(0x41, *sleb(n))
    # align=2 (4-byte), static offset
    def load(self, off=0): return self.op(0x28, 0x02, *uleb(off))
    def store(self, off=0): return self.op(0x36, 0x02, *uleb(off))
    def call(self, f): return self.op(0x10, *uleb(f))

    def block(self): return self.op(0x02, EMPTY)
    def loop(self): return self.op(0x03, EMPTY)
    def if_(self): return self.op(0x04, EMPTY)
    def else_(self): return self.op(0x05)
    def end(self): return self.op(0x0B)
    def br(self, d): return self.op(0x0C, *uleb(d))
    def br_if(self, d): return self.op(0x0D, *uleb(d))
    def ret(self): return self.op(0x0F)

    def eqz(self): return self.op(0x45)
    def eq(self): return self.op(0x46)
    def ne(self): return self.op(0x47)
    def lt_s(self): return self.op(0x48)
    def gt_u(self): return self.op(0x4B)
    def ge_u(self): return self.op(0x4F)
    def add(self): return self.op(0x6A)
    def sub(self): return self.op(0x6B)
    def mul(self): return self.op(0x6C)
    def div_u(self): return self.op(0x6E)
    def rem_u(self): return self.op(0x70)
    def and_(self): return self.op(0x71)
    def or_(self): return self.op(0x72)
    def xor(self): return self.op(0x73)
    def shl(self): return self.op(0x74)
    def ctz(self): return self.op(0x68)
    def popcnt(self): return self.op(0x69)

    # -- composite helpers ---------------------------------------------
    GRID, ROWM, COLM, BOXM = 0, 400, 440, 480

    def load_grid(self, idx_local: int):
        """push grid[local idx]"""
        return self.get(idx_local).i32(4).mul().load(self.GRID)

    def mask_addr(self, unit_local: int):
        """push mask element offset (unit*4); the base-table byte offset
        is applied by the subsequent load/store immediate"""
        return self.get(unit_local).i32(4).mul()

    def load_mask(self, base: int, unit_local: int):
        return self.mask_addr(unit_local).load(base)

    def rcb(self, idx_local: int, r: int, c: int, b: int):
        """locals r,c,b = idx/9, idx%9, (r/3)*3 + c/3"""
        self.get(idx_local).i32(9).div_u().set(r)
        self.get(idx_local).i32(9).rem_u().set(c)
        self.get(r).i32(3).div_u().i32(3).mul()
        self.get(c).i32(3).div_u().add().set(b)
        return self

    def or_into_mask(self, base: int, unit_local: int, bit_local: int):
        """mask[unit] |= bit (also used with xor for undo via op arg)"""
        self.mask_addr(unit_local)
        self.load_mask(base, unit_local).get(bit_local).or_()
        return self.store(base)

    def xor_into_mask(self, base: int, unit_local: int, bit_local: int):
        self.mask_addr(unit_local)
        self.load_mask(base, unit_local).get(bit_local).xor()
        return self.store(base)


# Function indices (order fixed by the function section below).
SET_CELL, GET_CELL, CLEAR_GRID, IS_VALID, SOLVE, CELL_CANDS = range(6)
INIT_MASKS, CAND_AT, BTRACK = 6, 7, 8

ALL_DIGITS = 0x3FE  # bits 1..9


def build_set_cell() -> Body:
    f = Body()
    # params: 0=row 1=col 2=value
    f.block()
    f.get(0).i32(9).ge_u().br_if(0)   # unsigned compare catches negatives
    f.get(1).i32(9).ge_u().br_if(0)
    f.get(0).i32(9).mul().get(1).add().i32(4).mul()
    f.get(2).store(Body.GRID)
    f.end()
    return f


def build_get_cell() -> Body:
    f = Body()
    f.block()
    f.get(0).i32(9).ge_u().br_if(0)
    f.get(1).i32(9).ge_u().br_if(0)
    f.get(0).i32(9).mul().get(1).add().i32(4).mul().load(Body.GRID)
    f.ret()
    f.end()
    f.i32(-1)
    return f


def build_clear_grid() -> Body:
    f = Body(locals_=1)  # 0=i
    f.i32(0).set(0)
    f.loop()
    f.get(0).i32(4).mul().i32(0).store(Body.GRID)
    f.get(0).i32(1).add().tee(0).i32(81).lt_s().br_if(0)
    f.end()
    return f


def build_init_masks() -> Body:
    """-> 0 ok, -1 duplicate digit or value out of range. Rebuilds the
    row/col/box used-digit masks from the grid (sudoku.cpp::init_state)."""
    # locals: 0=i 1=v 2=bit 3=r 4=c 5=b
    f = Body(locals_=6)
    # zero the mask region: 29 words spans 400..516 (the 40-byte base
    # spacing leaves one unused word between mask arrays)
    f.i32(0).set(0)
    f.loop()
    f.get(0).i32(4).mul().i32(0).store(Body.ROWM)
    f.get(0).i32(1).add().tee(0).i32(29).lt_s().br_if(0)
    f.end()
    # scan cells
    f.i32(0).set(0)
    f.loop()
    f.load_grid(0).tee(1)
    f.if_()                                   # v != 0
    f.get(1).i32(9).gt_u().if_()              # v<0 (huge unsigned) or >9
    f.i32(-1).ret()
    f.end()
    f.i32(1).get(1).shl().set(2)              # bit = 1 << v
    f.rcb(0, 3, 4, 5)
    # duplicate?
    f.load_mask(Body.ROWM, 3).load_mask(Body.COLM, 4).or_()
    f.load_mask(Body.BOXM, 5).or_().get(2).and_()
    f.if_()
    f.i32(-1).ret()
    f.end()
    f.or_into_mask(Body.ROWM, 3, 2)
    f.or_into_mask(Body.COLM, 4, 2)
    f.or_into_mask(Body.BOXM, 5, 2)
    f.end()                                   # if v
    f.get(0).i32(1).add().tee(0).i32(81).lt_s().br_if(0)
    f.end()                                   # loop
    f.i32(0)
    return f


def build_cand_at() -> Body:
    """cand_at(idx) -> ~(rowmask|colmask|boxmask) & 0x3FE
    (sudoku.cpp::cell_cands)."""
    # params: 0=idx; locals: 1=r 2=c 3=b
    f = Body(locals_=3)
    f.rcb(0, 1, 2, 3)
    f.load_mask(Body.ROWM, 1).load_mask(Body.COLM, 2).or_()
    f.load_mask(Body.BOXM, 3).or_()
    f.i32(-1).xor().i32(ALL_DIGITS).and_()
    return f


def build_is_valid() -> Body:
    f = Body()
    f.call(INIT_MASKS).eqz()
    return f


def build_solve() -> Body:
    f = Body()
    f.call(INIT_MASKS)
    f.if_()
    f.i32(-1).ret()
    f.end()
    f.call(BTRACK)
    return f


def build_btrack() -> Body:
    """MRV backtracking over the shared masks -> 1 solved / 0 dead end.
    Undoes its placements on failure so solve() leaves a failed grid
    unchanged (matches sv_solve)."""
    # locals: 0=i 1=best 2=bestm 3=bestn 4=m 5=n 6=bit 7=r 8=c 9=b
    f = Body(locals_=10)
    f.i32(-1).set(1)
    f.i32(10).set(3)
    f.i32(0).set(0)
    f.block()                                 # early exit on a 1-candidate cell
    f.loop()
    f.load_grid(0).eqz().if_()
    f.get(0).call(CAND_AT).tee(4)
    f.popcnt().tee(5)
    f.eqz().if_()                             # dead empty cell
    f.i32(0).ret()
    f.end()
    f.get(5).get(3).lt_s().if_()
    f.get(5).set(3)
    f.get(0).set(1)
    f.get(4).set(2)
    f.get(5).i32(1).eq().br_if(3)             # n==1: stop scanning
    # (label depths here: 0=this if, 1=the grid==0 if, 2=loop, 3=block)
    f.end()
    f.end()
    f.get(0).i32(1).add().tee(0).i32(81).lt_s().br_if(0)
    f.end()                                   # loop
    f.end()                                   # block
    f.get(1).i32(0).lt_s().if_()              # no empty cell left
    f.i32(1).ret()
    f.end()
    f.rcb(1, 7, 8, 9)
    f.get(2).set(4)                           # m = bestm (nonzero)
    f.loop()
    f.get(4).i32(0).get(4).sub().and_().set(6)  # bit = m & -m
    f.get(4).get(6).xor().set(4)
    # place: grid[best] = ctz(bit); masks |= bit
    f.get(1).i32(4).mul().get(6).ctz().store(Body.GRID)
    f.or_into_mask(Body.ROWM, 7, 6)
    f.or_into_mask(Body.COLM, 8, 6)
    f.or_into_mask(Body.BOXM, 9, 6)
    f.call(BTRACK).if_()
    f.i32(1).ret()
    f.end()
    # undo
    f.get(1).i32(4).mul().i32(0).store(Body.GRID)
    f.xor_into_mask(Body.ROWM, 7, 6)
    f.xor_into_mask(Body.COLM, 8, 6)
    f.xor_into_mask(Body.BOXM, 9, 6)
    f.get(4).br_if(0)                         # more candidate bits
    f.end()
    f.i32(0)
    return f


def build_cell_candidates() -> Body:
    """wasm_api.cpp::cell_candidates: 0 on bad index or invalid grid;
    1<<digit for a filled cell; peer-exclusion mask for an empty one."""
    # params: 0=row 1=col; locals: 2=idx 3=v
    f = Body(locals_=2)
    f.block()
    f.get(0).i32(9).ge_u().br_if(0)
    f.get(1).i32(9).ge_u().br_if(0)
    f.call(INIT_MASKS).br_if(0)               # invalid grid -> 0
    f.get(0).i32(9).mul().get(1).add().set(2)
    f.load_grid(2).tee(3)
    f.if_()
    f.i32(1).get(3).shl().ret()
    f.end()
    f.get(2).call(CAND_AT).ret()
    f.end()
    f.i32(0)
    return f


# ---------------------------------------------------------------- module


def build_module() -> bytes:
    # types: 0 ()->(), 1 (i32,i32,i32)->(), 2 (i32,i32)->i32,
    #        3 ()->i32, 4 (i32)->i32
    types = [
        b"\x60" + vec([]) + vec([]),
        b"\x60" + vec([bytes([I32])] * 3) + vec([]),
        b"\x60" + vec([bytes([I32])] * 2) + vec([bytes([I32])]),
        b"\x60" + vec([]) + vec([bytes([I32])]),
        b"\x60" + vec([bytes([I32])]) + vec([bytes([I32])]),
    ]
    # function index -> type index (order defines SET_CELL..BTRACK above)
    ftypes = [1, 2, 0, 3, 3, 2, 3, 4, 3]
    bodies = [
        build_set_cell(), build_get_cell(), build_clear_grid(),
        build_is_valid(), build_solve(), build_cell_candidates(),
        build_init_masks(), build_cand_at(), build_btrack(),
    ]
    exports = [
        name("set_cell") + b"\x00" + uleb(SET_CELL),
        name("get_cell") + b"\x00" + uleb(GET_CELL),
        name("clear_grid") + b"\x00" + uleb(CLEAR_GRID),
        name("is_valid") + b"\x00" + uleb(IS_VALID),
        name("solve") + b"\x00" + uleb(SOLVE),
        name("cell_candidates") + b"\x00" + uleb(CELL_CANDS),
        name("memory") + b"\x02" + uleb(0),
    ]
    return (
        b"\x00asm\x01\x00\x00\x00"
        + section(1, vec(types))
        + section(3, vec([uleb(t) for t in ftypes]))
        + section(5, vec([b"\x00" + uleb(1)]))       # 1 page, no max
        + section(7, vec(exports))
        + section(10, vec([b.encode() for b in bodies]))
    )


DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "..", "sudoku_vision_tpu", "serve", "static", "sudoku.wasm")


def main(argv: list[str]) -> int:
    out = argv[1] if len(argv) > 1 else os.path.normpath(DEFAULT_OUT)
    blob = build_module()
    with open(out, "wb") as fh:
        fh.write(blob)
    print(f"wrote {out} ({len(blob)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
