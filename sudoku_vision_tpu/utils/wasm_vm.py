"""Minimal WebAssembly 1.0 interpreter — just enough to execute and
validate the shipped browser solver artifact without a JS runtime.

The reference validates its wasm solver in a real browser
(reference web/test-browser.mjs drives sudoku.wasm through Puppeteer).
This image has no node/browser, so tests/test_wasm_artifact.py instead
executes serve/static/sudoku.wasm with this interpreter and asserts its
behavior against the native libsudoku.so oracle. The interpreter is
intentionally scoped: i32-only, single linear memory, no imports,
tables, globals, or floats — exactly the profile emitted by
native/solver/emit_wasm.py. Unknown opcodes raise instead of
misexecuting, so drift between emitter and VM fails loudly.

Not a general-purpose runtime: correctness over speed (it still solves
the "evil" benchmark tier in well under a second). Loads/stores compute
the effective address as unsigned and explicitly range-check it (trap =
IndexError). On load, every function body is structurally validated
with the spec's control-frame stack-height algorithm (operand counts,
br depths and arities, end-of-block heights), so a spec-invalid module
emitted by a future emit_wasm.py edit fails here instead of only in a
real browser's WebAssembly.instantiate.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

MASK32 = 0xFFFFFFFF


def _s32(v: int) -> int:
    v &= MASK32
    return v - 0x100000000 if v & 0x80000000 else v


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def uleb(self) -> int:
        result = shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return result

    def sleb(self) -> int:
        result = shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                if b & 0x40:
                    result |= -(1 << shift)
                return result


# Structured instruction: (opcode_name, immediates...) — block bodies are
# parsed into nested lists once at load time.
_RETURN = object()


@dataclass
class _Func:
    type_idx: int
    n_params: int
    n_results: int
    locals_count: int = 0
    code: list = field(default_factory=list)


class WasmModule:
    """Parse + instantiate a module of the supported profile."""

    def __init__(self, blob: bytes):
        if blob[:8] != b"\x00asm\x01\x00\x00\x00":
            raise ValueError("not a wasm 1.0 module")
        self.types: list[tuple[int, int]] = []   # (n_params, n_results)
        self.funcs: list[_Func] = []
        self.exports: dict[str, tuple[str, int]] = {}
        self.memory = bytearray()
        r = _Reader(blob, 8)
        while r.pos < len(blob):
            sid = r.byte()
            size = r.uleb()
            body = _Reader(r.take(size))
            if sid == 1:
                self._parse_types(body)
            elif sid == 3:
                for _ in range(body.uleb()):
                    t = body.uleb()
                    self.funcs.append(_Func(t, *self.types[t]))
            elif sid == 5:
                n = body.uleb()
                if n:
                    flags = body.byte()
                    pages = body.uleb()
                    if flags & 1:
                        body.uleb()  # max, unused
                    self.memory = bytearray(pages * 65536)
            elif sid == 7:
                for _ in range(body.uleb()):
                    nm = body.take(body.uleb()).decode()
                    kind = body.byte()
                    idx = body.uleb()
                    self.exports[nm] = ({0: "func", 2: "memory"}.get(
                        kind, str(kind)), idx)
            elif sid == 10:
                self._parse_code(body)
            # other sections (custom, etc.) are skipped
        self._validate()

    def _parse_types(self, r: _Reader) -> None:
        for _ in range(r.uleb()):
            if r.byte() != 0x60:
                raise ValueError("bad functype")
            n_params = r.uleb()
            for _ in range(n_params):
                if r.byte() != 0x7F:
                    raise ValueError("non-i32 param unsupported")
            n_results = r.uleb()
            for _ in range(n_results):
                if r.byte() != 0x7F:
                    raise ValueError("non-i32 result unsupported")
            self.types.append((n_params, n_results))

    def _parse_code(self, r: _Reader) -> None:
        n = r.uleb()
        if n != len(self.funcs):
            raise ValueError("code/function section count mismatch")
        for f in self.funcs:
            size = r.uleb()
            body = _Reader(r.take(size))
            count = 0
            for _ in range(body.uleb()):
                n = body.uleb()
                if body.byte() != 0x7F:
                    raise ValueError("non-i32 local unsupported")
                count += n
            f.locals_count = count
            f.code = self._parse_expr(body)

    def _parse_expr(self, r: _Reader) -> list:
        """Parse until the matching `end` (0x0B); returns instr list."""
        out = []
        while True:
            op = r.byte()
            if op == 0x0B:
                return out
            if op == 0x02 or op == 0x03:               # block / loop
                bt = r.byte()
                arity = 0 if bt == 0x40 else 1
                out.append(("block" if op == 0x02 else "loop",
                            arity, self._parse_expr(r)))
            elif op == 0x04:                            # if
                bt = r.byte()
                arity = 0 if bt == 0x40 else 1
                then = []
                els = []
                depth_done = False
                # parse then-arm manually to catch `else`
                cur = then
                while True:
                    peek = r.data[r.pos]
                    if peek == 0x05:
                        r.pos += 1
                        cur = els
                        continue
                    if peek == 0x0B:
                        r.pos += 1
                        depth_done = True
                        break
                    cur.extend(self._parse_one(r))
                assert depth_done
                out.append(("if", arity, then, els))
            elif op == 0x05:
                raise ValueError("stray else")
            else:
                out.append(self._decode_simple(op, r))

    def _parse_one(self, r: _Reader) -> list:
        """Parse exactly one instruction (possibly nested)."""
        op = r.byte()
        if op in (0x02, 0x03):
            bt = r.byte()
            arity = 0 if bt == 0x40 else 1
            return [("block" if op == 0x02 else "loop",
                     arity, self._parse_expr(r))]
        if op == 0x04:
            bt = r.byte()
            arity = 0 if bt == 0x40 else 1
            then = []
            els = []
            cur = then
            while True:
                peek = r.data[r.pos]
                if peek == 0x05:
                    r.pos += 1
                    cur = els
                    continue
                if peek == 0x0B:
                    r.pos += 1
                    break
                cur.extend(self._parse_one(r))
            return [("if", arity, then, els)]
        return [self._decode_simple(op, r)]

    @staticmethod
    def _decode_simple(op: int, r: _Reader):
        if op == 0x0C:
            return ("br", r.uleb())
        if op == 0x0D:
            return ("br_if", r.uleb())
        if op == 0x0F:
            return ("return",)
        if op == 0x10:
            return ("call", r.uleb())
        if op in (0x20, 0x21, 0x22):
            return ({0x20: "local.get", 0x21: "local.set",
                     0x22: "local.tee"}[op], r.uleb())
        if op == 0x28:
            r.uleb()                    # align (ignored)
            return ("i32.load", r.uleb())
        if op == 0x36:
            r.uleb()
            return ("i32.store", r.uleb())
        if op == 0x41:
            return ("i32.const", r.sleb())
        if op == 0x1A:
            return ("drop",)
        simple = {
            0x45: "eqz", 0x46: "eq", 0x47: "ne", 0x48: "lt_s", 0x49: "lt_u",
            0x4A: "gt_s", 0x4B: "gt_u", 0x4C: "le_s", 0x4D: "le_u",
            0x4E: "ge_s", 0x4F: "ge_u",
            0x67: "clz", 0x68: "ctz", 0x69: "popcnt",
            0x6A: "add", 0x6B: "sub", 0x6C: "mul",
            0x6D: "div_s", 0x6E: "div_u", 0x6F: "rem_s", 0x70: "rem_u",
            0x71: "and", 0x72: "or", 0x73: "xor",
            0x74: "shl", 0x75: "shr_s", 0x76: "shr_u",
        }
        if op in simple:
            return (simple[op],)
        raise ValueError(f"unsupported opcode 0x{op:02X}")

    # ----------------------------------------------------------- validate

    # Net stack effect (pops, pushes) of every simple instruction.
    _EFFECTS = {
        "i32.const": (0, 1), "local.get": (0, 1), "local.set": (1, 0),
        "local.tee": (1, 1), "i32.load": (1, 1), "i32.store": (2, 0),
        "drop": (1, 0), "eqz": (1, 1), "clz": (1, 1), "ctz": (1, 1),
        "popcnt": (1, 1),
    }
    for _op in ("eq", "ne", "lt_s", "lt_u", "gt_s", "gt_u", "le_s",
                "le_u", "ge_s", "ge_u", "add", "sub", "mul", "div_s",
                "div_u", "rem_s", "rem_u", "and", "or", "xor", "shl",
                "shr_s", "shr_u"):
        _EFFECTS[_op] = (2, 1)
    del _op

    def _validate(self) -> None:
        """Spec-style structural validation of every function body.

        All values are i32 in this profile, so type checking reduces to
        the control-frame stack-height algorithm: track the operand
        stack height per frame, check operand counts, br label depths
        and arities, and the exact end-of-block height. A module that
        fails here would throw in WebAssembly.instantiate; catching it
        at load keeps emitter regressions from passing the suite.
        """
        for fidx, f in enumerate(self.funcs):
            n_locals = f.n_params + f.locals_count
            try:
                self._check_block(f.code, [f.n_results], f.n_results,
                                  n_locals)
            except ValueError as e:
                raise ValueError(f"func {fidx} invalid: {e}") from None

    def _check_block(self, code: list, labels: list[int], arity: int,
                     n_locals: int) -> None:
        """Validate one instruction sequence. `labels` is the br-target
        arity per depth (innermost first; the function frame is the
        outermost). Raises ValueError on any violation."""
        h = 0

        def pop(n: int) -> None:
            nonlocal h
            if h < n:
                raise ValueError(f"stack underflow (have {h}, need {n})")
            h -= n

        for i, ins in enumerate(code):
            op = ins[0]
            eff = self._EFFECTS.get(op)
            if eff is not None:
                if op in ("local.get", "local.set", "local.tee") \
                        and ins[1] >= n_locals:
                    raise ValueError(f"local index {ins[1]} out of range")
                pop(eff[0])
                h += eff[1]
            elif op == "call":
                if ins[1] >= len(self.funcs):
                    raise ValueError(f"call index {ins[1]} out of range")
                callee = self.funcs[ins[1]]
                pop(callee.n_params)
                h += callee.n_results
            elif op == "block" or op == "loop":
                # br to a block targets its end (arity values); br to a
                # loop targets its start (no values in wasm 1.0).
                inner = ([ins[1]] if op == "block" else [0]) + labels
                self._check_block(ins[2], inner, ins[1], n_locals)
                h += ins[1]
            elif op == "if":
                pop(1)
                if ins[1] and not ins[3]:
                    raise ValueError("if with result arity needs an else")
                inner = [ins[1]] + labels
                self._check_block(ins[2], inner, ins[1], n_locals)
                if ins[3]:
                    self._check_block(ins[3], inner, ins[1], n_locals)
                h += ins[1]
            elif op == "br" or op == "br_if":
                if ins[1] >= len(labels):
                    raise ValueError(f"br depth {ins[1]} out of range")
                need = labels[ins[1]]
                if op == "br_if":
                    pop(1 + need)
                    h += need       # height unchanged when not taken
                else:
                    pop(need)
                    if i + 1 != len(code):
                        raise ValueError("dead code after br unsupported")
                    return          # unreachable end: any height is fine
            elif op == "return":
                pop(labels[-1])
                if i + 1 != len(code):
                    raise ValueError("dead code after return unsupported")
                return
            else:
                raise ValueError(f"unknown op {op}")
        if h != arity:
            raise ValueError(
                f"block ends at height {h}, result arity {arity}")

    # ------------------------------------------------------------ execute

    def call(self, export_name: str, *args: int) -> int | None:
        kind, idx = self.exports[export_name]
        if kind != "func":
            raise TypeError(f"{export_name} is a {kind}")
        return self._invoke(idx, [int(a) & MASK32 for a in args])

    def _invoke(self, fidx: int, args: list[int]) -> int | None:
        f = self.funcs[fidx]
        locals_ = args + [0] * f.locals_count
        stack: list[int] = []
        res = self._exec(f.code, locals_, stack)
        if f.n_results:
            if res is _RETURN or res is None:
                return _s32(stack[-1])
            raise RuntimeError("function body ended via stray branch")
        return None

    def _exec(self, code: list, loc: list[int], st: list[int]):
        """Run an instr list. Returns None (fell through), _RETURN, or an
        int branch depth for an enclosing label."""
        for ins in code:
            op = ins[0]
            if op == "i32.const":
                st.append(ins[1] & MASK32)
            elif op == "local.get":
                st.append(loc[ins[1]])
            elif op == "local.set":
                loc[ins[1]] = st.pop()
            elif op == "local.tee":
                loc[ins[1]] = st[-1]
            elif op == "i32.load":
                addr = (st.pop() & MASK32) + ins[1]
                if addr + 4 > len(self.memory):
                    raise IndexError(f"i32.load OOB at {addr}")
                st.append(struct.unpack_from("<I", self.memory, addr)[0])
            elif op == "i32.store":
                val = st.pop()
                addr = (st.pop() & MASK32) + ins[1]
                if addr + 4 > len(self.memory):
                    raise IndexError(f"i32.store OOB at {addr}")
                struct.pack_into("<I", self.memory, addr, val)
            elif op == "call":
                f = self.funcs[ins[1]]
                args = [st.pop() for _ in range(f.n_params)][::-1]
                r = self._invoke(ins[1], args)
                if f.n_results:
                    st.append(r & MASK32)
            elif op == "block":
                h = len(st)
                r = self._exec(ins[2], loc, st)
                if r is _RETURN:
                    return _RETURN
                if isinstance(r, int):
                    if r > 0:
                        return r - 1
                    # branch to this label: keep the top `arity` values
                    if ins[1]:
                        st[h:-ins[1]] = []
                    else:
                        del st[h:]
            elif op == "loop":
                h = len(st)
                while True:
                    r = self._exec(ins[2], loc, st)
                    if r is _RETURN:
                        return _RETURN
                    if r is None:
                        break
                    if r > 0:
                        return r - 1
                    del st[h:]          # loop labels take no values
            elif op == "if":
                cond = st.pop()
                h = len(st)
                body = ins[2] if cond else ins[3]
                r = self._exec(body, loc, st)
                if r is _RETURN:
                    return _RETURN
                if isinstance(r, int):
                    if r > 0:
                        return r - 1
                    if ins[1]:
                        st[h:-ins[1]] = []
                    else:
                        del st[h:]
            elif op == "br":
                return ins[1]
            elif op == "br_if":
                if st.pop():
                    return ins[1]
            elif op == "return":
                return _RETURN
            elif op == "drop":
                st.pop()
            elif op == "eqz":
                st.append(1 if st.pop() == 0 else 0)
            elif op in ("eq", "ne", "lt_s", "lt_u", "gt_s", "gt_u",
                        "le_s", "le_u", "ge_s", "ge_u"):
                b, a = st.pop(), st.pop()
                sa, sb = _s32(a), _s32(b)
                st.append(1 if {
                    "eq": a == b, "ne": a != b,
                    "lt_s": sa < sb, "lt_u": a < b,
                    "gt_s": sa > sb, "gt_u": a > b,
                    "le_s": sa <= sb, "le_u": a <= b,
                    "ge_s": sa >= sb, "ge_u": a >= b,
                }[op] else 0)
            elif op in ("add", "sub", "mul", "and", "or", "xor",
                        "shl", "shr_s", "shr_u", "div_s", "div_u",
                        "rem_s", "rem_u"):
                b, a = st.pop(), st.pop()
                if op == "add":
                    v = a + b
                elif op == "sub":
                    v = a - b
                elif op == "mul":
                    v = a * b
                elif op == "and":
                    v = a & b
                elif op == "or":
                    v = a | b
                elif op == "xor":
                    v = a ^ b
                elif op == "shl":
                    v = a << (b & 31)
                elif op == "shr_u":
                    v = a >> (b & 31)
                elif op == "shr_s":
                    v = _s32(a) >> (b & 31)
                elif op == "div_u":
                    v = a // b
                elif op == "rem_u":
                    v = a % b
                elif op == "div_s":
                    sa, sb = _s32(a), _s32(b)
                    v = abs(sa) // abs(sb)
                    if (sa < 0) != (sb < 0):
                        v = -v
                else:                   # rem_s: sign of dividend
                    sa, sb = _s32(a), _s32(b)
                    v = abs(sa) % abs(sb)
                    if sa < 0:
                        v = -v
                st.append(v & MASK32)
            elif op == "clz":
                v = st.pop()
                st.append(32 if v == 0 else 32 - v.bit_length())
            elif op == "ctz":
                v = st.pop()
                st.append(32 if v == 0 else (v & -v).bit_length() - 1)
            elif op == "popcnt":
                st.append(bin(st.pop()).count("1"))
            else:
                raise RuntimeError(f"unhandled op {op}")
        return None


def load(path: str) -> WasmModule:
    with open(path, "rb") as fh:
        return WasmModule(fh.read())
