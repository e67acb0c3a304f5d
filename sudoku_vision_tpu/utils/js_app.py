"""Execute scanner.js's DOM/async glue — the full shipped app file.

utils/js_subset.py deliberately REJECTS `await`/`new`/`document`/... so
the pure-helper section can never silently grow untestable syntax. This
module is the other half: a superset interpreter that executes the
WHOLE app file (and sudoku.js) against a mock browser
(utils/dom_mock.py), closing the last unexecuted frontend surface the
reference covers with Puppeteer (reference web/test-browser.mjs:42) —
this image has no JS runtime, so the shipped source is executed by
interpretation, not re-implementation.

Added over the pure subset:
  * top-level statements (not just function decls), `let`/`const`
    multi-declarators and declarations without initializers;
  * nested + async function declarations, function expressions, arrow
    functions (incl. `async` arrows and array-destructured params),
    closures with proper lexical scoping and per-iteration `for(let ;;)`
    bindings (so `b.onclick = () => commitEdit(i, d)` in a loop captures
    each d);
  * `await` (synchronous-settlement semantics: awaiting a pending
    promise is an error — the mock browser settles everything
    synchronously, so control flow is exact while tests stay
    deterministic), `new`, `typeof` (safe on unbound names), template
    literals with `${}` interpolation, `try`/`catch`, `throw`,
    `arguments`, `fn.apply`;
  * `Promise`/`Set`/`Array`/`Error` constructors, `JSON.stringify`,
    number `.toFixed`, array `.map`/`.forEach`/`.join`, object-literal
    string keys and shorthand properties;
  * host interop: mock DOM nodes are plain dicts whose members hold
    values or Python callables — property reads/writes and method calls
    flow through the dict, so the harness observes exactly what the
    glue does.

Anything else still raises JSSubsetError — unsupported syntax fails
tests loudly rather than skipping coverage.
"""

from __future__ import annotations

import math
import re
from typing import Any

from sudoku_vision_tpu.utils.js_subset import (
    _TOKEN_RE, _KEYWORDS, JSSubsetError, JSEnv, UNDEFINED, _Break,
    _Continue, _Parser, _Return, _js_string, _truthy,
)

_APP_KEYWORDS = _KEYWORDS | {
    "async", "await", "new", "try", "catch", "typeof", "throw",
}


class _JSThrow(Exception):
    """A JS `throw` (or a mock-raised failure) in flight to a catch."""

    def __init__(self, value):
        self.value = value


class _JSPromise:
    __slots__ = ("state", "value")

    def __init__(self):
        self.state = "pending"
        self.value = UNDEFINED


class _JSSet:
    def __init__(self, items=None):
        self.items = set()
        if items is not None and items is not UNDEFINED:
            for v in items:
                self.items.add(v)

    def add(self, v):
        self.items.add(v)
        return self

    def has(self, v):
        return v in self.items

    def delete(self, v):
        self.items.discard(v)
        return UNDEFINED


def _tokenize_app(src: str) -> list[tuple[str, str]]:
    """Pure-subset tokenizer plus template literals and the app
    keywords; no _REJECTED names (that contract stays with js_subset)."""
    out, pos, n = [], 0, len(src)
    while pos < n:
        if src[pos] == "`":
            depth = 0
            j = pos + 1
            while j < n:
                c = src[j]
                if c == "\\":
                    j += 2
                    continue
                if c == "$" and j + 1 < n and src[j + 1] == "{":
                    depth += 1
                    j += 2
                    continue
                if c == "}" and depth:
                    depth -= 1
                elif c == "`" and depth == 0:
                    break
                j += 1
            if j >= n:
                raise JSSubsetError("unterminated template literal")
            out.append(("tpl", src[pos:j + 1]))
            pos = j + 1
            continue
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise JSSubsetError(f"untokenizable at {src[pos:pos + 30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text in _APP_KEYWORDS:
            kind = text
        out.append((kind, text))
    out.append(("eof", ""))
    return out


class _AppParser(_Parser):
    def parse_program(self) -> list:
        stmts = []
        while self.peek()[0] != "eof":
            stmts.append(self.statement())
        return stmts

    # --- statements ---

    def statement(self):
        kind, val = self.peek()
        if kind == "function" or (kind == "async"
                                  and self.peek(1)[0] == "function"):
            is_async = kind == "async"
            if is_async:
                self.next()
            name, params, body = self.function_decl()
            return ("funcdecl", name, params, body, is_async)
        if kind == "try":
            self.next()
            blk = self.block()
            self.expect("catch")
            param = None
            if self.peek()[1] == "(":
                self.next()
                param = self.next()[1]
                self.expect(")")
            cblk = self.block()
            return ("try", blk, param, cblk)
        if kind == "throw":
            self.next()
            e = self.expression()
            if self.peek()[1] == ";":
                self.next()
            return ("throw", e)
        if kind in ("const", "let", "var"):
            self.next()
            decls = []
            while True:
                name = self.next()[1]
                init = None
                if self.peek()[1] == "=":
                    self.next()
                    init = self.expression()
                decls.append((name, init))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
            return ("decl", decls)
        if kind == "return":
            self.next()
            if self.peek()[1] in (";", "}"):
                if self.peek()[1] == ";":
                    self.next()
                return ("return", ("lit", UNDEFINED))
            e = self.expression()
            if self.peek()[1] == ";":
                self.next()
            return ("return", e)
        return super().statement()

    def function_decl(self):
        self.expect("function")
        name = self.next()[1]
        params = self._params()
        body = self.block()
        return name, params, body

    def _params(self) -> list:
        """Parameter list: names or `[a, b]` array destructures."""
        self.expect("(")
        params = []
        while self.peek()[1] != ")":
            if self.peek()[1] == "[":
                self.next()
                names = []
                while self.peek()[1] != "]":
                    names.append(self.next()[1])
                    if self.peek()[1] == ",":
                        self.next()
                self.expect("]")
                params.append(("pd", names))
            else:
                params.append(("p", self.next()[1]))
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        return params

    # --- expressions ---

    def expression(self):
        if self._arrow_ahead():
            return self._arrow()
        return super().expression()

    def _arrow_ahead(self) -> bool:
        i = self.i
        if self.toks[i][0] == "async":
            i += 1
        if self.toks[i][0] == "name" and self.toks[i + 1][1] == "=>":
            return True
        if self.toks[i][1] != "(":
            return False
        depth = 1
        j = i + 1
        while depth and self.toks[j][0] != "eof":
            t = self.toks[j][1]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            j += 1
        return self.toks[j][1] == "=>"

    def _arrow(self):
        is_async = False
        if self.peek()[0] == "async":
            self.next()
            is_async = True
        if self.peek()[0] == "name":
            params = [("p", self.next()[1])]
        else:
            params = self._params()
        self.expect("=>")
        if self.peek()[1] == "{":
            body = self.block()
        else:
            body = [("return", self.expression())]
        return ("fn", params, body, is_async, True)

    def unary(self):
        kind, val = self.peek()
        if kind == "await":
            self.next()
            return ("await", self.unary())
        if kind == "typeof":
            self.next()
            return ("typeof", self.unary())
        if kind == "new":
            self.next()
            callee = self.primary()
            while self.peek()[1] == ".":
                self.next()
                callee = ("member", callee, self.next()[1])
            args = []
            if self.peek()[1] == "(":
                self.next()
                while self.peek()[1] != ")":
                    args.append(self.expression())
                    if self.peek()[1] == ",":
                        self.next()
                self.expect(")")
            # our constructors are plain host callables: new X() == X()
            return ("call", callee, args)
        return super().unary()

    def primary(self):
        kind, val = self.peek()
        if kind == "tpl":
            self.next()
            return ("tpl", self._tpl_parts(val))
        if kind == "function" or (kind == "async"
                                  and self.peek(1)[0] == "function"):
            is_async = kind == "async"
            if is_async:
                self.next()
            self.expect("function")
            if self.peek()[0] == "name":
                self.next()  # optional fn-expression name (unused)
            params = self._params()
            body = self.block()
            return ("fn", params, body, is_async, False)
        if val == "{":
            self.next()
            pairs = []
            while self.peek()[1] != "}":
                k_kind, k_val = self.next()
                key = k_val[1:-1] if k_kind == "str" else k_val
                if self.peek()[1] == ":":
                    self.next()
                    pairs.append((key, self.expression()))
                else:  # shorthand {name}
                    pairs.append((key, ("name", key)))
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return ("obj", pairs)
        return super().primary()

    def _tpl_parts(self, raw: str) -> list:
        body = raw[1:-1]
        parts, buf, i, n = [], [], 0, len(body)
        while i < n:
            c = body[i]
            if c == "\\" and i + 1 < n:
                buf.append(body[i + 1])
                i += 2
                continue
            if c == "$" and i + 1 < n and body[i + 1] == "{":
                depth = 1
                j = i + 2
                while j < n and depth:
                    if body[j] == "{":
                        depth += 1
                    elif body[j] == "}":
                        depth -= 1
                    j += 1
                if depth:
                    raise JSSubsetError("unterminated ${ in template")
                if buf:
                    parts.append(("s", "".join(buf)))
                    buf = []
                toks = _tokenize_app(body[i + 2:j - 1])
                parts.append(("e", _AppParser(toks).expression()))
                i = j
                continue
            buf.append(c)
            i += 1
        if buf:
            parts.append(("s", "".join(buf)))
        return parts


class _Scope:
    """Lexical environment frame. Supports the dict-protocol reads the
    base evaluator uses, while declaration vs assignment stay distinct
    (declare binds here; assign walks the chain)."""

    __slots__ = ("vars", "parent")

    def __init__(self, parent: "_Scope | None" = None):
        self.vars: dict[str, Any] = {}
        self.parent = parent

    def frame_of(self, name: str):
        s = self
        while s is not None:
            if name in s.vars:
                return s
            s = s.parent
        return None

    def __contains__(self, name: str) -> bool:
        return self.frame_of(name) is not None

    def __getitem__(self, name: str):
        f = self.frame_of(name)
        if f is None:
            raise KeyError(name)
        return f.vars[name]

    def assign(self, name: str, value) -> None:
        f = self.frame_of(name)
        if f is None:
            raise JSSubsetError(f"assignment to undeclared {name!r}")
        f.vars[name] = value


class _AppFn:
    __slots__ = ("params", "body", "scope", "env", "is_async", "is_arrow")

    def __init__(self, params, body, scope, env, is_async, is_arrow):
        self.params, self.body = params, body
        self.scope, self.env = scope, env
        self.is_async, self.is_arrow = is_async, is_arrow

    def __call__(self, *args):
        s = _Scope(self.scope)
        for i, p in enumerate(self.params):
            v = args[i] if i < len(args) else UNDEFINED
            if p[0] == "p":
                s.vars[p[1]] = v
            else:  # array destructure
                for k, nm in enumerate(p[1]):
                    s.vars[nm] = (v[k] if isinstance(v, list)
                                  and k < len(v) else UNDEFINED)
        if not self.is_arrow:
            s.vars["arguments"] = list(args)
        try:
            for st in self.env.compile_block(self.body):
                st(s)
        except _Return as r:
            return r.value
        return UNDEFINED


def _js_typeof(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "object"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if callable(v):
        return "function"
    return "object"


def _js_tofixed(v: float, nd: int) -> str:
    q = 10 ** nd
    r = math.floor(abs(v) * q + 0.5) / q  # JS: half away from zero
    if v < 0:
        r = -r
    return f"{r:.{nd}f}"


def js_json_stringify(v) -> str:
    import json as _json

    def conv(x):
        if x is UNDEFINED:
            return None
        if isinstance(x, dict):
            return {k: conv(val) for k, val in x.items()
                    if val is not UNDEFINED and not callable(val)}
        if isinstance(x, list):
            return [conv(e) for e in x]
        if isinstance(x, float) and x.is_integer():
            return int(x)
        return x

    return _json.dumps(conv(v), separators=(",", ":"))


def promise_ctor(executor):
    p = _JSPromise()

    def resolve(v=UNDEFINED):
        if p.state == "pending":
            p.state, p.value = "fulfilled", v
        return UNDEFINED

    def reject(v=UNDEFINED):
        if p.state == "pending":
            p.state, p.value = "rejected", v
        return UNDEFINED

    try:
        executor(resolve, reject)
    except _JSThrow as e:
        reject(e.value)
    return p


def _set_ctor(items=UNDEFINED):
    return _JSSet(None if items is UNDEFINED else items)


def _array_ctor(n=UNDEFINED):
    if n is UNDEFINED:
        return []
    return [UNDEFINED] * int(n)


def _error_ctor(message=UNDEFINED):
    return {"name": "Error", "message": message}


class JSAppEnv(JSEnv):
    """Interpreter for the app-glue superset with a persistent global
    scope. `host_globals` injects the mock browser (document, window,
    fetch, ...)."""

    def __init__(self, source: str = "", host_globals: dict | None = None):
        self.functions = {}  # base-class slot; all lookups go via root
        self.root = _Scope()
        self.root.vars.update({
            "Promise": promise_ctor,
            "Set": _set_ctor,
            "Array": _array_ctor,
            "Error": _error_ctor,
            "JSON": {"stringify": js_json_stringify},
            "NaN": float("nan"),
        })
        if host_globals:
            self.root.vars.update(host_globals)
        if source:
            self.exec_source(source)

    def exec_source(self, source: str) -> None:
        """Execute a program (top-level statements) in the global scope."""
        for stmt in _AppParser(_tokenize_app(source)).parse_program():
            self._exec(stmt, self.root)

    def define(self, name: str, value) -> None:
        self.root.vars[name] = value

    def get(self, name: str):
        return self.root[name]

    def call(self, name: str, *args):
        return self.root[name](*args)

    # --- evaluator extensions ---

    def _exec(self, stmt, scope):
        op = stmt[0]
        if op == "decl":
            for name, init in stmt[1]:
                scope.vars[name] = (UNDEFINED if init is None
                                    else self._eval(init, scope))
            return
        if op == "funcdecl":
            _, name, params, body, is_async = stmt
            scope.vars[name] = _AppFn(params, body, scope, self,
                                      is_async, False)
            return
        if op == "try":
            _, blk, param, cblk = stmt
            try:
                for s in blk:
                    self._exec(s, scope)
            except _JSThrow as e:
                cs = _Scope(scope)
                if param:
                    cs.vars[param] = e.value
                for s in cblk:
                    self._exec(s, cs)
            return
        if op == "throw":
            raise _JSThrow(self._eval(stmt[1], scope))
        if op == "assign":
            self._exec_assign(stmt, scope)
            return
        if op == "for":
            # Per-iteration bindings for `for (let i = ...)`: closures
            # created in the body capture THIS iteration's value (the
            # editor keypad builds 10 `() => commitEdit(i, d)` handlers
            # in one loop — with a shared frame they would all see the
            # final d).
            _, init, cond, update, body = stmt
            fscope = _Scope(scope)
            if init is not None:
                self._exec(init, fscope)
            loop_vars = list(fscope.vars.keys())
            while cond is None or _truthy(self._eval(cond, fscope)):
                iscope = _Scope(scope)
                for k in loop_vars:
                    iscope.vars[k] = fscope.vars[k]
                try:
                    for s in body:
                        self._exec(s, iscope)
                except _Break:
                    break
                except _Continue:
                    pass
                for k in loop_vars:
                    fscope.vars[k] = iscope.vars[k]
                if update is not None:
                    self._exec(update, fscope)
            return
        super()._exec(stmt, scope)

    def _exec_assign(self, stmt, scope):
        _, target, aop, value_node = stmt
        val = self._eval(value_node, scope)
        if aop != "=":
            cur = self._eval(target, scope)
            if aop == "+=":
                val = (_js_string(cur) + _js_string(val)
                       if isinstance(cur, str) or isinstance(val, str)
                       else cur + val)
            elif aop == "-=":
                val = cur - val
            elif aop == "*=":
                val = cur * val
            elif aop == "/=":
                val = cur / val
            else:
                val = self._js_mod(cur, val)
        if target[0] == "name":
            scope.assign(target[1], val)
        elif target[0] == "index":
            base = self._eval(target[1], scope)
            idx = self._eval(target[2], scope)
            if isinstance(base, list):
                i = int(idx)
                if not 0 <= i < len(base):
                    raise JSSubsetError(
                        f"index {i} out of bounds (len {len(base)})")
                base[i] = val
            elif isinstance(base, dict):
                base[idx] = val
            else:
                raise JSSubsetError(
                    f"cannot index-assign {type(base).__name__}")
        else:  # member
            base = self._eval(target[1], scope)
            if isinstance(base, dict):
                base[target[2]] = val
            else:
                raise JSSubsetError(
                    f"cannot set member on {type(base).__name__}")

    # --- compiler overrides (paired with the _exec/_eval overrides
    # below, per the js_subset compiled-evaluator contract) ---

    def _cs_decl(self, stmt):
        pairs = [(name, self._compile_expr(init) if init is not None
                  else None) for name, init in stmt[1]]

        def run(scope):
            for name, init in pairs:
                scope.vars[name] = (UNDEFINED if init is None
                                    else init(scope))
        return run

    def _cs_funcdecl(self, stmt):
        _, name, params, body, is_async = stmt

        def run(scope):
            scope.vars[name] = _AppFn(params, body, scope, self,
                                      is_async, False)
        return run

    def _cs_try(self, stmt):
        _, blk, param, cblk = stmt
        c_blk = self.compile_block(blk)
        c_cblk = self.compile_block(cblk)

        def run(scope):
            try:
                for s in c_blk:
                    s(scope)
            except _JSThrow as e:
                cs = _Scope(scope)
                if param:
                    cs.vars[param] = e.value
                for s in c_cblk:
                    s(cs)
        return run

    def _cs_throw(self, stmt):
        e = self._compile_expr(stmt[1])

        def run(scope):
            raise _JSThrow(e(scope))
        return run

    def _cs_assign(self, stmt):
        _, target, aop, value_node = stmt
        val = self._compile_augmented(target, aop, value_node)
        if target[0] == "name":
            name = target[1]

            def run(scope):
                scope.assign(name, val(scope))
            return run
        if target[0] == "index":
            base_e = self._compile_expr(target[1])
            idx_e = self._compile_expr(target[2])

            def run(scope):
                base, idx = base_e(scope), idx_e(scope)
                v = val(scope)
                if isinstance(base, list):
                    i = int(idx)
                    if not 0 <= i < len(base):
                        raise JSSubsetError(
                            f"index {i} out of bounds (len {len(base)})")
                    base[i] = v
                elif isinstance(base, dict):
                    base[idx] = v
                else:
                    raise JSSubsetError(
                        f"cannot index-assign {type(base).__name__}")
            return run
        base_e = self._compile_expr(target[1])
        name = target[2]

        def run(scope):
            base = base_e(scope)
            if isinstance(base, dict):
                base[name] = val(scope)
            else:
                raise JSSubsetError(
                    f"cannot set member on {type(base).__name__}")
        return run

    def _cs_for(self, stmt):
        # Per-iteration bindings (see the dynamic _exec's comment).
        _, init, cond, update, body = stmt
        c_init = self._compile_stmt(init) if init is not None else None
        c_cond = self._compile_expr(cond) if cond is not None else None
        c_upd = self._compile_stmt(update) if update is not None else None
        c_body = self.compile_block(body)

        def run(scope):
            fscope = _Scope(scope)
            if c_init is not None:
                c_init(fscope)
            loop_vars = list(fscope.vars.keys())
            while c_cond is None or _truthy(c_cond(fscope)):
                iscope = _Scope(scope)
                for k in loop_vars:
                    iscope.vars[k] = fscope.vars[k]
                try:
                    for s in c_body:
                        s(iscope)
                except _Break:
                    break
                except _Continue:
                    pass
                for k in loop_vars:
                    fscope.vars[k] = iscope.vars[k]
                if c_upd is not None:
                    c_upd(fscope)
        return run

    def _cx_fn(self, node):
        _, params, body, is_async, is_arrow = node
        return lambda scope: _AppFn(params, body, scope, self,
                                    is_async, is_arrow)

    def _cx_await(self, node):
        e = self._compile_expr(node[1])

        def run(scope):
            v = e(scope)
            if isinstance(v, _JSPromise):
                if v.state == "fulfilled":
                    return v.value
                if v.state == "rejected":
                    raise _JSThrow(v.value)
                raise JSSubsetError(
                    "await on a pending promise — mock browser callbacks "
                    "must settle synchronously")
            return v
        return run

    def _cx_typeof(self, node):
        return lambda scope, _n=node: self._eval(_n, scope)

    def _cx_tpl(self, node):
        parts = [(kind, v if kind == "s" else self._compile_expr(v))
                 for kind, v in node[1]]

        def run(scope):
            return "".join(v if kind == "s" else _js_string(v(scope))
                           for kind, v in parts)
        return run

    def _cx_cmp(self, node):
        o = node[1]
        ae = self._compile_expr(node[2])
        be = self._compile_expr(node[3])

        def run(scope):
            a, b = ae(scope), be(scope)
            if a is UNDEFINED or b is UNDEFINED:
                return False
            a = 0 if a is None else a
            b = 0 if b is None else b
            return {"<": a < b, ">": a > b,
                    "<=": a <= b, ">=": a >= b}[o]
        return run

    def _eval(self, node, scope):
        op = node[0]
        if op == "fn":
            _, params, body, is_async, is_arrow = node
            return _AppFn(params, body, scope, self, is_async, is_arrow)
        if op == "await":
            v = self._eval(node[1], scope)
            if isinstance(v, _JSPromise):
                if v.state == "fulfilled":
                    return v.value
                if v.state == "rejected":
                    raise _JSThrow(v.value)
                raise JSSubsetError(
                    "await on a pending promise — mock browser callbacks "
                    "must settle synchronously")
            return v
        if op == "typeof":
            t = node[1]
            if t[0] == "name" and isinstance(scope, _Scope) \
                    and t[1] not in scope \
                    and t[1] not in ("String", "Number", "Math", "Date", "Infinity"):
                return "undefined"
            return _js_typeof(self._eval(t, scope))
        if op == "tpl":
            out = []
            for kind, v in node[1]:
                out.append(v if kind == "s"
                           else _js_string(self._eval(v, scope)))
            return "".join(out)
        if op == "cmp":
            # JS relational semantics the glue relies on: any comparison
            # with undefined is false (NaN), null coerces to 0
            # (`data.n_coalesced > 1` on a response without the field).
            a = self._eval(node[2], scope)
            b = self._eval(node[3], scope)
            if a is UNDEFINED or b is UNDEFINED:
                return False
            a = 0 if a is None else a
            b = 0 if b is None else b
            return {"<": a < b, ">": a > b,
                    "<=": a <= b, ">=": a >= b}[node[1]]
        return super()._eval(node, scope)

    def _member(self, base, name: str):
        if isinstance(base, (int, float)) and not isinstance(base, bool):
            if name == "toFixed":
                return lambda nd=0: _js_tofixed(base, int(nd))
        if isinstance(base, _JSSet):
            if name == "add":
                return base.add
            if name == "has":
                return base.has
            if name == "delete":
                return base.delete
            if name == "size":
                return len(base.items)
            raise JSSubsetError(f"unsupported Set member {name!r}")
        if isinstance(base, list):
            if name == "map":
                return lambda fn: [fn(v, i) for i, v in enumerate(base)]
            if name == "forEach":
                def _fe(fn):
                    for i, v in enumerate(base):
                        fn(v, i)
                    return UNDEFINED
                return _fe
            if name == "join":
                return lambda sep=",": _js_string(sep).join(
                    _js_string(v) for v in base)
        if callable(base) and not isinstance(base, type) and name == "apply":
            return lambda thisv, args_list=UNDEFINED: base(
                *([] if args_list is UNDEFINED or args_list is None
                  else list(args_list)))
        return JSEnv._member(base, name)


def load_app(path: str, host_globals: dict) -> JSAppEnv:
    """Execute a full frontend app file against a mock browser."""
    with open(path) as f:
        return JSAppEnv(f.read(), host_globals)
