"""Execute the pure-helper subset of JavaScript shipped in scanner.js.

The reference proves its web frontend by driving a real browser
(reference web/test-browser.mjs:42 — Puppeteer). This image has no JS
runtime at all (no node/deno/quickjs, verified), so the frontend's pure
logic is covered the honest remaining way: a small interpreter for the
JS subset the helpers are written in, executing the ACTUAL SHIPPED
SOURCE — not a Python re-implementation that could drift.

Supported subset (everything the scanner.js pure-helper section uses):
  * function declarations, `return`, `if`/`else`, `const`/`let`;
  * ternary, `||`, `&&`, `===`, `!==`, `<`, `>`, `<=`, `>=`, `+`, `-`,
    unary `!`/`-`, parentheses;
  * string/number/boolean/`null` literals, object literals;
  * member access (`a.b`), calls, `String(x)`, `Number(x)`,
    `s.slice(a, b)`, `s.length`.

Anything outside the subset raises JSSubsetError — if a helper is
edited into unsupported syntax the test fails loudly instead of
silently skipping, which is the contract: the pure-helper section of
scanner.js must stay inside this executable subset.

JS semantics preserved where they differ from Python: `||`/`&&` return
operands (not booleans), `===` is strict (no cross-type coercion),
`undefined` is a distinct falsy value, property access on a missing key
yields `undefined`, and number formatting follows JS `String(n)` for
integers.
"""

from __future__ import annotations

import re
from typing import Any


class JSSubsetError(Exception):
    """Source uses syntax outside the executable subset."""


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __bool__(self):
        return False

    def __repr__(self):
        return "undefined"


UNDEFINED = _Undefined()

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<tpl>`(?:[^`\\$]|\\.)*`)
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<punct>===|!==|<=|>=|&&|\|\||=>|[-+*/%(){}\[\],;:.?<>=!])
""", re.VERBOSE)

_KEYWORDS = {"function", "return", "if", "else", "const", "let", "var",
             "null", "true", "false", "undefined"}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise JSSubsetError(f"untokenizable at {src[pos:pos + 30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        if kind == "tpl":
            raise JSSubsetError("template literals are outside the subset")
        text = m.group()
        if kind == "name" and text in _KEYWORDS:
            kind = text
        out.append((kind, text))
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive-descent parser producing tuple ASTs."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, k: int = 0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str):
        kind, val = self.next()
        if val != text and kind != text:
            raise JSSubsetError(f"expected {text!r}, got {val!r}")
        return val

    # --- statements ---

    def parse_functions(self) -> dict[str, tuple]:
        fns = {}
        while self.peek()[0] != "eof":
            if self.peek()[0] != "function":
                raise JSSubsetError(
                    f"top level must be function decls, got {self.peek()!r}")
            name, params, body = self.function_decl()
            fns[name] = (params, body)
        return fns

    def function_decl(self):
        self.expect("function")
        name = self.next()[1]
        self.expect("(")
        params = []
        while self.peek()[1] != ")":
            params.append(self.next()[1])
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        body = self.block()
        return name, params, body

    def block(self) -> list:
        self.expect("{")
        stmts = []
        while self.peek()[1] != "}":
            stmts.append(self.statement())
        self.expect("}")
        return stmts

    def statement(self):
        kind, val = self.peek()
        if kind == "return":
            self.next()
            expr = self.expression()
            if self.peek()[1] == ";":
                self.next()
            return ("return", expr)
        if kind == "if":
            self.next()
            self.expect("(")
            cond = self.expression()
            self.expect(")")
            then = (self.block() if self.peek()[1] == "{"
                    else [self.statement()])
            other = []
            if self.peek()[0] == "else":
                self.next()
                other = (self.block() if self.peek()[1] == "{"
                         else [self.statement()])
            return ("if", cond, then, other)
        if kind in ("const", "let", "var"):
            self.next()
            name = self.next()[1]
            self.expect("=")
            expr = self.expression()
            if self.peek()[1] == ";":
                self.next()
            return ("decl", name, expr)
        raise JSSubsetError(f"unsupported statement at {val!r}")

    # --- expressions (precedence climbing) ---

    def expression(self):
        return self.ternary()

    def ternary(self):
        cond = self.logic_or()
        if self.peek()[1] == "?":
            self.next()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return ("ternary", cond, a, b)
        return cond

    def logic_or(self):
        left = self.logic_and()
        while self.peek()[1] == "||":
            self.next()
            left = ("or", left, self.logic_and())
        return left

    def logic_and(self):
        left = self.equality()
        while self.peek()[1] == "&&":
            self.next()
            left = ("and", left, self.equality())
        return left

    def equality(self):
        left = self.relational()
        while self.peek()[1] in ("===", "!=="):
            op = self.next()[1]
            left = ("eq" if op == "===" else "ne", left, self.relational())
        return left

    def relational(self):
        left = self.additive()
        while self.peek()[1] in ("<", ">", "<=", ">="):
            op = self.next()[1]
            left = ("cmp", op, left, self.additive())
        return left

    def additive(self):
        left = self.unary()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = ("add" if op == "+" else "sub", left, self.unary())
        return left

    def unary(self):
        if self.peek()[1] == "!":
            self.next()
            return ("not", self.unary())
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.unary())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            if self.peek()[1] == ".":
                self.next()
                node = ("member", node, self.next()[1])
            elif self.peek()[1] == "(":
                self.next()
                args = []
                while self.peek()[1] != ")":
                    args.append(self.expression())
                    if self.peek()[1] == ",":
                        self.next()
                self.expect(")")
                node = ("call", node, args)
            elif self.peek()[1] == "[":
                self.next()
                idx = self.expression()
                self.expect("]")
                node = ("index", node, idx)
            else:
                return node

    def primary(self):
        kind, val = self.next()
        if kind == "num":
            return ("lit", float(val) if "." in val else int(val))
        if kind == "str":
            body = val[1:-1]
            return ("lit", re.sub(r"\\(.)", r"\1", body))
        if kind == "null":
            return ("lit", None)
        if kind == "undefined":
            return ("lit", UNDEFINED)
        if kind == "true":
            return ("lit", True)
        if kind == "false":
            return ("lit", False)
        if val == "(":
            e = self.expression()
            self.expect(")")
            return e
        if val == "{":
            pairs = []
            while self.peek()[1] != "}":
                key = self.next()[1]
                self.expect(":")
                pairs.append((key, self.expression()))
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return ("obj", pairs)
        if kind == "name":
            return ("name", val)
        raise JSSubsetError(f"unsupported primary {val!r}")


def _js_string(v: Any) -> str:
    """JS String(v) for subset values."""
    if v is None:
        return "null"
    if v is UNDEFINED:
        return "undefined"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _truthy(v: Any) -> bool:
    if v is UNDEFINED or v is None:
        return False
    if isinstance(v, float) and v != v:  # NaN
        return False
    return bool(v)


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Fn:
    def __init__(self, params, body, env: "JSEnv"):
        self.params, self.body, self.env = params, body, env

    def __call__(self, *args):
        scope = dict(zip(self.params,
                         list(args) + [UNDEFINED] * len(self.params)))
        try:
            for stmt in self.body:
                self.env._exec(stmt, scope)
        except _Return as r:
            return r.value
        return UNDEFINED


class JSEnv:
    """Loads top-level function declarations from JS source and makes
    them callable from Python. `extract_pure_helpers` pulls the helper
    section out of a full app file."""

    def __init__(self, source: str):
        self.functions: dict[str, _Fn] = {}
        fns = _Parser(_tokenize(source)).parse_functions()
        for name, (params, body) in fns.items():
            self.functions[name] = _Fn(params, body, self)

    def call(self, name: str, *args):
        return self.functions[name](*args)

    # --- evaluator ---

    def _exec(self, stmt, scope: dict):
        op = stmt[0]
        if op == "return":
            raise _Return(self._eval(stmt[1], scope))
        if op == "decl":
            scope[stmt[1]] = self._eval(stmt[2], scope)
            return
        if op == "if":
            branch = stmt[2] if _truthy(self._eval(stmt[1], scope)) \
                else stmt[3]
            for s in branch:
                self._exec(s, scope)
            return
        raise JSSubsetError(f"unsupported statement op {op!r}")

    def _eval(self, node, scope: dict):
        op = node[0]
        if op == "lit":
            return node[1]
        if op == "name":
            if node[1] in scope:
                return scope[node[1]]
            if node[1] in self.functions:
                return self.functions[node[1]]
            if node[1] == "String":
                return _js_string
            if node[1] == "Number":
                return lambda v: float(v) if not isinstance(v, (int, float)) \
                    else v
            raise JSSubsetError(f"unbound name {node[1]!r}")
        if op == "ternary":
            return self._eval(node[2] if _truthy(self._eval(node[1], scope))
                              else node[3], scope)
        if op == "or":
            left = self._eval(node[1], scope)
            return left if _truthy(left) else self._eval(node[2], scope)
        if op == "and":
            left = self._eval(node[1], scope)
            return self._eval(node[2], scope) if _truthy(left) else left
        if op in ("eq", "ne"):
            a = self._eval(node[1], scope)
            b = self._eval(node[2], scope)
            same = self._strict_eq(a, b)
            return same if op == "eq" else not same
        if op == "cmp":
            a = self._eval(node[2], scope)
            b = self._eval(node[3], scope)
            return {"<": a < b, ">": a > b,
                    "<=": a <= b, ">=": a >= b}[node[1]]
        if op == "add":
            a = self._eval(node[1], scope)
            b = self._eval(node[2], scope)
            if isinstance(a, str) or isinstance(b, str):
                return _js_string(a) + _js_string(b)
            return a + b
        if op == "sub":
            return self._eval(node[1], scope) - self._eval(node[2], scope)
        if op == "not":
            return not _truthy(self._eval(node[1], scope))
        if op == "neg":
            return -self._eval(node[1], scope)
        if op == "obj":
            return {k: self._eval(v, scope) for k, v in node[1]}
        if op == "member":
            base = self._eval(node[1], scope)
            return self._member(base, node[2])
        if op == "index":
            base = self._eval(node[1], scope)
            idx = self._eval(node[2], scope)
            if isinstance(base, str):
                i = int(idx)
                return base[i] if 0 <= i < len(base) else UNDEFINED
            if isinstance(base, dict):
                return base.get(idx, UNDEFINED)
            if isinstance(base, list):
                i = int(idx)
                return base[i] if 0 <= i < len(base) else UNDEFINED
            raise JSSubsetError(f"cannot index {type(base).__name__}")
        if op == "call":
            fn = self._eval(node[1], scope)
            args = [self._eval(a, scope) for a in node[2]]
            return fn(*args)
        raise JSSubsetError(f"unsupported expression op {op!r}")

    @staticmethod
    def _strict_eq(a, b) -> bool:
        if (a is UNDEFINED) != (b is UNDEFINED):
            return False
        if (a is None) != (b is None):
            return False
        if isinstance(a, str) != isinstance(b, str):
            return False
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        return a == b

    @staticmethod
    def _member(base, name: str):
        if isinstance(base, str):
            if name == "length":
                return len(base)
            if name == "slice":
                def _slice(start=0, end=None):
                    n = len(base)
                    s = int(start)
                    e = n if end is None or end is UNDEFINED else int(end)
                    if s < 0:
                        s = max(0, n + s)
                    if e < 0:
                        e = max(0, n + e)
                    return base[s:e]
                return _slice
            raise JSSubsetError(f"unsupported string member {name!r}")
        if isinstance(base, dict):
            return base.get(name, UNDEFINED)
        if isinstance(base, list) and name == "length":
            return len(base)
        raise JSSubsetError(
            f"unsupported member {name!r} on {type(base).__name__}")


def extract_pure_helpers(source: str,
                         end_marker: str = "// ---------- local") -> str:
    """Slice the pure-helper section out of a frontend app file: from
    the first `function` declaration to `end_marker` (the section where
    DOM/async code begins)."""
    start = source.find("function ")
    end = source.find(end_marker)
    if start < 0 or end < 0 or end <= start:
        raise JSSubsetError("helper section markers not found")
    return source[start:end]


def load_scanner_helpers(path: str) -> JSEnv:
    with open(path) as f:
        return JSEnv(extract_pure_helpers(f.read()))
