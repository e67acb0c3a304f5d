"""Execute the pure-helper subset of JavaScript shipped in scanner.js.

The reference proves its web frontend by driving a real browser
(reference web/test-browser.mjs:42 — Puppeteer). This image has no JS
runtime at all (no node/deno/quickjs, verified), so the frontend's pure
logic is covered the honest remaining way: a small interpreter for the
JS subset the helpers are written in, executing the ACTUAL SHIPPED
SOURCE — not a Python re-implementation that could drift.

Supported subset (everything the scanner.js pure-helper section uses):
  * function declarations, `return`, `if`/`else`, `const`/`let`,
    `for (;;)`, `while`, `break`, `continue`, expression statements,
    assignment incl. compound (`=`, `+=`, `-=`, `*=`, `/=`, `%=`) and
    postfix `++`/`--` to names, `a[i]`, and `a.b` targets;
  * ternary, `||`, `&&`, `===`, `!==`, `<`, `>`, `<=`, `>=`, `+`, `-`,
    `*`, `/`, `%`, bitwise `|`, `&`, `^`, `<<`, `>>` (JS int32
    semantics), unary `!`/`-`, parentheses;
  * string/number/boolean/`null` literals, object and array literals;
  * member access (`a.b`), calls, `String(x)`, `Number(x)`,
    `s.slice(a, b)`, `.length`, `arr.push(x)`, and the `Math` object
    (floor/round/ceil/trunc/abs/min/max/sqrt/exp/log/pow/hypot/sign).

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
    (?P<ws>\s+|//[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<tpl>`(?:[^`\\$]|\\.)*`)
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<punct>===|!==|<=|>=|&&|\|\||=>|\+\+|--|\+=|-=|\*=|/=|%=
              |<<|>>>|>>|[-+*/%(){}\[\],;:.?<>=!&|^~])
""", re.VERBOSE)

_KEYWORDS = {"function", "return", "if", "else", "const", "let", "var",
             "null", "true", "false", "undefined", "for", "while",
             "break", "continue"}

# Names that signal DOM/async glue leaked into the pure section — reject
# at load so coverage is never silently lost.
_REJECTED = {"await", "async", "new", "class", "this", "document",
             "window", "fetch"}


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
        if kind == "name" and text in _REJECTED:
            raise JSSubsetError(
                f"{text!r} is outside the pure subset (DOM/async glue)")
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
        if kind == "while":
            self.next()
            self.expect("(")
            cond = self.expression()
            self.expect(")")
            body = (self.block() if self.peek()[1] == "{"
                    else [self.statement()])
            return ("while", cond, body)
        if kind == "for":
            self.next()
            self.expect("(")
            init = None
            if self.peek()[1] != ";":
                init = self.statement()     # decl or simple statement
                if init[0] not in ("decl", "assign", "exprstmt"):
                    raise JSSubsetError("unsupported for-init")
            else:
                self.next()
            cond = None
            if self.peek()[1] != ";":
                cond = self.expression()
            self.expect(";")
            update = None
            if self.peek()[1] != ")":
                update = self.simple_statement(consume_semi=False)
            self.expect(")")
            body = (self.block() if self.peek()[1] == "{"
                    else [self.statement()])
            return ("for", init, cond, update, body)
        if kind == "break":
            self.next()
            if self.peek()[1] == ";":
                self.next()
            return ("break",)
        if kind == "continue":
            self.next()
            if self.peek()[1] == ";":
                self.next()
            return ("continue",)
        return self.simple_statement()

    _ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%="}

    def simple_statement(self, consume_semi: bool = True):
        """Assignment, `x++`/`x--`, or a bare expression statement."""
        target = self.expression()
        nxt = self.peek()[1]
        if nxt in self._ASSIGN_OPS:
            self.next()
            if target[0] not in ("name", "index", "member"):
                raise JSSubsetError("invalid assignment target")
            value = self.expression()
            node = ("assign", target, nxt, value)
        elif nxt in ("++", "--"):
            self.next()
            if target[0] not in ("name", "index", "member"):
                raise JSSubsetError("invalid ++/-- target")
            node = ("assign", target, "+=" if nxt == "++" else "-=",
                    ("lit", 1))
        else:
            node = ("exprstmt", target)
        if consume_semi and self.peek()[1] == ";":
            self.next()
        return node

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
        left = self.bit_or()
        while self.peek()[1] == "&&":
            self.next()
            left = ("and", left, self.bit_or())
        return left

    def bit_or(self):
        left = self.bit_xor()
        while self.peek()[1] == "|":
            self.next()
            left = ("bit", "|", left, self.bit_xor())
        return left

    def bit_xor(self):
        left = self.bit_and()
        while self.peek()[1] == "^":
            self.next()
            left = ("bit", "^", left, self.bit_and())
        return left

    def bit_and(self):
        left = self.equality()
        while self.peek()[1] == "&":
            self.next()
            left = ("bit", "&", left, self.equality())
        return left

    def equality(self):
        left = self.relational()
        while self.peek()[1] in ("===", "!=="):
            op = self.next()[1]
            left = ("eq" if op == "===" else "ne", left, self.relational())
        return left

    def relational(self):
        left = self.shift()
        while self.peek()[1] in ("<", ">", "<=", ">="):
            op = self.next()[1]
            left = ("cmp", op, left, self.shift())
        return left

    def shift(self):
        left = self.additive()
        while self.peek()[1] in ("<<", ">>", ">>>"):
            op = self.next()[1]
            left = ("bit", op, left, self.additive())
        return left

    def additive(self):
        left = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = ("add" if op == "+" else "sub", left,
                    self.multiplicative())
        return left

    def multiplicative(self):
        left = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            left = ("mul", op, left, self.unary())
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
        if val == "[":
            items = []
            while self.peek()[1] != "]":
                items.append(self.expression())
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            return ("arr", items)
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


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


def _toint32(v) -> int:
    i = int(v) & 0xFFFFFFFF
    return i - 0x100000000 if i & 0x80000000 else i


class _JSMath:
    """The Math global (the members scanner.js helpers use)."""

    floor = staticmethod(lambda x: float(int(x // 1)))
    ceil = staticmethod(lambda x: float(-int((-x) // 1)))
    # JS rounds half toward +Infinity: floor(x + 0.5)
    round = staticmethod(lambda x: float((x + 0.5) // 1))
    trunc = staticmethod(lambda x: float(int(x)))
    abs = staticmethod(lambda x: abs(x))
    sqrt = staticmethod(lambda x: x ** 0.5)
    exp = staticmethod(lambda x: __import__("math").exp(x))
    log = staticmethod(lambda x: __import__("math").log(x))
    pow = staticmethod(lambda a, b: a ** b)
    hypot = staticmethod(lambda a, b: (a * a + b * b) ** 0.5)
    sign = staticmethod(lambda x: (x > 0) - (x < 0))
    min = staticmethod(lambda *a: min(a))
    max = staticmethod(lambda *a: max(a))
    random = staticmethod(lambda: __import__("random").random())


class _JSDate:
    """The Date global (only the static scanner.js uses: Date.now)."""

    now = staticmethod(lambda: float(
        int(__import__("time").time() * 1000)))


_RADIX_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _js_number_to_string(x: float, radix: int = 10) -> str:
    """Number.prototype.toString(radix) for the session-id path:
    integer part in the given base plus up to 12 fractional digits
    (JS emits ~10-16; callers slice, so the exact tail length is
    immaterial)."""
    radix = int(radix)
    if radix == 10:
        return _js_string(x)
    neg = x < 0
    x = abs(float(x))
    ip = int(x)
    frac = x - ip
    digits = []
    while True:
        digits.append(_RADIX_DIGITS[ip % radix])
        ip //= radix
        if ip == 0:
            break
    out = ("-" if neg else "") + "".join(reversed(digits))
    if frac > 0:
        fd = []
        for _ in range(12):
            frac *= radix
            d = int(frac)
            fd.append(_RADIX_DIGITS[d])
            frac -= d
            if frac <= 0:
                break
        out += "." + "".join(fd)
    return out


def _num_ctor(v):
    """JS Number(v) for subset values."""
    return float(v) if not isinstance(v, (int, float)) else v


class _Fn:
    __slots__ = ("params", "body", "env", "_compiled")

    def __init__(self, params, body, env: "JSEnv"):
        self.params, self.body, self.env = params, body, env
        self._compiled = None

    def __call__(self, *args):
        compiled = self._compiled
        if compiled is None:
            compiled = self._compiled = self.env.compile_block(self.body)
        scope = dict(zip(self.params,
                         list(args) + [UNDEFINED] * len(self.params)))
        try:
            for run in compiled:
                run(scope)
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

    # --- closure compiler ---
    #
    # Tree-walking cost ~185M Python-level _eval visits for ONE 256x256
    # offline scan (cProfile: 97 s of pure tuple dispatch, round-5
    # suite-time work). Each AST node is therefore compiled ONCE into a
    # Python closure; closures call their pre-compiled children
    # directly, removing the per-visit op-string dispatch. Contract for
    # subclasses: an override of an op's `_exec`/`_eval` semantics MUST
    # be paired with the matching `_cs_<op>`/`_cx_<op>` compiler
    # override (JSAppEnv does this for every op it changes); ops with
    # no compiler fall back to the dynamic evaluator, which preserves
    # subclass semantics for NEW ops automatically.

    def compile_block(self, body):
        cache = getattr(self, "_ccache", None)
        if cache is None:
            cache = self._ccache = {}
        hit = cache.get(id(body))
        if hit is not None:
            return hit[1]
        compiled = [self._compile_stmt(s) for s in body]
        # key by identity; keep `body` referenced so ids stay unique
        cache[id(body)] = (body, compiled)
        return compiled

    def _compile_stmt(self, stmt):
        m = getattr(self, "_cs_" + stmt[0], None)
        if m is not None:
            return m(stmt)
        return lambda scope, _s=stmt: self._exec(_s, scope)

    def _compile_expr(self, node):
        m = getattr(self, "_cx_" + node[0], None)
        if m is not None:
            return m(node)
        return lambda scope, _n=node: self._eval(_n, scope)

    # statement compilers (semantics identical to _exec below)

    def _cs_return(self, stmt):
        e = self._compile_expr(stmt[1])

        def run(scope):
            raise _Return(e(scope))
        return run

    def _cs_decl(self, stmt):
        name, e = stmt[1], self._compile_expr(stmt[2])

        def run(scope):
            scope[name] = e(scope)
        return run

    def _cs_if(self, stmt):
        cond = self._compile_expr(stmt[1])
        then = self.compile_block(stmt[2])
        other = self.compile_block(stmt[3])

        def run(scope):
            for s in (then if _truthy(cond(scope)) else other):
                s(scope)
        return run

    def _cs_while(self, stmt):
        cond = self._compile_expr(stmt[1])
        body = self.compile_block(stmt[2])

        def run(scope):
            while _truthy(cond(scope)):
                try:
                    for s in body:
                        s(scope)
                except _Break:
                    break
                except _Continue:
                    continue
        return run

    def _cs_for(self, stmt):
        _, init, cond, update, body = stmt
        c_init = self._compile_stmt(init) if init is not None else None
        c_cond = self._compile_expr(cond) if cond is not None else None
        c_upd = self._compile_stmt(update) if update is not None else None
        c_body = self.compile_block(body)

        def run(scope):
            if c_init is not None:
                c_init(scope)
            while c_cond is None or _truthy(c_cond(scope)):
                try:
                    for s in c_body:
                        s(scope)
                except _Break:
                    break
                except _Continue:
                    pass
                if c_upd is not None:
                    c_upd(scope)
        return run

    def _cs_break(self, stmt):
        def run(scope):
            raise _Break()
        return run

    def _cs_continue(self, stmt):
        def run(scope):
            raise _Continue()
        return run

    def _cs_exprstmt(self, stmt):
        e = self._compile_expr(stmt[1])

        def run(scope):
            e(scope)
        return run

    def _compile_augmented(self, target, aop, value_node):
        """Shared (value, target) -> new-value closure for `x op= v`."""
        val = self._compile_expr(value_node)
        if aop == "=":
            return val
        cur = self._compile_expr(target)
        js_mod = self._js_mod

        def run(scope):
            # value first, then the target's current value — the
            # dynamic evaluator's order (a value expression could
            # mutate the target through a closure)
            v = val(scope)
            c = cur(scope)
            if aop == "+=":
                return (_js_string(c) + _js_string(v)
                        if isinstance(c, str) or isinstance(v, str)
                        else c + v)
            if aop == "-=":
                return c - v
            if aop == "*=":
                return c * v
            if aop == "/=":
                return c / v
            return js_mod(c, v)
        return run

    def _cs_assign(self, stmt):
        _, target, aop, value_node = stmt
        val = self._compile_augmented(target, aop, value_node)
        if target[0] == "name":
            name = target[1]

            def run(scope):
                if name not in scope:
                    raise JSSubsetError(
                        f"assignment to undeclared {name!r}")
                scope[name] = val(scope)
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
                        raise JSSubsetError(f"index {i} out of bounds "
                                            f"(len {len(base)})")
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
            if not isinstance(base, dict):
                raise JSSubsetError(
                    f"cannot set member on {type(base).__name__}")
            base[name] = val(scope)
        return run

    # expression compilers (semantics identical to _eval below)

    def _cx_lit(self, node):
        v = node[1]
        return lambda scope: v

    def _cx_name(self, node):
        n = node[1]

        def run(scope):
            if n in scope:
                return scope[n]
            if n in self.functions:
                return self.functions[n]
            if n == "String":
                return _js_string
            if n == "Number":
                return _num_ctor
            if n == "Math":
                return _JSMath
            if n == "Date":
                return _JSDate
            if n == "Infinity":
                return float("inf")
            raise JSSubsetError(f"unbound name {n!r}")
        return run

    def _cx_ternary(self, node):
        cond = self._compile_expr(node[1])
        a = self._compile_expr(node[2])
        b = self._compile_expr(node[3])
        return lambda scope: a(scope) if _truthy(cond(scope)) else b(scope)

    def _cx_or(self, node):
        a, b = self._compile_expr(node[1]), self._compile_expr(node[2])

        def run(scope):
            left = a(scope)
            return left if _truthy(left) else b(scope)
        return run

    def _cx_and(self, node):
        a, b = self._compile_expr(node[1]), self._compile_expr(node[2])

        def run(scope):
            left = a(scope)
            return b(scope) if _truthy(left) else left
        return run

    def _cx_eq(self, node):
        a, b = self._compile_expr(node[1]), self._compile_expr(node[2])
        eq = self._strict_eq
        return lambda scope: eq(a(scope), b(scope))

    def _cx_ne(self, node):
        a, b = self._compile_expr(node[1]), self._compile_expr(node[2])
        eq = self._strict_eq
        return lambda scope: not eq(a(scope), b(scope))

    def _cx_cmp(self, node):
        o = node[1]
        a, b = self._compile_expr(node[2]), self._compile_expr(node[3])
        if o == "<":
            return lambda scope: a(scope) < b(scope)
        if o == ">":
            return lambda scope: a(scope) > b(scope)
        if o == "<=":
            return lambda scope: a(scope) <= b(scope)
        return lambda scope: a(scope) >= b(scope)

    def _cx_add(self, node):
        ae, be = self._compile_expr(node[1]), self._compile_expr(node[2])

        def run(scope):
            a, b = ae(scope), be(scope)
            if isinstance(a, str) or isinstance(b, str):
                return _js_string(a) + _js_string(b)
            return a + b
        return run

    def _cx_sub(self, node):
        a, b = self._compile_expr(node[1]), self._compile_expr(node[2])
        return lambda scope: a(scope) - b(scope)

    def _cx_mul(self, node):
        o = node[1]
        a, b = self._compile_expr(node[2]), self._compile_expr(node[3])
        if o == "*":
            return lambda scope: a(scope) * b(scope)
        if o == "/":
            def run(scope):
                x, y = a(scope), b(scope)
                return (float("nan") if y == 0 and x == 0
                        else float("inf") * (1 if x > 0 else -1) if y == 0
                        else x / y)
            return run
        js_mod = self._js_mod
        return lambda scope: js_mod(a(scope), b(scope))

    def _cx_bit(self, node):
        o = node[1]
        ae, be = self._compile_expr(node[2]), self._compile_expr(node[3])
        if o == "|":
            return lambda scope: _toint32(
                _toint32(ae(scope)) | _toint32(be(scope)))
        if o == "&":
            return lambda scope: _toint32(
                _toint32(ae(scope)) & _toint32(be(scope)))
        if o == "^":
            return lambda scope: _toint32(
                _toint32(ae(scope)) ^ _toint32(be(scope)))
        if o == "<<":
            return lambda scope: _toint32(
                _toint32(ae(scope)) << (int(be(scope)) & 31))
        if o == ">>":
            return lambda scope: _toint32(ae(scope)) >> (
                int(be(scope)) & 31)
        return lambda scope: (
            (_toint32(ae(scope)) & 0xFFFFFFFF) >> (int(be(scope)) & 31))

    def _cx_arr(self, node):
        elems = [self._compile_expr(e) for e in node[1]]
        return lambda scope: [e(scope) for e in elems]

    def _cx_not(self, node):
        e = self._compile_expr(node[1])
        return lambda scope: not _truthy(e(scope))

    def _cx_neg(self, node):
        e = self._compile_expr(node[1])
        return lambda scope: -e(scope)

    def _cx_obj(self, node):
        items = [(k, self._compile_expr(v)) for k, v in node[1]]
        return lambda scope: {k: v(scope) for k, v in items}

    def _cx_member(self, node):
        base = self._compile_expr(node[1])
        name = node[2]
        return lambda scope: self._member(base(scope), name)

    def _cx_index(self, node):
        base_e = self._compile_expr(node[1])
        idx_e = self._compile_expr(node[2])

        def run(scope):
            base, idx = base_e(scope), idx_e(scope)
            if isinstance(base, str):
                i = int(idx)
                return base[i] if 0 <= i < len(base) else UNDEFINED
            if isinstance(base, dict):
                return base.get(idx, UNDEFINED)
            if isinstance(base, list):
                i = int(idx)
                return base[i] if 0 <= i < len(base) else UNDEFINED
            raise JSSubsetError(f"cannot index {type(base).__name__}")
        return run

    def _cx_call(self, node):
        fn = self._compile_expr(node[1])
        args = [self._compile_expr(a) for a in node[2]]
        return lambda scope: fn(scope)(*[a(scope) for a in args])

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
        if op == "while":
            while _truthy(self._eval(stmt[1], scope)):
                try:
                    for s in stmt[2]:
                        self._exec(s, scope)
                except _Break:
                    break
                except _Continue:
                    continue
            return
        if op == "for":
            _, init, cond, update, body = stmt
            if init is not None:
                self._exec(init, scope)
            while cond is None or _truthy(self._eval(cond, scope)):
                try:
                    for s in body:
                        self._exec(s, scope)
                except _Break:
                    break
                except _Continue:
                    pass
                if update is not None:
                    self._exec(update, scope)
            return
        if op == "break":
            raise _Break()
        if op == "continue":
            raise _Continue()
        if op == "exprstmt":
            self._eval(stmt[1], scope)
            return
        if op == "assign":
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
                if target[1] not in scope:
                    raise JSSubsetError(
                        f"assignment to undeclared {target[1]!r}")
                scope[target[1]] = val
            elif target[0] == "index":
                base = self._eval(target[1], scope)
                idx = self._eval(target[2], scope)
                if isinstance(base, list):
                    i = int(idx)
                    if not 0 <= i < len(base):
                        raise JSSubsetError(f"index {i} out of bounds "
                                            f"(len {len(base)})")
                    base[i] = val
                elif isinstance(base, dict):
                    base[idx] = val
                else:
                    raise JSSubsetError(
                        f"cannot index-assign {type(base).__name__}")
            else:  # member
                base = self._eval(target[1], scope)
                if not isinstance(base, dict):
                    raise JSSubsetError(
                        f"cannot set member on {type(base).__name__}")
                base[target[2]] = val
            return
        raise JSSubsetError(f"unsupported statement op {op!r}")

    @staticmethod
    def _js_mod(a, b):
        """JS % keeps the dividend's sign (unlike Python)."""
        import math

        return math.fmod(a, b)

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
                return _num_ctor
            if node[1] == "Math":
                return _JSMath
            if node[1] == "Date":
                return _JSDate
            if node[1] == "Infinity":
                return float("inf")
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
        if op == "mul":
            a = self._eval(node[2], scope)
            b = self._eval(node[3], scope)
            if node[1] == "*":
                return a * b
            if node[1] == "/":
                return (float("nan") if b == 0 and a == 0
                        else float("inf") * (1 if a > 0 else -1) if b == 0
                        else a / b)
            return self._js_mod(a, b)
        if op == "bit":
            a = _toint32(self._eval(node[2], scope))
            b = self._eval(node[3], scope)
            o = node[1]
            if o == "|":
                return _toint32(a | _toint32(b))
            if o == "&":
                return _toint32(a & _toint32(b))
            if o == "^":
                return _toint32(a ^ _toint32(b))
            sh = int(b) & 31
            if o == "<<":
                return _toint32(a << sh)
            if o == ">>":
                return a >> sh
            return (a & 0xFFFFFFFF) >> sh      # >>>
        if op == "arr":
            return [self._eval(e, scope) for e in node[1]]
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
        if isinstance(base, list):
            if name == "length":
                return len(base)
            if name == "push":
                def _push(*vals):
                    base.extend(vals)
                    return len(base)
                return _push
            if name == "slice":
                def _aslice(start=0, end=None):
                    n = len(base)
                    s = int(start)
                    e = n if end is None or end is UNDEFINED else int(end)
                    if s < 0:
                        s = max(0, n + s)
                    if e < 0:
                        e = max(0, n + e)
                    return base[s:e]
                return _aslice
            raise JSSubsetError(f"unsupported array member {name!r}")
        if base is _JSMath:
            fn = getattr(_JSMath, name, None)
            if fn is None:
                raise JSSubsetError(f"unsupported Math member {name!r}")
            return fn
        if base is _JSDate:
            fn = getattr(_JSDate, name, None)
            if fn is None:
                raise JSSubsetError(f"unsupported Date member {name!r}")
            return fn
        if isinstance(base, (int, float)) and not isinstance(base, bool):
            if name == "toString":
                return lambda radix=10: _js_number_to_string(base, radix)
            if name == "toFixed":
                return lambda nd=0: f"{float(base):.{int(nd)}f}"
            raise JSSubsetError(f"unsupported number member {name!r}")
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
