"""Condition / predicate compiler — the VRL-condition analog.

Vector evaluates boolean VRL conditions per event (reference
src/conditions/mod.rs:25-50, src/conditions/vrl.rs:114-129; a runtime
error yields ``false``).  Here a condition is a small expression string
compiled ONCE into a vectorized ``fn(pa.Table) -> pa.BooleanArray``
executed with pyarrow.compute kernels — no per-row Python.

Grammar (precedence low→high)::

    expr     := or
    or       := and ( '||' and )*
    and      := unary ( '&&' unary )*
    unary    := '!' unary | comparison
    comparison := additive ( ('==','!=','<','<=','>','>=') additive )?
               | additive 'in' '[' literal, ... ']'
    additive := multiplicative ( ('+'|'-') multiplicative )*
    multiplicative := operand ( ('*'|'/'|'%') operand )*
    operand  := '-' operand | field | literal | call | '(' expr ')'
    field    := '.' ident ( '.' ident )*          -- nested via struct cols
    call     := ident '(' args ')'                 -- exists, contains,
                starts_with, ends_with, match, is_null, length
    literal  := number | 'single/double-quoted string' | true | false | null

Null semantics match Vector's "runtime error → false": any comparison
against null evaluates false (Arrow kernel nulls are filled to false at
the boolean boundary).

Used by: filter, route, exclusive_route, sample.exclude,
throttle.exclude, reduce.ends_when/starts_when, window conditions —
same consumer list as the reference (src/conditions/mod.rs docstring).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable, Union

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- AST

@dataclass(frozen=True)
class Field:
    path: tuple  # ("a", "b") for .a.b


@dataclass(frozen=True)
class Lit:
    value: Any


@dataclass(frozen=True)
class Cmp:
    op: str
    left: Any
    right: Any


@dataclass(frozen=True)
class InList:
    operand: Any
    items: tuple


@dataclass(frozen=True)
class Call:
    name: str
    args: tuple


@dataclass(frozen=True)
class Bool:
    op: str  # and | or | not
    args: tuple


@dataclass(frozen=True)
class Arith:
    op: str  # + - * / % neg
    args: tuple


Node = Union[Field, Lit, Cmp, InList, Call, Bool, Arith]

# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<op>&&|\|\||==|!=|<=|>=|<|>|!|\(|\)|\[|\]|,|\+|-|\*|/|%)
    | (?P<field>\.[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*)
    | (?P<num>\d+(?:\.\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<ident>[A-Za-z_][\w]*)
    )""",
    re.VERBOSE,
)


def _lex(s: str):
    pos, out = 0, []
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"condition parse error at {s[pos:]!r}")
        pos = m.end()
        for kind in ("op", "field", "num", "str", "ident"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    def parse(self) -> Node:
        node = self.or_()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing input at {self.peek()[1]!r}")
        return node

    def or_(self):
        node = self.and_()
        while self.peek() == ("op", "||"):
            self.next()
            node = Bool("or", (node, self.and_()))
        return node

    def and_(self):
        node = self.unary()
        while self.peek() == ("op", "&&"):
            self.next()
            node = Bool("and", (node, self.unary()))
        return node

    def unary(self):
        if self.peek() == ("op", "!"):
            self.next()
            return Bool("not", (self.unary(),))
        return self.comparison()

    def comparison(self):
        left = self.additive()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return Cmp(v, left, self.additive())
        if (k, v) == ("ident", "in"):
            self.next()
            self.expect("[")
            items = []
            while True:
                items.append(self.literal())
                k2, v2 = self.next()
                if v2 == "]":
                    break
                if v2 != ",":
                    raise ValueError(f"expected , or ] got {v2!r}")
            return InList(left, tuple(items))
        return left

    def additive(self):
        node = self.multiplicative()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            _, op = self.next()
            node = Arith(op, (node, self.multiplicative()))
        return node

    def multiplicative(self):
        node = self.operand()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _, op = self.next()
            node = Arith(op, (node, self.operand()))
        return node

    def operand(self):
        k, v = self.peek()
        if (k, v) == ("op", "-"):
            self.next()
            return Arith("neg", (self.operand(),))
        if (k, v) == ("op", "("):
            self.next()
            node = self.or_()
            self.expect(")")
            return node
        if k == "field":
            self.next()
            return Field(tuple(v[1:].split(".")))
        if k in ("num", "str"):
            return Lit(self.literal_value(self.next()))
        if k == "ident":
            self.next()
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    while True:
                        args.append(self.or_())
                        k2, v2 = self.next()
                        if v2 == ")":
                            break
                        if v2 != ",":
                            raise ValueError("bad call args")
                else:
                    self.next()
                return Call(v, tuple(args))
            if v == "true":
                return Lit(True)
            if v == "false":
                return Lit(False)
            if v == "null":
                return Lit(None)
            raise ValueError(f"unknown identifier {v!r}")
        raise ValueError(f"unexpected token {v!r}")

    def literal(self):
        k, v = self.next()
        return Lit(self.literal_value((k, v)))

    def literal_value(self, tok):
        k, v = tok
        if k == "num":
            return float(v) if "." in v else int(v)
        if k == "str":
            body = v[1:-1]
            return re.sub(r"\\(.)", r"\1", body)
        if k == "ident":
            return {"true": True, "false": False, "null": None}[v]
        raise ValueError(f"expected literal, got {v!r}")


def parse(condition: str) -> Node:
    return _Parser(_lex(condition)).parse()


# ------------------------------------------------------------- compile

def _get_field(batch: pa.Table, path: tuple) -> pa.ChunkedArray:
    col = batch[path[0]]
    for seg in path[1:]:
        col = pc.struct_field(col, seg)
    return col


def _null_false(arr) -> pa.ChunkedArray:
    """Vector semantics: condition runtime error (null) → false."""
    return pc.fill_null(arr, False)


def _eval(node: Node, batch: pa.Table):
    n = batch.num_rows
    if isinstance(node, Field):
        return _get_field(batch, node.path)
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, Cmp):
        left = _eval(node.left, batch)
        right = _eval(node.right, batch)
        # null literal comparisons → is_null / is_valid
        if isinstance(node.right, Lit) and node.right.value is None:
            return pc.is_null(left) if node.op == "==" else pc.is_valid(left)
        # dynamic-typing coercion (VRL semantics): a literal compared
        # against a differently-typed column coerces to the column type
        right = _coerce_literal(left, right)
        left = _coerce_literal(right, left)
        fn = {
            "==": pc.equal,
            "!=": pc.not_equal,
            "<": pc.less,
            "<=": pc.less_equal,
            ">": pc.greater,
            ">=": pc.greater_equal,
        }[node.op]
        return _null_false(fn(left, right))
    if isinstance(node, InList):
        operand = _eval(node.operand, batch)
        items = [i.value for i in node.items]
        return _null_false(pc.is_in(operand, value_set=pa.array(items)))
    if isinstance(node, Call):
        return _call(node, batch)
    if isinstance(node, Arith):
        if node.op == "neg":
            v = _eval(node.args[0], batch)
            return -v if isinstance(v, (int, float)) else pc.negate(v)
        left = _eval(node.args[0], batch)
        right = _eval(node.args[1], batch)
        if isinstance(left, (int, float)) and isinstance(right, (int, float)):
            return {
                "+": left + right, "-": left - right, "*": left * right,
                "/": left / right, "%": left % right,
            }[node.op]
        if node.op == "%":
            # no modulo kernel in pyarrow: a - floor(a/b)*b
            q = pc.floor(pc.divide(pc.cast(left, pa.float64()) if not isinstance(left, (int, float)) else left, right))
            return pc.subtract(left, pc.multiply(q, right))
        if node.op == "/":
            # true division (pc.divide on integers truncates)
            if not isinstance(left, (int, float)):
                left = pc.cast(left, pa.float64())
            elif not isinstance(right, (int, float)):
                right = pc.cast(right, pa.float64())
            return pc.divide(left, right)
        fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}[node.op]
        return fn(left, right)
    if isinstance(node, Bool):
        if node.op == "not":
            return pc.invert(_to_bool(_eval(node.args[0], batch), n))
        parts = [_to_bool(_eval(a, batch), n) for a in node.args]
        fn = pc.and_ if node.op == "and" else pc.or_
        out = parts[0]
        for p in parts[1:]:
            out = fn(out, p)
        return out
    raise TypeError(node)


def _coerce_literal(col, lit):
    """If ``lit`` is a Python literal whose type mismatches Arrow column
    ``col``, coerce it (string literal ↔ numeric column and vice versa).
    Returns ``lit`` unchanged when no coercion applies or possible."""
    if not isinstance(lit, (str, int, float, bool)):
        return lit
    t = getattr(col, "type", None)
    if t is None:
        return lit
    try:
        if isinstance(lit, str) and (pa.types.is_integer(t) or pa.types.is_floating(t)):
            return float(lit) if ("." in lit or "e" in lit.lower()) else int(lit)
        if isinstance(lit, bool):
            return lit
        if isinstance(lit, (int, float)) and (
            pa.types.is_string(t) or pa.types.is_large_string(t)
        ):
            return str(lit)
    except ValueError:
        return lit
    return lit


def _to_bool(v, n):
    if isinstance(v, bool):
        return pa.array([v] * n)
    return _null_false(v)


def _call(node: Call, batch: pa.Table):
    name, args = node.name, node.args
    if name == "exists":
        (f,) = args
        if not isinstance(f, Field):
            raise ValueError("exists() takes a field")
        if f.path[0] not in batch.column_names:
            return pa.array([False] * batch.num_rows)
        return pc.is_valid(_get_field(batch, f.path))
    if name == "is_null":
        (f,) = args
        return pc.is_null(_eval(f, batch))
    col = _eval(args[0], batch)
    pat = args[1].value if len(args) > 1 and isinstance(args[1], Lit) else None
    if name == "contains":
        return _null_false(pc.match_substring(col, pat))
    if name == "starts_with":
        return _null_false(pc.starts_with(col, pattern=pat))
    if name == "ends_with":
        return _null_false(pc.ends_with(col, pattern=pat))
    if name == "match":
        return _null_false(pc.match_substring_regex(col, pat))
    if name == "length":
        t = col.type if hasattr(col, "type") else None
        if t is not None and (pa.types.is_list(t) or pa.types.is_large_list(t)):
            return pc.list_value_length(col)
        return pc.utf8_length(col)
    # anything else resolves against the full VRL stdlib registry
    # (is_timestamp, is_ipv4, parse_* guards, ...)
    from .functions import scalar as _scalar

    if name in _scalar.FUNCTIONS:
        extra = [
            a.value if isinstance(a, Lit) else _eval(a, batch)
            for a in args[1:]
        ]
        return _scalar.call(name, col, *extra)
    raise ValueError(f"unknown function {name!r}")


class Condition:
    """A compiled vectorized predicate: callable(pa.Table) -> BooleanArray.

    Analog of Vector's ``Condition`` (src/conditions/mod.rs) restricted
    to the vectorizable subset; compiled once, applied per Arrow batch.
    """

    def __init__(self, expression: str):
        self.expression = expression
        self.ast = parse(expression)

    def __call__(self, batch: pa.Table) -> pa.ChunkedArray:
        out = _eval(self.ast, batch)
        return _to_bool(out, batch.num_rows)

    def mask(self, batch: pa.Table):
        m = self(batch)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return m

    def __repr__(self):
        return f"Condition({self.expression!r})"


def compile_condition(cond: Union[str, Condition, Callable]) -> Callable:
    """Accept a condition string, a compiled Condition, or a raw callable
    (user-extension hook, analog of bare VRL strings in AnyCondition —
    src/conditions/mod.rs:186-191)."""
    if isinstance(cond, Condition):
        return cond
    if isinstance(cond, str):
        try:
            return Condition(cond)
        except ValueError:
            from .vrl import VrlCondition

            return VrlCondition(cond)
    if isinstance(cond, dict):
        # AnyCondition config shape (src/conditions/mod.rs): a typed
        # {"type": ..., "source": ...} block selects the dialect
        ctype = cond.get("type", "vrl")
        if ctype in ("vrl", "expr"):
            try:
                return Condition(cond["source"])
            except ValueError:
                # full VRL program (multi-statement, ??, function calls
                # beyond the fast-path grammar) — src/conditions/vrl.rs
                from .vrl import VrlCondition

                return VrlCondition(cond["source"])
        if ctype == "datadog_search":
            from .datadog_search import compile_datadog_search

            return compile_datadog_search(cond["source"])
        raise ValueError(f"unknown condition type {ctype!r}")
    if callable(cond):
        return cond
    raise TypeError(f"not a condition: {cond!r}")
