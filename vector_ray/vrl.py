"""VRL *program* front-end — multi-statement remap source, vectorized.

Vector's remap transform compiles an arbitrary VRL source string per
component (reference src/transforms/remap.rs:52-150 ``source`` config,
:564-646 exec; the language itself lives in the external ``vrl`` crate
and is documented under website/cue/reference/remap/).  Round-3 parity
gap #1 was that our remap took a structured step list only; this module
closes it: :func:`compile_program` parses a VRL subset — assignment to
event paths and variables, ``if/else if/else`` blocks, the
error-coalescing ``??`` operator, fallible-call ``!`` suffix,
error-capture assignment ``ok, err = f(...)``, ``del()``, ``abort`` —
into a :class:`Program` executed VECTORIZED per Arrow batch.

Execution model (columnar analog of per-event VRL):

* event fields are Arrow columns; ``.a.b`` reads the flat dotted column
  ``a.b`` when present, else descends struct/map columns.
* an expression evaluates to a ``Val(data, err)`` — ``data`` a length-n
  Arrow array (or a Python scalar for literals), ``err`` an optional
  per-row boolean mask of *recoverable* errors plus per-row messages.
* ``expr ?? default`` substitutes ``default`` on errored rows and
  clears the mask; ``f!(...)`` converts errored rows into program
  failures (the row is flagged, later statements skip it, and remap's
  rollback/forward/reroute semantics apply — same contract as the step
  pipeline in stages/remap.py); ``ok, err = f(...)`` captures the
  per-row message string into ``err`` (null where the call succeeded),
  which is how the reference surfaces fallibility without aborting.
* ``if cond { ... } else { ... }`` runs both branches over the full
  batch with an *active-row mask*; assignments blend
  ``if_else(active, new, old)`` so each row sees exactly its branch.
* function calls dispatch to the 224-function scalar registry
  (functions/scalar.py).  A call that raises on the whole column is
  retried by bisection so single bad rows error individually instead
  of poisoning the batch.

Statically-typed deviation (documented): VRL's compiler rejects
programs with unhandled fallible expressions; here an unhandled
fallible call behaves like ``!`` (errors flag the row).  Row-count is
invariant — the ``. = .events`` unnest form is served by the explicit
("unnest", ...) remap step instead.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .functions import scalar as _scalar

__all__ = ["compile_program", "Program", "VrlCondition"]


from .functions.scalar import VrlRegex  # noqa: E402  (shared marker)


class VrlNameError(ValueError):
    """An undefined variable — a program bug, not a per-row failure.
    Deliberately NOT caught by ``??`` (the reference rejects undefined
    variables at compile time; swallowing the typo into the coalesce
    default would silently corrupt every row)."""

# ------------------------------------------------------------------ lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>\r?\n)
  | (?P<metapath>%(?:(?:[A-Za-z_][\w]*|"(?:[^"\\]|\\.)*")(?:\.(?:[A-Za-z_][\w]*|"(?:[^"\\]|\\.)*"))*)?)
  | (?P<op>\?\?|&&|\|\||==|!=|<=|>=|[<>]|[-+*/%]|[!=]|[(){}\[\],;:]|\|)
  | (?P<rawstr>s'(?:[^'\\]|\\.)*')
  | (?P<regex>r'(?:[^'\\]|\\.)*')
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<path>\.(?:[A-Za-z_][\w]*|"(?:[^"\\]|\\.)*")(?:\.(?:[A-Za-z_][\w]*|"(?:[^"\\]|\\.)*"))*)
  | (?P<dot>\.)
  | (?P<ident>[A-Za-z_][\w]*)
    """,
    re.VERBOSE,
)

# tokens after which a newline is a continuation, not a separator
_CONTINUATION = {
    "??", "&&", "||", "==", "!=", "<=", ">=", "<", ">", "+", "-", "*",
    "/", "%", "=", ",", "(", "[", "{", ":", ";",
}


def _lex(src: str) -> List[Tuple[str, str]]:
    toks: List[Tuple[str, str]] = []
    pos, depth = 0, 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(f"VRL parse error at {src[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind in ("ws", "comment"):
            continue
        if kind == "metapath":
            # `%` is modulo when the previous token ends a VALUE
            # (`a % b`, `10 % 3`), a metadata path otherwise
            # (`% = x`, `.m = %`, `%foo.bar`) — vrl metadata paths,
            # lib/vector-core event metadata
            prev = toks[-1] if toks else None
            value_end = prev is not None and (
                prev[0] in ("num", "str", "rawstr", "regex", "path",
                            "metapath")
                or (prev[0] == "ident"
                    and prev[1] not in ("if", "else", "return", "abort"))
                or (prev[0] == "op" and prev[1] in (")", "]", "}"))
            )
            if value_end:
                toks.append(("op", "%"))
                pos = m.start() + 1
                continue
            toks.append(("metapath", text[1:]))
            continue
        if kind == "nl":
            if depth > 0:
                continue
            if toks and toks[-1][0] == "op" and toks[-1][1] in _CONTINUATION:
                continue
            if toks and toks[-1][0] != "nl":
                toks.append(("nl", "\n"))
            continue
        if kind == "op":
            if text in "([":
                depth += 1
            elif text in ")]":
                depth = max(0, depth - 1)
        toks.append((kind, text))
    toks.append(("eof", ""))
    return toks


# -------------------------------------------------------------------- AST

@dataclass(frozen=True)
class PathE:           # .a.b — event field read
    path: Tuple[str, ...]


@dataclass(frozen=True)
class IndexedPathE:    # .a[2] as an ASSIGNMENT target (remap_array)
    path: Tuple[str, ...]
    index: int


@dataclass(frozen=True)
class RootE:           # bare `.` — the whole event as a struct
    pass


@dataclass(frozen=True)
class MetaRootE:       # bare `%` — the whole metadata namespace
    pass


@dataclass(frozen=True)
class VarE:
    name: str


@dataclass(frozen=True)
class LitE:
    value: Any


@dataclass(frozen=True)
class RegexE:
    pattern: str


@dataclass(frozen=True)
class ArrayE:
    items: tuple


@dataclass(frozen=True)
class ObjectE:
    items: tuple       # ((key, expr), ...)


@dataclass(frozen=True)
class CallE:
    name: str
    args: tuple
    bang: bool         # f!(...)
    kwargs: tuple = () # named args: ((name, expr), ...)
    closure: Optional[tuple] = None  # -> |p1, p2| { body }: (params, stmts)


@dataclass(frozen=True)
class BinE:
    op: str
    left: Any
    right: Any


@dataclass(frozen=True)
class NotE:
    operand: Any


@dataclass(frozen=True)
class NegE:
    operand: Any


@dataclass(frozen=True)
class MemberE:         # expr.key / expr["key"] on struct or map values
    operand: Any
    key: str


@dataclass(frozen=True)
class CoalesceE:       # a ?? b
    left: Any
    right: Any


@dataclass(frozen=True)
class IfE:             # if cond { stmts } else … — also usable as expr
    arms: tuple        # ((cond_or_None, stmts), ...)


# statements
@dataclass(frozen=True)
class Assign:
    target: Any        # PathE | VarE | RootE
    err_target: Optional[str]  # `ok, err = …` second binding (variable)
    expr: Any


@dataclass(frozen=True)
class ExprStmt:
    expr: Any


@dataclass(frozen=True)
class Abort:
    message: Optional[Any]


# ------------------------------------------------------------------ parser

class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise ValueError(f"VRL: expected {val!r}, got {v!r}")

    def skip_nl(self):
        while self.peek()[0] == "nl" or self.peek() == ("op", ";"):
            self.next()

    # ---- statements

    def program(self) -> List[Any]:
        stmts = []
        self.skip_nl()
        while self.peek()[0] != "eof":
            stmts.append(self.statement())
            self.skip_nl()
        return stmts

    def block(self) -> List[Any]:
        self.expect("{")
        stmts = []
        self.skip_nl()
        while self.peek() != ("op", "}"):
            stmts.append(self.statement())
            self.skip_nl()
        self.expect("}")
        return stmts

    def statement(self):
        k, v = self.peek()
        if (k, v) == ("ident", "if"):
            return ExprStmt(self.if_expr())
        if (k, v) == ("ident", "abort"):
            self.next()
            if self.peek()[0] in ("str", "rawstr"):
                return Abort(self.expression())
            return Abort(None)
        # assignment lookahead: target [, ident] =  (but not ==)
        save = self.i
        target = self._try_target()
        if target is not None:
            err_target = None
            if self.peek() == ("op", ","):
                self.next()
                k2, v2 = self.next()
                if k2 != "ident":
                    raise ValueError("VRL: error-capture target must be a variable")
                err_target = v2
            if self.peek() == ("op", "=") and self.peek(1)[1] != "=":
                self.next()
                return Assign(target, err_target, self.expression())
        self.i = save
        return ExprStmt(self.expression())

    def _try_target(self):
        k, v = self.peek()
        if k == "path":
            self.next()
            # trailing [n] → indexed array assignment target
            # (tests/behavior/transforms/remap.toml remap_array)
            if (
                self.peek() == ("op", "[")
                and self.peek(1)[0] == "num"
                and self.peek(2) == ("op", "]")
            ):
                idx = self.peek(1)[1]
                if "." not in idx:
                    self.next(); self.next(); self.next()
                    return IndexedPathE(_split_path(v), int(idx))
            return PathE(_split_path(v))
        if k == "metapath":
            self.next()
            return _meta_path(v)
        if k == "dot":
            self.next()
            return RootE()
        if k == "ident" and v not in ("true", "false", "null", "if", "else", "abort"):
            nxt = self.peek(1)
            if nxt == ("op", "=") and self.peek(2)[1] != "=":
                self.next()
                return VarE(v)
            if nxt == ("op", ","):
                self.next()
                return VarE(v)
        return None

    # ---- expressions (precedence low→high)

    def expression(self):
        return self.coalesce()

    def coalesce(self):
        node = self.or_()
        while self.peek() == ("op", "??"):
            self.next()
            node = CoalesceE(node, self.or_())
        return node

    def or_(self):
        node = self.and_()
        while self.peek() == ("op", "||"):
            self.next()
            node = BinE("||", node, self.and_())
        return node

    def and_(self):
        node = self.not_()
        while self.peek() == ("op", "&&"):
            self.next()
            node = BinE("&&", node, self.not_())
        return node

    def not_(self):
        if self.peek() == ("op", "!"):
            self.next()
            return NotE(self.not_())
        return self.cmp()

    def cmp(self):
        node = self.add()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return BinE(v, node, self.add())
        return node

    def add(self):
        node = self.mul()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            _, op = self.next()
            node = BinE(op, node, self.mul())
        return node

    def mul(self):
        node = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _, op = self.next()
            node = BinE(op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.next()
            return NegE(self.unary())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            if (
                isinstance(node, CallE)
                and self.peek() == ("op", "-")
                and self.peek(1) == ("op", ">")
            ):
                # closure: f(args) -> |p1, p2| { stmts }
                self.next(); self.next()
                self.skip_nl()
                self.expect("|")
                params = []
                while self.peek() != ("op", "|"):
                    k2, v2 = self.next()
                    if k2 != "ident":
                        raise ValueError("VRL: closure params must be identifiers")
                    params.append(v2)
                    if self.peek() == ("op", ","):
                        self.next()
                self.expect("|")
                self.skip_nl()
                body = self.block()
                node = CallE(node.name, node.args, node.bang, node.kwargs,
                             (tuple(params), tuple(body)))
            elif self.peek() == ("op", "["):
                self.next()
                k, v = self.next()
                if k not in ("str", "num"):
                    raise ValueError("VRL: subscript must be a string or int literal")
                self.expect("]")
                key = _unquote(v) if k == "str" else v
                node = MemberE(node, key)
            elif self.peek()[0] == "path" and isinstance(
                node, (CallE, MemberE, VarE)
            ):
                # member access on a non-field value: parsed.a.b
                _, p = self.next()
                for seg in _split_path(p):
                    node = MemberE(node, seg)
            else:
                return node

    def if_expr(self):
        self.expect("if")
        arms = []
        cond = self.expression()
        arms.append((cond, self.block()))
        while True:
            save = self.i
            self.skip_nl()
            if self.peek() == ("ident", "else"):
                self.next()
                if self.peek() == ("ident", "if"):
                    self.next()
                    arms.append((self.expression(), self.block()))
                    continue
                arms.append((None, self.block()))
                break
            self.i = save
            break
        return IfE(tuple(arms))

    def primary(self):
        k, v = self.peek()
        if (k, v) == ("ident", "if"):
            return self.if_expr()
        if (k, v) == ("op", "("):
            self.next()
            node = self.expression()
            self.expect(")")
            return node
        if (k, v) == ("op", "["):
            self.next()
            items = []
            self.skip_nl()
            if self.peek() != ("op", "]"):
                while True:
                    items.append(self.expression())
                    self.skip_nl()
                    k2, v2 = self.next()
                    if v2 == "]":
                        break
                    if v2 != ",":
                        raise ValueError(f"VRL: bad array literal near {v2!r}")
                    self.skip_nl()
            else:
                self.next()
            return ArrayE(tuple(items))
        if (k, v) == ("op", "{"):
            self.next()
            items = []
            self.skip_nl()
            if self.peek() != ("op", "}"):
                while True:
                    kk, kv = self.next()
                    if kk not in ("str", "ident"):
                        raise ValueError("VRL: object key must be a string")
                    self.expect(":")
                    items.append((_unquote(kv) if kk == "str" else kv, self.expression()))
                    self.skip_nl()
                    k2, v2 = self.next()
                    if v2 == "}":
                        break
                    if v2 != ",":
                        raise ValueError(f"VRL: bad object literal near {v2!r}")
                    self.skip_nl()
            else:
                self.next()
            return ObjectE(tuple(items))
        if k == "path":
            self.next()
            return PathE(_split_path(v))
        if k == "metapath":
            self.next()
            return _meta_path(v)
        if k == "dot":
            self.next()
            return RootE()
        if k == "num":
            self.next()
            return LitE(float(v) if "." in v else int(v))
        if k == "str":
            self.next()
            return LitE(_unquote(v))
        if k == "rawstr":
            self.next()
            return LitE(v[2:-1])
        if k == "regex":
            self.next()
            return RegexE(re.sub(r"\\(['\\])", r"\1", v[2:-1]))
        if k == "ident":
            self.next()
            if v == "true":
                return LitE(True)
            if v == "false":
                return LitE(False)
            if v == "null":
                return LitE(None)
            bang = False
            if self.peek() == ("op", "!"):
                # only a call suffix: `f!(` — a bare `x !` is invalid anyway
                self.next()
                bang = True
            if self.peek() == ("op", "("):
                self.next()
                args, kwargs = [], []
                self.skip_nl()
                if self.peek() != ("op", ")"):
                    while True:
                        # named args `field: value` keep their name and
                        # bind as Python keywords (the registry fns use
                        # the reference's parameter names)
                        if (
                            self.peek()[0] == "ident"
                            and self.peek(1) == ("op", ":")
                        ):
                            kname = self.next()[1]
                            self.next()
                            kwargs.append((kname, self.expression()))
                        else:
                            args.append(self.expression())
                        self.skip_nl()
                        k2, v2 = self.next()
                        if v2 == ")":
                            break
                        if v2 != ",":
                            raise ValueError(f"VRL: bad call args near {v2!r}")
                        self.skip_nl()
                else:
                    self.next()
                return CallE(v, tuple(args), bang, tuple(kwargs))
            if bang:
                raise ValueError("VRL: `!` is only valid as a call suffix")
            return VarE(v)
        raise ValueError(f"VRL: unexpected token {v!r}")


def _meta_path(text: str) -> "PathE":
    """Metadata path `%foo.bar` → PathE over the reserved __meta
    column namespace (root `%` ↔ column "__meta", `%k` ↔ "__meta_k")
    so every existing path mechanism — read, nested assign, del,
    exists — applies to event metadata unchanged."""
    if not text:
        return MetaRootE()
    parts = _split_path("." + text)
    if parts[0] == "secrets" or parts[0].startswith("secrets."):
        raise ValueError(
            "VRL: the metadata secrets namespace is only reachable via "
            "get_secret/set_secret/remove_secret"
        )
    return PathE(("__meta_" + parts[0],) + tuple(parts[1:]))


def _split_path(p: str) -> Tuple[str, ...]:
    segs, buf, i = [], [], 1  # skip leading '.'
    while i < len(p):
        ch = p[i]
        if ch == '"':
            j = i + 1
            while p[j] != '"' or p[j - 1] == "\\":
                j += 1
            buf.append(re.sub(r"\\(.)", r"\1", p[i + 1:j]))
            i = j + 1
        elif ch == ".":
            segs.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    segs.append("".join(buf))
    return tuple(segs)


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


# --------------------------------------------------------------- runtime

class Val:
    """A vectorized VRL value: Arrow array (or Python scalar) + an
    optional per-row recoverable-error mask with messages."""

    __slots__ = ("data", "err", "msg")

    def __init__(self, data, err=None, msg: Optional[str] = None):
        self.data = data
        self.err = err          # np.ndarray[bool] | None
        self.msg = msg          # one message for all errored rows

    def is_scalar(self):
        return not isinstance(self.data, (pa.Array, pa.ChunkedArray))


# function names whose null results mean *error* (fallible in VRL);
# everything else treats nulls as legitimate values
_FALLIBLE_PREFIXES = ("parse_", "decode_", "to_", "ip_")
_FALLIBLE = {
    "int", "float", "bool", "timestamp", "string", "slice",
    "from_unix_timestamp", "format_timestamp", "get_enrichment_table_record",
    "find_enrichment_table_records", "assert", "assert_eq",
}
_INFALLIBLE_OVERRIDE = {"to_string", "to_syslog_level", "to_syslog_facility",
                        "to_syslog_severity", "to_unix_timestamp", "get_path",
                        "get_hostname", "get_env_var", "get_timezone_name"}


def _is_fallible(name: str) -> bool:
    if name in _INFALLIBLE_OVERRIDE:
        return False
    return name in _FALLIBLE or name.startswith(_FALLIBLE_PREFIXES)


def _arr(v) -> pa.Array:
    if isinstance(v, pa.ChunkedArray):
        return v.combine_chunks()
    return v


def _broadcast(val: Val, n: int) -> pa.Array:
    if val.is_scalar():
        if val.data is None:
            return pa.nulls(n)
        try:
            return pa.array([val.data] * n)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            if isinstance(val.data, list):
                # heterogeneous array literal (["a", 1, true]): fall
                # back to list<vector_ray.json> — each element a
                # tagged JSON string that decodes back through as_py()
                k = len(val.data)
                flat = _scalar.mixed_json_array(list(val.data) * n)
                offsets = pa.array(
                    np.arange(0, n * k + 1, k, dtype=np.int32))
                return pa.ListArray.from_arrays(offsets, flat)
            raise
    return _arr(val.data)


def _validity(a) -> np.ndarray:
    return np.asarray(_arr(a).is_valid())


def _preserve_list_nulls(out: pa.ListArray, source: pa.ListArray, n: int):
    """A null input list stays null through a closure (it rebuilt as []
    because null rows contribute zero elements)."""
    valid = _validity(source)
    if valid.all():
        return out
    return _blend(valid, out, pa.nulls(n, out.type))


class _LazyTake(dict):
    """Child-env columns for list closures: outer columns expand by row
    id only when the closure body actually reads them."""

    def __init__(self, base, idx):
        super().__init__()
        self._base = base
        self._idx = idx

    def __missing__(self, k):
        v = _arr(self._base[k]).take(self._idx)
        self[k] = v
        return v

    def __contains__(self, k):
        return dict.__contains__(self, k) or k in self._base

    def get(self, k, d=None):
        return self[k] if k in self else d

    def __iter__(self):
        for k in self._base:
            _ = self[k]
        return dict.__iter__(self)


class _LazyTakeVars(dict):
    def __init__(self, base, idx, n):
        super().__init__()
        self._base = base
        self._idx = idx
        self._n = n

    def __missing__(self, k):
        if k not in self._base:
            raise KeyError(k)
        v = self._base[k]
        if v is not None and not v.is_scalar():
            v = Val(_arr(v.data).take(self._idx), None, v.msg)
        self[k] = v
        return v

    def __contains__(self, k):
        return dict.__contains__(self, k) or k in self._base

    def get(self, k, d=None):
        try:
            return self[k]
        except KeyError:
            return d


class _Env:
    def __init__(self, batch: pa.Table):
        self.n = batch.num_rows
        self.cols: Dict[str, pa.Array] = {
            name: _arr(batch[name]) for name in batch.column_names
        }
        self.vars: Dict[str, Val] = {}
        self.err = np.zeros(self.n, dtype=bool)
        self.abort = np.zeros(self.n, dtype=bool)
        self.msgs = np.full(self.n, None, dtype=object)

    def flag(self, mask: np.ndarray, kind: str, msg) -> None:
        """First failure wins (reference: execution stops at the first
        error/abort per event)."""
        fresh = mask & ~self.err & ~self.abort
        if not fresh.any():
            return
        if kind == "abort":
            self.abort |= fresh
        else:
            self.err |= fresh
        if isinstance(msg, str) or msg is None:
            self.msgs[fresh] = msg
        else:  # per-row messages (np object array)
            self.msgs[fresh] = np.asarray(msg, dtype=object)[fresh]

    def table(self) -> pa.Table:
        names = list(self.cols)
        return pa.table({k: self.cols[k] for k in names})


class Program:
    """Compiled VRL program: ``run(batch)`` → (table, err, abort, msgs).

    The returned table holds the transformed event columns (row count
    preserved); flag/rollback/drop handling is the caller's job
    (stages/remap.py reuses its existing machinery).
    """

    def __init__(self, source: str):
        self.source = source
        self.stmts = _Parser(_lex(source)).program()

    # ---- public entry points

    def run(self, batch: pa.Table):
        env = _Env(batch)
        active = np.ones(env.n, dtype=bool)
        self._exec_block(self.stmts, env, active)
        return (
            env.table(),
            pa.array(env.err),
            pa.array(env.abort),
            pa.array(list(env.msgs), type=pa.string()),
        )

    def eval_value(self, batch: pa.Table):
        """The program's final-expression value per row plus the error
        mask — the semantic of a VRL doc example's ``return:`` (an
        assignment evaluates to the assigned value)."""
        env = _Env(batch)
        active = np.ones(env.n, dtype=bool)
        result = self._exec_block(self.stmts, env, active)
        if result is None:
            raise ValueError("VRL program has no final expression value")
        data = _broadcast(result, env.n)
        err = env.err | env.abort
        if result.err is not None:
            err = err | result.err
        return data, pa.array(err)

    def eval_bool(self, batch: pa.Table) -> pa.Array:
        """Condition usage: the program's final expression as a boolean
        mask; rows that error evaluate false (src/conditions/vrl.rs:
        114-129 — a runtime error fails the condition)."""
        env = _Env(batch)
        active = np.ones(env.n, dtype=bool)
        result = self._exec_block(self.stmts, env, active)
        if result is None:
            raise ValueError("VRL condition must end in an expression")
        data = _broadcast(result, env.n)
        if not pa.types.is_boolean(data.type):
            try:
                data = pc.cast(data, pa.bool_())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                # non-boolean condition result is a runtime error →
                # every row fails the condition, not the whole batch
                data = pa.array(np.zeros(env.n, dtype=bool))
        mask = pc.fill_null(data, False)
        bad = env.err | env.abort
        if result.err is not None:
            bad = bad | result.err
        if bad.any():
            mask = pc.and_(mask, pa.array(~bad))
        return mask

    # ---- statement execution

    def _exec_block(self, stmts, env: _Env, active: np.ndarray) -> Optional[Val]:
        last = None
        for st in stmts:
            # rows already failed stop executing (reference semantics)
            live = active & ~env.err & ~env.abort
            if isinstance(st, Assign):
                last = self._exec_assign(st, env, live)
            elif isinstance(st, Abort):
                msg = "aborted"
                if st.message is not None:
                    v = self._eval(st.message, env, live)
                    msg = v.data if v.is_scalar() else None
                    if msg is None and not v.is_scalar():
                        env.flag(live, "abort",
                                 np.asarray(_broadcast(v, env.n).to_pylist(),
                                            dtype=object))
                        last = None
                        continue
                env.flag(live, "abort", msg)
                last = None
            elif isinstance(st, ExprStmt):
                last = self._eval(st.expr, env, live)
                if isinstance(st.expr, CallE) and st.expr.name in ("assert", "assert_eq"):
                    continue
                self._raise_unhandled(st.expr, last, env, live)
            else:
                raise TypeError(st)
        return last

    def _exec_assign(self, st: Assign, env: _Env, live: np.ndarray) -> Val:
        val = self._eval(st.expr, env, live)
        if st.err_target is not None:
            # ok, err = expr — error message column, null where ok
            errmask = val.err if val.err is not None else np.zeros(env.n, bool)
            msg = val.msg or "function call error"
            emsgs = pa.array(
                [msg if e else None for e in errmask], type=pa.string()
            )
            env.vars[st.err_target] = Val(emsgs)
            val = Val(val.data, None)  # consumed
        else:
            errmask = val.err
            self._raise_unhandled(st.expr, val, env, live)
            if errmask is not None and errmask.any():
                # failed rows keep a null value (rollback restores the
                # original on flagged rows anyway)
                data = _broadcast(val, env.n)
                val = Val(_blend(errmask, pa.nulls(env.n, data.type), data))
        if isinstance(st.target, VarE):
            if live.all():
                env.vars[st.target.name] = Val(_broadcast(val, env.n) if not val.is_scalar() else val.data)
            else:
                new = _broadcast(val, env.n)
                old_v = env.vars.get(st.target.name)
                old = _broadcast(old_v, env.n) if old_v is not None else pa.nulls(env.n, new.type if new.type != pa.null() else None)
                env.vars[st.target.name] = Val(_blend(live, new, old))
            return val
        if isinstance(st.target, RootE):
            self._assign_root(val, env, live)
            return val
        if isinstance(st.target, MetaRootE):
            self._assign_meta_root(val, env, live)
            return val
        if isinstance(st.target, IndexedPathE):
            self._assign_indexed(st.target, val, env, live)
            return val
        # event path target → flat dotted column name
        name = ".".join(st.target.path)
        new = _broadcast(val, env.n)
        if name in env.cols and not live.all():
            env.cols[name] = _blend(live, new, env.cols[name])
        elif live.all():
            env.cols[name] = new
        else:
            env.cols[name] = _blend(live, new, pa.nulls(env.n, new.type if new.type != pa.null() else None))
        return val

    def _assign_indexed(
        self, target: IndexedPathE, val: Val, env: _Env, live: np.ndarray
    ) -> None:
        """``.a[i] = expr`` — set element i of a list column, extending
        with nulls as needed (remap.toml remap_array: ``.b[2] = "two";
        .b[0] = 0`` → ``[0, null, "two"]``).  Columnar deviation: all
        elements of one array must unify to a single Arrow type (the
        reference's per-event Value arrays are heterogeneous); a
        non-castable mix raises rather than silently corrupting."""
        name = ".".join(target.path)
        i = target.index
        if i < 0:
            raise ValueError("VRL: negative array-assignment index")
        n = env.n
        new_elem = _broadcast(val, n)
        if isinstance(new_elem, pa.ChunkedArray):
            new_elem = new_elem.combine_chunks()
        old = env.cols.get(name)
        if old is not None and isinstance(old, pa.ChunkedArray):
            old = old.combine_chunks()
        if old is None or not (
            pa.types.is_list(old.type) or pa.types.is_large_list(old.type)
        ):
            # absent or non-array column: assignment replaces it with an
            # array (old scalar value is discarded, like VRL insert)
            old_offsets = np.zeros(n + 1, dtype=np.int64)
            old_flat = pa.nulls(0, new_elem.type)
            old_lens = np.zeros(n, dtype=np.int64)
        else:
            old = old.cast(pa.list_(old.type.value_type))
            old_offsets = old.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            old_flat = old.values
            # null rows behave as empty lists
            old_lens = np.where(_validity(old), np.diff(old_offsets), 0)
        # unify element types
        elem_t = new_elem.type
        if len(old_flat) and old_flat.type != elem_t:
            if elem_t == pa.null():
                elem_t = old_flat.type
                new_elem = pa.nulls(n, elem_t)
            else:
                try:
                    old_flat = pc.cast(old_flat, elem_t)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    try:
                        new_elem = pc.cast(new_elem, old_flat.type)
                        elem_t = old_flat.type
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                        raise ValueError(
                            f"VRL: array elements of {name!r} can't unify "
                            f"({old_flat.type} vs {new_elem.type}) — "
                            "heterogeneous arrays aren't representable in "
                            "a columnar batch"
                        )
        new_lens = np.where(live, np.maximum(old_lens, i + 1), old_lens)
        new_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_lens, out=new_offsets[1:])
        total = int(new_offsets[-1])
        rowid = np.repeat(np.arange(n), new_lens)
        within = np.arange(total) - np.repeat(new_offsets[:-1], new_lens)
        src = old_offsets[:-1][rowid] + within
        keep_old = within < old_lens[rowid]
        take_idx = pa.array(np.where(keep_old, src, 0), type=pa.int64())
        gathered = (
            old_flat.take(take_idx)
            if len(old_flat)
            else pa.nulls(total, elem_t)
        )
        gathered = _blend(keep_old, gathered, pa.nulls(total, elem_t))
        set_here = (within == i) & live[rowid]
        out_vals = _blend(set_here, new_elem.take(pa.array(rowid, type=pa.int64())), gathered)
        arr = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int64()).cast(pa.int32())
            if total < 2**31 else pa.array(new_offsets, type=pa.int64()),
            out_vals if not isinstance(out_vals, pa.ChunkedArray) else out_vals.combine_chunks(),
        )
        env.cols[name] = arr

    @staticmethod
    def _object_to_cols(data) -> "Optional[Dict[str, pa.Array]]":
        """struct/map value → {key: column}; None for non-objects."""
        t = data.type
        if pa.types.is_struct(t):
            return {f.name: pc.struct_field(data, f.name) for f in t}
        if pa.types.is_map(t):
            keys = set()
            for row in data.to_pylist():
                if row:
                    keys.update(k for k, _ in row)
            return {
                k: pc.map_lookup(data, pa.scalar(k, t.key_type), "first")
                for k in sorted(keys)
            }
        return None

    def _read_meta_root(self, env: _Env):
        """Bare `%`: one view over the metadata namespace — the scalar
        `__meta` column when root metadata was set to a non-object,
        else a struct of every `__meta_<key>` column (secrets stay
        behind get_secret, like the reference's dedicated accessors)."""
        names = sorted(
            c for c in env.cols
            if c.startswith("__meta_")
            and not c.startswith("__meta_secrets.")
        )
        scalar_col = env.cols.get("__meta")
        if scalar_col is not None and not names:
            return scalar_col
        if not names:
            return pa.nulls(env.n)
        struct = pa.StructArray.from_arrays(
            [_arr(env.cols[c]) for c in names],
            names=[c[len("__meta_"):] for c in names],
        )
        if scalar_col is None:
            return struct
        # scalar and per-key metadata coexist only under partial-live
        # masks — resolve PER ROW (scalar wins where set), via tagged
        # JSON since the two shapes can't share one Arrow type
        sv = _arr(scalar_col).to_pylist()
        rows = struct.to_pylist()
        return _scalar.mixed_json_array(
            [m if m is not None else r for m, r in zip(sv, rows)]
        )

    def _assign_meta_root(self, val: Val, env: _Env, live: np.ndarray) -> None:
        """``% = expr``: replace the metadata namespace (object values
        expand to per-key `__meta_<k>` columns so `%k` reads agree with
        the root view; scalars land in the `__meta` column).  Secrets
        are not metadata-root-replaceable (use remove_secret)."""
        data = _broadcast(val, env.n)
        expanded = self._object_to_cols(data)
        if expanded is not None:
            for k in expanded:
                if k == "secrets" or k.startswith("secrets."):
                    raise ValueError(
                        "VRL: metadata keys can't write into the secrets "
                        "namespace — use set_secret"
                    )
            new_meta = {f"__meta_{k}": v for k, v in expanded.items()}
        else:
            new_meta = {"__meta": data}
        old_meta = {
            k: v for k, v in env.cols.items()
            if (k == "__meta" or k.startswith("__meta_"))
            and not k.startswith("__meta_secrets.")
        }
        if live.all():
            for k in old_meta:
                del env.cols[k]
            env.cols.update(new_meta)
            return
        for k, arr in new_meta.items():
            old = env.cols.get(k, pa.nulls(env.n, arr.type))
            env.cols[k] = _blend(live, arr, old)
        for k, old in old_meta.items():
            if k not in new_meta:
                env.cols[k] = _blend(~live, old, pa.nulls(env.n, old.type))

    def _assign_root(self, val: Val, env: _Env, live: np.ndarray) -> None:
        """``. = expr`` — replace the whole event.  A struct/map value
        expands to one column per key (columnar analog of the reference
        replacing the event object; remap.rs check_remap_adds uses
        ``. = parse_json!(...)`` shapes)."""
        data = _broadcast(val, env.n)
        t = data.type
        expanded = self._object_to_cols(data)
        new_cols: Dict[str, pa.Array] = {}
        if expanded is not None:
            new_cols.update(expanded)
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            raise ValueError(
                "`. = <array>` (emit-multiple, remap.rs "
                "check_remap_emits_multiple) can't change the row count "
                "inside the vectorized VRL step — use the remap "
                "('unnest', field) step for that"
            )
        else:
            # non-object root (`. = "root string"`, remap.rs:826) — the
            # event collapses to its message field (legacy namespace)
            new_cols["message"] = data
        # event replacement never touches metadata/secrets (the
        # reference's `. = parse_json!(.message)` keeps metadata)
        for k in env.cols:
            if k.startswith("__meta"):
                new_cols.setdefault(k, env.cols[k])
        if live.all():
            env.cols = new_cols
        else:
            merged = dict(env.cols)
            for k, arr in new_cols.items():
                old = merged.get(k, pa.nulls(env.n, arr.type))
                merged[k] = _blend(live, arr, old)
            # columns absent from the new event become null on live rows
            for k in env.cols:
                if k not in new_cols:
                    merged[k] = _blend(~live, env.cols[k],
                                       pa.nulls(env.n, env.cols[k].type))
            env.cols = merged

    def _raise_unhandled(self, expr, val: Val, env: _Env, live: np.ndarray):
        """Unhandled fallible rows flag the row (``!`` semantics; the
        reference rejects such programs at compile time — see module
        docstring deviation note)."""
        if val.err is not None and val.err.any():
            env.flag(val.err & live, "error", val.msg or "function call error")
            val.err = None

    # ---- expression evaluation

    def _eval(self, node, env: _Env, live: np.ndarray) -> Val:
        if isinstance(node, LitE):
            if isinstance(node.value, str) and "{{" in node.value:
                return self._eval_template(node.value, env, live)
            return Val(node.value)
        if isinstance(node, RegexE):
            return Val(VrlRegex(node.pattern))
        if isinstance(node, PathE):
            return Val(_read_path(env, node.path))
        if isinstance(node, RootE):
            # metadata/secrets never serialize into the event payload
            names = [c for c in env.cols if not c.startswith("__meta")]
            return Val(pa.StructArray.from_arrays(
                [env.cols[c] for c in names], names=names))
        if isinstance(node, MetaRootE):
            return Val(self._read_meta_root(env))
        if isinstance(node, VarE):
            v = env.vars.get(node.name)
            if v is None:
                raise VrlNameError(f"VRL: undefined variable {node.name!r}")
            return Val(v.data, v.err, v.msg)
        if isinstance(node, ArrayE):
            return self._eval_array(node, env, live)
        if isinstance(node, ObjectE):
            return self._eval_object(node, env, live)
        if isinstance(node, MemberE):
            return self._eval_member(node, env, live)
        if isinstance(node, CoalesceE):
            return self._eval_coalesce(node, env, live)
        if isinstance(node, NotE):
            v = self._eval(node.operand, env, live)
            if v.is_scalar():
                return Val(not v.data, v.err, v.msg)
            b = pc.fill_null(pc.cast(_arr(v.data), pa.bool_()), False)
            return Val(pc.invert(b), v.err, v.msg)
        if isinstance(node, NegE):
            v = self._eval(node.operand, env, live)
            if v.is_scalar():
                return Val(-v.data, v.err, v.msg)
            return Val(pc.negate(_arr(v.data)), v.err, v.msg)
        if isinstance(node, BinE):
            return self._eval_bin(node, env, live)
        if isinstance(node, CallE):
            return self._eval_call(node, env, live)
        if isinstance(node, IfE):
            return self._eval_if(node, env, live)
        raise TypeError(node)

    def _eval_if(self, node: IfE, env: _Env, active: np.ndarray) -> Val:
        remaining = active.copy()
        result: Optional[Val] = None
        for cond, stmts in node.arms:
            if cond is None:
                mask = remaining.copy()
            else:
                cv = self._eval(cond, env, remaining)
                data = _broadcast(cv, env.n)
                if not pa.types.is_boolean(data.type):
                    try:
                        data = pc.cast(data, pa.bool_())
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                            pa.ArrowTypeError):
                        # non-boolean branch condition → no row matches
                        # (runtime condition error, not a batch crash)
                        data = pa.array(np.zeros(env.n, dtype=bool))
                mask = remaining & np.asarray(pc.fill_null(data, False))
                if cv.err is not None:
                    mask &= ~cv.err
            branch_val = self._exec_block(stmts, env, mask)
            if branch_val is not None:
                bdata = _broadcast(branch_val, env.n)
                if result is None:
                    result = Val(_blend(mask, bdata, pa.nulls(env.n, bdata.type)))
                else:
                    result = Val(_blend(mask, bdata, _broadcast(result, env.n)))
            remaining &= ~mask
            if not remaining.any():
                break
        return result if result is not None else Val(None)

    def _eval_coalesce(self, node: CoalesceE, env, live) -> Val:
        try:
            left = self._eval(node.left, env, live)
        except VrlNameError:
            raise  # a typo'd variable is a program error, not fallibility
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError,
                TypeError, KeyError):
            return self._eval(node.right, env, live)
        if left.err is None or not left.err.any():
            return Val(left.data, None)
        # the default only runs (and can only flag) on errored-lhs rows
        right = self._eval(node.right, env, live & left.err)
        ldata = _broadcast(left, env.n)
        rdata = _broadcast(right, env.n)
        blended = _blend(left.err, rdata, ldata)
        rerr = None
        if right.err is not None:
            rerr = right.err & left.err
            if not rerr.any():
                rerr = None
        return Val(blended, rerr, right.msg)

    def _eval_array(self, node: ArrayE, env, live) -> Val:
        vals = [self._eval(it, env, live) for it in node.items]
        if all(v.is_scalar() for v in vals):
            return Val([v.data for v in vals])
        arrs = [_broadcast(v, env.n) for v in vals]
        # unify only within one kind (numeric promotion, string
        # widths); casting across kinds (int→string, bool→string)
        # would silently stringify typed values — those arrays drop to
        # the tagged JSON-string element type instead
        types = {a.type for a in arrs if a.type != pa.null()}
        if len(types) <= 1:
            t = types.pop() if types else pa.string()
        elif all(
            pa.types.is_integer(t) or pa.types.is_floating(t) for t in types
        ):
            t = (
                pa.int64()
                if all(pa.types.is_integer(t) for t in types)
                else pa.float64()
            )
        elif all(pa.types.is_string(t) or pa.types.is_large_string(t)
                 for t in types):
            t = pa.string()
        else:
            t = None
        if t is not None:
            try:
                arrs = [pc.cast(a, t) for a in arrs]
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    pa.ArrowTypeError):
                t = None
        if t is None:
            arrs = [
                _scalar.mixed_json_array(_arr(a).to_pylist()) for a in arrs
            ]
        n, k = env.n, len(arrs)
        flat = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrs])
        # interleave: element j of row i sits at j*n + i → take indices
        idx = (np.arange(n * k).reshape(n, k).T * 0 +
               np.arange(k)[:, None] * n + np.arange(n)[None, :]).T.ravel()
        values = flat.take(pa.array(idx, type=pa.int64()))
        offsets = pa.array(np.arange(0, n * k + 1, k, dtype=np.int32))
        err = None
        for v in vals:
            if v.err is not None:
                err = v.err if err is None else (err | v.err)
        return Val(pa.ListArray.from_arrays(offsets, values), err)

    def _eval_object(self, node: ObjectE, env, live) -> Val:
        if not node.items:
            return Val(pa.array([{}] * env.n, type=pa.struct([])))
        names, arrs, err, msg = [], [], None, None
        for key, it in node.items:
            v = self._eval(it, env, live)
            names.append(key)
            arrs.append(_broadcast(v, env.n))
            if v.err is not None:
                err = v.err if err is None else (err | v.err)
                msg = msg or v.msg
        return Val(pa.StructArray.from_arrays(arrs, names=names), err, msg)

    def _eval_member(self, node: MemberE, env, live) -> Val:
        base = self._eval(node.operand, env, live)
        data = _broadcast(base, env.n)
        t = data.type
        # VRL: indexing null is an error ("can't query null"); a present
        # object with a missing key is a legitimate null.  Rows where
        # the base itself is null carry a recoverable error so
        # `parsed.key ?? default` fires after a failed parse.
        base_null = ~_validity(data)
        err = _merge_err_masks(base.err, base_null if base_null.any() else None)
        base = Val(base.data, err, base.msg or "can't query null")
        if pa.types.is_struct(t):
            if node.key not in [f.name for f in t]:
                return Val(pa.nulls(env.n), base.err, base.msg)
            return Val(pc.struct_field(data, node.key), base.err, base.msg)
        if pa.types.is_map(t):
            return Val(
                pc.map_lookup(data, pa.scalar(str(node.key), t.key_type), "first"),
                base.err, base.msg,
            )
        if (pa.types.is_list(t) or pa.types.is_large_list(t)) and str(node.key).lstrip("-").isdigit():
            return Val(pc.list_element(data, int(node.key)), base.err, base.msg)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            # JSON-string objects (obj_array fallback form)
            rows = data.to_pylist()
            out = []
            for r in rows:
                try:
                    d = json.loads(r) if r is not None else None
                    out.append(d.get(node.key) if isinstance(d, dict) else None)
                except (ValueError, TypeError):
                    out.append(None)
            return Val(_scalar.obj_array(out), base.err, base.msg)
        raise ValueError(f"VRL: cannot index type {t} with {node.key!r}")

    def _eval_bin(self, node: BinE, env, live) -> Val:
        op = node.op
        # `x == null` / `x != null` — VRL null checks (the standard
        # `if err != null` idiom) must yield booleans, not Arrow's
        # null-propagating comparison
        if op in ("==", "!=") and (
            (isinstance(node.right, LitE) and node.right.value is None)
            or (isinstance(node.left, LitE) and node.left.value is None)
        ):
            operand = (
                node.left
                if not (isinstance(node.left, LitE) and node.left.value is None)
                else node.right
            )
            v = self._eval(operand, env, live)
            if isinstance(operand, LitE) and operand.value is None:
                return Val(op == "==")  # null == null
            if v.is_scalar():
                return Val((v.data is None) == (op == "=="), v.err, v.msg)
            data = _broadcast(v, env.n)
            isnull = pc.is_null(data)
            return Val(isnull if op == "==" else pc.invert(isnull), v.err, v.msg)
        left = self._eval(node.left, env, live)
        if op == "&&":
            # short-circuit per row: the rhs only runs (and can only
            # flag errors) on rows where the lhs is truthy — the
            # standard `exists(.x) && f!(.x)` guard must not drop rows
            # its lhs already excluded
            lb = _to_bool_arr(left, env.n)
            lmask = np.asarray(lb)
            right = self._eval(node.right, env, live & lmask)
            rb = _to_bool_arr(right, env.n)
            rerr = right.err & lmask if right.err is not None else None
            if rerr is not None and not rerr.any():
                rerr = None
            return Val(pc.and_(lb, rb), _merge_err_masks(left.err, rerr),
                       left.msg or right.msg)
        if op == "||":
            # VRL ||: VALUE-returning short circuit — lhs unless falsy
            # (null or false), else rhs (`.thing.cabbage || "beetroot"`
            # in remap.rs:1741).  For boolean operands this reduces to
            # boolean or with null→rhs.  Errored lhs rows count falsy.
            # The rhs only runs (and can only flag) on falsy-lhs rows —
            # same per-row short circuit as &&.
            ldata = _broadcast(left, env.n)
            falsy = ~_validity(ldata)
            if pa.types.is_boolean(ldata.type):
                falsy |= ~np.asarray(pc.fill_null(ldata, True))
            if left.err is not None:
                falsy |= left.err
            if not falsy.any():
                return Val(ldata)
            right = self._eval(node.right, env, live & falsy)
            rdata = _broadcast(right, env.n)
            rerr = right.err & falsy if right.err is not None else None
            if rerr is not None and not rerr.any():
                rerr = None
            return Val(_blend(falsy, rdata, ldata), rerr, right.msg)
        right = self._eval(node.right, env, live)
        err = _merge_err(left, right)
        msg = left.msg or right.msg
        if op in ("/", "%"):
            # VRL: division by zero is a catchable expression error
            # (remap.toml remap_arithmetic_error), per-row for arrays
            if right.is_scalar():
                if _is_py_number(right.data) and right.data == 0:
                    allerr = np.ones(env.n, dtype=bool)
                    return Val(
                        pa.nulls(env.n, pa.float64()),
                        _merge_err_masks(err, allerr),
                        "can't divide by zero",
                    )
            else:
                rarr = _broadcast(right, env.n)
                if pa.types.is_integer(rarr.type) or pa.types.is_floating(rarr.type):
                    zmask = np.asarray(pc.fill_null(pc.equal(rarr, 0), False))
                    if zmask.any():
                        masked = _blend(
                            ~zmask, rarr, pa.nulls(env.n, rarr.type)
                        )
                        right = Val(masked, right.err, right.msg)
                        err = _merge_err_masks(err, zmask)
                        msg = msg or "can't divide by zero"
        if left.is_scalar() and right.is_scalar():
            return Val(_scalar_bin(op, left.data, right.data), err, msg)
        l = _broadcast(left, env.n) if not left.is_scalar() else left.data
        r = _broadcast(right, env.n) if not right.is_scalar() else right.data
        try:
            return Val(_arrow_bin(op, l, r, env.n), err, msg)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError) as e:
            # whole-column type failure → all live valid rows error
            mask = np.ones(env.n, dtype=bool)
            for side in (l, r):
                if isinstance(side, (pa.Array, pa.ChunkedArray)):
                    mask &= _validity(side)
            newerr = mask if err is None else (err | mask)
            return Val(pa.nulls(env.n), newerr, msg or f"operation failed: {e}")

    def _eval_call(self, node: CallE, env, live) -> Val:
        name = node.name
        if getattr(node, "closure", None) is not None:
            return self._eval_closure_call(node, env, live)
        if name == "del":
            return self._call_del(node, env, live)
        if name in ("get_secret", "set_secret", "remove_secret"):
            return self._call_secret(node, env, live)
        if name == "exists":
            (arg,) = node.args
            if isinstance(arg, PathE):
                # agree with path reads: a path can also descend through
                # an intermediate dotted-prefix column ("user.geo"), so
                # only short-circuit false when NO prefix of the path is
                # a column (_read_path tries every cut)
                prefixes = {
                    ".".join(arg.path[:cut])
                    for cut in range(1, len(arg.path) + 1)
                }
                if not (prefixes & set(env.cols)):
                    return Val(pa.array([False] * env.n))
            v = self._eval(arg, env, live)
            return Val(pc.is_valid(_broadcast(v, env.n)))
        if name in ("assert", "assert_eq"):
            return self._call_assert(node, env, live)
        if name == "merge" and node.args and isinstance(node.args[0], RootE):
            # `. = merge(., parsed)` — the standard enrich idiom: overlay
            # the object's keys onto the event (reference merge.cue on
            # the root path).  Evaluated natively so the event stays
            # columnar instead of crossing through a map array.
            right = self._eval(node.args[1], env, live)
            data = _broadcast(right, env.n)
            t = data.type
            # metadata/secrets are not event payload — same exclusion
            # as RootE reads (a non-root assignment of the merge result
            # must not serialize them)
            names = [c for c in env.cols if not c.startswith("__meta")]
            arrs = [env.cols[c] for c in names]
            if pa.types.is_struct(t):
                for f in t:
                    col = pc.struct_field(data, f.name)
                    if f.name in names:
                        arrs[names.index(f.name)] = col
                    else:
                        names.append(f.name)
                        arrs.append(col)
            elif pa.types.is_map(t):
                keys = set()
                for row in data.to_pylist():
                    if row:
                        keys.update(k for k, _ in row)
                for kk in sorted(keys):
                    col = pc.map_lookup(data, pa.scalar(kk, t.key_type), "first")
                    if kk in names:
                        # only overwrite where the object HAS the key
                        arrs[names.index(kk)] = pc.coalesce(col, arrs[names.index(kk)].cast(col.type) if arrs[names.index(kk)].type != col.type else arrs[names.index(kk)])
                    else:
                        names.append(kk)
                        arrs.append(col)
            else:
                raise ValueError("merge(., x): x must be an object")
            return Val(
                pa.StructArray.from_arrays([_arr(a) for a in arrs], names=names),
                right.err, right.msg,
            )
        vals = [self._eval(a, env, live) for a in node.args]
        # pattern string-vs-regex semantics (plain string = literal,
        # r'…' = regex, carried through variables as VrlRegex) live in
        # the registry fns themselves — replace/split/find dispatch on
        # the VrlRegex marker
        kwvals = {k: self._eval(a, env, live) for k, a in getattr(node, "kwargs", ())}
        kw = {k: (v.data if v.is_scalar() else _broadcast(v, env.n))
              for k, v in kwvals.items()}
        if not vals:
            out = _scalar.call(name, pa.nulls(env.n), **kw)
            return Val(_arr(out))
        first = _broadcast(vals[0], env.n)
        rest = [v.data if v.is_scalar() else _broadcast(v, env.n) for v in vals[1:]]
        in_err = _merge_err(*vals, *kwvals.values())
        try:
            out = _arr(_scalar.call(name, first, *rest, **kw))
            callerr = None
            if _is_fallible(name):
                # VRL: a fallible call errors on null input too
                # (to_int(null) / parse_json(null) are errors)
                callerr = ~_validity(out)
                if not callerr.any():
                    callerr = None
        except Exception as e:  # per-row isolation via bisection
            out, callerr = _bisect_call(name, first, rest, env.n, e, kw)
        msg = f'function call error for "{name}"'
        if node.bang and callerr is not None and callerr.any():
            env.flag(callerr & live, "error", msg)
            callerr = None
        err = _merge_err_masks(in_err, callerr)
        return Val(out, err, msg if callerr is not None or err is not None else None)


    # ---- closures: f(x) -> |p1, p2| { body }

    def _run_closure(self, body, env, live, bindings, persist=False):
        """Run a closure body.  With ``persist=False`` (map/filter over
        FLATTENED values, where lengths differ from the event) the body
        runs in a child scope and outer writes are restored; with
        ``persist=True`` (for_each's per-position iteration, length-n)
        only the param bindings are removed afterwards — outer-variable
        accumulation across iterations is the point of for_each."""
        saved_vars = dict(env.vars)
        saved_cols = dict(env.cols)
        env.vars.update(bindings)
        try:
            result = self._exec_block(list(body), env, live)
        finally:
            if persist:
                for k in bindings:
                    if k in saved_vars:
                        env.vars[k] = saved_vars[k]
                    else:
                        env.vars.pop(k, None)
            else:
                env.vars = saved_vars
                env.cols = saved_cols
        if result is None and not persist:
            raise ValueError("VRL: closure body must end in an expression")
        return result

    def _eval_for_each(self, node: CallE, env, live) -> Val:
        """for_each(array|object) -> |i_or_k, value| { body } — SEQUENTIAL
        over element positions / object fields, VECTORIZED across rows:
        iteration j binds ``value`` to every row's j-th element at once
        (rows shorter than j masked out), and outer-variable writes
        persist between iterations, so per-row accumulators work
        without a per-row loop (for_each.cue)."""
        params, body = node.closure
        if len(params) != 2:
            raise ValueError("VRL: for_each closure takes |index_or_key, value|")
        subject = self._eval(node.args[0], env, live)
        data = _broadcast(subject, env.n)
        t = data.type
        if pa.types.is_struct(t):
            # null-object rows iterate ZERO times (reference semantics)
            valid = _validity(data)
            for f in t:
                self._run_closure(
                    body, env, live & valid,
                    {params[0]: Val(f.name),
                     params[1]: Val(pc.struct_field(data, f.name))},
                    persist=True,
                )
            return Val(None)
        if pa.types.is_map(t):
            # a map IS a list of (key, value) entries — iterate entry
            # positions like the list branch, binding the key column as
            # the first param (per-row key sets supported)
            marr = data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data
            offsets = marr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lens = np.where(_validity(marr), np.diff(offsets), 0)
            max_len = int(lens.max()) if len(lens) else 0
            keys, items = marr.keys, marr.items
            for j in range(max_len):
                has = lens > j
                idx = pa.array(np.where(has, offsets[:-1] + j, 0), type=pa.int64())
                kj = _blend(has, keys.take(idx), pa.nulls(env.n, keys.type))
                vj = _blend(has, items.take(idx), pa.nulls(env.n, items.type))
                self._run_closure(
                    body, env, live & has,
                    {params[0]: Val(kj), params[1]: Val(vj)},
                    persist=True,
                )
            return Val(None)
        if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
            raise ValueError(f"VRL: for_each needs an array or object, got {t}")
        lst = data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data
        lst = lst.cast(pa.list_(t.value_type))
        offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.where(_validity(lst), np.diff(offsets), 0)
        max_len = int(lens.max()) if len(lens) else 0
        values = lst.values
        for j in range(max_len):
            has = lens > j
            idx = pa.array(np.where(has, offsets[:-1] + j, 0), type=pa.int64())
            vj = values.take(idx)
            vj = _blend(has, vj, pa.nulls(env.n, vj.type))
            self._run_closure(
                body, env, live & has,
                {params[0]: Val(int(j)), params[1]: Val(vj)},
                persist=True,
            )
        return Val(None)

    def _eval_closure_call(self, node: CallE, env, live) -> Val:
        """map_values / map_keys / filter with a closure, columnar:

        * object (struct column) subjects stay length-n — the closure
          body runs vectorized once per FIELD (the per-event key set is
          one schema here), so ``map_values(.) -> |v| {upcase!(v)}``
          costs one kernel per field, not one call per event.
        * array (list column) subjects run the closure over the
          FLATTENED values (one kernel over sum-of-lengths elements);
          event columns and outer variables referenced inside the body
          are expanded per element by row id, and the list is rebuilt
          from offsets afterwards.  (website/cue/reference/remap/
          functions/{map_values,map_keys,filter}.cue)
        """
        params, body = node.closure
        name = node.name
        if name == "for_each":
            return self._eval_for_each(node, env, live)
        if name == "replace_with":
            return self._eval_replace_with(node, env, live)
        if name not in ("map_values", "map_keys", "filter"):
            raise ValueError(f"VRL: {name!r} doesn't take a closure")
        subject = self._eval(node.args[0], env, live)
        data = _broadcast(subject, env.n)
        t = data.type
        if pa.types.is_struct(t):
            if name == "filter":
                raise ValueError("VRL: filter over objects isn't supported here")
            if name == "map_values":
                vparam = params[-1]
                arrs, names = [], []
                for f in t:
                    child = pc.struct_field(data, f.name)
                    binds = {vparam: Val(child)}
                    if len(params) == 2:  # |key, value| variant
                        binds[params[0]] = Val(f.name)
                    res = self._run_closure(body, env, live, binds)
                    arrs.append(_broadcast(res, env.n))
                    names.append(f.name)
                return Val(
                    pa.StructArray.from_arrays(arrs, names=names),
                    subject.err, subject.msg,
                )
            # map_keys: |key| - keys are schema-level, one eval per field
            recursive = any(
                k == "recursive" and isinstance(a, LitE) and a.value is True
                for k, a in getattr(node, "kwargs", ())
            )

            def _map_keys(struct_arr):
                arrs, names = [], []
                for f2 in struct_arr.type:
                    res = self._run_closure(
                        body, env, live, {params[0]: Val(f2.name)})
                    if res.is_scalar():
                        nk = res.data
                    else:
                        uniq = {v for v in _arr(_broadcast(res, env.n)).to_pylist()
                                if v is not None}
                        if len(uniq) > 1:
                            raise ValueError(
                                "VRL: map_keys closure produced per-row key "
                                f"values for field {f2.name!r} — column names "
                                "are schema-level in a columnar batch"
                            )
                        nk = next(iter(uniq)) if uniq else f2.name
                    kid = pc.struct_field(struct_arr, f2.name)
                    if recursive and pa.types.is_struct(kid.type):
                        kid = _map_keys(kid)
                    arrs.append(kid)
                    names.append(str(nk))
                return pa.StructArray.from_arrays(arrs, names=names)

            return Val(_map_keys(data), subject.err, subject.msg)
        if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
            raise ValueError(
                f"VRL: {name} needs an object or array subject, got {t}"
            )
        lst = data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data
        lst = lst.cast(pa.list_(t.value_type))
        offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.where(_validity(lst), np.diff(offsets), 0)
        starts = np.zeros(env.n + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        total = int(starts[-1])
        rowid = np.repeat(np.arange(env.n), lens)
        within = np.arange(total) - np.repeat(starts[:-1], lens)
        take_idx = pa.array(offsets[:-1][rowid] + within, type=pa.int64())
        flat = lst.values.take(take_idx) if total else pa.nulls(0, t.value_type)
        # child env of length `total`: event cols / outer vars expand by
        # row id on demand (the closure usually touches only its params)
        cenv = _Env.__new__(_Env)
        cenv.n = total
        ridx = pa.array(rowid, type=pa.int64())
        cenv.cols = _LazyTake(env.cols, ridx)
        cenv.vars = _LazyTakeVars(env.vars, ridx, total)
        cenv.err = np.zeros(total, dtype=bool)
        cenv.abort = np.zeros(total, dtype=bool)
        cenv.msgs = np.full(total, None, dtype=object)
        binds = {params[-1]: Val(flat)}
        if len(params) == 2:  # |index, value|
            binds[params[0]] = Val(pa.array(within, type=pa.int64()))
        res = self._run_closure(body, cenv, np.ones(total, dtype=bool), binds)
        # fold element-level failures back to their parent rows
        elem_err = cenv.err | cenv.abort
        if res.err is not None:
            elem_err = elem_err | res.err
        row_err = None
        if elem_err.any():
            row_err = np.zeros(env.n, dtype=bool)
            np.logical_or.at(row_err, rowid, elem_err)
        err = _merge_err_masks(subject.err, row_err)
        if name == "filter":
            keepb = _to_bool_arr(res, total)
            keep = np.asarray(keepb) & ~elem_err
            new_lens = np.zeros(env.n, dtype=np.int64)
            np.add.at(new_lens, rowid, keep.astype(np.int64))
            new_offsets = np.zeros(env.n + 1, dtype=np.int64)
            np.cumsum(new_lens, out=new_offsets[1:])
            vals = flat.filter(pa.array(keep))
            out = pa.ListArray.from_arrays(
                pa.array(new_offsets).cast(pa.int32()), vals)
            out = _preserve_list_nulls(out, lst, env.n)
            return Val(out, err, res.msg or subject.msg)
        # map_values over an array: same offsets, transformed values
        new_vals = _broadcast(res, total) if not res.is_scalar() else _arr(
            pa.array([res.data] * total))
        out = pa.ListArray.from_arrays(pa.array(starts).cast(pa.int32()), new_vals)
        out = _preserve_list_nulls(out, lst, env.n)
        return Val(out, err, res.msg or subject.msg)

    def _eval_template(self, text: str, env, live) -> Val:
        """VRL string templates: ``"[{{ var }}]"`` concatenates literal
        parts with variable values."""
        parts = re.split(r"\{\{\s*(\w+)\s*\}\}", text)
        out: Optional[Val] = None
        for i, part in enumerate(parts):
            if i % 2 == 0:
                if not part:
                    continue
                piece = Val(part)
            else:
                piece = self._eval(VarE(part), env, live)
            if out is None:
                out = piece
            elif out.is_scalar() and piece.is_scalar():
                out = Val(f"{out.data}{piece.data}")
            else:
                l = _broadcast(out, env.n)
                r = _broadcast(piece, env.n)
                if not _is_str_type(l.type):
                    l = pc.cast(l, pa.string())
                if not _is_str_type(r.type):
                    r = pc.cast(r, pa.string())
                out = Val(pc.binary_join_element_wise(l, r, ""),
                          _merge_err(out, piece))
        return out if out is not None else Val("")

    def _eval_replace_with(self, node: CallE, env, live) -> Val:
        """replace_with(value, pattern, count) -> |match| { … } — the
        closure runs VECTORIZED over every match in the batch (one
        kernel pass over all matches of all rows); the per-row string
        splice is the only python loop (replace_with.cue).  The match
        object exposes ``string``, ``captures`` (list, null for
        non-participating groups) and named groups as fields."""
        params, body = node.closure
        subject = self._eval(node.args[0], env, live)
        pat = self._eval(node.args[1], env, live)
        if not (pat.is_scalar() and isinstance(pat.data, VrlRegex)):
            # the reference only accepts regex patterns here
            raise ValueError("replace_with: pattern must be a regex (r'…')")
        count = -1

        def _count_of(expr):
            cv = self._eval(expr, env, live)
            if cv.is_scalar():
                if isinstance(cv.data, (int, float)) and not isinstance(cv.data, bool):
                    return int(cv.data)
                raise ValueError(
                    f"replace_with: invalid count {cv.data!r} (integer expected)")
            uniq = {v for v in _broadcast(cv, env.n).to_pylist() if v is not None}
            if len(uniq) == 1 and all(
                isinstance(v, (int, float)) and not isinstance(v, bool)
                for v in uniq
            ):
                return int(next(iter(uniq)))
            if not uniq:
                raise ValueError("replace_with: invalid count (null)")
            raise ValueError("replace_with: per-row count values aren't supported")

        for k, a in getattr(node, "kwargs", ()):
            if k == "count":
                count = _count_of(a)
        if len(node.args) > 2:
            count = _count_of(node.args[2])
        rx = re.compile(pat.data)
        rows = _broadcast(subject, env.n).to_pylist()
        matches, rowid, spans = [], [], []
        for ri, s in enumerate(rows):
            if s is None or not (live[ri]):
                continue
            for mi, m in enumerate(rx.finditer(s)):
                if count >= 0 and mi >= count:
                    break
                matches.append(m)
                rowid.append(ri)
                spans.append(m.span())
        if not matches:
            return Val(pa.array(rows, type=pa.string()), subject.err, subject.msg)
        total = len(matches)
        names = sorted(rx.groupindex)
        fields = [
            pa.array([m.group(0) for m in matches], type=pa.string()),
            pa.array([[g for g in m.groups()] for m in matches],
                     type=pa.list_(pa.string())),
        ]
        fnames = ["string", "captures"]
        for nm in names:
            fields.append(pa.array([m.group(nm) for m in matches],
                                   type=pa.string()))
            fnames.append(nm)
        match_obj = pa.StructArray.from_arrays(fields, names=fnames)
        ridx = pa.array(np.asarray(rowid, dtype=np.int64))
        cenv = _Env.__new__(_Env)
        cenv.n = total
        cenv.cols = _LazyTake(env.cols, ridx)
        cenv.vars = _LazyTakeVars(env.vars, ridx, total)
        cenv.err = np.zeros(total, dtype=bool)
        cenv.abort = np.zeros(total, dtype=bool)
        cenv.msgs = np.full(total, None, dtype=object)
        res = self._run_closure(body, cenv, np.ones(total, dtype=bool),
                                {params[0]: Val(match_obj)})
        reps = _broadcast(res, total)
        if not _is_str_type(reps.type):
            reps = pc.cast(reps, pa.string())
        reps = reps.to_pylist()
        elem_err = cenv.err | cenv.abort
        if res.err is not None:
            elem_err = elem_err | res.err
        # splice per row, right-to-left so spans stay valid
        out = list(rows)
        by_row: Dict[int, list] = {}
        for (ri, (a, b), rep, bad) in zip(rowid, spans, reps, elem_err):
            by_row.setdefault(ri, []).append((a, b, rep, bad))
        row_err = np.zeros(env.n, dtype=bool)
        for ri, pieces in by_row.items():
            s = rows[ri]
            for a, b, rep, bad in sorted(pieces, reverse=True):
                if bad or rep is None:
                    row_err[ri] = True
                    continue
                s = s[:a] + rep + s[b:]
            out[ri] = s
        err = _merge_err_masks(subject.err,
                               row_err if row_err.any() else None)
        return Val(pa.array(out, type=pa.string()), err, res.msg or subject.msg)

    def _call_secret(self, node: CallE, env, live) -> Val:
        """get_secret/set_secret/remove_secret (vrl stdlib; reference
        event metadata secrets) over the reserved ``__meta_secrets.*``
        column namespace — the same projection %-paths use.  Keys may
        be per-row string expressions; each distinct key touches its
        own column under the live mask."""
        key_v = self._eval(node.args[0], env, live)
        if key_v.is_scalar():
            if not isinstance(key_v.data, str):
                raise ValueError(f"{node.name}() needs a string key")
            keys = np.full(env.n, key_v.data, dtype=object)
        else:
            keys = np.array(
                _broadcast(key_v, env.n).to_pylist(), dtype=object)
        distinct = {k for k in keys.tolist() if k is not None}

        def _mask_for(k):
            return live & (keys == k)

        if node.name == "get_secret":
            out = np.full(env.n, None, dtype=object)
            for k in distinct:
                col = env.cols.get(f"__meta_secrets.{k}")
                if col is None:
                    continue
                m = keys == k
                vals = np.array(_arr(col).to_pylist(), dtype=object)
                out[m] = vals[m]
            return Val(pa.array(out.tolist(), type=pa.string()))
        if node.name == "set_secret":
            val = self._eval(node.args[1], env, live)
            data = _broadcast(val, env.n)
            if not (pa.types.is_string(data.type)
                    or pa.types.is_large_string(data.type)
                    or pa.types.is_null(data.type)):
                # reference set_secret takes a string value; a typed
                # crash at get time would fail the whole batch instead
                raise ValueError("set_secret() value must be a string")
            for k in distinct:
                col = f"__meta_secrets.{k}"
                m = _mask_for(k)
                old = env.cols.get(col, pa.nulls(env.n, data.type))
                env.cols[col] = _blend(m, data, old)
            return Val(None)
        # remove_secret
        for k in distinct:
            col = f"__meta_secrets.{k}"
            if col not in env.cols:
                continue
            old = env.cols[col]
            m = _mask_for(k)
            if m.all():
                del env.cols[col]
            else:
                env.cols[col] = _blend(m, pa.nulls(env.n, old.type), old)
        return Val(None)

    def _call_del(self, node: CallE, env, live) -> Val:
        (arg,) = node.args
        if isinstance(arg, MetaRootE):
            # del(%) — clear the (non-secret) metadata namespace
            old_val = Val(self._read_meta_root(env))
            for k in list(env.cols):
                if (k == "__meta" or k.startswith("__meta_")) and not                         k.startswith("__meta_secrets."):
                    if live.all():
                        del env.cols[k]
                    else:
                        env.cols[k] = _blend(
                            live, pa.nulls(env.n, env.cols[k].type),
                            env.cols[k])
            return old_val
        if not isinstance(arg, PathE):
            raise ValueError("del() takes an event path")
        name = ".".join(arg.path)
        if name not in env.cols:
            return Val(None)
        old = env.cols[name]
        if live.all():
            del env.cols[name]
        else:
            env.cols[name] = _blend(live, pa.nulls(env.n, old.type), old)
        return Val(old)  # del returns the removed value

    def _call_assert(self, node: CallE, env, live) -> Val:
        if node.name == "assert":
            cond = self._eval(node.args[0], env, live)
            msg = None
            if len(node.args) > 1:
                m = self._eval(node.args[1], env, live)
                msg = m.data if m.is_scalar() else None
            mask = ~np.asarray(_to_bool_arr(cond, env.n))
        else:
            l = self._eval(node.args[0], env, live)
            r = self._eval(node.args[1], env, live)
            msg = None
            if len(node.args) > 2:
                m = self._eval(node.args[2], env, live)
                msg = m.data if m.is_scalar() else None
            eq = _arrow_bin("==", _broadcast(l, env.n), _broadcast(r, env.n), env.n)
            mask = ~np.asarray(pc.fill_null(eq, False))
        env.flag(mask & live, "error", msg or f"assertion failed: {node.name}")
        return Val(pa.array(~mask))


# ------------------------------------------------------ arrow helpers

def _blend(mask: np.ndarray, new, old):
    new, old = _arr(new), _arr(old)
    if new.type != old.type:
        if old.type == pa.null():
            old = pa.nulls(len(new), new.type)
        elif new.type == pa.null():
            new = pa.nulls(len(old), old.type)
        else:
            try:
                old = pc.cast(old, new.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                try:
                    new = pc.cast(new, old.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    return _take_blend(mask, new, old)
    m = np.asarray(mask) if not isinstance(mask, np.ndarray) else mask
    try:
        return pc.if_else(pa.array(m), new, old)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
        # if_else lacks kernels for map/nested types → concat + take
        return _take_blend(m, new, old)


def _take_blend(mask, new: pa.Array, old: pa.Array) -> pa.Array:
    """Row-select without an if_else kernel: stack [new, old] and take
    per-row; falls back to python objects when even concat can't unify
    the two types."""
    m = np.asarray(mask)
    n = len(m)
    if new.type != old.type:
        # map-vs-struct (e.g. dynamic-key set! blended with a `{}`
        # literal): coerce the struct side to the map type so the
        # result STAYS a map — obj_array would union keys into a struct
        # with null-filled fields leaking across rows
        for a, b in ((new, old), (old, new)):
            if pa.types.is_map(a.type) and pa.types.is_struct(b.type):
                rows = [
                    None if r is None else list(r.items())
                    for r in b.to_pylist()
                ]
                try:
                    coerced = pa.array(rows, type=a.type)
                except (pa.ArrowInvalid, pa.ArrowTypeError,
                        pa.ArrowNotImplementedError):
                    break
                if b is old:
                    old = coerced
                else:
                    new = coerced
                break
    if new.type == old.type:
        combined = pa.concat_arrays([new, old])
        idx = np.where(m, np.arange(n), n + np.arange(n))
        return combined.take(pa.array(idx, type=pa.int64()))
    def _pylist(a: pa.Array):
        if pa.types.is_map(a.type):
            return [None if r is None else dict(r) for r in a.to_pylist()]
        return a.to_pylist()

    rows = [nv if take_new else ov
            for take_new, nv, ov in zip(m, _pylist(new), _pylist(old))]
    return _scalar.obj_array(rows)


def _read_path(env: _Env, path: Tuple[str, ...]):
    name = ".".join(path)
    if name in env.cols:
        return env.cols[name]
    # longest flat prefix, then struct/map descent
    for cut in range(len(path) - 1, 0, -1):
        prefix = ".".join(path[:cut])
        if prefix in env.cols:
            col = env.cols[prefix]
            for seg in path[cut:]:
                t = col.type
                if pa.types.is_struct(t):
                    col = pc.struct_field(col, seg)
                elif pa.types.is_map(t):
                    col = pc.map_lookup(col, pa.scalar(seg, t.key_type), "first")
                else:
                    return pa.nulls(env.n)
            return _arr(col)
    return pa.nulls(env.n)


def _to_bool_arr(v: Val, n: int):
    data = _broadcast(v, n)
    if not pa.types.is_boolean(data.type):
        try:
            data = pc.cast(data, pa.bool_())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            # non-boolean operand of a boolean op → falsy rows
            # (runtime error semantics, not a batch crash)
            return pa.array(np.zeros(n, dtype=bool))
    return pc.fill_null(data, False)


def _merge_err(*vals: Val):
    out = None
    for v in vals:
        if v.err is not None:
            out = v.err if out is None else (out | v.err)
    return out


def _merge_err_masks(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a | b


def _is_py_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _scalar_bin(op: str, l, r):
    if op == "+":
        if isinstance(l, str) or isinstance(r, str):
            return f"{l}{r}"
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        return l / r
    if op == "%":
        # truncated remainder (Rust/VRL/SQL %), not Python's floored:
        # -7 % 2 == -1
        import math

        out = math.fmod(l, r)
        if isinstance(l, int) and isinstance(r, int):
            return int(out)
        return out
    return {"==": l == r, "!=": l != r, "<": l < r,
            "<=": l <= r, ">": l > r, ">=": l >= r}[op]


def _is_str_type(t):
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _arrow_bin(op: str, l, r, n: int):
    la = isinstance(l, (pa.Array, pa.ChunkedArray))
    ra = isinstance(r, (pa.Array, pa.ChunkedArray))
    lt = _arr(l).type if la else None
    rt = _arr(r).type if ra else None
    if op == "+" and ((la and _is_str_type(lt)) or (ra and _is_str_type(rt))
                      or (not la and isinstance(l, str))
                      or (not ra and isinstance(r, str))):
        ls = _arr(l) if la else pa.array([str(l)] * n)
        rs = _arr(r) if ra else pa.array([str(r)] * n)
        if not _is_str_type(ls.type):
            ls = pc.cast(ls, pa.string())
        if not _is_str_type(rs.type):
            rs = pc.cast(rs, pa.string())
        return pc.binary_join_element_wise(ls, rs, "")
    if op in ("==", "!=", "<", "<=", ">", ">="):
        fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
        return fn(l, r)
    if op == "/":
        if la and pa.types.is_integer(lt):
            l = pc.cast(l, pa.float64())
        elif ra and pa.types.is_integer(rt):
            r = pc.cast(r, pa.float64())
        elif not la and isinstance(l, int):
            l = float(l)
        elif not ra and isinstance(r, int):
            r = float(r)
        return pc.divide(l, r)
    if op == "%":
        # truncated remainder (Rust/VRL/SQL %): q = trunc(l / r)
        q = pc.trunc(pc.divide(pc.cast(l, pa.float64()) if la else float(l), r))
        out = pc.subtract(l, pc.multiply(q, r))
        if la and pa.types.is_integer(lt) and (not ra or pa.types.is_integer(rt)) \
                and (ra or isinstance(r, int)):
            out = pc.cast(out, pa.int64())
        return out
    fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}[op]
    return fn(l, r)


def _bisect_call(name: str, first: pa.Array, rest: list, n: int,
                 exc: Exception, kwargs: dict = None):
    """A whole-column registry call raised: isolate the offending rows
    by bisection so good rows still evaluate vectorized — O(k log n)
    extra calls for k bad rows instead of a Python loop over all n."""
    if n == 0:
        raise exc
    out_chunks: List[pa.Array] = []
    err = np.zeros(n, dtype=bool)

    kwargs = kwargs or {}

    def _rest_slice(off, ln):
        return [rr.slice(off, ln) if isinstance(rr, (pa.Array, pa.ChunkedArray)) else rr
                for rr in rest]

    def _kw_slice(off, ln):
        return {k: (vv.slice(off, ln) if isinstance(vv, (pa.Array, pa.ChunkedArray)) else vv)
                for k, vv in kwargs.items()}

    def _go(off: int, ln: int):
        seg = first.slice(off, ln)
        try:
            out_chunks.append(_arr(_scalar.call(
                name, seg, *_rest_slice(off, ln), **_kw_slice(off, ln))))
            return
        except Exception:
            if ln == 1:
                out_chunks.append(pa.nulls(1))
                err[off] = True
                return
            half = ln // 2
            _go(off, half)
            _go(off + half, ln - half)

    _go(0, n)
    types = {c.type for c in out_chunks if c.type != pa.null()}
    if len(types) == 1:
        t = types.pop()
        out_chunks = [pc.cast(c, t) if c.type != t else c for c in out_chunks]
    elif len(types) > 1:
        # numeric chunks unify losslessly; anything else is a real
        # heterogeneous result — error like the map-values path instead
        # of silently stringifying typed values
        if all(
            pa.types.is_integer(t) or pa.types.is_floating(t) for t in types
        ):
            # all-integer stays integer (float64 would lose precision
            # past 2^53 and silently change the column's kind); uint64
            # values past 2^63 can't fit int64 — fall back to float64
            # rather than failing the whole batch
            tgt = (
                pa.int64()
                if all(pa.types.is_integer(t) for t in types)
                else pa.float64()
            )
            try:
                out_chunks = [pc.cast(c, tgt) for c in out_chunks]
            except pa.ArrowInvalid:
                out_chunks = [pc.cast(c, pa.float64()) for c in out_chunks]
        else:
            raise ValueError(
                f"VRL: {name}() produced per-row results of mixed Arrow "
                f"types ({sorted(str(t) for t in types)}) — heterogeneous "
                "values aren't representable in a columnar batch"
            )
    out = pa.concat_arrays(out_chunks)
    if _is_fallible(name):
        err = err | (~_validity(out))
    return out, (err if err.any() else None)


def compile_program(source: str) -> Program:
    return Program(source)


class VrlCondition:
    """Full-program VRL condition: compiled once, final expression is
    the verdict, errored rows are false (src/conditions/vrl.rs)."""

    def __init__(self, source: str):
        self.source = source
        self.program = Program(source)

    def __call__(self, batch: pa.Table):
        return self.program.eval_bool(batch)

    def mask(self, batch: pa.Table):
        m = self(batch)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return m

    def __repr__(self):
        return f"VrlCondition({self.source!r})"
