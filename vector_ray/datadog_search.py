"""DatadogSearch condition dialect — the reference's second condition
language (src/conditions/datadog_search.rs; grammar from the public
Datadog log-search syntax).

Columnar model mapping:

- ``@attr:value``      → column ``attr`` (facet/attribute search)
- ``key:value``        → entry ``key:value`` in the ``tags`` column —
  a ``list<string>`` of "k:v" entries or a comma-joined string; if no
  tags column exists but a COLUMN named ``key`` does, the column is
  used (documented columnar convenience)
- ``keyword``          → substring of the ``message`` column
- ``_exists_:f`` / ``_missing_:f`` → tag/attribute presence
- ``value*``, ``*value*``          → wildcard (translated to RE2)
- ``field:>N  :>=  :<  :<=``       → numeric comparison
- ``field:[a TO b]``               → inclusive range (numeric when both
  bounds parse as numbers, lexicographic otherwise)
- ``NOT x`` / ``-x``, ``a AND b``, ``a OR b``, parentheses;
  juxtaposition is AND (Datadog default operator)

Compiles to a vectorized callable ``table -> BooleanArray``; absent
columns behave as null (no match / _missing_ matches) instead of
raising — the reference's events are schemaless, our tables are not.
"""

from __future__ import annotations

import re
from typing import Callable, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MESSAGE_COL = "message"
TAGS_COL = "tags"

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<term>[^\s()]+)
    )""",
    re.VERBOSE,
)


def _tokenize(q: str) -> List[str]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RX.match(q, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if m.group("lparen"):
            out.append("(")
        elif m.group("rparen"):
            out.append(")")
        elif m.group("quoted") is not None:
            out.append(m.group("quoted"))
        else:
            out.append(m.group("term"))
    return out


def _false(n: int) -> pa.Array:
    return pa.array(np.zeros(n, dtype=bool))


def _col(t: pa.Table, name: str):
    if name in t.column_names:
        c = t[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return None


def _as_bool(arr, n: int) -> np.ndarray:
    if arr is None:
        return np.zeros(n, dtype=bool)
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        return np.asarray(
            pc.fill_null(arr, False).to_numpy(zero_copy_only=False), dtype=bool
        )
    return np.asarray(arr, dtype=bool)


def _wildcard_to_regex(v: str) -> str:
    parts = [re.escape(p) for p in v.split("*")]
    return "^" + ".*".join(parts) + "$"


def _string_pred(value: str) -> Callable:
    """Build col -> bool-array for an equals/wildcard value."""
    if value.startswith('"') and value.endswith('"') and len(value) >= 2:
        value = value[1:-1].replace('\\"', '"')
    if "*" in value:
        rx = _wildcard_to_regex(value)
        return lambda c: pc.match_substring_regex(c.cast(pa.string()), rx)
    return lambda c: pc.equal(c.cast(pa.string()), value)


_NUM_RX = re.compile(r"^-?\d+(\.\d+)?$")


def _compare_pred(op: str, rhs: str) -> Callable:
    kernels = {">": pc.greater, ">=": pc.greater_equal,
               "<": pc.less, "<=": pc.less_equal}
    k = kernels[op]
    if _NUM_RX.match(rhs):
        num = float(rhs)
        return lambda c: k(c.cast(pa.float64()), num)
    return lambda c: k(c.cast(pa.string()), rhs)


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return s[1:-1].replace('\\"', '"')
    return s


def _range_pred(lo: str, hi: str) -> Callable:
    lo, hi = _unquote(lo), _unquote(hi)
    if _NUM_RX.match(lo) and _NUM_RX.match(hi):
        flo, fhi = float(lo), float(hi)
        return lambda c: pc.and_(
            pc.greater_equal(c.cast(pa.float64()), flo),
            pc.less_equal(c.cast(pa.float64()), fhi),
        )
    return lambda c: pc.and_(
        pc.greater_equal(c.cast(pa.string()), lo),
        pc.less_equal(c.cast(pa.string()), hi),
    )


def _tag_rows_matching(tags, per_entry: Callable, n: int) -> np.ndarray:
    """Vectorized any-entry-matches over a tags column (list<string>
    or comma-joined string)."""
    if tags is None:
        return np.zeros(n, dtype=bool)
    if pa.types.is_string(tags.type):
        entries = pc.split_pattern(pc.fill_null(tags, ""), pattern=",")
    else:
        entries = tags
    flat = pc.list_flatten(entries)
    hits = _as_bool(per_entry(flat), len(flat))
    lengths = pc.list_value_length(entries).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    out = np.zeros(n, dtype=bool)
    nonempty = lengths > 0
    if hits.size:
        # clamp: reduceat requires indices < len; empty rows are masked
        # out below (a clamped index would read a neighbour's sum)
        idx = np.minimum(starts[:-1], hits.size - 1)
        agg = np.add.reduceat(hits, idx)
        out[nonempty] = agg[nonempty] > 0
    return out


class _Parser:
    def __init__(self, tokens: List[str]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"unexpected token {self.peek()!r}")
        return node

    def or_expr(self):
        left = self.and_expr()
        while self.peek() == "OR":
            self.next()
            right = self.and_expr()
            left = ("or", left, right)
        return left

    def and_expr(self):
        left = self.unary()
        while True:
            t = self.peek()
            if t is None or t in (")", "OR"):
                return left
            if t == "AND":
                self.next()
                t = self.peek()
            right = self.unary()
            left = ("and", left, right)

    def unary(self):
        t = self.peek()
        if t == "NOT":
            self.next()
            return ("not", self.unary())
        if t is not None and t.startswith("-") and len(t) > 1 and not _NUM_RX.match(t):
            self.toks[self.i] = t[1:]
            return ("not", self.unary())
        return self.primary()

    def primary(self):
        t = self.next()
        if t == "(":
            node = self.or_expr()
            if self.next() != ")":
                raise ValueError("unbalanced parenthesis")
            return node
        if t is None:
            raise ValueError("unexpected end of query")
        # range syntax re-joins: field:[a TO b] tokenizes as one term
        # unless the brackets contain spaces — re-assemble
        if ":[" in t and not t.endswith("]"):
            parts = [t]
            while parts[-1] != "]" and not parts[-1].endswith("]") and self.peek():
                parts.append(self.next())
            t = " ".join(parts)
        return ("term", t)


def _build_term(term: str) -> Callable:
    """Compile one term to table -> bool numpy array."""
    m = re.match(r"^(_exists_|_missing_):(.+)$", term)
    if m:
        op, field = m.group(1), m.group(2)
        want_exists = op == "_exists_"

        def _presence(t: pa.Table) -> np.ndarray:
            n = t.num_rows
            if field.startswith("@"):
                col = _col(t, field[1:])
                present = (np.asarray(col.is_valid().to_numpy(zero_copy_only=False),
                                      dtype=bool) if col is not None
                           else np.zeros(n, dtype=bool))
            else:
                rx = "^" + re.escape(field) + "(:|$)"
                present = _tag_rows_matching(
                    _col(t, TAGS_COL),
                    lambda flat: pc.match_substring_regex(flat, rx), n)
            return present if want_exists else ~present

        return _presence

    cm = re.match(r"^(@?[\w.\-]+):(>=|<=|>|<)(.+)$", term)
    if cm:
        field, op, rhs = cm.group(1), cm.group(2), cm.group(3)
        pred = _compare_pred(op, rhs)
        return _field_matcher(field, pred)

    rm = re.match(r"^(@?[\w.\-]+):\[(.+) TO (.+)\]$", term)
    if rm:
        return _field_matcher(
            rm.group(1),
            _range_pred(rm.group(2).strip(), rm.group(3).strip()),
        )

    fm = re.match(r"^(@?[\w.\-]+):(.+)$", term)
    if fm:
        field, value = fm.group(1), fm.group(2)
        return _field_matcher(field, _string_pred(value), raw_value=value)

    # bare keyword → substring of the message column
    kw = term[1:-1].replace('\\"', '"') if term.startswith('"') else term

    def _keyword(t: pa.Table) -> np.ndarray:
        col = _col(t, MESSAGE_COL)
        if col is None:
            return np.zeros(t.num_rows, dtype=bool)
        return _as_bool(pc.match_substring(col.cast(pa.string()), kw), t.num_rows)

    return _keyword


# the Datadog reserved attributes: ``field:value`` on these searches
# the event FIELD (and tags); any other bare field searches tags only
# (datadog_search.rs equals/prefix/wildcard dispatch on Field kind)
RESERVED = {"host", "source", "sourcecategory", "service", "status",
            "trace_id", "message"}


def _field_matcher(field: str, pred: Callable, raw_value: str = None) -> Callable:
    attr = field.startswith("@")
    name = field[1:] if attr else field

    def _tag_match(t: pa.Table, n: int) -> np.ndarray:
        tags = _col(t, TAGS_COL)
        if tags is None:
            return np.zeros(n, dtype=bool)
        if raw_value is not None and "*" not in raw_value:
            rv = raw_value
            if rv.startswith('"') and rv.endswith('"') and len(rv) >= 2:
                rv = rv[1:-1].replace('\\"', '"')
            target = f"{name}:{rv}"
            return _tag_rows_matching(tags, lambda flat: pc.equal(flat, target), n)
        # wildcard / comparison / range against the tag VALUE part
        prefix = "^" + re.escape(name) + ":"

        def _entry(flat):
            is_key = pc.match_substring_regex(flat, prefix)
            value = pc.replace_substring_regex(flat, pattern=prefix, replacement="")
            return pc.and_(is_key, pc.fill_null(pred(value), False))

        return _tag_rows_matching(tags, _entry, n)

    def _match(t: pa.Table) -> np.ndarray:
        n = t.num_rows
        if attr:
            col = _col(t, name)
            return _as_bool(pred(col), n) if col is not None else np.zeros(n, dtype=bool)
        if name in RESERVED:
            col = _col(t, name)
            field_hit = (_as_bool(pred(col), n) if col is not None
                         else np.zeros(n, dtype=bool))
            return field_hit | _tag_match(t, n)
        return _tag_match(t, n)

    return _match


def _build(node) -> Callable:
    kind = node[0]
    if kind == "term":
        return _build_term(node[1])
    if kind == "not":
        inner = _build(node[1])
        return lambda t: ~inner(t)
    if kind == "and":
        l, r = _build(node[1]), _build(node[2])
        return lambda t: l(t) & r(t)
    if kind == "or":
        l, r = _build(node[1]), _build(node[2])
        return lambda t: l(t) | r(t)
    raise ValueError(f"bad node {node!r}")


def compile_datadog_search(query: str) -> Callable:
    """Compile a Datadog search query → callable(pa.Table) -> BooleanArray."""
    query = query.strip()
    if not query or query == "*":
        return lambda t: pa.array(np.ones(t.num_rows, dtype=bool))
    fn = _build(_Parser(_tokenize(query)).parse())

    def _cond(t: pa.Table) -> pa.Array:
        return pa.array(np.asarray(fn(t), dtype=bool))

    return _cond
