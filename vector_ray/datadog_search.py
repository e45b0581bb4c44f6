"""DatadogSearch condition dialect — the reference's second condition
language (src/conditions/datadog_search.rs; grammar from the public
Datadog log-search syntax).  Semantics follow the reference's
EventFilter resolution (datadog_search.rs:93-320) and are validated
against its full get_checks() matrix (tests/test_datadog_search.py +
the extraction harness in tools/).

Columnar model mapping:

- ``@attr:value``  → column ``attr``; unquoted dots descend struct
  columns (``@a.b`` = field b of struct column a); ``@"a.b"`` is the
  literal column name
- ``key:value``    → entry ``key:value`` in the ``ddtags``/``tags``
  columns (both are consulted, matching the reference's
  *_match_multiple helpers) — ``list<string>`` of "k:v" entries or a
  comma-joined string
- reserved fields (host, source, status, service, trace_id, message,
  timestamp) match their COLUMN only — never tags; ``source`` checks
  both ``source`` and ``ddsource``; literal ``tags:x`` is element
  equality
- bare ``keyword`` / ``keyw*rd`` → word-boundary match on ``message``
  (the reference's word_regex), NOT substring
- ``_exists_:f`` / ``_missing_:f`` → tag/attribute presence
- ``value*``ildcards anywhere; ``\\*`` is a literal star; ``\\X``
  escapes specials
- ``field:>N :>= :< :<=`` and ``field:[a TO b]`` / ``{a TO b}``
  (exclusive) ranges; numeric when the COLUMN is numeric and the bound
  parses, lexicographic otherwise (string values always compare
  lexicographically — datadog_search.rs compare: Bytes lhs coerces rhs
  to string); ``*`` bounds are open
- ``field:(v1 OR v2)`` value grouping
- ``NOT x`` / ``-x``; ``a AND b``, ``a OR b``, parentheses;
  juxtaposition is AND.  An OR whose BOTH sides are negations behaves
  as AND of the negations (Lucene prohibited-clause semantics, matched
  to the reference's checks: ``-a OR -b`` ≡ ``-a -b``)

Compiles to a vectorized callable ``table -> BooleanArray``; absent
columns behave as null (no match / _missing_ matches) instead of
raising — the reference's events are schemaless, our tables are not.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MESSAGE_COL = "message"
TAGS_COLS = ("ddtags", "tags")
RESERVED = {"host", "source", "sourcecategory", "status", "service",
            "trace_id", "message", "timestamp"}

_NUM_RX = re.compile(r"^-?\d+(\.\d+)?$")


# ------------------------------------------------------------ helpers

def _false(n: int) -> np.ndarray:
    return np.zeros(n, dtype=bool)


def _col(t: pa.Table, name: str):
    if name in t.column_names:
        c = t[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return None


def _as_bool(arr, n: int) -> np.ndarray:
    if arr is None:
        return _false(n)
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        return np.asarray(
            pc.fill_null(arr, False).to_numpy(zero_copy_only=False), dtype=bool
        )
    return np.asarray(arr, dtype=bool)


def _split_wildcards(value: str) -> List[str]:
    """Split on unescaped ``*`` and resolve ``\\X`` escapes in each
    literal segment.  len==1 means no wildcard."""
    segs, cur, i = [], [], 0
    while i < len(value):
        ch = value[i]
        if ch == "\\" and i + 1 < len(value):
            cur.append(value[i + 1])
            i += 2
            continue
        if ch == "*":
            segs.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    segs.append("".join(cur))
    return segs


def _unquote(s: str) -> Optional[str]:
    """Quoted string → literal content (escapes resolved); else None."""
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return re.sub(r"\\(.)", r"\1", s[1:-1])
    return None


def _word_regex(segs: Sequence[str]) -> str:
    """The reference's word_regex: word-boundary match, * spans any."""
    return r"(?s)\b" + "(?:.*?)".join(re.escape(s) for s in segs) + r"\b"


def _wildcard_regex(segs: Sequence[str]) -> str:
    """Full-value anchored wildcard match."""
    return r"(?s)^" + "(?:.*?)".join(re.escape(s) for s in segs) + "$"


def _entries(tags) -> pa.ListArray:
    """Normalize a tags column to list<string> entries."""
    if pa.types.is_string(tags.type) or pa.types.is_large_string(tags.type):
        return pc.split_pattern(pc.fill_null(tags.cast(pa.string()), ""), pattern=",")
    return tags


def _tag_rows_matching(tags, per_entry: Callable, n: int) -> np.ndarray:
    """Vectorized any-entry-matches over ONE tags column."""
    if tags is None:
        return _false(n)
    entries = _entries(tags)
    flat = pc.list_flatten(entries)
    hits = _as_bool(per_entry(flat), len(flat))
    lengths = pc.list_value_length(entries).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    out = _false(n)
    nonempty = lengths > 0
    if hits.size and nonempty.any():
        # reduceat over non-empty rows only: their start offsets are
        # strictly increasing and all < hits.size, so each segment sums
        # exactly one row's entries (a clamped index over empty trailing
        # rows would truncate the last non-empty row's segment).
        idx = starts[:-1][nonempty]
        out[nonempty] = np.add.reduceat(hits, idx) > 0
    return out


def _tags_any(t: pa.Table, per_entry: Callable, n: int) -> np.ndarray:
    """any-entry-matches over BOTH ddtags and tags (the reference's
    *_match_multiple helpers, datadog_search.rs:106-146)."""
    out = _false(n)
    for name in TAGS_COLS:
        out |= _tag_rows_matching(_col(t, name), per_entry, n)
    return out


# --------------------------------------------------------- field access

def _parse_attr_path(name: str) -> List[str]:
    """Unescaped dots split struct paths; ``\\.`` is a literal dot."""
    segs, cur, i = [], [], 0
    while i < len(name):
        ch = name[i]
        if ch == "\\" and i + 1 < len(name):
            cur.append(name[i + 1])
            i += 2
            continue
        if ch == ".":
            segs.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    segs.append("".join(cur))
    return segs


def _attr_accessor(name: str, quoted: bool) -> Callable:
    """table -> column (or None) for an @attribute, descending struct
    columns on unquoted dotted paths."""
    segs = [name] if quoted else _parse_attr_path(name)

    def _get(t: pa.Table):
        col = _col(t, segs[0])
        for seg in segs[1:]:
            if col is None or not pa.types.is_struct(col.type):
                return None
            if seg not in [f.name for f in col.type]:
                return None
            col = pc.struct_field(col, seg)
        return col

    return _get


# ------------------------------------------------------- value matching

def _value_pred(raw: str) -> Callable:
    """col -> bool array for an equals/wildcard value term."""
    lit = _unquote(raw)
    segs = [lit] if lit is not None else _split_wildcards(raw)
    if len(segs) == 1:
        v = segs[0]
        return lambda c: pc.equal(c.cast(pa.string()), v)
    rx = _wildcard_regex(segs)
    return lambda c: pc.match_substring_regex(c.cast(pa.string()), rx)


def _col_compare(col, op: str, bound: str, n: int) -> np.ndarray:
    """Comparison against one column: numeric when both the column and
    the bound are numeric, lexicographic string otherwise."""
    kernels = {">": pc.greater, ">=": pc.greater_equal,
               "<": pc.less, "<=": pc.less_equal}
    k = kernels[op]
    numeric_col = pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
    if numeric_col and _NUM_RX.match(bound):
        return _as_bool(k(pc.cast(col, pa.float64()), float(bound)), n)
    return _as_bool(k(col.cast(pa.string()), bound), n)


def _col_range(col, lo: str, hi: str, lo_inc: bool, hi_inc: bool, n: int) -> np.ndarray:
    out = _as_bool(col.is_valid(), n)
    if lo != "*":
        out &= _col_compare(col, ">=" if lo_inc else ">", lo, n)
    if hi != "*":
        out &= _col_compare(col, "<=" if hi_inc else "<", hi, n)
    return out


def _tag_value_pred(key: str, pred_on_value: Callable) -> Callable:
    """entry-array -> bool for entries whose key matches and whose
    VALUE part satisfies pred_on_value."""
    prefix = "^" + re.escape(key) + ":"

    def _entry(flat):
        is_key = pc.match_substring_regex(flat, prefix)
        value = pc.replace_substring_regex(flat, pattern=prefix, replacement="")
        return pc.and_(is_key, pc.fill_null(pred_on_value(value), False))

    return _entry


# ------------------------------------------------------------ tokenizer

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<term>(?:[^\s()\\]|\\[\s\S])+)
    )""",
    re.VERBOSE,
)

_GROUP_RX = re.compile(
    r"(?P<f>-?@?(?:\"(?:[^\"\\]|\\.)*\"|[^\s():\\\"]|\\.)+):"
    r"\(\s*(?P<body>[^()]*?)\s*\)",
    re.DOTALL,
)


def _expand_value_groups(q: str) -> str:
    """``field:(v1 OR v2)`` → ``(field:v1 OR field:v2)``."""

    def _sub(m):
        f = m.group("f")
        vals = [v for v in re.split(r"\s+", m.group("body")) if v not in ("OR", "AND", "")]
        joined = " OR ".join(f"{f}:{v}" for v in vals)
        return "(" + joined + ")"

    return _GROUP_RX.sub(_sub, q)


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
        else:
            out.append(m.group("term"))
    return out


# -------------------------------------------------------------- parser

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
            # Lucene prohibited-clause semantics: an OR of two pure
            # negations is the conjunction of the negations (reference
            # check: "-@field:value1 OR -@field:value2")
            if left[0] == "not" and right[0] == "not":
                left = ("and", left, right)
            else:
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
        # range syntax re-joins: "field:[a TO b]" tokenizes as several
        # terms when the brackets contain spaces — re-assemble
        if re.search(r"[\[{]", t) and not re.search(r"[\]}]$", t):
            parts = [t]
            while self.peek() and not re.search(r"[\]}]$", parts[-1]):
                parts.append(self.next())
            t = " ".join(parts)
        return ("term", t)


# ------------------------------------------------------- term compiler

def _split_field(term: str) -> Optional[Tuple[str, bool, str]]:
    """Split ``field:rest`` at the first unescaped, unquoted colon.
    Returns (field, field_quoted, rest) or None for bare keywords."""
    i = 0
    attr = term.startswith("@")
    if attr:
        i = 1
    # quoted field names: "name" or the grammar's escaped form \"name\"
    for q in ('"', '\\"'):
        if term.startswith(q, i):
            st = i + len(q)
            j = term.find(q, st)
            if j >= 0 and term[j + len(q): j + len(q) + 1] == ":":
                name = re.sub(r"\\(.)", r"\1", term[st:j])
                return ("@" + name if attr else name), True, term[j + len(q) + 1:]
            return None
    while i < len(term):
        ch = term[i]
        if ch == "\\":
            i += 2
            continue
        if ch == ":":
            if i == 0:
                return None
            return term[:i], False, term[i + 1:]
        i += 1
    return None


_RANGE_RX = re.compile(r"^(\[|\{)(.*?) TO (.*?)(\]|\})$")
_CMP_RX = re.compile(r"^(>=|<=|>|<)(.+)$")


def _build_term(term: str) -> Callable:
    """Compile one term to table -> bool numpy array."""
    m = re.match(r"^(_exists_|_missing_):(.+)$", term)
    if m:
        op, field = m.group(1), m.group(2)
        want_exists = op == "_exists_"

        def _presence(t: pa.Table) -> np.ndarray:
            n = t.num_rows
            if field.startswith("@"):
                get = _attr_accessor(field[1:], quoted=False)
                col = get(t)
                present = _as_bool(col.is_valid(), n) if col is not None else _false(n)
            elif field == "source":
                present = _false(n)
                for name in ("ddsource", "source"):
                    col = _col(t, name)
                    if col is not None:
                        present |= _as_bool(col.is_valid(), n)
            elif field in RESERVED:
                col = _col(t, field)
                present = _as_bool(col.is_valid(), n) if col is not None else _false(n)
            else:
                rx = "^" + re.escape(field) + "(:|$)"
                present = _tags_any(
                    t, lambda flat: pc.match_substring_regex(flat, rx), n)
            return present if want_exists else ~present

        return _presence

    split = _split_field(term)
    if split is None:
        # bare keyword (optionally quoted / wildcarded / a range) on the
        # default field: word-boundary semantics (reference word_regex)
        rm = _RANGE_RX.match(term)
        if rm:
            lo, hi = rm.group(2).strip(), rm.group(3).strip()
            lo = _unquote(lo) or lo
            hi = _unquote(hi) or hi
            lo_inc, hi_inc = rm.group(1) == "[", rm.group(4) == "]"

            def _default_range(t: pa.Table) -> np.ndarray:
                col = _col(t, MESSAGE_COL)
                if col is None:
                    return _false(t.num_rows)
                return _col_range(col, lo, hi, lo_inc, hi_inc, t.num_rows)

            return _default_range

        lit = _unquote(term)
        segs = [lit] if lit is not None else _split_wildcards(term)
        rx = _word_regex(segs)

        def _keyword(t: pa.Table) -> np.ndarray:
            col = _col(t, MESSAGE_COL)
            if col is None:
                return _false(t.num_rows)
            return _as_bool(
                pc.match_substring_regex(col.cast(pa.string()), rx), t.num_rows)

        return _keyword

    field, fquoted, rest = split
    attr = field.startswith("@")
    name = field[1:] if attr else field

    cm = _CMP_RX.match(rest)
    rm = _RANGE_RX.match(rest)
    if rm:
        lo, hi = rm.group(2).strip(), rm.group(3).strip()
        lo = _unquote(lo) or lo
        hi = _unquote(hi) or hi
        lo_inc, hi_inc = rm.group(1) == "[", rm.group(4) == "]"
        col_fn = lambda c, n: _col_range(c, lo, hi, lo_inc, hi_inc, n)  # noqa: E731

        def _str_pred(values):  # for tag VALUE parts (always strings)
            out = pc.is_valid(values)
            if lo != "*":
                out = pc.and_(out, (pc.greater_equal if lo_inc else pc.greater)(values, lo))
            if hi != "*":
                out = pc.and_(out, (pc.less_equal if hi_inc else pc.less)(values, hi))
            return out

        tag_entry = _tag_value_pred(name, _str_pred) if lo != "*" or hi != "*" else None
        if tag_entry is None:
            # a:[* TO *] — key presence
            rx_ = "^" + re.escape(name) + ":"
            tag_entry = lambda flat: pc.match_substring_regex(flat, rx_)  # noqa: E731
    elif cm:
        op, bound = cm.group(1), _unquote(cm.group(2)) or cm.group(2)
        col_fn = lambda c, n: _col_compare(c, op, bound, n)  # noqa: E731
        kern = {">": pc.greater, ">=": pc.greater_equal,
                "<": pc.less, "<=": pc.less_equal}[op]
        tag_entry = _tag_value_pred(name, lambda v: kern(v, bound))
    else:
        pred = _value_pred(rest)
        col_fn = lambda c, n: _as_bool(pred(c), n)  # noqa: E731
        lit = _unquote(rest)
        segs = [lit] if lit is not None else _split_wildcards(rest)
        if len(segs) == 1:
            target = f"{name}:{segs[0]}"
            tag_entry = lambda flat: pc.equal(flat, target)  # noqa: E731
        else:
            # wildcard matches the whole "key:value" entry (reference
            # wildcard_regex(&format!("{tag}:{wildcard}")))
            full = [name + ":" + segs[0]] + list(segs[1:])
            rx_ = _wildcard_regex(full)
            tag_entry = lambda flat: pc.match_substring_regex(flat, rx_)  # noqa: E731

    def _match(t: pa.Table) -> np.ndarray:
        n = t.num_rows
        if attr:
            col = _attr_accessor(name, fquoted)(t)
            return col_fn(col, n) if col is not None else _false(n)
        if name == "tags" and not fquoted:
            # literal tags element equality (datadog_search.rs:135-141)
            pred_ = _value_pred(rest)
            return _tags_any(t, lambda flat: pred_(flat), n)
        if name == "source" and not fquoted:
            out = _false(n)
            for cn in ("ddsource", "source"):
                col = _col(t, cn)
                if col is not None:
                    out |= col_fn(col, n)
            return out
        if name in RESERVED and not fquoted:
            col = _col(t, name)
            return col_fn(col, n) if col is not None else _false(n)
        return _tags_any(t, tag_entry, n)

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
    query = _expand_value_groups(query)
    fn = _build(_Parser(_tokenize(query)).parse())

    def _cond(t: pa.Table) -> pa.Array:
        return pa.array(np.asarray(fn(t), dtype=bool))

    return _cond
