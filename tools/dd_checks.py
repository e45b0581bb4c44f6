"""Extract (query, pass_event, fail_event) triples from the reference's
datadog_search.rs get_checks() matrix and run them against our compiler.

Like tools/cue_sweep.py this treats the reference's public test VECTORS
as fixtures — the matcher implementation is ours
(vector_ray/datadog_search.py).  ``run_checks()`` returns
(ok_count, failures); the CLI prints each failure.
"""
import os
import re
import sys

if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

from vector_ray.datadog_search import compile_datadog_search

DD_SRC = os.environ.get(
    "VECTOR_RAY_DD_SRC", "/root/reference/src/conditions/datadog_search.rs")


class _P:
    """Tiny recursive-descent reader for the Rust test-vector literals."""

    def __init__(self, s):
        self.s, self.i = s, 0

    def ws(self):
        while self.i < len(self.s):
            if self.s[self.i] in " \t\r\n,":
                self.i += 1
            elif self.s.startswith("//", self.i):
                j = self.s.find("\n", self.i)
                self.i = len(self.s) if j < 0 else j
            else:
                break

    def peek(self):
        self.ws()
        return self.s[self.i] if self.i < len(self.s) else None

    def string(self):
        # "..." or r#"..."#
        self.ws()
        s = self.s
        if s.startswith('r#"', self.i):
            j = s.index('"#', self.i + 3)
            v = s[self.i + 3:j]
            self.i = j + 2
            return v
        assert s[self.i] == '"', s[self.i:self.i + 30]
        j = self.i + 1
        out = []
        while s[j] != '"':
            if s[j] == "\\":
                out.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(s[j + 1], s[j + 1]))
                j += 2
            else:
                out.append(s[j])
                j += 1
        self.i = j + 1
        return "".join(out)

    def value(self):
        self.ws()
        s = self.s
        if s.startswith('r#"', self.i) or s[self.i] == '"':
            return self.string()
        if s.startswith("vec![", self.i):
            self.i += 5
            arr = []
            while self.peek() != "]":
                arr.append(self.value())
            self.i += 1
            return arr
        if s.startswith("serde_json::json!(", self.i):
            import json
            self.i += len("serde_json::json!(")
            depth, j = 1, self.i
            while depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            raw = s[self.i:j - 1]
            self.i = j
            return json.loads(raw)
        m = re.match(r"-?\d+\.\d+", s[self.i:])
        if m:
            self.i += m.end()
            return float(m.group(0))
        m = re.match(r"-?\d+", s[self.i:])
        if m:
            self.i += m.end()
            return int(m.group(0))
        for lit, v in (("true", True), ("false", False)):
            if s.startswith(lit, self.i):
                self.i += len(lit)
                return v
        raise ValueError(f"value at {s[self.i:self.i+40]!r}")

    def log_event(self):
        self.ws()
        s = self.s
        if s.startswith("Event::Log(LogEvent::from(Value::from(", self.i):
            # Event::Log(LogEvent::from(Value::from(serde_json::json!({...}))))
            self.i += len("Event::Log(LogEvent::from(Value::from(")
            v = self.value()  # the serde_json::json! value
            for _ in range(3):  # close Log( From( From(
                self.ws()
                assert self.s[self.i] == ")"
                self.i += 1
            return v
        assert s.startswith("log_event!", self.i), s[self.i:self.i + 30]
        self.i += len("log_event!")
        close = {"[": "]", "(": ")"}[s[self.i]]
        self.i += 1
        fields = {}
        while self.peek() != close:
            k = self.string()
            self.ws()
            assert s.startswith("=>", self.i)
            self.i += 2
            fields[k] = self.value()
        self.i += 1
        return fields

    def triple(self):
        self.ws()
        if self.peek() != "(":
            return None
        self.i += 1
        q = self.string()
        ev_pass = self.log_event()
        ev_fail = self.log_event()
        self.ws()
        assert self.s[self.i] == ")", self.s[self.i:self.i + 30]
        self.i += 1
        return q, ev_pass, ev_fail


def extract_checks():
    src = open(DD_SRC).read()
    body = src[src.index("fn get_checks()"):]
    body = body[body.index("vec![") + 5:]
    # cut at the closing of the vec – the fn ends with "]\n    }"
    body = body[:body.index("\n    }")]
    p = _P(body)
    checks = []
    while True:
        t = p.triple()
        if t is None:
            break
        checks.append(t)
    return checks


def event_table(fields: dict) -> pa.Table:
    cols = {"__row": pa.array([0])}
    for k, v in fields.items():
        cols[k] = pa.array([v])
    return pa.table(cols)


def run_checks(only=None):
    checks = extract_checks()
    ok, bad = 0, []
    for q, ev_pass, ev_fail in checks:
        if only and not any(o in q for o in only):
            continue
        try:
            cond = compile_datadog_search(q)
            got_pass = cond(event_table(ev_pass)).to_pylist()[0]
            got_fail = cond(event_table(ev_fail)).to_pylist()[0]
        except Exception as e:
            bad.append((q, ev_pass, ev_fail, f"ERROR {type(e).__name__}: {str(e)[:80]}"))
            continue
        if got_pass is True and got_fail is False:
            ok += 1
        else:
            bad.append((q, ev_pass, ev_fail, f"pass={got_pass} fail={got_fail}"))
    return ok, bad


if __name__ == "__main__":
    ok, bad = run_checks(only=sys.argv[1:] or None)
    print(f"OK {ok} / {ok + len(bad)}")
    for q, ep, ef, why in bad:
        print(f"  {q!r:50s} {why}  pass_ev={ep} fail_ev={ef}")
