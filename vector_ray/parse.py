"""Grok / regex parse kernels over zero-copy Arrow string columns.

The analog of Vector's ``remap`` parse functions ``parse_grok`` /
``parse_regex`` / ``parse_apache_log`` (reference VRL stdlib,
website/cue/reference/remap/functions/parse_grok.cue etc.).  Grok
patterns compile ONCE to a named-group regex; per batch we run
``pyarrow.compute.extract_regex`` (RE2 under the hood) over the string
column — no Python per row — and unpack the resulting StructArray into
typed columns.

Rows that fail to parse get nulls in every extracted column plus
``__error = True`` so the caller can split them to a ``dropped``
dataset — the remap error-routing semantics (reference
src/transforms/remap.rs:564-646, DROPPED port remap.rs:46).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# A useful subset of the standard grok pattern library (the public
# logstash/grok base patterns, reproduced from their well-known
# definitions — these are conventional regex idioms, not reference code).
GROK_PATTERNS: Dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)*\b",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|\b[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)*\b)",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?i:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?)",
    "QS": r"\"(?:[^\"\\]|\\.)*\"",
    "QUOTEDSTRING": r"\"(?:[^\"\\]|\\.)*\"",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    # additional well-known public patterns (logstash grok library shapes)
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHDAY": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "TIME": r"\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "SYSLOGTIMESTAMP": r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) +\d{1,2} \d{2}:\d{2}:\d{2}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]\d{2}:?\d{2})",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "MAC": r"(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}",
    "UNIXPATH": r"(?:/[\w.%+-]+)+/?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_&-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]-]*",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
    "NONNEGINT": r"\d+",
    "SPACE": r"\s*",
    "NOTDQUOTE": r"[^\"]*",
}

URL_REGEX = (
    r"(?P<scheme>[a-z][a-z0-9+.-]*)://(?:(?P<username>[^:@/]+)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<host>[^:/?#]+)(?::(?P<port>\d+))?(?P<path>/[^?#]*)?"
    r"(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?"
)


_KNOWN_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}


def _idna_host(h):
    """Punycode-encode non-ASCII hostnames (parse_url.cue: IDN hosts
    return their xn-- form; case folds first)."""
    if h is None or h.isascii():
        return h
    try:
        return h.lower().encode("idna").decode("ascii")
    except UnicodeError:
        return h


def parse_url(col, *, default_known_ports: bool = False, drop_failed: bool = False):
    """parse_url VRL-function analog: URL column → struct of components
    (scheme/username/password/host/port/path/query/fragment) + error
    mask (parse_url.cue).  Vectorized extract_regex; port casts to int;
    absent path is "/"; ``default_known_ports`` fills 80/443/21 per
    scheme; non-ASCII hosts are punycode-encoded; query decodes to a
    key→value map."""
    parser = RegexParser(URL_REGEX, types={"port": pa.int64()})
    cols, err = parser.parse(col)
    cols["path"] = pc.if_else(
        pc.equal(pc.fill_null(cols["path"], ""), ""), "/", cols["path"]
    )
    for k in ("username", "password"):
        cols[k] = pc.fill_null(cols[k], "")
    # absent fragment is null (not the extract_regex "" convention)
    cols["fragment"] = pc.if_else(
        pc.equal(pc.fill_null(cols["fragment"], ""), ""),
        pa.scalar(None, type=pa.string()), cols["fragment"],
    )
    host = cols["host"]
    ascii_only = pc.all(
        pc.invert(pc.match_substring_regex(pc.fill_null(host, ""), "[^\\x00-\\x7f]"))
    ).as_py()
    if not ascii_only:
        cols["host"] = pa.array(
            [_idna_host(h) for h in host.to_pylist()], type=pa.string()
        )
    if default_known_ports:
        scheme = cols["scheme"].to_pylist()
        port = cols["port"].to_pylist()
        cols["port"] = pa.array(
            [p if p is not None else _KNOWN_PORTS.get(s) for s, p in zip(scheme, port)],
            type=pa.int64(),
        )
    from urllib.parse import parse_qsl

    qmaps = [
        {} if q in (None, "") else dict(parse_qsl(q, keep_blank_values=True))
        for q in cols["query"].to_pylist()
    ]
    cols["query"] = pa.array(qmaps, type=pa.map_(pa.string(), pa.string()))
    return cols, err


_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

_TYPE_MAP = {
    "int": pa.int64(),
    "long": pa.int64(),
    "float": pa.float64(),
    "double": pa.float64(),
}


def grok_to_regex(pattern: str, extra_patterns: Optional[Dict[str, str]] = None):
    """Compile a grok pattern to (regex_string, {group_name: arrow_type}).

    ``%{SYNTAX:name:type}`` → named group ``(?P<name>...)`` with a cast
    to ``type`` (int/float) after extraction.
    """
    library = dict(GROK_PATTERNS)
    if extra_patterns:
        library.update(extra_patterns)
    types: Dict[str, pa.DataType] = {}

    def sub(m: re.Match) -> str:
        syntax, name, typ = m.group(1), m.group(2), m.group(3)
        if syntax not in library:
            raise ValueError(f"unknown grok pattern %{{{syntax}}}")
        body = _GROK_REF.sub(sub, library[syntax])  # nested references
        if name is None:
            return f"(?:{body})"
        if typ is not None:
            types[name] = _TYPE_MAP.get(typ, pa.string())
        return f"(?P<{name}>{body})"

    regex = _GROK_REF.sub(sub, pattern)
    return regex, types


class RegexParser:
    """Compiled named-group regex parser applied per Arrow batch.

    parse(batch_column) -> (struct_of_extracted, error_mask)
    """

    def __init__(self, regex: str, types: Optional[Dict[str, pa.DataType]] = None):
        self.regex = regex
        self.types = types or {}
        # validate eagerly (extract_regex errors are late otherwise)
        self._py = re.compile(regex)
        if not self._py.groupindex:
            raise ValueError("regex needs at least one named group")
        self.group_names = list(self._py.groupindex)

    def parse(self, col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        extracted = pc.extract_regex(col, pattern=self.regex)
        err = pc.is_null(extracted)
        cols = {}
        for name in self.group_names:
            field = pc.struct_field(extracted, name)
            want = self.types.get(name)
            if want is not None and want != pa.string():
                # optional (non-participating) groups extract as "" — null
                # them before a numeric cast
                field = pc.if_else(
                    pc.equal(pc.fill_null(field, ""), ""),
                    pa.scalar(None, type=pa.string()),
                    field,
                ).cast(want)
            cols[name] = field
        return cols, err

    def apply(self, batch: pa.Table, field: str, drop_failed: bool = False) -> pa.Table:
        """Append extracted columns (+ ``__error``) to the batch."""
        cols, err = self.parse(batch[field])
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        if drop_failed:
            return batch.filter(pc.invert(err))
        return batch.append_column("__error", err)


class GrokParser(RegexParser):
    def __init__(self, pattern: str, extra_patterns: Optional[Dict[str, str]] = None):
        regex, types = grok_to_regex(pattern, extra_patterns)
        super().__init__(regex, types)


# ----------------------------------------------------------------------
# Deterministic message rendering for the token table (flagship input).
# Mirrors Vector's demo_logs apache_common format generation (reference
# src/sources/demo_logs.rs:106-141) so the parse stage does real work
# that an oracle can recompute from (doc_id, source, n_tok, tokens).

ACCESS_GROK = (
    '%{NOTSPACE:client_id} %{WORD:src} - \\[%{POSINT:epoch:int}\\] '
    '"%{WORD:method} /seq/%{NOTSPACE:path_id} HTTP/1.1" '
    '%{POSINT:status:int} %{POSINT:bytes:int} first=%{INT:first_tok:int} last=%{INT:last_tok:int}'
)


def status_for(i: np.ndarray) -> np.ndarray:
    """Deterministic status code per row index: 70% 200, 20% 404, 10% 500."""
    m = i % 10
    return np.where(m < 7, 200, np.where(m < 9, 404, 500)).astype(np.int64)


def render_messages(batch: pa.Table) -> pa.Table:
    """Append a ``message`` column rendered from the token-table row.

    Vectorized with pyarrow binary_join_element_wise — zero Python per
    row.  status/epoch derive from the numeric doc index (the trailing
    digits of doc_id).
    """
    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    idx = pc.utf8_slice_codeunits(doc_id, 4).cast(pa.int64())
    i = idx.to_numpy()
    status = pa.array(status_for(i)).cast(pa.string())
    epoch = pa.array(1_700_000_000 + (i % 86_400)).cast(pa.string())
    toks = batch["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    first = pc.list_element(toks, 0).cast(pa.string())
    n = batch["n_tok"]
    if isinstance(n, pa.ChunkedArray):
        n = n.combine_chunks()
    last_idx = pc.subtract(n, 1)
    flat = pc.list_flatten(toks)
    offsets = toks.offsets
    abs_idx = pc.add(offsets.slice(0, len(toks)).cast(pa.int64()), last_idx.cast(pa.int64()))
    last = flat.take(abs_idx).cast(pa.string())
    method = pc.if_else(pc.equal(pa.array((i % 2).astype(np.int64)), 0), "GET", "POST")
    msg = pc.binary_join_element_wise(
        doc_id,
        " ",
        batch["source"].combine_chunks() if isinstance(batch["source"], pa.ChunkedArray) else batch["source"],
        " - [",
        epoch,
        '] "',
        method,
        " /seq/",
        doc_id,
        ' HTTP/1.1" ',
        status,
        " ",
        n.cast(pa.string()),
        " first=",
        first,
        " last=",
        last,
        "",
    )
    return batch.append_column("message", msg)


# ----------------------------------------------------------------------
# Named access-log parsers — VRL parse_apache_log / parse_nginx_log
# analogs (website/cue/reference/remap/functions/parse_apache_log.cue,
# parse_nginx_log.cue semantics), built on the grok library above so
# the extraction stays one vectorized extract_regex per batch.

APACHE_COMMON_GROK = (
    "%{IPORHOST:host} %{NOTSPACE:identity} %{NOTSPACE:user} "
    "\\[%{HTTPDATE:timestamp}\\] "
    '"(?P<message>%{WORD:method} %{NOTSPACE:path} %{NOTSPACE:protocol})" '
    "%{POSINT:status:int} %{NOTSPACE:size}"
)

APACHE_COMBINED_GROK = (
    APACHE_COMMON_GROK + ' "%{DATA:referrer}" "%{DATA:agent}"'
)

APACHE_ERROR_GROK = (
    "\\[%{HTTPDATE:timestamp}\\] "
    "\\[(?:%{WORD:module}:)?%{WORD:severity}\\] "
    "\\[pid %{POSINT:pid:int}(?::tid %{POSINT:thread})?\\]"
    "(?: \\[client %{IPORHOST:client}(?::%{POSINT:port:int})?\\])? "
    "%{GREEDYDATA:message}"
)

NGINX_COMBINED_GROK = (
    "%{IPORHOST:client} %{NOTSPACE:ident} %{NOTSPACE:user} "
    "\\[%{HTTPDATE:timestamp}\\] "
    '"%{WORD:method} %{NOTSPACE:path} HTTP/%{NUMBER:protocol}" '
    '%{POSINT:status:int} %{POSINT:size:int} "%{DATA:referer}" "%{DATA:agent}"'
)


def _parse_log_timestamp(arr, fmt):
    """Access/error-log timestamp string column → timestamp[us] UTC.
    ``fmt`` is the chrono-style format (parse_apache_log.cue default
    "%d/%b/%Y:%T %z"; "%+" = RFC 3339)."""
    import pandas as pd

    s = pd.Series(arr.to_pylist(), dtype="object")
    if fmt in ("%+", None):
        ts = pd.to_datetime(s, errors="coerce", utc=True)
    else:
        pyfmt = fmt.replace("%T", "%H:%M:%S").replace("%:z", "%z")
        ts = pd.to_datetime(s, format=pyfmt, errors="coerce", utc=True)
    ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    return pa.Array.from_pandas(ts).cast(pa.timestamp("us"))


def parse_apache_log(col, format: str = "common",
                     timestamp_format: str = "%d/%b/%Y:%T %z"):
    """Apache log line → typed columns (+error mask) per
    parse_apache_log.cue: formats "common" / "combined" / "error";
    timestamps convert to UTC timestamp[us]; size "-" is null."""
    pattern = {
        "common": APACHE_COMMON_GROK,
        "combined": APACHE_COMBINED_GROK,
        "error": APACHE_ERROR_GROK,
    }[format]
    if timestamp_format != "%d/%b/%Y:%T %z":
        # non-default timestamp spelling: accept anything inside the
        # brackets and let the timestamp parser validate
        pattern = pattern.replace("%{HTTPDATE:timestamp}",
                                  "(?P<timestamp>[^\\]]+)")
    cols, err = GrokParser(pattern).parse(col)
    cols["timestamp"] = _parse_log_timestamp(cols["timestamp"], timestamp_format)
    if "size" in cols:
        size = pc.if_else(
            pc.equal(pc.fill_null(cols["size"], "-"), "-"),
            pa.scalar(None, type=pa.string()), cols["size"],
        )
        cols["size"] = size.cast(pa.int64())
    if format == "error":
        # optional groups extract as "" — null them (module/thread/client)
        for k in ("module", "thread", "client"):
            cols[k] = pc.if_else(
                pc.equal(pc.fill_null(cols[k], ""), ""),
                pa.scalar(None, type=pa.string()), cols[k],
            )
    return cols, err


_NGINX_FORMATS = {
    # parse_nginx_log.cue field layouts; request stays one string
    "combined": (
        '%{IPORHOST:client} %{NOTSPACE:_ident} %{NOTSPACE:user} '
        '\\[%{HTTPDATE:timestamp}\\] "%{DATA:request}" '
        '%{POSINT:status:int} %{POSINT:size:int} "%{DATA:referer}" '
        '"%{DATA:agent}"(?: "%{DATA:compression}")?'
    ),
    "main": (
        '%{IPORHOST:remote_addr} %{NOTSPACE:_ident} %{NOTSPACE:remote_user} '
        '\\[%{HTTPDATE:timestamp}\\] "%{DATA:request}" '
        '%{POSINT:status:int} %{POSINT:body_bytes_size:int} '
        '"%{DATA:http_referer}" "%{DATA:http_user_agent}" '
        '"%{DATA:http_x_forwarded_for}"'
    ),
    "ingress_upstreaminfo": (
        '%{IPORHOST:remote_addr} %{NOTSPACE:_ident} %{NOTSPACE:remote_user} '
        '\\[%{HTTPDATE:timestamp}\\] "%{DATA:request}" '
        '%{POSINT:status:int} %{POSINT:body_bytes_size:int} '
        '"%{DATA:http_referer}" "%{DATA:http_user_agent}" '
        '%{POSINT:request_length:int} %{NUMBER:request_time:float} '
        '\\[%{DATA:proxy_upstream_name}\\]'
        '(?: \\[%{DATA:proxy_alternative_upstream_name}\\])? '
        '%{NOTSPACE:upstream_addr} %{POSINT:upstream_response_length:int} '
        '%{NUMBER:upstream_response_time:float} %{POSINT:upstream_status:int} '
        '%{NOTSPACE:req_id}'
    ),
    "error": (
        '%{NGXDATE:timestamp} \\[%{WORD:severity}\\] '
        '%{POSINT:pid:int}#%{POSINT:tid:int}: '
        '(?:\\*%{POSINT:cid:int} )?%{NGXMSG:message}'
        '(?:, client: %{NGXFIELD:client})?(?:, server: %{NGXFIELD:server})?'
        '(?:, request: "%{DATA:request}")?(?:, upstream: "%{DATA:upstream}")?'
        '(?:, host: "%{DATA:host}")?(?:, referrer: "%{DATA:referrer}")?$'
    ),
}

_NGINX_EXTRA = {
    "NGXDATE": r"\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}",
    "NGXMSG": r".*?",
    "NGXFIELD": r"[^,]*",
}


def parse_nginx_log(col, format: str = "combined",
                    timestamp_format: str = None):
    """Nginx log line → typed columns (+mask) per parse_nginx_log.cue:
    formats combined / main / ingress_upstreaminfo / error; timestamps
    convert to UTC timestamp[us]; "-" placeholders become null."""
    pattern = _NGINX_FORMATS[format]
    cols, err = GrokParser(pattern, _NGINX_EXTRA).parse(col)
    cols.pop("_ident", None)
    if format == "error":
        fmt = timestamp_format or "%Y/%m/%d %H:%M:%S"
    else:
        fmt = timestamp_format or "%d/%b/%Y:%T %z"
    cols["timestamp"] = _parse_log_timestamp(cols["timestamp"], fmt)
    for k, v in list(cols.items()):
        if pa.types.is_string(v.type):
            cols[k] = pc.if_else(
                pc.is_in(pc.fill_null(v, "-"), value_set=pa.array(["-", ""])),
                pa.scalar(None, type=pa.string()), v,
            )
    return cols, err


# Named single-purpose parsers mirroring documented VRL functions
# (website/cue/reference/remap/functions/parse_*.cue shapes), all built
# on the vectorized grok machinery.

GLOG_GROK = (
    "%{GLOGLEVEL:level_char}%{GLOGDATE:date} "
    "%{TIME:time} +%{POSINT:thread_id} %{NOTSPACE:file}:%{POSINT:line:int}\\] "
    "%{GREEDYDATA:message}"
)

# glog dates are YYYYMMDD; klog's are MMDD with the year inferred
_GLOG_EXTRA = {"GLOGLEVEL": r"[IWEF]", "GLOGDATE": r"(?:\d{8}|\d{4})"}

_GLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}

KLOG_GROK = GLOG_GROK  # klog shares the glog line shape

VPC_FLOW_DEFAULT_FORMAT = (
    "version account_id interface_id srcaddr dstaddr srcport dstport "
    "protocol packets bytes start end action log_status"
)

# fields that parse as integers in the documented v2-v5 field set
_VPC_INT_FIELDS = {
    "version", "srcport", "dstport", "protocol", "packets", "bytes",
    "start", "end", "tcp_flags", "traffic_path",
}

# parse_aws_alb_log.cue field layout: positional tokens, quote-aware;
# floats/ints typed, "-" → null, space-separated quoted lists → arrays
_ALB_FIELDS = [
    ("type", "s"), ("timestamp", "s"), ("elb", "s"), ("client_host", "s"),
    ("target_host", "s"), ("request_processing_time", "f"),
    ("target_processing_time", "f"), ("response_processing_time", "f"),
    ("elb_status_code", "s"), ("target_status_code", "s"),
    ("received_bytes", "i"), ("sent_bytes", "i"), ("request", "req"),
    ("user_agent", "s"), ("ssl_cipher", "s"), ("ssl_protocol", "s"),
    ("target_group_arn", "s"), ("trace_id", "s"), ("domain_name", "s"),
    ("chosen_cert_arn", "s"), ("matched_rule_priority", "s"),
    ("request_creation_time", "s"), ("actions_executed", "s"),
    ("redirect_url", "s"), ("error_reason", "s"),
    ("target_port_list", "l"), ("target_status_code_list", "l"),
    ("classification", "s"), ("classification_reason", "s"),
    ("traceability_id", "s"),
]

_ALB_TOKEN_RX = re.compile(r'"([^"]*)"|(\S+)')

AUTH_GROK = (
    "%{SYSLOGTIMESTAMP:timestamp} %{HOSTNAME:hostname} "
    "%{PROG:appname}(?:\\[%{POSINT:pid:int}\\])?: %{GREEDYDATA:message}"
)

_AUTH_EXTRA = {"PROG": r"[\w./-]+?"}


def _glog_assemble(cols, err):
    """Shared glog/klog post-processing (parse_glog.cue layout):
    level word, timestamp[us] (year inferred when the line has none),
    id int, file, line int, message."""
    import datetime as _dt

    import pandas as pd

    lv = cols.pop("level_char")
    level = pa.array(
        [None if v is None else _GLOG_LEVELS.get(v) for v in lv.to_pylist()],
        type=pa.string(),
    )
    date = pd.Series(cols.pop("date").to_pylist(), dtype="object")
    time = pd.Series(cols.pop("time").to_pylist(), dtype="object")
    year = str(_dt.date.today().year)
    full = date.where(date.str.len() == 8, year + date)
    ts = pd.to_datetime(full + " " + time, format="%Y%m%d %H:%M:%S.%f",
                        errors="coerce")
    out = {
        "level": level,
        "timestamp": pa.Array.from_pandas(ts).cast(pa.timestamp("us")),
        "id": cols.pop("thread_id").cast(pa.int64()),
        "file": cols.pop("file"),
        "line": cols.pop("line"),
        "message": cols.pop("message"),
    }
    return out, err


def parse_glog(col):
    """Google glog lines: Lyyyymmdd hh:mm:ss.uuuuuu threadid
    file:line] msg → {level, timestamp, id, file, line, message}
    (parse_glog.cue)."""
    return _glog_assemble(*GrokParser(GLOG_GROK, _GLOG_EXTRA).parse(col))


def parse_klog(col):
    """Kubernetes klog lines (glog-shaped, year inferred as current —
    parse_klog.cue)."""
    return _glog_assemble(*GrokParser(KLOG_GROK, _GLOG_EXTRA).parse(col))


def parse_aws_vpc_flow_log(col, format: Optional[str] = None):
    """AWS VPC flow log → typed columns (parse_aws_vpc_flow_log.cue):
    space-separated fields per ``format`` (default = the documented v2
    layout), "-" placeholders become null, numeric fields cast to
    int64.  Vectorized: one split_pattern + per-field list_element."""
    fields = (format or VPC_FLOW_DEFAULT_FORMAT).split()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(col, pattern=" ")
    nfield = pc.list_value_length(parts)
    err = pc.fill_null(pc.not_equal(nfield, len(fields)), True)
    # rows with the wrong field count yield all-null columns
    parts = pc.if_else(err, pa.scalar(None, type=parts.type), parts)
    cols = {}
    for i, name in enumerate(fields):
        v = pc.list_element(parts, i)
        v = pc.if_else(pc.equal(pc.fill_null(v, "-"), "-"),
                       pa.scalar(None, type=pa.string()), v)
        if name in _VPC_INT_FIELDS:
            v = v.cast(pa.int64())
        cols[name] = v
    return cols, err


def parse_aws_alb_log(col, strict_mode: bool = True):
    """AWS application load balancer access log → typed columns
    (parse_aws_alb_log.cue): the documented 29-field layout + split
    request method/url/protocol; ``strict_mode=False`` tolerates
    trailing extra fields.  Quote-aware tokenization is one compiled
    C-regex findall per row (off the flagship hot path)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    names = ([n for n, _ in _ALB_FIELDS[:12]]
             + ["request_method", "request_url", "request_protocol"]
             + [n for n, _ in _ALB_FIELDS[13:]])
    data = {n: [] for n in names}
    errs = []
    required = len(_ALB_FIELDS) - 1  # traceability_id is optional
    for line in col.to_pylist():
        toks = None
        if line is not None:
            toks = [m.group(1) if m.group(1) is not None else m.group(2)
                    for m in _ALB_TOKEN_RX.finditer(line)]
        bad = (toks is None or len(toks) < required
               or (strict_mode and len(toks) > len(_ALB_FIELDS)))
        errs.append(bad)
        if bad:
            for n in names:
                data[n].append(None)
            continue
        for idx, (name, kind) in enumerate(_ALB_FIELDS):
            # the optional 29th field only binds when present exactly;
            # trailing extras beyond the layout are ignored (non-strict)
            v = toks[idx] if idx < len(toks) else None
            if name == "traceability_id" and len(toks) != len(_ALB_FIELDS):
                v = None
            if v == "-":
                v = None
            if kind == "req":
                parts = (v or "").split(" ")
                parts += [None] * (3 - len(parts))
                data["request_method"].append(parts[0] or None)
                data["request_url"].append(parts[1])
                data["request_protocol"].append(parts[2])
                continue
            if v is None:
                data[name].append([] if kind == "l" else None)
            elif kind == "f":
                data[name].append(float(v))
            elif kind == "i":
                data[name].append(int(v))
            elif kind == "l":
                data[name].append(v.split(" "))
            else:
                data[name].append(v)
    types = {"f": pa.float64(), "i": pa.int64(), "l": pa.list_(pa.string())}
    kinds = dict(_ALB_FIELDS)
    cols = {}
    for n in names:
        k = kinds.get(n, "s")
        cols[n] = pa.array(data[n], type=types.get(k, pa.string()))
    return cols, pa.array(errs, type=pa.bool_())


def parse_linux_authorization(col):
    """Linux auth.log / secure lines → {appname, hostname, message,
    procid, timestamp} (parse_linux_authorization.cue): the syslog
    timestamp has no year — the current year is inferred; procid is
    the optional [pid] suffix."""
    import datetime as _dt

    import pandas as pd

    cols, err = GrokParser(AUTH_GROK, _AUTH_EXTRA).parse(col)
    ts = pd.to_datetime(
        pd.Series([None if v is None else f"{_dt.date.today().year} {v}"
                   for v in cols.pop("timestamp").to_pylist()], dtype="object"),
        format="%Y %b %d %H:%M:%S", errors="coerce")
    cols["timestamp"] = pa.Array.from_pandas(ts).cast(pa.timestamp("us"))
    cols["procid"] = cols.pop("pid")
    return cols, err


def parse_common_log(col, timestamp_format: str = "%d/%b/%Y:%T %z"):
    """Apache common log parsing (VRL parse_common_log)."""
    return parse_apache_log(col, "common", timestamp_format)
