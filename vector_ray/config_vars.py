"""Config env-var interpolation and secret backends.

Reference semantics:

* ``$VAR`` / ``${VAR}`` / ``${VAR:-default}`` / ``${VAR-default}`` /
  ``${VAR:?err}`` / ``${VAR?err}`` / ``$$`` — src/config/vars.rs:12-85.
  Names are ``[A-Za-z0-9_.]`` (shell word-chars plus ``.`` for
  Java-properties-style vars).  Values containing CR/LF are rejected.
  ``:-`` substitutes the default when the var is unset OR empty, ``-``
  only when unset; ``:?``/``?`` error analogously.  Non-matching text
  (``$ x``, ``${}``, ``${FOO x``) passes through untouched.
* ``SECRET[backend.key]`` placeholders resolved via backends declared
  in the config's ``[secret.<name>]`` table — src/config/loading/
  secret.rs:24-99 (collector regex + per-backend retrieval, results
  keyed ``backend.key``) and src/secrets/{file,directory,exec}.rs.

Interpolation runs on the raw config TEXT before parsing, exactly like
the reference (Process::prepare), so placeholders work anywhere — keys,
values, inline tables.
"""

from __future__ import annotations

import json
import os
import re
import subprocess

# vars.rs:12-20 — $$ | $NAME | ${NAME} | ${NAME<flag><default-or-err>}
ENV_VAR_RE = re.compile(
    r"""
    \$\$|
    \$([A-Za-z0-9_.]+)|
    \$\{([A-Za-z0-9_.]+)(?:(:?-|:?\?)([^}]*))?\}
    """,
    re.VERBOSE,
)

# secret.rs:31 — SECRET[backend.key]; backend is word-chars, key allows . and -
SECRET_RE = re.compile(r"SECRET\[([A-Za-z0-9_]+)\.([A-Za-z0-9_.-]+)\]")


def interpolate_env(text: str, env: dict | None = None) -> str:
    """Replace env-var placeholders in config text (vars.rs interpolate).

    Raises ``ValueError`` with every accumulated error message joined,
    mirroring the reference's ``Err(Vec<String>)``.
    """
    if env is None:
        env = dict(os.environ)
    errors: list[str] = []

    def repl(m: re.Match) -> str:
        name = m.group(1) or m.group(2)
        if name is None:  # the $$ alternative
            return "$"
        flags = m.group(3) or ""
        def_or_err = m.group(4) or ""
        val = env.get(name)
        if val is not None and ("\n" in val or "\r" in val):
            errors.append(
                f"Environment variable contains newline character. name = {name!r}"
            )
            val = None
        if flags == ":-":
            return val if val else def_or_err
        if flags == "-":
            return val if val is not None else def_or_err
        if flags == ":?":
            if val:
                return val
            errors.append(
                "Non-empty environment variable required in config. "
                f"name = {name!r}, error = {def_or_err!r}"
            )
            return ""
        if flags == "?":
            if val is not None:
                return val
            errors.append(
                "Missing environment variable required in config. "
                f"name = {name!r}, error = {def_or_err!r}"
            )
            return ""
        if val is not None:
            return val
        errors.append(f"Missing environment variable in config. name = {name!r}")
        return ""

    out = ENV_VAR_RE.sub(repl, text)
    if errors:
        raise ValueError("; ".join(errors))
    return out


def collect_secret_keys(text: str) -> dict[str, set[str]]:
    """backend -> set of keys referenced as SECRET[backend.key]."""
    keys: dict[str, set[str]] = {}
    for backend, key in SECRET_RE.findall(text):
        keys.setdefault(backend, set()).add(key)
    return keys


# ---------------------------------------------------------------- backends


def _retrieve_file(cfg: dict, wanted: set[str]) -> dict[str, str]:
    """JSON map file backend (src/secrets/file.rs)."""
    with open(cfg["path"]) as f:
        mapping = json.load(f)
    out = {}
    for k in wanted:
        if k not in mapping:
            raise ValueError(f"secret for key '{k}' was not retrieved")
        if not mapping[k]:
            raise ValueError(f"secret for key '{k}' was empty")
        out[k] = str(mapping[k])
    return out


def _retrieve_directory(cfg: dict, wanted: set[str]) -> dict[str, str]:
    """One-file-per-key backend (src/secrets/directory.rs)."""
    strip = bool(cfg.get("remove_trailing_whitespace", False))
    out = {}
    for k in wanted:
        path = os.path.join(cfg["path"], k)
        with open(path) as f:
            contents = f.read()
        secret = contents.rstrip() if strip else contents
        if not secret:
            raise ValueError(f"secret in file '{k}' was empty")
        out[k] = secret
    return out


def _retrieve_exec(cfg: dict, wanted: set[str]) -> dict[str, str]:
    """Exec backend: JSON query on stdin, JSON response on stdout
    (src/secrets/exec.rs — v1.0 protocol; v1.1 adds type/config)."""
    command = cfg["command"]
    timeout = float(cfg.get("timeout", 5))
    query: dict = {"version": "1.0", "secrets": sorted(wanted)}
    proto = cfg.get("protocol")
    if isinstance(proto, dict) and str(proto.get("version", "")).lower() in (
        "v1_1",
        "1.1",
    ):
        query["version"] = "1.1"
        query["type"] = proto.get("backend_type")
        query["config"] = proto.get("backend_config")
    try:
        proc = subprocess.run(
            command,
            input=json.dumps(query).encode(),
            capture_output=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired as e:
        raise ValueError(f"secret backend command timed out after {timeout}s") from e
    if proc.returncode != 0:
        raise ValueError(
            f"secret backend command failed with status {proc.returncode}: "
            f"{proc.stderr.decode(errors='replace').strip()}"
        )
    # accept whole-stdout JSON (pretty-printed responses included);
    # fall back to exec.rs's newline-framed first line
    raw = proc.stdout.decode().strip()
    try:
        response = json.loads(raw) if raw else {}
    except json.JSONDecodeError:
        response = json.loads(raw.splitlines()[0])
    out = {}
    for k in wanted:
        entry = response.get(k)
        if entry is None:
            raise ValueError(f"secret for key '{k}' was not retrieved")
        if entry.get("error"):
            raise ValueError(
                f"secret for key '{k}' was not retrieved: {entry['error']}"
            )
        value = entry.get("value")
        if not value:
            raise ValueError(f"secret for key '{k}' was empty")
        out[k] = value
    return out


def _retrieve_test(cfg: dict, wanted: set[str]) -> dict[str, str]:
    """Inline test backend (src/secrets/test.rs): replies with a fixed
    value for every key."""
    value = cfg.get("replacement", "secret")
    return {k: value for k in wanted}


_BACKENDS = {
    "file": _retrieve_file,
    "directory": _retrieve_directory,
    "exec": _retrieve_exec,
    "test": _retrieve_test,
}


def retrieve_secrets(
    secret_cfg: dict[str, dict], keys: dict[str, set[str]]
) -> dict[str, str]:
    """Resolve every referenced backend.key -> value (secret.rs:58-97)."""
    secrets: dict[str, str] = {}
    for backend_name, wanted in keys.items():
        backend = secret_cfg.get(backend_name)
        if backend is None:
            raise ValueError(
                f'Backend "{backend_name}" is required for secret retrieval '
                "but was not found in config."
            )
        btype = backend.get("type")
        fn = _BACKENDS.get(btype)
        if fn is None:
            raise ValueError(f"unknown secret backend type {btype!r}")
        try:
            resolved = fn(backend, wanted)
        except ValueError:
            raise
        except Exception as e:
            raise ValueError(
                f'Error while retrieving secret from backend "{backend_name}": {e}.'
            ) from e
        for k, v in resolved.items():
            secrets[f"{backend_name}.{k}"] = v
    return secrets


def interpolate_secrets(text: str, secrets: dict[str, str]) -> str:
    """Replace SECRET[b.k] placeholders (secret.rs interpolate:148-171)."""
    errors: list[str] = []

    def repl(m: re.Match) -> str:
        full_key = f"{m.group(1)}.{m.group(2)}"
        if full_key in secrets:
            return secrets[full_key]
        errors.append(f"Unable to find secret replacement for {m.group(0)}.")
        return ""

    out = SECRET_RE.sub(repl, text)
    if errors:
        raise ValueError("; ".join(errors))
    return out


def prepare_config_text(
    text: str,
    parse,
    *,
    env: dict | None = None,
    interpolate: bool = True,
) -> dict:
    """Full reference load pipeline on a config string:

    1. env-var interpolation over the raw text (vars.rs),
    2. parse once to discover the ``[secret.*]`` backend table,
    3. collect + retrieve SECRET[...] keys, re-interpolate the text,
    4. re-parse the final text.

    ``parse`` is a ``str -> dict`` callable (toml/json/yaml front-end).
    """
    if interpolate:
        text = interpolate_env(text, env)
    keys = collect_secret_keys(text)
    if keys:
        doc = parse(text)
        secret_cfg = doc.get("secret", {})
        secrets = retrieve_secrets(secret_cfg, keys)
        text = interpolate_secrets(text, secrets)
    return parse(text)
