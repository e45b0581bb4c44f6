"""Env-var + secret interpolation — ports the reference's own test
matrices (src/config/vars.rs:88-171, src/config/loading/secret.rs:
180-268) plus end-to-end loads through the CLI config loader."""

import json
import os
import stat
import subprocess
import sys

import pytest

from vector_ray.config_vars import (
    collect_secret_keys,
    interpolate_env,
    interpolate_secrets,
    prepare_config_text,
    retrieve_secrets,
)

VARS = {
    "FOO": "dogs",
    "FOOBAR": "cats",
    "FOO.BAR": "turtles",
    "EMPTY": "",
}


# ------------------------------------------------------------- vars.rs matrix
@pytest.mark.parametrize(
    "src,expected",
    [
        ("$FOO", "dogs"),
        ("${FOO}", "dogs"),
        ("${FOOBAR}", "cats"),
        ("x${FOOBAR}y", "xcatsy"),
        ("$ x", "$ x"),
        ("$$FOO", "$FOO"),
        ("$FOO=bar", "dogs=bar"),
        ("$FOO.BAR", "turtles"),
        ("${FOO x", "${FOO x"),
        ("${}", "${}"),
        ("${FOO:-cats}", "dogs"),
        ("${NOT:-dogcats}", "dogcats"),
        ("${NOT:-dogs and cats}", "dogs and cats"),
        ("${:-cats}", "${:-cats}"),
        ("${NOT:-}", ""),
        ("${NOT-cats}", "cats"),
        ("${EMPTY-cats}", ""),
        ("${FOO:?error cats}", "dogs"),
        ("${FOO?error cats}", "dogs"),
        ("${EMPTY?error cats}", ""),
        ("${EMPTY:-cats}", "cats"),
    ],
)
def test_env_interpolation(src, expected):
    assert interpolate_env(src, VARS) == expected


@pytest.mark.parametrize(
    "src",
    ["x$FOOBARy", "$NOT_FOO", "$NOT-FOO", "${NOT:?error cats}",
     "${NOT?error cats}", "${EMPTY:?error cats}"],
)
def test_env_interpolation_errors(src):
    with pytest.raises(ValueError):
        interpolate_env(src, VARS)


def test_multiline_expansion_prevented():
    vars = {
        "SAFE_VAR": "single line value",
        "MULTILINE_VAR": "line1\nline2\nline3",
        "WITH_CR": "before\rafter",
        "WITH_CRLF": "before\r\nafter",
    }
    for bad in ("$MULTILINE_VAR", "$WITH_CR", "$WITH_CRLF",
                "${MULTILINE_VAR:-safe default}"):
        with pytest.raises(ValueError):
            interpolate_env(bad, vars)
    assert interpolate_env("$SAFE_VAR", vars) == "single line value"
    with pytest.raises(ValueError, match="newline character.*MULTILINE_VAR"):
        interpolate_env("$MULTILINE_VAR", vars)


# ---------------------------------------------------------- secret.rs matrix
def test_secret_replacement():
    secrets = {"a.secret.key": "value", "a...key": "a...value"}
    assert interpolate_secrets("SECRET[a.secret.key]", secrets) == "value"
    assert (
        interpolate_secrets("SECRET[a.secret.key] SECRET[a.secret.key]", secrets)
        == "value value"
    )
    assert interpolate_secrets("xxxSECRET[a.secret.key]yyy", secrets) == "xxxvalueyyy"
    assert interpolate_secrets("SECRET[a...key]", secrets) == "a...value"
    assert (
        interpolate_secrets("xxxSECRET[non_matching_syntax]yyy", secrets)
        == "xxxSECRET[non_matching_syntax]yyy"
    )
    with pytest.raises(ValueError, match=r"SECRET\[a.non.existing.key\]"):
        interpolate_secrets("xxxSECRET[a.non.existing.key]yyy", secrets)


def test_secret_collection():
    text = """
    SECRET[first_backend.secret_key]
    SECRET[first_backend.secret-key]
    SECRET[first_backend.another_secret_key]
    SECRET[second_backend.secret_key]
    SECRET[second_backend.secret.key]
    SECRET[first_backend.a_third.secret_key]
    SECRET[first_backend...an_extra_secret_key]
    SECRET[non_matching_syntax]
    SECRET[.non.matching.syntax]
    """
    keys = collect_secret_keys(text)
    assert set(keys) == {"first_backend", "second_backend"}
    assert keys["first_backend"] == {
        "secret_key",
        "secret-key",
        "another_secret_key",
        "a_third.secret_key",
        "..an_extra_secret_key",
    }
    assert keys["second_backend"] == {"secret_key", "secret.key"}


def test_secret_collection_duplicates():
    keys = collect_secret_keys(
        "SECRET[first_backend.secret_key]\nSECRET[first_backend.secret_key]"
    )
    assert keys["first_backend"] == {"secret_key"}


# ------------------------------------------------------------------ backends
def test_file_backend(tmp_path):
    p = tmp_path / "secrets.json"
    p.write_text(json.dumps({"user": "test", "password": "hunter2", "empty": ""}))
    cfg = {"fb": {"type": "file", "path": str(p)}}
    out = retrieve_secrets(cfg, {"fb": {"user", "password"}})
    assert out == {"fb.user": "test", "fb.password": "hunter2"}
    with pytest.raises(ValueError, match="was empty"):
        retrieve_secrets(cfg, {"fb": {"empty"}})
    with pytest.raises(ValueError, match="was not retrieved"):
        retrieve_secrets(cfg, {"fb": {"missing"}})


def test_directory_backend(tmp_path):
    (tmp_path / "token").write_text("tok-123\n")
    cfg_raw = {"d": {"type": "directory", "path": str(tmp_path)}}
    cfg_strip = {
        "d": {"type": "directory", "path": str(tmp_path),
              "remove_trailing_whitespace": True}
    }
    assert retrieve_secrets(cfg_raw, {"d": {"token"}}) == {"d.token": "tok-123\n"}
    assert retrieve_secrets(cfg_strip, {"d": {"token"}}) == {"d.token": "tok-123"}


def test_exec_backend(tmp_path):
    script = tmp_path / "backend.py"
    script.write_text(
        "import json, sys\n"
        "q = json.load(sys.stdin)\n"
        "assert q['version'] == '1.0'\n"
        "print(json.dumps({k: {'value': 'v_' + k, 'error': None}"
        " for k in q['secrets']}))\n"
    )
    cfg = {"e": {"type": "exec", "command": [sys.executable, str(script)]}}
    out = retrieve_secrets(cfg, {"e": {"k1", "k2"}})
    assert out == {"e.k1": "v_k1", "e.k2": "v_k2"}


def test_exec_backend_error_and_status(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import json, sys\n"
        "q = json.load(sys.stdin)\n"
        "print(json.dumps({k: {'value': None, 'error': 'nope'}"
        " for k in q['secrets']}))\n"
    )
    cfg = {"e": {"type": "exec", "command": [sys.executable, str(bad)]}}
    with pytest.raises(ValueError, match="nope"):
        retrieve_secrets(cfg, {"e": {"k"}})
    crash = tmp_path / "crash.py"
    crash.write_text("import sys; sys.exit(3)\n")
    cfg = {"e": {"type": "exec", "command": [sys.executable, str(crash)]}}
    with pytest.raises(ValueError, match="status 3"):
        retrieve_secrets(cfg, {"e": {"k"}})


def test_missing_backend():
    with pytest.raises(ValueError, match='Backend "gone" is required'):
        retrieve_secrets({}, {"gone": {"k"}})


# ------------------------------------------------------------- end to end
def test_prepare_config_text_toml(tmp_path, monkeypatch):
    import tomllib

    sfile = tmp_path / "s.json"
    sfile.write_text(json.dumps({"api_key": "K-42"}))
    monkeypatch.setenv("VR_TEST_RATE", "0.25")
    text = f"""
[secret.store]
type = "file"
path = "{sfile}"

[transforms.t]
type = "sample"
inputs = ["in"]
rate = ${{VR_TEST_RATE:?must be set}}
key = "SECRET[store.api_key]"
tag = "${{VR_TEST_MISSING:-fallback}}"
"""
    doc = prepare_config_text(text, tomllib.loads)
    assert doc["transforms"]["t"]["rate"] == 0.25
    assert doc["transforms"]["t"]["key"] == "K-42"
    assert doc["transforms"]["t"]["tag"] == "fallback"


def test_cli_run_with_env_and_secret(tmp_path, monkeypatch):
    """End-to-end: config with $VAR and SECRET[...] through the CLI
    loader (validate path, no Ray needed)."""
    sdir = tmp_path / "secrets"
    sdir.mkdir()
    (sdir / "limit").write_text("2\n")
    cfg = tmp_path / "c.toml"
    cfg.write_text(f"""
[secret.vault]
type = "directory"
path = "{sdir}"
remove_trailing_whitespace = true

[sources.in]
type = "inline"
rows = [ {{ x = 1 }}, {{ x = 2 }} ]

[transforms.keep]
type = "filter"
inputs = ["in"]
condition = ".x <= SECRET[vault.limit] && .x >= $VR_MIN_X"
""")
    monkeypatch.setenv("VR_MIN_X", "1")
    from vector_ray.__main__ import _load_config

    doc = _load_config(str(cfg))
    assert doc["transforms"]["keep"]["condition"] == ".x <= 2 && .x >= 1"


def test_cli_missing_env_is_config_error(tmp_path, monkeypatch):
    cfg = tmp_path / "c.toml"
    cfg.write_text('[sources.s]\ntype = "inline"\npath = "$VR_NO_SUCH_VAR_XYZ"\n')
    monkeypatch.delenv("VR_NO_SUCH_VAR_XYZ", raising=False)
    from vector_ray.__main__ import _load_config

    with pytest.raises(SystemExit, match="Missing environment variable"):
        _load_config(str(cfg))


def test_exec_backend_pretty_printed_stdout(tmp_path):
    """Review r5: whole-stdout JSON (pretty-printed, multi-line) must
    parse, not just first-line framing."""
    script = tmp_path / "pp.py"
    script.write_text(
        "import json, sys\n"
        "q = json.load(sys.stdin)\n"
        "print(json.dumps({k: {'value': 'v', 'error': None}"
        " for k in q['secrets']}, indent=2))\n"
    )
    cfg = {"e": {"type": "exec", "command": [sys.executable, str(script)]}}
    assert retrieve_secrets(cfg, {"e": {"k"}}) == {"e.k": "v"}
