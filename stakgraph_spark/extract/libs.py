"""Library-node extraction from package manifests (get_libs stage).

Mirrors the reference's process_libraries (ast/src/builder/stages.rs:16-58)
+ per-language lib_query semantics:

  python    requirements.txt parsed as words  (queries/python.rs:47-54)
  go        go.mod `require ( name version )` blocks (queries/go.rs:50-61)
  rust      Cargo.toml [dependencies] table, version from the string value
            or an inline table's `version` key; the pair named "version"
            itself is skipped (queries/rust.rs:251-274)
  ts/react  package.json dependencies + devDependencies objects, name must
            match ^[@a-zA-Z], version ^[\\^~]?\\d or * (react_ts.rs:44-56)

Library rows ride the normal RAW node stream, so File -CONTAINS-> Library
falls out of the pipeline's file-containment join (add_node_with_parent
semantics).  Version lands in meta.version (NodeData::add_version).
"""

from __future__ import annotations

import json
import re

from .base import Extraction, Node

_TS_NAME = re.compile(r"^[@a-zA-Z]")
_TS_VER = re.compile(r"^[\^~]?\d|\*")


def _lib(name: str, file: str, row: int, body: str,
         version: str | None) -> Node:
    meta = {"version": version} if version else {}
    return Node("Library", name, file, row, row, body, meta=meta)


def libs_python(path: str, code: str) -> Extraction:
    """requirements.txt: every whitespace-separated word is a library name
    (the reference parses it with the bash grammar's (word) nodes); comment
    lines are bash comments, so their words never parse as (word)."""
    ex = Extraction()
    for i, line in enumerate(code.splitlines()):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        for w in line.split():
            ex.nodes.append(_lib(w, path, i, line, None))
    return ex


def libs_go(path: str, code: str) -> Extraction:
    """go.mod: `name version` pairs inside require ( ... ) blocks — the
    reference's bash-grammar query only matches the subshell form."""
    ex = Extraction()
    in_req = False
    for i, line in enumerate(code.splitlines()):
        s = line.strip()
        if re.match(r"^require\s*\($", s):
            in_req = True
            continue
        if in_req and s.startswith(")"):
            in_req = False
            continue
        if in_req and s and not s.startswith("//"):
            parts = s.split()
            if len(parts) >= 2:
                ex.nodes.append(_lib(parts[0], path, i, s, parts[1]))
    return ex


def libs_rust(path: str, code: str) -> Extraction:
    """Cargo.toml: pairs of the [dependencies] table only (not
    dev-dependencies); version = the string value or inline-table version."""
    ex = Extraction()
    in_deps = False
    for i, line in enumerate(code.splitlines()):
        s = line.strip()
        m = re.match(r"^\[(.+)\]$", s)
        if m:
            in_deps = m.group(1).strip() == "dependencies"
            continue
        if not in_deps or not s or s.startswith("#"):
            continue
        pm = re.match(r"^([A-Za-z0-9_-]+)\s*=\s*(.+)$", s)
        if not pm or pm.group(1) == "version":
            continue
        name, val = pm.group(1), pm.group(2).strip()
        version = None
        vm = re.match(r'^"([^"]*)"', val)
        if vm:
            version = vm.group(1)
        else:
            im = re.search(r'version\s*=\s*"([^"]*)"', val)
            if im:
                version = im.group(1)
        if version is None:
            continue  # the query requires a version capture to match
        ex.nodes.append(_lib(name, path, i, s, version))
    return ex


def libs_ts(path: str, code: str) -> Extraction:
    """package.json: dependencies + devDependencies entries with
    name ~ ^[@a-zA-Z] and version ~ ^[\\^~]?\\d or *."""
    ex = Extraction()
    try:
        doc = json.loads(code)
    except Exception:
        return ex
    lines = code.splitlines()

    def row_of(name: str) -> int:
        needle = f'"{name}"'
        for i, line in enumerate(lines):
            if needle in line and ":" in line:
                return i
        return 0

    for section in ("dependencies", "devDependencies"):
        deps = doc.get(section)
        if not isinstance(deps, dict):
            continue
        for name, ver in deps.items():
            if not isinstance(ver, str):
                continue
            if not _TS_NAME.match(name) or not _TS_VER.match(ver):
                continue
            i = row_of(name)
            body = lines[i].strip() if i < len(lines) else ""
            ex.nodes.append(_lib(name, path, i, body, ver))
    return ex


def libs_ruby(path: str, code: str) -> Extraction:
    """Gemfile: gem "name"[, "version"] calls (queries/ruby.rs:43-53)."""
    ex = Extraction()
    pat = re.compile(r"""^\s*gem\s+['\"]([^'\"]+)['\"]\s*(?:,\s*['\"]([^'\"]+)['\"])?""")
    for i, line in enumerate(code.splitlines()):
        m = pat.match(line)
        if m:
            ex.nodes.append(_lib(m.group(1), path, i, line.strip(), m.group(2)))
    return ex


# basename -> (langs it applies to, parser)
PKG_PARSERS: dict[str, tuple[tuple[str, ...], object]] = {
    "requirements.txt": (("python",), libs_python),
    "go.mod": (("go",), libs_go),
    "Cargo.toml": (("rust", "toml"), libs_rust),
    "package.json": (("typescript", "react", "svelte", "angular"), libs_ts),
    "Gemfile": (("ruby",), libs_ruby),
}


def extract_libs(lang: str, path: str, code: str) -> Extraction | None:
    base = path.rsplit("/", 1)[-1]
    entry = PKG_PARSERS.get(base)
    if entry is None or lang not in entry[0]:
        return None
    return entry[1](path, code)
