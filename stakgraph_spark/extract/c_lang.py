"""C extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's C tree-sitter queries
(/root/reference/ast/src/lang/queries/c.rs):

* Class      — named struct/union/enum specifiers and
               `typedef struct/enum/union {...} name;` definitions
               (class_definition_query c.rs:152-180); DataModel for named
               specifiers WITH a body (data_model_query c.rs:253-273)
* Function   — function DEFINITIONS only (prototypes are declarations and
               match nothing, c.rs:183-210)
* Instance   — `Type name = ...;` init-declarations with a type identifier
               (instance_definition_query c.rs:352-363) -> OF edges via the
               link plane's class-existence join
* Var        — top-level declarations (variables_query, translation_unit
               anchored, c.rs:135-150)
* tests      — every function in a test file (tests/, test_*.c, *_test.c)
               is a test; names test_*/_test/it_* elsewhere
               (is_test c.rs:60-66); classification per classify_test
               (name/e2e/integration markers, c.rs:68-91)
* Endpoint   — libonion `onion_url_add[_with_data](urls, "regex", handler)`
               and libmicrohttpd patterns (endpoint_finders c.rs:275-308);
               handlers that are not plain identifiers yield NO endpoint;
               verb defaults to GET (update_endpoint c.rs:337-350); the
               Handler edge resolves through the call cascade (unique
               global function), endpoint dropped on miss
* imports    — #include section node
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_HANDLER, M_IDENT, M_IMPORT,
                   Extraction, trim_quotes)
from .go_lang import mask_sources
from .java_lang import _paren_end, _span_end

_TYPEDEF_RE = re.compile(
    r"^\s*typedef\s+(?P<kind>struct|enum|union)\b(?:\s+(?P<tag>[A-Za-z_]\w*))?")
_SPEC_RE = re.compile(
    r"^\s*(?:static\s+|const\s+)*(?P<kind>struct|enum|union)\s+(?P<name>[A-Za-z_]\w*)\s*\{")
_FUNC_RE = re.compile(
    r"^(?:static\s+|inline\s+|extern\s+|const\s+|unsigned\s+|signed\s+)*"
    r"(?P<ret>[A-Za-z_]\w*(?:\s+[A-Za-z_]\w*)*?)\s*\**\s*"
    r"(?P<name>[A-Za-z_]\w*)\s*\(")
_INCLUDE_RE = re.compile(r'^\s*#\s*include\s+(?P<path>["<][^">]+[">])')
_INSTANCE_RE = re.compile(
    r"^\s*(?:static\s+|const\s+)*(?P<type>[A-Za-z_]\w*)\s+(?P<name>[A-Za-z_]\w*)"
    r"\s*=")
_TOPVAR_RE = re.compile(
    r"^(?:static\s+|const\s+|extern\s+|volatile\s+)*(?P<type>[A-Za-z_]\w*)"
    r"\s+\**(?P<name>[A-Za-z_]\w*)(?:\[[^\]]*\])?\s*[=;]")
_ONION_RE = re.compile(
    r"onion_url_add(?:_with_data)?\s*\(\s*[A-Za-z_]\w*\s*,\s*\"((?:[^\"\\]|\\.)*)\"\s*,\s*([A-Za-z_]\w*)\s*[,)]")
_MHD_RE = re.compile(
    r"MHD_(?:add_response_entry|create_response_from_callback)\s*\(\s*\"((?:[^\"\\]|\\.)*)\"\s*,\s*([A-Za-z_]\w*)\s*[,)]")
_CALL_RE = re.compile(r"(?<![\w.>])([A-Za-z_]\w*)\s*\(")
_FIELD_CALL_RE = re.compile(
    r"([A-Za-z_]\w*)\s*(?:->|\.)\s*(?:[A-Za-z_]\w*\s*(?:->|\.)\s*)*([A-Za-z_]\w*)\s*\(")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

KEYWORDS = {"if", "else", "for", "while", "do", "switch", "return", "sizeof",
            "case", "break", "continue", "goto", "typedef", "struct", "enum",
            "union", "static", "const", "extern", "void", "int", "char",
            "long", "short", "float", "double", "unsigned", "signed",
            "volatile", "register", "inline", "defined", "alignof"}
BAD_RET = {"return", "if", "while", "for", "switch", "case", "else", "goto",
           "typedef", "sizeof", "do", "break", "continue"}


def is_test_file(path: str) -> bool:
    f = path.replace("\\", "/").lower()
    name = f.rsplit("/", 1)[-1]
    return ("/test/" in f or "/tests/" in f or "/integration/" in f
            or "/e2e/" in f or name.endswith("_test.c")
            or name.endswith(".test.c") or name.endswith(".spec.c")
            or name.startswith("test_"))


def is_test(name: str, path: str) -> bool:
    n = name.lower()
    return (is_test_file(path) or n.startswith("test_")
            or n.endswith("_test") or n.startswith("it_"))


def classify_test(name: str, file: str, body: str) -> str:
    f = file.replace("\\", "/").lower()
    n = name.lower()
    b = body.lower()
    if ("/e2e/" in f or ".e2e." in f or "e2e" in n or "selenium" in b
            or "playwright" in b):
        return "E2eTest"
    if ("/integration/" in f or ".integration." in f or ".int." in f
            or "integration" in n):
        return "IntegrationTest"
    return "UnitTest"


def extract_c(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not (path.endswith(".c") or path.endswith(".h")):
        return ex
    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    clines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)

    def body(s, e):
        return "\n".join(lines[s:min(e, n - 1) + 1])

    # ---------- imports ----------
    import_rows = [i for i in range(n) if _INCLUDE_RE.match(nclines[i])]
    for i in import_rows:
        p = trim_quotes(_INCLUDE_RE.match(nclines[i]).group("path")
                        .strip("<>"))
        ex.mention(M_IMPORT, ("File", path.rsplit("/", 1)[-1], path, 0, None),
                   p.rsplit("/", 1)[-1].rsplit(".", 1)[0], dst_file=p, row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- type definitions ----------
    # EVERY named struct/enum/union specifier yields a Class — including
    # USAGES like `struct Node *left;` (the tree-sitter class query matches
    # any struct_specifier with a name, body or not; binary_tree.c's three
    # annotated `Node` classes are one definition + two member usages)
    claimed_rows: set[int] = set()
    for i in range(n):
        tm = _TYPEDEF_RE.match(clines[i])
        if tm:
            # typedef struct [Tag] { ... } name;  OR typedef struct Tag name;
            if "{" in " ".join(clines[i:min(i + 3, n)]):
                e = _span_end(clines, i)
                nm = re.search(r"}\s*\**\s*([A-Za-z_]\w*)\s*;", clines[e])
                name = nm.group(1) if nm else tm.group("tag")
            else:
                e = i
                nm = re.search(r"([A-Za-z_]\w*)\s*;\s*$", clines[i])
                name = nm.group(1) if nm else None
            if name:
                ex.node("Class", name, path, i, e, body(i, e))
                if "{" in " ".join(clines[i:min(e + 1, n)]):
                    ex.node("DataModel", name, path, i, e, body(i, e))
            claimed_rows.add(i)
        for m in re.finditer(r"\b(struct|enum|union)\s+([A-Za-z_]\w*)",
                             clines[i]):
            name = m.group(2)
            if name in KEYWORDS:
                continue
            has_body = "{" in clines[i][m.end():] or (
                i + 1 < n and clines[i + 1].lstrip().startswith("{"))
            e = _span_end(clines, i) if has_body else i
            ex.node("Class", name, path, i, e, body(i, e))
            if has_body:
                ex.node("DataModel", name, path, i, e, body(i, e))
                claimed_rows.add(i)

    # ---------- functions (definitions only: '{' before ';') ----------
    funcs: list[tuple] = []
    func_spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        cl = clines[i]
        if i in claimed_rows or not cl.strip() or cl.lstrip().startswith("#") \
                or any(fs <= i <= fe for fs, fe in func_spans):
            i += 1
            continue
        m = _FUNC_RE.match(cl)
        if m and m.group("name") not in KEYWORDS \
                and m.group("ret").split()[0] not in BAD_RET:
            pe = _paren_end(clines, i)
            j = pe
            while j < n and "{" not in clines[j] and ";" not in clines[j]:
                j += 1
            j = min(j, n - 1)
            if "{" in clines[j]:
                e = _span_end(clines, j)
                funcs.append((m.group("name"), i, e))
                func_spans.append((i, e))
                i = pe + 1
                continue
        i += 1

    def in_func(row):
        return any(fs <= row <= fe for fs, fe in func_spans)

    # ---------- instances + top-level vars ----------
    for i in range(n):
        if i in claimed_rows or clines[i].lstrip().startswith("#"):
            continue
        im = _INSTANCE_RE.match(clines[i])
        started = any(fs == i for fs, fe in func_spans)
        if im and not started and im.group("type") not in KEYWORDS \
                and im.group("name") not in KEYWORDS:
            # instance_definition_query: (type_identifier) + plain-identifier
            # init_declarator — pointers don't match (declarator must be
            # (identifier)); primitive types aren't type_identifiers.  The
            # link plane's add_instances class-existence filter drops
            # foreign typedefs (uint32_t & co), matching the reference.
            t = im.group("type")
            e = _span_end(clines, i) if "{" in clines[i] else i
            inst = ex.node("Instance", im.group("name"), path, i, e,
                           body(i, e), data_type=t)
            inst.meta["instance"] = t
        if not in_func(i):
            vm = _TOPVAR_RE.match(clines[i])
            if vm and vm.group("type") not in KEYWORDS - {"int", "char",
                                                          "long", "float",
                                                          "double"} \
                    and vm.group("name") not in KEYWORDS \
                    and not _FUNC_RE.match(clines[i]):
                ex.node("Var", vm.group("name"), path, i, i, lines[i])

    # ---------- endpoints (libonion / libmicrohttpd) ----------
    for i in range(n):
        for rx in (_ONION_RE, _MHD_RE):
            m = rx.search(nclines[i])
            if not m:
                continue
            ep_path, handler = m.group(1), m.group(2)
            if handler in ("NULL",):
                continue
            ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                         meta={"verb": "GET", "handler": handler})
            ex.mention(M_HANDLER, ep.ref(), handler)

    # ---------- function/test nodes + body scans ----------
    testfile = is_test_file(path)
    for name, s, e in funcs:
        fbody = body(s, e)
        if is_test(name, path):
            tt = classify_test(name, path, fbody)
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                tt, "unit")
            ex.node(tt, name, path, s, e, fbody, meta={"test_kind": kind})
            src_ref = (tt, name, path, s, None)
        else:
            ex.node("Function", name, path, s, e, fbody)
            src_ref = ("Function", name, path, s, None)
        _scan_body(ex, src_ref, path, lines, clines, s, e)

    return ex


def _scan_body(ex, src_ref, path, lines, clines, s, e):
    n = len(clines)
    pe = _paren_end(clines, s)
    idents: set[str] = set()
    dms: set[str] = set()
    for row in range(pe + 1, min(e, n - 1) + 1):
        line = clines[row]
        if "onion_url_add" in line or "MHD_" in line:
            continue  # endpoint rows handled above
        for m in _FIELD_CALL_RE.finditer(line):
            if m.group(2) not in KEYWORDS:
                ex.mention(M_CALL, src_ref, m.group(2), operand=m.group(1),
                           row=row)
        line_wo_field = _FIELD_CALL_RE.sub(" ", line)
        for m in _CALL_RE.finditer(line_wo_field):
            called = m.group(1)
            if called in KEYWORDS:
                continue
            ex.mention(M_CALL, src_ref, called, operand=None, row=row)
        for m in _IDENT_RE.finditer(line):
            idents.add(m.group(0))
        for m in _TYPEID_RE.finditer(line):
            dms.add(m.group(1))
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=sorted(idents))
    if dms:
        ex.mention(M_DM_WITHIN, src_ref, "", names=sorted(dms))
