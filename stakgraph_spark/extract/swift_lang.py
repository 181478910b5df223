"""Swift extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's Swift tree-sitter queries
(/root/reference/ast/src/lang/queries/swift.rs):

* Class      — class_declaration: class / struct / enum / actor / extension
               (all class_declaration nodes in the swift grammar; extensions
               match the `(user_type)` name variant, swift.rs:60-72);
               protocols are NOT classes
* DataModel  — non-extension class declarations in files whose path contains
               "CoreData" (data_model_query captures (type_identifier) only,
               + data_model_path_filter, swift.rs:190-203)
* Function   — function_declaration (`func`, incl. static/class funcs);
               init_declaration never yields a name -> no node; protocol
               requirement funs are protocol_function_declaration -> excluded
               (swift.rs:74-85)
* Operand    — every function's nearest enclosing class_declaration with a
               (type_identifier) name (extensions return None)
               (find_function_parent, swift.rs:115-143)
* Var        — TOP-LEVEL property_declaration only (swift.rs:47-59)
* tests      — funs named test*; /UITests/ or XCUIApplication -> E2eTest,
               /IntegrationTests/ -> IntegrationTest, else UnitTest
               (swift.rs:219-290)
* Request    — bare `createRequest(...)` invocations; name = last /-segment
               of the url: argument, verb from `method: "X"` / bodyParams:
               nil -> GET default (request_finder swift.rs:145-153,
               add_endpoint_verb swift.rs:154-188)
* imports    — import_declaration section node (swift.rs:37-45)
"""

from __future__ import annotations

import re

from .base import M_CALL, M_DM_WITHIN, M_IDENT, M_IMPORT, Extraction

from .go_lang import mask_sources

_MODS = r"(?:(?:public|private|internal|fileprivate|open|final|static|class|override|required|convenience|lazy|weak|unowned|indirect|mutating|nonisolated|dynamic)\s+)*"
_ANNO = r"(?:@[\w.]+(?:\([^)]*\))?\s+)*"

_TYPE_RE = re.compile(
    rf"^\s*{_ANNO}{_MODS}(?P<kind>class|struct|enum|extension|actor|protocol)\s+(?P<name>[A-Za-z_]\w*)")
_FUN_RE = re.compile(
    rf"^\s*{_ANNO}{_MODS}func\s+(?P<name>[A-Za-z_]\w*)\s*(?:<[^>]*>)?\s*\(")
_TOPVAL_RE = re.compile(rf"^{_ANNO}(?:public\s+|private\s+|internal\s+)?(?:let|var)\s+(?P<name>[A-Za-z_]\w*)")
_IMPORT_RE = re.compile(r"^\s*(?:@testable\s+)?import\s+([\w.]+)")
_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*(?:[.?!][A-Za-z_]\w*)*)\s*\(")
_LAMBDA_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*(?:[.?!][A-Za-z_]\w*)*)\s*\{")
_CHAIN_CALL_RE = re.compile(r"[)\]}]\s*[.?!]+\s*([A-Za-z_]\w*)\s*[({]")
_LEAD_CHAIN_RE = re.compile(r"^\s*[.?!]+\s*([A-Za-z_]\w*)\s*[({]")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

KEYWORDS = {"if", "else", "guard", "switch", "case", "for", "while", "repeat",
            "do", "try", "catch", "return", "throw", "func", "let", "var",
            "class", "struct", "enum", "extension", "protocol", "actor",
            "init", "deinit", "super", "self", "is", "in", "as", "where",
            "import", "true", "false", "nil", "defer", "typealias", "print"}

CTRL_LINE = ("switch ", "guard ", "if ", "for ", "while ", "else", "case ",
             "do ", "do{", "catch", "repeat")


def _brace_delta(line: str) -> int:
    return line.count("{") - line.count("}")


def _span_end(clines: list[str], row: int) -> int:
    j = row
    while j < len(clines) and "{" not in clines[j]:
        j += 1
    if j >= len(clines):
        return len(clines) - 1
    d = _brace_delta(clines[j])
    while j + 1 < len(clines) and d > 0:
        j += 1
        d += _brace_delta(clines[j])
    return j


def _paren_end(clines: list[str], row: int) -> int:
    d = clines[row].count("(") - clines[row].count(")")
    j = row
    while j + 1 < len(clines) and d > 0:
        j += 1
        d += clines[j].count("(") - clines[j].count(")")
    return j


def is_test_file(path: str) -> bool:
    f = path.replace("\\", "/")
    return ("/Tests/" in f or "/UITests/" in f or f.endswith("Tests.swift")
            or f.endswith("Test.swift"))


def classify_test(file: str, body: str) -> str:
    f = file.replace("\\", "/")
    if "/UITests/" in f or "import XCUITest" in body or "XCUIApplication" in body:
        return "E2eTest"
    if "/IntegrationTests/" in f:
        return "IntegrationTest"
    return "UnitTest"


def extract_swift(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith(".swift"):
        return ex
    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    clines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)

    def body(s, e):
        return "\n".join(lines[s:min(e, n - 1) + 1])

    # ---------- imports ----------
    import_rows = [i for i in range(n) if _IMPORT_RE.match(clines[i])]
    for i in import_rows:
        name = _IMPORT_RE.match(clines[i]).group(1)
        ex.mention(M_IMPORT, ("File", path.rsplit("/", 1)[-1], path, 0, None),
                   name, dst_file=name, row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- type declarations ----------
    types: list[tuple] = []  # (kind, name, start, end)
    for i in range(n):
        m = _TYPE_RE.match(clines[i])
        if not m or m.group("name") in ("var", "let", "func"):
            continue
        types.append((m.group("kind"), m.group("name"), i, _span_end(clines, i)))

    def enclosing_type(row: int):
        best = None
        for t in types:
            if t[2] < row <= t[3]:
                if best is None or t[2] > best[2]:
                    best = t
        return best

    is_coredata = "CoreData" in path
    for kind, name, s, e in types:
        if kind == "protocol":
            continue
        ex.node("Class", name, path, s, e, body(s, e))
        if is_coredata and kind != "extension":
            ex.node("DataModel", name, path, s, e, body(s, e))

    # ---------- functions / tests ----------
    funcs: list[tuple] = []
    for i in range(n):
        m = _FUN_RE.match(clines[i])
        if not m:
            continue
        enc = enclosing_type(i)
        if enc is not None and enc[0] == "protocol":
            continue  # protocol requirements are not function_declarations
        pe = _paren_end(clines, i)
        j = pe
        while j < n and "{" not in clines[j] and clines[j].strip():
            j += 1
        end = _span_end(clines, j) if j < n and "{" in clines[j] else pe
        funcs.append((m.group("name"), i, min(end, n - 1), enc))

    for name, s, e, enc in funcs:
        fbody = body(s, e)
        if name.startswith("test"):
            ntype = classify_test(path, fbody)
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                ntype, "unit")
            ex.node(ntype, name, path, s, e, fbody, meta={"test_kind": kind})
            src_ref = (ntype, name, path, s, None)
        else:
            meta = {}
            if enc is not None and enc[0] in ("class", "struct", "enum",
                                              "actor"):
                meta["operand"] = enc[1]
            ex.node("Function", name, path, s, e, fbody, meta=meta)
            src_ref = ("Function", name, path, s, None)
            if meta.get("operand"):
                ex.edge("Operand", ("Class", enc[1], path, enc[2], None),
                        src_ref)
        _scan_body(ex, src_ref, path, lines, clines, nclines, s, e, funcs)

    # ---------- top-level Vars ----------
    depth = 0
    for i in range(n):
        if depth == 0 and not any(ts <= i <= te for _, _, ts, te in types) \
                and not any(fs <= i <= fe for _, fs, fe, _ in funcs):
            m = _TOPVAL_RE.match(clines[i])
            if m and m.group("name") not in ("var", "let"):
                ex.node("Var", m.group("name"), path, i, i, lines[i])
        depth += _brace_delta(clines[i])

    return ex


def _scan_body(ex, src_ref, path, lines, clines, nclines, s, e, funcs):
    n = len(clines)
    pe = _paren_end(clines, s)

    # bare createRequest(...) invocations -> Request nodes (request_finder)
    for row in range(pe, min(e, n - 1) + 1):
        for m in re.finditer(r"(?<![\w.])createRequest\s*\(", clines[row]):
            span_end = _paren_end(clines, row)
            seg = "\n".join(nclines[row:span_end + 1])
            name = ""
            up = seg.find("url:")
            if up != -1:
                qm = re.search(r'"((?:[^"\\]|\\.)*)"', seg[up:])
                if qm:
                    url = qm.group(1)
                    sl = url.rfind("/")
                    if sl != -1:
                        name = url[sl:]
            verb = None
            for v in ("GET", "POST", "PUT", "DELETE"):
                if f'method: "{v}"' in seg:
                    verb = v
                    break
            if verb is None and "bodyParams: nil" in seg:
                verb = "GET"
            if name:
                req = ex.node("Request", name, path, row, span_end,
                              "\n".join(lines[row:span_end + 1]),
                              meta={"verb": verb or "GET"})
                ex.edge("Calls", src_ref, req.ref())

    for row in range(pe + 1, min(e, n - 1) + 1):
        line = clines[row]
        ls = line.strip()
        if _TYPE_RE.match(line) or _FUN_RE.match(line):
            continue
        if any(fs < row <= fe and fs > s for _, fs, fe, _ in funcs):
            continue
        seen_here = set()
        for m in _CALL_RE.finditer(line):
            chain = re.split(r"[.?!]+", m.group(1))
            called = chain[-1]
            if called in KEYWORDS or chain[0] in KEYWORDS - {"self"}:
                continue
            operand = ".".join(c for c in chain[:-1] if c != "self") or None
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row)
            seen_here.add((called, operand))
        if not any(ls.startswith(k) for k in CTRL_LINE):
            for m in _LAMBDA_CALL_RE.finditer(line):
                chain = re.split(r"[.?!]+", m.group(1))
                called = chain[-1]
                if called in KEYWORDS or chain[0] in KEYWORDS - {"self"}:
                    continue
                operand = ".".join(c for c in chain[:-1] if c != "self") or None
                if (called, operand) not in seen_here:
                    ex.mention(M_CALL, src_ref, called, operand=operand,
                               row=row)
        for m in _CHAIN_CALL_RE.finditer(line):
            if m.group(1) not in KEYWORDS:
                ex.mention(M_CALL, src_ref, m.group(1), operand=None, row=row)
        lm = _LEAD_CHAIN_RE.match(line)
        if lm and lm.group(1) not in KEYWORDS:
            ex.mention(M_CALL, src_ref, lm.group(1), operand=None, row=row)

    code = "\n".join(clines[s:min(e, n - 1) + 1])
    idents = sorted({m.group(0) for m in _IDENT_RE.finditer(code)})
    dms = sorted({m.group(1) for m in _TYPEID_RE.finditer(code)})
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=idents)
    if dms:
        ex.mention(M_DM_WITHIN, src_ref, "", names=dms)
