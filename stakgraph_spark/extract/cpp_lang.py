"""C++ extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's C++ tree-sitter queries
(/root/reference/ast/src/lang/queries/cpp.rs):

* Class      — top-level class specifiers (translation_unit anchored,
               cpp.rs:117-130); base clause -> meta.parent
* DataModel  — named struct specifiers WITH a body (cpp.rs:254-264)
* Function   — function definitions incl. qualified/ref/template returns
* Var        — top-level declarations (cpp.rs:98-116)
* tests      — test files (tests/, test_*.cpp/.cu) make every function a
               test; classify by integration/e2e markers in the NAME
               (cpp.rs:266-313)
* Endpoint   — Crow routes (endpoint_finders cpp.rs:315-409):
               `CROW_ROUTE(app, "/p")([]{ return handler(...); })` -> verb
               ANY + handler = the returned call;
               `.methods("POST"_method)` -> verb POST + an anonymous
               {VERB}_{path}_lambda_L{lambda_row} Function with a NestedIn
               edge to the enclosing function (generate_anonymous_handler_name
               cpp.rs:410-429); a lambda with no returned call and no verb
               yields NO endpoint
* imports    — #include section node
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_IDENT, M_IMPORT, Extraction,
                   trim_quotes)
from .go_lang import mask_sources
from .java_lang import _paren_end, _span_end

_FUNC_RE = re.compile(
    r"^(?:static\s+|inline\s+|extern\s+|const\s+|constexpr\s+|virtual\s+"
    r"|__global__\s+|__device__\s+|__host__\s+)*"
    r"(?P<ret>[A-Za-z_][\w:<>,\s]*?[&*]?)\s+"
    r"(?:[A-Za-z_]\w*::)*(?P<name>[A-Za-z_]\w*)\s*\(")
_CLASS_RE = re.compile(
    r"^(?:template\s*<[^>]*>\s*)?class\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s*:\s*(?:public\s+|private\s+|protected\s+)?(?P<parent>[A-Za-z_]\w*))?")
_STRUCT_RE = re.compile(r"^\s*struct\s+(?P<name>[A-Za-z_]\w*)\s*(?:\{|$)")
_INCLUDE_RE = re.compile(r'^\s*#\s*include\s+(?P<path>["<][^">]+[">])')
_TOPVAR_RE = re.compile(
    r"^(?:static\s+|const\s+|constexpr\s+|extern\s+)*"
    r"(?P<type>[A-Za-z_][\w:<>]*)\s+(?P<name>[A-Za-z_]\w*)\s*[={;]")
_CROW_RE = re.compile(
    r"CROW_(?:ROUTE|WEBSOCKET_ROUTE|BP_ROUTE)\s*\(\s*[A-Za-z_]\w*\s*,\s*\"((?:[^\"\\]|\\.)*)\"\s*\)")
_METHODS_RE = re.compile(r'\.methods\s*\(\s*"(\w+)"_method')
_RET_CALL_RE = re.compile(r"return\s+([A-Za-z_]\w*)\s*\(")
_CALL_RE = re.compile(r"(?<![\w.:>])([A-Za-z_]\w*)\s*\(")
_MEMBER_CALL_RE = re.compile(
    r"([A-Za-z_]\w*)\s*(?:\.|->|::)\s*([A-Za-z_]\w*)\s*\(")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

KEYWORDS = {"if", "else", "for", "while", "do", "switch", "return", "sizeof",
            "case", "break", "continue", "goto", "typedef", "struct", "enum",
            "union", "class", "static", "const", "constexpr", "extern",
            "void", "int", "char", "long", "short", "float", "double",
            "unsigned", "signed", "bool", "auto", "new", "delete", "throw",
            "try", "catch", "template", "typename", "namespace", "using",
            "public", "private", "protected", "operator", "defined"}
BAD_RET = {"return", "if", "while", "for", "switch", "case", "else", "goto",
           "typedef", "sizeof", "do", "throw", "new", "delete", "using",
           "namespace", "else"}


def is_test_file(path: str) -> bool:
    f = path.replace("\\", "/").lower()
    name = f.rsplit("/", 1)[-1]
    return ("/test/" in f or "/tests/" in f or "/integration/" in f
            or "/e2e/" in f or name.startswith("test_")
            or name.endswith("_test.cpp") or name.endswith(".test.cpp")
            or name.endswith("_test.cu"))


def is_test(name: str, path: str) -> bool:
    n = name.lower()
    return (is_test_file(path) or n.startswith("test_")
            or n.endswith("_test") or n.startswith("it_"))


def classify_test(name: str, file: str, body: str) -> str:
    f = file.replace("\\", "/").lower()
    n = name.lower()
    if "/e2e/" in f or "e2e" in n:
        return "E2eTest"
    if "/integration/" in f or ".integration." in f or "integration" in n:
        return "IntegrationTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, line: int) -> str:
    m = method.strip()
    if m.upper().endswith("_METHOD"):
        m = m[: -len("_method")]
    m = trim_quotes(m).upper()
    clean = path.replace("/", "_").replace(":", "param_").lstrip("_")
    return f"{m}_{clean}_lambda_L{line}"


def extract_cpp(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith((".cpp", ".hpp", ".cc", ".cxx", ".hxx", ".h", ".cu")):
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
        p = trim_quotes(_INCLUDE_RE.match(nclines[i]).group("path").strip("<>"))
        ex.mention(M_IMPORT, ("File", path.rsplit("/", 1)[-1], path, 0, None),
                   p.rsplit("/", 1)[-1].rsplit(".", 1)[0], dst_file=p, row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- classes / structs ----------
    claimed: set[int] = set()
    for i in range(n):
        cm = _CLASS_RE.match(clines[i])
        if cm:
            e = _span_end(clines, i)
            meta = {}
            if cm.group("parent"):
                meta["parent"] = cm.group("parent")
            ex.node("Class", cm.group("name"), path, i, e, body(i, e),
                    meta=meta)
            claimed.update(range(i, e + 1))
            continue
        sm = _STRUCT_RE.match(clines[i])
        if sm and "{" in " ".join(clines[i:min(i + 2, n)]):
            e = _span_end(clines, i)
            ex.node("DataModel", sm.group("name"), path, i, e, body(i, e))
            claimed.update(range(i, e + 1))

    # ---------- functions ----------
    funcs: list[tuple] = []
    func_spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        cl = clines[i]
        if i in claimed or not cl.strip() or cl.lstrip().startswith("#") \
                or any(fs <= i <= fe for fs, fe in func_spans):
            i += 1
            continue
        m = _FUNC_RE.match(cl)
        if m and m.group("name") not in KEYWORDS \
                and m.group("ret").split()[0].split("<")[0].split("::")[0] \
                not in BAD_RET and "CROW_" not in cl:
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

    def enclosing_fun(row):
        for name, fs, fe in funcs:
            if fs < row <= fe:
                return (name, fs)
        return None

    # ---------- Crow endpoints ----------
    for i in range(n):
        m = _CROW_RE.search(nclines[i])
        if not m:
            continue
        ep_path = m.group(1)
        window = " ".join(nclines[i:min(i + 3, n)])
        vm = _METHODS_RE.search(window)
        # the lambda row: first following line whose statement starts with ([
        lam = None
        for r in range(i, min(i + 4, n)):
            if re.match(r"^\s*(?:\.methods[^(]*\([^)]*\)\s*)?\(\s*\[",
                        clines[r]) and "]" in clines[r]:
                lam = r
                break
        le = _span_end(clines, lam) if lam is not None else i
        if vm:
            verb = vm.group(1).upper()
            handler = anonymous_handler_name(verb, ep_path, lam if lam is not None else i)
            fn_ref = ("Function", handler, path, lam if lam is not None else i, None)
            ex.node("Function", handler, path,
                    lam if lam is not None else i, le, body(i, le))
            enc = enclosing_fun(i)
            if enc:
                ex.edge("NestedIn", fn_ref,
                        ("Function", enc[0], path, enc[1], None))
            ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                         meta={"verb": verb, "handler": handler})
            ex.edge("Handler", ep.ref(), fn_ref)
        else:
            rc = None
            if lam is not None:
                seg = "\n".join(nclines[lam:le + 1])
                rm = _RET_CALL_RE.search(seg)
                if rm:
                    rc = rm.group(1)
            if rc:
                ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                             meta={"verb": "ANY", "handler": rc})
                from .base import M_HANDLER
                ex.mention(M_HANDLER, ep.ref(), rc)
            # no verb and no returned call -> no endpoint (cpp.rs arm shapes)

    # ---------- top-level vars ----------
    for i in range(n):
        if i in claimed or any(fs <= i <= fe for fs, fe in func_spans) \
                or clines[i].lstrip().startswith("#"):
            continue
        vm = _TOPVAR_RE.match(clines[i])
        if vm and vm.group("name") not in KEYWORDS \
                and vm.group("type").split("::")[0].split("<")[0] not in BAD_RET \
                and not _FUNC_RE.match(clines[i]):
            ex.node("Var", vm.group("name"), path, i, i, lines[i])

    # ---------- function/test nodes + body scans ----------
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
        if "CROW_" in line:
            continue
        for m in _MEMBER_CALL_RE.finditer(line):
            if m.group(2) not in KEYWORDS:
                ex.mention(M_CALL, src_ref, m.group(2), operand=m.group(1),
                           row=row)
        line_plain = _MEMBER_CALL_RE.sub(" ", line)
        for m in _CALL_RE.finditer(line_plain):
            if m.group(1) not in KEYWORDS:
                ex.mention(M_CALL, src_ref, m.group(1), operand=None, row=row)
        for m in _IDENT_RE.finditer(line):
            idents.add(m.group(0))
        for m in _TYPEID_RE.finditer(line):
            dms.add(m.group(1))
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=sorted(idents))
    if dms:
        ex.mention(M_DM_WITHIN, src_ref, "", names=sorted(dms))
