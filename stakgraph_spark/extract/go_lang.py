"""Go extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's Go tree-sitter queries
(/root/reference/ast/src/lang/queries/go.rs):

* Var/Instance — top-level var/const specs (go.rs:73-94); `var X Type` with a
  type_identifier also emits an Instance with data_type (go.rs:115-126)
* Trait        — `type X interface` (go.rs:95-105)
* Class        — EVERY type_spec (go.rs:107-113); classes without any
  function carrying meta.operand == name are filtered by the clean pass
  (go.rs clean_graph -> filter_out_nodes_without_children)
* DataModel    — every type declaration (go.rs:438-447)
* Function     — func declarations; methods carry meta.operand = receiver
  type stripped of `*` and `[T]` (go.rs:380-407); the OPERAND edge itself is
  resolved in the link plane (class may live in another file)
* tests        — names ^(Test|Benchmark|Example) (go.rs:505-517), classified
  by path/filename/content (go.rs:468-503)
* Endpoint     — router verb calls, http.HandleFunc/Handle, anonymous func
  literals named {METHOD}_{path}_func_L{row} (go.rs:206-309)
* Request      — http.Get/Post/Head/PostForm/NewRequest (go.rs:326-351)
* calls        — identifier / selector calls; skip list per skips/go.rs
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_HANDLER, M_IDENT, M_IMPORT,
                   Extraction, trim_quotes)

M_OPERAND = "operand_cls"  # function -> receiver class name (link-plane resolve)

STDLIB_PACKAGES = {"fmt", "log", "errors", "strings", "strconv", "time", "math",
                   "os", "io", "bufio", "bytes", "sync", "json", "http", "net",
                   "context", "regexp", "sort", "path", "filepath"}
BUILTIN_FUNCTIONS = {"len", "cap", "make", "append", "copy", "delete", "panic",
                     "recover", "close", "new"}
KEYWORDS = {"if", "for", "switch", "func", "return", "go", "defer", "select",
            "range", "chan", "map", "interface", "struct", "case", "else",
            "var", "const", "type", "import", "package", "string", "int",
            "int32", "int64", "uint", "float32", "float64", "bool", "byte",
            "rune", "error", "any"}


def should_skip_call(called: str, operand: str | None) -> bool:
    if called in BUILTIN_FUNCTIONS:
        return True
    if operand is not None and operand in STDLIB_PACKAGES:
        return True
    return False


def classify_test(file: str, body: str) -> str:
    f = file.replace("\\", "/").lower()
    fname = f.rsplit("/", 1)[-1]
    if ("/tests/e2e/" in f or "/test/e2e/" in f or "/e2e/" in f
            or "e2e" in fname):
        return "E2eTest"
    if ("/tests/integration/" in f or "/test/integration/" in f
            or "/integration/" in f or "integration_test" in fname):
        return "IntegrationTest"
    if any(x in body for x in ("chromedp", "selenium", "playwright", "rod")):
        return "E2eTest"
    if "httptest.NewRecorder" in body or "net/http/httptest" in body:
        return "IntegrationTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, row: int) -> str:
    # go.rs:295-309 — '-' is NOT replaced (unlike python)
    clean = path.replace("/", "_").replace(":", "param_").lstrip("_")
    return f"{method.upper()}_{clean}_func_L{row}"


def mask_sources(content: str) -> tuple[str, str]:
    """(no_comments, code_only): comments blanked in both; string/rune
    literal CONTENTS blanked in code_only (quotes kept).  Line structure
    preserved."""
    n = len(content)
    nc = list(content)
    co = list(content)
    i = 0
    mode = None  # None | '//' | '/*' | '"' | '`' | "'"
    while i < n:
        c = content[i]
        if mode is None:
            if c == "/" and i + 1 < n and content[i + 1] == "/":
                mode = "//"
                nc[i] = co[i] = " "
            elif c == "/" and i + 1 < n and content[i + 1] == "*":
                mode = "/*"
                nc[i] = co[i] = " "
            elif c in ('"', "'", "`"):
                mode = c
        elif mode == "//":
            if c == "\n":
                mode = None
            else:
                nc[i] = co[i] = " "
        elif mode == "/*":
            if c == "*" and i + 1 < n and content[i + 1] == "/":
                nc[i] = co[i] = " "
                i += 1
                nc[i] = co[i] = " "
                mode = None
            elif c != "\n":
                nc[i] = co[i] = " "
        elif mode in ('"', "'"):
            if c == "\\" and i + 1 < n:
                co[i] = " "
                i += 1
                co[i] = " "
                continue_flag = True
            elif c == mode:
                mode = None
            elif c == "\n":
                mode = None  # unterminated
            else:
                co[i] = " "
        elif mode == "`":
            if c == "`":
                mode = None
            elif c != "\n":
                co[i] = " "
        i += 1
    return "".join(nc), "".join(co)


_FUNC_RE = re.compile(
    r"^func\s+(?:\((?P<recv>[^)]*)\)\s+)?(?P<name>[A-Za-z_]\w*)\s*(?:\[[^\]]*\])?\s*\(")
_TYPE_RE = re.compile(
    r"^type\s+(?P<name>[A-Za-z_]\w*)\s*(?:\[[^\]]*\])?\s*(?P<kind>struct\b|interface\b|=|\S+)?")
_TYPE_SPEC_RE = re.compile(
    r"^\s*(?P<name>[A-Z_a-z]\w*)\s*(?:\[[^\]]*\])?\s+(?P<kind>struct\b|interface\b|\S+)")
_VAR_RE = re.compile(r"^(?:var|const)\s+(?P<rest>[A-Za-z_].*)$")
_VAR_SPEC_RE = re.compile(
    r"^\s*(?P<name>[A-Za-z_]\w*)\s*(?P<rest>.*)$")
_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(")
_CHAIN_CALL_RE = re.compile(r"\)\s*\.\s*([A-Za-z_]\w*)\s*\(")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

_EP_VERB_RE = re.compile(
    r"\b[A-Za-z_]\w*\.(GET|POST|PUT|DELETE|PATCH|Get|Post|Put|Delete|Patch)\s*\(")
_HTTP_HANDLEFUNC_RE = re.compile(r"\bhttp\.(HandleFunc|handleFunc)\s*\(")
_HTTP_HANDLE_RE = re.compile(r"\bhttp\.(Handle|handle)\s*\(")
_REQ_RE = re.compile(r"\bhttp\.(Get|Post|Head|PostForm)\s*\(")
_NEWREQ_RE = re.compile(r"\bhttp\.NewRequest\s*\(")
_STR_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')


def _brace_delta(line: str) -> int:
    return line.count("{") - line.count("}") + line.count("(") - line.count(")")


class _Block:
    __slots__ = ("kind", "name", "start", "end", "recv")

    def __init__(self, kind, name, start, recv=None):
        self.kind = kind
        self.name = name
        self.start = start
        self.end = start
        self.recv = recv


def _clean_recv_type(recv: str) -> str | None:
    # receiver "(h *bountyHandler)" -> bountyHandler ; generic Stack[T] -> Stack
    parts = recv.strip().split()
    t = parts[-1] if parts else ""
    t = t.lstrip("*")
    if "[" in t:
        t = t[:t.index("[")]
    t = t.lstrip("*")
    return t or None


def extract_go(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith(".go"):
        return ex  # pkg files (go.mod/go.sum) are lib-query-only territory
    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    clines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)

    # ---------- top-level structure scan on code_only ----------
    funcs: list[_Block] = []       # kind 'func', recv = cleaned receiver type
    types: list[tuple[str, str, int, int]] = []  # (name, kind, start, end)
    var_specs: list[tuple[str, str | None, int, int]] = []  # (name, type, start, end)
    import_rows: list[int] = []

    depth = 0
    i = 0
    while i < n:
        cl = clines[i]
        stripped = cl.strip()
        if depth == 0:
            m = _FUNC_RE.match(cl)
            if m:
                start = i
                d = _brace_delta(cl)
                j = i
                while j + 1 < n and d > 0:
                    j += 1
                    d += _brace_delta(clines[j])
                recv = _clean_recv_type(m.group("recv")) if m.group("recv") else None
                b = _Block("func", m.group("name"), start, recv)
                b.end = j
                funcs.append(b)
                i = j + 1
                depth = 0
                continue
            m = _TYPE_RE.match(cl)
            if m and m.group("name") != "(":
                start = i
                d = _brace_delta(cl)
                j = i
                while j + 1 < n and d > 0:
                    j += 1
                    d += _brace_delta(clines[j])
                kind = (m.group("kind") or "").strip()
                kind = ("interface" if kind.startswith("interface")
                        else "struct" if kind.startswith("struct") else "other")
                types.append((m.group("name"), kind, start, j))
                i = j + 1
                continue
            if stripped.startswith("type ("):
                # grouped type block: scan specs line by line
                d = _brace_delta(cl)
                j = i
                while j + 1 < n and d > 0:
                    j += 1
                    d += _brace_delta(clines[j])
                    ms = _TYPE_SPEC_RE.match(clines[j])
                    if ms and ms.group("name") not in ("", ")"):
                        k = ("interface" if ms.group("kind").startswith("interface")
                             else "struct" if ms.group("kind").startswith("struct")
                             else "other")
                        d2 = _brace_delta(clines[j])
                        e = j
                        while e + 1 < n and d2 > 0:
                            e += 1
                            d2 += _brace_delta(clines[e])
                        types.append((ms.group("name"), k, j, e))
                i = j + 1
                continue
            m = _VAR_RE.match(cl)
            if m:
                rest = m.group("rest")
                if rest.startswith("("):
                    d = _brace_delta(cl)
                    j = i
                    while j + 1 < n and d > 0:
                        j += 1
                        d += _brace_delta(clines[j])
                        ms = _VAR_SPEC_RE.match(clines[j])
                        if ms and ms.group("name") not in ("", ")") \
                                and ms.group("name") not in KEYWORDS:
                            var_specs.append((ms.group("name"),
                                              _spec_type(ms.group("rest")), j, j))
                    i = j + 1
                    continue
                ms = _VAR_SPEC_RE.match(rest)
                if ms:
                    d = _brace_delta(cl)
                    j = i
                    while j + 1 < n and d > 0:
                        j += 1
                        d += _brace_delta(clines[j])
                    var_specs.append((ms.group("name"), _spec_type(ms.group("rest")), i, j))
                    i = j + 1
                    continue
            if stripped.startswith("import"):
                d = cl.count("(") - cl.count(")")
                j = i
                while j + 1 < n and d > 0:
                    j += 1
                    d += clines[j].count("(") - clines[j].count(")")
                import_rows.extend(range(i, j + 1))
                # per-import map entries: `alias "path/to/pkg"` — name is the
                # alias or the last path segment, module the quoted path
                # (resolve_import_name/path; feeds the cascade's import
                # strategy and the USES library join)
                for r in range(i, j + 1):
                    im = re.search(
                        r'^\s*(?:import\s*\(?\s*)?(?:([A-Za-z_]\w*|\.)\s+)?"([^"]+)"',
                        nclines[r])
                    if not im:
                        continue
                    mod = im.group(2)
                    alias = im.group(1)
                    name = alias if alias and alias != "." \
                        else mod.rsplit("/", 1)[-1]
                    ex.mention(M_IMPORT,
                               ("File", path.rsplit("/", 1)[-1], path, 0, None),
                               name, dst_file=mod, row=r)
                i = j + 1
                continue
        depth += _brace_delta(cl)
        i += 1

    def body(s: int, e: int) -> str:
        return "\n".join(lines[s:e + 1])

    # ---------- import section ----------
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- vars + instances ----------
    for name, vtype, s, e in var_specs:
        ex.node("Var", name, path, s, e, body(s, e))
        if vtype is not None:
            inst = ex.node("Instance", name, path, s, e, body(s, e),
                           data_type=vtype)
            inst.meta["instance"] = vtype

    # ---------- types: Trait / Class / DataModel ----------
    for name, kind, s, e in types:
        b = body(s, e)
        if kind == "interface":
            ex.node("Trait", name, path, s, e, b)
        ex.node("Class", name, path, s, e, b)
        ex.node("DataModel", name, path, s, e, b)

    # ---------- functions / tests ----------
    for f in funcs:
        fbody = body(f.start, f.end)
        is_test = (f.name.startswith("Test") or f.name.startswith("Benchmark")
                   or f.name.startswith("Example"))
        if is_test and f.recv is None:
            ntype = classify_test(path, fbody)
            meta = {"test_kind": {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(ntype, "unit")}
            ex.node(ntype, f.name, path, f.start, f.end, fbody, meta=meta)
            src_ref = (ntype, f.name, path, f.start, None)
        else:
            meta = {}
            if f.recv:
                meta["operand"] = f.recv
                ex.mention(M_OPERAND, ("Function", f.name, path, f.start, None),
                           f.recv)
            ex.node("Function", f.name, path, f.start, f.end, fbody, meta=meta)
            src_ref = ("Function", f.name, path, f.start, None)

        _scan_function_body(ex, src_ref, path, lines, clines, nclines,
                            f.start, f.end, is_test=is_test and f.recv is None)

    # NESTED_IN by row-range containment (parse/collect.rs:733-778) — go
    # nested funcs are rare (closures aren't function_declarations) but the
    # pass keeps prune semantics aligned
    plain = [f for f in funcs
             if not (f.name.startswith(("Test", "Benchmark", "Example"))
                     and f.recv is None)]
    for child in plain:
        for parent in plain:
            if child is not parent and child.start > parent.start \
                    and child.end < parent.end:
                ex.edge("NestedIn",
                        ("Function", child.name, path, child.start, None),
                        ("Function", parent.name, path, parent.start, None))

    return ex


def _spec_type(rest: str) -> str | None:
    """var_spec tail -> type identifier when the spec is `name Type [= ...]`
    with a plain type_identifier (instance query, go.rs:115-126)."""
    rest = rest.strip()
    if not rest or rest.startswith("="):
        return None
    t = rest.split("=")[0].strip()
    if re.fullmatch(r"[A-Za-z_]\w*", t) and t not in KEYWORDS:
        return t
    return None


def _scan_function_body(ex: Extraction, src_ref, path, lines, clines, nclines,
                        s, e, is_test=False):
    code = "\n".join(clines[s:e + 1])          # strings+comments blanked
    idents: set[str] = set()
    dm_names: set[str] = set()
    handled_rows: set[int] = set()
    # requests inside test functions are dropped with the function tuple
    # (filter_tests, lang/mod.rs:708-726); endpoints are skipped for whole
    # *_test.go files (process_endpoints stage, stages.rs:488)
    emit_requests = not is_test
    emit_endpoints = not path.endswith("_test.go")

    # requests/endpoints first (their calls are also plain call matches);
    # http.Get(url) is a Request, r.Get(path, handler) an Endpoint — the
    # endpoint query needs a handler or func-literal second argument
    for off, line in enumerate(nclines[s:e + 1]):
        row = s + off
        m = _REQ_RE.search(line)
        if m and emit_requests:
            strs = _STR_RE.findall(line)
            if strs:
                verb = {"Get": "GET", "Post": "POST", "Head": "HEAD",
                        "PostForm": "POST"}[m.group(1)]
                req = ex.node("Request", strs[0], path, row, row,
                              lines[row], meta={"verb": verb})
                ex.edge("Calls", src_ref, req.ref())
                handled_rows.add(row)
                continue
        m = _EP_VERB_RE.search(line)
        if m and emit_endpoints:
            strs = _STR_RE.findall(line)
            if strs:
                ep_path = strs[0]
                verb = m.group(1).upper()
                after = line[m.end():]
                if re.search(r"func\s*\(", after):
                    fname = anonymous_handler_name(m.group(1), ep_path, row)
                    fe = _span_end(clines, row, len(clines) - 1)
                    ex.node("Function", fname, path, row,
                            fe, "\n".join(lines[row:fe + 1]))
                    _emit_endpoint(ex, ep_path, verb, fname, path, row, line)
                    handled_rows.add(row)
                    continue
                h = re.search(r",\s*([A-Za-z_][\w.]*)\s*\)?\s*$", after.rstrip())
                if h:
                    handler = h.group(1).split(".")[-1]
                    _emit_endpoint(ex, ep_path, verb, handler, path, row, line)
                    handled_rows.add(row)
                    continue
        m = _HTTP_HANDLEFUNC_RE.search(line) or _HTTP_HANDLE_RE.search(line)
        if m and emit_endpoints:
            strs = _STR_RE.findall(line)
            if strs:
                ep_path = strs[0]
                # ENDPOINT_VERB capture is the field name uppercased —
                # "HANDLEFUNC"/"HANDLE" (format.rs:403-404), not a real verb
                verb = m.group(1).upper()
                after = line[m.end():]
                if re.search(r"func\s*\(", after):
                    fname = anonymous_handler_name(m.group(1), ep_path, row)
                    fe = _span_end(clines, row, len(clines) - 1)
                    ex.node("Function", fname, path, row, fe,
                            "\n".join(lines[row:fe + 1]))
                    _emit_endpoint(ex, ep_path, verb, fname, path, row, line)
                else:
                    ids = re.findall(r"[,(]\s*(?:http\.HandlerFunc\s*\(\s*)?([A-Za-z_][\w.]*)\s*\)*\s*,?\s*$",
                                     after.rstrip())
                    handler = ids[-1].split(".")[-1] if ids else None
                    if handler and handler not in ("HandlerFunc",):
                        _emit_endpoint(ex, ep_path, verb, handler, path, row, line)
                handled_rows.add(row)
                continue
        m = _NEWREQ_RE.search(line)
        if m and emit_requests:
            strs = _STR_RE.findall(line)
            if len(strs) >= 2:
                verb = next((v for v in ("GET", "POST", "PUT", "DELETE", "PATCH")
                             if v == strs[0].upper() or f'"{v}"' in lines[row]), None)
                meta = {"verb": verb or "GET"}
                req = ex.node("Request", strs[1], path, row, row, lines[row],
                              meta=meta)
                ex.edge("Calls", src_ref, req.ref())
                handled_rows.add(row)
                continue

    # calls + idents on blanked code
    for off, line in enumerate(code.split("\n")):
        row = s + off
        if row in handled_rows:
            continue
        if _FUNC_RE.match(clines[row]):
            continue
        for m in _CALL_RE.finditer(line):
            chain = m.group(1)
            parts = chain.split(".")
            called = parts[-1]
            operand = ".".join(parts[:-1]) if len(parts) > 1 else None
            if called in KEYWORDS or (operand is not None
                                      and parts[0] in KEYWORDS):
                continue
            if should_skip_call(called, operand):
                continue
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row)
        for m in _CHAIN_CALL_RE.finditer(line):
            called = m.group(1)
            if called not in KEYWORDS and not should_skip_call(called, None):
                ex.mention(M_CALL, src_ref, called, operand=None, row=row)
    for m in _IDENT_RE.finditer(code):
        idents.add(m.group(0))
    for m in _TYPEID_RE.finditer(code):
        dm_names.add(m.group(1))
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=sorted(idents))
    if dm_names:
        ex.mention(M_DM_WITHIN, src_ref, "", names=sorted(dm_names))


def _span_end(clines, row, last):
    d = _brace_delta(clines[row])
    j = row
    while j < last and d > 0:
        j += 1
        d += _brace_delta(clines[j])
    return j


def _emit_endpoint(ex: Extraction, ep_path, verb, handler, path, row, line):
    meta = {"handler": handler}
    meta["verb"] = verb if verb else "GET"
    ep = ex.node("Endpoint", trim_quotes(ep_path), path, row, row, line,
                 meta=meta)
    ex.mention(M_HANDLER, ep.ref(), handler)
