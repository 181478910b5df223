"""PHP extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's PHP tree-sitter queries
(/root/reference/ast/src/lang/queries/php.rs):

* Class      — class/interface/trait declarations (php.rs:85-123);
               base_clause extends -> meta.parent (ParentOf), implements /
               body `use` traits -> meta.includes
* Function   — function_definition + method_declaration incl. __construct;
               methods carry meta.operand = enclosing class + Operand edge
               (find_function_parent php.rs:430-458)
* Var        — expression-statement assignments `$x = ...` at ANY scope,
               name keeps the sigil (variables_query php.rs:184-193)
* tests      — every function in a test file is a test (is_test
               php.rs:199-231); Pest `test('..')`/`it('..')` calls become
               EMPTY-NAME test nodes; classification per classify_test
               (php.rs:233-270: /feature|/api|$this->get( -> IntegrationTest,
               dusk/panther//e2e/ -> E2eTest, else UnitTest)
* Endpoint   — Laravel Route::{verb}(...) direct, chained
               (Route::middleware(..)->get(..)), closure/arrow handlers with
               generated `{verb}_{path}_handler_L{row}` Functions
               (php.rs:306-416, generate_anonymous_handler_name :607-630),
               Route::resource/apiResource REST expansion (handler_finder
               php.rs:632-733: endpoints KEPT when the action is missing),
               Route::controller(X::class) group context, Symfony #[Route]
               method attributes
* handler    — `[Controller::class, 'method']` -> php_handler mention
               resolved in the link plane against functions in
               {Controller}.php (basename match); same-file handlers get
               direct edges
* imports    — namespace_use_declaration + require/include section node
               (php.rs:65-83)
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_IDENT, M_IMPORT, Extraction,
                   trim_quotes)
from .go_lang import mask_sources

M_PHP_HANDLER = "php_handler"

_CLASS_RE = re.compile(
    r"^\s*(?:(?:final|abstract|readonly)\s+)*(?P<kind>class|interface|trait)\s+"
    r"(?P<name>[A-Za-z_]\w*)")
_FUN_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|final|abstract)\s+)*"
    r"function\s+&?\s*(?P<name>[A-Za-z_]\w*)\s*\(")
_USE_RE = re.compile(r"^\s*use\s+(?P<path>\\?[\w\\]+)(?:\s+as\s+\w+)?\s*;")
_REQUIRE_RE = re.compile(r"^\s*(?:require|require_once|include|include_once)\b")
_VAR_RE = re.compile(r"^\s*(?P<name>\$[A-Za-z_]\w*)\s*=(?![=>])")
_ROUTE_RE = re.compile(
    r"Route::(?:[\w]+\([^)]*\)\s*->\s*)*(?P<verb>get|post|put|delete|patch|options)"
    r"\s*\(\s*(?P<q>['\"])(?P<path>[^'\"]*)(?P=q)\s*,?\s*(?P<rest>.*)$")
_ROUTE_RES_RE = re.compile(
    r"Route::(?:[\w]+\([^)]*\)\s*->\s*)*(?P<verb>resource|apiResource)"
    r"\s*\(\s*(?P<q>['\"])(?P<name>[^'\"]*)(?P=q)\s*,\s*(?P<ctrl>[\w\\]+)::class")
_ROUTE_CTRL_RE = re.compile(r"Route::controller\s*\(\s*(?P<ctrl>[\w\\]+)::class")
_ARRAY_HANDLER_RE = re.compile(
    r"^\[\s*(?P<ctrl>[\w\\]+)::class\s*,\s*['\"](?P<method>\w+)['\"]")
_STR_HANDLER_RE = re.compile(r"^['\"](?P<method>\w+)['\"]")
_CLOSURE_RE = re.compile(r"^(?:function\b|fn\s*\()")
_SYMFONY_ROUTE_RE = re.compile(
    r"^\s*#\[Route\s*\(\s*['\"](?P<path>[^'\"]*)['\"]")
_PEST_RE = re.compile(r"^\s*(?:test|it)\s*\(\s*['\"]")
_TEST_ATTR_RE = re.compile(r"^\s*#\[Test\]")
_CALL_RE = re.compile(r"(?<![\w$>:])([A-Za-z_]\w*)\s*\(")
_MEMBER_CALL_RE = re.compile(
    r"(?P<obj>\$[\w>\-$\[\]']+|\w+(?:\(\))?)\s*->\s*(?P<name>[A-Za-z_]\w*)\s*\(")
_SCOPED_CALL_RE = re.compile(
    r"(?P<scope>[A-Za-z_]\w*)::(?P<name>[A-Za-z_]\w*)\s*\(")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

KEYWORDS = {"if", "else", "elseif", "for", "foreach", "while", "do", "switch",
            "match", "return", "echo", "print", "new", "function", "fn",
            "use", "require", "require_once", "include", "include_once",
            "isset", "unset", "empty", "array", "list", "try", "catch",
            "throw", "static", "declare", "exit", "die", "clone"}


def _brace_delta(line: str) -> int:
    return line.count("{") - line.count("}")


def _span_end(clines, row):
    j = row
    while j < len(clines) and "{" not in clines[j]:
        if clines[j].rstrip().endswith(";"):
            return j
        j += 1
    if j >= len(clines):
        return len(clines) - 1
    d = _brace_delta(clines[j])
    while j + 1 < len(clines) and d > 0:
        j += 1
        d += _brace_delta(clines[j])
    return j


def _paren_end(clines, row):
    d = clines[row].count("(") - clines[row].count(")")
    j = row
    while j + 1 < len(clines) and d > 0:
        j += 1
        d += clines[j].count("(") - clines[j].count(")")
    return j


def is_test_file(path: str) -> bool:
    f = path.lower()
    return (f.endswith("test.php") or f.endswith("_test.php")
            or "/tests/" in f or "/test/" in f or "/spec/" in f)


def classify_test(name: str, file: str, body: str) -> str:
    f = file.lower()
    b = body.lower()
    if ("/e2e/" in f or "/browser/" in f or "/acceptance/" in f
            or "dusk" in b or "panther" in b):
        return "E2eTest"
    if ("/feature/" in f or "/integration/" in f or "/api/" in f
            or "$this->get(" in b or "$this->post(" in b
            or "$this->json(" in b or "actingas" in b):
        return "IntegrationTest"
    if "/unit/" in f or "/models/" in f or "/services/" in f:
        return "UnitTest"
    ln = name.lower()
    if "e2e" in ln or "browser" in ln:
        return "E2eTest"
    if "integration" in ln or "feature" in ln or "api" in ln:
        return "IntegrationTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, line: int) -> str:
    clean = (path.replace("/", "_").replace(":", "param_")
             .replace("-", "_").replace(" ", "_").strip("_"))
    if not clean or clean == "_":
        return f"{method.lower()}_handler_L{line}"
    return f"{method.lower()}_{clean}_handler_L{line}"


def _singular(name: str) -> str:
    if name.endswith("ies"):
        return name[:-3] + "y"
    if name.endswith("s") and not name.endswith("ss"):
        return name[:-1]
    return name


RESOURCE_ACTIONS = [  # (action, verb, path template) — php.rs:681-708
    ("index", "GET", "/{r}"),
    ("store", "POST", "/{r}"),
    ("show", "GET", "/{r}/{{{s}}}"),
    ("update", "PUT", "/{r}/{{{s}}}"),
    ("destroy", "DELETE", "/{r}/{{{s}}}"),
]
RESOURCE_EXTRA = [
    ("create", "GET", "/{r}/create"),
    ("edit", "GET", "/{r}/{{{s}}}/edit"),
]


def extract_php(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith(".php"):
        return ex
    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    clines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)
    testfile = is_test_file(path)

    def body(s, e):
        return "\n".join(lines[s:min(e, n - 1) + 1])

    # ---------- imports ----------
    import_rows = [i for i in range(n)
                   if _USE_RE.match(clines[i]) or _REQUIRE_RE.match(clines[i])]
    # `use` inside a class body is a trait inclusion, not an import
    class_rows: list[tuple] = []
    for i in range(n):
        m = _CLASS_RE.match(clines[i])
        if m:
            class_rows.append((m.group("kind"), m.group("name"), i,
                               _span_end(clines, i)))
    import_rows = [r for r in import_rows
                   if not any(cs < r < ce for _, _, cs, ce in class_rows)]
    for i in import_rows:
        m = _USE_RE.match(clines[i])
        if m:
            parts = m.group("path").strip("\\").split("\\")
            ex.mention(M_IMPORT, ("File", path.rsplit("/", 1)[-1], path, 0, None),
                       parts[-1], dst_file="/".join(parts[:-1]) or parts[-1],
                       row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- classes ----------
    for kind, name, s, e in class_rows:
        header_end = s
        while header_end < n and "{" not in clines[header_end]:
            header_end += 1
        header = " ".join(clines[s:min(header_end, n - 1) + 1])
        meta = {}
        pm = re.search(r"\bextends\s+([A-Za-z_]\w*)", header)
        if pm:
            meta["parent"] = pm.group(1)
        includes = []
        im = re.search(r"\bimplements\s+([^\{]+)", header)
        if im:
            includes += [x.strip().rsplit("\\", 1)[-1]
                         for x in im.group(1).split(",") if x.strip()]
        for r in range(s + 1, min(e, n - 1) + 1):
            um = re.match(r"^\s*use\s+([\w\\,\s]+);", clines[r])
            if um:
                includes += [x.strip().rsplit("\\", 1)[-1]
                             for x in um.group(1).split(",") if x.strip()]
        if includes:
            meta["includes"] = ",".join(includes)
        ex.node("Class", name, path, s, e, body(s, e), meta=meta)
        if kind == "trait":
            ex.node("Trait", name, path, s, e, body(s, e))

    def enclosing_class(row):
        best = None
        for t in class_rows:
            if t[2] < row <= t[3]:
                if best is None or t[2] > best[2]:
                    best = t
        return best

    # ---------- functions / methods ----------
    funcs: list[tuple] = []
    for i in range(n):
        m = _FUN_RE.match(clines[i])
        if not m:
            continue
        funcs.append((m.group("name"), i, _span_end(clines, i)))

    # ---------- endpoints (Laravel routes + Symfony attributes) ----------
    handled_rows: set[int] = set()
    ctrl_context: list[tuple] = []  # (start, end, ctrl) from Route::controller
    for i in range(n):
        cm = _ROUTE_CTRL_RE.search(clines[i])
        if cm:
            ctrl_context.append((i, _span_end(clines, i),
                                 cm.group("ctrl").rsplit("\\", 1)[-1]))

    def context_ctrl(row):
        for s, e, c in ctrl_context:
            if s <= row <= e:
                return c
        return None

    for i in range(n):
        ncl = nclines[i]
        rm = _ROUTE_RES_RE.search(ncl)
        if rm:
            res = rm.group("name")
            sing = _singular(res)
            ctrl = rm.group("ctrl").rsplit("\\", 1)[-1] + ".php"
            actions = RESOURCE_ACTIONS + (
                RESOURCE_EXTRA if rm.group("verb") == "resource" else [])
            for action, verb, tpl in actions:
                ep_path = tpl.format(r=res, s=sing)
                ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                             meta={"verb": verb, "handler": action})
                ex.mention(M_PHP_HANDLER, ep.ref(), action,
                           extra={"ctrl": ctrl}, row=i)
            handled_rows.add(i)
            continue
        m = _ROUTE_RE.search(ncl)
        if m:
            verb = m.group("verb").upper()
            ep_path = m.group("path")
            rest = m.group("rest").strip()
            am = _ARRAY_HANDLER_RE.match(rest)
            sm = _STR_HANDLER_RE.match(rest)
            if am:
                ctrl = am.group("ctrl").rsplit("\\", 1)[-1] + ".php"
                ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                             meta={"verb": verb, "handler": am.group("method")})
                ex.mention(M_PHP_HANDLER, ep.ref(), am.group("method"),
                           extra={"ctrl": ctrl}, row=i)
            elif sm and context_ctrl(i):
                ctrl = context_ctrl(i) + ".php"
                ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                             meta={"verb": verb, "handler": sm.group("method")})
                ex.mention(M_PHP_HANDLER, ep.ref(), sm.group("method"),
                           extra={"ctrl": ctrl}, row=i)
            elif _CLOSURE_RE.match(rest):
                handler = anonymous_handler_name(verb, ep_path, i)
                he = _span_end(clines, i)
                fn_ref = ("Function", handler, path, i, None)
                ex.node("Function", handler, path, i, he, body(i, he))
                ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                             meta={"verb": verb, "handler": handler})
                ex.edge("Handler", ep.ref(), fn_ref)
                _scan_body(ex, fn_ref, path, lines, clines, i, he, funcs)
            else:
                ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                             meta={"verb": verb, "handler": rest[:40] or "?"})
            handled_rows.add(i)

    # Symfony #[Route('/path')] attribute above a method; a class-level
    # Route attribute is an endpoint-group PARENT, not an endpoint
    # (find_endpoint_parents php.rs:555-597)
    for i in range(n):
        m = _SYMFONY_ROUTE_RE.match(nclines[i])
        if not m:
            continue
        r = i + 1
        while r < n and (nclines[r].strip().startswith("#[")
                         or not nclines[r].strip()):
            r += 1
        if r < n and _CLASS_RE.match(clines[r]):
            continue
        tgt = None
        for fname, fs, fe in funcs:
            if fs >= i and (tgt is None or fs < tgt[1]):
                tgt = (fname, fs)
        if tgt is None:
            continue
        vm = re.search(r"methods\s*:\s*\[?\s*['\"](\w+)['\"]", nclines[i])
        meta = {"verb": vm.group(1).upper() if vm else "GET",
                "handler": tgt[0]}
        ep = ex.node("Endpoint", m.group("path"), path, i, i, lines[i],
                     meta=meta)
        ex.edge("Handler", ep.ref(), ("Function", tgt[0], path, tgt[1], None))

    # ---------- function/test nodes ----------
    emitted_fn_rows = {fs for _, fs, _ in funcs}
    for name, s, e in funcs:
        if s in handled_rows:
            continue  # closure handlers already emitted
        fbody = body(s, e)
        annos_test = any(_TEST_ATTR_RE.match(nclines[r])
                         for r in range(max(0, s - 3), s))
        # php.rs:199-207 is_test: any function whose lowercase name starts
        # with 'test', or whose body mentions @test / PHPUnit, is a test
        # regardless of which file it lives in
        is_test = (testfile or annos_test
                   or name.lower().startswith("test")
                   or "@test" in fbody.lower() or "PHPUnit" in fbody)
        enc = enclosing_class(s)
        if is_test:
            tt = classify_test(name, path, fbody)
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                tt, "unit")
            ex.node(tt, name, path, s, e, fbody, meta={"test_kind": kind})
            src_ref = (tt, name, path, s, None)
        else:
            meta = {}
            if enc is not None and enc[0] == "class":
                meta["operand"] = enc[1]
            ex.node("Function", name, path, s, e, fbody, meta=meta)
            src_ref = ("Function", name, path, s, None)
            if meta.get("operand"):
                ex.edge("Operand", ("Class", enc[1], path, enc[2], None),
                        src_ref)
        _scan_body(ex, src_ref, path, lines, clines, s, e, funcs)

    # Pest test('...')/it('...') calls -> EMPTY-NAME test nodes
    # (test_query php.rs:295-303: the pest arm captures no FUNCTION_NAME)
    for i in range(n):
        if _PEST_RE.match(clines[i]) and i not in emitted_fn_rows:
            e = _span_end(clines, i)
            fbody = body(i, e)
            tt = classify_test("", path, fbody)
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                tt, "unit")
            ex.node(tt, "", path, i, e, fbody, meta={"test_kind": kind})
            _scan_body(ex, (tt, "", path, i, None), path, lines, clines, i, e,
                       funcs)

    # ---------- Vars: assignment statements at any scope ----------
    for i in range(n):
        m = _VAR_RE.match(clines[i])
        if m:
            e = _span_end(clines, i)
            ex.node("Var", m.group("name"), path, i, e, body(i, e))

    return ex


def _scan_body(ex, src_ref, path, lines, clines, s, e, funcs):
    n = len(clines)
    idents: set[str] = set()
    dms: set[str] = set()
    for row in range(s, min(e, n - 1) + 1):
        line = clines[row]
        if row == s:
            line = re.sub(r"function\s+&?\s*[A-Za-z_]\w*\s*\(", " ", line)
        if row != s and any(fs == row for _, fs, _ in funcs):
            continue
        for m in _MEMBER_CALL_RE.finditer(line):
            called = m.group("name")
            if called in KEYWORDS:
                continue
            obj = m.group("obj")
            operand = None if obj == "$this" else obj
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row)
        line_wo_member = _MEMBER_CALL_RE.sub(" ", line)
        for m in _SCOPED_CALL_RE.finditer(line_wo_member):
            if m.group("name") not in KEYWORDS and m.group("scope") != "Route":
                ex.mention(M_CALL, src_ref, m.group("name"),
                           operand=m.group("scope"), row=row)
        line_plain = _SCOPED_CALL_RE.sub(" ", line_wo_member)
        for m in _CALL_RE.finditer(line_plain):
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
