"""Python extractor — stdlib `ast` based.

Reproduces the node/edge semantics of the reference's tree-sitter queries for
Python (/root/reference/ast/src/lang/queries/python.rs) without tree-sitter:

* Var          — module-level and class-level single-name assignments
                 (variables_query, python.rs:74-99)
* Class        — class with >=1 method in its body (python.rs:101-125)
* Trait        — class inheriting from ABC (python.rs:477-493)
* DataModel    — every class (python.rs:440-451); Class-vs-DataModel dedup is a
                 later prune pass (clean_graph directive python.rs:568-570)
* Function     — every def/async def; decorators excluded from body; enclosing
                 class -> OPERAND edge (find_function_parent python.rs:229-257)
* tests        — ^test_ names or tests-dir/_test.py files (is_test
                 python.rs:511-516) classified unit/integration/e2e by path +
                 content (classify_test python.rs:191-227)
* Endpoint     — FastAPI/Flask decorators, Django urlpatterns, lambda routes
                 (endpoint_finders python.rs:283-384); anonymous-lambda handler
                 names `{method}_{path}_lambda_L{row}` (python.rs:572-588)
* Request      — requests/httpx verb calls with literal URL (python.rs:386-398)
* call mentions— identifier calls and up-to-3-level attribute calls
                 (function_call_query python.rs:258-281), skip-listed per
                 skips/python.rs
* import map   — `from X import a, b` (imports_query python.rs:56-73; aliased
                 names excluded exactly as the reference's query misses them)

All rows are 0-based (tree-sitter convention; stdlib ast is 1-based so we
subtract 1).
"""

from __future__ import annotations

import ast as pyast

from .base import (
    M_CALL,
    M_DM_WITHIN,
    M_HANDLER,
    M_IDENT,
    M_IMPLEMENTS,
    M_IMPORT,
    M_IMPORT_EDGE,
    Extraction,
)

# --- skip lists (reference ast/src/lang/queries/skips/python.rs) -----------
LIST_METHODS = {"append", "extend", "pop", "remove", "sort", "reverse", "clear",
                "copy", "count", "index", "insert", "len"}
DICT_METHODS = {"keys", "values", "items", "get", "pop", "update", "clear",
                "copy", "setdefault", "fromkeys", "popitem", "len"}
STRING_METHODS = {"split", "join", "strip", "lstrip", "rstrip", "replace",
                  "upper", "lower", "capitalize", "title", "find", "index",
                  "startswith", "endswith", "isdigit", "isalpha", "format",
                  "encode", "decode", "len"}
BUILTINS = {"len", "print", "range", "enumerate", "zip", "map", "filter",
            "sorted", "reversed", "sum", "min", "max", "any", "all",
            "isinstance"}
_METHOD_SKIPS = LIST_METHODS | DICT_METHODS | STRING_METHODS


def should_skip_call(called: str, operand: str | None) -> bool:
    if called in BUILTINS:
        return True
    if operand and operand[:1].islower() and called in _METHOD_SKIPS:
        return True
    return False


def is_test(name: str, file: str) -> bool:
    # python.rs:511-516 (body unused there)
    return (name.startswith("test_") or "/tests/" in file or "/test/" in file
            or file.endswith("_test.py"))


def classify_test(file: str, body: str) -> str:
    # python.rs:191-227 — path first, then content
    f = file.replace("\\", "/").lower()
    b = body.lower()
    for frag, kind in (("e2e", "E2eTest"), ("integration", "IntegrationTest"),
                       ("unit", "UnitTest")):
        if f"/tests/{frag}/" in f or f"/test/{frag}/" in f or f"/{frag}/" in f:
            return kind
    if ("playwright" in b or "page.goto" in b or "expect(page" in b
            or "selenium" in b or "webdriver" in b):
        return "E2eTest"
    if ("requests." in b or "testclient" in b or "client.get" in b
            or "client.post" in b):
        return "IntegrationTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, row: int) -> str:
    # python.rs:572-588; row is 0-based tree-sitter row
    clean = (path.replace("/", "_").replace(":", "param_").replace("-", "_")
             .strip("_"))
    return f"{method.lower()}_{clean}_lambda_L{row}"


def _seg(src: str, lines: list[str], node: pyast.AST) -> str:
    """Source text of a node (decorators excluded, like tree-sitter's
    function_definition/class_definition nodes)."""
    try:
        s = pyast.get_source_segment(src, node)
        if s is not None:
            return s
    except Exception:
        pass
    return "\n".join(lines[node.lineno - 1:node.end_lineno])


def _r(node: pyast.AST) -> int:
    return node.lineno - 1


def _er(node: pyast.AST) -> int:
    return (node.end_lineno or node.lineno) - 1


def _first_str_arg(call: pyast.Call) -> str | None:
    if call.args and isinstance(call.args[0], pyast.Constant) and isinstance(call.args[0].value, str):
        return call.args[0].value
    return None


def _call_parts(func: pyast.expr) -> tuple[str | None, str | None]:
    """(called, operand) per function_call_query: plain identifier, or
    attribute chains up to 3 levels with an identifier base."""
    if isinstance(func, pyast.Name):
        return func.id, None
    if isinstance(func, pyast.Attribute):
        called = func.attr
        obj = func.value
        depth = 1
        while isinstance(obj, pyast.Attribute) and depth < 3:
            obj = obj.value
            depth += 1
        if isinstance(obj, pyast.Name):
            return called, obj.id
    return None, None


class _FuncInfo:
    __slots__ = ("node", "name", "start", "end", "body", "parent_class",
                 "is_test", "test_kind", "decorators")

    def __init__(self, node, name, start, end, body, parent_class, decorators):
        self.node = node
        self.name = name
        self.start = start
        self.end = end
        self.body = body
        self.parent_class = parent_class  # (name, start) | None
        self.decorators = decorators
        self.is_test = False
        self.test_kind = None


def extract_python(path: str, content: str) -> Extraction:
    ex = Extraction()
    try:
        tree = pyast.parse(content)
    except (SyntaxError, ValueError, RecursionError):
        return ex
    lines = content.splitlines()

    # ---------------- imports (section node + import map) -----------------
    import_stmts = [s for s in tree.body if isinstance(s, (pyast.Import, pyast.ImportFrom))]
    if import_stmts:
        first, last = import_stmts[0], import_stmts[-1]
        # gap-filling merge per combine_import_sections (builder/utils.rs:158-218)
        parts: list[str] = []
        pos = _r(first)
        for i, s in enumerate(import_stmts):
            if _r(s) > pos:
                parts.append("\n" * (_r(s) - pos - 1))
            parts.append(_seg(content, lines, s))
            pos = _er(s) + 1
        body = "\n".join(p for p in parts)
        ex.node("Import", "", path, _r(first), _er(last), body)
        for s in import_stmts:
            if isinstance(s, pyast.ImportFrom):
                module = ("." * s.level) + (s.module or "")
                for alias in s.names:
                    if alias.asname is None and alias.name != "*":
                        ex.mention(M_IMPORT, ("File", path, path, 0, None),
                                   alias.name, dst_file=module)
                        ex.mention(M_IMPORT_EDGE, ("File", path, path, 0, None),
                                   alias.name, dst_file=module)
            else:  # plain `import X [as y]`: binds y/X to module X — feeds
                # the USES library join (no Function ever matches a module
                # name, so the cascade's import strategy is unaffected)
                for alias in s.names:
                    bound = alias.asname or alias.name.split(".")[0]
                    ex.mention(M_IMPORT, ("File", path, path, 0, None),
                               bound, dst_file=alias.name)

    # ---------------- vars (module + class level) -------------------------
    def emit_vars(stmts, scope_class=None):
        for s in stmts:
            tgt = None
            if isinstance(s, pyast.Assign) and s.targets and isinstance(s.targets[0], pyast.Name):
                tgt = s.targets[0].id
            elif isinstance(s, pyast.AnnAssign) and isinstance(s.target, pyast.Name):
                tgt = s.target.id
            if tgt is not None:
                ex.node("Var", tgt, path, _r(s), _er(s), _seg(content, lines, s))

    emit_vars(tree.body)

    # ---------------- classes / traits / datamodels / functions ----------
    funcs: list[_FuncInfo] = []
    classes: list[tuple[str, int, int]] = []

    def first_name_base(cls: pyast.ClassDef) -> str | None:
        for b in cls.bases:
            if isinstance(b, pyast.Name):
                return b.id
        return None

    def visit(node, class_stack):
        for child in pyast.iter_child_nodes(node):
            if isinstance(child, pyast.ClassDef):
                cname, cstart, cend = child.name, _r(child), _er(child)
                cbody = _seg(content, lines, child)
                has_method = any(isinstance(x, (pyast.FunctionDef, pyast.AsyncFunctionDef))
                                 for x in child.body)
                parent = first_name_base(child)
                if has_method:
                    meta = {}
                    if parent:
                        meta["parent"] = parent
                    ex.node("Class", cname, path, cstart, cend, cbody, meta=meta)
                    classes.append((cname, cstart, cend))
                is_abc = any(isinstance(b, pyast.Name) and b.id == "ABC" for b in child.bases)
                if is_abc:
                    ex.node("Trait", cname, path, cstart, cend, cbody)
                # every class is a DataModel candidate (python.rs:440-451);
                # Class-with-OPERAND dedup happens in the prune plane
                ex.node("DataModel", cname, path, cstart, cend, cbody)
                if parent is not None:
                    ex.mention(M_IMPLEMENTS, ("Class", cname, path, cstart, None), parent)
                emit_vars(child.body)
                visit(child, class_stack + [(cname, cstart)])
            elif isinstance(child, (pyast.FunctionDef, pyast.AsyncFunctionDef)):
                fstart, fend = _r(child), _er(child)
                fbody = _seg(content, lines, child)
                parent_class = class_stack[-1] if class_stack else None
                funcs.append(_FuncInfo(child, child.name, fstart, fend, fbody,
                                       parent_class, child.decorator_list))
                visit(child, class_stack)
            else:
                visit(child, class_stack)

    visit(tree, [])

    # classify tests vs functions
    for f in funcs:
        if is_test(f.name, path):
            f.is_test = True
            f.test_kind = classify_test(path, f.body)

    emitted_funcs: dict[tuple[str, int], _FuncInfo] = {}
    for f in funcs:
        if f.is_test:
            ntype = f.test_kind
            meta = {"test_kind": {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(ntype, "unit")}
            ex.node(ntype, f.name, path, f.start, f.end, f.body, meta=meta)
        else:
            meta = {}
            if f.parent_class:
                meta["operand"] = f.parent_class[0]
            ex.node("Function", f.name, path, f.start, f.end, f.body, meta=meta)
            if f.parent_class:
                cname, cstart = f.parent_class
                ex.edge("Operand", ("Class", cname, path, cstart, None),
                        ("Function", f.name, path, f.start, None))
        emitted_funcs[(f.name, f.start)] = f

    # NESTED_IN: child function strictly inside parent function's row range
    # (parse/collect.rs:733-778)
    plain = [f for f in funcs if not f.is_test]
    for child in plain:
        for parent in plain:
            if child is parent:
                continue
            if child.start > parent.start and child.end < parent.end:
                ex.edge("NestedIn",
                        ("Function", child.name, path, child.start, None),
                        ("Function", parent.name, path, parent.start, None))

    # ---------------- per-function scans: calls / requests / idents -------
    for f in funcs:
        src_type = f.test_kind if f.is_test else "Function"
        src_ref = (src_type, f.name, path, f.start, None)
        idents: set[str] = set()
        dm_names: set[str] = set()
        for n in pyast.walk(f.node):
            if isinstance(n, pyast.Name):
                idents.add(n.id)
            elif isinstance(n, pyast.arg):
                idents.add(n.arg)
            elif isinstance(n, pyast.keyword) and n.arg:
                idents.add(n.arg)
            elif isinstance(n, pyast.Attribute):
                idents.add(n.attr)
                # dm_within: (attribute object: identifier ^[A-Z])
                if isinstance(n.value, pyast.Name) and n.value.id[:1].isupper():
                    dm_names.add(n.value.id)
            if isinstance(n, pyast.Call):
                called, operand = _call_parts(n.func)
                # requests/httpx verb calls -> Request node (python.rs:386-398)
                if (isinstance(n.func, pyast.Attribute)
                        and isinstance(n.func.value, pyast.Name)
                        and n.func.value.id in ("requests", "httpx")
                        and n.func.attr in ("get", "post", "put", "delete", "patch")):
                    url = _first_str_arg(n)
                    # requests inside test functions are dropped with the
                    # function tuple by filter_tests (lang/mod.rs:708-726)
                    if url is not None and not f.is_test:
                        verb = n.func.attr.upper()
                        req = ex.node("Request", url, path, _r(n), _er(n),
                                      _seg(content, lines, n), meta={"verb": verb})
                        ex.edge("Calls", src_ref, req.ref())
                        continue  # the reference's request_finder consumes these
                if called is not None:
                    # dm_within: call of capitalized identifier / first
                    # capitalized argument (python.rs:440-476 data_model_within_query)
                    if isinstance(n.func, pyast.Name) and called[:1].isupper():
                        dm_names.add(called)
                    for a in n.args:
                        if isinstance(a, pyast.Name) and a.id[:1].isupper():
                            dm_names.add(a.id)
                    if not should_skip_call(called, operand):
                        ex.mention(M_CALL, src_ref, called, operand=operand, row=_r(n))
        if idents:
            ex.mention(M_IDENT, src_ref, "", names=sorted(idents))
        if dm_names:
            ex.mention(M_DM_WITHIN, src_ref, "", names=sorted(dm_names))

    # ---------------- endpoints ------------------------------------------
    def emit_endpoint(name: str, verb: str | None, handler: str | None,
                      row: int, end_row: int, body: str):
        meta: dict[str, str] = {}
        if handler:
            meta["handler"] = handler
        # add_endpoint_verb (python.rs:400-438)
        if verb:
            meta["verb"] = verb.upper()
        elif handler:
            m = handler.rsplit(".", 1)[-1]
            if m.startswith("get_") or m == "index":
                meta["verb"] = "GET"
            elif m.startswith(("post_", "create_")):
                meta["verb"] = "POST"
            elif m.startswith(("delete_", "remove_")):
                meta["verb"] = "DELETE"
            elif m.startswith(("put_", "update_")):
                meta["verb"] = "PUT"
            else:
                meta["verb"] = "GET"
        else:
            meta["verb"] = "GET"
        ep = ex.node("Endpoint", name, path, row, end_row, body, meta=meta)
        if handler:
            ex.mention(M_HANDLER, ep.ref(), handler)
        return ep

    for f in funcs:
        for dec in f.decorators:
            if not (isinstance(dec, pyast.Call) and isinstance(dec.func, pyast.Attribute)):
                continue
            attr = dec.func.attr
            route = _first_str_arg(dec)
            if route is None:
                continue
            if attr in ("get", "post", "put", "delete"):
                emit_endpoint(route, attr, f.name, _r(dec), _er(dec),
                              _seg(content, lines, dec))
            elif attr == "route":
                verb = None
                for kw in dec.keywords:
                    if kw.arg == "methods" and isinstance(kw.value, pyast.List):
                        for el in kw.value.elts:
                            if isinstance(el, pyast.Constant) and isinstance(el.value, str):
                                verb = el.value
                                break
                emit_endpoint(route, verb, f.name, _r(dec), _er(dec),
                              _seg(content, lines, dec))

    # Django urlpatterns + lambda routes + add_url_rule
    for n in pyast.walk(tree):
        if isinstance(n, pyast.Assign) and n.targets and isinstance(n.targets[0], pyast.Name) \
                and n.targets[0].id == "urlpatterns" and isinstance(n.value, pyast.List):
            for el in n.value.elts:
                if not (isinstance(el, pyast.Call) and isinstance(el.func, pyast.Name)
                        and el.func.id in ("path", "re_path")):
                    continue
                route = _first_str_arg(el)
                if route is None or len(el.args) < 2:
                    continue
                h = el.args[1]
                handler = None
                if isinstance(h, pyast.Attribute):
                    handler = h.attr
                elif isinstance(h, pyast.Name):
                    handler = h.id
                if handler:
                    emit_endpoint(route, None, handler, _r(el), _er(el),
                                  _seg(content, lines, el))
        elif isinstance(n, pyast.Call):
            # route/get/... call-with-lambda:  app.route('/x')(lambda: ...)
            if (isinstance(n.func, pyast.Call)
                    and isinstance(n.func.func, pyast.Attribute)
                    and n.func.func.attr in ("route", "get", "post", "put", "delete")):
                route = _first_str_arg(n.func)
                lam = next((a for a in n.args if isinstance(a, pyast.Lambda)), None)
                if route is not None and lam is not None:
                    method = n.func.func.attr
                    fname = anonymous_handler_name(method, route, _r(lam))
                    ex.node("Function", fname, path, _r(lam), _er(lam),
                            _seg(content, lines, lam))
                    emit_endpoint(route, method, fname, _r(n), _er(n),
                                  _seg(content, lines, n))
            # add_url_rule('/x', view_func=lambda: ...)
            elif (isinstance(n.func, pyast.Attribute) and n.func.attr == "add_url_rule"):
                route = _first_str_arg(n)
                lam = None
                for kw in n.keywords:
                    if kw.arg == "view_func" and isinstance(kw.value, pyast.Lambda):
                        lam = kw.value
                if route is not None and lam is not None:
                    fname = anonymous_handler_name("", route, _r(lam))
                    ex.node("Function", fname, path, _r(lam), _er(lam),
                            _seg(content, lines, lam))
                    emit_endpoint(route, None, fname, _r(n), _er(n),
                                  _seg(content, lines, n))

    return ex
