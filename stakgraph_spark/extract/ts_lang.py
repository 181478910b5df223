"""TypeScript / React extractor — line/regex scanner (no tree-sitter here).

Mirrors /root/reference/ast/src/lang/queries/react_ts.rs (the merged
React+TypeScript Stack):

* Var        — top-level (incl. exported) const/let/var whose value is a
               literal / object / array / new / member / identifier — NOT an
               arrow/function (react_ts.rs:170-227)
* Class      — class declarations; implements clause -> IMPLEMENTS mentions
               (react_ts.rs:241-256, 1103-1118)
* Trait      — interface/type-alias with method signatures (react_ts.rs:1077-1097)
* DataModel  — type alias / interface / enum / class extends Model /
               @Entity()-decorated class (react_ts.rs:492-527)
* Function   — function declarations, const/let = arrow|function (any depth),
               assignments, methods (name != render), object pairs,
               `export const x = call()`, React.Component classes with a
               JSX render, styled.* (react_ts.rs:257-474); methods carry
               meta.operand via the class walk (react_ts.rs:1119-1154)
* tests      — describe(...) at any depth + top-level test/it (react_ts.rs:
               537-586), only in test files (is_test 1371-1374); test name =
               the string argument
* Endpoint   — express router.verb(path, handler|arrow) (+use groups),
               Next.js `export function GET/POST...` renamed from the file
               path (react_ts.rs:600-712, 928-946); anonymous handlers named
               {verb}_{path}_handler_L{row} (react_ts.rs:902-926)
* Request    — fetch / axios-style verb calls / axios({url}) / new Request /
               new NextRequest (react_ts.rs:715-765)
* Page       — react-router <Route path element/component> + Next.js page
               files (react_ts.rs:1016-1076, 1202-1315)
* calls      — ident / member calls (<=3 levels, identifier base), `new X()`
               class calls, JSX elements as component calls
               (react_ts.rs:798-843); skip lists per skips/react_ts.rs
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_HANDLER, M_IDENT, M_IMPLEMENTS,
                   M_IMPORT, M_IMPORT_EDGE, Extraction, trim_quotes)
from .go_lang import M_OPERAND, mask_sources

M_CLASS_NEW = "class_new"          # new X() -> Calls edge to unique Class
M_EP_GROUP_USE = "ep_group_use"    # app.use("/prefix", routerVar)
M_STRUCT_FIELD = "struct_field"    # (class, field) -> field type (registry)
M_RENDERS = "renders"              # Page -> default-export component

ARRAY_METHODS = {"push", "pop", "shift", "unshift", "slice", "splice", "concat",
                 "join", "reverse", "sort", "indexOf", "lastIndexOf", "forEach",
                 "map", "filter", "reduce", "reduceRight", "every", "some",
                 "find", "findIndex", "includes", "flat", "flatMap", "fill",
                 "copyWithin", "entries", "keys", "values", "at"}
STRING_METHODS = {"charAt", "charCodeAt", "concat", "includes", "indexOf",
                  "lastIndexOf", "match", "matchAll", "replace", "replaceAll",
                  "search", "slice", "split", "substring", "toLowerCase",
                  "toUpperCase", "trim", "trimStart", "trimEnd", "padStart",
                  "padEnd", "repeat", "startsWith", "endsWith", "localeCompare",
                  "normalize", "at", "codePointAt", "fromCharCode",
                  "fromCodePoint"}
OBJECT_METHODS = {"hasOwnProperty", "isPrototypeOf", "propertyIsEnumerable",
                  "toLocaleString", "toString", "valueOf", "keys", "values",
                  "entries", "assign", "create", "defineProperty", "freeze",
                  "seal", "preventExtensions"}
ASYNC_METHODS = {"then", "catch", "finally", "all", "race", "allSettled"}
SCHEMA_BUILDERS = {"string", "number", "boolean", "object", "array", "enum",
                   "optional", "nullable", "union", "intersection", "literal",
                   "tuple", "record", "any", "unknown", "never", "void",
                   "null", "undefined", "tool", "describe"}
SCHEMA_CHAIN = {"optional", "nullable"}
DOM_METHODS = {"addEventListener", "removeEventListener", "querySelector",
               "querySelectorAll", "getElementById", "getElementsByClassName",
               "getElementsByTagName", "appendChild", "removeChild",
               "replaceChild", "insertBefore", "cloneNode", "setAttribute",
               "getAttribute", "removeAttribute", "classList", "focus", "blur",
               "click", "submit"}
TEST_FRAMEWORK = {"describe", "it", "test", "expect", "beforeEach", "afterEach",
                  "beforeAll", "afterAll", "vi", "jest", "suite", "specify",
                  "assert"}
JS_BUILTIN_OBJECTS = {"JSON", "Math", "Object", "Array", "String", "Number",
                      "Boolean", "Date", "RegExp", "Promise", "Error", "Map",
                      "Set", "WeakMap", "WeakSet", "Symbol", "Proxy", "Reflect",
                      "Intl", "console", "window", "document", "globalThis",
                      "process", "Buffer", "URL", "URLSearchParams"}
JSX_HTML = {"div", "span", "p", "section", "article", "nav", "header", "footer",
            "main", "aside", "address", "h1", "h2", "h3", "h4", "h5", "h6",
            "form", "input", "button", "label", "select", "textarea",
            "fieldset", "legend", "datalist", "option", "optgroup", "ul", "ol",
            "li", "dl", "dt", "dd", "table", "tbody", "thead", "tfoot", "tr",
            "td", "th", "caption", "colgroup", "col", "img", "video", "audio",
            "source", "track", "canvas", "iframe", "embed", "object", "param",
            "map", "area", "strong", "em", "code", "pre", "kbd", "a", "b", "i",
            "u", "s", "small", "br", "hr", "blockquote", "cite", "q", "abbr",
            "time", "svg", "path", "circle", "rect", "line", "g", "text"}

KEYWORDS = {"if", "else", "for", "while", "do", "switch", "case", "return",
            "function", "class", "const", "let", "var", "new", "typeof",
            "instanceof", "in", "of", "try", "catch", "finally", "throw",
            "await", "async", "yield", "import", "export", "default", "from",
            "as", "interface", "type", "enum", "implements", "extends",
            "super", "this", "require", "constructor"}


def should_skip_call(called: str, operand: str | None) -> bool:
    if called in TEST_FRAMEWORK:
        return True
    if operand is not None:
        if operand in JS_BUILTIN_OBJECTS:
            return True
        if operand[:1].islower():
            if (called in ARRAY_METHODS or called in STRING_METHODS
                    or called in OBJECT_METHODS or called in ASYNC_METHODS
                    or called in DOM_METHODS):
                return True
            if len(operand) <= 2 and operand.islower() and called in SCHEMA_BUILDERS:
                return True
            if called in SCHEMA_CHAIN:
                return True
    if called in JSX_HTML:
        return True
    if operand is None and called in SCHEMA_BUILDERS:
        return True
    return False


def is_test_file(f: str) -> bool:
    return (f.endswith((".test.ts", ".test.tsx", ".test.jsx", ".test.js",
                        ".e2e.ts", ".e2e.tsx", ".e2e.jsx", ".e2e.js",
                        ".spec.ts", ".spec.tsx", ".spec.jsx", ".spec.js"))
            or "/__tests__/" in f or "/tests/" in f or "/test/" in f
            or "__tests__" in f or ".test." in f or ".spec." in f)


def classify_test(name: str, file: str, body: str) -> str:
    f = file.replace("\\", "/")
    fname = f.rsplit("/", 1)[-1].lower()
    if (("/tests/e2e/" in f or "/test/e2e" in f or "/e2e/" in f)
            or "/__e2e__/" in f or ".e2e." in f or fname.startswith(("e2e.", "e2e_", "e2e-"))
            or ".e2e.test" in fname or ".e2e.spec" in fname):
        return "E2eTest"
    if "/integration/" in f or ".int." in f or ".integration." in f:
        return "IntegrationTest"
    if "/unit/" in f or ".unit." in f:
        return "UnitTest"
    nl = name.lower()
    if "e2e" in nl:
        return "E2eTest"
    if "integration" in nl:
        return "IntegrationTest"
    bl = body.lower()
    pw = "@playwright/test" in bl
    acts = "page.goto(" in bl or "page.click(" in bl or "page.evaluate(" in bl
    cy = "from 'cypress'" in bl or 'from "cypress"' in bl or "require('cypress')" in bl or 'require("cypress")' in bl
    pup = "from 'puppeteer'" in bl or 'from "puppeteer"' in bl or "require('puppeteer')" in bl or 'require("puppeteer")' in bl
    if (pw and acts) or cy or pup:
        return "E2eTest"
    if any(m in bl for m in ("fetch(", "axios.", "axios(", "supertest(",
                             "request(", "new request(", "/api/", "http://",
                             "https://", "globalthis.fetch", "cy.request(")):
        return "IntegrationTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, row: int) -> str:
    clean = (path.replace("/", "_").replace(":", "param_").replace("-", "_")
             .replace(" ", "_").strip("_"))
    if not clean or clean == "_":
        return f"{method.lower()}_handler_L{row}"
    return f"{method.lower()}_{clean}_handler_L{row}"


def endpoint_name_from_file(file: str) -> str:
    p = file.replace("\\", "/")
    i = p.find("/api/")
    if i != -1:
        after = p[i:]
        for suf in ("/route.ts", "/route.js"):
            if after.endswith(suf):
                after = after[: -len(suf)]
        return after
    return file


def resolve_import_path(path: str) -> str:
    p = path.strip()
    if p.startswith(("./", ".\\")):
        p = p[2:]
    elif p.startswith("/"):
        p = p[1:]
    if p.endswith(".js"):
        p = p.replace(".js", ".ts")
    if p.startswith("@/"):
        p = p[2:]
    for ext in (".ts", ".tsx", ".jsx"):
        if p.endswith(ext):
            p = p[: -len(ext)]
    return p


def route_from_path(path: str) -> str:
    p = path.replace("\\", "/")
    i = p.find("/app/")
    if i != -1:
        after = p[i + 4:].lstrip("/")
        for suf in ("/page.tsx", "/page.jsx", "/page.mdx", "/page.md"):
            bare = suf.lstrip("/")
            if after == bare:
                return "/"
            if after.endswith(suf):
                after = after[: -len(suf)]
                break
        return "/" + after if after else "/"
    i = p.find("/pages/")
    if i != -1:
        after = p[i + 6:].lstrip("/")
        for ext in (".tsx", ".jsx", ".js", ".ts"):
            if after.endswith(ext):
                after = after[: -len(ext)]
        if after in ("index", ""):
            return "/"
        if after.endswith("/index"):
            return "/" + after[: -len("/index")]
        return "/" + after
    return "/"


def page_name(filename: str) -> str:
    p = filename.replace("\\", "/")
    if "/app/" in p:
        return p.rsplit("/", 2)[-2] if "/" in p else "app"
    i = p.find("/pages/")
    if i != -1:
        after = p[i + 7:].lstrip("/")
        for ext in (".tsx", ".jsx", ".js", ".ts"):
            if after.endswith(ext):
                after = after[: -len(ext)]
        if after in ("index", ""):
            return "index"
        if after.endswith("/index"):
            return after.split("/")[-2]
        return after.rsplit("/", 1)[-1]
    return "page"


def is_extra_page(f: str) -> bool:
    for pat in ("/node_modules/", "/dist/", "/.next/", "/build/", "/out/",
                "/vendor/", "/__tests__/", "/test/", "/coverage/"):
        if pat in f:
            return False
    if "/app/" in f and f.endswith(("/page.tsx", "/page.jsx", "page.mdx", "page.md")):
        return True
    i = f.find("/pages/")
    if i != -1:
        after = f[i + 7:]
        if after.startswith(("api/", "_app", "_document", "_error")):
            return False
        if not after.endswith((".tsx", ".jsx", ".js", ".ts")):
            return False
        for seg in after.split("/"):
            if not seg or (seg.startswith("[") and seg.endswith("]")):
                continue
            seg = seg.split(".")[0]
            if seg[:1].isupper():
                return False
        return True
    return False


_IMPORT_RE = re.compile(
    r"^\s*import\s+(?:type\s+)?(?P<clause>[^'\"]*?)\s*from\s*['\"](?P<src>[^'\"]+)['\"]")
_EXPORT_FROM_RE = re.compile(
    r"^\s*export\s*\{(?P<names>[^}]*)\}\s*from\s*['\"](?P<src>[^'\"]+)['\"]")
_VARDECL_RE = re.compile(
    r"^\s*(?:export\s+)?(?:const|let|var)\s+(?P<name>[A-Za-z_$][\w$]*)"
    r"\s*(?::\s*(?P<type>[^=;]+?))?\s*=\s*(?P<val>.*)$")
_FNDECL_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*"
    r"(?P<name>[A-Za-z_$][\w$]*)\s*(?:<[^>]*>)?\s*\(")
_CLASS_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+"
    r"(?P<name>[A-Za-z_$][\w$]*)")
_IFACE_RE = re.compile(
    r"^\s*(?:export\s+)?interface\s+(?P<name>[A-Za-z_$][\w$]*)")
_TYPE_RE = re.compile(
    r"^\s*(?:export\s+)?type\s+(?P<name>[A-Za-z_$][\w$]*)(?:<[^>]*>)?\s*=")
_ENUM_RE = re.compile(
    r"^\s*(?:export\s+)?(?:const\s+)?enum\s+(?P<name>[A-Za-z_$][\w$]*)")
_METHOD_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|readonly\s+|async\s+|override\s+)*"
    r"(?:get\s+|set\s+)?\*?\s*(?P<name>[A-Za-z_$][\w$]*)\s*(?:<[^>]*>)?\s*\([^;]*$")
# single-line method with a `;` inside the body — `query(x: T): U { return
# x; }` — falls outside _METHOD_RE's open-header shape
_METHOD_ONELINE_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|readonly\s+|async\s+|override\s+)*"
    r"(?:get\s+|set\s+)?\*?\s*(?P<name>[A-Za-z_$][\w$]*)\s*(?:<[^>]*>)?\s*"
    r"\((?:[^()]|\([^)]*\))*\)\s*(?::\s*[^{;=]+?)?\s*\{.*\}\s*;?\s*$")
_ARROW_ANY_RE = re.compile(
    r"(?:const|let|var)\s+(?P<name>[A-Za-z_$][\w$]*)\s*(?::[^=]+?)?=\s*"
    r"(?:async\s*)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=]+?)?\s*=>")
_FUNC_EXPR_RE = re.compile(
    r"(?:const|let|var)\s+(?P<name>[A-Za-z_$][\w$]*)\s*=\s*(?:async\s+)?function\b")
_MEMBER_ASSIGN_RE = re.compile(
    r"^\s*(?P<name>[A-Za-z_$][\w$]*(?:\.[A-Za-z_$][\w$]*)+)\s*=[^=>]")
_SHORTHAND_METHOD_RE = re.compile(
    r"^\s*(?:async\s+)?(?P<name>[A-Za-z_$][\w$]*)\s*\((?:[^;()]|\([^)]*\))*\)\s*\{\s*$")
# class-field receiver types (registry/typescript.rs class_fields,
# ts_resolver.rs:586-612): `users = new UsersAPI()` initializers and
# `private service: PersonService` annotations; constructor parameter
# properties `constructor(private db: Database)` are the TS-only shorthand
_FIELD_NEW_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|readonly\s+|static\s+)*"
    r"(?P<name>[A-Za-z_$][\w$]*)\s*(?::\s*[A-Za-z_$][\w$.<>\[\]]*)?\s*=\s*"
    r"new\s+(?P<type>[A-Za-z_$][\w$.]*)\s*[(<]")
_FIELD_TYPED_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|readonly\s+|static\s+)*"
    r"(?P<name>[A-Za-z_$][\w$]*)\s*[?!]?\s*:\s*"
    r"(?P<type>[A-Z][\w$.]*)(?:<[^>]*>)?(?:\s*\[\s*\])?\s*[;,=]?\s*$")
_CTOR_PROP_RE = re.compile(
    r"(?:private|public|protected|readonly)\s+(?:readonly\s+)?"
    r"(?P<name>[A-Za-z_$][\w$]*)\s*[?!]?\s*:\s*(?P<type>[A-Z][\w$.]*)")
# class field whose initializer opens a multi-line object/array literal:
# `opts = {` / `opts: Opts = {` — its inner `key: Type,` lines are object
# keys, NOT class fields, and must not feed the receiver registry (ADVICE r04)
_FIELD_OBJ_OPEN_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|readonly\s+|static\s+)*"
    r"(?P<name>[A-Za-z_$][\w$]*)\s*[?!]?\s*(?::\s*[A-Za-z_$][\w$.<>\[\]]*)?"
    r"\s*=\s*[\{\[]\s*$")
_ASSIGN_ARROW_RE = re.compile(
    r"^\s*(?P<name>[A-Za-z_$][\w$]*)\s*=\s*(?:async\s*)?\([^)]*\)\s*=>")
_PAIR_ARROW_RE = re.compile(
    r"^\s*(?P<name>[A-Za-z_$][\w$]*)\s*:\s*(?:async\s*)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*=>")
_TEST_RE = re.compile(
    r"(?<![\w$.])(?P<fn>describe|test|it)(?:\.(?:only|skip|todo|describe))?\s*\(")
_EP_RE = re.compile(
    r"(?P<obj>[A-Za-z_$][\w$]*)\.(?P<verb>get|post|put|delete|patch|use)\s*\(")
_NEW_RE = re.compile(r"\bnew\s+([A-Za-z_$][\w$]*)\s*[(<]")
_CALL_RE = re.compile(
    r"(?<![\w$.])(?P<chain>[A-Za-z_$][\w$]*(?:\.[A-Za-z_$][\w$]*){0,3})\s*\(")
_JSX_RE = re.compile(r"<([A-Z][\w$]*)[\s/>]")
_CHAINED_RCV_RE = re.compile(
    r"(?<![\w$.])(?P<fn>[A-Za-z_$][\w$]*)\s*\(\s*\)\s*\.\s*"
    r"(?P<called>[A-Za-z_$][\w$]*)\s*\(")
_IDENT_RE = re.compile(r"[A-Za-z_$][\w$]*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")
_STR_RE = re.compile(r"""["'`]([^"'`]*)["'`]""")
_NEXT_EP_RE = re.compile(
    r"^\s*export\s+(?:async\s+)?(?:function\s+(?P<fn>GET|POST|PUT|PATCH|DELETE)\b"
    r"|const\s+(?P<cn>GET|POST|PUT|PATCH|DELETE)\s*=)")
_REQ_FETCH_RE = re.compile(r"\bfetch\s*\(\s*(['\"`])(?P<url>[^'\"`]*)\1")
_REQ_LIB_RE = re.compile(
    r"\b(?P<lib>[A-Za-z_$][\w$]*)\.(?P<verb>get|post|put|delete|patch)\s*\(\s*(['\"`])(?P<url>[^'\"`]*)\3")
_REQ_NEW_RE = re.compile(
    r"\bnew\s+(?:Next)?Request\s*\(\s*(['\"`])(?P<url>[^'\"`]*)\1")
_ROUTE_JSX_RE = re.compile(
    r"<Route\s[^>]*?path=\{?[\"'`]?(?P<path>[^\"'`}\s]+)[\"'`]?\}?[^>]*?"
    r"(?:(?:component|element)=\{\s*<?\s*(?P<comp>[A-Za-z_$][\w$]*))?")
_DEFAULT_EXPORT_RE = re.compile(
    r"export\s+default\s+(?:function\s+)?([A-Za-z_$][\w$]*)"
    r"|export\s*\{\s*([A-Za-z_$][\w$]*)\s+as\s+default\s*\}")


_RET_TYPE_RE = re.compile(
    r"\)\s*:\s*(?P<ret>[A-Za-z_$][\w$.]*(?:<[^={;]*?>)?)\s*(?:=>|\{|;|$)")


def _ret_type(mlines, s, n):
    """Explicit return-type annotation of a function/arrow/method header,
    Promise-unwrapped (ts_resolver.rs extract_fn_returns:459-519): generic
    returns and 1-char type params are rejected, `Promise<X>` yields X."""
    header = " ".join(x.strip() for x in mlines[s:min(s + 3, n)])
    m = _RET_TYPE_RE.search(header)
    if not m:
        return None
    ret = m.group("ret").strip()
    if ret.startswith("Promise<") and ret.endswith(">"):
        inner = ret[8:-1]
        ret = inner if len(inner) > 1 else ret
    if not ret or "<" in ret:
        return None
    return ret


def _delta(line: str) -> int:
    return (line.count("{") - line.count("}"))


def _span_end(mlines, i, n):
    """End row of a block opening at/after row i (brace balanced; `;` before
    any `{` ends a statement)."""
    d = 0
    opened = False
    j = i
    while j < n:
        for ch in mlines[j]:
            if ch == "{":
                d += 1
                opened = True
            elif ch == "}":
                d -= 1
        if opened and d <= 0:
            return j
        if not opened and mlines[j].rstrip().endswith(";"):
            return j
        j += 1
    return n - 1


def _bracket_span_end(mlines, i, n):
    """End row of a multi-line `[...]` initializer: balances BOTH `[]` and
    `{}` so a semicolon-free array class field (`rows = [`) ends at its own
    closing bracket instead of running to the next brace-balanced line —
    which is typically the following method, silently swallowing it
    (ADVICE r05; _span_end only balances `{}`)."""
    d = 0
    opened = False
    for j in range(i, n):
        for ch in mlines[j]:
            if ch in "[{":
                d += 1
                opened = True
            elif ch in "]}":
                d -= 1
        if opened and d <= 0:
            return j
    return n - 1


_VAR_VALUE_OK = re.compile(
    r"^(?:new\s+[A-Za-z_$]|['\"`]|\d|\{|\[|true\b|false\b|[A-Za-z_$][\w$]*(?:\.[A-Za-z_$][\w$]*)*\s*[;,]?\s*$)")


def _base_type_ts(t: str) -> str:
    """Strip generics/array/namespace qualifiers: `api.Client<T>[]` -> Client."""
    t = t.split("<")[0].rstrip("[] ").strip()
    return t.rsplit(".", 1)[-1]


def make_ts_extractor(lang: str):
    def fn(path: str, content: str) -> Extraction:
        return extract_ts(path, content, lang)
    return fn


def extract_ts(path: str, content: str, lang: str = "typescript",
               ext_override: str | None = None) -> Extraction:
    # ext_override: treat the file as having this extension for the
    # dispatch gates below (the svelte extractor feeds a <script> slice of
    # a .svelte file through the ts machinery, svelte.rs:57-76); node.file
    # and path-convention checks keep the real path
    eff = path if ext_override is None else f"{path}.{ext_override}"
    ex = Extraction()
    if eff.endswith((".mdx", ".md")):
        if is_extra_page(path):
            name = page_name(path) if "/pages/" in path else \
                path.replace("\\", "/").rsplit("/", 2)[-2]
            pg = ex.node("Page", name, path, 0, 0, route_from_path(path))
        # member-expression assignments are Vars (variables_query last arm)
        for i, line in enumerate(content.split("\n")):
            mm = re.match(r"^([A-Za-z_$][\w$]*(?:\.[A-Za-z_$][\w$]*)+)\s*=[^=]", line)
            if mm:
                ex.node("Var", mm.group(1), path, i, i, line)
        return ex
    if not eff.endswith((".ts", ".tsx", ".js", ".jsx")):
        return ex
    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    mlines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)
    testfile = is_test_file(path)

    funcs: list[dict] = []       # {name,start,end,operand,body}
    import_rows: list[int] = []

    def body_of(s, e):
        return "\n".join(lines[s:e + 1])

    def scan(lo, hi, class_ctx, depth_in_method, top=False):
        i = lo
        while i <= hi:
            ml = mlines[i]
            st = ml.strip()
            if not st:
                i += 1
                continue

            am = _ASSIGN_ARROW_RE.match(ml)
            if am and class_ctx is None:
                e = _span_end(mlines, i, n)
                funcs.append(dict(name=am.group("name"), start=i, end=e,
                                  operand=None, body=body_of(i, e)))
                scan(i + 1, e - 1, None, True)
                i = e + 1
                continue

            if (st.startswith(("import ", "import{"))
                    or (st.startswith("export") and " from " in nclines[i])) \
                    and class_ctx is None:
                e = _span_end(mlines, i, n)
                # multi-line named imports: join the strings-intact lines
                joined = " ".join(x.strip() for x in nclines[i:e + 1])
                m = _IMPORT_RE.match(joined) or _EXPORT_FROM_RE.match(joined)
                if m:
                    import_rows.extend(range(i, e + 1))
                    _emit_import(ex, path, m)
                    i = e + 1
                    continue
                if st.startswith("import"):  # bare `import "reflect-metadata"`
                    import_rows.extend(range(i, e + 1))
                    i = e + 1
                    continue

            m = _CLASS_RE.match(ml)
            if m and class_ctx is None:
                e = _span_end(mlines, i, n)
                name = m.group("name")
                head = " ".join(mlines[i:min(i + 3, e + 1)])
                ex.node("Class", name, path, i, e, body_of(i, e))
                for im in re.finditer(r"implements\s+([A-Za-z_$][\w$,\s<>]*)", head):
                    for t in im.group(1).split(","):
                        t = t.strip().split("<")[0].strip()
                        if t and t[0].isupper():
                            ex.mention(M_IMPLEMENTS, ("Class", name, path, i, None), t)
                # DataModel variants: extends Model / @Entity() decorator above
                # (skip blank/comment lines between decorator and class)
                prev = ""
                for j in range(i - 1, max(-1, i - 6), -1):
                    pj = mlines[j].strip()
                    if pj:
                        prev = pj
                        break
                if re.search(r"extends\s+Model\b", head) or prev.startswith("@Entity"):
                    ex.node("DataModel", name, path, i, e, body_of(i, e))
                # React.Component with render -> component Function
                if re.search(r"extends\s+React\.Component", head):
                    ex.node("Function", name, path, i, e, body_of(i, e))
                scan(i + 1, e - 1, (name, i), False)
                i = e + 1
                continue

            m = _IFACE_RE.match(ml)
            if m:
                e = _span_end(mlines, i, n)
                b = body_of(i, e)
                ex.node("DataModel", m.group("name"), path, i, e, b)
                if _has_method_sig(mlines, i, e):
                    ex.node("Trait", m.group("name"), path, i, e, b)
                i = e + 1
                continue

            m = _ENUM_RE.match(ml)
            if m:
                e = _span_end(mlines, i, n)
                ex.node("DataModel", m.group("name"), path, i, e, body_of(i, e))
                i = e + 1
                continue

            m = _TYPE_RE.match(ml)
            if m:
                e = _span_end(mlines, i, n)
                b = body_of(i, e)
                ex.node("DataModel", m.group("name"), path, i, e, b)
                # type X = { method(): T; ... } with method signatures
                if "{" in "\n".join(mlines[i:e + 1]) and _has_method_sig(mlines, i, e):
                    ex.node("Trait", m.group("name"), path, i, e, b)
                i = e + 1
                continue

            m = _FNDECL_RE.match(ml)
            if m:
                e = _span_end(mlines, i, n)
                funcs.append(dict(name=m.group("name"), start=i, end=e,
                                  operand=None, body=body_of(i, e)))
                scan(i + 1, e - 1, None, True)
                i = e + 1
                continue

            m = _VARDECL_RE.match(ml)
            if m and class_ctx is None:
                e = _span_end(mlines, i, n)
                name, val = m.group("name"), m.group("val").strip()
                full_val = val if e == i else val + " " + " ".join(
                    x.strip() for x in mlines[i + 1:e + 1])
                is_arrow = bool(re.match(
                    r"^(?:async\s*)?(?:<[^>]*>\s*)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=]*?)?\s*=>",
                    full_val)) or (val.rstrip().endswith("=>"))
                is_fnexpr = bool(re.match(r"^(?:async\s+)?function\b", val))
                exported = st.startswith("export")
                is_call = bool(re.match(
                    r"^(?:await\s+)?[A-Za-z_$][\w$.]*\s*\(", val)) and "=>" not in val
                if is_arrow or is_fnexpr:
                    funcs.append(dict(name=name, start=i, end=e, operand=None,
                                      body=body_of(i, e)))
                    scan(i + 1, e - 1, None, True)
                elif val.startswith("styled.") and top:
                    # const X = styled.div`...` (tagged template component)
                    funcs.append(dict(name=name, start=i, end=e, operand=None,
                                      body=body_of(i, e)))
                elif exported and top and re.match(
                        r"^[A-Za-z_$][\w$]*\s*[<(]", val) \
                        and not val.startswith("new"):
                    # `export const X = memo(...)|createContext(...)|create(...)`
                    # — plain-identifier callee (the reference's export-const-
                    # call function pattern; member callees like
                    # express.Router() stay plain declarations)
                    funcs.append(dict(name=name, start=i, end=e, operand=None,
                                      body=body_of(i, e)))
                elif _VAR_VALUE_OK.match(val) and top:
                    # the variables query is program-anchored: only top-level
                    # declarations become Vars (react_ts.rs:170-227)
                    ex.node("Var", name, path, i, e, body_of(i, e))
                    if val.startswith(("{", "[")):
                        # pair functions inside object-literal values are
                        # still captured (bare pair pattern, react_ts.rs:380)
                        scan(i + 1, e - 1, None, True)
                else:
                    scan(i + 1, e - 1, None, True)
                i = e + 1
                continue

            mam = _MEMBER_ASSIGN_RE.match(ml) if class_ctx is None and top else None
            if mam:
                e = _span_end(mlines, i, n)
                ex.node("Var", mam.group("name"), path, i, e, body_of(i, e))
                scan(i + 1, e - 1, None, True)
                i = e + 1
                continue

            if class_ctx is not None and not depth_in_method:
                m = _METHOD_RE.match(ml) or _METHOD_ONELINE_RE.match(ml)
                if m and m.group("name") not in ("if", "for", "while", "switch",
                                                 "catch", "return", "render",
                                                 "super"):
                    e = _span_end(mlines, i, n)
                    cname, cstart = class_ctx
                    if m.group("name") == "constructor":
                        # constructor parameter properties are class fields
                        # (registry/typescript.rs class_fields analogue)
                        header = " ".join(x.strip() for x in
                                          mlines[i:min(i + 5, e + 1)])
                        header = header.split(")", 1)[0]
                        for cm in _CTOR_PROP_RE.finditer(header):
                            ex.mention(M_STRUCT_FIELD,
                                       ("Class", cname, path, 0, None),
                                       cm.group("name"),
                                       extra={"ftype": _base_type_ts(
                                           cm.group("type"))})
                    funcs.append(dict(name=m.group("name"), start=i, end=e,
                                      operand=(cname, cstart),
                                      body=body_of(i, e)))
                    scan(i + 1, e - 1, class_ctx, True)
                    i = e + 1
                    continue
                # multi-line object/array-literal field initializer: skip its
                # body wholesale — inner `key: Type,` lines are object keys at
                # class indentation and would otherwise emit spurious
                # struct_field registry entries (ADVICE r04)
                om = _FIELD_OBJ_OPEN_RE.match(ml)
                if om:
                    # `[` openers need bracket balancing — _span_end only
                    # balances `{}` and would run a semicolon-free array
                    # field into the next method (ADVICE r05)
                    e = (_bracket_span_end(mlines, i, n)
                         if ml.rstrip().endswith("[")
                         else _span_end(mlines, i, n))
                    if e > i:
                        i = e + 1
                        continue
                # field declarations with a recoverable type: `= new X()`
                # initializers and `name: Type` annotations feed the
                # receiver registry (this.field.method() -> Type.method)
                fm = _FIELD_NEW_RE.match(ml) or _FIELD_TYPED_RE.match(ml)
                if fm and fm.group("name") not in KEYWORDS:
                    ex.mention(M_STRUCT_FIELD,
                               ("Class", class_ctx[0], path, 0, None),
                               fm.group("name"),
                               extra={"ftype": _base_type_ts(fm.group("type"))})

            sm2 = _SHORTHAND_METHOD_RE.match(ml) if (class_ctx is None
                                                       and not top) else None
            if sm2 and sm2.group("name") not in KEYWORDS \
                    and sm2.group("name") not in ("render",):
                e = _span_end(mlines, i, n)
                funcs.append(dict(name=sm2.group("name"), start=i, end=e,
                                  operand=None, body=body_of(i, e)))
                scan(i + 1, e - 1, None, True)
                i = e + 1
                continue

            pm = _PAIR_ARROW_RE.match(ml)
            if pm and class_ctx is None and pm.group("name") not in KEYWORDS:
                e = _span_end(mlines, i, n)
                funcs.append(dict(name=pm.group("name"), start=i, end=e,
                                  operand=None, body=body_of(i, e)))
                scan(i + 1, e - 1, None, True)
                i = e + 1
                continue

            # blocks we don't model: skip over to keep line scan aligned
            if st.endswith("{") and not st.startswith(("if", "else", "for",
                                                       "while", "switch", "try",
                                                       "do", "}")):
                e = _span_end(mlines, i, n)
                if e > i:
                    scan(i + 1, e - 1, class_ctx, depth_in_method)
                    i = e + 1
                    continue
            i += 1

    scan(0, n - 1, None, False, top=True)

    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e,
                "\n".join(lines[r] for r in range(s, e + 1)))

    # ---------------- tests (describe anywhere; top-level test/it) --------
    tests: list[dict] = []
    if testfile:
        depth = 0
        for i in range(n):
            for m in _TEST_RE.finditer(mlines[i]):
                fnname = m.group("fn")
                at_stmt_start = mlines[i][:m.start()].strip() == ""
                # describe() matches at ANY depth (unanchored query pattern);
                # test()/it() only as top-level statements (react_ts.rs:537-586)
                if fnname != "describe" and not (depth == 0 and at_stmt_start):
                    continue
                sm = _STR_RE.search(nclines[i][m.end():]) or \
                     _STR_RE.search(nclines[i + 1] if i + 1 < n else "")
                if not sm:
                    continue
                tname = sm.group(1)
                e = _span_end(mlines, i, n)
                b = body_of(i, e)
                tt = classify_test(tname, path, b)
                meta = {"test_kind": {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(tt, "unit")}
                if not any(t["name"] == tname and t["start"] == i for t in tests):
                    tests.append(dict(name=tname, start=i, end=e, type=tt))
                    ex.node(tt, tname, path, i, e, b, meta=meta)
            depth += _delta(mlines[i])

    # ---------------- endpoints ------------------------------------------
    if not testfile:
        _scan_endpoints(ex, path, lines, mlines, nclines, funcs)

    # next.js extra pages
    if is_extra_page(path):
        name = page_name(path)
        pg = ex.node("Page", name, path, 0, 0, route_from_path(path))
        dm = _DEFAULT_EXPORT_RE.search(no_comments)
        if dm:
            ex.mention(M_RENDERS, pg.ref(), dm.group(1) or dm.group(2))

    # react-router <Route> pages (attributes may span lines / any order)
    seen_routes = set()
    for i in range(n):
        if "<Route" not in nclines[i]:
            continue
        window = " ".join(x.strip() for x in nclines[i:min(i + 4, n)])
        tag = window[window.index("<Route"):]
        end = tag.find(">")
        tag = tag[:end + 1] if end != -1 else tag
        pm = re.search(r"path=\{?[\"'`]([^\"'`]+)[\"'`]\}?", tag)
        cm = re.search(r"(?:component|element)=\{\s*<?\s*([A-Za-z_$][\w$]*)", tag)
        if not cm:
            cm = re.search(r">\s*<\s*([A-Z][\w$]*)", window)
        if pm and (pm.group(1), i) not in seen_routes:
            seen_routes.add((pm.group(1), i))
            pg = ex.node("Page", pm.group(1), path, i, i, lines[i])
            if cm:
                ex.mention(M_RENDERS, pg.ref(), cm.group(1))

    # ---------------- function/test nodes + body scans ---------------------
    for f in funcs:
        if testfile:
            # functions in test files are dropped from the Function set
            # (is_test == is_test_file, tests_are_functions=false ->
            # collect_functions excludes identified tests only; plain funcs
            # in test files STAY functions in the reference) — keep them
            pass
        meta = {}
        if f["operand"]:
            meta["operand"] = f["operand"][0]
            ex.edge("Operand", ("Class", f["operand"][0], path, f["operand"][1], None),
                    ("Function", f["name"], path, f["start"], None))
        ret = _ret_type(mlines, f["start"], n)
        if ret:
            # feeds the registry's fn_returns chained-call resolution
            # (ts_resolver.rs:560-600: `getClient().query()`)
            meta["ret_type"] = ret
        ex.node("Function", f["name"], path, f["start"], f["end"], f["body"],
                meta=meta)
        src_ref = ("Function", f["name"], path, f["start"], None)
        _scan_fn_body(ex, src_ref, path, mlines, nclines, lines, f["start"],
                      f["end"],
                      cls_name=f["operand"][0] if f["operand"] else None)

    for t in tests:
        src_ref = (t["type"], t["name"], path, t["start"], None)
        _scan_fn_body(ex, src_ref, path, mlines, nclines, lines, t["start"],
                      t["end"], in_test=True)

    # NESTED_IN function -> Var by row-range containment
    # (find_functions_nested_in_variables, lang/mod.rs:681-706)
    var_nodes = [nd for nd in ex.nodes if nd.node_type == "Var"]
    fn_nodes = {(nd.name, nd.start): nd for nd in ex.nodes
                if nd.node_type == "Function"}
    for f in funcs:
        for v in var_nodes:
            if f["start"] > v.start and f["end"] <= v.end:
                ex.edge("NestedIn",
                        ("Function", f["name"], path, f["start"], None),
                        ("Var", v.name, path, v.start, None))
                nd = fn_nodes.get((f["name"], f["start"]))
                if nd is not None:
                    nd.meta["nested_in"] = v.name
                break

    # NESTED_IN containment
    for child in funcs:
        for parent in funcs:
            if child is not parent and child["start"] > parent["start"] \
                    and child["end"] < parent["end"]:
                ex.edge("NestedIn",
                        ("Function", child["name"], path, child["start"], None),
                        ("Function", parent["name"], path, parent["start"], None))
    return ex


def _has_method_sig(mlines, s, e) -> bool:
    for j in range(s, e + 1):
        if re.match(r"^\s*[A-Za-z_$][\w$]*\s*(?:<[^>]*>)?\s*\([^)]*\)\s*:",
                    mlines[j]) and not mlines[j].strip().startswith(("if", "for")):
            return True
    return False


def _emit_import(ex: Extraction, path: str, m):
    file_ref = ("File", path, path, 0, None)
    src = m.group("src")
    module = resolve_import_path(src)
    clause = m.groupdict().get("clause") or m.groupdict().get("names") or ""
    names: list[str] = []
    aliases: list[str] = []
    inner = re.search(r"\{([^}]*)\}", clause)
    if inner:
        for part in inner.group(1).split(","):
            part = part.strip()
            if not part:
                continue
            if " as " in part:
                aliases.append(part.split(" as ")[-1].strip())
            else:
                names.append(part)
    default = re.match(r"^([A-Za-z_$][\w$]*)", clause.strip())
    if default and default.group(1) not in ("type",):
        names.insert(0, default.group(1))
    use = aliases if aliases else names
    for nm in use:
        if nm and nm != "*":
            ex.mention(M_IMPORT, file_ref, nm, dst_file=module)
            ex.mention(M_IMPORT_EDGE, file_ref, nm, dst_file=module)


def _scan_fn_body(ex, src_ref, path, mlines, nclines, lines, s, e,
                  in_test=False, cls_name=None):
    idents: set[str] = set()
    dm_names: set[str] = set()
    for off in range(s, e + 1):
        cl = mlines[off]
        ncl = nclines[off]
        # requests (strings intact)
        m = _REQ_FETCH_RE.search(ncl)
        if m and not in_test:
            url = m.group("url")
            body = lines[off]
            verb = next((v for v in ("GET", "POST", "PUT", "DELETE")
                         if v in "\n".join(lines[off:min(off + 5, e + 1)])), "GET")
            req = ex.node("Request", url, path, off, off, body, meta={"verb": verb})
            ex.edge("Calls", src_ref, req.ref())
        m = _REQ_LIB_RE.search(ncl)
        if m and not in_test:
            req = ex.node("Request", m.group("url"), path, off, off, lines[off],
                          meta={"verb": m.group("verb").upper()})
            ex.edge("Calls", src_ref, req.ref())
        m = re.search(r"\b(axios|ky|superagent)\s*\(\s*\{", ncl)
        if m and not in_test:
            window = "\n".join(nclines[off:min(off + 6, e + 1)])
            um = re.search(r"url\s*:\s*(['\"`])([^'\"`]*)\1", window)
            if um:
                vm = re.search(r"method\s*:\s*['\"`]?(GET|POST|PUT|DELETE|PATCH)", window)
                verb = vm.group(1) if vm else "GET"
                req = ex.node("Request", um.group(2), path, off, off, window,
                              meta={"verb": verb})
                ex.edge("Calls", src_ref, req.ref())
        m = _REQ_NEW_RE.search(ncl)
        if m and not in_test:
            verb = next((v for v in ("GET", "POST", "PUT", "DELETE")
                         if v in "\n".join(lines[off:min(off + 5, e + 1)])), "GET")
            req = ex.node("Request", m.group("url"), path, off, off, lines[off],
                          meta={"verb": verb})
            ex.edge("Calls", src_ref, req.ref())

        for m in _NEW_RE.finditer(cl):
            name = m.group(1)
            if name not in ("Request", "NextRequest") and name not in JS_BUILTIN_OBJECTS:
                ex.mention(M_CALL, src_ref, name, row=off,
                           extra={"class_new": "1"})
        # chained receiver: `getClient().query(...)` — the receiver is a call
        # whose declared return type resolves the method (registry fn_returns;
        # ts_resolver.rs eval_expr_type call_expression arm)
        for m in _CHAINED_RCV_RE.finditer(cl):
            called = m.group("called")
            if called not in KEYWORDS and not should_skip_call(called, None):
                ex.mention(M_CALL, src_ref, called, row=off,
                           extra={"rcv_call": m.group("fn")})
        for m in _CALL_RE.finditer(cl):
            chain = m.group("chain")
            if cl[max(0, m.start() - 4):m.start()].rstrip().endswith("new"):
                continue
            parts = chain.split(".")
            called = parts[-1]
            operand = parts[0] if len(parts) > 1 else None
            if operand == "this" and cls_name and called not in KEYWORDS:
                if len(parts) >= 3:
                    # this.field.method(): field-typed receiver — the
                    # registry resolves via the class-field type at 1.0
                    # (ts_resolver.rs eval_expr_type member_expression arm)
                    ex.mention(M_CALL, src_ref, called, row=off,
                               extra={"rcv_base": cls_name,
                                      "rcv_field": parts[1]})
                    continue
                # this.method(): same-class method — operand strategy
                operand = cls_name
            if called in KEYWORDS or (operand in KEYWORDS if operand else False):
                continue
            skipped = should_skip_call(called, operand)
            if skipped and operand is None:
                continue
            extra = {"skip": "1"} if skipped else {}
            ex.mention(M_CALL, src_ref, called, operand=operand, row=off,
                       extra=extra)
        for m in _JSX_RE.finditer(cl):
            name = m.group(1)
            if not should_skip_call(name, None):
                ex.mention(M_CALL, src_ref, name, operand=None, row=off)
        for m in _IDENT_RE.finditer(cl):
            idents.add(m.group(0))
        for m in _TYPEID_RE.finditer(cl):
            dm_names.add(m.group(1))
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=sorted(idents))
    if dm_names:
        ex.mention(M_DM_WITHIN, src_ref, "", names=sorted(dm_names))


def _scan_endpoints(ex, path, lines, mlines, nclines, funcs):
    n = len(lines)
    # Next.js: export function GET/POST... in route files
    for i in range(n):
        m = _NEXT_EP_RE.match(mlines[i])
        if m:
            verb = m.group("fn") or m.group("cn")
            name = endpoint_name_from_file(path)
            ep = ex.node("Endpoint", name, path, i, i, lines[i],
                         meta={"verb": verb, "handler": verb})
            ex.mention(M_HANDLER, ep.ref(), verb, extra={"verb_style": "1"})

    # chained: obj.route("/path").verb(arrow).verb(arrow) (react_ts.rs:672-712)
    for i in range(n):
        cm = re.search(r"\.\s*route\s*\(\s*(['\"`])(?P<p>[^'\"`]*)\1\s*\)", nclines[i])
        if cm:
            ep_path = cm.group("p")
            # statement end: combined paren+brace balance back to 0 on a
            # ';'-terminated line (the chain spans multiple blocks)
            d = 0
            fe = i
            for j in range(i, n):
                d += (mlines[j].count("(") - mlines[j].count(")")
                      + mlines[j].count("{") - mlines[j].count("}"))
                if d <= 0 and mlines[j].rstrip().endswith(";"):
                    fe = j
                    break
            else:
                fe = _span_end(mlines, i, n)
            for j in range(i, fe + 1):
                vm = re.search(r"\.\s*(get|post|put|delete|patch)\s*\(", nclines[j])
                if vm and "=>" in "".join(nclines[j:min(j + 2, fe + 1)]):
                    crow = j if "=>" in nclines[j] else j + 1
                    fname = anonymous_handler_name(vm.group(1), ep_path, crow)
                    ve = _span_end(mlines, j, n)
                    ex.node("Function", fname, path, crow, ve,
                            "\n".join(lines[crow:ve + 1]))
                    ep = ex.node("Endpoint", ep_path, path, j, ve, lines[j],
                                 meta={"verb": vm.group(1).upper(),
                                       "handler": fname, "object": "router"})
                    ex.mention(M_HANDLER, ep.ref(), fname)

    # express: obj.verb("/path", handler|arrow)
    for i in range(n):
        ncl = nclines[i]
        for m in _EP_RE.finditer(ncl):
            obj, verb = m.group("obj"), m.group("verb")
            after = ncl[m.end():]
            sm = _STR_RE.match(after.strip())
            if not sm:
                continue
            ep_path = sm.group(1)
            rest = after[after.index(sm.group(0)) + len(sm.group(0)):]
            hm = re.match(r"\s*,\s*([A-Za-z_$][\w$]*)\s*[\),]", rest)
            arrow = re.match(r"\s*,\s*(?:async\s*)?\(", rest) or \
                re.search(r"=>", rest[:120])
            if verb == "use":
                if hm:  # group registration: app.use("/prefix", router)
                    ex.mention(M_EP_GROUP_USE, ("File", path, path, 0, None),
                               hm.group(1), extra={"prefix": ep_path})
                elif arrow or "=>" in ncl:
                    fe0 = _span_end(mlines, i, n)
                    crow = i if "=>" in mlines[i] else next(
                        (j for j in range(i + 1, fe0 + 1) if "=>" in mlines[j]), i)
                    fname = anonymous_handler_name("use", ep_path, crow)
                    ex.node("Function", fname, path, crow, fe0,
                            "\n".join(lines[crow:fe0 + 1]))
                continue
            fe = _span_end(mlines, i, n)
            # the anonymous arrow Function node is created whenever an arrow
            # argument exists, even with middleware identifiers before it
            # (collect_router_arrow_functions runs all finders)
            anon_name = None
            if arrow or any("=>" in mlines[j] for j in range(i, min(fe, i + 4) + 1)):
                crow = i if "=>" in mlines[i] else next(
                    (j for j in range(i + 1, fe + 1) if "=>" in mlines[j]), i)
                anon_name = anonymous_handler_name(verb, ep_path, crow)
                ex.node("Function", anon_name, path, crow, fe,
                        "\n".join(lines[crow:fe + 1]))
            handler = hm.group(1) if hm else anon_name
            if handler:
                ep = ex.node("Endpoint", ep_path, path, i, fe, lines[i],
                             meta={"verb": verb.upper(), "handler": handler,
                                   "object": obj})
                ex.mention(M_HANDLER, ep.ref(), handler)
