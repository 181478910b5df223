"""C# extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's C# tree-sitter queries
(/root/reference/ast/src/lang/queries/csharp.rs) and the C# registry
(/root/reference/ast/src/lang/registry/cs_resolver.rs):

* Class      — class / interface / struct / record / enum declarations
               (csharp.rs:103-130); first base-list identifier ->
               meta.parent (ParentOf); every base -> IMPLEMENTS mention
               (feeds the interface-dispatch registry)
* Trait      — interface declarations additionally (csharp.rs:132-138)
* DataModel  — DbSet<X> properties (named X) and [Table]-attributed classes
               (csharp.rs:456-478); record declarations are Classes only
* Function   — methods + constructors (csharp.rs:140-163); class methods
               carry meta.operand + an Operand edge (find_function_parent
               csharp.rs:396-424); interface/abstract declarations keep an
               EMPTY body so the cascade's non-empty rule excludes them
* Var        — FIELD declarations only (variables_query csharp.rs:211-221)
* tests      — every function in a test file is a test (is_test
               csharp.rs:228-242); [Fact]/[Theory]/[Test]/[TestMethod]
               attributes elsewhere; classification per classify_test
               (/integration|webapplicationfactory -> IntegrationTest, ...)
* Endpoint   — [HttpVerb("path")] controller attributes (endpoint name =
               path string, or the handler method name when the attribute is
               bare — observed reference output); app.MapGet(...) minimal
               APIs with named handlers or lambdas
               ({VERB}_{path}_closure_L{row} Functions,
               generate_anonymous_handler_name csharp.rs:311-321); bare
               [Route] class attributes yield NO endpoint (no handler ->
               admission drops them, btreemap_graph.rs:352-372)
* registry   — field/param/local receiver types ride call mentions
               (rcv_type / rcv_base+rcv_field + struct_field mentions);
               interface receivers resolve through the java-style
               trait-implementor expansion in link/calls.py
               (find_method_in_class, cs_resolver.rs:215-262)
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_IDENT, M_IMPLEMENTS, M_IMPORT,
                   Extraction, trim_quotes)
from .go_lang import mask_sources
from .java_lang import M_STRUCT_FIELD, _paren_end, _span_end

_MODS = r"(?:(?:public|private|protected|internal|static|sealed|abstract|partial|readonly|virtual|override|async|extern|unsafe|new|file|required)\s+)*"
_ATTR_LINE = r"(?:\[[^\]]*\]\s*)*"

_TYPE_RE = re.compile(
    rf"^\s*{_MODS}(?P<kind>class|interface|struct|record|enum)\s+(?P<name>[A-Za-z_]\w*)")
_METHOD_RE = re.compile(
    rf"^\s*{_MODS}"
    r"(?P<ret>[A-Za-z_][\w.]*(?:\s*<[^;={{}}()]*>)?(?:\[\])?[?]?|\([^)]*\))\s+"
    r"(?P<name>[A-Za-z_]\w*)\s*(?:<[^>]*>)?\s*\(")
_TUPLE_METHOD_RE = re.compile(
    rf"^\s*{_MODS}Task\s*<\s*\([^)]*\)\s*>\s+(?P<name>[A-Za-z_]\w*)\s*\(")
_CTOR_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|internal|static)\s+)*(?P<name>[A-Z]\w*)\s*\(")
_FIELD_RE = re.compile(
    rf"^\s*(?:(?:public|private|protected|internal|static|readonly|const|volatile)\s+)+"
    r"(?P<type>[A-Za-z_][\w.]*(?:\s*<[^;={{}}()]*>)?(?:\[\])?[?]?)\s+"
    r"(?P<name>[A-Za-z_]\w*)\s*(?P<tail>=(?![=>])|;)")
_LOCAL_RE = re.compile(
    r"^\s*(?:var|(?P<type>[A-Za-z_][\w.]*(?:<[^;=]{0,80}>)?[?]?))\s+"
    r"(?P<name>[A-Za-z_]\w*)\s*=\s*(?:await\s+)?(?:new\s+(?P<new>[A-Za-z_][\w.]*))?")
_USING_RE = re.compile(r"^\s*(?:global\s+)?using\s+(?:static\s+)?(?P<path>[\w.]+)\s*;")
_HTTP_ATTR_RE = re.compile(
    r"\[\s*Http(?P<verb>Get|Post|Put|Delete|Patch|Options)\s*(?:\(\s*\"(?P<path>[^\"]*)\"\s*\))?\s*\]")
_MAP_RE = re.compile(
    r"(?:\bapp\s*\.|^\s*\.)?\bMap(?P<verb>Get|Post|Put|Delete|Patch)\s*\(\s*\"(?P<path>[^\"]*)\"\s*,\s*(?P<rest>.*)$")
_TEST_ATTR_RE = re.compile(r"^\s*\[\s*(Fact|Theory|Test|TestMethod)\b")
_TABLE_ATTR_RE = re.compile(r"^\s*\[\s*Table\b")
_DBSET_RE = re.compile(r"DbSet\s*<\s*([A-Za-z_]\w*)\s*>\s+(\w+)")
_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*(?:<[\w.,<>\s?]{0,60}>)?\s*\(")
_CHAIN_CALL_RE = re.compile(r"[)\]]\s*[.?!]*\.\s*([A-Za-z_]\w*)\s*\(")
_LEAD_CHAIN_RE = re.compile(r"^\s*\.\s*([A-Za-z_]\w*)\s*\(")
_NEW_RE = re.compile(r"\bnew\s+([A-Za-z_][\w.]*)\s*(?:<[^>(]*>)?\s*\(")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

KEYWORDS = {"if", "else", "for", "foreach", "while", "do", "switch", "return",
            "new", "throw", "try", "catch", "finally", "using", "lock",
            "yield", "await", "case", "break", "continue", "base", "this",
            "typeof", "nameof", "sizeof", "default", "checked", "unchecked",
            "is", "as", "in", "out", "ref", "var", "void", "int", "long",
            "double", "float", "bool", "char", "byte", "short", "string",
            "decimal", "object", "namespace", "class", "interface", "struct",
            "record", "enum", "get", "set", "init", "value", "when", "where",
            "select", "from", "while"}
BAD_RET = {"return", "new", "throw", "if", "while", "for", "foreach",
           "switch", "case", "else", "await", "using", "namespace", "base",
           "this", "yield", "lock", "var", "else", "in", "is", "do", "try",
           "public", "private", "protected", "internal", "static", "get",
           "set", "add", "remove", "event", "delegate", "operator",
           "implicit", "explicit"}


def _base_type(t: str) -> str:
    t = t.strip().rstrip("?")
    m = re.match(r"^(?:Task|ValueTask)\s*<(.*)>$", t)
    if m:  # Task<T> unwraps to T (strip_cs_type, cs_resolver.rs:27-45)
        t = m.group(1).strip().rstrip("?")
    if "<" in t:
        t = t[: t.index("<")]
    return t.replace("[]", "").strip().rsplit(".", 1)[-1]


def is_test_file(path: str) -> bool:
    f = path.lower()
    return (f.endswith("tests.cs") or f.endswith("test.cs")
            or f.endswith("_tests.cs") or f.endswith("_test.cs")
            or "/tests/" in f or "/test/" in f)


def classify_test(name: str, file: str, body: str) -> str:
    f = file.lower()
    b = body.lower()
    if ("/e2e/" in f or "/acceptance/" in f or "selenium" in b
            or "playwright" in b):
        return "E2eTest"
    if ("/integration/" in f or "/functionaltest/" in f
            or "webapplicationfactory" in b or "httpclient" in b
            or "testserver" in b):
        return "IntegrationTest"
    if "/unit/" in f or "/unittests/" in f:
        return "UnitTest"
    ln = name.lower()
    if "e2e" in ln or "acceptance" in ln:
        return "E2eTest"
    if "integration" in ln or "functional" in ln:
        return "IntegrationTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, line: int) -> str:
    # generate_anonymous_handler_name csharp.rs:311-321: method is the raw
    # MapGet/MapPost capture, uppercased; braces/colons stripped, slashes -> _
    path_str = path.replace("/", "_").replace("{", "").replace("}", "") \
                   .replace(":", "")
    return f"{method.upper()}_{path_str}_closure_L{line}"


def _leading_attr_rows(nclines, row):
    out = []
    r = row - 1
    while r >= 0:
        s = nclines[r].strip()
        if s.startswith("["):
            out.append(r)
            r -= 1
        elif not s:
            break
        else:
            break
    return out


def extract_csharp(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith(".cs"):
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
    import_rows = [i for i in range(n) if _USING_RE.match(clines[i])]
    for i in import_rows:
        pth = _USING_RE.match(clines[i]).group("path")
        parts = pth.split(".")
        ex.mention(M_IMPORT, ("File", path.rsplit("/", 1)[-1], path, 0, None),
                   parts[-1], dst_file="/".join(parts[:-1]) or pth, row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- type declarations ----------
    types: list[tuple] = []  # (kind, name, start, end, parent, bases)
    for i in range(n):
        m = _TYPE_RE.match(clines[i])
        if not m:
            continue
        header_end = i
        while header_end < n and "{" not in clines[header_end] \
                and not clines[header_end].rstrip().endswith(";"):
            header_end += 1
        header = " ".join(clines[i:min(header_end, n - 1) + 1])
        after = header[header.find(m.group("name")) + len(m.group("name")):]
        # positional record headers: `record X(string A, string B);`
        pe = after.find(")") if after.lstrip().startswith("(") else -1
        base_part = after[pe + 1:] if pe != -1 else after
        bases = []
        bm = re.search(r":\s*([^{]+)", base_part)
        if bm:
            seg = bm.group(1).split(" where ")[0]
            bases = [_base_type(x) for x in seg.split(",") if _base_type(x)]
        # C# uses Allman braces: the '{' usually sits on a LATER line
        j = i
        while j < n and "{" not in clines[j] and ";" not in clines[j]:
            j += 1
        j = min(j, n - 1)
        end = _span_end(clines, j) if "{" in clines[j] else j
        types.append((m.group("kind"), m.group("name"), i, end,
                      bases[0] if bases else None, bases))

    for kind, name, s, e, parent, bases in types:
        meta = {}
        if parent:
            meta["parent"] = parent
        ex.node("Class", name, path, s, e, body(s, e), meta=meta)
        if kind == "interface":
            ex.node("Trait", name, path, s, e, body(s, e))
        for b in bases:
            ex.mention(M_IMPLEMENTS, ("Class", name, path, s, None), b)
        if any(_TABLE_ATTR_RE.match(nclines[r])
               for r in _leading_attr_rows(nclines, s)):
            ex.node("DataModel", name, path, s, e, body(s, e))

    def enclosing_type(row):
        best = None
        for t in types:
            if t[2] <= row <= t[3]:
                if best is None or t[2] > best[2]:
                    best = t
        return best

    # ---------- DbSet DataModels ----------
    for i in range(n):
        for m in _DBSET_RE.finditer(clines[i]):
            ex.node("DataModel", m.group(1), path, i, i, lines[i])

    # ---------- methods / constructors / fields ----------
    funcs: list[tuple] = []   # (name, start, end, enclosing, has_body)
    fields: dict[str, dict[str, str]] = {}
    local_decls: list[tuple] = []  # (name, type, row)
    method_spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        cl = clines[i]
        s_ = cl.strip()
        if not s_ or s_.startswith("[") or _TYPE_RE.match(cl):
            i += 1
            continue
        t = enclosing_type(i)
        in_method = any(ms < i <= me for ms, me in method_spans)
        cm = _CTOR_RE.match(cl)
        mm = _TUPLE_METHOD_RE.match(cl) or _METHOD_RE.match(cl)
        is_ctor = (cm is not None and t is not None and not in_method
                   and cm.group("name") == t[1])
        is_method = (mm is not None and not in_method and t is not None
                     and (mm.groupdict().get("ret") is None
                          or (mm.group("ret").split("<")[0].strip("?").rsplit(".", 1)[-1]
                              not in BAD_RET))
                     and mm.group("name") not in KEYWORDS)
        if is_ctor or is_method:
            name = cm.group("name") if is_ctor else mm.group("name")
            pe = _paren_end(clines, i)
            j = pe
            while j < n and "{" not in clines[j] and ";" not in clines[j] \
                    and "=>" not in clines[j]:
                j += 1
            j = min(j, n - 1)
            if "{" in clines[j]:
                end = _span_end(clines, j)
                has_body = True
            elif "=>" in clines[j]:
                # expression-bodied member: to the terminating ';'
                k = j
                while k < n and ";" not in clines[k]:
                    k += 1
                end = min(k, n - 1)
                has_body = True
            else:
                end = j
                has_body = False  # interface / abstract declaration
            funcs.append((name, i, end, t, has_body))
            if has_body:
                method_spans.append((i, end))
            i += 1
            continue
        fm = _FIELD_RE.match(cl)
        if fm and not in_method and t is not None \
                and fm.group("type").split("<")[0].rstrip("?") not in BAD_RET \
                and fm.group("name") not in KEYWORDS:
            base = _base_type(fm.group("type"))
            ex.node("Var", fm.group("name"), path, i, i, lines[i])
            if t[0] in ("class", "record", "struct"):
                fields.setdefault(t[1], {})[fm.group("name")] = base
            i += 1
            continue
        lm = _LOCAL_RE.match(cl) if in_method else None
        if lm and lm.group("name") not in KEYWORDS:
            vtype = lm.group("new") or lm.group("type")
            if vtype:
                local_decls.append((lm.group("name"), _base_type(vtype), i))
        i += 1

    for cls, fmap in fields.items():
        for fname, ftype in fmap.items():
            ex.mention(M_STRUCT_FIELD, ("Class", cls, path, 0, None), fname,
                       extra={"ftype": ftype})

    # ---------- endpoints: [HttpVerb] controller attributes ----------
    fn_by_row = {fs: fname for fname, fs, fe, _, _ in funcs}
    fn_names = {fname for fname, *_ in funcs}
    for fname, fs, fe, t, has_body in funcs:
        for r in _leading_attr_rows(nclines, fs):
            hm = _HTTP_ATTR_RE.search(nclines[r])
            if not hm:
                continue
            ep_name = hm.group("path") or fname
            verb = hm.group("verb").upper()
            ep = ex.node("Endpoint", ep_name, path, r, r, lines[r],
                         meta={"verb": verb, "handler": fname})
            ex.edge("Handler", ep.ref(), ("Function", fname, path, fs, None))

    # ---------- minimal APIs: app.MapGet("/p", handler|lambda) ----------
    for i in range(n):
        m = _MAP_RE.search(nclines[i])
        if not m:
            continue
        verb, ep_path = m.group("verb"), m.group("path")
        rest = m.group("rest").strip()
        if re.match(r"^\(?[\w\s,()]*\)?\s*=>", rest) or rest.startswith("async"):
            handler = anonymous_handler_name("Map" + verb, ep_path, i)
            he = _span_end(clines, i)
            ex.node("Function", handler, path, i, he, body(i, he))
            ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                         meta={"verb": verb.upper(), "handler": handler})
            ex.edge("Handler", ep.ref(),
                    ("Function", handler, path, i, None))
        else:
            hname = rest.split(")")[0].split(",")[0].strip().rsplit(".", 1)[-1]
            ep = ex.node("Endpoint", ep_path, path, i, i, lines[i],
                         meta={"verb": verb.upper(), "handler": hname or "?"})
            tgt = next((fs for fname, fs, *_ in funcs if fname == hname), None)
            if tgt is not None:
                ex.edge("Handler", ep.ref(),
                        ("Function", hname, path, tgt, None))

    # ---------- function/test nodes + body scans ----------
    for fname, fs, fe, t, has_body in funcs:
        fbody = body(fs, fe) if has_body else ""
        attrs = [nclines[r] for r in _leading_attr_rows(nclines, fs)]
        is_test = testfile or any(_TEST_ATTR_RE.match(a) for a in attrs)
        meta = {}
        if t is not None and t[0] in ("class", "record", "struct") \
                and has_body:
            meta["operand"] = t[1]
        elif t is not None and t[0] == "interface":
            # interface-own methods back the resolver's no-implementation
            # fallback (cs_resolver.rs:254-260)
            meta["trait_operand"] = t[1]
        if is_test:
            tt = classify_test(fname, path, body(fs, fe))
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                tt, "unit")
            ex.node(tt, fname, path, fs, fe, body(fs, fe),
                    meta={"test_kind": kind})
            src_ref = (tt, fname, path, fs, None)
        else:
            ex.node("Function", fname, path, fs, fe, fbody, meta=meta)
            src_ref = ("Function", fname, path, fs, None)
            if meta.get("operand"):
                ex.edge("Operand", ("Class", t[1], path, t[2], None), src_ref)
        if has_body:
            _scan_body(ex, src_ref, path, lines, clines, fs, fe, t, fields,
                       local_decls)

    return ex


def _scan_body(ex, src_ref, path, lines, clines, s, e, enc, fields,
               local_decls):
    n = len(clines)
    cls_name = enc[1] if enc is not None else None
    cls_fields = fields.get(cls_name, {}) if cls_name else {}
    pe = _paren_end(clines, s)
    sig = " ".join(clines[s:pe + 1])
    local_types: dict[str, str] = {}
    o = sig.find("(")
    if o != -1:
        for pm in re.finditer(
                r"([A-Za-z_][\w.]*(?:<[^()<>]*>)?[?]?)\s+([A-Za-z_]\w*)\s*[,)=]",
                sig[o:]):
            if pm.group(1) not in ("out", "ref", "in", "params", "this"):
                local_types[pm.group(2)] = _base_type(pm.group(1))
    for name, vtype, row in local_decls:
        if s <= row <= e:
            local_types[name] = vtype

    idents: set[str] = set()
    dms: set[str] = set()
    for row in range(pe + (0 if pe > s else 1), min(e, n - 1) + 1):
        line = clines[row]
        if row == s:
            continue
        for m in _NEW_RE.finditer(line):
            tname = _base_type(m.group(1))
            ex.mention(M_CALL, src_ref, tname, operand=None, row=row,
                       extra={"rcv_type": tname})
        line_wo_new = _NEW_RE.sub(" ", line)
        for m in _CALL_RE.finditer(line_wo_new):
            chain = m.group(1)
            parts = chain.split(".")
            called = parts[-1]
            if called in KEYWORDS or parts[0] in KEYWORDS - {"this"}:
                continue
            operand = ".".join(parts[:-1]) if len(parts) > 1 else None
            extra = {}
            if len(parts) == 2 and parts[0] == "this":
                operand = None
            elif len(parts) == 2:
                b = parts[0]
                if b in local_types:
                    extra = {"rcv_type": local_types[b]}
                elif b in cls_fields and cls_name:
                    extra = {"rcv_base": cls_name, "rcv_field": b}
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row,
                       extra=extra or None)
        for m in _CHAIN_CALL_RE.finditer(line_wo_new):
            if m.group(1) not in KEYWORDS:
                ex.mention(M_CALL, src_ref, m.group(1), operand=None, row=row)
        lm = _LEAD_CHAIN_RE.match(line_wo_new)
        if lm and lm.group(1) not in KEYWORDS:
            ex.mention(M_CALL, src_ref, lm.group(1), operand=None, row=row)
        for m in _IDENT_RE.finditer(line):
            idents.add(m.group(0))
        for m in _TYPEID_RE.finditer(line):
            dms.add(m.group(1))
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=sorted(idents))
    if dms:
        ex.mention(M_DM_WITHIN, src_ref, "", names=sorted(dms))
