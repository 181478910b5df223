"""Java extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's Java tree-sitter queries
(/root/reference/ast/src/lang/queries/java.rs) and the java hybrid registry
(/root/reference/ast/src/lang/registry/java_resolver.rs):

* Class      — class_declaration (+ extends parent, + implements traits);
               enums/records are NOT classes (java.rs:109-126)
* Trait      — interface_declaration (java.rs:79-87)
* DataModel  — @Entity classes, record declarations, final classes
               (java.rs:396-414)
* Function   — method + constructor declarations (java.rs:160-184); methods
               of a class carry meta.operand = enclosing class so the
               receiver registry can key method lookups (java_resolver
               find_method_in_class:214-262); interface methods carry NO
               operand — the resolver's direct Class lookup skips interfaces
* Var        — field + local variable declarations (java.rs:54-77)
* Instance   — typed declarations; kept only when the type names a Class
               (add_instances, btreemap_graph.rs:238-255 — pipeline filter)
* tests      — @Test methods; classified by path (/integration/, /e2e/)
               (java.rs:224-242,386-395)
* Endpoint   — Spring @GetMapping/@PostMapping/.../@RequestMapping method
               annotations + functional router .GET/.POST/... invocations
               with method-reference or lambda handlers (java.rs:243-309);
               lambda handlers become {VERB}_{path}_lambda_L{row} Functions
               with NestedIn edges
* registry   — local/param/field receiver types ride the call mentions as
               rcv_type / (rcv_base, rcv_field); field types also ship as
               struct_field mentions; `new X()` resolves like a method of X
               (resolve_constructor, java_resolver.rs:376-424)
* interface dispatch (java_resolver.rs:239-259) is the link-plane
  trait-implementor expansion in link/calls.py (java-only)
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_HANDLER, M_IDENT, M_IMPLEMENTS,
                   M_IMPORT, Extraction, trim_quotes)
from .go_lang import mask_sources

M_STRUCT_FIELD = "struct_field"

KEYWORDS = {"if", "for", "while", "switch", "return", "new", "throw", "try",
            "catch", "finally", "else", "do", "case", "break", "continue",
            "assert", "synchronized", "this", "super", "import", "package",
            "extends", "implements", "class", "interface", "enum", "record",
            "void", "int", "long", "double", "float", "boolean", "char",
            "byte", "short", "var", "instanceof"}
MODIFIERS = {"public", "private", "protected", "static", "final", "abstract",
             "transient", "volatile", "synchronized", "native", "default",
             "strictfp"}

_TYPE_DECL_RE = re.compile(
    r"^\s*(?:@\w+(?:\([^)]*\))?\s+)*(?:(?:public|private|protected|static|final|abstract|strictfp)\s+)*"
    r"(?P<kind>class|interface|enum|record)\s+(?P<name>[A-Za-z_]\w*)")
_METHOD_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|final|abstract|default|native|synchronized)\s+)*"
    r"(?:<[^<>]*(?:<[^<>]*>[^<>]*)*>\s+)?"
    r"(?P<ret>[A-Za-z_][\w.]*(?:\s*<[^={;]*?>)?(?:\[\])*)\s+"
    r"(?P<name>[A-Za-z_]\w*)\s*\(")
_CTOR_RE = re.compile(
    r"^\s*(?:(?:public|private|protected)\s+)*(?P<name>[A-Z]\w*)\s*\(")
_DECL_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|final|transient|volatile)\s+)*"
    r"(?P<type>[A-Za-z_][\w.]*(?:\s*<[^={;]*?>)?(?:\[\])*)\s+"
    r"(?P<name>[A-Za-z_]\w*)\s*(?P<tail>=|;)")
_IMPORT_RE = re.compile(r"^\s*import\s+(?:static\s+)?(?P<path>[\w.]+(?:\.\*)?)\s*;")
_MAPPING_RE = re.compile(
    r"^\s*@(?P<anno>GetMapping|PostMapping|PutMapping|DeleteMapping|PatchMapping|RequestMapping)\s*(?:\((?P<args>.*)\))?\s*$")
_TEST_ANNO_RE = re.compile(r"^\s*@Test\b")
_FUNCTIONAL_EP_RE = re.compile(r"\.\s*(GET|POST|PUT|DELETE|PATCH)\s*\(")
_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(")
_CHAIN_CALL_RE = re.compile(r"\)\s*\.\s*([A-Za-z_]\w*)\s*\(")
_NEW_RE = re.compile(r"\bnew\s+([A-Za-z_][\w.]*)\s*(?:<[^>(]*>)?\s*\(")
_STR_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')
_LEAD_CHAIN_RE = re.compile(r"^\s*\.\s*([A-Za-z_]\w*)\s*\(")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

_VERB_OF = {"GetMapping": "GET", "PostMapping": "POST", "PutMapping": "PUT",
            "DeleteMapping": "DELETE", "PatchMapping": "PATCH"}


def _brace_delta(line: str) -> int:
    return line.count("{") - line.count("}")


def _span_end(clines: list[str], row: int, extra_opens: int = 0) -> int:
    """end row of the block opened on `row` (brace-balanced)."""
    d = _brace_delta(clines[row]) + extra_opens
    j = row
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


def _base_type(t: str) -> str:
    """List<Person> -> List; java.util.Map -> Map; Person[] -> Person."""
    t = t.strip()
    if "<" in t:
        t = t[:t.index("<")]
    t = t.replace("[]", "").strip()
    return t.rsplit(".", 1)[-1]


def classify_test(file: str) -> str:
    f = file.replace("\\", "/").lower()
    if "/integration/" in f:
        return "IntegrationTest"
    if "/e2e/" in f:
        return "E2eTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, row: int) -> str:
    clean = (path.replace("/", "_").replace(":", "param_")
             .replace("-", "_").lstrip("_"))
    return f"{method.upper()}_{clean}_lambda_L{row}"


class _Type:
    __slots__ = ("kind", "name", "start", "end", "parent", "interfaces",
                 "annotations", "modifiers")

    def __init__(self, kind, name, start, end, parent, interfaces,
                 annotations, modifiers):
        self.kind = kind
        self.name = name
        self.start = start
        self.end = end
        self.parent = parent
        self.interfaces = interfaces
        self.annotations = annotations
        self.modifiers = modifiers


def _leading_annotations(nclines: list[str], row: int) -> list[str]:
    """annotation lines immediately above `row` (the modifiers block of the
    declaration — tree-sitter puts them inside the declaration node)."""
    out = []
    r = row - 1
    while r >= 0:
        s = nclines[r].strip()
        if s.startswith("@"):
            out.append(s)
            r -= 1
        elif s == "":
            break
        else:
            break
    return out


def extract_java(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith(".java"):
        return ex
    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    clines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)

    def body(s, e):
        return "\n".join(lines[s:e + 1])

    # ---------- pass 1: type declarations (any nesting level) ----------
    types: list[_Type] = []
    for i in range(n):
        m = _TYPE_DECL_RE.match(clines[i])
        if not m:
            continue
        rest = clines[i][m.end():]
        parent = None
        pm = re.search(r"\bextends\s+([A-Za-z_]\w*)", rest)
        if pm:
            parent = pm.group(1)
        interfaces = []
        im = re.search(r"\bimplements\s+([^{]+)", rest)
        if im:
            interfaces = [_base_type(x) for x in im.group(1).split(",")
                          if _base_type(x)]
        end = _span_end(clines, i) if "{" in rest or "{" in clines[i] \
            else _span_end(clines, _first_open(clines, i))
        mods = set(re.findall(r"\b(public|private|protected|static|final|abstract)\b",
                              clines[i][:m.start("kind")]))
        types.append(_Type(m.group("kind"), m.group("name"), i, end, parent,
                           interfaces, _leading_annotations(nclines, i), mods))

    def enclosing_type(row: int) -> _Type | None:
        best = None
        for t in types:
            if t.start <= row <= t.end:
                if best is None or t.start > best.start:
                    best = t
        return best

    # ---------- type nodes ----------
    for t in types:
        b = body(t.start, t.end)
        if t.kind == "class":
            meta = {}
            if t.parent:
                meta["parent"] = t.parent
            ex.node("Class", t.name, path, t.start, t.end, b, meta=meta)
            for itf in t.interfaces:
                ex.mention(M_IMPLEMENTS, ("Class", t.name, path, t.start, None),
                           itf)
            if any(a.startswith("@Entity") for a in t.annotations) \
                    or "final" in t.modifiers:
                ex.node("DataModel", t.name, path, t.start, t.end, b)
        elif t.kind == "interface":
            ex.node("Trait", t.name, path, t.start, t.end, b)
        elif t.kind == "record":
            ex.node("DataModel", t.name, path, t.start, t.end, b)
        # enum: no node (java.rs class query matches class_declaration only)

    # ---------- pass 2: imports ----------
    import_rows = []
    for i in range(n):
        s = clines[i].strip()
        if s.startswith("package ") or _IMPORT_RE.match(clines[i]):
            import_rows.append(i)
        m = _IMPORT_RE.match(clines[i])
        if m and not m.group("path").endswith(".*"):
            p = m.group("path")
            parts = p.split(".")
            name = parts[-1]
            module = "/".join(parts[:-1]) if len(parts) > 1 else p
            ex.mention(M_IMPORT, ("File", path.rsplit("/", 1)[-1], path, 0, None),
                       name, dst_file=module, row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- pass 3: methods / constructors / fields ----------
    methods: list[tuple] = []   # (name, start, end, enclosing _Type|None, is_iface)
    fields: dict[str, dict[str, str]] = {}   # class -> field -> base type
    decls: list[tuple] = []     # (name, type, row, kind 'field'|'local')

    method_spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        cl = clines[i]
        s = cl.strip()
        if not s or s.startswith("@") or _TYPE_DECL_RE.match(cl):
            i += 1
            continue
        t = enclosing_type(i)
        in_method = any(ms < i <= me for ms, me in method_spans)
        cm = _CTOR_RE.match(cl)
        mm = _METHOD_RE.match(cl)
        is_ctor = (cm is not None and t is not None and not in_method
                   and cm.group("name") == t.name)
        # primitive return types (void/int/...) are legal; statement-keyword
        # "return types" (return/new/throw/...) mean this is a statement
        BAD_RET = {"return", "new", "throw", "if", "while", "for", "switch",
                   "case", "else", "assert", "this", "super", "package"}
        is_method = (mm is not None and not in_method and t is not None
                     and mm.group("ret").split("<")[0].rsplit(".", 1)[-1]
                     not in BAD_RET
                     and mm.group("name") not in KEYWORDS)
        if is_method or is_ctor:
            name = cm.group("name") if is_ctor else mm.group("name")
            pe = _paren_end(clines, i)
            # find the opening brace or the terminating ';' after the params
            j = pe
            while j < n and "{" not in clines[j] and ";" not in clines[j]:
                j += 1
            j = min(j, n - 1)
            if "{" in clines[j]:
                end = _span_end(clines, j)
                has_body = True
            else:
                end = j
                has_body = False
            is_iface = t.kind == "interface"
            methods.append((name, i, end, t, is_iface, is_ctor))
            if has_body:
                method_spans.append((i, end))
            i += 1
            continue
        dm = _DECL_RE.match(cl)
        BAD_DECL = {"return", "new", "throw", "case", "else", "assert",
                    "this", "super", "import", "package", "if", "while",
                    "for", "switch", "instanceof", "extends", "implements"}
        if dm and dm.group("type").split("<")[0] not in BAD_DECL \
                and dm.group("name") not in KEYWORDS \
                and not s.startswith("return"):
            kind = "local" if in_method else "field"
            base = _base_type(dm.group("type"))
            decls.append((dm.group("name"), dm.group("type"), i, kind))
            if kind == "field" and t is not None and t.kind == "class":
                fields.setdefault(t.name, {})[dm.group("name")] = base
        i += 1

    # struct_field mentions (class field types) for the receiver registry
    for cls, fmap in fields.items():
        for fname, ftype in fmap.items():
            ex.mention(M_STRUCT_FIELD, ("Class", cls, path, 0, None), fname,
                       extra={"ftype": ftype})

    # ---------- Vars + Instance candidates ----------
    for name, vtype, row, kind in decls:
        ex.node("Var", name, path, row, row, lines[row])
        base = _base_type(vtype)
        if re.fullmatch(r"[A-Z]\w*", base):
            inst = ex.node("Instance", name, path, row, row, lines[row],
                           data_type=base)
            inst.meta["instance"] = base

    # ---------- endpoints from Spring mapping annotations ----------
    handled_ep_rows: set[int] = set()
    method_by_start = {ms: (name, ms, me, t, ii, ic)
                       for (name, ms, me, t, ii, ic) in methods}
    for i in range(n):
        m = _MAPPING_RE.match(nclines[i])
        if not m:
            continue
        t = enclosing_type(i)
        # class-level @RequestMapping is an endpoint group; java has no
        # match_endpoint_groups implementation, so no prefix rewrite
        nxt = _next_code_row(clines, i)
        if nxt is None:
            continue
        target = None
        r = nxt
        while r < n and (nclines[r].strip().startswith("@")
                         or not nclines[r].strip()):
            r += 1
        for (name, ms, me, mt, ii, ic) in methods:
            if ms == r:
                target = name
                break
        if target is None:
            continue
        args = m.group("args") or ""
        ep_path = None
        pm = re.search(r'(?:\b(?:path|value)\s*=\s*)?"((?:[^"\\]|\\.)*)"', args)
        if pm:
            ep_path = pm.group(1)
        anno = m.group("anno")
        if anno == "RequestMapping":
            vm = re.search(r"RequestMethod\.(GET|POST|PUT|DELETE|PATCH)", args)
            verb = vm.group(1) if vm else "ANY"
        else:
            verb = _VERB_OF[anno]
        if ep_path is None:
            continue
        meta = {"verb": verb, "handler": target}
        ep = ex.node("Endpoint", trim_quotes(ep_path), path, i, i, lines[i],
                     meta=meta)
        ex.mention(M_HANDLER, ep.ref(), target)
        handled_ep_rows.add(i)

    # ---------- function/test nodes + body scans ----------
    test_file = _is_test_file(path)
    for (name, ms, me, t, is_iface, is_ctor) in methods:
        fbody = body(ms, me)
        annos = _leading_annotations(nclines, ms)
        is_test = any(_TEST_ANNO_RE.match(a) for a in annos)
        meta = {}
        if t is not None and t.kind == "class" and not is_iface:
            meta["operand"] = t.name
        if is_test:
            ntype = classify_test(path)
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                ntype, "unit")
            node_meta = {"test_kind": kind}
            ex.node(ntype, name, path, ms, me, fbody, meta=node_meta)
            src_ref = (ntype, name, path, ms, None)
        else:
            ex.node("Function", name, path, ms, me, fbody, meta=meta)
            src_ref = ("Function", name, path, ms, None)
        _scan_method_body(ex, src_ref, path, lines, clines, nclines,
                          ms, me, t, fields, decls,
                          emit_endpoints=not test_file)

    # NestedIn for lambda-handler functions emitted inside method spans is
    # handled in _scan_method_body (direct edges)
    return ex


def _first_open(clines, i):
    j = i
    while j + 1 < len(clines) and "{" not in clines[j]:
        j += 1
    return j


def _next_code_row(clines, i):
    j = i + 1
    while j < len(clines):
        if clines[j].strip():
            return j
        j += 1
    return None


def _is_test_file(file: str) -> bool:
    f = file.replace("\\", "/").lower()
    return "/src/test/" in f or "/tests/" in f or f.endswith("test.java")


def _param_types(sig: str) -> dict[str, str]:
    """'(Person person, long cents)' -> {person: Person, cents: long}."""
    out = {}
    o = sig.find("(")
    c = sig.rfind(")")
    if o == -1 or c == -1:
        return out
    inner = sig[o + 1:c]
    depth = 0
    parts, buf = [], []
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    for p in parts:
        toks = p.replace("@", " @").split()
        toks = [x for x in toks if not x.startswith("@") and x != "final"]
        if len(toks) >= 2:
            out[toks[-1]] = _base_type(" ".join(toks[:-1]))
    return out


def _scan_method_body(ex, src_ref, path, lines, clines, nclines, s, e,
                      enclosing, fields, decls, emit_endpoints=True):
    n = len(clines)
    cls_name = enclosing.name if enclosing is not None else None
    cls_fields = fields.get(cls_name, {}) if cls_name else {}
    pe = _paren_end(clines, s)
    local_types = dict(_param_types(" ".join(clines[s:pe + 1])))
    for (name, vtype, row, kind) in decls:
        if kind == "local" and s <= row <= e:
            local_types[name] = _base_type(vtype)

    handled_rows: set[int] = set()

    # functional router endpoints .GET("/x", this::h | lambda)
    if emit_endpoints:
        for off in range(s, e + 1):
            line = nclines[off]
            m = _FUNCTIONAL_EP_RE.search(line)
            if not m:
                continue
            strs = _STR_RE.findall(line)
            if not strs:
                continue
            ep_path, verb = strs[0], m.group(1)
            after = line[m.end():]
            href = re.search(r"::\s*([A-Za-z_]\w*)", after)
            if href:
                handler = href.group(1)
            elif re.search(r"(\(\s*)?[A-Za-z_]\w*(\s*\))?\s*->", after):
                handler = anonymous_handler_name(verb, ep_path, off)
                le = _lambda_end(clines, off)
                ex.node("Function", handler, path, off, le,
                        "\n".join(lines[off:le + 1]))
                ex.edge("NestedIn", ("Function", handler, path, off, None),
                        src_ref)
            else:
                continue
            meta = {"verb": verb.upper(), "handler": handler}
            ep = ex.node("Endpoint", trim_quotes(ep_path), path, off, off,
                         lines[off], meta=meta)
            ex.mention(M_HANDLER, ep.ref(), handler)
            handled_rows.add(off)

    code = "\n".join(clines[s:e + 1])
    for off, line in enumerate(code.split("\n")):
        row = s + off
        if row == s:
            # skip the signature line itself (parameter lists look like calls)
            continue
        if row in handled_rows:
            continue
        # constructor calls: new X(...) — resolve like a method of X
        # (resolve_constructor, java_resolver.rs:376-424)
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
                operand = None  # this.m() == bare m(): same-file resolution
            elif len(parts) == 3 and parts[0] == "this" and cls_name:
                # this.field.m()
                extra = {"rcv_base": cls_name, "rcv_field": parts[1]}
                operand = parts[1]
            elif len(parts) == 2:
                base = parts[0]
                if base in local_types:
                    extra = {"rcv_type": local_types[base]}
                elif base in cls_fields and cls_name:
                    extra = {"rcv_base": cls_name, "rcv_field": base}
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row,
                       extra=extra or None)
        for m in _CHAIN_CALL_RE.finditer(line_wo_new):
            called = m.group(1)
            if called not in KEYWORDS:
                ex.mention(M_CALL, src_ref, called, operand=None, row=row)
        # multi-line fluent chains: a continuation line starting with .m(
        lm = _LEAD_CHAIN_RE.match(line_wo_new)
        if lm and lm.group(1) not in KEYWORDS:
            ex.mention(M_CALL, src_ref, lm.group(1), operand=None, row=row)

    idents = sorted({m.group(0) for m in _IDENT_RE.finditer(code)})
    dms = sorted({m.group(1) for m in _TYPEID_RE.finditer(code)})
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=idents)
    if dms:
        ex.mention(M_DM_WITHIN, src_ref, "", names=dms)


def _lambda_end(clines, row):
    """span of a lambda argument starting on `row`: to the balanced close of
    the invocation's parens (covers both expression and block lambdas)."""
    d = clines[row].count("(") - clines[row].count(")")
    j = row
    while j + 1 < len(clines) and d > 0:
        j += 1
        d += clines[j].count("(") - clines[j].count(")")
    return j
