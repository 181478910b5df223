"""Kotlin extractor — hand-written line/brace scanner (no tree-sitter in this
environment).

Mirrors the reference's Kotlin tree-sitter queries
(/root/reference/ast/src/lang/queries/kotlin.rs):

* Class      — class_declaration: `class` AND `interface` (both are
               class_declaration nodes in the kotlin grammar; kotlin.rs:83-98);
               `object` declarations are NOT classes
* ParentOf   — delegation_specifier with constructor_invocation
               (`: Base(args)`) -> meta.parent (kotlin.rs:88-93)
* DataModel  — class declarations in files whose path contains "models"
               (data_model_query + data_model_path_filter, kotlin.rs:260-270)
* Function   — function_declaration anywhere; methods directly inside a
               class/interface body carry meta.operand = enclosing type and an
               Operand edge (find_function_parent, kotlin.rs:155-176); funs
               inside `object`/companion blocks match only the unanchored
               pattern -> no operand (kotlin.rs:119-143)
* Var        — TOP-LEVEL property_declaration only (source_file anchor,
               kotlin.rs:66-81)
* tests      — @Test-annotated funs; /androidTest/ -> IntegrationTest,
               /test/ -> UnitTest (kotlin.rs:285-358)
* Request    — okhttp `Request.Builder().url(..).get()/.post(..)` chains and
               Retrofit `@GET("/path")` method annotations
               (request_finder kotlin.rs:178-241, add_endpoint_verb :243-258)
* imports    — package_header + import_list section node; import name = last
               dotted component, module path = components[..len-2] joined
               with '/' (resolve_import_name/path, kotlin.rs:360-379)
* receiver types — params / locals / constructor+class properties tracked so
               `x.m()` mentions carry rcv_type (the java resolver pattern,
               java_resolver.rs — kotlin shares java's skip list per
               kotlin.rs:21-23 and benefits from the same registry strategy)
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_IDENT, M_IMPORT, Extraction,
                   trim_quotes)
from .go_lang import mask_sources

_MODS = r"(?:(?:public|private|protected|internal|open|final|abstract|sealed|data|enum|annotation|inner|value|expect|actual|suspend|operator|inline|override|lateinit|const|external|tailrec|infix)\s+)*"
_ANNO = r"(?:@[\w.]+(?:\([^)]*\))?\s+)*"

_TYPE_RE = re.compile(
    rf"^\s*{_ANNO}{_MODS}(?P<kind>class|interface|object)\s+(?P<name>[A-Za-z_]\w*)")
_FUN_RE = re.compile(
    rf"^\s*{_ANNO}{_MODS}fun\s+(?:<[^>]*>\s+)?(?:[A-Za-z_][\w.]*\.)?(?P<name>[A-Za-z_]\w*)\s*\(")
_TOPVAL_RE = re.compile(
    rf"^{_ANNO}{_MODS}(?:val|var)\s+(?P<name>[A-Za-z_]\w*)")
_IMPORT_RE = re.compile(r"^\s*import\s+(?P<path>[\w.]+(?:\.\*)?)")
_PKG_RE = re.compile(r"^\s*package\s+[\w.]+")
_TEST_ANNO_RE = re.compile(r"^\s*@Test\b")
_RETRO_RE = re.compile(r'^\s*@(GET|POST|PUT|DELETE|PATCH)\s*\(\s*"((?:[^"\\]|\\.)*)"')
_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*(?:[.?][A-Za-z_]\w*)*)\s*\(")
_LAMBDA_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*(?:[.?][A-Za-z_]\w*)*)\s*\{")
_CHAIN_CALL_RE = re.compile(r"[)}]\s*[.?]+\s*([A-Za-z_]\w*)\s*[({]")
_LEAD_CHAIN_RE = re.compile(r"^\s*[.?]+\s*([A-Za-z_]\w*)\s*[({]")
_STR_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")
_PARAM_RE = re.compile(r"(?:va[lr]\s+)?([A-Za-z_]\w*)\s*:\s*([A-Za-z_][\w.<>?]*)")
_LOCAL_RE = re.compile(
    r"^\s*va[lr]\s+([A-Za-z_]\w*)\s*(?::\s*([A-Za-z_][\w.<>?]*)|\s*=\s*([A-Z]\w*)\s*\()")
_PARENT_RE = re.compile(r":\s*(?:[\w.]+\s*,\s*)*?([A-Za-z_]\w*)\s*\(")

KEYWORDS = {"if", "else", "when", "for", "while", "do", "try", "catch",
            "finally", "return", "throw", "fun", "val", "var", "class",
            "interface", "object", "init", "companion", "super", "this",
            "is", "in", "as", "by", "it", "true", "false", "null", "import",
            "package", "constructor", "where", "typealias"}

_VERBS = {"get": "GET", "post": "POST", "put": "PUT", "delete": "DELETE"}


def _brace_delta(line: str) -> int:
    return line.count("{") - line.count("}")


def _span_end(clines: list[str], row: int) -> int:
    """end row of the brace block whose first '{' is on/after `row`."""
    j = row
    while j < len(clines) and "{" not in clines[j]:
        # declaration without a body (data class / abstract fun): stop at the
        # end of the header (balanced parens, no brace)
        if clines[j].rstrip().endswith(")") or clines[j].rstrip().endswith(";") \
                or (j > row and not clines[j].strip()):
            if _paren_balanced(clines, row, j):
                # Allman style: the body's '{' may sit alone below the
                # header (`class Person(val name: String)` + next-line '{')
                # — peek past blank lines and fall through to brace
                # counting instead of truncating the span to the header
                k = j + 1
                while k < len(clines) and not clines[k].strip():
                    k += 1
                if k < len(clines) and clines[k].lstrip().startswith("{"):
                    j = k
                    break
                return j
        j += 1
    if j >= len(clines):
        return len(clines) - 1
    d = _brace_delta(clines[j])
    while j + 1 < len(clines) and d > 0:
        j += 1
        d += _brace_delta(clines[j])
    return j


def _paren_balanced(clines, s, e) -> bool:
    seg = "\n".join(clines[s:e + 1])
    return seg.count("(") <= seg.count(")")


def _paren_end(clines: list[str], row: int) -> int:
    d = clines[row].count("(") - clines[row].count(")")
    j = row
    while j + 1 < len(clines) and d > 0:
        j += 1
        d += clines[j].count("(") - clines[j].count(")")
    return j


def _base_type(t: str) -> str:
    t = t.strip().rstrip("?")
    if "<" in t:
        t = t[:t.index("<")]
    return t.rsplit(".", 1)[-1]


def _leading_annotations(nclines: list[str], row: int) -> list[str]:
    out = []
    r = row - 1
    while r >= 0:
        s = nclines[r].strip()
        if s.startswith("@"):
            out.append(s)
            r -= 1
        else:
            break
    return out


def classify_test(file: str) -> str:
    f = file.replace("\\", "/")
    if "/androidTest/" in f:
        return "IntegrationTest"
    return "UnitTest"


def is_test_file(path: str) -> bool:
    f = path.replace("\\", "/")
    return ("/test/" in f or "/androidTest/" in f or f.endswith("Test.kt")
            or f.endswith("Tests.kt") or f.endswith("_test.kt")
            or f.endswith(".test.kt"))


def extract_kotlin(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not (path.endswith(".kt") or path.endswith(".kts")):
        return ex
    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    clines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)

    def body(s, e):
        return "\n".join(lines[s:min(e, n - 1) + 1])

    # ---------- imports ----------
    import_rows = [i for i in range(n)
                   if _PKG_RE.match(clines[i]) or _IMPORT_RE.match(clines[i])]
    for i in range(n):
        m = _IMPORT_RE.match(clines[i])
        if not m or m.group("path").endswith(".*"):
            continue
        parts = m.group("path").split(".")
        name = parts[-1]
        module = "/".join(parts[:-2]) if len(parts) > 2 else m.group("path")
        ex.mention(M_IMPORT, ("File", path.rsplit("/", 1)[-1], path, 0, None),
                   name, dst_file=module, row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- type declarations (class / interface / object) ----------
    types: list[tuple] = []  # (kind, name, start, end, parent)
    for i in range(n):
        m = _TYPE_RE.match(clines[i])
        if not m:
            continue
        end = _span_end(clines, i)
        parent = None
        header_end = i
        while header_end < n and "{" not in clines[header_end]:
            header_end += 1
        header = " ".join(clines[i:min(header_end, n - 1) + 1])
        after_name = header[header.find(m.group("name")) + len(m.group("name")):]
        pm = _PARENT_RE.search(after_name)
        if pm and pm.group(1) != m.group("name"):
            parent = pm.group(1)
        types.append((m.group("kind"), m.group("name"), i, end, parent))

    def enclosing_type(row: int):
        best = None
        for t in types:
            if t[2] < row <= t[3]:
                if best is None or t[2] > best[2]:
                    best = t
        return best

    is_models_path = "models" in path
    for kind, name, s, e, parent in types:
        if kind == "object":
            continue
        meta = {}
        if parent:
            meta["parent"] = parent
        ex.node("Class", name, path, s, e, body(s, e), meta=meta)
        if is_models_path:
            ex.node("DataModel", name, path, s, e, body(s, e))

    # ---------- class fields (constructor properties + body val/var) ----------
    fields: dict[str, dict[str, str]] = {}
    for kind, cname, s, e, _ in types:
        fmap: dict[str, str] = {}
        he = _paren_end(clines, s)
        header = " ".join(clines[s:he + 1])
        o = header.find("(")
        if o != -1:
            for pm in _PARAM_RE.finditer(header[o:]):
                fmap[pm.group(1)] = _base_type(pm.group(2))
        fields.setdefault(cname, {}).update(fmap)

    # ---------- functions / tests ----------
    funcs: list[tuple] = []  # (name, start, end)
    for i in range(n):
        m = _FUN_RE.match(clines[i])
        if not m:
            continue
        pe = _paren_end(clines, i)
        j = pe
        end = pe
        # block body, expression body, or abstract declaration
        while j < n:
            seg = clines[j]
            if "{" in seg:
                end = _span_end(clines, j)
                break
            if "=" in seg[seg.find(")") + 1 if j == pe else 0:]:
                # expression body: single line unless the expression itself
                # continues (trailing operator) — greedy extension here would
                # swallow the NEXT declaration's block and mis-nest it
                if seg.rstrip().endswith(("=", "(", ",", "->", "&&", "||",
                                          "+", "?:")):
                    k = j + 1
                    while k < n and "{" not in clines[k] and clines[k].strip():
                        k += 1
                    end = _span_end(clines, k) if k < n and "{" in clines[k] \
                        else max(j, k - 1)
                else:
                    end = j
                break
            if j > pe and not seg.strip():
                end = pe
                break
            j += 1
        funcs.append((m.group("name"), i, min(end, n - 1)))

    # class body val/var (fields declared outside the constructor)
    for kind, cname, s, e, _ in types:
        fmap = fields.setdefault(cname, {})
        for r in range(s + 1, min(e, n - 1) + 1):
            if any(fs <= r <= fe for _, fs, fe in funcs):
                continue
            lm = _LOCAL_RE.match(clines[r])
            if lm:
                fmap[lm.group(1)] = _base_type(lm.group(2) or lm.group(3) or "")

    def enclosing_fun(row: int, self_start: int):
        best = None
        for name, fs, fe in funcs:
            if fs < row <= fe and fs != self_start:
                if best is None or fs > best[1]:
                    best = (name, fs, fe)
        return best

    testfile = is_test_file(path)
    for name, s, e in funcs:
        annos = _leading_annotations(nclines, s)
        same_line_anno = bool(_TEST_ANNO_RE.match(nclines[s]))
        is_test = same_line_anno or any(_TEST_ANNO_RE.match(a) for a in annos)
        enc = enclosing_type(s)
        parent_fun = enclosing_fun(s, s)
        meta: dict[str, str] = {}
        if enc is not None and enc[0] in ("class", "interface") \
                and parent_fun is None:
            meta["operand"] = enc[1]
        if is_test:
            ntype = classify_test(path)
            kind = "integration" if ntype == "IntegrationTest" else "unit"
            ex.node(ntype, name, path, s, e, body(s, e),
                    meta={"test_kind": kind})
            src_ref = (ntype, name, path, s, None)
        else:
            ex.node("Function", name, path, s, e, body(s, e), meta=meta)
            src_ref = ("Function", name, path, s, None)
            if meta.get("operand"):
                ex.edge("Operand", ("Class", enc[1], path, enc[2], None),
                        src_ref)
            if parent_fun is not None:
                ex.edge("NestedIn", src_ref,
                        ("Function", parent_fun[0], path, parent_fun[1], None))
        _scan_body(ex, src_ref, path, lines, clines, nclines, s, e,
                   enc, fields, funcs)

    # ---------- Retrofit annotation requests (@GET("/path") fun ...) ----------
    for i in range(n):
        m = _RETRO_RE.match(nclines[i])
        if not m:
            continue
        tgt = None
        for fname, fs, fe in funcs:
            if fs >= i and (tgt is None or fs < tgt[1]):
                tgt = (fname, fs)
        if tgt is None:
            continue
        req = ex.node("Request", m.group(2), path, i, i, lines[i],
                      meta={"verb": m.group(1)})
        ex.edge("Calls", ("Function", tgt[0], path, tgt[1], None), req.ref())

    # ---------- top-level Vars ----------
    depth = 0
    for i in range(n):
        if depth == 0 and not any(fs <= i <= fe for _, fs, fe in funcs) \
                and not any(ts <= i <= te for _, _, ts, te, _ in types):
            m = _TOPVAL_RE.match(clines[i])
            if m and not clines[i].lstrip().startswith("fun"):
                ex.node("Var", m.group("name"), path, i, i, lines[i])
        depth += _brace_delta(clines[i])

    return ex


def _scan_body(ex, src_ref, path, lines, clines, nclines, s, e,
               enc, fields, funcs):
    n = len(clines)
    pe = _paren_end(clines, s)
    sig = " ".join(clines[s:pe + 1])
    local_types: dict[str, str] = {}
    o = sig.find("(")
    if o != -1:
        for pm in _PARAM_RE.finditer(sig[o:]):
            local_types[pm.group(1)] = _base_type(pm.group(2))
    if enc is not None:
        local_types.update(fields.get(enc[1], {}))
    for r in range(pe + 1, min(e, n - 1) + 1):
        lm = _LOCAL_RE.match(clines[r])
        if lm:
            local_types[lm.group(1)] = _base_type(lm.group(2) or lm.group(3) or "")

    handled: set[int] = set()
    # okhttp Request.Builder chains (request_finder kotlin.rs:178-218)
    r = pe
    while r <= min(e, n - 1):
        if "Request.Builder" in clines[r]:
            url = verb = None
            k = r
            while k <= min(e, n - 1):
                seg = nclines[k]
                um = re.search(r'\.\s*url\s*\(\s*"((?:[^"\\]|\\.)*)"', seg)
                if um:
                    url = um.group(1)
                vm = re.search(r"\.\s*(get|post|put|delete)\s*\(", clines[k])
                if vm:
                    verb = _VERBS[vm.group(1)]
                if ".build(" in clines[k]:
                    break
                k += 1
            if url:
                req = ex.node("Request", url, path, r, min(k, n - 1),
                              "\n".join(lines[r:min(k, n - 1) + 1]),
                              meta={"verb": verb or "GET"})
                ex.edge("Calls", src_ref, req.ref())
                handled.update(range(r, k + 1))
            r = k + 1
        else:
            r += 1

    for row in range(pe + 1, min(e, n - 1) + 1):
        if row in handled:
            continue
        line = clines[row]
        if _TYPE_RE.match(line) or _FUN_RE.match(line):
            continue
        if any(fs < row <= fe and fs > s for _, fs, fe in funcs):
            continue  # nested fun bodies scan from their own node
        seen_here = set()
        for m in _CALL_RE.finditer(line):
            chain = re.split(r"[.?]+", m.group(1).replace("?.", "."))
            called = chain[-1]
            if called in KEYWORDS or chain[0] in KEYWORDS - {"this"}:
                continue
            operand = ".".join(chain[:-1]) or None
            extra = {}
            if operand == "this":
                operand = None
            elif operand and "." not in operand and operand in local_types:
                extra = {"rcv_type": local_types[operand]}
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row,
                       extra=extra or None)
            seen_here.add((called, operand))
        for m in _LAMBDA_CALL_RE.finditer(line):
            chain = re.split(r"[.?]+", m.group(1))
            called = chain[-1]
            if called in KEYWORDS or chain[0] in KEYWORDS - {"this"}:
                continue
            operand = ".".join(chain[:-1]) or None
            if operand == "this":
                operand = None
            if (called, operand) in seen_here:
                continue
            extra = {}
            if operand and "." not in operand and operand in local_types:
                extra = {"rcv_type": local_types[operand]}
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row,
                       extra=extra or None)
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
