"""Angular extractor — hand-written line scanner (no tree-sitter in this
environment).

Mirrors the reference's Angular tree-sitter queries
(/root/reference/ast/src/lang/queries/angular.rs):

* Class      — class declarations (angular.rs:150-163)
* Page       — every .html/.css file (named by basename) and every
               @Component class (named by the class name); the component's
               selector + resolved templateUrl ride meta for the
               html->template Renders link
* Function   — top-level function declarations AND class method definitions
               INCLUDING `constructor` (angular.rs:165-189)
* DataModel  — interface / type-alias declarations (angular.rs:223-240)
* Var        — top-level const/let/var declarations
* Request    — EVERY member-chain call expression becomes a Request named by
               its callee text (`this.people.push`, `console.log`) with a
               Calls edge from the containing function (request_finder
               angular.rs:213-221 matches any call_expression)
* Renders    — html files referencing a component's <selector> render that
               component's template page (resolved in the link plane via
               ng_render / ng_component mentions)
* imports    — import statements section node + import map

Spec/test files are excluded by the language's skip rules
(lsp/src/language.rs angular skip list: *.spec.ts), so describe-test
collection is out of scope here.
"""

from __future__ import annotations

import re

from .base import (M_CALL, M_DM_WITHIN, M_IDENT, M_IMPORT, Extraction,
                   trim_quotes)
from .go_lang import mask_sources
from .java_lang import _paren_end

M_NG_RENDER = "ng_render"      # html page -> selector usage
M_NG_COMPONENT = "ng_component"  # component class -> (selector, template)

_IMPORT_RE = re.compile(
    r"^\s*import\s+(?:(?P<clause>[^'\"]+?)\s+from\s+)?['\"](?P<src>[^'\"]+)['\"]")
_CLASS_RE = re.compile(r"^\s*(?:export\s+)?(?:abstract\s+)?class\s+(?P<name>[A-Za-z_$][\w$]*)")
_FN_RE = re.compile(
    r"^\s*(?:export\s+)?(?:async\s+)?function\s+(?P<name>[A-Za-z_$][\w$]*)\s*\(")
_METHOD_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|readonly\s+|async\s+|override\s+)*"
    r"(?P<name>[A-Za-z_$][\w$]*)\s*\([^;]*$")
_IFACE_RE = re.compile(
    r"^\s*(?:export\s+)?(?:interface\s+(?P<iname>[A-Za-z_$][\w$]*)"
    r"|type\s+(?P<tname>[A-Za-z_$][\w$]*)\s*=)")
# value restricted to literal/object/array/new expressions
# (variables_query angular.rs:100-148)
_TOPVAR_RE = re.compile(
    r"^(?:export\s+)?(?:const|let|var)\s+(?P<name>[A-Za-z_$][\w$]*)"
    r"(?:\s*:\s*[^=]+?)?\s*=\s*(?P<val>\{|\[|['\"`]|\d|true\b|false\b|new\s)")
_MEMBER_CHAIN_RE = re.compile(
    r"(?<![\w$.])((?:this\.)?[A-Za-z_$][\w$]*(?:[.!?]+[A-Za-z_$][\w$]*)+)\s*\(")
_SELECTOR_RE = re.compile(r"selector\s*:\s*['\"]([^'\"]+)['\"]")
_TEMPLATE_RE = re.compile(r"templateUrl\s*:\s*['\"](?:\./)?([^'\"]+)['\"]")
_TAG_RE = re.compile(r"<([a-z][\w-]*)[\s>/]")

KEYWORDS = {"if", "else", "for", "while", "switch", "return", "catch",
            "constructor", "function", "super", "new", "typeof", "of", "in"}
METHOD_KEYWORDS = {"if", "else", "for", "while", "switch", "return", "catch",
                   "super", "function", "new"}


def _delta(line: str) -> int:
    return line.count("{") - line.count("}")


def _span_end(mlines, i, n):
    d = 0
    opened = False
    j = i
    while j < n:
        d += _delta(mlines[j])
        if "{" in mlines[j]:
            opened = True
        if opened and d <= 0:
            return j
        if not opened and mlines[j].rstrip().endswith(";"):
            return j
        j += 1
    return n - 1


def extract_angular(path: str, content: str) -> Extraction:
    ex = Extraction()
    base = path.rsplit("/", 1)[-1]
    if path.endswith((".html", ".css")):
        pg = ex.node("Page", base, path, 0, 0, content[:2000])
        if path.endswith(".html"):
            seen = set()
            for m in _TAG_RE.finditer(content):
                tag = m.group(1)
                if "-" in tag and tag not in seen:  # custom-element selectors
                    seen.add(tag)
                    ex.mention(M_NG_RENDER, pg.ref(), tag)
        return ex
    if not path.endswith((".ts", ".js")):
        return ex

    no_comments, code_only = mask_sources(content)
    lines = content.split("\n")
    mlines = code_only.split("\n")
    nclines = no_comments.split("\n")
    n = len(lines)

    def body(s, e):
        return "\n".join(lines[s:min(e, n - 1) + 1])

    # ---------- imports ----------
    import_rows = []
    for i in range(n):
        m = _IMPORT_RE.match(nclines[i])
        if not m:
            continue
        import_rows.append(i)
        clause = m.group("clause") or ""
        for nm in re.findall(r"[A-Za-z_$][\w$]*", clause):
            if nm not in ("as", "type", "default"):
                ex.mention(M_IMPORT,
                           ("File", base, path, 0, None), nm,
                           dst_file=m.group("src").lstrip("./"), row=i)
    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- classes (+ @Component pages) ----------
    classes: list[tuple] = []
    for i in range(n):
        m = _CLASS_RE.match(mlines[i])
        if not m:
            continue
        e = _span_end(mlines, i, n)
        classes.append((m.group("name"), i, e))
        ex.node("Class", m.group("name"), path, i, e, body(i, e))
        # decorator block above: @Component({selector, templateUrl})
        deco = " ".join(nclines[max(0, i - 20):i])
        dm = deco.rfind("@Component")
        if dm != -1:
            seg = deco[dm:]
            sel = _SELECTOR_RE.search(seg)
            tpl = _TEMPLATE_RE.search(seg)
            pg = ex.node("Page", m.group("name"), path, i, e, "",
                         meta={k: v for k, v in (
                             ("selector", sel.group(1) if sel else None),
                             ("template", tpl.group(1) if tpl else None))
                             if v})
            if sel and tpl:
                tdir = path.rsplit("/", 1)[0]
                ex.mention(M_NG_COMPONENT, pg.ref(), sel.group(1),
                           dst_file=f"{tdir}/{tpl.group(1)}")

    def enclosing_class(row):
        for name, s, e in classes:
            if s <= row <= e:
                return (name, s, e)
        return None

    # ---------- interfaces / type aliases -> DataModel ----------
    for i in range(n):
        m = _IFACE_RE.match(mlines[i])
        if m:
            e = _span_end(mlines, i, n)
            ex.node("DataModel", m.group("iname") or m.group("tname"),
                    path, i, e, body(i, e))

    # ---------- functions: top-level + methods (incl constructor) ----------
    funcs: list[tuple] = []
    i = 0
    while i < n:
        fm = _FN_RE.match(mlines[i])
        if fm:
            e = _span_end(mlines, i, n)
            funcs.append((fm.group("name"), i, e))
            i = e + 1
            continue
        enc = enclosing_class(i)
        if enc is not None and not any(fs < i <= fe for _, fs, fe in funcs):
            mm = _METHOD_RE.match(mlines[i])
            if mm and mm.group("name") not in METHOD_KEYWORDS \
                    and i > enc[1]:
                pe = _paren_end(mlines, i)
                j = pe
                while j < n and "{" not in mlines[j] \
                        and not mlines[j].rstrip().endswith(";"):
                    j += 1
                j = min(j, n - 1)
                if "{" in mlines[j]:
                    e = _span_end(mlines, j, n)
                    funcs.append((mm.group("name"), i, e))
                    i = pe + 1
                    continue
        i += 1

    # ---------- top-level vars ----------
    covered = [(s, e) for _, s, e in funcs] + [(s, e) for _, s, e in classes]
    for i in range(n):
        if any(s <= i <= e for s, e in covered):
            continue
        m = _TOPVAR_RE.match(mlines[i])
        if m:
            e = _span_end(mlines, i, n)
            ex.node("Var", m.group("name"), path, i, e, body(i, e))

    # ---------- function nodes + request/call scans ----------
    for name, s, e in funcs:
        ex.node("Function", name, path, s, e, body(s, e))
        src_ref = ("Function", name, path, s, None)
        idents: set[str] = set()
        for row in range(s + 1, min(e, n - 1) + 1):
            line = mlines[row]
            if any(fs == row for fn_, fs, fe in funcs):
                break  # next method begins
            # every member-chain call is a Request (request_finder matches
            # any call_expression; the callee text is the endpoint name)
            for m in _MEMBER_CHAIN_RE.finditer(line):
                chain = m.group(1).replace("?.", ".").replace("!.", ".")
                req = ex.node("Request", chain, path, row, row, lines[row])
                ex.edge("Calls", src_ref, req.ref())
            for m in re.finditer(r"(?<![\w$.])([A-Za-z_$][\w$]*)\s*\(", line):
                if m.group(1) not in KEYWORDS:
                    ex.mention(M_CALL, src_ref, m.group(1), operand=None,
                               row=row)
            for m in re.finditer(r"[A-Za-z_$][\w$]*", line):
                idents.add(m.group(0))
        if idents:
            ex.mention(M_IDENT, src_ref, "", names=sorted(idents))

    return ex
