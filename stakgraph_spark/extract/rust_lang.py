"""Rust extractor — recursive line/brace scanner (no tree-sitter here).

Mirrors /root/reference/ast/src/lang/queries/rust.rs:

* Var        — top-level const/static WITH a value (rust.rs:334-356)
* Trait      — trait items (rust.rs:357-367); trait method signatures become
               empty-body Functions (function_signature_item)
* Class      — struct + enum items (rust.rs:379-395); filtered later by the
               Class-without-methods clean pass (rust.rs clean_graph)
* DataModel  — struct + enum + type alias (rust.rs:680-720)
* Implements — `impl Trait for Type` with a PLAIN trait identifier only
               (generic traits aren't captured, rust.rs:396-407)
* Function   — fns at any depth incl. impl methods (operand = impl type,
               generics stripped, rust.rs:183-223) and macro_rules names;
               body INCLUDES preceding attributes (format.rs:903-906)
* tests      — #[test]/#[tokio::test]/#[bench]/... attribute in body
               (rust.rs:812-833), classified per rust.rs:835-897
* Endpoint   — axum .route(p, verb(handler|closure)), actix/rocket
               #[verb("/p")] attribute handlers (rust.rs:531-615); group
               prefixes (scope/nest/mount/configure) are emitted as mentions
               and applied in the link plane (rust.rs:934-1260)
* calls      — ident / single-level scoped / field calls (rust.rs:509-529);
               skip list per skips/rust.rs; receiver-type facts for the
               hybrid registry (rust_registry.rs) ride along as m_extra
"""

from __future__ import annotations

import re

from .base import M_CALL, M_DM_WITHIN, M_HANDLER, M_IDENT, M_IMPORT, Extraction
from .go_lang import M_OPERAND

M_STRUCT_FIELD = "struct_field"   # (type, field) -> field type
M_EP_PREFIX_HANDLER = "ep_prefix_handler"   # same-file handler -> prefix
M_EP_PREFIX_ROCKET = "ep_prefix_rocket"     # global (file contains 'rocket')
M_EP_PREFIX_IMPORT = "ep_prefix_import"     # via import: ident -> prefix

VEC = {"push", "pop", "len", "is_empty", "iter", "iter_mut", "map", "filter",
       "collect", "into_iter", "get", "first", "last", "contains", "sort",
       "reverse", "retain", "dedup", "clear", "extend"}
OPTION = {"unwrap", "expect", "map", "and_then", "or_else", "is_some",
          "is_none", "unwrap_or", "unwrap_or_else", "ok_or", "ok_or_else",
          "take", "filter", "flatten", "as_ref"}
RESULT = {"unwrap", "expect", "map", "and_then", "or_else", "is_ok", "is_err",
          "unwrap_or", "unwrap_or_else", "map_err", "ok", "err", "as_ref",
          "unwrap_or_default", "expect_err"}
STRINGM = {"len", "is_empty", "push_str", "to_string", "clone", "as_str",
           "into_bytes", "chars", "bytes", "split", "trim", "to_lowercase",
           "to_uppercase", "replace", "contains"}
ITER = {"map", "filter", "collect", "fold", "for_each", "any", "all", "find",
        "position", "count", "take", "skip", "chain", "zip", "enumerate",
        "flat_map", "flatten", "cloned", "copied", "sum"}
TRAITS = {"clone", "to_owned", "into", "from", "as_ref", "as_mut", "default",
          "to_string", "fmt", "drop"}
PATHM = {"parent", "file_name", "extension", "file_stem", "to_path_buf",
         "to_str", "display", "exists", "is_file", "is_dir", "is_absolute",
         "is_relative", "canonicalize", "read_dir", "join", "with_extension",
         "with_file_name", "starts_with", "ends_with", "strip_prefix",
         "components", "ancestors", "metadata", "symlink_metadata", "read_link"}
OSSTR = {"to_str", "to_string_lossy", "to_os_string", "len", "is_empty"}
CTORS = {"new", "default", "Ok", "Err", "Some", "None", "Custom",
         "with_capacity", "from", "into"}
WALKDIR = {"new", "min_depth", "max_depth", "follow_links", "max_open",
           "sort_by", "filter_entry", "into_iter", "path", "file_name"}
_ALL_SKIPS = VEC | OPTION | RESULT | STRINGM | ITER | TRAITS | PATHM | OSSTR | CTORS | WALKDIR

KEYWORDS = {"if", "else", "match", "while", "for", "loop", "fn", "return",
            "let", "mut", "pub", "impl", "trait", "struct", "enum", "mod",
            "use", "const", "static", "unsafe", "async", "await", "move",
            "where", "type", "as", "in", "ref", "dyn", "Box", "Vec", "String",
            "assert", "assert_eq", "assert_ne", "Some", "None", "Ok", "Err"}

_WRAPPERS = ("Arc", "Box", "Rc", "RefCell", "Mutex", "RwLock", "Cell",
             "Option", "Cow")

TEST_ATTRS = ("#[test", "#[tokio::test", "#[actix_rt::test", "#[actix_web::test",
              "#[rstest", "#[proptest", "#[quickcheck", "#[wasm_bindgen_test",
              "#[bench")


def should_skip_call(called: str, operand: str | None) -> bool:
    if operand is not None:
        if operand in ("std", "core") or operand.startswith(("std::", "core::")):
            return True
        if operand == "WalkDir" or operand.endswith("::WalkDir"):
            return True
        if operand in ("Path", "PathBuf", "DirEntry") or operand.endswith(
                ("::Path", "::PathBuf", "::DirEntry")):
            return True
    return called in _ALL_SKIPS


def classify_test(name: str, file: str, body: str) -> str:
    f = file.replace("\\", "/")
    fname = f.rsplit("/", 1)[-1].lower()
    nl = name.lower()
    if ("/tests/e2e/" in f or "/e2e/" in f or fname.startswith("e2e_")
            or "e2e.rs" in fname or nl.startswith("e2e_") or "_e2e_" in nl
            or "end_to_end" in nl):
        return "E2eTest"
    if ("/tests/integration/" in f or fname.startswith("integration_")
            or "integration.rs" in fname or nl.startswith("integration_")
            or "_integration_" in nl):
        return "IntegrationTest"
    if "/tests/" in f and "/src/" not in f:
        return "IntegrationTest"
    bl = body.lower()
    if any(m in bl for m in ("reqwest::", "hyper::client", "actix_web::test",
                             "rocket::local", ".get(", ".post(", "http://",
                             "https://")):
        return "IntegrationTest"
    return "UnitTest"


def anonymous_handler_name(method: str, path: str, row: int) -> str:
    clean = path.replace("/", "_").replace(":", "param_").lstrip("_")
    return f"{method.upper()}_{clean}_closure_L{row}"


def mask_rust(content: str) -> str:
    """Blank comments and string/char contents, keep line structure.
    Rust-aware about lifetimes ('a is not a char literal)."""
    n = len(content)
    out = list(content)
    i = 0
    mode = None
    while i < n:
        c = content[i]
        if mode is None:
            if c == "/" and i + 1 < n and content[i + 1] == "/":
                mode = "//"
                out[i] = " "
            elif c == "/" and i + 1 < n and content[i + 1] == "*":
                mode = "/*"
                out[i] = " "
                depth = 1
            elif c == '"':
                # raw strings r"..." / r#"..."# treated as plain (good enough)
                mode = '"'
            elif c == "'":
                # char literal only when 'x' or '\x' closes within 4 chars
                seg = content[i + 1:i + 5]
                if seg[:1] == "\\" and "'" in seg:
                    end = i + 1 + seg.index("'", 1) if "'" in seg[1:] else -1
                    j = content.find("'", i + 2)
                    if j != -1 and j <= i + 4:
                        for k in range(i + 1, j):
                            out[k] = " "
                        i = j
                elif len(seg) >= 2 and seg[1:2] == "'":
                    out[i + 1] = " "
                    i += 2
                # else: lifetime, leave alone
        elif mode == "//":
            if c == "\n":
                mode = None
            else:
                out[i] = " "
        elif mode == "/*":
            if c == "*" and i + 1 < n and content[i + 1] == "/":
                out[i] = " "
                i += 1
                out[i] = " "
                depth -= 1
                if depth == 0:
                    mode = None
            elif c == "/" and i + 1 < n and content[i + 1] == "*":
                depth += 1
                out[i] = " "
            elif c != "\n":
                out[i] = " "
        elif mode == '"':
            if c == "\\" and i + 1 < n:
                out[i] = " "
                i += 1
                if content[i] != "\n":
                    out[i] = " "
            elif c == '"':
                mode = None
            elif c != "\n":
                out[i] = " "
        i += 1
    return "".join(out)


_ATTR_RE = re.compile(r"^\s*#\s*\[")
_USE_RE = re.compile(r"^\s*(?:pub\s+)?use\s+(.+)$")
_STRUCT_RE = re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?struct\s+([A-Za-z_]\w*)")
_ENUM_RE = re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?enum\s+([A-Za-z_]\w*)")
_TYPE_RE = re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?type\s+([A-Za-z_]\w*)")
_TRAIT_RE = re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:unsafe\s+)?trait\s+([A-Za-z_]\w*)")
_IMPL_RE = re.compile(
    r"^\s*impl\s*(?:<[^>]*>)?\s*(?P<a>[A-Za-z_][\w:]*)(?P<ag><[^>]*>)?"
    r"(?:\s+for\s+(?P<b>[A-Za-z_][\w:]*)(?:<[^>]*>)?)?")
_FN_RE = re.compile(
    r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:default\s+)?(?:const\s+)?(?:async\s+)?"
    r"(?:unsafe\s+)?(?:extern\s+\S+\s+)?fn\s+([A-Za-z_]\w*)")
_MACRO_RE = re.compile(r"^\s*(?:#\[macro_export\]\s*)?macro_rules!\s*([A-Za-z_]\w*)")
_MOD_RE = re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?mod\s+([A-Za-z_]\w*)\s*\{")
_CONST_RE = re.compile(
    r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:const|static)\s+(?:mut\s+)?([A-Za-z_]\w*)\s*:")
_FIELD_RE = re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?([a-z_]\w*)\s*:\s*(.+?),?\s*$")

_SCOPED_CALL_RE = re.compile(r"(?<![\w:])([A-Za-z_]\w*)::([A-Za-z_]\w*)\s*\(")
_FIELD_CALL_RE = re.compile(
    r"(?<![\w:])((?:self|[a-z_]\w*))((?:\s*\.\s*[a-z_]\w*)*?)\s*\.\s*([a-z_]\w*)\s*\(")
_IDENT_CALL_RE = re.compile(r"(?<![\w:.!'])([A-Za-z_]\w*)\s*\(")
_MACRO_CALL_RE = re.compile(r"([A-Za-z_]\w*)!\s*[\(\[\{]")
_LET_RE = re.compile(
    r"\blet\s+(?:mut\s+)?([a-z_]\w*)\s*(?::\s*&?(?:mut\s+)?([A-Za-z_][\w:<>]*))?\s*=\s*"
    r"(?:([A-Z]\w*)\s*::)?")
_PARAM_RE = re.compile(r"([a-z_]\w*)\s*:\s*&?(?:mut\s+)?([A-Z]\w*)")
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
_TYPEID_RE = re.compile(r"\b([A-Z]\w*)\b")

_ROUTE_RE = re.compile(
    r"\.\s*route\s*\(\s*\"([^\"]+)\"\s*,\s*(get|post|put|delete|patch)\s*\(")
_ATTR_EP_RE = re.compile(
    r"#\s*\[\s*(get|post|put|delete)\s*\(\s*\"(/[^\"]*)\"")
_NEST_RE = re.compile(r"\.\s*nest\s*\(\s*\"([^\"]+)\"\s*,")
_MOUNT_RE = re.compile(
    r"\.\s*mount\s*\(\s*\"([^\"]+)\"\s*,\s*routes!\s*\[([^\]]*)\]")
_SCOPE_RE = re.compile(r"web::scope\s*\(\s*\"([^\"]+)\"\s*\)")
_SERVICE_RE = re.compile(r"\.\s*service\s*\(\s*([A-Za-z_]\w*)\s*[\),]")
_CONFIGURE_RE = re.compile(r"\.\s*configure\s*\(\s*([A-Za-z_]\w*)\s*\)")


def strip_type(t: str) -> str | None:
    """Arc<DataStore> -> DataStore; &mut Foo<T> -> Foo (transparent-wrapper
    stripping per rust_resolver's strip_rust_type)."""
    t = t.strip().lstrip("&").strip()
    t = re.sub(r"^(?:mut\s+|dyn\s+)", "", t)
    for _ in range(4):
        m = re.match(r"^(\w+)\s*<(.*)>$", t)
        if not m:
            break
        if m.group(1) in _WRAPPERS:
            t = m.group(2).strip()
        else:
            t = m.group(1)
            break
    m = re.match(r"^([A-Za-z_]\w*)", t)
    return m.group(1) if m else None


def _delta(line: str) -> int:
    return line.count("{") - line.count("}")


def _full_delta(line: str) -> int:
    return (line.count("{") - line.count("}")
            + line.count("(") - line.count(")"))


def extract_rust(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith(".rs"):
        return ex
    masked = mask_rust(content)
    lines = content.split("\n")
    mlines = masked.split("\n")
    n = len(lines)

    import_rows: list[int] = []
    funcs: list[dict] = []   # {name,start,end,body,operand,is_sig}

    def body_of(s, e):
        return "\n".join(lines[s:e + 1])

    def body_open(i: int, e: int) -> int:
        """Row of the item's first '{' (multi-line where-clauses push the
        body brace onto its own line)."""
        for j in range(i, e + 1):
            if "{" in mlines[j]:
                return j
        return i

    def item_end(i: int) -> int:
        """End row of an item starting at row i: balanced braces; a ';' at
        depth 0 before any '{' also ends it."""
        d = 0
        opened = False
        j = i
        while j < n:
            ml = mlines[j]
            for ch in ml:
                if ch == "{":
                    d += 1
                    opened = True
                elif ch == "}":
                    d -= 1
            if opened and d <= 0:
                return j
            if not opened and ";" in ml:
                return j
            j += 1
        return n - 1


    def scan(lo: int, hi: int, impl_type: str | None, in_trait: bool):
        i = lo
        attr_start: int | None = None
        while i <= hi:
            ml = mlines[i]
            st = ml.strip()
            if not st:
                attr_start = None if attr_start is None else attr_start
                i += 1
                continue
            if _ATTR_RE.match(ml):
                if attr_start is None:
                    attr_start = i
                # attributes can span lines (balanced brackets) — cheap skip
                i = _attr_end(i)
                i += 1
                continue

            m = _USE_RE.match(ml)
            if m and impl_type is None and not in_trait:
                e = item_end(i)
                import_rows.extend(range(i, e + 1))
                _emit_imports(ex, path, body_of(i, e))
                attr_start = None
                i = e + 1
                continue

            m = _MACRO_RE.match(ml)
            if m:
                e = item_end(i)
                funcs.append(dict(name=m.group(1), start=i, end=e,
                                  body=body_of(attr_start if attr_start is not None else i, e),
                                  operand=None, is_sig=False))
                attr_start = None
                i = e + 1
                continue

            m = _FN_RE.match(ml)
            if m:
                e = item_end(i)
                abody = body_of(attr_start if attr_start is not None else i, e)
                is_sig = "{" not in "\n".join(mlines[i:e + 1])
                funcs.append(dict(name=m.group(1), start=i, end=e, body=abody,
                                  operand=impl_type, is_sig=is_sig))
                # items nested in function bodies (structs in test fns,
                # nested fns) are captured too — tree-sitter queries match
                # at any depth
                if not is_sig and e > i:
                    scan(body_open(i, e) + 1, e - 1, impl_type, in_trait)
                attr_start = None
                i = e + 1
                continue

            m = _STRUCT_RE.match(ml) or _ENUM_RE.match(ml)
            if m:
                e = item_end(i)
                b = body_of(i, e)
                name = m.group(1)
                ex.node("Class", name, path, i, e, b)
                ex.node("DataModel", name, path, i, e, b)
                if _STRUCT_RE.match(ml):
                    for j in range(i, e + 1):
                        fm = _FIELD_RE.match(mlines[j])
                        if fm and j > i:
                            ftype = strip_type(fm.group(2))
                            if ftype:
                                ex.mention(M_STRUCT_FIELD,
                                           ("DataModel", name, path, i, None),
                                           fm.group(1), extra={"ftype": ftype})
                attr_start = None
                i = e + 1
                continue

            m = _TYPE_RE.match(ml)
            if m and st.startswith(("type", "pub type")):
                e = item_end(i)
                # bare `type Item;` in a trait is an associated_type node,
                # not a type_item — only aliases WITH a value are DataModels
                if "=" in "\n".join(mlines[i:e + 1]):
                    ex.node("DataModel", m.group(1), path, i, e, body_of(i, e))
                attr_start = None
                i = e + 1
                continue

            m = _TRAIT_RE.match(ml)
            if m:
                e = item_end(i)
                ex.node("Trait", m.group(1), path, i, e, body_of(i, e))
                scan(body_open(i, e) + 1, e - 1, None, True)
                attr_start = None
                i = e + 1
                continue

            m = _IMPL_RE.match(ml)
            if m and st.startswith("impl"):
                e = item_end(i)
                a, b = m.group("a"), m.group("b")
                if b:  # impl Trait for Type
                    cls = b.split("::")[-1]
                    # only plain (non-generic) trait identifiers are captured
                    if "::" not in a and not m.group("ag"):
                        ex.mention(M_IMPLEMENTS_K, ("Class", cls, path, i, None), a)
                else:
                    cls = a.split("::")[-1]
                scan(body_open(i, e) + 1, e - 1, cls, False)
                attr_start = None
                i = e + 1
                continue

            m = _MOD_RE.match(ml)
            if m:
                e = item_end(i)
                scan(body_open(i, e) + 1, e - 1, impl_type, in_trait)
                attr_start = None
                i = e + 1
                continue

            m = _CONST_RE.match(ml)
            if m and impl_type is None and not in_trait:
                e = item_end(i)
                if "=" in "\n".join(mlines[i:e + 1]):  # value required
                    ex.node("Var", m.group(1), path, i, e, body_of(i, e))
                attr_start = None
                i = e + 1
                continue

            attr_start = None
            i = item_end(i) + 1 if st.endswith("{") else i + 1

    def _attr_end(i: int) -> int:
        d = 0
        j = i
        while j < n:
            d += mlines[j].count("[") - mlines[j].count("]")
            if d <= 0:
                return j
            j += 1
        return i

    scan(0, n - 1, None, False)

    if import_rows:
        s, e = import_rows[0], import_rows[-1]
        ex.node("Import", "", path, s, e,
                "\n".join(lines[r] for r in range(s, e + 1)))

    # ------------- classify + emit functions/tests; scan bodies -----------
    for f in funcs:
        is_test = any(p in f["body"] for p in TEST_ATTRS)
        if is_test:
            ntype = classify_test(f["name"], path, f["body"])
            meta = {"test_kind": {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(ntype, "unit")}
            ex.node(ntype, f["name"], path, f["start"], f["end"], f["body"], meta=meta)
            src_ref = (ntype, f["name"], path, f["start"], None)
        else:
            meta = {}
            if f["operand"]:
                meta["operand"] = f["operand"]
                ex.mention(M_OPERAND, ("Function", f["name"], path, f["start"], None),
                           f["operand"])
            body = "" if f["is_sig"] else f["body"]
            ex.node("Function", f["name"], path, f["start"], f["end"],
                    body, meta=meta)
            src_ref = ("Function", f["name"], path, f["start"], None)
        if not f["is_sig"]:
            _scan_fn_body(ex, src_ref, path, mlines, lines, f)

    # NESTED_IN by row-range containment (parse/collect.rs:733-778)
    plain = [f for f in funcs
             if not any(p in f["body"] for p in TEST_ATTRS)]
    for child in plain:
        for parent in plain:
            if child is not parent and child["start"] > parent["start"] \
                    and child["end"] < parent["end"]:
                ex.edge("NestedIn",
                        ("Function", child["name"], path, child["start"], None),
                        ("Function", parent["name"], path, parent["start"], None))

    _scan_endpoints(ex, path, masked, lines, mlines)
    return ex


M_IMPLEMENTS_K = "implements"


def _emit_imports(ex: Extraction, path: str, text: str):
    """use PATH::NAME; -> (module = last path segment, name); use
    crate::SEG::{A,B} -> (SEG, each).  Mirrors the reference's partial
    imports_query coverage (rust.rs:277-333)."""
    t = re.sub(r"\s+", " ", text.replace("\n", " ")).strip().rstrip(";")
    t = re.sub(r"^(pub\s+)?use\s+", "", t)
    m = re.match(r"^([\w:]+)::\{([^}]*)\}$", t)
    file_ref = ("File", path, path, 0, None)
    if m:
        segs = m.group(1).split("::")
        if len(segs) == 2 and segs[0] == "crate":
            for name in m.group(2).split(","):
                name = name.strip()
                if name and name != "*" and " as " not in name:
                    ex.mention(M_IMPORT, file_ref, name, dst_file=segs[-1])
        return
    m = re.match(r"^([\w:]+)::(\w+)$", t)
    if m:
        module = m.group(1).split("::")[-1]
        if module not in ("crate", "self"):
            ex.mention(M_IMPORT, file_ref, m.group(2), dst_file=module)


def _scan_fn_body(ex: Extraction, src_ref, path, mlines, lines, f):
    s, e = f["start"], f["end"]
    seg = "\n".join(mlines[s:e + 1])
    impl_type = f["operand"]

    # local var types: params + let bindings (constructor or annotation)
    var_types: dict[str, str] = {}
    sig = mlines[s]
    pm = re.search(r"\(([^)]*)\)", sig)
    if pm:
        for vm in _PARAM_RE.finditer(pm.group(1)):
            var_types[vm.group(1)] = vm.group(2)
    for lm in _LET_RE.finditer(seg):
        var, ann, ctor = lm.group(1), lm.group(2), lm.group(3)
        t = None
        if ann:
            t = strip_type(ann)
        elif ctor:
            t = ctor
        if t:
            var_types[var] = t

    idents: set[str] = set()
    dm_names: set[str] = set()
    seen_spans: set[tuple[int, int]] = set()

    # field / method calls (self.x.m(), var.m(), expr.m())
    for m in _FIELD_CALL_RE.finditer(seg):
        base, chain, called = m.group(1), m.group(2), m.group(3)
        fields = [x.strip() for x in chain.replace(" ", "").split(".") if x]
        row = s + seg[:m.start()].count("\n")
        extra = {}
        if base == "self" and impl_type:
            if not fields:
                extra = {"rcv_type": impl_type}
            elif len(fields) == 1:
                extra = {"rcv_base": impl_type, "rcv_field": fields[0]}
        elif base in var_types:
            if not fields:
                extra = {"rcv_type": var_types[base]}
            elif len(fields) == 1:
                extra = {"rcv_base": var_types[base], "rcv_field": fields[0]}
        skipped = should_skip_call(called, None)
        if extra or not skipped:
            if skipped:
                extra["skip"] = "1"
            ex.mention(M_CALL, src_ref, called, operand=None, row=row,
                       extra=extra)
        seen_spans.add((m.end() - len(called) - 1, m.end()))

    # scoped calls Type::method()
    for m in _SCOPED_CALL_RE.finditer(seg):
        operand, called = m.group(1), m.group(2)
        row = s + seg[:m.start()].count("\n")
        extra = {}
        if operand[0].isupper():
            extra = {"rcv_type": operand}
        skipped = should_skip_call(called, operand)
        if extra or not skipped:
            if skipped:
                extra["skip"] = "1"
            ex.mention(M_CALL, src_ref, called, operand=operand, row=row,
                       extra=extra)

    # plain ident calls
    macro_names = {m.group(1) for m in _MACRO_CALL_RE.finditer(seg)}
    for m in _IDENT_CALL_RE.finditer(seg):
        called = m.group(1)
        if called in KEYWORDS or called in macro_names:
            continue
        # not part of a field/scoped call (those have . or :: before)
        pre = seg[max(0, m.start() - 2):m.start()]
        if pre.endswith(".") or pre.endswith("::"):
            continue
        if should_skip_call(called, None):
            continue
        row = s + seg[:m.start()].count("\n")
        ex.mention(M_CALL, src_ref, called, operand=None, row=row)

    # macro invocations of locally-defined macros count as calls too
    for m in _MACRO_CALL_RE.finditer(seg):
        name = m.group(1)
        if name not in ("println", "print", "eprintln", "format", "vec",
                        "write", "writeln", "panic", "assert", "assert_eq",
                        "assert_ne", "json", "matches", "todo", "unimplemented",
                        "include_str", "env", "routes"):
            row = s + seg[:m.start()].count("\n")
            ex.mention(M_CALL, src_ref, name, operand=None, row=row)

    for m in _IDENT_RE.finditer(seg):
        idents.add(m.group(0))
    for m in _TYPEID_RE.finditer(seg):
        dm_names.add(m.group(1))
    if idents:
        ex.mention(M_IDENT, src_ref, "", names=sorted(idents))
    if dm_names:
        ex.mention(M_DM_WITHIN, src_ref, "", names=sorted(dm_names))


def _row_of(masked: str, pos: int) -> int:
    return masked[:pos].count("\n")


def _emit_ep(ex: Extraction, path, name, verb, handler, row, end_row, body):
    meta = {"handler": handler}
    if verb:
        meta["verb"] = verb.upper()
    else:
        h = handler.lower()
        if h.startswith("get_"):
            meta["verb"] = "GET"
        elif h.startswith(("post_", "create_")):
            meta["verb"] = "POST"
        elif h.startswith(("put_", "update_")):
            meta["verb"] = "PUT"
        elif h.startswith(("delete_", "remove_")):
            meta["verb"] = "DELETE"
        else:
            meta["verb"] = "GET"
    ep = ex.node("Endpoint", name, path, row, end_row, body, meta=meta)
    ex.mention(M_HANDLER, ep.ref(), handler)


def _scan_endpoints(ex: Extraction, path, masked, lines, mlines):
    is_test_file = "/tests/" in path or "/benches/" in path
    if is_test_file:
        return
    # strings are blanked in `masked`; endpoint paths must come from original
    orig = "\n".join(lines)

    # axum .route("/p", verb(handler)) / verb(closure)
    for m in re.finditer(
            r'\.\s*route\s*\(\s*"([^"]+)"\s*,\s*(get|post|put|delete|patch)\s*\(\s*([^)]*)',
            orig):
        p, verb, arg = m.group(1), m.group(2), m.group(3)
        row = _row_of(orig, m.start())
        am = re.match(r"^([A-Za-z_]\w*)\s*$", arg.strip())
        if am:
            _emit_ep(ex, path, p, verb, am.group(1), row, row, lines[row])
        elif arg.strip().startswith(("|", "move")):
            crow = _row_of(orig, m.start(3))
            fname = anonymous_handler_name(verb, p, crow)
            ex.node("Function", fname, path, crow, crow, lines[crow])
            _emit_ep(ex, path, p, verb, fname, row, row, lines[row])

    # actix/rocket attribute endpoints: #[get("/p")] fn handler
    for m in _ATTR_EP_RE.finditer(orig):
        verb, p = m.group(1), m.group(2)
        row = _row_of(orig, m.start())
        fm = re.search(r"fn\s+([A-Za-z_]\w*)", orig[m.end():m.end() + 400])
        if fm:
            _emit_ep(ex, path, p, verb, fm.group(1), row, row, lines[row])

    # group prefixes --------------------------------------------------------
    file_ref = ("File", path, path, 0, None)
    # actix: web::scope("P") ... .service(IDENT) within the same statement
    for m in _SCOPE_RE.finditer(orig):
        prefix = m.group(1)
        tail = orig[m.end():]
        nxt = _SCOPE_RE.search(tail)
        segment = tail[:nxt.start()] if nxt else tail
        for sm in _SERVICE_RE.finditer(segment):
            ex.mention(M_EP_PREFIX_HANDLER, file_ref, sm.group(1),
                       extra={"prefix": prefix})
        cm = _CONFIGURE_RE.search(segment)
        if cm:
            ex.mention(M_EP_PREFIX_IMPORT, file_ref, cm.group(1),
                       extra={"prefix": prefix})

    # axum: .nest("P", router_fn()) or .nest("P", Router::new()...route(...))
    for m in _NEST_RE.finditer(orig):
        prefix = m.group(1)
        tail = orig[m.end():m.end() + 2000]
        rm = re.match(r"\s*([A-Za-z_]\w*)\s*\(\s*\)", tail)
        if rm and rm.group(1) != "Router":
            ex.mention(M_EP_PREFIX_IMPORT, file_ref, rm.group(1),
                       extra={"prefix": prefix})
        else:
            # inline Router::new(): prefix its .route handlers (same file)
            depth = 0
            end = len(tail)
            for i2, ch in enumerate(tail):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth < 0:
                        end = i2
                        break
            for hm in re.finditer(
                    r'\.\s*route\s*\(\s*"[^"]+"\s*,\s*(?:get|post|put|delete|patch)'
                    r"\s*\(\s*([A-Za-z_]\w*)\s*\)", tail[:end]):
                ex.mention(M_EP_PREFIX_HANDLER, file_ref, hm.group(1),
                           extra={"prefix": prefix})

    # rocket: .mount("P", routes![a, b]) — global match on files w/ 'rocket'
    for m in _MOUNT_RE.finditer(orig):
        prefix, handlers = m.group(1), m.group(2)
        if prefix == "/":
            continue
        for h in handlers.split(","):
            h = h.strip()
            if h:
                ex.mention(M_EP_PREFIX_ROCKET, file_ref, h,
                           extra={"prefix": prefix})
