"""Ruby / Rails extractor — hand-written indentation/`end` scanner (no
tree-sitter in this environment).

Mirrors the reference's Ruby queries + Rails route expansion
(/root/reference/ast/src/lang/queries/ruby.rs, rails_routes.rs):

* Class      — class X < Parent (meta.parent), incl. classes in modules and
               test files; per-method Operand mentions (find_function_parent)
* Function   — def / def self.x; methods named test_* in test files become
               test nodes instead (minitest)
* tests      — top-level RSpec.describe/describe/feature blocks, minitest
               `test "desc" do` blocks + def test_* methods, and
               Minitest::Test / ActionDispatch::IntegrationTest subclasses
               (node named by class + Calls edge to the class); classified by
               the reference's path/body-marker rules (ruby.rs:408-530)
* Var        — top-level assignments (program-level only, ruby.rs:67-77)
* DataModel  — db/schema.rb create_table strings (ruby.rs:227-257)
* Endpoint   — config/routes.rb DSL: root/get/post/put/delete with to:,
               resource/resources with only:, collection/member/do items,
               namespace/scope prefixes; paths via generate_endpoint_path
               (rails_routes.rs:160-315); handler target = action in
               {controller}_controller.rb; finder order is recorded as
               meta.finder_rank — first finder wins the (name,file,verb)
               dedup (add_endpoints, btreemap_graph.rs:352-372)
* calls      — receiver.method(args) with constant receivers (lowercase
               receivers are skipped, skips/ruby.rs:59-82); a capitalized
               receiver naming exactly one Class also emits a Calls edge to
               the Class (direct_class_calls, format.rs:1050-1058) via a
               class_new mention
* Library    — Gemfile gem lines (handled in libs.py)
"""

from __future__ import annotations

import re

from .base import M_CALL, M_HANDLER, M_IMPORT, Extraction, trim_quotes

M_OPERAND = "operand_cls"

TEST_FRAMEWORK_METHODS = (
    "to", "not_to", "to_not", "eq", "eql", "be", "be_a", "be_an", "be_nil",
    "be_truthy", "be_falsey", "be_true", "be_false", "be_empty", "be_blank",
    "be_present", "include", "match", "raise_error", "change", "respond_to")
ARRAY_METHODS = {"push", "pop", "shift", "unshift", "map", "select", "reject",
                 "each", "compact", "flatten", "uniq", "sort", "reverse",
                 "first", "last", "size", "length", "empty?", "include?", "join"}
STRING_METHODS = {"upcase", "downcase", "strip", "split", "gsub", "sub",
                  "length", "size", "empty?", "include?", "start_with?",
                  "end_with?", "chars", "bytes", "to_s"}
HASH_METHODS = {"keys", "values", "merge", "fetch", "dig", "each", "map",
                "select", "reject", "empty?", "size", "length"}
ENUM_METHODS = {"find", "inject", "reduce", "zip", "any?", "all?", "none?",
                "one?", "min", "max"}
DSL_WORDS = {"expect", "describe", "it", "context", "before", "after", "let",
             "subject"}

LIFECYCLE = {"setup", "teardown", "before", "after"}

RESTFUL = [("index", "GET"), ("show", "GET"), ("new", "GET"),
           ("create", "POST"), ("edit", "GET"), ("update", "PUT"),
           ("destroy", "DELETE")]


def should_skip(called: str, operand: str | None) -> bool:
    """skips/ruby.rs:59-82."""
    if operand and operand[0].islower():
        return True
    return (any(called.startswith(m) for m in TEST_FRAMEWORK_METHODS)
            or called in ARRAY_METHODS or called in STRING_METHODS
            or called in HASH_METHODS or called in ENUM_METHODS
            or called.startswith("have_") or called in DSL_WORDS)


def is_test_file(filename: str) -> bool:
    if "/spec/support/" in filename or "/test/support/" in filename:
        return False
    return (filename.endswith("_spec.rb") or filename.endswith("_test.rb")
            or "/spec/" in filename or "/test/" in filename)


def classify_test(name: str, file: str, body: str) -> str:
    """ruby.rs:408-530 classify_test, verbatim ordering."""
    f = file.replace("\\", "/").lower()
    b = body.lower()
    if ("/spec/e2e/" in f or "/test/e2e/" in f or "/spec/system/" in f
            or "/test/system/" in f or "/spec/features/" in f
            or "/test/features/" in f):
        return "E2eTest"
    if "type: :system" in b or "type: :feature" in b:
        return "E2eTest"
    if "type: :request" in b or "type: :integration" in b:
        return "IntegrationTest"
    if "type: :model" in b or "type: :service" in b:
        return "UnitTest"
    if "/spec/unit/" in f or "/test/unit/" in f:
        return "UnitTest"
    if any(x in f for x in ("/spec/integration/", "/test/integration/",
                            "/spec/requests/", "/test/requests/",
                            "/spec/controllers/", "/test/controllers/",
                            "/spec/api/", "/test/api/",
                            "/spec/mailers/", "/test/mailers/",
                            "/spec/jobs/", "/test/jobs/",
                            "/spec/channels/", "/test/channels/")):
        return "IntegrationTest"
    if any(x in f for x in ("/spec/models/", "/test/models/",
                            "/spec/services/", "/test/services/",
                            "/spec/lib/", "/test/lib/",
                            "/spec/helpers/", "/test/helpers/",
                            "/spec/serializers/", "/test/serializers/",
                            "/spec/policies/", "/test/policies/")):
        return "UnitTest"
    e2e_markers = ("visit(", "click_", "fill_in(", "have_content(", "page.",
                   "find(", "have_selector(", "attach_file(", "within(",
                   "choose(", "select(")
    if any(m in b for m in e2e_markers):
        return "E2eTest"
    integration_markers = ("get ", "post ", "put ", "patch ", "delete ",
                           "response.", "json_response", "assert_response",
                           "have_http_status")
    if any(m in b for m in integration_markers):
        return "IntegrationTest"
    lname = name.lower()
    if "e2e" in lname or "system" in lname:
        return "E2eTest"
    if "integration" in lname or "api" in lname:
        return "IntegrationTest"
    return "UnitTest"


def pluralize(word: str) -> str:
    if word.endswith("y") and not word.endswith(("ay", "ey", "oy", "uy")):
        return word[:-1] + "ies"
    if word.endswith(("s", "x", "z", "ch", "sh")):
        return word + "es"
    return word + "s"


def singularize(word: str) -> str:
    if word.endswith("ies"):
        return word[:-3] + "y"
    if word.endswith("es") and word[:-2].endswith(("x", "z", "ch", "sh", "ss")):
        return word[:-2]
    if word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def mask_ruby(content: str) -> str:
    """blank # comments and string contents (quotes kept), line-structure
    preserved."""
    out = list(content)
    mode = None
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if mode is None:
            if c == "#":
                j = i
                while j < n and content[j] != "\n":
                    out[j] = " "
                    j += 1
                i = j
                continue
            if c in ("'", '"'):
                mode = c
        elif c == "\\" and i + 1 < n:
            out[i] = " "
            i += 1
            out[i] = " "
        elif c == mode or c == "\n":
            mode = None
        else:
            out[i] = " "
        i += 1
    return "".join(out)


_CLASS_RE = re.compile(
    r"^(\s*)class\s+(?P<name>[A-Z][\w:]*)(?:\s*<\s*(?P<parent>[A-Z][\w:]*))?")
_MODULE_RE = re.compile(r"^(\s*)module\s+(?P<name>[A-Z][\w:]*)")
_DEF_RE = re.compile(r"^(\s*)def\s+(?:self\.)?(?P<name>[a-zA-Z_]\w*[?!=]?)")
_END_RE = re.compile(r"^(\s*)end\b")
_DESCRIBE_RE = re.compile(
    r"^(?:RSpec\.)?(?:describe|context|feature)\s+(?:(?P<str>['\"])(?P<sname>.*?)(?P=str)|(?P<const>[A-Z][\w:]*))")
_TEST_DSL_RE = re.compile(r"^(\s*)test\s+(['\"])(?P<name>.*?)\2\s+do\b")
_TOP_ASSIGN_RE = re.compile(r"^(?P<name>[A-Za-z_]\w*)\s*=[^=~]")
_BLOCK_OPEN_RE = re.compile(
    r"^\s*(?:if|unless|case|while|until|begin|for|module|class|def)\b|(?:\bdo\s*(?:\|[^|]*\|)?\s*$)")
_CALL_RE = re.compile(
    r"(?<![\w:.])(?P<recv>[A-Za-z_]\w*)\.(?P<meth>[a-z_]\w*[!?]?)\s*\(")
_REQUIRE_RE = re.compile(r"^\s*(require|require_relative|load|include|extend)\b")
_CREATE_TABLE_RE = re.compile(r'create_table\s+[\'"](?P<name>\w+)[\'"]')
_MINITEST_SUPER_RE = re.compile(
    r"^\s*class\s+(?P<name>[A-Z]\w*)\s*<\s*(?P<sup>Minitest::Test|ActionDispatch::IntegrationTest)\b")


class _Block:
    __slots__ = ("kind", "name", "indent", "start", "end", "extra")

    def __init__(self, kind, name, indent, start, extra=None):
        self.kind = kind
        self.name = name
        self.indent = indent
        self.start = start
        self.end = start
        self.extra = extra


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip())


_OPEN_DO_RE = re.compile(r"\bdo\s*(\|[^|]*\|)?\s*$")
_OPEN_KW_RE = re.compile(
    r"^\s*(def|class|module|if|unless|case|while|until|for|begin)\b")


def _line_delta(masked_line: str) -> tuple[int, int]:
    """(block opens, block closes) contributed by one masked line.

    At most ONE open per line: `while x do` / `for i in xs do` hit both the
    keyword and the trailing-do pattern but open a single block (a double
    count prematurely nested every later frame; a `for` loop closed by `end`
    without a counted open truncated def/class spans)."""
    s = masked_line.rstrip()
    opens = 1 if (_OPEN_KW_RE.match(s) or _OPEN_DO_RE.search(s)) else 0
    closes = 1 if _END_RE.match(s) else 0
    return opens, closes


def _block_end(mlines: list[str], start: int, indent: int) -> int:
    """row of the `end` at the opener's indentation."""
    depth = 0
    for j in range(start + 1, len(mlines)):
        s = mlines[j]
        if not s.strip():
            continue
        em = _END_RE.match(s)
        if em and _indent(s) == indent and depth == 0:
            return j
        if em and _indent(s) <= indent:
            return j
    return len(mlines) - 1


def extract_ruby(path: str, content: str) -> Extraction:
    ex = Extraction()
    if not path.endswith(".rb"):
        return ex
    masked = mask_ruby(content)
    lines = content.split("\n")
    mlines = masked.split("\n")
    n = len(lines)
    testfile = is_test_file(path)

    def body(s, e):
        return "\n".join(lines[s:min(e, n - 1) + 1])

    # ---------- imports ----------
    req_rows = [i for i in range(n) if _REQUIRE_RE.match(mlines[i])]
    if req_rows:
        s, e = req_rows[0], req_rows[-1]
        ex.node("Import", "", path, s, e, body(s, e))

    # ---------- structure scan (do/end DEPTH counting, like tree-sitter:
    # fixture specs contain deliberately unbalanced blocks that re-open the
    # top level mid-file — indentation matching would miss the promoted
    # describe blocks) ----------
    classes: list[_Block] = []
    methods: list[_Block] = []       # extra = enclosing class name | None
    test_blocks: list[_Block] = []   # kind 'describe'|'testdsl'
    top_rows: list[int] = []         # rows at depth 0 (Var detection)

    open_frames: list[_Block] = []   # frames keyed by pre-open depth (indent)
    class_stack: list[_Block] = []
    depth = 0
    for i in range(n):
        ml = mlines[i]
        s = ml.strip()
        opens, closes = _line_delta(ml)
        if closes:
            depth -= closes
            while open_frames and open_frames[-1].indent >= depth:
                fr = open_frames.pop()
                fr.end = i
                if class_stack and class_stack[-1] is fr:
                    class_stack.pop()
        if depth == 0 and not opens and not closes and s:
            top_rows.append(i)
        if opens:
            frame = None
            cm = _CLASS_RE.match(ml)
            dm_ = _DEF_RE.match(ml)
            dsc = _DESCRIBE_RE.match(lines[i].strip()) if (
                testfile and depth == 0) else None
            tdsl = _TEST_DSL_RE.match(lines[i]) if testfile else None
            if cm:
                frame = _Block("class", cm.group("name").split("::")[-1],
                               depth, i, extra=cm.group("parent"))
                classes.append(frame)
                class_stack.append(frame)
            elif dm_:
                frame = _Block(
                    "def", dm_.group("name"), depth, i,
                    extra=class_stack[-1].name if class_stack else None)
                methods.append(frame)
            elif dsc:
                name = dsc.group("sname") if dsc.group("str") \
                    else dsc.group("const")
                frame = _Block("describe", name, depth, i)
                test_blocks.append(frame)
            elif tdsl:
                frame = _Block("testdsl", tdsl.group("name"), depth, i)
                test_blocks.append(frame)
            else:
                frame = _Block("other", "", depth, i)
            frame.end = n - 1
            open_frames.append(frame)
            depth += opens

    # ---------- class nodes + minitest class-based test nodes ----------
    inc_re = re.compile(r"^\s*include\s+([A-Z][\w:]*)\s*$")
    for c in classes:
        meta = {}
        if c.extra:
            meta["parent"] = c.extra.split("::")[-1]
        # `include Module` lines -> meta.includes (class_includes ->
        # IMPORTS edges, btreemap_graph.rs:603-624)
        incs = []
        for r in range(c.start + 1, min(c.end, n - 1) + 1):
            im2 = inc_re.match(mlines[r])
            if im2:
                incs.append(im2.group(1).split("::")[-1])
        if incs:
            meta["includes"] = ",".join(incs)
        ex.node("Class", c.name, path, c.start, c.end, body(c.start, c.end),
                meta=meta)
        mm = _MINITEST_SUPER_RE.match(mlines[c.start])
        f_norm = path.replace("\\", "/")
        in_integration = ("/integration/" in f_norm or ".int." in f_norm
                          or ".integration." in f_norm or "integration" in f_norm)
        if mm and testfile and in_integration:
            ntype = classify_test(c.name, path, body(c.start, c.end))
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                ntype, "unit")
            t = ex.node(ntype, c.name, path, c.start, c.end,
                        body(c.start, c.end), meta={"test_kind": kind})
            # integration_test_edge_finder: test node -> its class
            ex.edge("Calls", t.ref(), ("Class", c.name, path, c.start, None))
            _scan_calls(ex, t.ref(), lines, mlines, c.start, c.end)

    # ---------- top-level vars (program-level assignments) ----------
    for i2 in top_rows:
        am = _TOP_ASSIGN_RE.match(mlines[i2])
        if am and not _BLOCK_OPEN_RE.match(mlines[i2]):
            ex.node("Var", am.group("name"), path, i2, i2, lines[i2])

    # ---------- data models (db/schema.rb only) ----------
    if path.endswith("db/schema.rb"):
        for i2 in range(n):
            m = _CREATE_TABLE_RE.search(lines[i2])
            if m:
                e2 = _block_end(mlines, i2, _indent(mlines[i2]))
                ex.node("DataModel", m.group("name"), path, i2, e2,
                        body(i2, e2))

    # ---------- functions / minitest methods ----------
    for f in methods:
        fbody = body(f.start, f.end)
        if (testfile and f.name.startswith("test_")
                and f.name not in LIFECYCLE):
            ntype = classify_test(f.name, path, fbody)
            kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
                ntype, "unit")
            node = ex.node(ntype, f.name, path, f.start, f.end, fbody,
                           meta={"test_kind": kind})
            ex.mention("test_class", node.ref(), f.name, row=f.start)
        else:
            meta = {}
            if f.extra:
                meta["operand"] = f.extra
            node = ex.node("Function", f.name, path, f.start, f.end, fbody,
                           meta=meta)
            if f.extra:
                ex.mention(M_OPERAND, node.ref(), f.extra)
        _scan_calls(ex, node.ref(), lines, mlines, f.start, f.end)

    # ---------- RSpec / feature test nodes ----------
    for t in test_blocks:
        if t.kind == "describe":
            ntype = classify_test(t.name, path, body(t.start, t.end))
        else:
            ntype = classify_test(t.name, path, body(t.start, t.end))
        kind = {"E2eTest": "e2e", "IntegrationTest": "integration"}.get(
            ntype, "unit")
        node = ex.node(ntype, t.name, path, t.start, t.end,
                       body(t.start, t.end), meta={"test_kind": kind})
        # a Class named like the test gets a Calls edge
        # (collect_tests, parse/collect.rs:237-244)
        ex.mention("test_class", node.ref(), t.name, row=t.start)
        if t.kind == "describe":
            # rows inside inner `def` methods are scanned by their own
            # Function nodes
            skip = set()
            for mb in methods:
                if mb.start >= t.start and mb.end <= t.end:
                    skip.update(range(mb.start, mb.end + 1))
            _scan_calls(ex, node.ref(), lines, mlines, t.start, t.end,
                        skip_rows=skip)
        else:
            _scan_calls(ex, node.ref(), lines, mlines, t.start, t.end)

    # ---------- rails routes ----------
    if path.endswith("routes.rb") and not testfile:
        _extract_routes(ex, path, lines, mlines)

    return ex


def _scan_calls(ex: Extraction, src_ref, lines, mlines, s, e,
                skip_rows=None):
    """receiver.method(args) mentions with the ruby skip list; capitalized
    receivers also emit a direct class-call mention."""
    seen_cls = set()
    for row in range(s, min(e, len(mlines) - 1) + 1):
        if skip_rows and row in skip_rows:
            continue
        for m in _CALL_RE.finditer(mlines[row]):
            recv, meth = m.group("recv"), m.group("meth")
            if should_skip(meth, recv):
                continue
            ex.mention(M_CALL, src_ref, meth, operand=recv, row=row)
            if recv[0].isupper() and recv not in seen_cls:
                seen_cls.add(recv)
                ex.mention(M_CALL, src_ref, recv, row=row,
                           extra={"class_new": "1"})


# ---------------------------------------------------------------------------
# rails routes DSL (rails_routes.rs)
# ---------------------------------------------------------------------------

_NS_RE = re.compile(r"^\s*namespace\s+:(\w+)\s+do\b")
_SCOPE_RE = re.compile(r"^\s*scope\s+['\"]([^'\"]+)['\"]\s+do\b")
_RESOURCES_RE = re.compile(
    r"^\s*(?P<kind>resources|resource)\s+:(?P<name>\w+)"
    r"(?:\s*,\s*only:\s*(?P<only>\[[^\]]*\]|%i\[[^\]]*\]))?"
    r"\s*(?P<block>do\b)?")
_VERB_TO_RE = re.compile(
    r"^\s*(?P<verb>get|post|put|delete)\s+['\"](?P<path>[^'\"]+)['\"]\s*,\s*"
    r"to:\s*['\"](?P<handler>[^'\"]+)['\"]")
_VERB_SYM_RE = re.compile(
    r"^\s*(?P<verb>get|post|put|delete)\s+[:'\"](?P<item>[\w/]+)['\"]?\s*$")
_ROOT_RE = re.compile(r"^\s*root\s+to:\s*['\"](?P<handler>[^'\"]+)['\"]")
_COLLECTION_RE = re.compile(r"^\s*(collection|member)\s+do\b")

# finder order = dedup priority (add_endpooints first-wins over the
# [root, verb, resource, resources, collection, member, do] finder sequence)
RANK = {"root": 0, "verb": 1, "resource": 2, "resources": 3,
        "collection": 4, "member": 5, "do": 6}


def _emit_ep(ex, path, row, line, ep_path, verb, handler, ctrl, rank):
    meta = {"handler": handler, "finder_rank": str(rank), "ctrl": ctrl}
    if verb:
        meta["verb"] = verb
    ep = ex.node("Endpoint", ep_path, path, row, row, line, meta=meta)
    ex.mention(M_HANDLER, ep.ref(), handler, extra={"ctrl": ctrl}, row=row)


def _extract_routes(ex: Extraction, path: str, lines, mlines):
    n = len(lines)
    # parent stack entries: (type 'ns'|'res', name, end_row)
    stack: list[tuple[str, str, int]] = []
    in_collection: str | None = None
    collection_end = -1

    for i in range(n):
        ml = mlines[i]
        raw = lines[i]
        while stack and i > stack[-1][2]:
            stack.pop()
        if in_collection and i > collection_end:
            in_collection = None

        m = _NS_RE.match(raw)
        if m:
            stack.append(("ns", m.group(1), _block_end(mlines, i, _indent(ml))))
            continue
        m = _SCOPE_RE.match(raw)
        if m:
            stack.append(("ns", m.group(1).lstrip("/"),
                          _block_end(mlines, i, _indent(ml))))
            continue
        m = _COLLECTION_RE.match(raw)
        if m:
            in_collection = m.group(1)
            collection_end = _block_end(mlines, i, _indent(ml))
            continue
        m = _ROOT_RE.match(raw)
        if m:
            handler = m.group("handler")
            ctrl, action = handler.split("#", 1)
            ns = [nm for (t, nm, _) in stack if t == "ns"]
            verb = "GET" if ctrl == "home" and not ns else None
            _emit_ep(ex, path, i, raw.strip(), "/", verb, action,
                     f"{ctrl.rsplit('/', 1)[-1]}_controller.rb", RANK["root"])
            continue
        m = _VERB_TO_RE.match(raw)
        if m:
            handler = m.group("handler")
            ctrl, action = handler.split("#", 1)
            ns = [nm for (t, nm, _) in stack if t == "ns"]
            ep_path = "/" + "/".join(ns + [m.group("path").lstrip("/")])
            _emit_ep(ex, path, i, raw.strip(), ep_path,
                     m.group("verb").upper(), action,
                     f"{ctrl.rsplit('/', 1)[-1]}_controller.rb", RANK["verb"])
            continue
        m = _RESOURCES_RE.match(raw)
        if m:
            name = m.group("name")
            singular = m.group("kind") == "resource"
            ctrl_name = pluralize(name) if singular else name
            ctrl = f"{ctrl_name}_controller.rb"
            only = None
            if m.group("only"):
                only = re.findall(r"[:\s\[]([a-z_]+)", m.group("only"))
            parents = list(stack)
            block_end = (_block_end(mlines, i, _indent(ml))
                         if m.group("block") else i)
            if m.group("block"):
                stack.append(("res", name, block_end))
            # RESTful expansion (handler target existence decides survival in
            # the link plane)
            for action, verb in RESTFUL:
                if only is not None and action not in only:
                    continue
                parts = []
                for (t, nm, _) in parents:
                    if t == "ns":
                        parts.append(nm)
                    else:
                        parts.append(nm)
                        parts.append(f":{singularize(nm)}_id")
                parts.append(name)
                if action == "new":
                    parts.append("new")
                elif action in ("show", "update", "destroy") and not singular:
                    parts.append(":id")
                elif action == "edit":
                    if not singular:
                        parts.append(":id")
                    parts.append("edit")
                rank = RANK["resource"] if singular else RANK["resources"]
                _emit_ep(ex, path, i, raw.strip(), "/" + "/".join(parts),
                         verb, action, ctrl, rank)
            continue
        m = _VERB_SYM_RE.match(raw)
        if m and stack and stack[-1][0] == "res":
            res = stack[-1][1]
            item = m.group("item")
            verb = m.group("verb").upper()
            ctrl = f"{res}_controller.rb"
            outer = [p for p in stack[:-1]]
            parts = []
            for (t, nm, _) in outer:
                if t == "ns":
                    parts.append(nm)
                else:
                    parts.append(nm)
                    parts.append(f":{singularize(nm)}_id")
            if in_collection == "collection":
                parts += [res, item]
                rank = RANK["collection"]
            elif in_collection == "member":
                parts += [res, ":id", item]
                rank = RANK["member"]
            else:
                parts += [res, f":{singularize(res)}_id", item]
                rank = RANK["do"]
            _emit_ep(ex, path, i, raw.strip(), "/" + "/".join(parts), verb,
                     item.rsplit("/", 1)[-1], ctrl, rank)
            continue
