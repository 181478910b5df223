"""Extraction-plane primitives.

Each language extractor is a *pure* function ``content -> Extraction`` —
no cross-file state, no graph lookups (the reference interleaves extraction
with graph queries; we split those into this plane plus the join plane, per
SURVEY.md §7).  Extractors run inside `mapInPandas` so a single Arrow batch
carries many files; per-language parser state is module-level (built once per
executor).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# mention kinds routed to the linking plane
M_CALL = "call"              # call site: called name + optional operand
M_IMPORT = "import"          # from <module> import <name>  (import map entry)
M_IMPLEMENTS = "implements"  # (class, trait-candidate-name)
M_HANDLER = "handler"        # endpoint -> handler name
M_IDENT = "ident_set"        # identifiers used inside a function (Var linking)
M_DM_WITHIN = "dm_set"       # capitalized names used in a function (DataModel linking)
M_IMPORT_EDGE = "import_edge"  # File -> imported symbol (IMPORTS edges)


@dataclass
class Node:
    node_type: str
    name: str
    file: str
    start: int
    end: int
    body: str = ""
    docs: str | None = None
    data_type: str | None = None
    meta: dict[str, str] = field(default_factory=dict)

    def ref(self) -> tuple[str, str, str, int, str | None]:
        return (self.node_type, self.name, self.file, self.start, self.meta.get("verb"))


@dataclass
class Edge:
    """Fully-resolved edge — both endpoints known at extraction time."""
    edge_type: str
    src: tuple  # (type, name, file, start, verb|None)
    dst: tuple
    operand: str | None = None


@dataclass
class Mention:
    """Unresolved reference — becomes a row in the linking plane's joins."""
    kind: str
    src: tuple            # (type, name, file, start, verb|None)
    target: str           # referenced name
    operand: str | None = None
    dst_file: str | None = None   # file hint (import resolved path, etc.)
    row: int | None = None        # source row of the reference
    extra: dict[str, str] = field(default_factory=dict)
    names: list[str] | None = None  # set-valued mentions (ident_set/dm_set)


@dataclass
class Extraction:
    nodes: list[Node] = field(default_factory=list)
    edges: list[Edge] = field(default_factory=list)
    mentions: list[Mention] = field(default_factory=list)

    def node(self, *args, **kwargs) -> Node:
        n = Node(*args, **kwargs)
        self.nodes.append(n)
        return n

    def edge(self, edge_type: str, src: tuple, dst: tuple, operand: str | None = None) -> None:
        self.edges.append(Edge(edge_type, src, dst, operand))

    def mention(self, *args, **kwargs) -> None:
        self.mentions.append(Mention(*args, **kwargs))


def trim_quotes(s: str) -> str:
    """Strip one layer of string quotes (reference ast/src/lang/parse/utils.rs)."""
    for q in ('"', "'", "`"):
        if s.startswith(q) and s.endswith(q) and len(s) >= 2:
            return s[1:-1]
    return s


# ---------------------------------------------------------------------------
# docs: comment attachment (reference ast/src/lang/mod.rs:85-197)
# ---------------------------------------------------------------------------

ALL_DOC_TYPES = frozenset(
    {"Function", "Class", "DataModel", "Trait", "Endpoint", "Var"})

# which node types have a per-language *_comment_query in the reference
DOC_TYPES: dict[str, frozenset] = {
    # queries/python.rs: comment/endpoint/var/trait only
    "python": frozenset({"Function", "Endpoint", "Var", "Trait"}),
    "go": ALL_DOC_TYPES,         # queries/go.rs:157-174
    "java": frozenset({"Function"}),  # queries/java.rs:185 (comment_query only)
    "ruby": frozenset({"Function", "Endpoint", "Var", "DataModel"}),  # ruby.rs:144-160
    "rust": ALL_DOC_TYPES,       # queries/rust.rs:368-505
    "typescript": ALL_DOC_TYPES,  # queries/react_ts.rs:475-489,1098
    "react": ALL_DOC_TYPES,
    "kotlin": frozenset({"Function"}),  # kotlin.rs:144-153 (comment_query only)
    "swift": frozenset({"Function"}),   # swift.rs:86-95 (comment_query only)
    "php": frozenset({"Function"}),     # php.rs:148-154 (comment_query only)
    "csharp": frozenset({"Function"}),  # csharp.rs:165-171
    "c": frozenset({"Function", "Class", "DataModel"}),  # c.rs:212-222
    "cpp": frozenset({"Function"}),     # cpp.rs comment_query
    "angular": frozenset({"Function"}),  # angular.rs:190-192
}

# (line-comment prefixes, has C-style block comments)
COMMENT_STYLE: dict[str, tuple[tuple[str, ...], bool]] = {
    "python": (("#",), False),
    "go": (("//",), True),
    "java": (("//",), True),
    "ruby": (("#",), False),
    "rust": (("//",), True),      # // /// //! are all '//'-prefixed
    "typescript": (("//",), True),
    "react": (("//",), True),
    "kotlin": (("//",), True),
    "swift": (("//",), True),
    "php": (("//", "#"), True),
    "csharp": (("//",), True),
    "c": (("//",), True),
    "cpp": (("//",), True),
    "angular": (("//",), True),
}


def collect_comments(code: str, prefixes: tuple[str, ...],
                     blocks: bool) -> list[tuple[int, int, str]]:
    """(start_row, end_row, text) per comment node, mirroring tree-sitter's
    one-capture-per-(comment) behavior: each line comment is its own entry;
    a /* */ block spans rows."""
    out: list[tuple[int, int, str]] = []
    lines = code.split("\n")
    i = 0
    while i < len(lines):
        s = lines[i].strip()
        if blocks and s.startswith("/*"):
            j = i
            while j < len(lines) and "*/" not in lines[j]:
                j += 1
            j = min(j, len(lines) - 1)
            out.append((i, j, "\n".join(lines[i:j + 1])))
            i = j + 1
            continue
        if any(s.startswith(p) for p in prefixes):
            out.append((i, i, s))
        i += 1
    return out


def _clean_comment(comment: str) -> str:
    """parse/format.rs:1463-1505 prefix stripping, line by line."""
    res = []
    for line in comment.split("\n"):
        t = line.strip()
        if t.startswith("///"):
            t = t[3:].strip()
        elif t.startswith("//"):
            t = t[2:].strip()
        elif t.startswith("#"):
            t = t[1:].strip()
        elif t.startswith("/*"):
            rest = t[2:].strip()
            if rest.startswith("*"):
                rest = rest[1:].strip()
            if rest.endswith("*/"):
                t = rest[:-2].strip()
            elif rest in ("*", ""):
                t = ""
            else:
                t = rest
        elif t.endswith("*/"):
            t = t[:-2].strip()
        elif t.startswith("*"):
            t = t[1:].strip()
        res.append(t)
    return "\n".join(res).strip()


def attach_docs(nodes: list[Node], comments: list[tuple[int, int, str]],
                eligible: frozenset) -> None:
    """Attach the contiguous comment block ending <=2 rows above each node's
    start as node.docs (mod.rs:130-182); '@ast ' annotation lines dropped."""
    if not comments:
        return
    cs = sorted(comments, key=lambda c: c[1])
    for node in nodes:
        if node.docs is not None or node.node_type not in eligible:
            continue
        start = node.start
        block: list[tuple[int, int, str]] = []
        for c in reversed(cs):
            if c[1] > start:
                continue
            if not block:
                if start - c[1] <= 2:
                    block.append(c)
                else:
                    break
            else:
                last = block[-1]
                if last[0] > 0 and max(last[0] - c[1], 0) <= 2:
                    block.append(c)
                else:
                    break
        if not block:
            continue
        block.sort(key=lambda c: c[0])
        cleaned = [x for x in (_clean_comment(c[2]) for c in block) if x]
        docs = "\n".join(
            ln for ln in "\n".join(cleaned).split("\n")
            if not ln.lstrip().startswith("@ast ")).strip()
        if docs:
            node.docs = docs
