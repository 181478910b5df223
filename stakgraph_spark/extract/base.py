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
