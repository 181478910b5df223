"""DataFrame schemas for the pipeline planes.

Data model per SURVEY.md §1.4 / FIXTURES.md §3: the reference's NodeData
struct (ast/src/lang/asg.rs:66-82) becomes the `graph_nodes` table; its Edge
struct (ast/src/lang/graphs/mod.rs:70-78) becomes `graph_edges`, whose
(src_key, edge_type, dst_key) is the (subj, pred, obj) triple.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

STR = StringType()
LNG = LongType()
META = MapType(StringType(), StringType())

# Pipeline input (BASELINE.json input_hint): one row per file of a checkout.
SOURCE_SCHEMA = StructType([
    StructField("repo", STR, False),
    StructField("path", STR, False),
    StructField("commit", STR, True),
    StructField("lang", STR, False),
    StructField("content", STR, True),
])

# Unified extraction-plane output: one mapInPandas pass emits both node rows
# (rec='node') and unresolved reference rows (rec='edge' when both endpoints
# are known in-file, rec='mention' when the target needs cross-file
# resolution).  One wide nullable schema keeps it a single Arrow stream.
#
# BODY SLIMMING (the round-3 scale fix): node bodies that are an exact line
# span of the source file (the overwhelming majority) never leave Python —
# the row carries body=NULL + body_mode='span' (+body_off chars to skip for
# python's indent-trimmed segments) and the final materialization recomputes
# the text JVM-side from the source table.  Bodies the LINK plane consumes
# (Import / IntegrationTest / E2eTest / frontend Function) stay inline; the
# rare non-span remainder ships as a companion rec='fat' row consumed once
# at the end.  This cut ~90% of the Arrow/checkpoint bytes of the RAW stream.
RAW_SCHEMA = StructType([
    StructField("rec", STR, False),            # node | edge | mention | fat
    # -- node fields (rec='node')
    StructField("node_type", STR, True),
    StructField("name", STR, True),
    StructField("file", STR, True),
    StructField("start", LNG, True),
    StructField("end", LNG, True),
    StructField("body", STR, True),
    StructField("docs", STR, True),
    StructField("hash", STR, True),
    StructField("data_type", STR, True),
    StructField("meta", META, True),
    # -- edge / mention fields
    StructField("edge_type", STR, True),
    StructField("src_type", STR, True),
    StructField("src_name", STR, True),
    StructField("src_file", STR, True),
    StructField("src_start", LNG, True),
    StructField("src_verb", STR, True),
    StructField("dst_type", STR, True),
    StructField("dst_name", STR, True),
    StructField("dst_file", STR, True),        # known file (edge) or hint
    StructField("dst_start", LNG, True),
    StructField("dst_verb", STR, True),
    StructField("operand", STR, True),
    StructField("m_kind", STR, True),          # mention kind: call | import | ...
    StructField("m_extra", META, True),
    # set-valued mentions (ident_set / dm_set): one row per function with the
    # distinct identifiers — exploding 100M single-ident rows through the
    # shuffle was the scaling bottleneck; arrays defer the explode until
    # after intersection with the (small) symbol-name sets
    StructField("names", ArrayType(STR), True),
    # body slimming (see header comment): 'span' = recompute from source
    # lines [start, end] skipping body_off leading chars; 'fat' = body rides
    # in a companion rec='fat' row; NULL = inline body / no body
    StructField("body_mode", STR, True),
    StructField("body_off", LNG, True),
    # -- partition carry-through
    StructField("repo", STR, True),
    StructField("lang", STR, True),
])

NODES_SCHEMA = StructType([
    StructField("node_key", STR, False),
    StructField("node_type", STR, False),
    StructField("name", STR, False),
    StructField("file", STR, False),
    StructField("start", LNG, False),
    StructField("end", LNG, False),
    StructField("body", STR, True),
    StructField("docs", STR, True),
    StructField("hash", STR, True),
    StructField("data_type", STR, True),
    StructField("meta", META, True),
    StructField("repo", STR, False),
    StructField("lang", STR, False),
])

EDGES_SCHEMA = StructType([
    StructField("src_key", STR, False),
    StructField("dst_key", STR, False),
    StructField("edge_type", STR, False),
    StructField("operand", STR, True),
    StructField("confidence", DoubleType(), True),
    StructField("strategy", STR, True),
    StructField("repo", STR, False),
    StructField("lang", STR, False),
])

# EdgeType -> on-disk spelling (ast/src/lang/graphs/mod.rs:339-358)
EDGE_SPELLING = {
    "Calls": "CALLS",
    "Uses": "USES",
    "Operand": "OPERAND",
    "ArgOf": "ARG_OF",
    "Contains": "CONTAINS",
    "Imports": "IMPORTS",
    "Of": "OF",
    "Handler": "HANDLER",
    "Includes": "INCLUDES",
    "Renders": "RENDERS",
    "ParentOf": "PARENT_OF",
    "Implements": "IMPLEMENTS",
    "NestedIn": "NESTED_IN",
}

# Canonical NodeType names (annotation spellings, ast/src/lang/graphs/mod.rs:31-56).
# On-disk serialization differs for three ("Datamodel", "Feature", "E2etest",
# ast/src/lang/asg.rs:276-333) but node keys lowercase everything, so we keep
# the canonical spellings internally.
NODE_TYPES = [
    "Repository", "Package", "Language", "Directory", "File", "Import",
    "Library", "Class", "Trait", "Instance", "Function", "Endpoint",
    "Request", "DataModel", "Concept", "Page", "Var", "UnitTest",
    "IntegrationTest", "E2eTest", "Mock",
]
