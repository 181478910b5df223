"""Non-call linking joins: IMPLEMENTS, HANDLER, PARENT_OF, OF (instances),
Function-CONTAINS-Var, Function-CONTAINS-DataModel, File-IMPORTS-symbol.

Each mirrors a reference lookup loop as an equi-join + deterministic
first-pick (min_by over canonical node key = BTreeMap iteration order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..keys import node_key_col

KEY = ["repo", "lang"]


def _skey(node_type: str):
    return node_key_col(F.lit(node_type), F.col("name"), F.col("file"), F.col("start"))


def _nodes_of(nodes: DataFrame, t: str) -> DataFrame:
    return nodes.where(F.col("node_type") == t)


def _same_then_global(nodes: DataFrame, t: str, name_col: str,
                      out_prefix: str) -> tuple[DataFrame, DataFrame]:
    """Lookup tables for 'same-file first, then first-by-key global' node
    resolution (the classes_by_file / global fallback pattern of
    ast/src/builder/core.rs:521-582)."""
    c = (_nodes_of(nodes, t)
         .select(*KEY, "name", "file", "start", _skey(t).alias("skey")))
    same = (c.groupBy(*KEY, "name", "file")
            .agg(F.min_by("start", "skey").alias(f"{out_prefix}_s"))
            .selectExpr("repo", "lang", f"name as {name_col}",
                        "file as src_file", f"{out_prefix}_s"))
    glob = (c.groupBy(*KEY, "name")
            .agg(F.min_by(F.struct("file", "start"), "skey").alias(f"{out_prefix}_g"))
            .selectExpr("repo", "lang", f"name as {name_col}", f"{out_prefix}_g"))
    return same, glob


def resolve_implements(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """(class, trait-name) mentions -> Class -IMPLEMENTS-> Trait.

    BOTH endpoints resolve same-file-first-then-global — the mention's
    positional info is the impl site, not the definition
    (ast/src/builder/core.rs:521-582)."""
    c_same, c_glob = _same_then_global(nodes, "Class", "src_name", "c")
    t_same, t_glob = _same_then_global(nodes, "Trait", "dst_name", "t")
    m = (mentions
         .join(c_same, KEY + ["src_name", "src_file"], "left")
         .join(c_glob, KEY + ["src_name"], "left")
         .join(t_same, KEY + ["dst_name", "src_file"], "left")
         .join(t_glob, KEY + ["dst_name"], "left")
         .withColumn("c_file", F.when(F.col("c_s").isNotNull(), F.col("src_file"))
                                .otherwise(F.col("c_g.file")))
         .withColumn("c_start", F.coalesce(F.col("c_s"), F.col("c_g.start")))
         .withColumn("t_file", F.when(F.col("t_s").isNotNull(), F.col("src_file"))
                                .otherwise(F.col("t_g.file")))
         .withColumn("t_start", F.coalesce(F.col("t_s"), F.col("t_g.start")))
         .where(F.col("c_file").isNotNull() & F.col("t_file").isNotNull()))
    return m.select(
        *KEY,
        F.lit("Implements").alias("edge_type"),
        node_key_col(F.lit("Class"), F.col("src_name"), F.col("c_file"),
                     F.col("c_start")).alias("src_key"),
        node_key_col(F.lit("Trait"), F.col("dst_name"), F.col("t_file"),
                     F.col("t_start")).alias("dst_key"),
    )


def resolve_handlers(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """Endpoint handler mentions -> Endpoint -HANDLER-> Function.

    Python handler_finder semantics (python.rs:518-562): dotted handler =
    Django style (dir/module.py, dir/module/views.py, then any function of
    that name); plain handler = same-file exact lookup."""
    fns = (_nodes_of(nodes, "Function")
           .select(*KEY, "name", "file", "start", _skey("Function").alias("skey")))
    m = (mentions
         .withColumn("has_dot", F.col("dst_name").contains("."))
         .withColumn("fn_name", F.element_at(F.split("dst_name", "\\."), -1))
         .withColumn("module", F.element_at(F.split("dst_name", "\\."), 1))
         .withColumn("dir", F.regexp_replace("src_file", "/[^/]*$", "")))

    # plain: exact (name, file) lookup
    by_file = (fns.groupBy(*KEY, "name", "file")
               .agg(F.min_by("start", "skey").alias("f_start"))
               .selectExpr("repo", "lang", "name as fn_name",
                           "file as src_file", "f_start"))
    plain = (m.where(~F.col("has_dot"))
             .join(by_file, KEY + ["fn_name", "src_file"], "inner")
             .select("repo", "lang", "src_type", "src_name", "src_file",
                     "src_start", "src_verb", "fn_name",
                     F.col("src_file").alias("f_file"), "f_start"))

    # dotted: module path candidates then global fallback
    dotted = m.where(F.col("has_dot"))
    cand = (dotted.join(fns.withColumnRenamed("name", "fn_name"), KEY + ["fn_name"], "inner")
            .withColumn("rank",
                        F.when(F.col("file") == F.concat_ws("/", "dir",
                               F.concat(F.col("module"), F.lit(".py"))), 0)
                         .when(F.col("file") == F.concat_ws("/", "dir", "module",
                               F.lit("views.py")), 1)
                         .otherwise(2))
            .groupBy(*KEY, "src_type", "src_name", "src_file", "src_start", "src_verb", "fn_name")
            .agg(F.min_by(F.struct("file", "start"),
                          F.struct(F.col("rank"), F.col("skey"))).alias("c"))
            .select("repo", "lang", "src_type", "src_name", "src_file", "src_start",
                    "src_verb", "fn_name", F.col("c.file").alias("f_file"),
                    F.col("c.start").alias("f_start")))

    both = plain.unionByName(cand)
    return both.select(
        *KEY,
        F.lit("Handler").alias("edge_type"),
        node_key_col(F.col("src_type"), F.col("src_name"), F.col("src_file"),
                     F.col("src_start"), F.col("src_verb")).alias("src_key"),
        node_key_col(F.lit("Function"), F.col("fn_name"), F.col("f_file"),
                     F.col("f_start")).alias("dst_key"),
    )


def resolve_operands(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """(function, receiver-type-name) mentions -> Class -OPERAND-> Function.

    Mirrors format_function's find_class callback (format.rs:720-736):
    Class in the same file first, else first Class globally, else DataModel
    same-file-then-global."""
    def cand(t: str) -> DataFrame:
        c = (_nodes_of(nodes, t)
             .select(*KEY, "name", "file", "start", _skey(t).alias("skey")))
        same = (c.groupBy(*KEY, "name", "file")
                .agg(F.min_by("start", "skey").alias("start"))
                .selectExpr("repo", "lang", "name as dst_name",
                            "file as src_file", "start"))
        glob = (c.groupBy(*KEY, "name")
                .agg(F.min_by(F.struct("file", "start"), "skey").alias("g"))
                .selectExpr("repo", "lang", "name as dst_name", "g.file as gfile",
                            "g.start as gstart"))
        return same, glob

    c_same, c_glob = cand("Class")
    d_same, d_glob = cand("DataModel")
    m = (mentions
         .join(c_same.withColumnRenamed("start", "c_s"), KEY + ["dst_name", "src_file"], "left")
         .join(c_glob.withColumnRenamed("gfile", "c_gf").withColumnRenamed("gstart", "c_gs"),
               KEY + ["dst_name"], "left")
         .join(d_same.withColumnRenamed("start", "d_s"), KEY + ["dst_name", "src_file"], "left")
         .join(d_glob.withColumnRenamed("gfile", "d_gf").withColumnRenamed("gstart", "d_gs"),
               KEY + ["dst_name"], "left"))
    pick = F.coalesce(
        F.when(F.col("c_s").isNotNull(),
               F.struct(F.lit("Class").alias("t"), F.col("src_file").alias("f"),
                        F.col("c_s").alias("s"))),
        F.when(F.col("c_gf").isNotNull(),
               F.struct(F.lit("Class").alias("t"), F.col("c_gf").alias("f"),
                        F.col("c_gs").alias("s"))),
        F.when(F.col("d_s").isNotNull(),
               F.struct(F.lit("DataModel").alias("t"), F.col("src_file").alias("f"),
                        F.col("d_s").alias("s"))),
        F.when(F.col("d_gf").isNotNull(),
               F.struct(F.lit("DataModel").alias("t"), F.col("d_gf").alias("f"),
                        F.col("d_gs").alias("s"))),
    )
    m = m.withColumn("picked", pick).where(F.col("picked").isNotNull())
    return m.select(
        *KEY,
        F.lit("Operand").alias("edge_type"),
        node_key_col(F.col("picked.t"), F.col("dst_name"), F.col("picked.f"),
                     F.col("picked.s")).alias("src_key"),
        node_key_col(F.lit("Function"), F.col("src_name"), F.col("src_file"),
                     F.col("src_start")).alias("dst_key"),
    )


def resolve_verb_handlers(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """Next.js verb-style handlers: Endpoint meta.handler is an HTTP verb;
    the handler function is the same-file function whose name matches the
    verb case-insensitively (react_ts.rs:965-976)."""
    fns = (_nodes_of(nodes, "Function")
           .select(*KEY, "name", "file", "start", _skey("Function").alias("skey"))
           .withColumn("uname", F.upper("name")))
    byfile = (fns.groupBy(*KEY, "uname", "file")
              .agg(F.min_by(F.struct("name", "start"), "skey").alias("f"))
              .selectExpr("repo", "lang", "uname", "file as src_file", "f"))
    m = (mentions.withColumn("uname", F.upper("dst_name"))
         .join(byfile, KEY + ["uname", "src_file"], "inner"))
    return m.select(
        *KEY,
        F.lit("Handler").alias("edge_type"),
        node_key_col(F.col("src_type"), F.col("src_name"), F.col("src_file"),
                     F.col("src_start"), F.col("src_verb")).alias("src_key"),
        node_key_col(F.lit("Function"), F.col("f.name"), F.col("src_file"),
                     F.col("f.start")).alias("dst_key"),
    )


def resolve_class_new(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """`new X()` -> Calls edge to the Class when exactly one Class of that
    name exists (format.rs:1040-1046 class_call)."""
    classes = (_nodes_of(nodes, "Class")
               .select(*KEY, "name", "file", "start", _skey("Class").alias("skey")))
    uniq = (classes.groupBy(*KEY, "name")
            .agg(F.count("*").alias("cnt"),
                 F.min_by(F.struct("file", "start"), "skey").alias("c"))
            .where(F.col("cnt") == 1)
            .selectExpr("repo", "lang", "name as dst_name", "c"))
    return (mentions.join(uniq, KEY + ["dst_name"], "inner")
            .select(
                *KEY,
                F.lit("Calls").alias("edge_type"),
                node_key_col(F.col("src_type"), F.col("src_name"),
                             F.col("src_file"), F.col("src_start")).alias("src_key"),
                node_key_col(F.lit("Class"), F.col("dst_name"), F.col("c.file"),
                             F.col("c.start")).alias("dst_key"),
            ))


def resolve_renders(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """Page -> component function RENDERS edges: same-file first, then
    first-by-key global (extra_page_finder / page stage)."""
    f_same, f_glob = _same_then_global(nodes, "Function", "dst_name", "f")
    m = (mentions
         .join(f_same, KEY + ["dst_name", "src_file"], "left")
         .join(f_glob, KEY + ["dst_name"], "left")
         .withColumn("t_file", F.when(F.col("f_s").isNotNull(), F.col("src_file"))
                                .otherwise(F.col("f_g.file")))
         .withColumn("t_start", F.coalesce(F.col("f_s"), F.col("f_g.start")))
         .where(F.col("t_file").isNotNull()))
    return m.select(
        *KEY,
        F.lit("Renders").alias("edge_type"),
        node_key_col(F.col("src_type"), F.col("src_name"), F.col("src_file"),
                     F.col("src_start")).alias("src_key"),
        node_key_col(F.lit("Function"), F.col("dst_name"), F.col("t_file"),
                     F.col("t_start")).alias("dst_key"),
    )


def class_inherits(nodes: DataFrame) -> DataFrame:
    """meta.parent -> ParentOf(parent -> child) (btreemap_graph.rs:603-642)."""
    classes = (_nodes_of(nodes, "Class")
               .select(*KEY, "name", "file", "start",
                       F.element_at("meta", "parent").alias("parent"),
                       _skey("Class").alias("skey")))
    parents = (classes.groupBy(*KEY, "name")
               .agg(F.min_by(F.struct("file", "start"), "skey").alias("p"))
               .selectExpr("repo", "lang", "name as parent", "p"))
    return (classes.where(F.col("parent").isNotNull())
            .join(parents, KEY + ["parent"], "inner")
            .select(
                *KEY,
                F.lit("ParentOf").alias("edge_type"),
                node_key_col(F.lit("Class"), F.col("parent"), F.col("p.file"),
                             F.col("p.start")).alias("src_key"),
                node_key_col(F.lit("Class"), F.col("name"), F.col("file"),
                             F.col("start")).alias("dst_key"),
            ))


def instance_of(nodes: DataFrame) -> DataFrame:
    """Instance.data_type -> Class -> OF edge, only when the class exists
    (btreemap_graph.rs:238-255)."""
    classes = (_nodes_of(nodes, "Class")
               .select(*KEY, "name", "file", "start", _skey("Class").alias("skey")))
    by_name = (classes.groupBy(*KEY, "name")
               .agg(F.min_by(F.struct("file", "start"), "skey").alias("c"))
               .selectExpr("repo", "lang", "name as data_type", "c"))
    inst = _nodes_of(nodes, "Instance").where(F.col("data_type").isNotNull())
    return (inst.join(by_name, KEY + ["data_type"], "inner")
            .select(
                *KEY,
                F.lit("Of").alias("edge_type"),
                node_key_col(F.lit("Instance"), F.col("name"), F.col("file"),
                             F.col("start")).alias("src_key"),
                node_key_col(F.lit("Class"), F.col("data_type"), F.col("c.file"),
                             F.col("c.start")).alias("dst_key"),
            ))


def function_contains_vars(ident_mentions: DataFrame, nodes: DataFrame,
                           import_bodies: DataFrame) -> DataFrame:
    """Identifiers used in a function body that name a Var node ->
    Function -CONTAINS-> Var when the var is same-file, imported (import
    section substring), or same-dir (format.rs:795-845)."""
    variables = (_nodes_of(nodes, "Var")
                 .select(*KEY, F.col("name").alias("dst_name"),
                         F.col("file").alias("v_file"),
                         F.col("start").alias("v_start")))
    m = (ident_mentions
         .join(variables, KEY + ["dst_name"], "inner")
         .join(import_bodies, KEY + ["src_file"], "left")
         .withColumn("ok",
                     (F.col("v_file") == F.col("src_file"))
                     | (F.instr(F.coalesce("import_body", F.lit("")), F.col("dst_name")) > 0)
                     | (F.regexp_replace("v_file", "/[^/]*$", "")
                        == F.regexp_replace("src_file", "/[^/]*$", "")))
         .where(F.col("ok")))
    return m.select(
        *KEY,
        F.lit("Contains").alias("edge_type"),
        node_key_col(F.col("src_type"), F.col("src_name"), F.col("src_file"),
                     F.col("src_start")).alias("src_key"),
        node_key_col(F.lit("Var"), F.col("dst_name"), F.col("v_file"),
                     F.col("v_start")).alias("dst_key"),
    )


def function_contains_datamodels(dm_mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """Capitalized names used in a function -> Function -CONTAINS-> DataModel
    (first DataModel of that name anywhere, format.rs:764-793)."""
    dms = (_nodes_of(nodes, "DataModel")
           .select(*KEY, "name", "file", "start", _skey("DataModel").alias("skey")))
    first_dm = (dms.groupBy(*KEY, "name")
                .agg(F.min_by(F.struct("file", "start"), "skey").alias("d"))
                .selectExpr("repo", "lang", "name as dst_name", "d"))
    return (dm_mentions.join(first_dm, KEY + ["dst_name"], "inner")
            .select(
                *KEY,
                F.lit("Contains").alias("edge_type"),
                node_key_col(F.col("src_type"), F.col("src_name"), F.col("src_file"),
                             F.col("src_start")).alias("src_key"),
                node_key_col(F.lit("DataModel"), F.col("dst_name"), F.col("d.file"),
                             F.col("d.start")).alias("dst_key"),
            ))


def import_edges(import_mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """File -IMPORTS-> Function|Class|DataModel|Var: per imported name probe
    in that node-type priority, target file must contain the resolved module
    path (parse/collect.rs:424-507)."""
    prio = F.create_map(
        F.lit("Function"), F.lit(0), F.lit("Class"), F.lit(1),
        F.lit("DataModel"), F.lit(2), F.lit("Var"), F.lit(3))
    syms = (nodes.where(F.col("node_type").isin("Function", "Class", "DataModel", "Var"))
            .select(*KEY, "node_type", F.col("name").alias("dst_name"),
                    "file", "start",
                    node_key_col(F.col("node_type"), F.col("name"), F.col("file"),
                                 F.col("start")).alias("skey"))
            .withColumn("prio", prio[F.col("node_type")]))
    m = (import_mentions
         .join(syms, KEY + ["dst_name"], "inner")
         .where(F.instr(F.col("file"), F.col("dst_file")) > 0)
         .groupBy(*KEY, "src_name", "src_file", "src_start", "dst_name")
         .agg(F.min_by(F.struct("node_type", "file", "start"),
                       F.struct(F.col("prio"), F.col("skey"))).alias("t")))
    files = _nodes_of(nodes, "File").select(
        *KEY, F.col("file").alias("src_file"), F.col("name").alias("f_name"),
        F.col("start").alias("f_start"))
    return (m.join(files, KEY + ["src_file"], "inner")
            .select(
                *KEY,
                F.lit("Imports").alias("edge_type"),
                node_key_col(F.lit("File"), F.col("f_name"), F.col("src_file"),
                             F.col("f_start")).alias("src_key"),
                node_key_col(F.col("t.node_type"), F.col("dst_name"), F.col("t.file"),
                             F.col("t.start")).alias("dst_key"),
            ))
