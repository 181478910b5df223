"""KG linking-plane operator shapes, oracle-checkable on the driver's
testdata tables.

The KG pipeline's own input is a source-code table the driver testdata does
not carry, so its *relational sub-operators* are exercised here on
documents/events with DuckDB oracles (VERDICT round 1, item 10):

  link_cascade_resolve   — the call-resolution priority cascade
                           (link/calls.py): pre-aggregated candidate tables
                           per strategy, left-join + first-hit-wins coalesce
                           with confidence/strategy labels
  link_path_match        — the Request->Endpoint masked-path join
                           (link/api.py): normalize -> (verb, nseg) equi-join
                           -> per-segment equal-or-param filter; REUSES the
                           engine's normalize_backend/_segments/_paths_match
                           column expressions
  link_prefix_rewrite    — the endpoint-group longest-prefix-wins rewrite
                           (link/groups.py): per-entity candidate set ->
                           window rn=1 by (length desc, value) -> rename
  link_same_then_global  — the symbol-table same-scope-first-then-global
                           resolution (link/simple.py::build_symtab /
                           _same_then_global)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    # scan-parallelism repair for single-row-group inputs (see
    # catalog._read_par — function-level import avoids a module cycle;
    # catalog imports this module at its end)
    from .catalog import _read_par
    return _read_par(spark, f"{sf_dir}/documents.parquet")


def _events(spark, sf_dir):
    from .catalog import _read_par
    return _read_par(spark, f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# 1. priority cascade (link/calls.py shape)
# --------------------------------------------------------------------------

def q_link_cascade_resolve(spark, sf_dir):
    """Resolve each document's 'duplicate partner' through a 3-strategy
    cascade, first hit wins: exact text hash (0.9) -> fingerprint bucket
    (0.8) -> same (lang, source) (0.5).  Every strategy's candidate table is
    PRE-AGGREGATED to one row per mention key before the coalesce — the
    skew-defusing plan of the call cascade."""
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    # base feeds SEVEN plan branches (both sides of three partner joins +
    # the spine): materialize the narrow (id, lang, source, 2 hashes,
    # bucket) projection once so the lower+trim+regex+md5 pass over the
    # full text runs once, not seven times (plans downstream also get
    # shallow — scan-of-checkpoint instead of seven copies of the scan)
    base = d.select(
        "doc_id", "lang", "source",
        F.md5(norm).alias("h"),
        F.md5(F.substring(norm, 1, 64)).alias("fp"),
        F.floor(F.length(norm) / 100).cast("long").alias("len_bucket")
    ).localCheckpoint()

    def partner(keys: list[str], out: str):
        a = base.alias("a")
        b = base.alias("b")
        cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
        return (a.join(b, cond)
                .where(F.col("b.doc_id") != F.col("a.doc_id"))
                .groupBy(F.col("a.doc_id").alias("doc_id"))
                .agg(F.min("b.doc_id").alias(out)))

    m = (base.select("doc_id")
         .join(partner(["h"], "p_exact"), "doc_id", "left")
         .join(partner(["len_bucket", "fp"], "p_fp"), "doc_id", "left")
         .join(partner(["lang", "source"], "p_ls"), "doc_id", "left"))
    pick = F.coalesce(
        F.when(F.col("p_exact").isNotNull(),
               F.struct(F.col("p_exact").alias("p"), F.lit(0.9).alias("c"),
                        F.lit("exact").alias("s"))),
        F.when(F.col("p_fp").isNotNull(),
               F.struct(F.col("p_fp").alias("p"), F.lit(0.8).alias("c"),
                        F.lit("fingerprint").alias("s"))),
        F.when(F.col("p_ls").isNotNull(),
               F.struct(F.col("p_ls").alias("p"), F.lit(0.5).alias("c"),
                        F.lit("lang_source").alias("s"))),
    )
    return (m.withColumn("picked", pick)
            .where(F.col("picked").isNotNull())
            .select("doc_id", F.col("picked.p").alias("partner"),
                    F.col("picked.c").alias("confidence"),
                    F.col("picked.s").alias("strategy")))


SQL_LINK_CASCADE = """
WITH base AS (
  SELECT doc_id, lang, source,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h,
         md5(substring(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), 1, 64)) AS fp,
         CAST(floor(length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) / 100) AS BIGINT) AS len_bucket
  FROM documents),
p_exact AS (
  SELECT a.doc_id, min(b.doc_id) AS p FROM base a JOIN base b ON a.h = b.h
  WHERE b.doc_id <> a.doc_id GROUP BY a.doc_id),
p_fp AS (
  SELECT a.doc_id, min(b.doc_id) AS p FROM base a
  JOIN base b ON a.len_bucket = b.len_bucket AND a.fp = b.fp
  WHERE b.doc_id <> a.doc_id GROUP BY a.doc_id),
p_ls AS (
  SELECT a.doc_id, min(b.doc_id) AS p FROM base a
  JOIN base b ON a.lang = b.lang AND a.source = b.source
  WHERE b.doc_id <> a.doc_id GROUP BY a.doc_id)
SELECT base.doc_id,
       coalesce(p_exact.p, p_fp.p, p_ls.p) AS partner,
       CASE WHEN p_exact.p IS NOT NULL THEN 0.9
            WHEN p_fp.p IS NOT NULL THEN 0.8 ELSE 0.5 END AS confidence,
       CASE WHEN p_exact.p IS NOT NULL THEN 'exact'
            WHEN p_fp.p IS NOT NULL THEN 'fingerprint'
            ELSE 'lang_source' END AS strategy
FROM base
LEFT JOIN p_exact USING (doc_id)
LEFT JOIN p_fp USING (doc_id)
LEFT JOIN p_ls USING (doc_id)
WHERE coalesce(p_exact.p, p_fp.p, p_ls.p) IS NOT NULL
"""


# --------------------------------------------------------------------------
# 2. masked-path join (link/api.py shape — reuses the engine expressions)
# --------------------------------------------------------------------------

def q_link_path_match(spark, sf_dir):
    """Requests synthesized from events rows vs endpoint patterns per
    event_type; resolved with the ENGINE's normalize_backend + _segments +
    _paths_match (the exact Request->Endpoint join of link/api.py)."""
    from ..link.api import _paths_match, _segments, normalize_backend, \
        normalize_frontend

    e = _events(spark, sf_dir)
    verb = F.when(F.col("event_type").isin("purchase", "signup"), "POST") \
            .otherwise(F.lit("GET"))
    reqs = e.select(
        "event_id",
        F.concat(F.lit("/api/users/"), F.col("user_id").cast("string"),
                 F.lit("/"), F.col("event_type")).alias("rpath"),
        verb.alias("verb"))
    eps = (e.select("event_type").distinct()
           .select(F.concat(F.lit("api/users/{id}/"), F.col("event_type"))
                   .alias("epath"),
                   verb.alias("ep_verb")))
    r = (reqs.withColumn("np", normalize_frontend(F.col("rpath")))
         .withColumn("fseg", _segments(F.col("np")))
         .withColumn("nseg", F.size("fseg")))
    p = (eps.withColumn("np_b", normalize_backend(F.col("epath")))
         .withColumn("bseg", _segments(F.col("np_b")))
         .withColumn("nseg", F.size("bseg")))
    j = (r.join(p, ["nseg"])
         .where(F.col("verb") == F.col("ep_verb"))
         .where(_paths_match(F.col("fseg"), F.col("bseg"))))
    return j.select("event_id", F.col("np_b").alias("endpoint"), "verb")


SQL_LINK_PATH_MATCH = """
WITH reqs AS (
  SELECT event_id,
         '/api/users/' || CAST(user_id AS VARCHAR) || '/' || event_type AS rpath,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 'POST' ELSE 'GET' END AS verb
  FROM events),
eps AS (
  SELECT DISTINCT 'api/users/{id}/' || event_type AS epath,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 'POST' ELSE 'GET' END AS ep_verb
  FROM events),
r AS (
  SELECT event_id, verb,
         list_filter(string_split(rpath, '/'), x -> x <> '') AS fseg
  FROM reqs),
p AS (
  SELECT ep_verb,
         CASE WHEN starts_with(x, '/') THEN x ELSE '/' || x END AS np_b,
         list_filter(string_split(
           CASE WHEN starts_with(x, '/') THEN x ELSE '/' || x END, '/'),
           s -> s <> '') AS bseg
  FROM (SELECT ep_verb,
               regexp_replace(regexp_replace(epath, '\\{[^}]+\\}', ':param', 'g'),
                              '/$', '') AS x
        FROM eps))
SELECT event_id, np_b AS endpoint, verb
FROM r JOIN p ON len(fseg) = len(bseg) AND verb = ep_verb
WHERE NOT ((fseg[1] = 'api' OR bseg[1] = 'api') AND fseg[1] IS DISTINCT FROM bseg[1])
  AND len(list_filter(generate_series(1, len(fseg)),
          i -> NOT (fseg[i] = bseg[i] OR starts_with(fseg[i], ':')
                    OR starts_with(bseg[i], ':')))) = 0
"""


# --------------------------------------------------------------------------
# 3. longest-prefix-wins rewrite (link/groups.py shape)
# --------------------------------------------------------------------------

def q_link_prefix_rewrite(spark, sf_dir):
    """Per user, the rename prefix is the LONGEST event_type they emitted
    (tie -> lexicographically first) — the longest-matching-prefix window of
    the endpoint-group rewrite."""
    e = _events(spark, sf_dir)
    cand = e.select("user_id", F.col("event_type").alias("prefix")).distinct()
    w = Window.partitionBy("user_id") \
              .orderBy(F.length("prefix").desc(), F.col("prefix"))
    return (cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id",
                    F.concat(F.col("prefix"), F.lit("/"),
                             F.col("user_id").cast("string")).alias("renamed")))


SQL_LINK_PREFIX_REWRITE = """
SELECT user_id, prefix || '/' || CAST(user_id AS VARCHAR) AS renamed FROM (
  SELECT user_id, prefix,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY length(prefix) DESC, prefix) AS rn
  FROM (SELECT DISTINCT user_id, event_type AS prefix FROM events))
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# 4. same-scope-first-then-global resolution (link/simple.py shape)
# --------------------------------------------------------------------------

def q_link_same_then_global(spark, sf_dir):
    """For each document, resolve a representative doc for its lang:
    first doc of the same (lang, source) scope if that scope has >1 docs
    (same-file preference), else the first doc of the lang globally —
    build_symtab's glob/fmap pick re-expressed on testdata."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    scope = (d.groupBy("lang", "source")
             .agg(F.min("doc_id").alias("s_first"), F.count("*").alias("s_cnt")))
    glob = d.groupBy("lang").agg(F.min("doc_id").alias("g_first"))
    m = (d.join(scope, ["lang", "source"], "left")
         .join(glob, ["lang"], "left"))
    use_scope = F.col("s_cnt") > 1
    return m.select(
        "doc_id",
        F.when(use_scope, F.col("s_first")).otherwise(F.col("g_first"))
        .alias("resolved"),
        F.when(use_scope, F.lit("same_scope")).otherwise(F.lit("global"))
        .alias("strategy"))


SQL_LINK_SAME_THEN_GLOBAL = """
WITH scope AS (
  SELECT lang, source, min(doc_id) AS s_first, count(*) AS s_cnt
  FROM documents GROUP BY lang, source),
glob_tab AS (SELECT lang, min(doc_id) AS g_first FROM documents GROUP BY lang)
SELECT d.doc_id,
       CASE WHEN s.s_cnt > 1 THEN s.s_first ELSE g.g_first END AS resolved,
       CASE WHEN s.s_cnt > 1 THEN 'same_scope' ELSE 'global' END AS strategy
FROM documents d
LEFT JOIN scope s ON d.lang = s.lang AND d.source = s.source
LEFT JOIN glob_tab g ON d.lang = g.lang
"""


# --------------------------------------------------------------------------
# 5. library USES join (link/simple.py::resolve_uses shape)
# --------------------------------------------------------------------------

def q_link_library_uses(spark, sf_dir):
    """Unresolved references matched to a dependency manifest through an
    import map — resolve_uses' exact join shape: mention base -> per-scope
    import binding -> manifest entry by version-stripped last path segment.
    Here: events are the 'call mentions' (scope = user), the import map is
    each user's distinct event_types, and the manifest declares
    'vendor/<event_type>==1.0' libraries."""
    e = _events(spark, sf_dir)
    m = e.select("event_id", "user_id", F.col("event_type").alias("base"))
    imp = (e.select("user_id", F.col("event_type").alias("base")).distinct()
           .withColumn("module", F.concat(F.lit("vendor/"), F.col("base"))))
    libs = (e.select("event_type").distinct()
            .select(F.concat(F.lit("vendor/"), F.col("event_type"),
                             F.lit("==1.0")).alias("lib_name")))
    lib_base = F.regexp_replace(F.col("lib_name"), r"[=<>!~\[@].*$", "")
    libs = libs.withColumn(
        "mod_last", F.element_at(F.split(lib_base, "/"), -1))
    # collapse the manifest to one row per mod_last BEFORE the probe join:
    # min(lib_name) within a mod_last group is exactly what the old
    # per-mention `groupBy(event_id).agg(min(lib_name))` computed for a
    # mention (each mention binds ONE module via the multiplicity-1 import
    # join, hence one mod_last, hence its candidate set IS a mod_last
    # group).  This makes the second join structurally multiplicity-1 too.
    libs = libs.groupBy("mod_last").agg(F.min("lib_name").alias("lib_name"))
    # the import map and the manifest are DISTINCT-aggregated, bounded
    # tables (scopes x imported bases / declared libraries); broadcast them
    # so the 10^6-row mention stream is never shuffled for the probes.
    # (resolve_uses in link/simple.py keeps the shuffle join: its import
    # map is per-file and unbounded.  Catalyst's size ESTIMATE for these
    # aggregates is derived from the events scan and overshoots the 10 MB
    # auto threshold, hence the explicit hint — guide §3.1.)
    #
    # No per-mention aggregation remains: both probe joins are
    # multiplicity-1 by construction (imp is distinct on its exact join key
    # (user_id, base); libs is aggregated on its exact join key mod_last),
    # so the old final `groupBy(event_id).agg(min(lib_name))` — a full
    # shuffle of the mention stream with zero map-side reduction (event_id
    # is the events table's unique row id: a dense 0..N-1 sequence at every
    # generated SF) — grouped exactly one row per key and is dropped.  The
    # mention stream now flows scan -> two broadcast probes -> sink with NO
    # exchange at any scale (guide §2.1: remove the shuffle outright).
    hits = (m.join(F.broadcast(imp), ["user_id", "base"], "inner")
            .join(F.broadcast(libs),
                  F.element_at(F.split(F.col("module"), "/"), -1)
                  == F.col("mod_last"), "inner")
            .select("event_id", F.col("lib_name").alias("uses_lib")))
    return hits


SQL_LINK_LIBRARY_USES = """
WITH imp AS (
  SELECT DISTINCT user_id, event_type AS base,
         'vendor/' || event_type AS module
  FROM events),
libs AS (
  SELECT 'vendor/' || event_type || '==1.0' AS lib_name,
         list_extract(string_split(
           regexp_replace('vendor/' || event_type || '==1.0',
                          '[=<>!~\\[@].*$', ''), '/'), -1) AS mod_last
  FROM (SELECT DISTINCT event_type FROM events))
SELECT e.event_id, min(l.lib_name) AS uses_lib
FROM events e
JOIN imp ON e.user_id = imp.user_id AND e.event_type = imp.base
JOIN libs l ON list_extract(string_split(imp.module, '/'), -1) = l.mod_last
GROUP BY e.event_id
"""


LINK_CATALOG: dict[str, tuple] = {
    "link_cascade_resolve": (q_link_cascade_resolve, SQL_LINK_CASCADE),
    "link_path_match": (q_link_path_match, SQL_LINK_PATH_MATCH),
    "link_prefix_rewrite": (q_link_prefix_rewrite, SQL_LINK_PREFIX_REWRITE),
    "link_same_then_global": (q_link_same_then_global, SQL_LINK_SAME_THEN_GLOBAL),
    "link_library_uses": (q_link_library_uses, SQL_LINK_LIBRARY_USES),
}
