"""Source-table construction.

The pipeline input is an Iceberg/parquet table of source-code checkouts with
columns (repo, path, commit, lang, content) — BASELINE.json input_hint.  For
correctness runs we synthesize that table from the reference's fixture trees
(read-only walk, FIXTURES.md §1); for benchmarks we replicate fixture files
across R synthetic repos with deterministically mangled symbols
(FIXTURES.md §5).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from .langspec import LANGS, MAX_FILE_SIZE
from .schema import SOURCE_SCHEMA

REFERENCE_TESTING = "/root/reference/ast/src/testing"

# fixture dir (under ast/src/testing/) -> language id, per the test
# registrations in /root/reference/ast/src/testing/mod.rs:69-423
FIXTURES = {
    "go": "go",
    "go_non_web": "go",
    "rust": "rust",
    "python/web": "python",
    "python/data_science": "python",
    "python/cli": "python",
    "python/services": "python",
    "python/module_calls": "python",
    "typescript": "typescript",
    "react": "react",
    "nextjs": "react",
    "java": "java",
    "ruby": "ruby",
    "kotlin": "kotlin",
    "swift/LegacyApp": "swift",
    "swift/ModernApp": "swift",
    "php": "php",
    "csharp": "csharp",
    "c": "c",
    "cpp/web_api": "cpp",
    "cpp/cuda": "cpp",
    "angular": "angular",
    "svelte": "svelte",
}


def walk_fixture(fixture_dir: str, lang: str, root: str = REFERENCE_TESTING,
                 repo: str | None = None) -> list[dict]:
    """One row per source file of a fixture tree.

    Mirrors the reference's file collection: language extensions + package
    files, skip dirs (lsp/src/language.rs:78-135).  File paths are kept
    relative to the testing root so annotation `"file-suffix"` matching works
    unchanged.
    """
    spec = LANGS[lang]
    rows: list[dict] = []
    base = os.path.join(root, fixture_dir)
    repo = repo or f"fixtures/{fixture_dir}"
    for dirpath, dirnames, filenames in os.walk(base):
        dirnames[:] = sorted(d for d in dirnames
                             if d not in spec.skip_dirs and not d.startswith("."))
        for fn in sorted(filenames):
            ext = fn.rsplit(".", 1)[-1] if "." in fn else ""
            is_pkg = fn in spec.pkg_files or any(
                fn.endswith(p) for p in spec.pkg_files if p.startswith("."))
            if ext not in spec.exts and not is_pkg:
                continue
            if any(fn.endswith(sfe) for sfe in spec.skip_file_ends):
                continue
            full = os.path.join(dirpath, fn)
            try:
                with open(full, "rb") as f:
                    raw = f.read()
                content = raw.decode("utf-8")
            except (OSError, UnicodeDecodeError):
                content = None  # unreadable/binary -> flagged, not parsed
            # repo-relative layout identical to the reference's own builds
            # (Repo::new("src/testing/<fixture>") stores paths with this
            # prefix, and the kotlin/swift fixtures assert Import node names
            # derived from it)
            rel = "src/testing/" + os.path.relpath(full, root)
            rows.append({
                "repo": repo,
                "path": rel,
                "commit": "fixture",
                "lang": lang,
                "content": content,
            })
    return rows


# languages with a working extractor today — the bench corpus draws from
# these so files/sec counts only files that are actually parsed
IMPLEMENTED_FIXTURES = {k: v for k, v in FIXTURES.items()
                        if v in ("python", "go", "rust", "typescript", "react",
                                 "java", "ruby", "kotlin", "swift", "php",
                                 "csharp", "c", "cpp", "angular", "svelte")}


def fixture_source_rows(fixtures: dict[str, str] | None = None) -> list[dict]:
    fixtures = fixtures or FIXTURES
    rows: list[dict] = []
    for fdir, lang in fixtures.items():
        rows.extend(walk_fixture(fdir, lang))
    return rows


def fixture_source_df(spark: SparkSession, fixtures: dict[str, str] | None = None) -> DataFrame:
    return spark.createDataFrame(fixture_source_rows(fixtures), SOURCE_SCHEMA)


_IDENT = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\b")


def replicate_rows(rows: list[dict], copies: int) -> list[dict]:
    """Deterministic scale-up: copy every repo `copies` times, mangling each
    repo's symbols with a per-copy suffix so cross-repo joins don't collapse.

    Used only for benchmarking (FIXTURES.md §5); symbol mangling keeps the
    per-repo call-resolution workload realistic (global-unique counts stay
    per-repo-unique instead of exploding into hub symbols).
    """
    out: list[dict] = []
    for i in range(copies):
        for r in rows:
            c = dict(r)
            c["repo"] = f"{r['repo']}__r{i}"
            # paths must be mangled too: canonical node keys are
            # (type,name,file,start) — identical paths across synthetic
            # repos would collapse under dropDuplicates(node_key)
            c["path"] = f"r{i}/{r['path']}"
            out.append(c)
    return out


# languages participating in content-based detection (PROGRAMMING_LANGUAGES,
# lsp/src/language.rs; "react" is a typescript presentation alias and
# bash/toml are manifest-parsing helpers — excluded like the reference)
DETECT_LANGS = ["rust", "go", "typescript", "python", "ruby", "kotlin",
                "swift", "java", "svelte", "angular", "c", "cpp", "php",
                "csharp"]
# required indicator files (language.rs:108-114) and overrides (:99-105)
_INDICATORS = {"svelte": ("svelte.config.js", "svelte.config.ts"),
               "angular": ("angular.json",)}
_OVERRIDES = {"svelte": ("typescript",), "angular": ("typescript",)}


def detect_languages(src: DataFrame) -> DataFrame:
    """Content-based multi-language detection over a (repo, path) table —
    the reference's new_multi_detect re-expressed as per-repo aggregations
    (repo.rs:368-515):

    * a language is detected in a repo when one of its package files exists
      (or, for package-less languages, any file with its extensions) AND its
      required indicator files are present
    * svelte/angular detection OVERRIDES typescript (language.rs:99-105)
    * repos with no detection fall back to extension presence
    * each detected language claims every file matching its extensions —
      a file can belong to several language slices, exactly like the
      reference's one-Repo-per-language build

    Returns (repo, path, lang) — the corrected source assignment for tables
    whose `lang` column is missing or untrustworthy."""
    from pyspark.sql import functions as F

    base = src.select(
        "repo", "path",
        F.element_at(F.split("path", "/"), -1).alias("fname")).withColumn(
        "ext", F.element_at(F.split("fname", "\\."), -1))

    per_lang = []
    for lang in DETECT_LANGS:
        spec = LANGS[lang]
        exts = list(spec.exts)
        pkgs = [p for p in spec.pkg_files if not p.startswith(".")]
        pkg_sfx = [p for p in spec.pkg_files if p.startswith(".")]
        has_ext = F.col("ext").isin(exts)
        if spec.pkg_files:
            is_pkg = F.col("fname").isin(pkgs)
            for s in pkg_sfx:
                is_pkg = is_pkg | F.col("fname").endswith(s)
        else:
            is_pkg = has_ext
        ind = _INDICATORS.get(lang)
        has_ind = (F.max(F.when(F.col("fname").isin(list(ind)), 1)
                         .otherwise(0)) == 1) if ind else F.lit(True)
        agg = (base.groupBy("repo")
               .agg((F.max(F.when(is_pkg, 1).otherwise(0)) == 1).alias("pkg"),
                    (F.max(F.when(has_ext, 1).otherwise(0)) == 1).alias("src_"),
                    has_ind.alias("ind") if ind else F.lit(True).alias("ind"))
               .withColumn("lang", F.lit(lang))
               .withColumn("detected", F.col("pkg") & F.col("ind"))
               .withColumn("fallback", F.col("src_") & F.col("ind"))
               .select("repo", "lang", "detected", "fallback"))
        per_lang.append(agg)
    det = per_lang[0]
    for a in per_lang[1:]:
        det = det.unionByName(a)

    # overrides: an overriding language's detection removes the overridden
    overriding = [(o, t) for o, ts in _OVERRIDES.items() for t in ts]
    ov = (det.where(F.col("detected")
                    & F.col("lang").isin([o for o, _ in overriding]))
          .select("repo", F.col("lang").alias("ov_lang")))
    ov_map = F.create_map(*[x for o, t in overriding
                            for x in (F.lit(o), F.lit(t))])
    dropped = ov.select("repo", ov_map[F.col("ov_lang")].alias("lang"))
    picked = (det.where("detected")
              .join(dropped, ["repo", "lang"], "left_anti")
              .select("repo", "lang"))
    # fallback for repos with zero detections
    none_det = (det.groupBy("repo")
                .agg(F.max(F.col("detected").cast("int")).alias("any"))
                .where("any = 0").select("repo"))
    fb = (det.where("fallback").join(none_det, "repo", "leftsemi")
          .join(dropped, ["repo", "lang"], "left_anti")
          .select("repo", "lang"))
    langs = picked.unionByName(fb).distinct()

    # every detected language claims its extension-matching files
    ext_rows = [(lang, e) for lang in DETECT_LANGS for e in LANGS[lang].exts]
    ext_map = src.sparkSession.createDataFrame(ext_rows, ["lang", "ext"])
    return (base.join(ext_map, "ext")
            .join(langs, ["repo", "lang"], "leftsemi")
            .select("repo", "path", "lang"))


def with_skip_flags(df: DataFrame) -> DataFrame:
    """Flag rows the parser must not touch (reference core.rs:298-364):
    >500 KB -> skipped=too_large; unreadable/binary -> skipped=unreadable."""
    from pyspark.sql import functions as F

    return df.withColumn(
        "skipped",
        F.when(F.col("content").isNull(), F.lit("unreadable"))
        .when(F.octet_length(F.col("content")) > MAX_FILE_SIZE, F.lit("too_large"))
        .otherwise(F.lit(None).cast("string")),
    )
