"""Per-language configuration (extensions, skip rules, package files).

Semantics from the reference's language registry
(/root/reference/lsp/src/language.rs:25-166) — re-expressed as plain data so
both the fixture walker and the Spark filter plane can consume it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_FILE_SIZE = 500_000  # bytes — files larger than this are skipped, not
# parsed (reference ast/src/builder/utils.rs:13, ast/src/builder/core.rs:318)


@dataclass(frozen=True)
class LangSpec:
    name: str
    exts: tuple[str, ...]
    pkg_files: tuple[str, ...] = ()
    skip_dirs: tuple[str, ...] = (".git",)
    skip_file_ends: tuple[str, ...] = ()
    annotation_prefix: str = "// @ast "


LANGS: dict[str, LangSpec] = {
    s.name: s
    for s in [
        LangSpec("rust", ("rs",), ("Cargo.toml",), ("target", ".git")),
        LangSpec("go", ("go",), ("go.mod", "go.work"), ("vendor", ".git")),
        LangSpec(
            "typescript",
            ("ts", "js", "jsx", "tsx", "mdx", "html", "css"),
            ("package.json",),
            ("node_modules", ".git"),
            (".min.js",),
        ),
        LangSpec(
            "python",
            ("py", "ipynb"),
            ("requirements.txt", "pyproject.toml"),
            ("__pycache__", ".git", ".venv", "venv"),
            annotation_prefix="# @ast ",
        ),
        LangSpec("ruby", ("rb",), ("Gemfile",), ("migrate", "tmp", ".git"),
                 annotation_prefix="# @ast "),
        LangSpec("kotlin", ("kt", "kts", "java"),
                 ("build.gradle.kts", "build.gradle", "settings.gradle.kts", ".properties"),
                 ("build", ".git"), ("gradlew",)),
        LangSpec("swift", ("swift", "plist"), ("Package.swift", "Podfile", "Cartfile"),
                 (".git", "Pods")),
        LangSpec("java", ("java", "gradle", "gradlew"),
                 ("pom.xml", "build.gradle", "build.gradle.kts"), (".idea", "build", ".git")),
        LangSpec("bash", ("sh",), (), (".git",)),
        LangSpec("toml", ("toml",), ("Cargo.toml", "pyproject.toml"), (".git",)),
        LangSpec("svelte", ("svelte", "ts", "js", "html", "css"), ("package.json",),
                 (".git", "node_modules"), (".config.ts",)),
        LangSpec("angular", ("ts", "js", "html", "css"), ("package.json",),
                 (".git", "node_modules"), ("spec.ts",)),
        LangSpec("c", ("c", "h"), ("CMakeLists.txt", "Makefile", "meson.build"),
                 (".git", "build", "out", "CMakeFiles", ".cmake")),
        LangSpec("cpp", ("cpp", "hpp", "cc", "cxx", "hxx", "h", "cu"),
                 ("CMakeLists.txt", "Makefile", "meson.build"),
                 (".git", "build", "out", "CMakeFiles")),
        LangSpec("php", ("php",), ("composer.json",), (".git", "vendor")),
        LangSpec("csharp", ("cs",), (".csproj", ".sln"), (".git", "bin", "obj", "packages", ".vs")),
        # "react" is typescript parsed with tsx conventions; the reference
        # treats it as Typescript with react fixtures (ast/src/testing/mod.rs)
        LangSpec("react", ("ts", "js", "jsx", "tsx", "mdx", "html", "css"),
                 ("package.json",), ("node_modules", ".git"), (".min.js",)),
    ]
}


def annotation_prefix_for(lang: str, ext: str) -> str:
    # html/css fixture files carry their own comment syntax
    # (reference ast/src/testing/annotations.rs:272-278)
    if ext == "html":
        return "<!-- @ast "
    if ext in ("css", "scss", "sass", "less"):
        return "/* @ast "
    return LANGS[lang].annotation_prefix
