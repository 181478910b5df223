"""Content-based multi-language detection (new_multi_detect,
repo.rs:368-515 + language.rs overrides/indicators) on dirty tables whose
`lang` column is untrustworthy."""


def test_detect_languages_overrides_and_fallback(spark):
    from stakgraph_spark.source import detect_languages

    rows = [
        # angular repo: package.json + angular.json -> angular, NOT typescript
        ("r_ng", "package.json"), ("r_ng", "angular.json"),
        ("r_ng", "src/app/app.component.ts"),
        # plain typescript repo: package.json + ts, no indicator
        ("r_ts", "package.json"), ("r_ts", "src/index.ts"),
        # kotlin+java gradle repo: both languages detected, .java claimed twice
        ("r_kt", "build.gradle.kts"), ("r_kt", "app/src/A.kt"),
        ("r_kt", "app/src/B.java"),
        # go repo without go.mod: pkg file missing -> fallback by extension
        ("r_go", "main.go"),
        # svelte repo: svelte.config.js overrides typescript
        ("r_sv", "package.json"), ("r_sv", "svelte.config.js"),
        ("r_sv", "src/App.svelte"), ("r_sv", "src/util.ts"),
    ]
    src = spark.createDataFrame(rows, "repo: string, path: string")
    out = {(r["repo"], r["path"], r["lang"])
           for r in detect_languages(src).collect()}
    langs_by_repo = {}
    for repo, _, lang in out:
        langs_by_repo.setdefault(repo, set()).add(lang)

    assert "angular" in langs_by_repo["r_ng"]
    assert "typescript" not in langs_by_repo["r_ng"]
    assert ("r_ng", "src/app/app.component.ts", "angular") in out

    assert langs_by_repo["r_ts"] == {"typescript"}

    assert {"kotlin", "java"} <= langs_by_repo["r_kt"]
    # the .java file belongs to BOTH slices (one repo per language)
    assert ("r_kt", "app/src/B.java", "kotlin") in out
    assert ("r_kt", "app/src/B.java", "java") in out

    assert "go" in langs_by_repo["r_go"]  # fallback: extension presence

    assert "svelte" in langs_by_repo["r_sv"]
    assert "typescript" not in langs_by_repo["r_sv"]
