"""Extraction dispatch + the Arrow-vectorized Spark hook.

`extract_raw(df)` turns the source table into the unified RAW stream
(nodes + resolved edges + unresolved mentions) with ONE `mapInPandas` pass —
the only place Python touches row data.  Everything downstream is pure
DataFrame API.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..langspec import MAX_FILE_SIZE
from ..schema import RAW_SCHEMA
from .base import Extraction

_RAW_COLS = [f.name for f in RAW_SCHEMA.fields]


def get_extractor(lang: str):
    # local imports keep per-executor startup lean: only the languages that
    # actually appear in a batch get imported
    if lang == "python":
        from .python_lang import extract_python
        return extract_python
    if lang == "go":
        from .go_lang import extract_go
        return extract_go
    if lang == "rust":
        from .rust_lang import extract_rust
        return extract_rust
    if lang == "java":
        from .java_lang import extract_java
        return extract_java
    if lang == "ruby":
        from .ruby_lang import extract_ruby
        return extract_ruby
    if lang == "kotlin":
        from .kotlin_lang import extract_kotlin
        return extract_kotlin
    if lang == "swift":
        from .swift_lang import extract_swift
        return extract_swift
    if lang == "php":
        from .php_lang import extract_php
        return extract_php
    if lang == "csharp":
        from .csharp_lang import extract_csharp
        return extract_csharp
    if lang == "c":
        from .c_lang import extract_c
        return extract_c
    if lang == "cpp":
        from .cpp_lang import extract_cpp
        return extract_cpp
    if lang == "angular":
        from .angular_lang import extract_angular
        return extract_angular
    if lang == "svelte":
        from .svelte_lang import extract_svelte
        return extract_svelte
    if lang in ("typescript", "react"):
        try:
            from .ts_lang import make_ts_extractor
        except ImportError:
            return None
        return make_ts_extractor(lang)
    return None


# node types whose body the LINK plane reads (import-var probe, integration
# and e2e body matching, frontend test-id attributes) — these keep their
# body inline; everything else is slimmed (see schema.py RAW_SCHEMA header)
_INLINE_BODY_TYPES = frozenset({"Import", "IntegrationTest", "E2eTest"})
_FRONTEND_LANGS = frozenset({"typescript", "react"})


def extraction_to_rows(ex: Extraction, repo: str, lang: str,
                       lines: list[str] | None = None) -> list[dict]:
    rows: list[dict] = []
    frontend = lang in _FRONTEND_LANGS
    for n in ex.nodes:
        body = n.body or ""
        mode = off = None
        if body and not (n.node_type in _INLINE_BODY_TYPES
                         or (frontend and n.node_type == "Function")):
            # the byte-heavy common case: body == the source's line span
            # [start, end] (possibly minus leading whitespace, python's
            # indent-trimmed ast segments) -> recomputable JVM-side; the
            # equality check makes this bulletproof against any extractor
            # that trims or synthesizes (those ship as rec='fat' rows)
            span = "\n".join(lines[n.start:n.end + 1]) if lines else None
            if span is not None and span.endswith(body):
                mode, off, body = "span", len(span) - len(body), None
            else:
                mode, body = "fat", None
                rows.append({
                    "rec": "fat", "node_type": n.node_type, "name": n.name,
                    "file": n.file, "start": n.start, "body": n.body,
                    "meta": n.meta or None, "repo": repo, "lang": lang,
                })
        rows.append({
            "rec": "node", "node_type": n.node_type, "name": n.name,
            "file": n.file, "start": n.start, "end": n.end,
            "body": body if body else None,
            "docs": n.docs, "hash": None, "data_type": n.data_type,
            "meta": n.meta or None, "body_mode": mode, "body_off": off,
            "repo": repo, "lang": lang,
        })
    for e in ex.edges:
        st, sn, sf, ss, sv = e.src
        dt, dn, df_, ds, dv = e.dst
        rows.append({
            "rec": "edge", "edge_type": e.edge_type,
            "src_type": st, "src_name": sn, "src_file": sf, "src_start": ss,
            "src_verb": sv, "dst_type": dt, "dst_name": dn, "dst_file": df_,
            "dst_start": ds, "dst_verb": dv, "operand": e.operand,
            "repo": repo, "lang": lang,
        })
    for m in ex.mentions:
        st, sn, sf, ss, sv = m.src
        rows.append({
            "rec": "mention", "m_kind": m.kind,
            "src_type": st, "src_name": sn, "src_file": sf, "src_start": ss,
            "src_verb": sv, "dst_name": m.target, "dst_file": m.dst_file,
            "dst_start": m.row, "operand": m.operand,
            "m_extra": m.extra or None, "names": m.names,
            "repo": repo, "lang": lang,
        })
    return rows


def extract_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (repo, path, lang, content) -> RAW rows."""
    for pdf in pdfs:
        out: list[dict] = []
        for repo, path, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["lang"], pdf["content"]):
            if content is None or len(content.encode("utf-8", "ignore")) > MAX_FILE_SIZE:
                continue  # skipped=too_large / unreadable — File node still
                # exists (file plane); parser never sees it (core.rs:298-364)
            # package manifests route to the get_libs stage, not the language
            # parser (process_libraries, builder/stages.rs:16-58)
            from .libs import extract_libs
            lex = extract_libs(lang, path, content)
            if lex is not None:
                out.extend(extraction_to_rows(lex, repo, lang,
                                              content.split("\n")))
                continue
            fn = get_extractor(lang)
            if fn is None:
                continue
            try:
                ex = fn(path, content)
            except Exception:
                continue  # parser crash on one file must not kill the batch
            # docs: comment block ending <=2 rows above a definition
            # (attach_comments, ast/src/lang/mod.rs:85-197) — applied
            # centrally so every language extractor gets it
            from .base import COMMENT_STYLE, DOC_TYPES, attach_docs, \
                collect_comments
            style = COMMENT_STYLE.get(lang)
            if style is not None:
                try:
                    attach_docs(ex.nodes,
                                collect_comments(content, style[0], style[1]),
                                DOC_TYPES[lang])
                except Exception:
                    pass  # docs are best-effort; never fail the batch
            out.extend(extraction_to_rows(ex, repo, lang,
                                          content.split("\n")))
        if out:
            # explicit None for absent fields — missing dict keys become NaN
            # in pandas, which breaks Arrow map/long conversion
            full = [{c: r.get(c) for c in _RAW_COLS} for r in out]
            yield pd.DataFrame(full, columns=_RAW_COLS)
        else:
            yield pd.DataFrame({c: pd.Series(dtype="object") for c in _RAW_COLS})


def extract_raw(source_df):
    """source (repo,path,commit,lang,content) -> RAW DataFrame.

    The source is repartitioned by (repo, lang) first so one task parses one
    repo-language slice — co-locates later symbol-table shuffles and keeps
    parser cache locality per task (SURVEY.md §4).
    """
    cols = ["repo", "path", "lang", "content"]
    return source_df.select(*cols).mapInPandas(extract_batch, schema=RAW_SCHEMA)
