"""Source-code comment & license-header stripping — lexer-free, JVM-side.

A code-corpus pipeline (the input_hint's (repo, path, lang, content)
table) routinely needs comment-free views of the source: near-dup
detection that ignores license boilerplate, token budgets that count
code rather than prose, and decontamination against doc-comment-heavy
eval sets. These transforms are pure `regexp_replace` chains — one
projection on the corpus scan, no UDF, no shuffle — written in the
Java≡RE2 shared regex dialect (character classes, non-capturing groups,
bounded repeats, `(?i)`; no lookaround, no backreferences) so the DuckDB
oracle replays them byte-for-byte.

LEXER-FREE means approximation by design: a comment marker inside a
string literal ("http://…" is the classic) is treated as a comment.
The C-style block pattern below is the standard linear-scan form
(`/\\*[^*]*\\*+([^/*][^*]*\\*+)*/`), not the non-greedy `[\\s\\S]*?`
one — on an adversarial megabyte of unclosed `/*` runs the non-greedy
form makes Java's backtracking engine rescan from every opener (O(L²));
this form advances monotonically. Known casualty of lexer-freedom: a URL
in code loses its `//tail`, exactly like the classic single-pass
strippers — callers who care pre-mask string literals first.

Language dispatch: `LANG_FAMILIES` maps lowercase language names to a
comment-syntax family. Unknown languages pass through UNCHANGED — a
cleaning stage must never corrupt what it doesn't understand.

The reference engine tokenizes raw content with no code-aware stage
(Indexer.java processes whole fields); this module is pipeline surplus,
like the dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C-style block comment, linear form (no backtracking blowup on
# pathological unclosed-comment inputs)
_BLOCK = r"/\*[^*]*\*+([^/*][^*]*\*+)*/"
_LINE_SLASH = r"//[^\n]*"
_LINE_HASH = r"#[^\n]*"
_LINE_DASH = r"--[^\n]*"
_XML_BLOCK = r"<!--([^-]|-[^-]|--[^>])*-->"   # linear form of <!-- ... -->

# family -> ordered remove-patterns (block comments BEFORE line comments:
# "/* a // b */" must die as one block, not leave "/* a" behind)
_FAMILIES: dict[str, tuple[str, ...]] = {
    "c": (_BLOCK, _LINE_SLASH),
    "hash": (_LINE_HASH,),
    "sql": (_BLOCK, _LINE_DASH),
    "xml": (_XML_BLOCK,),
}

LANG_FAMILIES: dict[str, str] = {
    **{k: "c" for k in ("java", "js", "javascript", "ts", "typescript",
                        "c", "cpp", "c++", "h", "hpp", "cs", "go", "rust",
                        "scala", "kotlin", "swift", "php", "css")},
    **{k: "hash" for k in ("py", "python", "rb", "ruby", "sh", "bash",
                           "shell", "perl", "r", "yaml", "yml", "toml")},
    "sql": "sql",
    **{k: "xml" for k in ("xml", "html", "htm")},
}

# post-strip tidy: trailing blanks left where a comment was, then runs of
# 3+ newlines (whole deleted comment blocks) collapse to one blank line
_TIDY = ((r"[ \t]+\n", "\n"), (r"\n{3,}", "\n\n"))

_LICENSE_MARK = r"(?i)copyright|license|licence|spdx|all rights reserved"

# leading comment region per family: one block comment OR an unbroken run
# of line comments (with surrounding blank lines), anchored at byte 0
_LEAD: dict[str, str] = {
    "c": r"^\s*(" + _BLOCK + r"|(//[^\n]*\n\s*)*//[^\n]*\n?)",
    "hash": r"^\s*((#[^\n]*\n\s*)*#[^\n]*\n?)",
    "sql": r"^\s*(" + _BLOCK + r"|(--[^\n]*\n\s*)*--[^\n]*\n?)",
    "xml": r"^\s*" + _XML_BLOCK,
}


def _strip_family(col: Column, family: str, tidy: bool = True) -> Column:
    out = col
    for pat in _FAMILIES[family]:
        out = F.regexp_replace(out, pat, "")
    if tidy:
        for pat, rep in _TIDY:
            out = F.regexp_replace(out, pat, rep)
    return out


def _family_of(lang: str) -> str:
    """Resolve a FIXED user-named language, failing fast on a typo —
    silently no-opping a requested whole-corpus strip would be worse
    than an error. (Per-row lang_col dispatch still passes unknown
    languages through: there the value is data, not a user claim.)"""
    family = LANG_FAMILIES.get(lang.lower())
    if family is None:
        known = ", ".join(sorted(LANG_FAMILIES))
        raise ValueError(f"unknown language {lang!r}; known: {known}")
    return family


def strip_comments_expr(col: Column, lang: str, tidy: bool = True) -> Column:
    """Comment-free view of `col` for a FIXED language name."""
    return _strip_family(col, _family_of(lang), tidy)


def with_comments_stripped(df: DataFrame, text_col: str = "content",
                           lang_col: str | None = None,
                           lang: str | None = None,
                           out: str | None = None,
                           tidy: bool = True) -> DataFrame:
    """`out` (default: in-place) = comment-free `text_col`.

    Exactly one of `lang` (whole-table language) or `lang_col` (per-row
    dispatch — ONE chained CASE projection, each row pays only its own
    family's regex chain). Unknown/NULL languages pass through unchanged.
    """
    if (lang is None) == (lang_col is None):
        raise ValueError("pass exactly one of lang= or lang_col=")
    c = F.col(text_col)
    if lang is not None:
        expr = strip_comments_expr(c, lang, tidy)
    else:
        lc = F.lower(F.col(lang_col))
        expr = None
        for family in _FAMILIES:
            langs = [k for k, v in LANG_FAMILIES.items() if v == family]
            cond = lc.isin(*langs)
            branch = _strip_family(c, family, tidy)
            expr = (F.when(cond, branch) if expr is None
                    else expr.when(cond, branch))
        expr = expr.otherwise(c)
    return df.withColumn(out or text_col, expr)


def _strip_license_family(col: Column, family: str) -> Column:
    lead = F.regexp_extract(col, _LEAD[family], 0)
    is_license = (F.length(lead) > 0) & lead.rlike(_LICENSE_MARK)
    return F.when(is_license,
                  F.ltrim(col.substr(F.length(lead) + 1,
                                     F.length(col)))).otherwise(col)


def strip_license_header_expr(col: Column, lang: str) -> Column:
    """Remove the LEADING comment (block, or unbroken line-comment run)
    iff it contains a license marker (copyright/license/SPDX/…). The
    match is extracted once and removed by length arithmetic — no second
    regex pass, and only the anchored head of the file is ever touched,
    so doc comments deeper in the file survive."""
    return _strip_license_family(col, _family_of(lang))


def with_license_header_stripped(df: DataFrame, text_col: str = "content",
                                 lang_col: str | None = None,
                                 lang: str | None = None,
                                 out: str | None = None) -> DataFrame:
    """`out` (default: in-place) = `text_col` minus a leading license
    header. Same dispatch contract as with_comments_stripped."""
    if (lang is None) == (lang_col is None):
        raise ValueError("pass exactly one of lang= or lang_col=")
    c = F.col(text_col)
    if lang is not None:
        expr = strip_license_header_expr(c, lang)
    else:
        lc = F.lower(F.col(lang_col))
        expr = None
        for family in _FAMILIES:
            langs = [k for k, v in LANG_FAMILIES.items() if v == family]
            cond = lc.isin(*langs)
            branch = _strip_license_family(c, family)
            expr = (F.when(cond, branch) if expr is None
                    else expr.when(cond, branch))
        expr = expr.otherwise(c)
    return df.withColumn(out or text_col, expr)
