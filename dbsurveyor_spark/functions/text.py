"""Text functions: tokenization, shingles, stopwords — JVM-side only.

Tokenization is single-space split with empty-token filtering; documents.text
is space-separated synthetic prose. Every helper has a DuckDB-SQL mirror
producing identical values so the correctness oracle can replay the
computation (Spark `split`/`filter`/`transform` ↔ DuckDB
`string_split`/`list_filter`/`list_transform`). List indexing is 1-based in
both engines (`element_at` ↔ `list[i]`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared stopword lists (tiny, deterministic; language-ID heuristics).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "fr": ("le", "la", "et", "de", "un"),
    "es": ("el", "la", "y", "de", "un"),
    "de": ("der", "die", "und", "von", "ein"),
    "zh": ("de5", "le5", "he2", "shi4", "zai4"),
}


def tokens(col: Column) -> Column:
    """Non-empty tokens from single-space-separated text."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces; empty array if < n
    tokens."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(toks_expr: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`shingles`. ``toks_expr`` must be a bare
    identifier/alias (it is substituted verbatim, repeatedly)."""
    te = toks_expr
    parts = " || ' ' || ".join(f"{te}[i + {j}]" for j in range(n))
    # DuckDB range(a, b) is exclusive of b; Spark sequence(1, m) inclusive of
    # m — so range(1, m + 1) with m = len - (n-1).
    return (
        f"CASE WHEN len({te}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({te}) - {n - 1} + 1), "
        f"i -> {parts})) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def stopword_count(toks: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_count_sql(toks_expr: str, words: tuple[str, ...] = STOPWORDS) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, t -> t IN ({in_list})))"
