"""Deterministic text utilities: html->text extraction and word shingling.

The build pipeline's unit of membership is a url or a text shingle
(BASELINE.json north_star: "was this url/text-shingle seen?"). Both sides
of the correctness gate (Spark pipeline and DuckDB oracle) must produce
byte-identical text and identical shingle sets, so everything here is a
pure deterministic function with a version tag.

The reference has no text processing at all (keys arrive pre-extracted;
its only source is newline-delimited text, cmd/main.go:52-77) — this
module is qfspark's web-corpus front end.
"""

from __future__ import annotations

import re

EXTRACTOR_VERSION = 1

# web_pages.html is synthesized by wrapping the document text in this
# template (see webpages.py); the extractor inverts it exactly.
_BODY_RE = re.compile(rb"<p>(.*)</p>", re.DOTALL)


def extract_text(html: bytes) -> str:
    """Extract document text from html bytes, byte-identically: for any
    page produced by ``webpages.synthesize``, extract_text(html) == text.

    Deterministic and locale/time independent (versioned via
    EXTRACTOR_VERSION) per the per-row invariant in BASELINE.json.
    """
    if html is None:
        return ""
    m = _BODY_RE.search(html)
    if m is None:
        # fallback: strip all tags (still deterministic)
        return re.sub(rb"<[^>]*>", b"", html).decode("utf-8", "replace")
    return m.group(1).decode("utf-8", "replace")


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-gram shingles: split on single spaces, join k consecutive
    tokens with a space. Texts with fewer than k tokens yield no shingles.

    Mirrored exactly by SQL in both Spark (shingle_expr) and DuckDB
    (duckdb_shingle_sql) so shingle membership is oracle-checkable.
    """
    toks = text.split(" ")
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def shingle_expr(col: str, k: int = 3) -> str:
    """Spark SQL expression producing the array of k-gram shingles of a
    string column — built-in functions only (stays in codegen; no UDF)."""
    toks = f"split({col}, ' ')"
    return (
        f"CASE WHEN size({toks}) < {k} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {k}), "
        f"i -> array_join(slice({toks}, i + 1, {k}), ' ')) END"
    )


def duckdb_shingle_sql(col: str, k: int = 3) -> str:
    """DuckDB SQL expression equivalent to shingle_expr (list slicing is
    1-based inclusive in DuckDB)."""
    toks = f"string_split({col}, ' ')"
    return (
        f"CASE WHEN len({toks}) < {k} THEN [] "
        f"ELSE list_transform(range(0, len({toks}) - {k} + 1), "
        f"i -> array_to_string({toks}[i + 1 : i + {k}], ' ')) END"
    )
