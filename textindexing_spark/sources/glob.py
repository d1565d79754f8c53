"""Glob predicate — operator S6 (SURVEY.md 2.1).

The reference compiles ``*``/``?`` file globs to an anchored
case-insensitive regex and validates pattern characters
(Documents/Sources/SearchPattern.cs:39-67). Here the same predicate becomes
a Catalyst ``rlike`` filter over the ``url`` column — it stays JVM-side and
prunes at the scan.
"""

from __future__ import annotations

import re

# Chars invalid in the reference's SearchPattern (SearchPattern.cs:63-67)
# minus path separators and ':' — document ids here are urls, which the
# reference itself anticipates (DocumentInfo.cs:33-37).
_INVALID = set('<>"|')


def glob_to_regex(pattern: str, anchored: bool = True,
                  case_insensitive: bool = True) -> str:
    """Compile a '*'/'?' glob to a regex string usable with F.col.rlike."""
    if not pattern:
        raise ValueError("empty glob pattern")
    bad = _INVALID.intersection(pattern)
    if bad:
        raise ValueError(f"invalid characters in glob pattern: {sorted(bad)}")
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    body = "".join(out)
    if anchored:
        body = f"^{body}$"
    if case_insensitive:
        # (?iu), not (?i): the pattern executes under Java regex
        # (rlike), where CASE_INSENSITIVE alone is US-ASCII-only —
        # 'CAFÉ*' would match 'CAFÉ-menu' but silently not 'café-menu'.
        # UNICODE_CASE restores the reference's .NET IgnoreCase
        # semantics; Python's re accepts the 'u' flag too, so the same
        # string works in both engines.
        body = f"(?iu){body}"
    return body


def glob_filter(df, column: str, pattern: str):
    """Filter a DataFrame by glob over a string column (pushdown-friendly)."""
    from pyspark.sql import functions as F

    return df.where(F.col(column).rlike(glob_to_regex(pattern)))
