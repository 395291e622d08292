"""Pig string builtins (reference: src/org/apache/pig/builtin/ —
CONCAT.java, SUBSTRING.java, REGEX_EXTRACT.java, TOKENIZE.java, ...).

All JVM-side Column expressions (whole-stage codegen), no Python UDFs.
Semantics notes follow each Pig class's exec() contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def CONCAT(*cols: Column) -> Column:
    """CONCAT.java — null if any input null (unlike SQL CONCAT_WS).
    Literal str/num args coerce to columns (CONCAT(name, '!') is
    everyday Pig)."""
    return F.concat(*[c if isinstance(c, Column) else F.lit(c) for c in cols])


def STARTSWITH(col: Column, prefix: Column | str) -> Column:
    return F.startswith(col, F.lit(prefix) if isinstance(prefix, str) else prefix)


def ENDSWITH(col: Column, suffix: Column | str) -> Column:
    return F.endswith(col, F.lit(suffix) if isinstance(suffix, str) else suffix)


def EqualsIgnoreCase(a: Column, b: Column) -> Column:
    return F.lower(a) == F.lower(b)


def INDEXOF(col: Column, search: str, start: int = 0) -> Column:
    """INDEXOF.java — 0-based index of first occurrence at/after start,
    -1 if absent (Java String.indexOf)."""
    return F.locate(search, col, pos=start + 1) - 1


def LAST_INDEX_OF(col: Column, search: str) -> Column:
    """LAST_INDEX_OF.java — 0-based index of last occurrence, -1 absent."""
    rev = F.locate(search[::-1], F.reverse(col))
    return F.when(rev == 0, F.lit(-1)).otherwise(F.length(col) - rev - len(search) + 1)


def LCFIRST(col: Column) -> Column:
    return F.concat(F.lower(F.substring(col, 1, 1)), col.substr(F.lit(2), F.length(col)))


def UCFIRST(col: Column) -> Column:
    return F.concat(F.upper(F.substring(col, 1, 1)), col.substr(F.lit(2), F.length(col)))


LOWER = F.lower
UPPER = F.upper
LTRIM = F.ltrim
RTRIM = F.rtrim
TRIM = F.trim


def REGEX_EXTRACT(col: Column, pattern: str, group: int) -> Column:
    """REGEX_EXTRACT.java — null when no match (Spark's regexp_extract
    returns '' — shim to Pig's null)."""
    extracted = F.regexp_extract(col, pattern, group)
    return F.when(col.rlike(pattern), extracted).otherwise(F.lit(None))


def REGEX_SEARCH(col: Column, pattern: str) -> Column:
    """REGEX_SEARCH.java — boolean 'pattern found anywhere'."""
    return col.rlike(pattern)


def MATCHES(col: Column, pattern: str) -> Column:
    """Pig `x MATCHES 'p'` (QueryParser.g:1071) — full-string match."""
    return col.rlike(f"^(?:{pattern})$")


def REPLACE(col: Column, pattern: str, replacement: str) -> Column:
    """REPLACE.java — regex replace-all (Java String.replaceAll)."""
    return F.regexp_replace(col, pattern, replacement)


def SPRINTF(fmt: str, *cols: Column) -> Column:
    """SPRINTF.java → format_string."""
    return F.format_string(fmt, *cols)


def STRSPLIT(col: Column, pattern: str = "\\s+", limit: int = -1) -> Column:
    """STRSPLIT.java — returns a tuple in Pig; array<string> here."""
    return F.split(col, pattern, limit)


def STRSPLITTOBAG(col: Column, pattern: str = "\\s+", limit: int = -1) -> Column:
    """STRSPLITTOBAG.java — bag of single-field tuples."""
    return F.transform(F.split(col, pattern, limit), lambda t: F.struct(t.alias("token")))


def SUBSTRING(col: Column, start: int, stop: int) -> Column:
    """SUBSTRING.java — Java semantics: 0-based start, exclusive stop."""
    return F.substring(col, start + 1, stop - start)


# TOKENIZE.java:45 delimiters: space, double-quote, comma, parens, star
_TOKENIZE_DELIMS = "[ \",()*]+"


def TOKENIZE(col: Column, delims: str | None = None) -> Column:
    """TOKENIZE.java — split chararray into a bag of (token) tuples.
    Returned here as array<string> (FLATTEN → explode)."""
    pattern = f"[{delims}]+" if delims else _TOKENIZE_DELIMS
    toks = F.split(F.trim(col), pattern)
    return F.filter(toks, lambda t: t != "")


def REGEX_EXTRACT_ALL(col: Column, pattern: str) -> Column:
    """REGEX_EXTRACT_ALL.java — tuple of all capture groups (null when
    no match). Pig defaults to useMatches=true, i.e. the pattern must
    match the ENTIRE input (Matcher.matches(), REGEX_EXTRACT_ALL.java
    exec): anchor with a non-capturing wrapper so group numbering is
    preserved while substring-only matches return null, as in Pig."""
    import re as _re

    n_groups = _re.compile(pattern).groups
    anchored = f"^(?:{pattern})$"
    extracted = F.array(*[F.regexp_extract(col, anchored, g + 1) for g in range(n_groups)])
    return F.when(col.rlike(anchored), extracted)
