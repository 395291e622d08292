"""Piggybank evaluation functions (contrib/piggybank/.../evaluation/)
not already covered by the core builtin modules: the math extras
(ATAN2..toRadians — piggybank/evaluation/math/), string extras
(Reverse, Stuff, REPLACE_MULTI, HashFNV, LookupInFiles —
evaluation/string/), ISO datetime convert/diff/truncate families
(evaluation/datetime/), decode.{Decode,Bin,BinCond}, the type-check
filters (IsInt.java etc.), the extremal-tuple aggregates, XPath,
util.SearchQuery, and the apachelogparser Host/Date extractors (r7).

Everything here is a pure Column expression (whole-stage codegen, no
Python on the executor path) — including HashFNV, whose FNV-1 fold
runs as an ``aggregate`` over the string's UTF-8 bytes in JVM land.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ----------------------------------------------------------------------
# math (piggybank/evaluation/math/*.java — Java Math semantics)
# ----------------------------------------------------------------------

ATAN2 = F.atan2  # ATAN2.java
POW = F.pow  # POW.java (Math.pow — double result)
HYPOT = F.hypot  # HYPOT.java
EXPM1 = F.expm1  # EXPM1.java
LOG1P = F.log1p  # LOG1P.java
RINT = F.rint  # RINT.java (round half to even, like Math.rint)
SIGNUM = F.signum  # SIGNUM.java / DoubleSignum.java
toDegrees = F.degrees  # toDegrees.java
toRadians = F.radians  # toRadians.java


def IEEEremainder(x: Column, y: Column) -> Column:
    """IEEEremainder.java — Math.IEEEremainder: x - y*rint(x/y)."""
    return x - y * F.rint(x / y)


def SCALB(x: Column, n: Column | int) -> Column:
    """SCALB.java — Math.scalb: x * 2**n (exact for in-range n)."""
    n_col = F.lit(n) if isinstance(n, int) else n
    return x * F.pow(F.lit(2.0), n_col.cast("double"))


def copySign(x: Column, y: Column) -> Column:
    """copySign.java — magnitude of x with the sign of y.

    Codegen approximation of Math.copySign: the sign is read through
    ``signum`` so the IEEE -0.0/NaN-sign corners collapse to +
    (bit-level sign transfer needs raw double bits, unavailable in
    Column algebra)."""
    return F.when(F.signum(y) < 0, -F.abs(x)).otherwise(F.abs(x))


def getExponent(x: Column) -> Column:
    """getExponent.java — Math.getExponent: unbiased base-2 exponent.

    Exact for normal doubles (floor(log2|x|)); subnormals/0/inf return
    the log-derived value rather than Double.MIN_EXPONENT-1 sentinels."""
    return F.floor(F.log(2.0, F.abs(x))).cast("int")


def ULP(x: Column) -> Column:
    """ULP.java — Math.ulp: 2**(getExponent(x) - 52) for normal doubles."""
    return F.pow(F.lit(2.0), (F.floor(F.log(2.0, F.abs(x))) - F.lit(52)).cast("double"))


def NEXTUP(x: Column) -> Column:
    """NEXTUP.java — next double toward +inf: x + ulp(x) (normal range)."""
    return x + ULP(x)


def nextAfter(x: Column, direction: Column) -> Column:
    """nextAfter.java — next double from x toward direction (normal
    range; exact-boundary corners approximate, as for NEXTUP)."""
    return (
        F.when(direction > x, x + ULP(x))
        .when(direction < x, x - ULP(x))
        .otherwise(direction)
    )


# ----------------------------------------------------------------------
# string (piggybank/evaluation/string/)
# ----------------------------------------------------------------------

Reverse = F.reverse  # Reverse.java
LENGTH = F.length  # LENGTH.java


def Stuff(col: Column, start: Column | int, length: Column | int, replacement: Column | str) -> Column:
    """Stuff.java — splice ``replacement`` over ``length`` chars of
    ``col`` starting at 0-based ``start``. Out-of-range start (which
    Stuff.java turns into a job-killing IOException) yields null here
    (Pig's warn-and-null convention for bad scalar input)."""
    s = F.lit(start) if isinstance(start, int) else start
    n = F.lit(length) if isinstance(length, int) else length
    rep = F.lit(replacement) if isinstance(replacement, str) else replacement
    head = col.substr(F.lit(1), s)
    tail = col.substr(s + n + 1, F.length(col))
    spliced = F.concat(head, rep, tail)
    return F.when((s >= 0) & (s < F.length(col)) & (n >= 0), spliced)


def REPLACE_MULTI(col: Column, replacements: dict[str, str]) -> Column:
    """REPLACE_MULTI.java — apply a set of literal search→replace
    pairs. Single-char pairs collapse to one ``translate`` (true
    single-pass); multi-char pairs chain literal replaces in dict
    order, so a later pair can see an earlier pair's output (the Java
    UDF walks the map in iteration order the same way)."""
    singles = {k: v for k, v in replacements.items() if len(k) == 1 and len(v) <= 1}
    multis = {k: v for k, v in replacements.items() if k not in singles}
    out = col
    if singles:
        out = F.translate(out, "".join(singles), "".join(singles[k] for k in singles))
    for k, v in multis.items():
        out = F.replace(out, F.lit(k), F.lit(v))
    return out


#: FNV-1 32-bit constants from HashFNV.java (custom init, standard prime)
_FNV1_32_INIT = 33554467
_FNV_32_PRIME = 0x01000193
_MOD32 = 1 << 32


def _utf8_bytes(col: Column) -> Column:
    """UTF-8 byte values (0..255) of a string as array<int>, computed
    in codegen: per-character code points via ``ascii`` then manual
    UTF-8 encoding arithmetic (BMP range — 1/2/3-byte forms)."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    cps = F.transform(chars, lambda c: F.ascii(c))

    def shr(cp: Column, k: int) -> Column:  # cp >> k for non-negative cp
        return F.floor(cp / F.lit(1 << k)).cast("int")

    return F.flatten(
        F.transform(
            cps,
            lambda cp: F.when(cp < 0x80, F.array(cp))
            .when(
                cp < 0x800,
                F.array(
                    F.lit(0xC0).bitwiseOR(shr(cp, 6)),
                    F.lit(0x80).bitwiseOR(cp.bitwiseAND(F.lit(0x3F))),
                ),
            )
            .when(
                cp < 0x10000,
                F.array(
                    F.lit(0xE0).bitwiseOR(shr(cp, 12).bitwiseAND(F.lit(0x0F))),
                    F.lit(0x80).bitwiseOR(shr(cp, 6).bitwiseAND(F.lit(0x3F))),
                    F.lit(0x80).bitwiseOR(cp.bitwiseAND(F.lit(0x3F))),
                ),
            )
            .otherwise(
                # astral plane: 4-byte form (Java encodes the code
                # point's surrogate pair to the same 4 UTF-8 bytes)
                F.array(
                    F.lit(0xF0).bitwiseOR(shr(cp, 18).bitwiseAND(F.lit(0x07))),
                    F.lit(0x80).bitwiseOR(shr(cp, 12).bitwiseAND(F.lit(0x3F))),
                    F.lit(0x80).bitwiseOR(shr(cp, 6).bitwiseAND(F.lit(0x3F))),
                    F.lit(0x80).bitwiseOR(cp.bitwiseAND(F.lit(0x3F))),
                )
            ),
        )
    )


def _hashfnv32_raw(col: Column) -> Column:
    """HashFNV.hashFnv32 — the raw FNV-1 32-bit fold over the string's
    UTF-8 bytes with Pig's custom init (33554467), as the SIGN-EXTENDED
    int in a long (int overflow wraps mod 2^32; each byte is XORed
    sign-extended). Pure codegen: ``aggregate`` folds the byte array
    JVM-side — no Python, no shuffle."""
    bytes_arr = _utf8_bytes(col)
    folded = F.aggregate(
        bytes_arr,
        F.lit(_FNV1_32_INIT).cast("long"),
        lambda acc, b: (
            (acc * F.lit(_FNV_32_PRIME)) % F.lit(_MOD32)
        ).bitwiseXOR(
            F.when(b >= 0x80, F.lit(0xFFFFFF00).bitwiseOR(b)).otherwise(b.cast("long"))
        )
        % F.lit(_MOD32),
    )
    return F.when(folded >= F.lit(1 << 31), folded - F.lit(_MOD32)).otherwise(folded)


def HashFNV(col: Column, mod: Column | int | None = None) -> Column:
    """HashFNV.java's USER-VISIBLE surface: the base class dispatches
    by arity to HashFNV1/HashFNV2, both of which negate a negative
    fold (`if (v < 0) v = -v` — HashFNV1.java:41, HashFNV2.java:46)
    and the 2-arg form additionally takes the result mod its second
    parameter when positive. r7 fix: the previous implementation
    returned the raw sign-extended fold, which real Pig never exposes."""
    v = F.abs(_hashfnv32_raw(col))
    if mod is None:
        return v
    m = F.lit(mod) if isinstance(mod, int) else mod
    return F.when(m > 0, v % m).otherwise(v)


def HashFNV1(col: Column) -> Column:
    """HashFNV1.java — the 1-arg dispatch target of HashFNV."""
    return HashFNV(col)


def HashFNV2(col: Column, mod: Column | int) -> Column:
    """HashFNV2.java — the 2-arg (string, mod) dispatch target."""
    return HashFNV(col, mod)


def LookupInFiles(col: Column, *paths: str) -> Column:
    """LookupInFiles.java — 1 when the value appears (as a full line)
    in any of the given files, else 0. The files are Pig distributed-
    cache lookup lists — small by contract — so they are read once
    driver-side and inlined as a literal IN set (broadcast by the
    plan), exactly the Java UDF's per-task in-memory map."""
    keys: set[str] = set()
    for p in paths:
        with open(p, encoding="utf-8") as fh:
            keys.update(line.rstrip("\n") for line in fh)
    return F.when(col.cast("string").isin(*sorted(keys)), 1).otherwise(0)


# ----------------------------------------------------------------------
# datetime convert / diff / truncate (piggybank/evaluation/datetime/)
# ----------------------------------------------------------------------


def DiffDate(date1: Column, date2: Column) -> Column:
    """DiffDate.java — whole days between two 'yyyyMMdd' strings
    ((date1 - date2) / 86400000, truncated toward zero)."""
    d1 = F.to_date(date1, "yyyyMMdd")
    d2 = F.to_date(date2, "yyyyMMdd")
    return F.datediff(d1, d2).cast("int")


def ISOToUnix(col: Column) -> Column:
    """convert/ISOToUnix.java — ISO datetime string → epoch millis."""
    return F.floor(F.unix_micros(F.to_timestamp(col)) / 1000).cast("long")


def UnixToISO(col: Column) -> Column:
    """convert/UnixToISO.java — epoch millis → ISO-8601 string (UTC)."""
    ts = F.timestamp_millis(col.cast("long"))
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")


def CustomFormatToISO(col: Column, fmt: str) -> Column:
    """convert/CustomFormatToISO.java — parse with a custom pattern,
    emit ISO-8601."""
    return F.date_format(F.to_timestamp(col, fmt), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")


def _iso_between(unit: str):
    def between(end: Column, start: Column) -> Column:
        e, s = F.to_timestamp(end), F.to_timestamp(start)
        if unit == "years":
            return (F.floor(F.months_between(e, s) / 12)).cast("long")
        if unit == "months":
            return F.floor(F.months_between(e, s)).cast("long")
        secs = F.unix_timestamp(e) - F.unix_timestamp(s)
        div = {"days": 86400, "hours": 3600, "minutes": 60, "seconds": 1}[unit]
        return (secs / div).cast("long")

    return between


ISOYearsBetween = _iso_between("years")  # diff/ISOYearsBetween.java
ISOMonthsBetween = _iso_between("months")
ISODaysBetween = _iso_between("days")
ISOHoursBetween = _iso_between("hours")
ISOMinutesBetween = _iso_between("minutes")
ISOSecondsBetween = _iso_between("seconds")


def _iso_trunc(unit: str, out_fmt: str = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"):
    def trunc(col: Column) -> Column:
        return F.date_format(F.date_trunc(unit, F.to_timestamp(col)), out_fmt)

    return trunc


ISOToYear = _iso_trunc("year")  # truncate/ISOToYear.java
ISOToMonth = _iso_trunc("month")
ISOToWeek = _iso_trunc("week")
ISOToDay = _iso_trunc("day")
ISOToHour = _iso_trunc("hour")
ISOToMinute = _iso_trunc("minute")
ISOToSecond = _iso_trunc("second")


# ----------------------------------------------------------------------
# decode (piggybank/evaluation/decode/)
# ----------------------------------------------------------------------


def Decode(col: Column, *args) -> Column:
    """decode/Decode.java — Decode(x, k1, v1, ..., default): first v_i
    whose k_i equals x, else the default; null x → null."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("Decode(x, key1, val1, ..., default) needs matched pairs + default")
    pairs, default = args[:-1], args[-1]
    out = F.lit(default)
    for i in range(len(pairs) - 2, -1, -2):
        out = F.when(col == F.lit(pairs[i]), F.lit(pairs[i + 1])).otherwise(out)
    return F.when(col.isNull(), F.lit(None)).otherwise(out)


def Bin(col: Column, *args) -> Column:
    """decode/Bin.java — Bin(x, label1, bound1, ..., labelN): label_i
    for the first bound with x <= bound_i; the last label catches
    everything above all bounds; null x → null."""
    if len(args) < 2 or len(args) % 2 == 0:
        raise ValueError("Bin(x, label1, bound1, ..., default_label) needs label/bound pairs + default")
    out = F.lit(args[-1])
    for i in range(len(args) - 3, -1, -2):
        out = F.when(col <= F.lit(args[i + 1]), F.lit(args[i])).otherwise(out)
    return F.when(col.isNull(), F.lit(None)).otherwise(out)


# ----------------------------------------------------------------------
# type-check filters (evaluation/Is*.java) + extremal tuples
# ----------------------------------------------------------------------

_INT_RE = r"^[+-]?\d+$"
_FLOAT_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?[fF]?$"


def IsInt(col: Column) -> Column:
    """IsInt.java — parseable as a 32-bit int (digits + range check)."""
    return col.rlike(_INT_RE) & col.try_cast("int").isNotNull()


def IsLong(col: Column) -> Column:
    """IsLong.java — parseable as a 64-bit long (trailing l/L allowed)."""
    stripped = F.regexp_replace(col, "[lL]$", "")
    return stripped.rlike(_INT_RE) & stripped.try_cast("long").isNotNull()


def IsFloat(col: Column) -> Column:
    """IsFloat.java — parseable as float (Java Float.parseFloat shape)."""
    return col.rlike(_FLOAT_RE) & col.try_cast("float").isNotNull()


def IsDouble(col: Column) -> Column:
    """IsDouble.java — parseable as double."""
    return col.rlike(_FLOAT_RE) & col.try_cast("double").isNotNull()


def IsNumeric(col: Column) -> Column:
    """IsNumeric.java — IsInt OR IsLong OR IsFloat OR IsDouble."""
    return IsInt(col) | IsLong(col) | IsFloat(col) | IsDouble(col)


def ExtremalTupleByField(bag: Column, field: str, how: str = "max") -> Column:
    """ExtremalTupleByNthField.java — the tuple of a bag (array of
    structs) whose ``field`` is extremal. Pig's constructor takes the
    1-based field *index*; Column algebra has no positional struct
    access, so this takes the field *name* (the Latin front-end
    resolves ``$n`` positions to names from the schema). Codegen
    ``aggregate`` fold — linear, no explode."""
    if how not in ("max", "min"):
        raise ValueError(f"how must be 'max' or 'min', got {how!r}")
    gt = (lambda a, b: a > b) if how == "max" else (lambda a, b: a < b)
    return F.aggregate(
        bag,
        F.element_at(bag, 1),
        lambda acc, x: F.when(gt(x[field], acc[field]), x).otherwise(acc),
    )


def MaxTupleBy1stField(bag: Column, field: str) -> Column:
    """MaxTupleBy1stField.java — ExtremalTupleByField over the first
    field (caller names it; see ExtremalTupleByField)."""
    return ExtremalTupleByField(bag, field, "max")


# ----------------------------------------------------------------------
# xml (evaluation/xml/XPath.java, XPathAll.java)
# ----------------------------------------------------------------------


def XPath(col: Column, path: str) -> Column:
    """xml/XPath.java — first string value matching the XPath
    expression (Spark-native ``xpath_string``)."""
    return F.xpath_string(col, F.lit(path))


def XPathAll(col: Column, path: str) -> Column:
    """xml/XPathAll.java — every match, as a bag of strings
    (Spark-native ``xpath``)."""
    return F.xpath(col, F.lit(path))


# ----------------------------------------------------------------------
# deprecated piggybank string spellings (string/Split.java,
# RegexExtract.java, RegexExtractAll.java, RegexMatch.java) — thin
# aliases real Pig ships for back-compat; scripts still use them
# ----------------------------------------------------------------------


def Split(col: Column, *args) -> Column:
    """string/Split.java — `public class Split extends STRSPLIT {}`."""
    from .string import STRSPLIT

    return STRSPLIT(col, *args)


def RegexExtract(col: Column, pattern: str, group: int) -> Column:
    """string/RegexExtract.java — deprecated REGEX_EXTRACT alias."""
    from .string import REGEX_EXTRACT

    return REGEX_EXTRACT(col, pattern, group)


def RegexExtractAll(col: Column, pattern: str) -> Column:
    """string/RegexExtractAll.java — deprecated REGEX_EXTRACT_ALL alias."""
    from .string import REGEX_EXTRACT_ALL

    return REGEX_EXTRACT_ALL(col, pattern)


def RegexMatch(col: Column, pattern: str) -> Column:
    """string/RegexMatch.java — INT 1 when the string contains the
    regex, 0 otherwise, null in → null out (unlike boolean MATCHES,
    which anchors the whole string)."""
    hit = F.regexp_like(col, F.lit(pattern))
    return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(hit.cast("int"))


def BinCond(*args: Column) -> Column:
    """decode/BinCond.java — ``BinCond(cond1, val1, cond2, val2, ...,
    default)``: the first true condition's value, else the default
    (a CASE WHEN chain, pure codegen). Java returns null when the
    FIRST condition is null; later-condition nulls follow SQL CASE
    (skip to the next arm) rather than Java's job-killing NPE."""
    if len(args) < 3 or len(args) % 2 != 1:
        raise ValueError(
            "BinCond : UDF requires atleast one condition, mapping string & a default string."
        )
    *pairs, default = args
    expr = None
    for i in range(0, len(pairs), 2):
        expr = (F.when if expr is None else expr.when)(pairs[i], pairs[i + 1])
    first = pairs[0]
    return F.when(first.isNull(), F.lit(None).cast("string")).otherwise(
        expr.otherwise(default)
    )


def SearchQuery(col: Column) -> Column:
    """util/SearchQuery.java — extract the search-term string from a
    referrer URL: lowercase+trim, pull the q= / p= / as_q= / as_p=
    parameter (the IDENTICAL Java lookbehind regex — Spark regexes run
    on the JVM), URL-decode, strip punctuation, collapse whitespace,
    cap at 80 chars. Pure codegen, map-only."""
    url = F.lower(F.trim(col))
    q = F.regexp_extract(url, r"(?<=([\&\?](as_)?[pq]=)).*?(\z|(?=[\&\"]))", 0)
    decoded = F.url_decode(q)
    cleaned = F.regexp_replace(F.regexp_replace(decoded, r"[\p{Punct}]+", ""), r"[\s]+", " ")
    out = F.substring(F.trim(cleaned), 1, 80)
    # matcher.find() failing leaves query null; empty/null URL returns
    # as-is. regexp_extract returns '' for BOTH no-match and an
    # empty-but-present parameter ('?q=&x=1') — the Java matcher.find()
    # succeeds on the latter and returns the processed empty string, so
    # distinguish the cases by probing for the parameter marker itself.
    # The short-circuit matches Java's isEmpty() EXACTLY: only null/''
    # pass through — a whitespace-only URL is NOT empty, so it falls
    # into the matcher, finds no parameter, and returns null.
    has_param = url.rlike(r"[&?](as_)?[pq]=")
    return (
        F.when(col.isNull() | (col == ""), url)
        .when(~has_param, F.lit(None).cast("string"))
        .otherwise(out)
    )


def HostExtractor(col: Column) -> Column:
    """util/apachelogparser/HostExtractor.java — the lowercased host
    of a URL; null in / unparseable → null (parse_url is JVM-side)."""
    return F.lower(F.parse_url(col, F.lit("HOST")))


def DateExtractor(
    col: Column,
    out_fmt: str = "yyyy-MM-dd",
    in_fmt: str = "dd/MMM/yyyy:HH:mm:ss Z",
) -> Column:
    """util/apachelogparser/DateExtractor.java — reformat an apache
    common-log timestamp ("dd/MMM/yyyy:HH:mm:ss Z" by default) to
    ``out_fmt`` in GMT (the Java UDF's default zone); unparseable →
    null (SimpleDateFormat.parse failure path).

    date_format renders in spark.sql.session.timeZone, so shift the
    instant by -offset(session tz) first: the session rendering of the
    shifted value IS the GMT wall time, in ANY session timezone (not
    just the UTC this package's session.py pins)."""
    ts = F.to_timestamp(col, in_fmt)
    return F.date_format(
        F.to_utc_timestamp(ts, F.expr("current_timezone()")), out_fmt
    )


#: representative engine-domain table for SearchEngineExtractor —
#: the Java UDF ships a ~200-row static map
#: (util/apachelogparser/SearchEngineExtractor.java); this port keeps
#: the LOOKUP MECHANICS identical (EXACT key match after lowercasing
#: and stripping one leading "www." — subdomains like maps.google.com
#: do NOT match, add them as their own rows) over the majors and stays
#: user-extensible: pass your own dict to cover a fleet's full
#: referrer population.
SEARCH_ENGINES: dict[str, str] = {
    "google.com": "Google",
    "blogsearch.google.com": "Google Blogsearch",
    "images.google.com": "Google Images",
    "news.google.com": "Google News",
    "search.yahoo.com": "Yahoo!",
    "images.search.yahoo.com": "Yahoo! Images",
    "bing.com": "Bing",
    "search.msn.com": "MSN Search",
    "search.live.com": "Live Search",
    "ask.com": "Ask dot com",
    "search.aol.com": "AOL Search",
    "duckduckgo.com": "DuckDuckGo",
    "baidu.com": "Baidu",
    "yandex.ru": "Yandex",
    "naver.com": "Naver",
    "search.naver.com": "Naver",
    "altavista.com": "Altavista",
    "alltheweb.com": "AllTheWeb",
    "lycos.com": "Lycos",
    "excite.com": "Excite",
    "cuil.com": "Cuil",
    "technorati.com": "Technorati",
}


def SearchEngineExtractor(
    col: Column, engines: dict[str, str] | None = None
) -> Column:
    """util/apachelogparser/SearchEngineExtractor.java:410-412 — map a
    referrer URL's host to a search-engine display name the way the
    Java UDF does: lowercase the host, strip ONE leading "www.", then
    an EXACT map lookup (so maps.google.com → null, exactly like real
    Pig — NOT a suffix match); unknown hosts → null. One literal map
    probed by the normalized host — pure codegen, map-only."""
    table = engines if engines is not None else SEARCH_ENGINES
    host = F.lower(F.parse_url(col, F.lit("HOST")))
    stripped = F.regexp_replace(host, r"^www\.", "")
    lookup = F.create_map(
        *[F.lit(x) for domain, name in table.items() for x in (domain, name)]
    )
    return lookup[stripped]


def SearchTermExtractor(col: Column) -> Column:
    """util/apachelogparser/SearchTermExtractor.java — the search terms
    from a recognized engine's referrer URL. The Java UDF keys the
    query-param name per engine; the majors all use q= or p=, which is
    exactly :func:`SearchQuery`'s extraction — reused here, gated on
    the host being a known engine."""
    known = SearchEngineExtractor(col).isNotNull()
    return F.when(known, SearchQuery(col))
