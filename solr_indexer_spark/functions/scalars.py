"""String / date / id scalar functions — the complete SURVEY §2.6
function list re-expressed as JVM-side column expressions (no UDFs).

Each function cites the reference implementation it matches
(paths relative to /root/reference/).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SOLR_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def to_solr_id(col) -> Column:
    """':' '/' '.' each → '-' (solrindexer/tools.py:139-147, applied to
    doc ids at mmd.py:1138 and parent refs at indexer.py:381-383)."""
    return F.translate(F.col(col) if isinstance(col, str) else col,
                       ":/.", "---")


def parse_date(col) -> Column:
    """Multi-format date string → canonical 'yyyy-MM-ddTHH:mm:ssZ'
    (solrindexer/tools.py:150-185: regex fast path, fallback parse,
    tz-strip retry → the Spark rendering is a try_to_timestamp
    coalesce chain)."""
    c = F.col(col) if isinstance(col, str) else col
    ts = F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )
    return F.date_format(ts, SOLR_DATE_FMT)


def check_date_format(col) -> Column:
    """Regex gate for already-canonical dates
    (solrindexer/tools.py:188-193, regex at tools.py:53-55)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")


def date_range_string(start, end) -> Column:
    """'[start TO end]' Solr DateRangeField syntax; open end → '*'
    (solrindexer/mmd.py:407-428)."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.concat(F.lit("["), s, F.lit(" TO "),
                    F.coalesce(e, F.lit("*")), F.lit("]"))


def parse_date_range(col) -> Column:
    """'[a TO b]' → struct(start, end); '*' → null
    (parse regex at solrindexer/indexer.py:203)."""
    c = F.col(col) if isinstance(col, str) else col
    start = F.regexp_extract(c, r"^\[(.+) TO (.+)\]$", 1)
    end = F.regexp_extract(c, r"^\[(.+) TO (.+)\]$", 2)
    return F.struct(
        F.nullif(F.nullif(start, F.lit("")), F.lit("*")).alias("start"),
        F.nullif(F.nullif(end, F.lit("")), F.lit("*")).alias("end"))


def temporal_range_valid(start_ts, end_ts) -> Column:
    """Sanity gate: reject start > end; open/missing end passes
    (solrindexer/indexer.py:177-222 _validate_temporal_ranges)."""
    s = F.col(start_ts) if isinstance(start_ts, str) else start_ts
    e = F.col(end_ts) if isinstance(end_ts, str) else end_ts
    return e.isNull() | s.isNull() | (s <= e)


def extract_doi(col) -> Column:
    """DOI regex extraction (solrindexer/mmd.py:1121-1131); empty → null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(
        F.regexp_extract(c, r"(10\.\d{4,9}/[-._;()/:A-Za-z0-9]+)", 1),
        F.lit(""))


def http_to_https(col, host_pattern: str = r"^http://") -> Column:
    """URL scheme rewrite (NERSC fix, solrindexer/tools.py:222-226)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, host_pattern, "https://")


def strip_prefixes(col, prefixes: list[str]) -> Column:
    """Chained prefix strip (NPI parent-ref rewrite,
    solrindexer/indexer.py:362-371)."""
    c = F.col(col) if isinstance(col, str) else col
    for p in prefixes:
        c = F.regexp_replace(c, f"^{p}", "")
    return c


def empty_to_null(col) -> Column:
    """Whitespace strip + empty→null (solrindexer/mmd.py:193-197)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.trim(c), F.lit(""))


def first_or_scalar(col) -> Column:
    """First-of-list-or-scalar (solrindexer/tools.py:388-401)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(c, 1)


def multilang_pick(pairs, lang_prefix: str) -> Column:
    """(lang, value) struct array → first value whose lang matches the
    prefix (solrindexer/mmd.py:338-354 _set_multilang: title_en/_no/
    default columns)."""
    c = F.col(pairs) if isinstance(pairs, str) else pairs
    matched = F.filter(c, lambda x: x["lang"].startswith(lang_prefix))
    return F.element_at(matched, 1)["value"]


def append_multivalued(*cols) -> Column:
    """Order-preserving multivalued merge + dedup, empties skipped
    (solrindexer/mmd.py:209-221 _append_multivalued)."""
    arrs = [F.col(c) if isinstance(c, str) else c for c in cols]
    merged = F.concat(*arrs)
    no_empty = F.filter(merged, lambda x: x.isNotNull() & (F.trim(x) != ""))
    return F.array_distinct(no_empty)   # array_distinct keeps first-seen order


def sorted_set(col) -> Column:
    """sorted(set(xs)) for facets/names/DOIs
    (solrindexer/mmd.py:619-627, 925-929, 1066-1067)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_sort(F.array_distinct(c))


# ---------------------------------------------------------------------------
# Reference-specific enrichment scalars (SURVEY §2.6 remaining rows)
# ---------------------------------------------------------------------------

SENTINEL_RE = r"^S[1-5][ABCP]_.*"


def sentinel_split(col) -> Column:
    """Sentinel product-string detect + '_'-split
    (solrindexer/mmd.py:1100-1119 _is_sentinel_product): array of
    components when the string matches ^S[1-5][ABCP]_, else null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike(SENTINEL_RE), F.split(c, "_")) \
        .otherwise(F.lit(None).cast("array<string>"))


NBS_PROD_RE = r"(\w\d\w)/(\d{4})/(\d{2})/(\d{2})(?:/(IW|EW))?/(.+)\.zip"


def nbs_product_parse(col) -> Column:
    """NBS product-path regex, 6 groups (solrindexer/tools.py:334-379
    add_nbs_thumbnail): (product, year, month, day, mode, fname) struct;
    all-null struct when the url does not match. The reference's
    ``(?:/(IW|EW))?`` optional mode group is preserved — S1 products
    carry it, others leave it empty."""
    c = F.col(col) if isinstance(col, str) else col
    matched = c.rlike(NBS_PROD_RE)
    def g(i):
        return F.when(matched,
                      F.nullif(F.regexp_extract(c, NBS_PROD_RE, i),
                               F.lit("")))
    return F.struct(g(1).alias("product"), g(2).alias("year"),
                    g(3).alias("month"), g(4).alias("day"),
                    g(5).alias("mode"), g(6).alias("fname"))


def nbs_thumbnail_url(col, base_url: str) -> Column:
    """Thumbnail URL composition from the parsed NBS path
    (tools.py:355-376): S1* products include the /IW|EW/ mode segment,
    others omit it. (The reference's filesystem existence probe is IO
    outside the engine — SURVEY scopes it out; composition is the
    data-parallel part.)"""
    p = nbs_product_parse(col)
    s1 = (p["product"].startswith("S1"))
    with_mode = F.concat(F.lit(base_url), F.lit("/"), p["product"],
                         F.lit("/"), p["year"], F.lit("/"), p["month"],
                         F.lit("/"), p["day"], F.lit("/"), p["mode"],
                         F.lit("/ql/"), p["fname"],
                         F.lit("/thumbnail.png"))
    no_mode = F.concat(F.lit(base_url), F.lit("/"), p["product"],
                       F.lit("/"), p["year"], F.lit("/"), p["month"],
                       F.lit("/"), p["day"],
                       F.lit("/ql/"), p["fname"], F.lit("/thumbnail.png"))
    return F.when(p["product"].isNull(), F.lit(None).cast("string")) \
        .when(s1, with_mode).otherwise(no_mode)


def to_json_compact(col) -> Column:
    """Compact JSON serialize, byte-compatible with the reference's
    json.dumps(..., ensure_ascii=False, separators=(',', ':'))
    (solrindexer/mmd.py:379-383 and 4 sibling call sites):
    no whitespace, UTF-8 kept unescaped, null fields PRESERVED
    (Spark's default drops them; the reference pre-filters empties but
    serializes explicit nulls)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(c, {"ignoreNullFields": "false"})
