"""Date subsystem (SURVEY.md §2.8 F1-F6, §2.2 P2/P4).

Everything here is a **native Catalyst expression** — no Python UDFs in
the hot path. The semantics mirror the reference's documented intent:

- bad-format rejection regexes: reference ``whalefinder/validate.py:49-62``
- lenient parse of accepted formats: reference ``validate.py:37-63``
- ISO-validity predicate: reference ``cleaner.py:160-168``
- messy-date normalizer ``split_dates``: reference ``cleaner.py:76-158``
  (the reference's textual-month branch has a latent
  ``datetime.strptime`` AttributeError at ``cleaner.py:107``; per
  SURVEY §7.3.2 we implement the documented intent, i.e. the strptime
  cascade as written).

A pure-Python twin of the spec (:func:`split_dates_py`) is the unit /
property-test oracle, and :func:`split_dates_duckdb_sql` emits the same
cascade as DuckDB SQL so the driver's oracle runs the identical spec.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from whale_sightings_spark.schemas import DATE_PARTS_FIELDS

# ---------------------------------------------------------------------------
# P2: bad-format rejection regexes (reference validate.py:49-62).
# Python re.match anchors at the start only -> translate to ^pattern
# (no trailing $ except where the reference pattern has one implicitly
# via full-string structure; re.match('^\d{4}-\d{1,2}$') etc. already
# carry $ in the reference).
# ---------------------------------------------------------------------------

BAD_DATE_FORMATS: tuple[str, ...] = (
    r"^\d{4}-\d{1,2}$",       # 1990-03
    r"^\d{1,2}-\d{4}$",       # 03-1990
    r"^\d{1,4}$",             # 1985
    r"^\d{1,2} [A-Za-z]+$",   # 20 Nov
    r"^[A-Za-z]+ \d{1,2}$",   # Oct 15
    r"^[A-Za-z]+ \d{4}$",     # Oct 1970
    r"^\d{4} [A-Za-z]+$",     # 1970 Oct
    r"^.*/.*",                # any '/' character
)


def is_bad_date_format(col: Column) -> Column:
    """True when eventDate matches one of the 8 rejected shapes (P2)."""
    expr = F.lit(False)
    for fmt in BAD_DATE_FORMATS:
        expr = expr | col.rlike(fmt)
    return expr


# ---------------------------------------------------------------------------
# F1: lenient parse chain for accepted formats (reference validate.py:41-47).
# dateutil accepts far more than the docstring; the engine contract is the
# documented accepted set plus common textual with-year forms.
# ---------------------------------------------------------------------------

_ACCEPTED_TS_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm",
    "yyyy-MM-dd HH:mm",
    "MMMM d yyyy",
    "MMM d yyyy",
    "d MMMM yyyy",
    "d MMM yyyy",
)


def parse_event_date(col: Column) -> Column:
    """F1: lenient eventDate parse -> DateType (null when unparseable).

    Timezone tails (``Z``, ``+00``, ``+00:00``) are stripped before the
    format chain — the reference truncates to a date anyway
    (``parse(value).date()``, validate.py:63).
    """
    trimmed = F.trim(col)
    # strip tz tails (Z / +00 / +00:00) — but only when a time component
    # exists, so the day of a plain date is never mistaken for an offset
    stripped = F.when(
        trimmed.rlike(r"\d{2}:\d{2}"),
        F.regexp_replace(trimmed, r"(Z|[+-]\d{2}(:?\d{2})?)$", ""),
    ).otherwise(trimmed)
    parsed = None
    for fmt in _ACCEPTED_TS_FORMATS:
        attempt = F.try_to_timestamp(stripped, F.lit(fmt))
        parsed = attempt if parsed is None else F.coalesce(parsed, attempt)
    return F.to_date(parsed)


def normalize_event_date(col: Column) -> Column:
    """Valid-channel normalization: parsed date serialized back to an ISO
    YYYY-MM-DD *string* (reference model_dump(mode='json'),
    validate.py:178 — see SURVEY §1.4)."""
    return F.date_format(parse_event_date(col), "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# P4: ISO-validity predicate (reference cleaner.py:160-168)
# ---------------------------------------------------------------------------

ISO_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def date_is_valid(col: Column) -> Column:
    """True iff the (string) eventDate is exactly YYYY-MM-DD."""
    return F.coalesce(col.rlike(ISO_DATE_RE), F.lit(False))


# ---------------------------------------------------------------------------
# F2: bare-year padding (reference obis.py:103-122)
# ---------------------------------------------------------------------------

def pad_start_date(col: Column) -> Column:
    """Bare YYYY -> YYYY-01-01; full dates pass through."""
    return F.when(col.rlike(r"^\d{4}$"), F.concat(col, F.lit("-01-01"))).otherwise(col)


def pad_end_date(col: Column) -> Column:
    """Bare YYYY -> YYYY-12-31; full dates pass through."""
    return F.when(col.rlike(r"^\d{4}$"), F.concat(col, F.lit("-12-31"))).otherwise(col)


# ---------------------------------------------------------------------------
# F3: split_dates — the messy-date normalizer (reference cleaner.py:76-158)
# ---------------------------------------------------------------------------

#: lowercase month-name -> month number, abbreviated + full (the reference
#: tries %b then %B strptime formats, cleaner.py:89-98).
MONTHS: dict[str, int] = {
    **{calendar.month_abbr[i].lower(): i for i in range(1, 13)},
    **{calendar.month_name[i].lower(): i for i in range(1, 13)},
}

#: days in month for strptime's default year 1900 (not a leap year) —
#: governs validity of day-month / month-day textual forms.
_DAYS_1900 = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

_ZEROS = (0, 0, 0, 0, 0, 0)


def split_dates_py(date_str: str) -> tuple[int, int, int, int, int, int]:
    """Pure-Python twin of the split_dates spec — the test oracle.

    Documented-intent reimplementation of reference cleaner.py:76-158
    (strptime cascade for textual months; '/'-range, year-range,
    year-month, full-date, bare-year numeric branches; six zeros on
    failure)."""
    s = date_str.replace(",", "").strip(" ")

    # textual-month branch (cleaner.py:81-115 documented intent)
    text_formats = [
        (r"^[A-Za-z]+ \d{4}$", "%b %Y"),
        (r"^\d{4} [A-Za-z]+$", "%Y %b"),
        (r"^\d{1,2} [A-Za-z]+$", "%d %b"),
        (r"^[A-Za-z]+ \d{1,2}$", "%b %d"),
        (r"^[A-Za-z]+ \d{4}$", "%B %Y"),
        (r"^\d{4} [A-Za-z]+$", "%Y %B"),
        (r"^\d{1,2} [A-Za-z]+$", "%d %B"),
        (r"^[A-Za-z]+ \d{1,2}$", "%B %d"),
    ]
    for r_fmt, p_fmt in text_formats:
        if re.match(r_fmt, s):
            try:
                d = _dt.datetime.strptime(s, p_fmt).date()
            except ValueError:
                continue
            if "%d" not in p_fmt:
                end_day = calendar.monthrange(d.year, d.month)[1]
                return (d.year, d.month, d.day, d.year, d.month, end_day)
            return (d.year, d.month, d.day) * 2

    try:
        if "/" in s and "-" in s:
            start, end = s.split("/")
            start = re.sub(r"T.*", "", start)
            end = re.sub(r"T.*", "", end)
            sy, sm, sd = start.split("-")
            ey, em, ed = end.split("-")
            return tuple(map(int, (sy, sm, sd, ey, em, ed)))  # type: ignore[return-value]
        elif "/" in s:
            sy, ey = s.split("/")
            return (int(sy), 1, 1, int(ey), 12, 31)
        elif "-" in s:
            parts = s.split("-")
            if len(parts) == 2:
                year, month = map(int, parts)
                if 0 < month <= 12:
                    return (year, month, 1, year, month, calendar.monthrange(year, month)[1])
                return (year, 1, 1, month, 12, 31)
            if len(parts) == 3:
                y, m, d = map(int, parts)
                return (y, m, d) * 2
            return _ZEROS  # >3 dash-parts: failure sentinel
        else:
            return (int(s), 1, 1, int(s), 12, 31)
    except ValueError:
        return _ZEROS


#: month names ordered so array_position(...) % 12 yields the month number
_MONTH_NAMES = [calendar.month_abbr[i].lower() for i in range(1, 13)] + [
    calendar.month_name[i].lower() for i in range(1, 13)
]


def _month_num(name_col: Column) -> Column:
    """Month-name (any case, abbrev or full) -> 1..12, null if not a month.

    array_position over a 24-element literal array keeps the expression
    tree small (it is inlined several times per cascade — a 48-pair
    create_map here multiplies codegen size and compile time).
    """
    pos = F.array_position(
        F.array(*[F.lit(n) for n in _MONTH_NAMES]), F.lower(name_col)
    )
    return F.when(pos > 0, ((pos - 1) % 12 + 1).cast("int"))


def _days_in_month(year: Column, month: Column) -> Column:
    """F6: month-end day with real leap handling (monthrange parity)."""
    return F.dayofmonth(F.last_day(F.make_date(year, month, F.lit(1))))


def _days_in_month_1900(month: Column) -> Column:
    return F.element_at(F.array(*[F.lit(d) for d in _DAYS_1900]), month)


def split_dates(col: Column) -> Column:
    """F3 as a native when/otherwise cascade.

    Returns ``struct<start_year:int, start_month:int, start_day:int,
    end_year:int, end_month:int, end_day:int>`` following the
    split_dates spec (see :func:`split_dates_py`). Entirely JVM-side —
    regexp_extract + create_map + last_day — so it stays inside
    whole-stage codegen at 100 TB.
    """
    s = F.trim(F.regexp_replace(col, ",", ""))

    def mk(sy, sm, sd, ey, em, ed) -> Column:
        return F.struct(
            sy.cast("int").alias("start_year"),
            sm.cast("int").alias("start_month"),
            sd.cast("int").alias("start_day"),
            ey.cast("int").alias("end_year"),
            em.cast("int").alias("end_month"),
            ed.cast("int").alias("end_day"),
        )

    zeros = mk(*(F.lit(0),) * 6)
    i = F.lit(1)

    # --- textual month shapes -------------------------------------------
    # month-name + 4-digit year (either order): day defaults to 1,
    # end_day = real month end for that year.
    name_my = F.regexp_extract(s, r"^([A-Za-z]+) (\d{4})$", 1)
    year_my = F.regexp_extract(s, r"^([A-Za-z]+) (\d{4})$", 2).cast("int")
    name_ym = F.regexp_extract(s, r"^(\d{4}) ([A-Za-z]+)$", 2)
    year_ym = F.regexp_extract(s, r"^(\d{4}) ([A-Za-z]+)$", 1).cast("int")
    # day + month-name (either order): strptime default year 1900;
    # day must fit the 1900 calendar (Feb = 28) or the branch fails.
    day_dm = F.regexp_extract(s, r"^(\d{1,2}) ([A-Za-z]+)$", 1).cast("int")
    name_dm = F.regexp_extract(s, r"^(\d{1,2}) ([A-Za-z]+)$", 2)
    name_md = F.regexp_extract(s, r"^([A-Za-z]+) (\d{1,2})$", 1)
    day_md = F.regexp_extract(s, r"^([A-Za-z]+) (\d{1,2})$", 2).cast("int")

    def month_year_case(name: Column, year: Column) -> Column:
        m = _month_num(name)
        return F.when(
            m.isNotNull() & year.isNotNull(),
            mk(year, m, i, year, m, _days_in_month(year, m)),
        ).otherwise(zeros)

    def day_month_case(day: Column, name: Column) -> Column:
        m = _month_num(name)
        ok = m.isNotNull() & (day >= 1) & (day <= _days_in_month_1900(m))
        y1900 = F.lit(1900)
        return F.when(ok, mk(y1900, m, day, y1900, m, day)).otherwise(zeros)

    # --- numeric shapes --------------------------------------------------
    # range 'A/B' where the string also contains '-': strip T-tails,
    # both sides must be d-d-d; ints taken verbatim (no calendar check).
    # try_element_at / try_cast keep the cascade null-safe under ANSI
    # mode (Spark 4 default) — a null condition is simply not taken.
    range_sides = F.split(s, "/")
    side0 = F.regexp_replace(F.try_element_at(range_sides, F.lit(1)), "T.*", "")
    side1 = F.regexp_replace(F.try_element_at(range_sides, F.lit(2)), "T.*", "")
    ddd = r"^(\d+)-(\d+)-(\d+)$"

    def ymd(side: Column, grp: int) -> Column:
        return F.regexp_extract(side, ddd, grp).try_cast("int")

    full_range = F.when(
        (F.size(range_sides) == 2) & side0.rlike(ddd) & side1.rlike(ddd),
        mk(ymd(side0, 1), ymd(side0, 2), ymd(side0, 3), ymd(side1, 1), ymd(side1, 2), ymd(side1, 3)),
    ).otherwise(zeros)

    yy = r"^(\d+)/(\d+)$"
    year_range = F.when(
        s.rlike(yy),
        mk(F.regexp_extract(s, yy, 1).try_cast("int"), i, i,
           F.regexp_extract(s, yy, 2).try_cast("int"), F.lit(12), F.lit(31)),
    ).otherwise(zeros)

    dd = r"^(\d+)-(\d+)$"
    y2 = F.regexp_extract(s, dd, 1).try_cast("int")
    m2 = F.regexp_extract(s, dd, 2).try_cast("int")
    year_month = F.when(
        s.rlike(dd),
        F.when(
            (m2 > 0) & (m2 <= 12),
            mk(y2, m2, i, y2, m2, _days_in_month(y2, m2)),
        ).otherwise(mk(y2, i, i, m2, F.lit(12), F.lit(31))),
    ).otherwise(zeros)

    full_date = F.when(
        s.rlike(ddd),
        mk(ymd(s, 1), ymd(s, 2), ymd(s, 3), ymd(s, 1), ymd(s, 2), ymd(s, 3)),
    ).otherwise(zeros)

    bare = r"^(\d+)$"
    y0 = F.regexp_extract(s, bare, 1).try_cast("int")
    bare_year = F.when(s.rlike(bare), mk(y0, i, i, y0, F.lit(12), F.lit(31))).otherwise(zeros)

    # --- dispatch (mirrors the reference's branch order) -----------------
    return (
        F.when(s.rlike(r"^[A-Za-z]+ \d{4}$"), month_year_case(name_my, year_my))
        .when(s.rlike(r"^\d{4} [A-Za-z]+$"), month_year_case(name_ym, year_ym))
        .when(s.rlike(r"^\d{1,2} [A-Za-z]+$"), day_month_case(day_dm, name_dm))
        .when(s.rlike(r"^[A-Za-z]+ \d{1,2}$"), day_month_case(day_md, name_md))
        .when(s.contains("/") & s.contains("-"), full_range)
        .when(s.contains("/"), year_range)
        .when(s.contains("-") & s.rlike(dd), year_month)
        .when(s.contains("-") & s.rlike(ddd), full_date)
        .when(s.contains("-"), zeros)
        .when(s.rlike(bare), bare_year)
        .otherwise(zeros)
    )


def with_date_parts(df, src: str = "eventDate"):
    """Attach the six date-part columns (reference cleaner.py:302,333).

    Same spec as :func:`split_dates`, but evaluated in staged
    projections: every capture (space/dash/slash splits, month-name
    lookups) is materialized ONCE per row as a column, then the dispatch
    cascade is cheap when/struct logic over those attributes plus one
    rlike per shape. The single-expression cascade re-runs each
    regexp_extract per struct field per branch (conditional branches
    defeat codegen subexpression elimination) — measured ~3x slower.
    The struct is materialized before field extraction so CollapseProject
    cannot duplicate the cascade six times.
    """
    ddd = r"^(\d+)-(\d+)-(\d+)$"
    dd = r"^(\d+)-(\d+)$"
    yy = r"^(\d+)/(\d+)$"

    d1 = df.withColumn("__s", F.trim(F.regexp_replace(F.col(src), ",", "")))
    d2 = d1.withColumns(
        {
            "__sp": F.split(F.col("__s"), " "),
            "__dash": F.split(F.col("__s"), "-"),
            "__slash": F.split(F.col("__s"), "/"),
        }
    )
    d3 = d2.withColumns(
        {
            "__w1": F.try_element_at(F.col("__sp"), F.lit(1)),
            "__w2": F.try_element_at(F.col("__sp"), F.lit(2)),
            "__side0": F.regexp_replace(
                F.try_element_at(F.col("__slash"), F.lit(1)), "T.*", ""
            ),
            "__side1": F.regexp_replace(
                F.try_element_at(F.col("__slash"), F.lit(2)), "T.*", ""
            ),
        }
    )
    d4 = d3.withColumns(
        {
            "__m1": _month_num(F.col("__w1")),
            "__m2": _month_num(F.col("__w2")),
            "__s0p": F.split(F.col("__side0"), "-"),
            "__s1p": F.split(F.col("__side1"), "-"),
        }
    )

    def mk(sy, sm, sd, ey, em, ed) -> Column:
        return F.struct(
            sy.cast("int").alias("start_year"),
            sm.cast("int").alias("start_month"),
            sd.cast("int").alias("start_day"),
            ey.cast("int").alias("end_year"),
            em.cast("int").alias("end_month"),
            ed.cast("int").alias("end_day"),
        )

    zeros = mk(*(F.lit(0),) * 6)
    i = F.lit(1)
    s = F.col("__s")

    def iel(arr: str, idx: int) -> Column:
        return F.try_element_at(F.col(arr), F.lit(idx)).try_cast("int")

    def month_year(year: Column, m: Column) -> Column:
        return F.when(
            m.isNotNull() & year.isNotNull(),
            mk(year, m, i, year, m, _days_in_month(year, m)),
        ).otherwise(zeros)

    def day_month(day: Column, m: Column) -> Column:
        ok = m.isNotNull() & (day >= 1) & (day <= _days_in_month_1900(m))
        y1900 = F.lit(1900)
        return F.when(ok, mk(y1900, m, day, y1900, m, day)).otherwise(zeros)

    full_range = F.when(
        (F.size("__slash") == 2)
        & F.col("__side0").rlike(ddd)
        & F.col("__side1").rlike(ddd),
        mk(
            iel("__s0p", 1), iel("__s0p", 2), iel("__s0p", 3),
            iel("__s1p", 1), iel("__s1p", 2), iel("__s1p", 3),
        ),
    ).otherwise(zeros)

    year_range = F.when(
        s.rlike(yy),
        mk(iel("__slash", 1), i, i, iel("__slash", 2), F.lit(12), F.lit(31)),
    ).otherwise(zeros)

    y2, m2 = iel("__dash", 1), iel("__dash", 2)
    year_month = F.when(
        (m2 > 0) & (m2 <= 12), mk(y2, m2, i, y2, m2, _days_in_month(y2, m2))
    ).otherwise(mk(y2, i, i, m2, F.lit(12), F.lit(31)))

    full_date = mk(
        iel("__dash", 1), iel("__dash", 2), iel("__dash", 3),
        iel("__dash", 1), iel("__dash", 2), iel("__dash", 3),
    )

    y0 = s.try_cast("int")
    parts = (
        F.when(
            s.rlike(r"^[A-Za-z]+ \d{4}$"),
            month_year(F.col("__w2").try_cast("int"), F.col("__m1")),
        )
        .when(
            s.rlike(r"^\d{4} [A-Za-z]+$"),
            month_year(F.col("__w1").try_cast("int"), F.col("__m2")),
        )
        .when(
            s.rlike(r"^\d{1,2} [A-Za-z]+$"),
            day_month(F.col("__w1").try_cast("int"), F.col("__m2")),
        )
        .when(
            s.rlike(r"^[A-Za-z]+ \d{1,2}$"),
            day_month(F.col("__w2").try_cast("int"), F.col("__m1")),
        )
        .when(s.contains("/") & s.contains("-"), full_range)
        .when(s.contains("/"), year_range)
        .when(s.rlike(dd), year_month)
        .when(s.rlike(ddd), full_date)
        .when(s.contains("-"), zeros)
        .when(s.rlike(r"^\d+$"), mk(y0, i, i, y0, F.lit(12), F.lit(31)))
        .otherwise(zeros)
    )
    staged = d4.withColumn("__parts", parts)
    return staged.select(
        *df.columns, *[F.col(f"__parts.{f}").alias(f) for f in DATE_PARTS_FIELDS]
    )


# ---------------------------------------------------------------------------
# DuckDB twin of the cascade — keeps the driver's oracle on the same spec.
# ---------------------------------------------------------------------------

def split_dates_duckdb_sql(col: str) -> dict[str, str]:
    """Emit DuckDB SQL expressions for the six split_dates parts.

    Only the numeric + textual-month branches reachable from digit /
    month-name inputs — i.e. the full spec above — expressed with
    DuckDB's regexp_extract / make_date / last_day so the oracle runs
    the identical cascade.
    """
    s = f"trim(replace({col}, ',', ''))"
    month_case = "CASE lower({n}) " + " ".join(
        f"WHEN '{name}' THEN {num}" for name, num in MONTHS.items()
    ) + " ELSE NULL END"
    days1900 = "list_extract([31,28,31,30,31,30,31,31,30,31,30,31], {m})"

    def dim(y: str, m: str) -> str:
        return f"date_part('day', last_day(make_date({y}, {m}, 1)))"

    # textual shapes
    n_my = f"regexp_extract({s}, '^([A-Za-z]+) ([0-9]{{4}})$', 1)"
    y_my = f"CAST(regexp_extract({s}, '^([A-Za-z]+) ([0-9]{{4}})$', 2) AS INT)"
    n_ym = f"regexp_extract({s}, '^([0-9]{{4}}) ([A-Za-z]+)$', 2)"
    y_ym = f"CAST(regexp_extract({s}, '^([0-9]{{4}}) ([A-Za-z]+)$', 1) AS INT)"
    d_dm = f"CAST(regexp_extract({s}, '^([0-9]{{1,2}}) ([A-Za-z]+)$', 1) AS INT)"
    n_dm = f"regexp_extract({s}, '^([0-9]{{1,2}}) ([A-Za-z]+)$', 2)"
    n_md = f"regexp_extract({s}, '^([A-Za-z]+) ([0-9]{{1,2}})$', 1)"
    d_md = f"CAST(regexp_extract({s}, '^([A-Za-z]+) ([0-9]{{1,2}})$', 2) AS INT)"

    m_my = month_case.format(n=n_my)
    m_ym = month_case.format(n=n_ym)
    m_dm = month_case.format(n=n_dm)
    m_md = month_case.format(n=n_md)

    # numeric shapes
    side0 = f"regexp_replace(list_extract(str_split({s}, '/'), 1), 'T.*', '')"
    side1 = f"regexp_replace(list_extract(str_split({s}, '/'), 2), 'T.*', '')"
    ddd = "^([0-9]+)-([0-9]+)-([0-9]+)$"
    dd = "^([0-9]+)-([0-9]+)$"
    yy = "^([0-9]+)/([0-9]+)$"

    def ymd(side: str, grp: int) -> str:
        return f"CAST(regexp_extract({side}, '{ddd}', {grp}) AS INT)"

    y2 = f"CAST(regexp_extract({s}, '{dd}', 1) AS INT)"
    m2 = f"CAST(regexp_extract({s}, '{dd}', 2) AS INT)"
    y0 = f"CAST(regexp_extract({s}, '^([0-9]+)$', 1) AS INT)"

    range_ok = (
        f"len(str_split({s}, '/')) = 2 AND regexp_matches({side0}, '{ddd}') "
        f"AND regexp_matches({side1}, '{ddd}')"
    )

    def branch(part: str) -> str:
        """Build one output column's CASE cascade; `part` selects which of
        the six values each branch yields."""
        text_my = {
            "sy": y_my, "sm": m_my, "sd": "1",
            "ey": y_my, "em": m_my, "ed": dim(y_my, m_my),
        }
        text_ym = {
            "sy": y_ym, "sm": m_ym, "sd": "1",
            "ey": y_ym, "em": m_ym, "ed": dim(y_ym, m_ym),
        }
        text_dm = {
            "sy": "1900", "sm": m_dm, "sd": d_dm,
            "ey": "1900", "em": m_dm, "ed": d_dm,
        }
        text_md = {
            "sy": "1900", "sm": m_md, "sd": d_md,
            "ey": "1900", "em": m_md, "ed": d_md,
        }
        rng = {
            "sy": ymd(side0, 1), "sm": ymd(side0, 2), "sd": ymd(side0, 3),
            "ey": ymd(side1, 1), "em": ymd(side1, 2), "ed": ymd(side1, 3),
        }
        yrng = {
            "sy": f"CAST(regexp_extract({s}, '{yy}', 1) AS INT)", "sm": "1", "sd": "1",
            "ey": f"CAST(regexp_extract({s}, '{yy}', 2) AS INT)", "em": "12", "ed": "31",
        }
        ym_valid = {
            "sy": y2, "sm": m2, "sd": "1", "ey": y2, "em": m2, "ed": dim(y2, m2),
        }
        ym_years = {"sy": y2, "sm": "1", "sd": "1", "ey": m2, "em": "12", "ed": "31"}
        fdate = {
            "sy": ymd(s, 1), "sm": ymd(s, 2), "sd": ymd(s, 3),
            "ey": ymd(s, 1), "em": ymd(s, 2), "ed": ymd(s, 3),
        }
        byear = {"sy": y0, "sm": "1", "sd": "1", "ey": y0, "em": "12", "ed": "31"}

        return f"""CAST(COALESCE(CASE
  WHEN regexp_matches({s}, '^[A-Za-z]+ [0-9]{{4}}$')
    THEN CASE WHEN {m_my} IS NOT NULL THEN {text_my[part]} ELSE 0 END
  WHEN regexp_matches({s}, '^[0-9]{{4}} [A-Za-z]+$')
    THEN CASE WHEN {m_ym} IS NOT NULL THEN {text_ym[part]} ELSE 0 END
  WHEN regexp_matches({s}, '^[0-9]{{1,2}} [A-Za-z]+$')
    THEN CASE WHEN {m_dm} IS NOT NULL AND {d_dm} BETWEEN 1 AND {days1900.format(m=m_dm)} THEN {text_dm[part]} ELSE 0 END
  WHEN regexp_matches({s}, '^[A-Za-z]+ [0-9]{{1,2}}$')
    THEN CASE WHEN {m_md} IS NOT NULL AND {d_md} BETWEEN 1 AND {days1900.format(m=m_md)} THEN {text_md[part]} ELSE 0 END
  WHEN contains({s}, '/') AND contains({s}, '-')
    THEN CASE WHEN {range_ok} THEN {rng[part]} ELSE 0 END
  WHEN contains({s}, '/')
    THEN CASE WHEN regexp_matches({s}, '{yy}') THEN {yrng[part]} ELSE 0 END
  WHEN regexp_matches({s}, '{dd}')
    THEN CASE WHEN {m2} > 0 AND {m2} <= 12 THEN {ym_valid[part]} ELSE {ym_years[part]} END
  WHEN regexp_matches({s}, '{ddd}') THEN {fdate[part]}
  WHEN contains({s}, '-') THEN 0
  WHEN regexp_matches({s}, '^[0-9]+$') THEN {byear[part]}
  ELSE 0 END, 0) AS INT)"""

    return {
        "start_year": branch("sy"),
        "start_month": branch("sm"),
        "start_day": branch("sd"),
        "end_year": branch("ey"),
        "end_month": branch("em"),
        "end_day": branch("ed"),
    }
