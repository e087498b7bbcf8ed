"""R-semantics-parity scalar helpers (SURVEY.md §2.10).

The reference leans on a handful of stringr/base-R scalar functions
whose null/miss semantics differ subtly from Spark's defaults. Each
helper here encodes one parity trap so the rest of the engine can use
them without re-deriving the trap:

- ``regexp_extract_na``: R ``str_extract`` returns NA on no-match
  (`tratamento_epe.R:98,102,166,214`); Spark ``regexp_extract``
  returns ``''``. The NA-vs-empty difference is load-bearing for the
  LOCF fills (W1/W2) and downstream not-null filters.
- ``str_to_title``: R ``str_to_title`` (`tratamento_epe.R:154`)
  title-cases alphabetic word starts incl. accented words;
  ``F.initcap`` matches for the label vocabulary used here
  (regions/subsystems), verified by golden tests.
- ``as_numeric``: R ``as.numeric`` coerces unparseable strings to NA
  with a warning (`tratamento_epe.R:144,182`); ``try_cast`` gives
  null-on-miss regardless of ``spark.sql.ansi.enabled``.
- ``paste``/``paste0``: R's default single-space separator
  (`tratamento_epe.R:274` builds ``chave_seletora`` with it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def regexp_extract_na(col: Column | str, pattern: str) -> Column:
    """``str_extract`` parity: first regex match, NULL (not '') on miss."""
    c = F.col(col) if isinstance(col, str) else col
    hit = F.regexp_extract(c, pattern, 0)
    # '' is ambiguous (a genuine empty match vs a miss); R returns NA
    # only on a miss, but none of the reference's patterns can match
    # empty, so ''-as-miss is exact here.
    return F.when(c.isNotNull() & (hit != ""), hit).otherwise(F.lit(None).cast("string"))


def str_to_title(col: Column | str) -> Column:
    """R ``str_to_title`` over space-separated words (`R:154`)."""
    return F.initcap(col if isinstance(col, Column) else F.col(col))


def as_numeric(col: Column | str) -> Column:
    """R ``as.numeric``: parse or NA, never an error (`R:144,182`)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def paste(*cols: Column | str, sep: str = " ") -> Column:
    """R ``paste(..., sep=' ')``; NULLs render as the string 'NA' in R,
    but the reference only pastes non-null columns, so plain concat_ws
    (which *skips* nulls) is used with a not-null contract upstream."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def typed_null(dtype: str = "string") -> Column:
    """R ``as.character(NA)`` — typed null for union-by-name alignment
    (`tratamento_epe.R:192`)."""
    return F.lit(None).cast(dtype)


def make_month_date(year: Column | str, month: Column | str) -> Column:
    """R ``as.Date(paste(ano, mes, 1, sep='-'))`` (`R:150,189`):
    first-of-month date from (possibly unpadded) year/month strings.
    ``make_date`` avoids format-string ambiguity; the explicit month
    guard keeps as.Date's NULL-on-invalid semantics under ANSI mode
    too (unguarded make_date(2004, 13, 1) *throws* when
    spark.sql.ansi.enabled=true — no try_make_date exists)."""
    y = F.col(year) if isinstance(year, str) else year
    m = F.col(month) if isinstance(month, str) else month
    yi, mi = y.try_cast("int"), m.try_cast("int")
    return F.when(mi.between(1, 12), F.make_date(yi, mi, F.lit(1))).otherwise(
        F.lit(None).cast("date")
    )
