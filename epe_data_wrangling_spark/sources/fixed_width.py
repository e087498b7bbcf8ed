"""Declarative typed fixed-width (mainframe copybook) layouts.

The r7 fixed-width source parsed ONE hand-listed all-string layout and
cast afterwards; this module generalizes it to a typed layout table —
the copybook shape — from which BOTH sides of the format are generated
as pure Catalyst column expressions (whole-stage codegen, no Python on
any row):

- ``fw_parse_exprs``  : substring/trim/cast/translate decode
- ``fw_render_expr``  : lpad/rpad/date_format/translate encode (one
  line column — so fixtures and golden extracts are WRITTEN by a
  distributed ``df.write.text``, never a driver-side loop)

Field kinds (``FwField.kind``):

``text``
    Blank-padded character data; parse trims edges only (internal
    spaces survive).
``int``
    Right-justified zero-padded display numeric (PIC 9(n)) — UNSIGNED
    by definition; rendering a negative value raises at runtime
    (signed values belong in ``zoned``). Parses with a plain cast,
    which tolerates blank- or zero-padding.
``zoned``
    Zoned decimal with a SIGNED OVERPUNCH trailing byte — the
    EBCDIC-heritage convention that survives ASCII transliteration:
    the last character carries both the final digit and the sign
    ('{' = +0, 'A'-'I' = +1..+9, '}' = -0, 'J'-'R' = -1..-9). The
    parsed value is an INTEGER in minor units (10^-scale), never a
    float — the repo's money-as-cents rendering rule applied to a
    source format. ``scale`` is the copybook's implied decimal point
    (PIC S9(n)V99 → scale 2); it documents the unit, the stored
    integer is unscaled.
``date``
    PIC 9(8) display date, yyyyMMdd.

True packed decimal (COMP-3) stores two digits per BYTE NIBBLE and is
not representable inside a delimited text line (0x0A bytes can appear
inside values); packed records need a fixed-RECORD binary reader,
which is out of scope for the text-line format here — stated plainly
rather than half-supported.

Reference parity: the reference ingests legacy binary formats the
same declare-the-layout way (``/root/reference/tratamento_epe.R:63``
reads a fixed-sheet .xls grid by position); fixed-width text is the
row-wise analogue every enterprise landing zone still receives.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Signed-overpunch trailing-byte alphabets (ASCII transliteration of
#: the EBCDIC zone nibbles C/D): index = final digit value.
OVERPUNCH_POS = "{ABCDEFGHI"
OVERPUNCH_NEG = "}JKLMNOPQR"
_DIGITS = "0123456789"


@dataclass(frozen=True)
class FwField:
    """One copybook field: 1-based ``start`` offset, byte ``width``,
    semantic ``kind`` (text | int | zoned | date), and for ``zoned``
    the implied decimal ``scale`` (documentation of the minor unit —
    values stay unscaled integers)."""

    name: str
    start: int
    width: int
    kind: str = "text"
    scale: int = 0


def _parse_one(raw: Column, f: FwField) -> Column:
    cell = F.substring(raw, f.start, f.width)
    if f.kind == "text":
        return F.trim(cell).alias(f.name)
    if f.kind == "int":
        return F.trim(cell).cast("bigint").alias(f.name)
    if f.kind == "date":
        return F.to_date(F.trim(cell), "yyyyMMdd").alias(f.name)
    if f.kind == "zoned":
        body = F.substring(raw, f.start, f.width - 1)
        last = F.substring(raw, f.start + f.width - 1, 1)
        digit = F.translate(last, OVERPUNCH_POS + OVERPUNCH_NEG, _DIGITS + _DIGITS)
        magnitude = F.concat(F.trim(body), digit).cast("bigint")
        sign = F.when(
            last.isin(*OVERPUNCH_NEG), F.lit(-1).cast("bigint")
        ).otherwise(F.lit(1).cast("bigint"))
        return (sign * magnitude).alias(f.name)
    raise ValueError(f"unknown fixed-width field kind: {f.kind!r}")


def fw_parse_exprs(layout: Sequence[FwField], value_col: str = "value") -> list[Column]:
    """Generated decode expressions, one typed column per field — all
    substring/trim/cast/translate, so the whole parse stays inside
    whole-stage codegen over a splittable ``spark.read.text`` scan."""
    raw = F.col(value_col)
    return [_parse_one(raw, f) for f in layout]


def fw_parse(raw: DataFrame, layout: Sequence[FwField], value_col: str = "value") -> DataFrame:
    """Parse a ``spark.read.text`` DataFrame through a typed layout."""
    return raw.select(*fw_parse_exprs(layout, value_col))


def _guarded(f: FwField, raw: Column, rendered: Column) -> Column:
    """Fail LOUDLY on field overflow: lpad/rpad silently TRUNCATE a
    value wider than the field, which would corrupt the extract and
    round-trip to a wrong value — an runtime raise_error turns that
    into a job failure for every layout, not just the ones a bespoke
    fit-test covers. NULLs pass through (null-propagating render)."""
    fits = raw.isNull() | (F.length(raw) <= f.width)
    return F.when(
        ~fits,
        F.raise_error(
            F.concat(
                F.lit(
                    f"fixed-width overflow in field {f.name!r} "
                    f"(width {f.width}): value "
                ),
                raw,
            )
        ).cast("string"),
    ).otherwise(rendered)


def _render_one(f: FwField) -> Column:
    c = F.col(f.name)
    if f.kind == "text":
        return _guarded(f, c, F.rpad(c, f.width, " "))
    if f.kind == "int":
        # PIC 9(n) is UNSIGNED display numeric: lpad("-5", w, "0")
        # would yield "0…0-5", pass the width guard, and round-trip
        # through fw_parse's cast to NULL — silent corruption. Signed
        # values must use kind="zoned" (signed overpunch); a negative
        # here fails the job loudly instead.
        s = c.cast("string")
        neg_guarded = F.when(
            c < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fixed-width field {f.name!r} is PIC 9(n) "
                        "(unsigned); negative value "
                    ),
                    s,
                    F.lit(" requires kind='zoned'"),
                )
            ).cast("string"),
        ).otherwise(s)
        return _guarded(f, neg_guarded, F.lpad(neg_guarded, f.width, "0"))
    if f.kind == "date":
        if f.width != 8:
            raise ValueError(
                f"date field {f.name!r} must have width 8 (yyyyMMdd), got {f.width}"
            )
        # yyyyMMdd is 8 chars only for years 1..9999; a year beyond
        # that renders 9+ chars and would silently shift every later
        # field — run it through the same overflow guard as text/int.
        s = F.date_format(c, "yyyyMMdd")
        return _guarded(f, s, s)
    if f.kind == "zoned":
        raw = F.abs(c).cast("string")
        mag = F.lpad(raw, f.width, "0")
        body = F.substring(mag, 1, f.width - 1)
        d = F.substring(mag, f.width, 1)
        last = F.when(
            c < 0, F.translate(d, _DIGITS, OVERPUNCH_NEG)
        ).otherwise(F.translate(d, _DIGITS, OVERPUNCH_POS))
        return _guarded(f, raw, F.concat(body, last))
    raise ValueError(f"unknown fixed-width field kind: {f.kind!r}")


def fw_render_expr(layout: Sequence[FwField]) -> Column:
    """One string column concatenating every field at its exact width
    — feed to ``df.select(fw_render_expr(L).alias("value")).write.text``
    for a fully distributed extract writer (the render twin of the
    parse; round-trip is pinned in tests). Layout offsets must abut:
    each field's start = previous start + width."""
    pos = 1
    parts = []
    for f in layout:
        if f.start != pos:
            raise ValueError(
                f"layout gap before {f.name!r}: expected start {pos}, got {f.start}"
            )
        parts.append(_render_one(f))
        pos += f.width
    return F.concat(*parts)
