"""Stdlib-only R ``.RDS`` writer/reader for small data.frames.

The reference's final artifact is an RDS file —
`tratamento_epe.rmd` ("Exportação"): ``saveRDS(dados_epe_tratados_
final, 'dados_epe_tratados.RDS')`` — a format no non-R tool in this
container can produce. This module implements the PUBLIC R
serialization format (R Internals manual §"Serialization Formats",
version-2 XDR stream) for the subset a tidy exported table needs:
a data.frame of character / double / integer / logical / Date
columns, gzip-wrapped like ``saveRDS``'s default, so a user keeping
an R consumer downstream of the pipeline can still hand it the exact
artifact the reference produced. ``readRDS`` autodetects the gzip
wrapper; NA handling follows R (NA_character_ = CHARSXP length -1,
NA_real_ = the R NA payload, NA_integer_ = INT_MIN).

Like ``write_excel_small``, this is a DRIVER-SIDE small-result sink
(the reference's RDS is the final tidy table — thousands of rows);
big data belongs in parquet. The reader exists so tests can
round-trip REAL files byte-structurally without an R runtime.
"""

from __future__ import annotations

import gzip
import struct
from datetime import date
from typing import Any

# SEXP type codes (R internals)
_SYMSXP, _LISTSXP, _CHARSXP, _LGLSXP = 1, 2, 9, 10
_INTSXP, _REALSXP, _STRSXP, _VECSXP = 13, 14, 16, 19
_NILVALUE = 254
_REFSXP = 255
_NA_INT = -0x80000000
#: R's NA_real_: an IEEE NaN with payload 1954 in the low word
_NA_REAL_BYTES = b"\x7f\xf0\x00\x00\x00\x00\x07\xa2"
_UTF8_LEVS = 0x08  #: CE_UTF8 encoding bit, stored in flags bits 12+


def _flags(stype: int, levs: int = 0, isobj: bool = False,
           hasattr_: bool = False, hastag: bool = False) -> int:
    return (
        stype
        | (levs << 12)
        | (0x100 if isobj else 0)
        | (0x200 if hasattr_ else 0)
        | (0x400 if hastag else 0)
    )


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray()

    def i4(self, v: int) -> None:
        self.out += struct.pack(">i", v)

    def f8(self, v: float | None) -> None:
        if v is None:
            self.out += _NA_REAL_BYTES
        else:
            self.out += struct.pack(">d", v)

    def charsxp(self, s: str | None) -> None:
        if s is None:
            self.i4(_flags(_CHARSXP, levs=_UTF8_LEVS))
            self.i4(-1)  # NA_character_
            return
        b = s.encode("utf-8")
        self.i4(_flags(_CHARSXP, levs=_UTF8_LEVS))
        self.i4(len(b))
        self.out += b

    def symbol(self, name: str) -> None:
        # fresh SYMSXP each time (readers accept duplicates; REFSXP
        # is an optimization, not a requirement)
        self.i4(_flags(_SYMSXP))
        self.charsxp(name)

    def strsxp(self, vals: list[str | None]) -> None:
        self.i4(_flags(_STRSXP))
        self.i4(len(vals))
        for v in vals:
            self.charsxp(v)

    def realsxp(self, vals: list[float | None], *, attrs: list | None = None) -> None:
        self.i4(_flags(_REALSXP, hasattr_=bool(attrs), isobj=bool(attrs)))
        self.i4(len(vals))
        for v in vals:
            self.f8(v)
        if attrs:
            self.attr_pairlist(attrs)

    def intsxp(self, vals: list[int | None]) -> None:
        self.i4(_flags(_INTSXP))
        self.i4(len(vals))
        for v in vals:
            self.i4(_NA_INT if v is None else v)

    def lglsxp(self, vals: list[bool | None]) -> None:
        self.i4(_flags(_LGLSXP))
        self.i4(len(vals))
        for v in vals:
            self.i4(_NA_INT if v is None else int(v))

    def attr_pairlist(self, attrs: list[tuple[str, Any]]) -> None:
        """attrs = [(name, write_thunk_or_value)] as a tagged pairlist."""
        for name, write in attrs:
            self.i4(_flags(_LISTSXP, hastag=True))
            self.symbol(name)
            write()
        self.i4(_flags(_NILVALUE))


def _col_writer(w: _Writer, vals: list):
    """Pick the R column type from the python values. datetimes are
    EXCLUDED from the Date branch (datetime subclasses date but
    datetime - date raises) and fall through to ISO strings."""
    from datetime import datetime

    nn = [v for v in vals if v is not None]
    if nn and all(isinstance(v, bool) for v in nn):
        return lambda: w.lglsxp(vals)
    if nn and all(isinstance(v, int) and not isinstance(v, bool) for v in nn) and all(
        -(2**31) < v < 2**31 for v in nn
    ):
        return lambda: w.intsxp(vals)
    if nn and all(
        isinstance(v, date) and not isinstance(v, datetime) for v in nn
    ):
        epoch = date(1970, 1, 1)
        days = [None if v is None else float((v - epoch).days) for v in vals]
        return lambda: w.realsxp(
            days, attrs=[("class", lambda: w.strsxp(["Date"]))]
        )
    if nn and all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in nn):
        return lambda: w.realsxp([None if v is None else float(v) for v in vals])
    return lambda: w.strsxp([None if v is None else str(v) for v in vals])


def write_rds_small(df, path: str, *, max_rows: int = 1_000_000) -> str:
    """Spark DataFrame → gzip'd version-2 XDR RDS of an R data.frame
    (the ``saveRDS`` default). DRIVER-SIDE and small-only by contract
    — one ``limit(max_rows+1)`` probe action, like
    ``write_excel_small``."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"refusing RDS export of >{max_rows} rows")
    names = df.columns
    cols = {c: [r[c] for r in rows] for c in names}

    w = _Writer()
    w.out += b"X\n"  # XDR serialization format marker
    w.i4(2)  # stream version
    w.i4(0x030403)  # written-by R version (3.4.3 — any plausible one)
    w.i4(0x020300)  # minimum reader version (2.3.0)
    n = len(rows)
    w.i4(_flags(_VECSXP, isobj=True, hasattr_=True))
    w.i4(len(names))
    for c in names:
        _col_writer(w, cols[c])()
    w.attr_pairlist(
        [
            ("names", lambda: w.strsxp(list(names))),
            # compact row.names: INTSXP c(NA, -n)
            ("row.names", lambda: w.intsxp([None, -n])),
            ("class", lambda: w.strsxp(["data.frame"])),
        ]
    )
    with gzip.open(path, "wb") as f:
        f.write(bytes(w.out))
    return path


# ------------------------------------------------------------------- reader


class _Reader:
    def __init__(self, b: bytes):
        self.b = b
        self.p = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.p)
        self.p += 4
        return v

    def f8(self) -> float | None:
        raw = self.b[self.p : self.p + 8]
        self.p += 8
        if raw == _NA_REAL_BYTES:
            return None
        return struct.unpack(">d", raw)[0]

    def item(self):
        flags = self.i4()
        stype = flags & 0xFF
        hasattr_ = bool(flags & 0x200)
        hastag = bool(flags & 0x400)
        if stype == _NILVALUE:
            return None
        if stype == _REFSXP:
            return ("ref", flags >> 8)
        if stype == _SYMSXP:
            return ("sym", self.item())
        if stype == _CHARSXP:
            ln = self.i4()
            if ln < 0:
                return None
            s = self.b[self.p : self.p + ln].decode("utf-8")
            self.p += ln
            return s
        if stype in (_INTSXP, _LGLSXP):
            vals = [self.i4() for _ in range(self.i4())]
            out = [None if v == _NA_INT else (bool(v) if stype == _LGLSXP else v) for v in vals]
            return (out, self.pairlist() if hasattr_ else [])
        if stype == _REALSXP:
            vals = [self.f8() for _ in range(self.i4())]
            return (vals, self.pairlist() if hasattr_ else [])
        if stype == _STRSXP:
            vals = [self.item() for _ in range(self.i4())]
            return (vals, self.pairlist() if hasattr_ else [])
        if stype == _VECSXP:
            vals = [self.item() for _ in range(self.i4())]
            return (vals, self.pairlist() if hasattr_ else [])
        if stype == _LISTSXP:
            tag = self.item() if hastag else None
            car = self.item()
            rest = self.pairlist(opened=False)
            return [(tag, car)] + rest
        raise ValueError(f"unsupported SEXP type {stype}")

    def pairlist(self, *, opened: bool = True) -> list:
        out = []
        while True:
            flags = self.i4()
            stype = flags & 0xFF
            if stype == _NILVALUE:
                return out
            assert stype == _LISTSXP, stype
            tag = self.item() if flags & 0x400 else None
            car = self.item()
            out.append((tag, car))


def read_rds_frame(path: str) -> dict[str, list]:
    """Read back a (this-module-subset) RDS data.frame → {col: values}.
    Handles the gzip wrapper and the Date class attribute."""
    with open(path, "rb") as f:
        head = f.read(2)
    data = (
        gzip.open(path, "rb").read() if head == b"\x1f\x8b" else open(path, "rb").read()
    )
    r = _Reader(data)
    assert data[:2] == b"X\n", "not an XDR RDS stream"
    r.p = 2
    r.i4(), r.i4(), r.i4()  # versions
    vals, attrs = r.item()
    a = {t[1]: v for t, v in attrs if t and t[0] == "sym"}
    names = a["names"][0]
    out: dict[str, list] = {}
    for name, col in zip(names, vals):
        cv, cattrs = col
        ca = {t[1]: v for t, v in cattrs if t and t[0] == "sym"}
        if "class" in ca and ca["class"][0] == ["Date"]:
            epoch = date(1970, 1, 1)
            from datetime import timedelta

            cv = [None if x is None else epoch + timedelta(days=int(x)) for x in cv]
        out[name] = cv
    return out
