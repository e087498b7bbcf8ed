"""Final semantic mapping — the reference's
``tratamento_dados_completos_epe`` (`tratamento_epe.R:210-278`).

Input: the normalized union (atributo_1..4, data, valor). One parent,
five semantic branch plans (C3) — the parent is cached before fan-out
so the whole normalize stage is not recomputed five times (SURVEY
§4.3.3) — then a name-aligned union and the ``chave_seletora``
selector key (X9, `R:274`), which exists precisely so downstream
consumers can *filter* instead of join (`tratamento_epe.rmd:275`).

Output schema (fixed): ``chave_seletora, mercado, dado, classe,
abertura, atributo string, data date, valor double``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions.cleaning import regexp_extract_na

FINAL_COLS = ("chave_seletora", "mercado", "dado", "classe", "abertura", "atributo", "data", "valor")

_BRANCH_COLS = ("mercado", "dado", "classe", "abertura", "atributo", "data", "valor")

#: Class-name extraction — anchored variant used on sheet names
#: (`R:214`), unanchored on UF sheet names / CATIVO row labels
#: (`R:236,247`).
CLASS_ANCHORED = "(RESIDENCIA|INDUSTRIA|COMERCIA|TOTA)(IS|L)$|OUTROS"
CLASS_UNANCHORED = "(RESIDENCIA|INDUSTRIA|COMERCIA|TOTA)(IS|L)|OUTROS"


def _clean_classe(classe: Column) -> Column:
    """`R:215`: TOTAIS/TOTAL → NÃO RESIDENCIAL; plural IS → singular L
    (RESIDENCIAIS→RESIDENCIAL etc.). Null passes through (R ifelse on
    NA condition yields NA; str_replace(NA) is NA)."""
    return F.when(classe.rlike("TOTA"), F.lit("NÃO RESIDENCIAL")).otherwise(
        F.regexp_replace(classe, "IS$", "L")
    )


def _dado(atributo_2: Column) -> Column:
    """`R:216`: the measure kind lives in the sheet subtitle — either
    'Consumo' (GWh) or 'consumidores' (count); uppercased, NA on miss."""
    return F.upper(regexp_extract_na(atributo_2, "Consumo|consumidores"))


def _paste_key(dado: Column, mercado: Column, classe: Column, abertura: Column) -> Column:
    """X9 (`R:274`): R ``paste(dado,'-','MERCADO',mercado,...)`` with
    the default single-space separator. R renders NA components as the
    literal string 'NA' — emulated with coalesce."""
    na = lambda c: F.coalesce(c, F.lit("NA"))  # noqa: E731
    return F.concat_ws(
        " ",
        na(dado), F.lit("-"),
        F.lit("MERCADO"), na(mercado), F.lit("-"),
        F.lit("CLASSE"), na(classe), F.lit("-"),
        F.lit("POR"), na(abertura),
    )


def semantic_map(normalized: DataFrame, *, cache: bool = True) -> DataFrame:
    """Five filter+derive branch plans over one cached parent, then
    union-by-name and the selector key. All branch logic is pure
    Catalyst expressions (when/otherwise, regexp, upper) — zero UDFs."""
    t = normalized.cache() if cache else normalized
    a1, a2, a3, a4 = (F.col(f"atributo_{i}") for i in range(1, 5))

    # Branch 1 (`R:212-221`): market TOTAL × class sheets, broken down
    # by region/subsystem (or CLASSE rows).
    b1 = (
        t.filter(
            ~a1.isin("TOTAL", "CONSUMO POR UF")
            & ~a1.rlike("CATIVO|INDUSTRIAL GENERO|POR (U|)F$")
        )
        .withColumn("classe", _clean_classe(regexp_extract_na(a1, CLASS_ANCHORED)))
        .withColumn("dado", _dado(a2))
        .withColumn("abertura", a3)
        .withColumn("atributo", F.upper(a4))
        .withColumn("mercado", F.lit("TOTAL"))
        .select(*_BRANCH_COLS)
    )

    # Branch 2 (`R:223-231`): industrial consumption by industry
    # branch (RAMO); constants except the sector label.
    b2 = (
        t.filter(a1 == "INDUSTRIAL GENERO")
        .withColumn("classe", F.lit("INDUSTRIAL"))
        .withColumn("dado", F.lit("CONSUMO"))
        .withColumn("abertura", F.lit("RAMO"))
        .withColumn("atributo", a3)
        .withColumn("mercado", F.lit("TOTAL"))
        .select(*_BRANCH_COLS)
    )

    # Branch 3 (`R:233-242`): market TOTAL × UF sheets.
    b3 = (
        t.filter(a1.rlike("POR (U|)F$") & ~a1.rlike("CATIVO|CONSUMO POR UF"))
        .withColumn("classe", _clean_classe(regexp_extract_na(a1, CLASS_UNANCHORED)))
        .withColumn("dado", _dado(a2))
        .withColumn("abertura", F.lit("UF"))
        .withColumn("atributo", F.upper(a3))
        .withColumn("mercado", F.lit("TOTAL"))
        .select(*_BRANCH_COLS)
    )

    # Branch 4 (`R:244-255`): captive market by region/subsystem; the
    # class lives in the row label (atributo_4); class rows then get
    # abertura/atributo reset to TOTAL (X8, `R:254`).
    b4_classe = _clean_classe(regexp_extract_na(F.upper(a4), CLASS_UNANCHORED))
    b4 = (
        t.filter(a1 == "CATIVO")
        .withColumn("classe", F.coalesce(b4_classe, F.lit("TOTAL")))
        .withColumn("dado", _dado(a2))
        .withColumn("abertura", a3)
        .withColumn("atributo", F.upper(a4))
        .withColumn("mercado", F.lit("CATIVO"))
        .select(*_BRANCH_COLS)
    )
    for c in ("abertura", "atributo"):
        b4 = b4.withColumn(
            c, F.when(F.col("classe") != "TOTAL", F.lit("TOTAL")).otherwise(F.col(c))
        )
    b4 = b4.select(*_BRANCH_COLS)

    # Branch 5 (`R:257-265`): captive market by UF.
    b5 = (
        t.filter(a1 == "CONSUMO CATIVO POR UF")
        .withColumn("classe", F.lit("TOTAL"))
        .withColumn("dado", _dado(a2))
        .withColumn("abertura", F.lit("UF"))
        .withColumn("atributo", F.upper(a3))
        .withColumn("mercado", F.lit("CATIVO"))
        .select(*_BRANCH_COLS)
    )

    # U2 (`R:267-273`) + X9 key + key-first ordering (`R:274-275`).
    out = b1
    for b in (b2, b3, b4, b5):
        out = out.unionByName(b)
    out = out.withColumn(
        "chave_seletora",
        _paste_key(F.col("dado"), F.col("mercado"), F.col("classe"), F.col("abertura")),
    )
    return out.select(*FINAL_COLS)
