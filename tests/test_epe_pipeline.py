"""Golden tests for the EPE normalize/semantic pipeline
(SURVEY §5.2: golden fixtures covering the R-parity traps)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from epe_data_wrangling_spark.plans.epe_normalize import normalize_workbook
from epe_data_wrangling_spark.plans.epe_pipeline import run_pipeline
from tests.epe_fixtures import workbook


@pytest.fixture(scope="module")
def normalized(spark):
    df = normalize_workbook(workbook(spark)).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def final(spark):
    df = run_pipeline(spark, workbook(spark)).cache()
    yield df
    df.unpersist()


def rows(df, **filters):
    for k, v in filters.items():
        df = df.filter(F.col(k).isNull() if v is None else (F.col(k) == v))
    return df.collect()


class TestNormalize:
    def test_schema(self, normalized):
        assert normalized.schema.simpleString() == (
            "struct<atributo_1:string,atributo_2:string,atributo_3:string,"
            "atributo_4:string,data:date,valor:double>"
        )

    def test_shape_a_counts(self, normalized):
        # RESIDENCIAIS: NORTE+C.OESTE (2004) + NORDESTE (2005) = 3 rows × 12
        assert len(rows(normalized, atributo_1="RESIDENCIAIS")) == 36
        # TOTAL/NC/TOTAL BRASIL rows stripped
        labels = {r.atributo_4 for r in rows(normalized, atributo_1="RESIDENCIAIS")}
        assert labels == {"Norte", "Centro-Oeste", "Nordeste"}

    def test_locf_year_and_starred(self, normalized):
        r = rows(normalized, atributo_1="RESIDENCIAIS", atributo_4="Nordeste")
        # starred year '2005*' → 2005 dates
        assert {x.data.year for x in r} == {2005}
        jan = [x for x in r if x.data.month == 1][0]
        assert jan.valor == 150.5  # base 150.0 + month offset 0 → '150.5'

    def test_title_case_and_coeste(self, normalized):
        labels = {r.atributo_4 for r in normalized.filter(F.col("atributo_4").isNotNull()).collect()}
        assert "Centro-Oeste" in labels
        assert "Nordeste" in labels  # accented initcap parity: NORDESTE → Nordeste

    def test_total_ano_dropped(self, normalized):
        # 13-column sheet: the pre-aggregated 999 column never survives
        assert not rows(normalized, valor=999.0)
        assert len(rows(normalized, atributo_1="INDUSTRIAIS")) == 36

    def test_locf_leading_null(self, normalized):
        # data row before any section marker keeps atributo_3 NULL (locf0)
        r = rows(normalized, atributo_1="TOTAL", atributo_4="Sistemas Remotos")
        assert len(r) == 12 and all(x.atributo_3 is None for x in r)
        r = rows(normalized, atributo_1="TOTAL", atributo_4="Norte")
        assert all(x.atributo_3 == "REGIÃO GEOGRÁFICA" for x in r)

    def test_subsistema_canonicalized_and_classe_rows(self, normalized):
        cativo = rows(normalized, atributo_1="CATIVO", atributo_4="Residencial")
        assert all(x.atributo_3 == "CLASSE" for x in cativo)
        resid = rows(normalized, atributo_1="RESIDENCIAIS", atributo_4="Nordeste")
        # NORDESTE sits under the SUBSISTEMA marker → canonical label
        assert all(x.atributo_3 == "SUBSISTEMA ELÉTRICO" for x in resid)

    def test_shape_b(self, normalized):
        ig = rows(normalized, atributo_1="INDUSTRIAL GENERO")
        assert len(ig) == 48  # 2 sectors × 24 months (TOTAL GENERO stripped)
        assert {x.atributo_3 for x in ig} == {"METALURGIA", "TEXTIL"}
        assert all(x.atributo_4 is None for x in ig)  # X11 typed-null pad
        met = [x for x in ig if x.atributo_3 == "METALURGIA"]
        assert {x.data.year for x in met} == {2004, 2005}
        jan04 = [x for x in met if x.data == dt.date(2004, 1, 1)][0]
        assert jan04.valor == 600.5

    def test_dates_first_of_month(self, normalized):
        assert normalized.filter(F.dayofmonth("data") != 1).count() == 0


class TestSemantic:
    def test_schema_and_counts(self, final):
        assert [f.name for f in final.schema.fields] == [
            "chave_seletora", "mercado", "dado", "classe",
            "abertura", "atributo", "data", "valor",
        ]
        # b1: RESIDENCIAIS(36) + INDUSTRIAIS(36) + CONSUMIDORES TOTAIS(24)
        # b2: 48; b3: 48; b4: CATIVO(48); b5: 48  — TOTAL / CONSUMO POR UF excluded
        assert final.count() == 36 + 36 + 24 + 48 + 48 + 48 + 48

    def test_branch1_class_mapping(self, final):
        assert {r.classe for r in rows(final, mercado="TOTAL", abertura="REGIÃO GEOGRÁFICA")} == {
            "RESIDENCIAL", "INDUSTRIAL", "NÃO RESIDENCIAL",
        }
        # CONSUMIDORES TOTAIS → TOTAIS → NÃO RESIDENCIAL, dado from subtitle
        nr = rows(final, classe="NÃO RESIDENCIAL")
        assert len(nr) == 24 and {r.dado for r in nr} == {"CONSUMIDORES"}

    def test_branch2_ramo(self, final):
        ramo = rows(final, abertura="RAMO")
        assert len(ramo) == 48
        assert {r.atributo for r in ramo} == {"METALURGIA", "TEXTIL"}
        assert {(r.mercado, r.classe, r.dado) for r in ramo} == {("TOTAL", "INDUSTRIAL", "CONSUMO")}

    def test_branch3_uf(self, final):
        uf = rows(final, mercado="TOTAL", abertura="UF")
        assert len(uf) == 48
        assert {r.atributo for r in uf} == {"SÃO PAULO", "RIO DE JANEIRO"}
        assert {r.classe for r in uf} == {"RESIDENCIAL"}

    def test_branch4_cativo_reset_rule(self, final):
        # class rows: abertura/atributo reset to TOTAL (R:254)
        cls = rows(final, mercado="CATIVO", classe="RESIDENCIAL")
        assert len(cls) == 12
        assert {(r.abertura, r.atributo) for r in cls} == {("TOTAL", "TOTAL")}
        # region rows: classe TOTAL, abertura kept
        reg = rows(final, mercado="CATIVO", classe="TOTAL", abertura="REGIÃO GEOGRÁFICA")
        assert {r.atributo for r in reg} == {"NORTE", "SUL"}

    def test_branch5_cativo_uf(self, final):
        b5 = rows(final, mercado="CATIVO", abertura="UF")
        assert len(b5) == 48
        assert {r.atributo for r in b5} == {"BAHIA", "CEARÁ"}

    def test_chave_seletora(self, final):
        r = rows(final, mercado="TOTAL", classe="RESIDENCIAL", abertura="REGIÃO GEOGRÁFICA")[0]
        assert r.chave_seletora == "CONSUMO - MERCADO TOTAL - CLASSE RESIDENCIAL - POR REGIÃO GEOGRÁFICA"

    def test_key_uniqueness_property(self, final):
        # chave_seletora is a function of (dado, mercado, classe, abertura)
        assert (
            final.select("chave_seletora", "dado", "mercado", "classe", "abertura")
            .distinct()
            .groupBy("chave_seletora")
            .count()
            .filter(F.col("count") > 1)
            .count()
            == 0
        )

    def test_specific_value(self, final):
        r = rows(final, mercado="TOTAL", classe="INDUSTRIAL",
                 abertura="REGIÃO GEOGRÁFICA", atributo="SUDESTE")
        march04 = [x for x in r if x.data == dt.date(2004, 3, 1)][0]
        assert march04.valor == 212.5  # base 210.0 + offset 2 → '212.5'
