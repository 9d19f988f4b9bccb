"""Native XLSX reader (stdlib zip+XML) — fixture built by hand so the
reader is independent of any spreadsheet library."""

import zipfile

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.sources import read, st_read_xlsx

_CT = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""

_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="zones" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_SS = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>name</t></si><si><t>size</t></si><si><t>wkt</t></si><si><t>alpha</t></si>
</sst>"""


def _sheet_xml():
    rows = ['<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
            '<c r="C1" t="s"><v>2</v></c></row>']
    for i in range(2, 7):
        wkt = f"POINT ({i} {i * 2})"
        rows.append(
            f'<row r="{i}"><c r="A{i}" t="s"><v>3</v></c>'
            f'<c r="B{i}"><v>{i * 1.5}</v></c>'
            f'<c r="C{i}" t="inlineStr"><is><t>{wkt}</t></is></c></row>'
        )
    return ('<?xml version="1.0"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            '<sheetData>' + "".join(rows) + "</sheetData></worksheet>")


def _mk_xlsx(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("xl/workbook.xml", _WB)
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS)
        zf.writestr("xl/sharedStrings.xml", _SS)
        zf.writestr("xl/worksheets/sheet1.xml", _sheet_xml())


def test_read_xlsx(spark, tmp_path):
    p = str(tmp_path / "fix.xlsx")
    _mk_xlsx(p)
    df = st_read_xlsx(spark, p, wkt_col="wkt")
    assert set(df.columns) == {"name", "size", "wkt", "geom"}
    got = df.agg(F.count("*").alias("n"),
                 F.round(F.sum("size"), 2).alias("s"),
                 F.sum(ST.st_x("geom")).alias("sx")).collect()[0]
    assert got["n"] == 5
    assert got["s"] == sum(i * 1.5 for i in range(2, 7))
    assert got["sx"] == float(sum(range(2, 7)))


def test_read_xlsx_by_sheet_and_dispatch(spark, tmp_path):
    p = str(tmp_path / "fix2.xlsx")
    _mk_xlsx(p)
    assert st_read_xlsx(spark, p, sheet="zones").count() == 5
    with pytest.raises(ValueError, match="no sheet"):
        st_read_xlsx(spark, p, sheet="nope")
    assert read(spark, p).count() == 5


def test_spatial_filter_option(spark, tmp_path):
    from duckdb_spatial_spark.geom.wkt import from_wkt
    from duckdb_spatial_spark.geom.wkb import to_wkb

    p = str(tmp_path / "fix3.xlsx")
    _mk_xlsx(p)
    box = to_wkb(from_wkt("POLYGON ((0 0, 4.5 0, 4.5 20, 0 20, 0 0))"))
    df = read(spark, p, wkt_col="wkt", spatial_filter=box)
    assert df.count() == 3  # points x=2,3,4 inside; 5,6 out
