"""Tests for the dependency-free xlsx writer/reader (utils/xlsx.py).

Parity target: the reference publishes results as Excel workbooks
(``results/*.xlsx``) and appends rows via ``append_df_to_excel``
(reference ``measures.py:33-116``).  The reader is additionally validated
against the reference's own committed workbooks when they are present.
"""

import os
import zipfile

import pytest

from zeronotesamba_tpu.utils.xlsx import (
    append_rows, col_letter, parse_ref, read_xlsx, rows_from_table, write_xlsx,
)

REF_RESULTS = "/root/reference/results"


def test_col_letter_and_parse_ref():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"]
    assert parse_ref("A1") == (0, 0)
    assert parse_ref("G20") == (19, 6)
    assert parse_ref("AA10") == (9, 26)
    for i in (0, 25, 26, 700, 16383):
        r, c = parse_ref(f"{col_letter(i)}7")
        assert (r, c) == (6, i)
    with pytest.raises(ValueError):
        parse_ref("1A")


def test_roundtrip_mixed_types(tmp_path):
    path = str(tmp_path / "wb.xlsx")
    sheets = {
        "Sheet1": [
            ["dataset", "f1", "n", "ok", None],
            ["GTZAN", 0.875, 100, True, None],
            ["SMC <&> \"q\"", -0.5, 0, False, "trailing"],
            [],
            [None, 1e-12],
        ],
        "Second": [["only", "one", "row"]],
    }
    write_xlsx(path, sheets)
    out = read_xlsx(path)
    assert list(out) == ["Sheet1", "Second"]
    assert out["Sheet1"][0][:4] == ["dataset", "f1", "n", "ok"]
    assert out["Sheet1"][1] == ["GTZAN", 0.875, 100, True, None]
    assert out["Sheet1"][2][0] == 'SMC <&> "q"'
    assert out["Sheet1"][2][3] is False
    assert out["Sheet1"][4][1] == pytest.approx(1e-12)
    # ints survive as ints, floats as floats
    assert isinstance(out["Sheet1"][1][2], int)
    assert isinstance(out["Sheet1"][1][1], float)
    assert out["Second"] == [["only", "one", "row"]]


def test_package_structure_is_valid_ooxml(tmp_path):
    path = str(tmp_path / "wb.xlsx")
    write_xlsx(path, {"S": [["x"]]})
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"} <= names


def test_append_rows_semantics(tmp_path):
    path = str(tmp_path / "wb.xlsx")
    append_rows(path, [["h1", "h2"]], sheet_name="res")  # creates file
    append_rows(path, [[1, 2.5], [3, 4.5]], sheet_name="res")  # appends
    append_rows(path, [["other"]], sheet_name="extra")  # new sheet, same file
    out = read_xlsx(path)
    assert out["res"] == [["h1", "h2"], [1, 2.5], [3, 4.5]]
    assert out["extra"] == [["other"]]


def test_rows_from_table():
    rows = rows_from_table(
        ["a", "b"], [{"a": 1, "b": 2}, {"a": 3}], title="T")
    assert rows == [["T"], ["a", "b"], [1, 2], [3, None]]


def test_export_builders_from_committed_evidence(tmp_path):
    """The six reference-named workbooks render from the repo's own JSONs."""
    from zeronotesamba_tpu.experiments.report_xlsx import export

    src = "results/synthetic"
    if not os.path.exists(os.path.join(src, "summary.json")):
        pytest.skip("committed evidence not present")
    manifest = export(src, str(tmp_path / "xlsx"))
    assert set(manifest["written"]) >= {
        "unsupervised.xlsx", "supervised.xlsx", "cross_data.xlsx",
        "few_shot.xlsx", "measures.xlsx", "beat_tracking.xlsx"}
    sup = read_xlsx(str(tmp_path / "xlsx" / "supervised.xlsx"))
    rows = next(iter(sup.values()))
    # header + at least per-seed rows; F1 cells are numeric
    header = rows[1]
    assert header[:4] == ["seed", "arm", "F1", "F1_std"]
    assert all(isinstance(r[2], float) for r in rows[2:] if r[2] is not None)


def test_measures_report_writes_xlsx_twin(tmp_path):
    from zeronotesamba_tpu.experiments.measures import QUANTILES, write_measures_report

    table = {"gini": {**{f"q{q}": 0.1 for q in QUANTILES}, "mean": 0.2}}
    out = str(tmp_path / "measures")
    write_measures_report(table, out, "armA", run_id="r", fresh=True)
    write_measures_report(table, out, "armB", run_id="r")
    wb = read_xlsx(out + ".xlsx")
    rows = wb["measures"]
    assert rows[0][:3] == ["run_id", "label", "measure"]
    assert [r[1] for r in rows[1:]] == ["armA", "armB"]
    assert rows[1][2] == "gini" and rows[1][-1] == 0.2
    # fresh=True truncates rather than appending a second header block
    write_measures_report(table, out, "armA", run_id="r2", fresh=True)
    rows = read_xlsx(out + ".xlsx")["measures"]
    assert len(rows) == 2 and rows[1][0] == "r2"


@pytest.mark.skipif(not os.path.isdir(REF_RESULTS),
                    reason="reference workbooks not present")
def test_reads_reference_workbooks():
    """Reader handles real openpyxl/Excel output: the reference's own tables.

    Anchors: the unsupervised workbook's dataset headers (sharedStrings path)
    and the supervised workbook's G20 = 0.875 GTZAN headline (BASELINE.md
    north star).
    """
    unsup = read_xlsx(os.path.join(REF_RESULTS, "unsupervised.xlsx"))
    sheet = next(iter(unsup.values()))
    flat = {c for row in sheet for c in row if isinstance(c, str)}
    assert {"SMC Mirex", "Ballroom", "Hainsworth"} <= flat

    sup = read_xlsx(os.path.join(REF_RESULTS, "supervised.xlsx"))
    sheet = next(iter(sup.values()))
    r, c = parse_ref("G20")
    val = sheet[r][c]
    assert float(val) == pytest.approx(0.875, abs=1e-6)
