#!/usr/bin/env python3
"""Generate the checked-in .xlsx test fixtures for WorkbookConfig.

Writes real OOXML SpreadsheetML packages with nothing but the Python
stdlib (zipfile + hand-built XML), so the fixtures are produced
independently of the Scala reader they test. Strings go through the
shared-string table (like Excel itself writes) except one inlineStr
cell per workbook to exercise that parser path too.

Usage: python3 tools/make_xlsx_fixture.py
Writes src/main/resources/graft/fixtures/chill_conf.xlsx and hld.xlsx.
"""
import os
import zipfile
from xml.sax.saxutils import escape


def col_ref(i):
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


class Workbook:
    def __init__(self):
        self.sheets = []  # (name, rows)
        self.shared = {}

    def add_sheet(self, name, rows):
        self.sheets.append((name, rows))

    def _sst_index(self, s):
        if s not in self.shared:
            self.shared[s] = len(self.shared)
        return self.shared[s]

    def _cell_xml(self, r, c, value, inline=False):
        ref = f"{col_ref(c)}{r + 1}"
        if value is None:
            return ""
        if isinstance(value, bool):
            return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
        if isinstance(value, (int, float)):
            return f'<c r="{ref}"><v>{value}</v></c>'
        s = str(value)
        if inline:
            return f'<c r="{ref}" t="inlineStr"><is><t>{escape(s)}</t></is></c>'
        return f'<c r="{ref}" t="s"><v>{self._sst_index(s)}</v></c>'

    def _sheet_xml(self, rows, inline_at=None):
        body = []
        for ri, row in enumerate(rows):
            cells = "".join(
                self._cell_xml(ri, ci, v, inline=(inline_at == (ri, ci)))
                for ci, v in enumerate(row))
            body.append(f'<row r="{ri + 1}">{cells}</row>')
        return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(body) + "</sheetData></worksheet>")

    def write(self, path, inline_cell=None):
        # inline_cell: (sheet_index, row, col) rendered as inlineStr
        sheet_xmls = []
        for si, (_, rows) in enumerate(self.sheets):
            at = inline_cell[1:] if inline_cell and inline_cell[0] == si else None
            sheet_xmls.append(self._sheet_xml(rows, inline_at=at))

        n = len(self.sheets)
        content_types = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                for i in range(n))
            + '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
            '</Types>')
        root_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            '</Relationships>')
        workbook = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                f'<sheet name="{escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, (name, _) in enumerate(self.sheets))
            + "</sheets></workbook>")
        wb_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(n))
            + f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
            '</Relationships>')
        sst_items = sorted(self.shared, key=self.shared.get)
        sst = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            f'count="{len(sst_items)}" uniqueCount="{len(sst_items)}">'
            + "".join(f"<si><t>{escape(s)}</t></si>" for s in sst_items)
            + "</sst>")

        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml", content_types)
            z.writestr("_rels/.rels", root_rels)
            z.writestr("xl/workbook.xml", workbook)
            z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
            z.writestr("xl/sharedStrings.xml", sst)
            for i, xml in enumerate(sheet_xmls):
                z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)


def chill_conf():
    wb = Workbook()
    # row layout mirrors Partrans.parse_conf_file: scalar (key, value)
    # rows; a 'view' marker then (name, sql) rows; a 'field' marker
    # then (name, source, tag, inputs, value, function, view, default,
    # cs) rows. Functions for filename/tag/lookup fields use the
    # reference's Python-eval shapes, which WorkbookConfig parses
    # structurally.
    rows = [
        ["library", "PM_LIB_WB"],
        ["schema", "PM_SCHEMA"],
        ["format", "csv"],
        ["delimiter", "|"],
        ["input_rd", "__RAW_DIR__"],
        ["input_rd_mask", "*.csv"],
        ["valid_lines", "[2:-1]"],
        ["ignore_lines", "JUNK"],
        ["raw_columns", "id,grp,cnt"],
        ["partition_col", "day"],
        [None],
        ["view"],
        ["grp_vw", "SELECT g_code, g_name FROM grp_dim"],
        ["field"],
        ["OM_GROUP", "column", None, "grp", None, "arg1"],
        ["lib", "constant", None, None, "PM_LIB", None, None, None, "ALL"],
        ["day", "filename", None, None, None,
         r"re.search('F_(\d{8})\.csv',arg1).group(1)", None, None, "ALL"],
        ["region", "tag", "#REGION", None, None,
         r"re.search('#REGION=(\w+)',tag).group(1)", None, None, "ALL"],
        ["idn", "column", None, "id", None, "CAST(arg1 AS BIGINT)", None, None, "ALL"],
        ["cnt10", "column", None, "cnt, id", None,
         "CAST(arg1 AS BIGINT) * 10 + CAST(arg2 AS BIGINT)", None, None, "ALL"],
        ["grp_name", "lookup", None, "grp", None,
         "view[view['g_code']==arg1]['g_name'].values[0]", "grp_vw", "UNKNOWN", "ALL"],
    ]
    wb.add_sheet("Chill", rows)
    # delimiter value as inlineStr: row 3 col 1
    wb.write("src/main/resources/graft/fixtures/chill_conf.xlsx", inline_cell=(0, 3, 1))


def hld():
    wb = Workbook()
    wb.add_sheet("Front Page", [
        ["Library Name", "PM_LIB_WB"],
        ["Version", "2.1"],
        ["Vendor", "ACME"],
        [None],
        ["Revision History"],
        ["1.0", "initial"],
        ["2.1", "added TBL_B"],
    ])
    wb.add_sheet("Library Info", [
        [None, "Library Name", "PM_LIB_WB"],
        [None, "Version", "2.1"],
        [None, "Schema", "PM_SCHEMA"],
        [None, "Table Retention:"],
        [None, "5M", 30],
        [None, "DY", 3650],
    ])
    wb.add_sheet("Entities", [
        [None, "Entity", "Description"],
        [None],
        [None],
        [None, "GRP", "counter group"],
    ])
    # parse_table shape: labels in row 0 from column B, two spacer
    # rows, data from row 3 (df.iloc[2:,1:] after the header row)
    wb.add_sheet("Tables", [
        [None, "Counter Group in RD", "Table Name", "Base Granularity"],
        [None, "(counter group in the raw feed)"],
        [None],
        [None, "A", "TBL_A", "5M"],
        [None, "B", "TBL_B", "5M"],
    ])
    cols = ["day", "idn", "grp_name", "cnt10", "lib", "region"]
    counter_rows = [
        [None, "Table Name", "Counter/KPI DB Name", "Raw Data Counter Name/OID",
         "TYPE", "KPI Formula"],
        [None, "(one row per physical column)"],
        [None],
    ]
    for t in ["TBL_A", "TBL_B"]:
        for c in cols:
            counter_rows.append([None, t, c, c, "Counter", None])
    counter_rows.append([None, "TBL_A", "cnt_per_id", "cnt10, idn", "KPI",
                         "CAST(arg1 AS DOUBLE) / arg2"])
    wb.add_sheet("Key_Counters_Kpis", counter_rows)
    wb.write("src/main/resources/graft/fixtures/hld.xlsx")


if __name__ == "__main__":
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    chill_conf()
    hld()
    print("wrote src/main/resources/graft/fixtures/chill_conf.xlsx and hld.xlsx")
