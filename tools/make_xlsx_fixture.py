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
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fixture_content
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
    for name, rows in fixture_content.chill_sheets():
        wb.add_sheet(name, rows)
    # delimiter value as inlineStr: row 3 col 1
    wb.write("src/main/resources/graft/fixtures/chill_conf.xlsx", inline_cell=(0, 3, 1))


def hld():
    wb = Workbook()
    for name, rows in fixture_content.hld_sheets():
        wb.add_sheet(name, rows)
    wb.write("src/main/resources/graft/fixtures/hld.xlsx")


if __name__ == "__main__":
    os.chdir(os.path.join(os.path.dirname(__file__) or ".", ".."))
    chill_conf()
    hld()
    print("wrote src/main/resources/graft/fixtures/chill_conf.xlsx and hld.xlsx")
