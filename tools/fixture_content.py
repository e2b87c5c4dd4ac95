"""Shared logical content for the workbook fixtures.

Both generators (make_xlsx_fixture.py → OOXML, make_xls_fixture.py →
BIFF8) render exactly these sheets, so the two checked-in fixture
pairs are guaranteed to carry identical data and WorkbookConfigSpec
can require the parsed LibraryConfig to be identical across formats.
"""


def chill_sheets():
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
    return [("Chill", rows)]


def hld_sheets():
    sheets = [
        ("Front Page", [
            ["Library Name", "PM_LIB_WB"],
            ["Version", "2.1"],
            ["Vendor", "ACME"],
            [None],
            ["Revision History"],
            ["1.0", "initial"],
            ["2.1", "added TBL_B"],
        ]),
        ("Library Info", [
            [None, "Library Name", "PM_LIB_WB"],
            [None, "Version", "2.1"],
            [None, "Schema", "PM_SCHEMA"],
            [None, "Table Retention:"],
            [None, "5M", 30],
            [None, "DY", 3650],
        ]),
        # Entities is metadata WorkbookConfig skips; it carries a
        # non-Latin string (UTF-16 path), a run of consecutive
        # numeric cells (BIFF MULRK packing), a non-integer (BIFF
        # NUMBER) and a boolean (BIFF BOOLERR) so both readers get
        # exercised beyond the config surface.
        ("Entities", [
            [None, "Entity", "Description"],
            [None],
            [None],
            [None, "GRP", "counter group 東京"],
            [None, 10, 20, 300],
            [None, 2.5, True],
        ]),
        # parse_table shape: labels in row 0 from column B, two spacer
        # rows, data from row 3 (df.iloc[2:,1:] after the header row)
        ("Tables", [
            [None, "Counter Group in RD", "Table Name", "Base Granularity"],
            [None, "(counter group in the raw feed)"],
            [None],
            [None, "A", "TBL_A", "5M"],
            [None, "B", "TBL_B", "5M"],
        ]),
    ]
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
    sheets.append(("Key_Counters_Kpis", counter_rows))
    return sheets
