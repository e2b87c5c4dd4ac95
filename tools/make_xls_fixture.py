#!/usr/bin/env python3
"""Generate the checked-in legacy .xls (BIFF8) test fixtures.

Writes real Excel 97-2003 binary workbooks — an OLE2/CFB compound
container ([MS-CFB]) holding a BIFF8 "Workbook" stream ([MS-XLS]) —
with nothing but the Python stdlib, so the fixtures are produced
independently of the Scala reader they test. The logical content is
shared with make_xlsx_fixture.py via fixture_content.py, so
WorkbookConfigSpec can require byte-for-byte identical parses across
the two formats.

Record coverage on purpose: LABELSST via an SST (the hld workbook's
SST is split with a CONTINUE record in the middle of a UTF-16 char
array, the hairiest reader path), RK for lone integers, MULRK for
runs of consecutive integers, NUMBER for non-integers, BOOLERR for
booleans. Streams under 4096 bytes land in the CFB mini-stream, like
Excel writes small files.

Usage: python3 tools/make_xls_fixture.py
Writes src/main/resources/graft/fixtures/chill_conf.xls and hld.xls.
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fixture_content

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def rec(typ, payload=b""):
    return struct.pack("<HH", typ, len(payload)) + payload


def bof(dt):
    # vers=BIFF8, dt, rupBuild/rupYear as Excel 97 writes them
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def unicode_str(s, cch_width):
    """XLUnicodeString (cch u16) / ShortXLUnicodeString (cch u8)."""
    try:
        body, flags = s.encode("latin-1"), 0
    except UnicodeEncodeError:
        body, flags = s.encode("utf-16-le"), 1
    return struct.pack("<%sB" % cch_width, len(s), flags) + body


def rk_encodable(v):
    return isinstance(v, int) and -(1 << 29) <= v < (1 << 29)


def rk_bits(v):
    return ((v << 2) | 2) & 0xFFFFFFFF


class XlsWorkbook:
    def __init__(self):
        self.sheets = []  # (name, rows)
        self.sst = {}     # string -> index
        self.sst_refs = 0

    def add_sheet(self, name, rows):
        self.sheets.append((name, rows))

    def _sst_index(self, s):
        self.sst_refs += 1
        if s not in self.sst:
            self.sst[s] = len(self.sst)
        return self.sst[s]

    def _cell_records(self, rows):
        out = []
        for r, row in enumerate(rows):
            row = [] if row == [None] else (row or [])
            c = 0
            while c < len(row):
                v = row[c]
                if v is None:
                    c += 1
                elif isinstance(v, bool):
                    out.append(rec(0x0205,  # BOOLERR, fError=0
                                   struct.pack("<HHHBB", r, c, 0, 1 if v else 0, 0)))
                    c += 1
                elif isinstance(v, (int, float)):
                    # gather a run of consecutive RK-encodable ints -> MULRK
                    run = []
                    while c + len(run) < len(row) and rk_encodable(row[c + len(run)]) \
                            and not isinstance(row[c + len(run)], bool):
                        run.append(row[c + len(run)])
                    if len(run) >= 2:
                        body = struct.pack("<HH", r, c)
                        for i, x in enumerate(run):
                            body += struct.pack("<HI", 0, rk_bits(x))
                        body += struct.pack("<H", c + len(run) - 1)
                        out.append(rec(0x00BD, body))  # MULRK
                        c += len(run)
                    elif len(run) == 1:
                        out.append(rec(0x027E,  # RK
                                       struct.pack("<HHHI", r, c, 0, rk_bits(run[0]))))
                        c += 1
                    else:
                        out.append(rec(0x0203,  # NUMBER
                                       struct.pack("<HHHd", r, c, 0, float(v))))
                        c += 1
                else:
                    out.append(rec(0x00FD,  # LABELSST
                                   struct.pack("<HHHI", r, c, 0, self._sst_index(str(v)))))
                    c += 1
        return b"".join(out)

    def _sst_records(self, split_mid_string=False):
        """SST record, optionally split with a CONTINUE in the middle
        of the longest string's character array (the continuation
        re-states the compression flag byte, per [MS-XLS] 2.5.268)."""
        items = sorted(self.sst, key=self.sst.get)
        head = struct.pack("<II", self.sst_refs, len(items))
        if not split_mid_string or not items:
            body = b"".join(unicode_str(s, "H") for s in items)
            return rec(0x00FC, head + body)
        # split inside a UTF-16 string when one exists (widest coverage)
        wide = [i for i in range(len(items))
                if any(ord(ch) > 0xFF for ch in items[i])]
        longest = max(wide or range(len(items)), key=lambda i: len(items[i]))
        first, cont = head, b""
        for i, s in enumerate(items):
            enc = unicode_str(s, "H")
            if i < longest:
                first += enc
            elif i > longest:
                cont += enc
            else:
                # split after half the chars; CONTINUE re-opens with
                # the same compression flag byte
                flags = enc[2]
                width = 2 if flags & 1 else 1
                cut = 3 + (len(s) // 2) * width
                first += enc[:cut]
                cont = bytes([flags]) + enc[cut:] + cont
        return rec(0x00FC, first) + rec(0x003C, cont)  # SST + CONTINUE

    def biff_stream(self, split_sst=False):
        sheet_streams = []
        for _, rows in self.sheets:
            sheet_streams.append(bof(0x0010) + self._cell_records(rows) + rec(0x000A))
        # globals: BOF, BOUNDSHEETs (offsets patched below), SST, EOF
        bs_payloads = [struct.pack("<IH", 0, 0) + unicode_str(n, "B")
                       for n, _ in self.sheets]
        globals_ = bof(0x0005)
        bs_at = []
        for p in bs_payloads:
            bs_at.append(len(globals_) + 4)
            globals_ += rec(0x0085, p)
        globals_ += self._sst_records(split_mid_string=split_sst) + rec(0x000A)
        stream = bytearray(globals_)
        offsets = []
        for s in sheet_streams:
            offsets.append(len(stream))
            stream += s
        for at, off in zip(bs_at, offsets):
            stream[at:at + 4] = struct.pack("<I", off)
        return bytes(stream)


def cfb(stream, name="Workbook"):
    """Wrap a single stream in a v3 OLE2 compound file (512B sectors,
    64B mini sectors, 4096B mini cutoff). Streams under the cutoff go
    through the mini-stream, the way Excel writes small workbooks."""
    def pad(b, unit, fill=b"\x00"):
        return b + fill * (-len(b) % unit)

    def dir_entry(ename, etype, start, size, child=-1):
        nb = ename.encode("utf-16-le")
        e = pad(nb + b"\x00\x00", 64)[:64] if ename else b"\x00" * 64
        e += struct.pack("<HBB", len(nb) + 2 if ename else 0, etype, 1)
        e += struct.pack("<iii", -1, -1, child)
        e += b"\x00" * 36  # CLSID, state bits, create/modify times
        e += struct.pack("<IQ", start & 0xFFFFFFFF, size)
        assert len(e) == 128
        return e

    def seq_chain(first, n):
        return {first + i: (first + i + 1 if i + 1 < n else ENDOFCHAIN)
                for i in range(n)}

    if len(stream) < 4096:
        container = pad(stream, 64)
        n_mini = len(container) // 64
        minifat = pad(b"".join(
            struct.pack("<I", i + 1 if i + 1 < n_mini else ENDOFCHAIN)
            for i in range(n_mini)), 512, fill=b"\xff")
        container_secs = [container[i:i + 512]
                         for i in range(0, len(pad(container, 512)), 512)]
        # layout: 0=FAT, 1=dir, 2=minifat, 3..=mini-stream container
        directory = (dir_entry("Root Entry", 5, 3, len(container), child=1)
                     + dir_entry(name, 2, 0, len(stream))
                     + dir_entry("", 0, 0, 0) * 2)
        sectors = [pad(directory, 512), minifat] + \
            [pad(s, 512) for s in container_secs]
        chain = {1: ENDOFCHAIN, 2: ENDOFCHAIN, **seq_chain(3, len(container_secs))}
        first_minifat, n_minifat = 2, 1
    else:
        body_secs = [pad(stream, 512)[i:i + 512]
                     for i in range(0, len(pad(stream, 512)), 512)]
        # layout: 0=FAT, 1=dir, 2..=workbook stream
        directory = (dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1)
                     + dir_entry(name, 2, 2, len(stream))
                     + dir_entry("", 0, 0, 0) * 2)
        sectors = [pad(directory, 512)] + body_secs
        chain = {1: ENDOFCHAIN, **seq_chain(2, len(body_secs))}
        first_minifat, n_minifat = ENDOFCHAIN, 0

    n_sectors = 1 + len(sectors)  # FAT itself is sector 0
    assert n_sectors <= 128, "fixture outgrew a single FAT sector"
    fat = pad(struct.pack("<I", FATSECT)
              + b"".join(struct.pack("<I", chain[s]) for s in range(1, n_sectors)),
              512, fill=b"\xff")

    header = struct.pack(
        "<8s16sHHHHH6sIIIIIIIII",
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", b"\x00" * 16,
        0x003E,       # minor version
        0x0003,       # major version 3 (512B sectors)
        0xFFFE,       # little-endian byte order mark
        9, 6,         # sector / mini-sector shifts
        b"\x00" * 6,  # reserved
        0,            # number of directory sectors (v3: always 0)
        1,            # number of FAT sectors
        1,            # first directory sector
        0,            # transaction signature
        4096,         # mini-stream cutoff
        first_minifat, n_minifat,
        ENDOFCHAIN, 0)  # first DIFAT sector, number of DIFAT sectors
    header += struct.pack("<I", 0) + struct.pack("<I", FREESECT) * 108
    assert len(header) == 512
    return header + fat + b"".join(sectors)


def write(path, sheets, split_sst=False):
    wb = XlsWorkbook()
    for n, rows in sheets:
        wb.add_sheet(n, rows)
    with open(path, "wb") as f:
        f.write(cfb(wb.biff_stream(split_sst=split_sst)))


if __name__ == "__main__":
    os.chdir(os.path.join(os.path.dirname(__file__) or ".", ".."))
    write("src/main/resources/graft/fixtures/chill_conf.xls",
          fixture_content.chill_sheets())
    write("src/main/resources/graft/fixtures/hld.xls",
          fixture_content.hld_sheets(), split_sst=True)
    print("wrote src/main/resources/graft/fixtures/chill_conf.xls and hld.xls")
