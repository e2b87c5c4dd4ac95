#!/usr/bin/env python3
"""Generate small real image fixtures for the ImageCodec spec.

Written with the Python stdlib only (struct + zlib), independently of
the Scala codec they validate: if graft.functions.ImageCodec parses
these to the dimensions below, encode/decode bugs can't cancel out.

Usage: python3 tools/make_image_fixtures.py
Writes src/test/resources/graft/images/{sample.png,sample.bmp,
sample.gif,sample.jpg} — dimensions 300x5 (two-byte widths on
purpose).
"""
import os
import struct
import sys
import zlib

W, H = 300, 5


def png(path):
    def chunk(tag, body):
        data = tag + body
        return struct.pack(">I", len(body)) + data + struct.pack(
            ">I", zlib.crc32(data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + bytes((x * 3 + y) % 256 for x in range(W * 3))
        for y in range(H))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def bmp(path):
    row = (W * 3 + 3) & ~3
    pixels = b"".join(
        bytes((x + y) % 256 for x in range(W * 3)).ljust(row, b"\x00")
        for y in range(H))
    with open(path, "wb") as f:
        f.write(b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
        f.write(pixels)


def gif(path):
    with open(path, "wb") as f:
        # flags 0x70: no global color table, 8-bit color resolution
        f.write(b"GIF89a" + struct.pack("<HHBBB", W, H, 0x70, 0, 0) + b"\x3b")


def jpeg(path):
    sof0 = struct.pack(">HHBHHB", 0xFFC0, 17, 8, H, W, 3) + \
        bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    with open(path, "wb") as f:
        f.write(b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 16)
                + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        f.write(sof0 + b"\xff\xd9")


if __name__ == "__main__":
    os.chdir(os.path.join(os.path.dirname(__file__) or ".", ".."))
    d = "src/test/resources/graft/images"
    os.makedirs(d, exist_ok=True)
    png(d + "/sample.png")
    bmp(d + "/sample.bmp")
    gif(d + "/sample.gif")
    jpeg(d + "/sample.jpg")
    print("wrote %s/sample.{png,bmp,gif,jpg} at %dx%d" % (d, W, H))
