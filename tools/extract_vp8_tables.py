"""Regenerate ``multimodal/vp8_tables.py`` from the system libwebp.

The RFC 6386 VP8 default probability / quantizer tables (~3 KiB of
constants) are public data, but they are not reliably reproducible from
memory — the same reasoning that had ``tools/libjpeg_ref.py`` validate
the arithmetic-JPEG decoder against independent libjpeg-turbo
bitstreams applies: the only honest local source is the system codec
binary itself.  This tool locates each table in ``libwebp.so``'s
``.rodata`` by CONTENT (anchored byte-pattern searches, not hardcoded
offsets, so any build of the library works), cross-checks the decoder
and encoder copies against each other where both exist, and emits the
generated module that ``multimodal/vp8.py`` imports.  The generated
file is committed so tests never need the .so; re-running this tool
must reproduce it bit-for-bit.

Tables extracted here:
- COEFF_PROBS     [4][8][3][11]  default DCT token probabilities
- COEFF_UPDATE_PROBS same shape  header prob-update gate probabilities
- KF_BMODE_PROBS  [10][10][9]    keyframe 4x4 submode probabilities
- DC_QLOOKUP/AC_QLOOKUP [128]    quantizer lookups
- ZIGZAG [16], BANDS [17], CAT3/CAT4/CAT5/CAT6 extra-bit probabilities

Small constants stated in RFC 6386 prose (token/mode trees, kf mode
probs, CAT1/CAT2) live in ``vp8.py`` itself; every one of them is
exercised by the bit-exact decode tests against libwebp output, which
is a stronger check than extraction.

Usage: python tools/extract_vp8_tables.py [libwebp.so path]
"""

from __future__ import annotations

import re
import struct
import subprocess
import sys

OUT = "image_matadata_batchprocessing_aws_spark/multimodal/vp8_tables.py"

# content anchors (validated fragments of the public RFC 6386 tables)
ANCHOR_COEFF_ROW = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
ANCHOR_BMODE_ROW = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
ANCHOR_ZIGZAG = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
ANCHOR_BANDS = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0])
ANCHOR_AC_PREFIX = struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11)
ANCHOR_DC_PREFIX = bytes([4, 5, 6, 7, 8, 9, 10, 10])


def rodata(path: str) -> bytes:
    txt = subprocess.run(
        ["readelf", "-x", ".rodata", path], capture_output=True, text=True,
        check=True,
    ).stdout
    data = bytearray()
    for line in txt.splitlines():
        m = re.match(r"\s*0x[0-9a-f]+ ((?:[0-9a-f]{2,8} ?){1,4})", line)
        if m:
            data.extend(bytes.fromhex(m.group(1).replace(" ", "")))
    return bytes(data)


def find_all(data: bytes, needle: bytes) -> list[int]:
    out, i = [], data.find(needle)
    while i != -1:
        out.append(i)
        i = data.find(needle, i + 1)
    return out


def unique_copies(data: bytes, starts: list[int], length: int, what: str) -> bytes:
    blocks = {data[s : s + length] for s in starts}
    if len(blocks) != 1:
        raise SystemExit(f"{what}: {len(starts)} copies disagree")
    return blocks.pop()


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "libwebp.so.7"
    import ctypes.util

    if "/" not in path:
        path = f"/lib/x86_64-linux-gnu/{path}"
    data = rodata(path)

    # COEFF_PROBS: libwebp stores the never-read (type 0, band 0) group
    # as 33 bytes of 128 ahead of the first RFC-visible row
    hits = find_all(data, ANCHOR_COEFF_ROW)
    starts = [h - 33 for h in hits]
    for s in starts:
        if not all(b == 128 for b in data[s : s + 33]):
            raise SystemExit("coeff-probs anchor misaligned")
    coeff = unique_copies(data, starts, 1056, "COEFF_PROBS")

    # KF_BMODE_PROBS anchors both itself and the update table that
    # immediately precedes it in tree_dec.c
    hits = find_all(data, ANCHOR_BMODE_ROW)
    bmode = unique_copies(data, hits, 900, "KF_BMODE_PROBS")
    # libwebp's submode enum orders (DC,TM,VE,HE,RD,VR,LD,...) while the
    # RFC 6386 intra_bmode enum orders (DC,TM,VE,HE,LD,RD,VR,...): remap
    # both neighbor axes to RFC numbering (validated: without the remap
    # B_PRED macroblocks whose neighbors use the diagonal modes decode
    # the wrong mode bits; with it every fixture decodes bit-exact)
    inv = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # RFC index -> libwebp index
    b3 = [
        [[bmode[(inv[a] * 10 + inv[l]) * 9 + p] for p in range(9)]
         for l in range(10)]
        for a in range(10)
    ]
    bmode = bytes(v for a in b3 for l in a for v in l)
    upd = unique_copies(data, [h - 1056 for h in hits], 1056, "COEFF_UPDATE_PROBS")
    if not all(1 <= b <= 255 for b in upd) or upd.count(255) < 600:
        raise SystemExit("update-probs block failed sanity")

    zz = unique_copies(data, find_all(data, ANCHOR_ZIGZAG), 16, "ZIGZAG")
    bands = unique_copies(data, find_all(data, ANCHOR_BANDS), 17, "BANDS")

    # cats: cat6(11) NUL cat5(5) NUL cat4(4) NUL cat3(3) after zigzag
    zstart = find_all(data, ANCHOR_ZIGZAG)[0]
    tail = data[zstart + 16 : zstart + 16 + 28]
    cat6, cat5, cat4, cat3 = tail[0:11], tail[12:17], tail[18:22], tail[23:26]
    for c in (cat3, cat4, cat5, cat6):
        if not all(1 <= b <= 255 for b in c):
            raise SystemExit("cat tables failed sanity")

    ac_hits = find_all(data, ANCHOR_AC_PREFIX)
    ac_raw = unique_copies(data, ac_hits, 256, "AC_QLOOKUP")
    ac = struct.unpack("<128H", ac_raw)
    if ac[-1] != 284 or any(ac[i] > ac[i + 1] for i in range(127)):
        raise SystemExit("AC_QLOOKUP failed sanity")
    dc_hits = [
        h for h in find_all(data, ANCHOR_DC_PREFIX)
        if all(data[h + i] <= data[h + i + 1] for i in range(127))
    ]
    dc = unique_copies(data, dc_hits, 128, "DC_QLOOKUP")
    if dc[-1] != 157:
        raise SystemExit("DC_QLOOKUP failed sanity")

    def fmt(name: str, vals, per: int = 16) -> str:
        body = "\n".join(
            "    " + " ".join(f"{v}," for v in vals[i : i + per])
            for i in range(0, len(vals), per)
        )
        return f"{name} = [\n{body}\n]\n"

    with open(OUT, "w") as fh:
        fh.write(
            '"""VP8 (RFC 6386) default tables, extracted from the system\n'
            "libwebp binary by ``tools/extract_vp8_tables.py`` (content-\n"
            "anchored .rodata search, decoder/encoder copies cross-checked).\n"
            "GENERATED FILE - regenerate with the tool, do not hand-edit.\n"
            '"""\n\n'
        )
        fh.write(fmt("COEFF_PROBS", list(coeff)))
        fh.write(fmt("COEFF_UPDATE_PROBS", list(upd)))
        fh.write(fmt("KF_BMODE_PROBS", list(bmode)))
        fh.write(fmt("DC_QLOOKUP", list(dc)))
        fh.write(fmt("AC_QLOOKUP", list(ac)))
        fh.write(fmt("ZIGZAG", list(zz)))
        fh.write(fmt("BANDS", list(bands)))
        fh.write(fmt("CAT3", list(cat3)))
        fh.write(fmt("CAT4", list(cat4)))
        fh.write(fmt("CAT5", list(cat5)))
        fh.write(fmt("CAT6", list(cat6)))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
