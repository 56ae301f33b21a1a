#!/usr/bin/env python3
"""Generate ucfp_tpu/native/wb_table.h from the `regex` engine's own
Unicode property tables.

The native full-Unicode UAX#29 word tokenizer (native/textsig.cpp,
ucfp_text_tokens_u8) must be byte-identical to the Python path's
`regex` (?w)\\b segmentation (modality/text.tokenize_words). Rather
than vendoring Unicode data files that could drift from the engine,
this generator extracts the ENGINE's view of every codepoint:

  * Word_Break class        \\p{wb=<class>}   (19 classes incl. Other)
  * Extended_Pictographic   \\p{Extended_Pictographic}   (rule WB3c)
  * word character          \\w               (the token keep-filter)
  * apostrophe vowel-bind   behavioral probe  (the engine's WB5a-style
                            elision tailoring: a leading U+0027/U+2019
                            binds onto exactly these ALetter codepoints
                            — probed, not assumed)

and packs them into a two-level page table:

  byte per codepoint: bits 0-4 wb class, bit 5 ExtPict, bit 6 \\w,
  bit 7 vowel-bind.

A second table serves the grapheme scanner (the engine's \\X):

  * Grapheme_Cluster_Break  \\p{gcb=<class>}  (14 classes incl. Other)
  * Extended_Pictographic   (rule GB11)
  * str.isspace()           from CPython itself (the grapheme
                            tokenizer's keep-filter drops
                            all-whitespace clusters)

  byte per codepoint: bits 0-3 gcb class, bit 4 ExtPict, bit 5 isspace.

Re-run after a `regex` package upgrade; the emitted header carries the
engine version it was generated from, and tests/test_textsig_native.py
fuzzes native-vs-regex equality so a stale table fails loudly.

Usage: python scripts/gen_wb_table.py [out_path]
"""

from __future__ import annotations

import sys
import regex

# class ids are stable wire constants for the C++ scanner; Other == 0
# so zero-filled pages (unassigned planes) need no special casing.
CLASSES = [
    "Other",
    "CR",
    "LF",
    "Newline",
    "Extend",
    "ZWJ",
    "Regional_Indicator",
    "Format",
    "Katakana",
    "Hebrew_Letter",
    "ALetter",
    "Single_Quote",
    "Double_Quote",
    "MidNumLet",
    "MidLetter",
    "MidNum",
    "Numeric",
    "ExtendNumLet",
    "WSegSpace",
]

F_EXTPICT = 0x20
F_WORD = 0x40
F_VBIND = 0x80

GCB_CLASSES = [
    "Other",
    "CR",
    "LF",
    "Control",
    "Extend",
    "ZWJ",
    "Regional_Indicator",
    "Prepend",
    "SpacingMark",
    "L",
    "V",
    "T",
    "LV",
    "LVT",
]

G_EXTPICT = 0x10
G_SPACE = 0x20

MAX_CP = 0x110000


def _all_cp_string() -> tuple[str, list[int]]:
    """One string holding every scalar value; pos->cp map as offsets."""
    cps = [cp for cp in range(MAX_CP) if not 0xD800 <= cp <= 0xDFFF]
    return "".join(map(chr, cps)), cps


def _mark(pattern: str, s: str, cps: list[int], table, bit_or_cls, is_flag,
          cls_mask=0x1F):
    pat = regex.compile(pattern)
    for m in pat.finditer(s):
        for pos in range(m.start(), m.end()):
            cp = cps[pos]
            if is_flag:
                table[cp] |= bit_or_cls
            else:
                if table[cp] & cls_mask:
                    raise SystemExit(
                        f"cp U+{cp:04X} matches two classes "
                        f"(id {table[cp] & cls_mask} and via {pattern})"
                    )
                table[cp] |= bit_or_cls


def build_table() -> bytearray:
    s, cps = _all_cp_string()
    table = bytearray(MAX_CP)
    for idx, cls in enumerate(CLASSES):
        if cls == "Other":
            continue
        _mark(rf"\p{{wb={cls}}}+", s, cps, table, idx, is_flag=False)
    _mark(r"\p{Extended_Pictographic}+", s, cps, table, F_EXTPICT, True)
    _mark(r"\w+", s, cps, table, F_WORD, True)

    # behavioral probe: which ALetter codepoints does a LEADING
    # apostrophe bind to? (the engine's French-elision tailoring)
    bound = regex.compile(r"(?w)\b")
    aletter = CLASSES.index("ALetter")
    n_vowels = 0
    for cp in range(MAX_CP):
        if table[cp] & 0x1F != aletter:
            continue
        ch = chr(cp)
        if [x for x in bound.split("'" + ch) if x] == ["'" + ch]:
            table[cp] |= F_VBIND
            n_vowels += 1
    print(f"vowel-bind set: {n_vowels} codepoints", file=sys.stderr)
    return table


def build_gcb_table() -> bytearray:
    s, cps = _all_cp_string()
    table = bytearray(MAX_CP)
    for idx, cls in enumerate(GCB_CLASSES):
        if cls == "Other":
            continue
        _mark(rf"\p{{gcb={cls}}}+", s, cps, table, idx, is_flag=False,
              cls_mask=0x0F)
    _mark(r"\p{Extended_Pictographic}+", s, cps, table, G_EXTPICT, True)
    for cp in range(MAX_CP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        if chr(cp).isspace():
            table[cp] |= G_SPACE
    return table


def _emit_pages(a, table: bytearray, prefix: str) -> None:
    npages = MAX_CP // 256
    pages: dict[bytes, int] = {}
    index = []
    for p in range(npages):
        pg = bytes(table[p * 256 : (p + 1) * 256])
        if pg not in pages:
            pages[pg] = len(pages)
        index.append(pages[pg])
    uniq = sorted(pages.items(), key=lambda kv: kv[1])
    print(f"{prefix}: {len(uniq)} unique pages", file=sys.stderr)
    a(f"inline constexpr uint8_t {prefix}Pages[{len(uniq)}][256] = {{")
    for pg, _ in uniq:
        a("  {" + ",".join(str(b) for b in pg) + "},")
    a("};")
    a("")
    a(f"inline constexpr uint16_t {prefix}PageIdx[{npages}] = {{")
    row = []
    for pi in index:
        row.append(str(pi))
        if len(row) == 32:
            a("  " + ",".join(row) + ",")
            row = []
    if row:
        a("  " + ",".join(row) + ",")
    a("};")
    a("")


def emit(wb: bytearray, gcb: bytearray, out_path: str) -> None:
    lines = []
    a = lines.append
    a("// GENERATED by scripts/gen_wb_table.py — do not edit.")
    a(f"// source engine: regex {regex.__version__}")
    a("// kPages layout: bits 0-4 Word_Break class, bit 5 ExtPict,")
    a("//                bit 6 \\w, bit 7 apostrophe vowel-bind")
    a("// kGcbPages layout: bits 0-3 Grapheme_Cluster_Break class,")
    a("//                   bit 4 ExtPict, bit 5 str.isspace()")
    a("#pragma once")
    a("#include <cstdint>")
    a("")
    a("namespace wbtab {")
    a("")
    for idx, cls in enumerate(CLASSES):
        a(f"constexpr uint8_t k{cls.replace('_', '')} = {idx};")
    a("constexpr uint8_t kClassMask = 0x1F;")
    a(f"constexpr uint8_t kExtPict = 0x{F_EXTPICT:02X};")
    a(f"constexpr uint8_t kWordFlag = 0x{F_WORD:02X};")
    a(f"constexpr uint8_t kVBind = 0x{F_VBIND:02X};")
    a("")
    for idx, cls in enumerate(GCB_CLASSES):
        a(f"constexpr uint8_t kGcb{cls.replace('_', '')} = {idx};")
    a("constexpr uint8_t kGcbClassMask = 0x0F;")
    a(f"constexpr uint8_t kGcbExtPict = 0x{G_EXTPICT:02X};")
    a(f"constexpr uint8_t kGcbSpace = 0x{G_SPACE:02X};")
    a("")
    _emit_pages(a, wb, "k")
    _emit_pages(a, gcb, "kGcb")
    a("inline uint8_t lookup(uint32_t cp) {")
    a(f"  if (cp >= 0x{MAX_CP:X}u) return 0;")
    a("  return kPages[kPageIdx[cp >> 8]][cp & 0xFF];")
    a("}")
    a("")
    a("inline uint8_t gcb_lookup(uint32_t cp) {")
    a(f"  if (cp >= 0x{MAX_CP:X}u) return 0;")
    a("  return kGcbPages[kGcbPageIdx[cp >> 8]][cp & 0xFF];")
    a("}")
    a("")
    a("}  // namespace wbtab")
    a("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "ucfp_tpu/native/wb_table.h"
    emit(build_table(), build_gcb_table(), out)
    print(f"wrote {out}", file=sys.stderr)
