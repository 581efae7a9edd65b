#!/usr/bin/env python3
"""Hand-crafted TSCAL/TZERO BINTABLE fixture for FitsSpec.

astropy is not in this container, so the file is built directly from
the FITS 4.0 spec (2880-byte blocks, 80-char cards, big-endian data) —
an independent pin on the reader's scaled-column support:
  u32   : TFORM J, TZERO 2^31           (astropy uint32 convention)
  u64   : TFORM K, TZERO 2^63           (astropy uint64 convention)
  calib : TFORM J, TSCAL 0.25 TZERO 100 (integer counts -> physical)
  plain : TFORM D, unscaled control
Rows (physical values):
  u32:   [0, 3000000000, 4294967295]
  u64:   [0, 18446744073709551615, 42]
  calib: [100.0, 125.25, 74.75]   (raw 0, 101, -101)
  plain: [1.5, -2.5, 0.0]
"""
import struct

def card(key, value, quote=False):
    v = f"'{value:<8}'" if quote else str(value)
    return (f"{key:<8}= {v:>20}").ljust(80)[:80]

def block(cards):
    s = "".join(cards) + "END".ljust(80)
    while len(s) % 2880:
        s += " " * 80
    return s.encode("ascii")

hdr0 = block([card("SIMPLE", "T"), card("BITPIX", "8"),
              card("NAXIS", "0"), card("EXTEND", "T")])

row_bytes = 4 + 8 + 4 + 8 + 8 + 4
hdr1 = block([
    card("XTENSION", "BINTABLE", quote=True),
    card("BITPIX", "8"), card("NAXIS", "2"),
    card("NAXIS1", row_bytes), card("NAXIS2", 3),
    card("PCOUNT", "0"), card("GCOUNT", "1"), card("TFIELDS", "6"),
    card("TTYPE1", "u32", quote=True), card("TFORM1", "1J", quote=True),
    card("TZERO1", "2147483648"),
    card("TTYPE2", "u64", quote=True), card("TFORM2", "1K", quote=True),
    card("TZERO2", "9223372036854775808"),
    card("TTYPE3", "calib", quote=True), card("TFORM3", "1J", quote=True),
    card("TSCAL3", "0.25"), card("TZERO3", "100.0"),
    card("TTYPE4", "plain", quote=True), card("TFORM4", "1D", quote=True),
    # K with TZERO 2^31: a LEGAL signed-64 offset calibration -> double
    # (NOT the uint32 convention, which is J-only)
    card("TTYPE5", "kcal", quote=True), card("TFORM5", "1K", quote=True),
    card("TZERO5", "2147483648"),
    # Fortran D-exponent notation (FITS 4.0 fixed-real format)
    card("TTYPE6", "dexp", quote=True), card("TFORM6", "1J", quote=True),
    card("TSCAL6", "1.0D-2"), card("TZERO6", "5.0D0"),
])

u32_phys = [0, 3000000000, 4294967295]
u64_phys = [0, 18446744073709551615, 42]
calib_raw = [0, 101, -101]
plain = [1.5, -2.5, 0.0]

data = b""
for i in range(3):
    data += struct.pack(">i", u32_phys[i] - 2**31)
    data += struct.pack(">q", u64_phys[i] - 2**63)
    data += struct.pack(">i", calib_raw[i])
    data += struct.pack(">d", plain[i])
    data += struct.pack(">q", [0, -2, 1000][i])      # kcal raw
    data += struct.pack(">i", [0, 250, -250][i])     # dexp raw
data += b"\x00" * ((2880 - len(data) % 2880) % 2880)

out = "src/test/resources/fits/scaled.fits"
import os
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "wb") as f:
    f.write(hdr0 + hdr1 + data)
print("wrote", out, len(hdr0 + hdr1 + data), "bytes")
