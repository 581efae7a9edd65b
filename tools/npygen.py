#!/usr/bin/env python3
"""Generate genuine numpy .npy/.npz fixtures for NpySpec.

Run once (driver-side python has numpy); the committed fixtures under
src/test/resources/npy are the independence check for the dependency-free
Scala reader — they were written by numpy itself, not by our writer.
"""
import io
import os
import zipfile

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "npy")
os.makedirs(OUT, exist_ok=True)


def save(name, arr):
    np.save(os.path.join(OUT, name), arr, allow_pickle=False)
    print(name, arr.dtype, arr.shape)


# 1-D doubles incl. the IEEE specials a float column can carry
save("plain_f8.npy", np.array([1.5, -0.25, float("nan"), float("inf"),
                               float("-inf"), 0.0, -0.0, 1e300], dtype="<f8"))

# big-endian int32 (numpy writes whatever byte order the dtype says)
save("plain_i4_big.npy", np.array([1, -2, 3, 2147483647, -2147483648],
                                  dtype=">i4"))

# 2-D float32, C order
save("mat_f4.npy", np.arange(24, dtype="<f4").reshape(4, 6) / 4.0)

# 2-D float64, Fortran order (np.asfortranarray flips the flag)
save("mat_f8_fortran.npy", np.asfortranarray(
    np.arange(12, dtype="<f8").reshape(3, 4) * 1.5 - 2.0))

# fixed-width byte strings (S): trailing-NUL padded
save("strings_S.npy", np.array([b"alpha", b"", b"beta!", b"1234567"], dtype="S7"))

# fixed-width unicode (U): UTF-32, non-BMP code point included
save("strings_U.npy", np.array(["héllo", "", "naïve", "x\U0001F600y", "ABCDE"],
                               dtype="<U5"))

# datetime64 microseconds + NaT
save("times_us.npy", np.array(["2024-01-02T03:04:05.123456", "NaT",
                               "1969-12-31T23:59:59.000001",
                               "2262-01-01T00:00:00"], dtype="<M8[us]"))

# datetime64 nanoseconds (read truncates to micros, floor semantics)
save("times_ns.npy", np.array(["2024-01-02T03:04:05.123456789",
                               "1969-12-31T23:59:59.999999999"], dtype="<M8[ns]"))

# datetime64 days -> DateType
save("dates_D.npy", np.array(["2024-02-29", "1969-07-20", "NaT"], dtype="<M8[D]"))

# uint64 with values above Long.MaxValue -> DECIMAL(20,0)
save("u8.npy", np.array([0, 1, 9223372036854775807, 9223372036854775808,
                         18446744073709551615], dtype="<u8"))

# bool
save("bool.npy", np.array([True, False, True], dtype="|b1"))

# structured (packed): mixed endianness + string + unsigned
struct = np.zeros(4, dtype=[("id", "<i8"), ("score", "<f4"),
                            ("tag", "S5"), ("n", ">u4")])
struct["id"] = [10, -20, 30, 9007199254740993]
struct["score"] = [1.5, -2.25, 0.0, 3.75]
struct["tag"] = [b"aa", b"", b"ccccc", b"dd"]
struct["n"] = [0, 7, 4294967295, 42]
save("struct.npy", struct)

# 2-D datetime matrix with NaT (nullable array elements)
save("mat_times_nat.npy", np.array(
    [["2024-01-02T03:04:05.123456", "NaT"],
     ["1969-12-31T23:59:59.000001", "2000-06-15T12:00:00"]], dtype="<M8[us]"))

# structured field named like a dict key (must not shadow 'shape')
fns = np.zeros(3, dtype=[("shape", "<i8"), ("x", "<f8")])
fns["shape"] = [7, 8, 9]
fns["x"] = [0.5, 1.5, 2.5]
save("field_named_shape.npy", fns)

# version-2.0 header (forced via the low-level API)
arr = np.array([11, 22, 33], dtype="<i8")
with open(os.path.join(OUT, "v2_header.npy"), "wb") as f:
    np.lib.format.write_array(f, arr, version=(2, 0))
print("v2_header.npy forced v2")

# npz: STORED members (np.savez default) — the splittable form
ids = np.arange(40, dtype="<i8") * 3 + 1
emb = (np.arange(40 * 6, dtype="<f4").reshape(40, 6) % 17) * 0.25 - 1.0
np.savez(os.path.join(OUT, "table_stored.npz"), vec_id=ids, v=emb)
print("table_stored.npz")

# npz with MIXED methods: one STORED + one DEFLATE member
import io
mids = np.arange(25, dtype="<i8") * 5 + 2
mvals = (np.arange(25, dtype="<f8") * 0.75) - 3.0
def _npy_bytes(a):
    b = io.BytesIO()
    np.lib.format.write_array(b, a, allow_pickle=False)
    return b.getvalue()
with zipfile.ZipFile(os.path.join(OUT, "table_mixed.npz"), "w") as z:
    z.writestr(zipfile.ZipInfo("vec_id.npy"), _npy_bytes(mids), zipfile.ZIP_STORED)
    z.writestr(zipfile.ZipInfo("x.npy"), _npy_bytes(mvals), zipfile.ZIP_DEFLATED)
print("table_mixed.npz")

# npz: DEFLATE members (np.savez_compressed)
np.savez_compressed(os.path.join(OUT, "table_deflate.npz"), vec_id=ids, v=emb)
print("table_deflate.npz")

# sanity: list what zipfile sees
for n in ("table_stored.npz", "table_deflate.npz"):
    with zipfile.ZipFile(os.path.join(OUT, n)) as z:
        for i in z.infolist():
            print(n, i.filename, "method", i.compress_type, i.file_size)
