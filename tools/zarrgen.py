#!/usr/bin/env python3
"""Generate zarr v2 fixtures for ZarrSpec using ONLY numpy + zlib +
json (no zarr library in this container) — written directly from the
public v2 spec (chunks are C-order, edge chunks padded to full chunk
shape, one file per chunk named i / i.j). Being an independent
producer, these pin the Scala reader against the format, not against
our own writer.

Run from the repo root: python3 tools/zarrgen.py
"""
import json
import os
import zlib

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..",
                    "src", "test", "fixtures", "zarr")


def write_array(adir, arr, chunks, compressor, fill_value=0,
                dimension_separator=None, skip_chunks=()):
    os.makedirs(adir, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": compressor,
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
    }
    if dimension_separator:
        meta["dimension_separator"] = dimension_separator
    with open(os.path.join(adir, ".zarray"), "w") as f:
        json.dump(meta, f)
    sep = dimension_separator or "."
    grid = [int(np.ceil(s / c)) for s, c in zip(arr.shape, chunks)]
    if len(arr.shape) == 1:
        for i in range(grid[0]):
            if i in skip_chunks:
                continue
            block = np.zeros(chunks, dtype=arr.dtype)
            part = arr[i * chunks[0]:(i + 1) * chunks[0]]
            block[:len(part)] = part
            data = block.tobytes(order="C")
            if compressor and compressor.get("id") == "zlib":
                data = zlib.compress(data, compressor.get("level", 1))
            with open(os.path.join(adir, str(i)), "wb") as f:
                f.write(data)
    else:
        for i in range(grid[0]):
            for j in range(grid[1]):
                if (i, j) in skip_chunks:
                    continue
                block = np.zeros(chunks, dtype=arr.dtype)
                part = arr[i * chunks[0]:(i + 1) * chunks[0],
                           j * chunks[1]:(j + 1) * chunks[1]]
                block[:part.shape[0], :part.shape[1]] = part
                data = block.tobytes(order="C")
                if compressor and compressor.get("id") == "zlib":
                    data = zlib.compress(data, compressor.get("level", 1))
                with open(os.path.join(adir, f"{i}{sep}{j}"), "wb") as f:
                    f.write(data)


def main():
    os.makedirs(ROOT, exist_ok=True)
    zlib1 = {"id": "zlib", "level": 1}

    # group store: row-aligned columns, mixed compressors/endianness,
    # non-divisible chunk sizes (edge-chunk padding exercised), and a
    # 2-D array chunked along BOTH dims
    g = os.path.join(ROOT, "table.zarr")
    os.makedirs(g, exist_ok=True)
    with open(os.path.join(g, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    n = 40
    vec_id = np.arange(n, dtype="<i8") * 3 + 1
    emb = (np.arange(n * 6, dtype="<f4").reshape(n, 6) % 17) * 0.25 - 1.0
    big = np.arange(n, dtype=">f8") * 1.5 - 3.0
    flags = (np.arange(n) % 3 == 0).astype("|b1")
    u16 = (np.arange(n, dtype="<u2") * 1000) % 60000
    write_array(os.path.join(g, "vec_id"), vec_id, (16,), zlib1)
    write_array(os.path.join(g, "emb"), emb, (16, 4), zlib1)
    write_array(os.path.join(g, "big"), big, (13,), None)
    write_array(os.path.join(g, "flag"), flags, (40,), zlib1)
    write_array(os.path.join(g, "u"), u16, (7,), zlib1,
                dimension_separator="/")

    # sparse array: chunk 1 missing, fill_value = 9
    sparse = np.arange(30, dtype="<i4")
    write_array(os.path.join(ROOT, "sparse.zarr"), sparse, (10,), zlib1,
                fill_value=9, skip_chunks=(1,))

    # rejection fixtures
    blosc = os.path.join(ROOT, "blosc.zarr")
    os.makedirs(blosc, exist_ok=True)
    with open(os.path.join(blosc, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [4], "chunks": [4],
                   "dtype": "<i4", "order": "C", "filters": None,
                   "fill_value": 0,
                   "compressor": {"id": "blosc", "cname": "lz4"}}, f)
    fortran = os.path.join(ROOT, "fortran.zarr")
    os.makedirs(fortran, exist_ok=True)
    with open(os.path.join(fortran, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [4], "chunks": [4],
                   "dtype": "<i4", "order": "F", "filters": None,
                   "fill_value": 0, "compressor": None}, f)
    print("zarr fixtures written to", ROOT)


def verify(store):
    """Independent reader for our WRITER's output: parse .zarray with
    json, inflate with zlib, decode with numpy — no graft code."""
    out = {}
    for child in sorted(os.listdir(store)):
        adir = os.path.join(store, child)
        zp = os.path.join(adir, ".zarray")
        if not os.path.isdir(adir) or not os.path.exists(zp):
            continue
        meta = json.load(open(zp))
        shape, chunks = meta["shape"], meta["chunks"]
        dt = np.dtype(meta["dtype"])
        grid0 = int(np.ceil(shape[0] / chunks[0]))
        rows = []
        for i in range(grid0):
            data = open(os.path.join(adir, str(i) if len(shape) == 1
                                     else f"{i}.0"), "rb").read()
            if meta["compressor"]:
                assert meta["compressor"]["id"] == "zlib"
                data = zlib.decompress(data)
            block = np.frombuffer(data, dtype=dt).reshape(chunks)
            rows.append(block)
        full = np.concatenate(rows)[:shape[0]]
        out[child] = full
    return out


if __name__ == "__main__":
    main()
