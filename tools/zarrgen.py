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



import struct


def bitshuffle_block(b, typesize):
    """Pure-numpy bitshuffle FORWARD transform (the bitshuffle
    library's bshuf_trans_bit_elem layout, as c-blosc embeds it):
    for n elements (truncated to a multiple of 8), output row
    (t*8 + jj) of n/8 bytes packs bit jj of byte-plane t of every
    element, element (q*8 + kk)'s bit at bit kk; leftover bytes
    verbatim. Written independently of the Scala kernel (numpy
    unpackbits/packbits formulation) to pin it."""
    n = len(b) // typesize // 8 * 8
    if n == 0:
        return b
    body = np.frombuffer(b[:n * typesize], dtype="u1").reshape(n, typesize)
    out = bytearray()
    for t in range(typesize):
        bits = np.unpackbits(body[:, t:t + 1], axis=1,
                             bitorder="little")          # n x 8 (jj)
        for jj in range(8):
            col = bits[:, jj].reshape(-1, 8)             # n/8 x 8 (kk)
            out += np.packbits(col, axis=1, bitorder="little").tobytes()
    return bytes(out) + b[n * typesize:]


def bitunshuffle_block(b, typesize):
    """Inverse of bitshuffle_block (for verify())."""
    n = len(b) // typesize // 8 * 8
    if n == 0:
        return b
    planes = np.zeros((n, typesize), dtype="u1")
    nrow = n // 8
    for t in range(typesize):
        bits = np.zeros((n, 8), dtype="u1")
        for jj in range(8):
            row = np.frombuffer(
                b[(t * 8 + jj) * nrow:(t * 8 + jj + 1) * nrow], dtype="u1")
            bits[:, jj] = np.unpackbits(
                row[:, None], axis=1, bitorder="little").reshape(-1)
        planes[:, t] = np.packbits(bits, axis=1, bitorder="little")[:, 0]
    return planes.tobytes() + b[n * typesize:]


def blosc_zlib_chunk(data, typesize, shuffle=True, blocksize=2048,
                     force_memcpy=False, fmt=3, flag_extra=0,
                     bit=False):
    """Pure-stdlib blosc1 chunk producer (zlib codec, format code 3),
    written straight from c-blosc's README_CHUNK_FORMAT.rst: 16-byte
    header, LE32 block offsets, per-block LE32 csize + payload, blocks
    byte-shuffled (shuffle_generic_inline layout) before compression.
    An INDEPENDENT producer for the Scala Blosc decoder."""
    nbytes = len(data)
    if force_memcpy:
        header = bytes([2, 1, 0x2, typesize]) + struct.pack(
            "<iii", nbytes, max(typesize, blocksize), 16 + nbytes)
        return header + data
    unit = 8 * typesize if bit else typesize
    blocksize = max(unit, blocksize - blocksize % unit)
    do_shuffle = shuffle and typesize > 1 and not bit
    nblocks = (nbytes + blocksize - 1) // blocksize
    blocks = []
    for j in range(nblocks):
        b = data[j * blocksize:(j + 1) * blocksize]
        if bit:
            b2 = bitshuffle_block(b, typesize)
        elif do_shuffle:
            ne = len(b) // typesize * typesize
            arr = np.frombuffer(b[:ne], dtype="u1").reshape(-1, typesize)
            b2 = arr.T.tobytes() + b[ne:]
        else:
            b2 = b
        comp = zlib.compress(b2, 5)
        blocks.append(b2 if len(comp) >= len(b) else comp)
    flags = ((fmt << 5) | (4 if bit else (1 if do_shuffle else 0))
             | flag_extra)
    total = 16 + 4 * nblocks + sum(4 + len(b) for b in blocks)
    out = bytearray()
    out += bytes([2, 1, flags, typesize])
    out += struct.pack("<iii", nbytes, blocksize, total)
    pos = 16 + 4 * nblocks
    for b in blocks:
        out += struct.pack("<i", pos)
        pos += 4 + len(b)
    for j, b in enumerate(blocks):
        neblock = min(blocksize, nbytes - j * blocksize)
        out += struct.pack("<i", neblock if len(b) >= neblock else len(b))
        out += b
    assert len(out) == total
    return bytes(out)


_CRC32C_TABLE = None


def crc32c(data):
    """Table-based CRC-32C (Castagnoli, reflected poly 0x82F63B78) —
    pure stdlib, independent of the JDK CRC32C the Scala side uses."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


V3_TYPES = {"|b1": "bool", "|i1": "int8", "<i2": "int16", "<i4": "int32",
            "<i8": "int64", "<u2": "uint16", "<f4": "float32",
            "<f8": "float64", ">f8": "float64", ">i4": "int32"}


def write_array_v3(adir, arr, chunks, codecs=("gzip",), key_encoding="default",
                   fill_value=0, skip_chunks=()):
    """Independent zarr v3 ARRAY producer (core spec): zarr.json +
    chunk files under the default 'c/' key prefix (or bare v2-style
    keys). `codecs`: any of 'gzip', 'crc32c' applied in order after
    the bytes codec."""
    os.makedirs(adir, exist_ok=True)
    endian = "big" if arr.dtype.str[0] == ">" else "little"
    codec_list = [{"name": "bytes", "configuration": {"endian": endian}}]
    for c in codecs:
        if c == "gzip":
            codec_list.append({"name": "gzip", "configuration": {"level": 1}})
        elif c == "crc32c":
            codec_list.append({"name": "crc32c"})
        else:
            raise ValueError(c)
    sep = "/" if key_encoding == "default" else "."
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": V3_TYPES[arr.dtype.str],
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": key_encoding,
                               "configuration": {"separator": sep}},
        "fill_value": fill_value,
        "codecs": codec_list,
        "attributes": {},
    }
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)

    def encode(data):
        for c in codecs:
            if c == "gzip":
                import gzip as _gz
                data = _gz.compress(data, 1)
            elif c == "crc32c":
                data = data + struct.pack("<I", crc32c(data))
        return data

    def key(idx):
        parts = [str(i) for i in idx]
        if key_encoding == "default":
            return "/".join(["c"] + parts)
        return ".".join(parts)

    grid = [int(np.ceil(s / c)) for s, c in zip(arr.shape, chunks)]
    if len(arr.shape) == 1:
        for i in range(grid[0]):
            if i in skip_chunks:
                continue
            block = np.full(chunks, fill_value, dtype=arr.dtype)
            part = arr[i * chunks[0]:(i + 1) * chunks[0]]
            block[:len(part)] = part
            path = os.path.join(adir, key((i,)))
            os.makedirs(os.path.dirname(path) or adir, exist_ok=True)
            with open(path, "wb") as f:
                f.write(encode(block.tobytes(order="C")))
    else:
        for i in range(grid[0]):
            for j in range(grid[1]):
                if (i, j) in skip_chunks:
                    continue
                block = np.full(chunks, fill_value, dtype=arr.dtype)
                part = arr[i * chunks[0]:(i + 1) * chunks[0],
                           j * chunks[1]:(j + 1) * chunks[1]]
                block[:part.shape[0], :part.shape[1]] = part
                path = os.path.join(adir, key((i, j)))
                os.makedirs(os.path.dirname(path) or adir, exist_ok=True)
                with open(path, "wb") as f:
                    f.write(encode(block.tobytes(order="C")))


def write_array_v3_sharded(adir, arr, shard_shape, inner_shape,
                           codecs=("gzip",), index_location="end",
                           fill_value=0, skip_inner=(), skip_shards=()):
    """Independent zarr v3 sharding_indexed producer: each chunk-grid
    key holds a SHARD = concatenated independently-encoded inner
    chunks + a crc32c-protected (offset, nbytes) uint64-LE index (at
    the end or the start). skip_inner: set of GLOBAL inner-chunk grid
    coords written as missing (index -1/-1); skip_shards: shard coords
    with no file at all."""
    os.makedirs(adir, exist_ok=True)
    endian = "big" if arr.dtype.str[0] == ">" else "little"
    inner_list = [{"name": "bytes", "configuration": {"endian": endian}}]
    for c in codecs:
        if c == "gzip":
            inner_list.append({"name": "gzip", "configuration": {"level": 1}})
        elif c == "crc32c":
            inner_list.append({"name": "crc32c"})
        else:
            raise ValueError(c)
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": V3_TYPES[arr.dtype.str],
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(shard_shape)}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": fill_value,
        "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": list(inner_shape),
            "codecs": inner_list,
            "index_codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "crc32c"}],
            "index_location": index_location}}],
        "attributes": {},
    }
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)

    def encode(data):
        for c in codecs:
            if c == "gzip":
                import gzip as _gz
                data = _gz.compress(data, 1)
            elif c == "crc32c":
                data = data + struct.pack("<I", crc32c(data))
        return data

    rank = len(arr.shape)
    sgrid = [int(np.ceil(s / c)) for s, c in zip(arr.shape, shard_shape)]
    per = [sc // ic for sc, ic in zip(shard_shape, inner_shape)]
    for si in range(sgrid[0]):
        for sj in range(sgrid[1] if rank > 1 else 1):
            scoord = (si, sj) if rank > 1 else (si,)
            if scoord in skip_shards or (rank == 1 and si in skip_shards):
                continue
            body = b""
            entries = []
            n_inner = per[0] * (per[1] if rank > 1 else 1)
            for k in range(n_inner):
                ii = k // (per[1] if rank > 1 else 1)
                jj = k % (per[1] if rank > 1 else 1)
                gi = si * per[0] + ii
                gj = (sj * per[1] + jj) if rank > 1 else 0
                gcoord = (gi, gj) if rank > 1 else (gi,)
                if gcoord in skip_inner or (rank == 1 and gi in skip_inner):
                    entries.append((2**64 - 1, 2**64 - 1))
                    continue
                block = np.full(inner_shape, fill_value, dtype=arr.dtype)
                lo0 = gi * inner_shape[0]
                part = arr[lo0:lo0 + inner_shape[0]] if rank == 1 else                     arr[lo0:lo0 + inner_shape[0],
                        gj * inner_shape[1]:(gj + 1) * inner_shape[1]]
                if rank == 1:
                    block[:len(part)] = part
                else:
                    block[:part.shape[0], :part.shape[1]] = part
                enc = encode(block.tobytes(order="C"))
                entries.append((len(body), len(enc)))
                body += enc
            if index_location == "start":
                # offsets are shard-absolute: body begins after the index
                hdr = 16 * len(entries) + 4
                entries = [(o + hdr if o != 2**64 - 1 else o, n)
                           for o, n in entries]
            idx = b"".join(struct.pack("<QQ", o, n) for o, n in entries)
            idx += struct.pack("<I", crc32c(idx))
            shard = idx + body if index_location == "start" else body + idx
            parts = [str(c) for c in scoord]
            path = os.path.join(adir, "c", *parts)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(shard)


def write_group_v3(gdir):
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(gdir, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group",
                   "attributes": {}}, f)


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
            elif compressor and compressor.get("id") == "blosc":
                data = blosc_zlib_chunk(data, arr.dtype.itemsize,
                                        shuffle=compressor.get("shuffle", 1) == 1,
                                        bit=compressor.get("shuffle", 1) == 2)
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
                elif compressor and compressor.get("id") == "blosc":
                    data = blosc_zlib_chunk(data, arr.dtype.itemsize,
                                            shuffle=compressor.get("shuffle", 1) == 1,
                                            bit=compressor.get("shuffle", 1) == 2)
                with open(os.path.join(adir, f"{i}{sep}{j}"), "wb") as f:
                    f.write(data)


def write_array_v2_filtered(adir, arr, chunks, filt, compressor=None,
                            fill_value=0):
    """v2 array with ONE numcodecs filter (delta / fixedscaleoffset),
    implemented independently here: encode = filter then compressor,
    matching numcodecs semantics (delta stores first + diffs in
    astype; fixedscaleoffset stores round((x - offset) * scale) in
    astype). 1-D only (filters are per-chunk, the 2-D path adds
    nothing)."""
    os.makedirs(adir, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": compressor,
        "fill_value": fill_value,
        "order": "C",
        "filters": [filt],
    }
    with open(os.path.join(adir, ".zarray"), "w") as f:
        json.dump(meta, f)
    grid = int(np.ceil(arr.shape[0] / chunks[0]))
    astype = np.dtype(filt.get("astype") or arr.dtype.str)
    for i in range(grid):
        block = np.zeros(chunks, dtype=arr.dtype)
        part = arr[i * chunks[0]:(i + 1) * chunks[0]]
        block[:len(part)] = part
        if filt["id"] == "delta":
            enc = np.empty(block.shape, dtype=astype)
            enc[0] = block[0]
            enc[1:] = np.diff(block).astype(astype)
        elif filt["id"] == "fixedscaleoffset":
            enc = np.around(
                (block - filt["offset"]) * filt["scale"]).astype(astype)
        else:
            raise ValueError(filt["id"])
        data = enc.tobytes(order="C")
        if compressor and compressor.get("id") == "zlib":
            data = zlib.compress(data, compressor.get("level", 1))
        with open(os.path.join(adir, str(i)), "wb") as f:
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

    # blosc fixtures (independent producer: stdlib zlib codec inside
    # hand-built blosc1 chunk framing) — shuffle, no-shuffle, 2-D,
    # multi-block, and a forced memcpy chunk
    bz = os.path.join(ROOT, "bloscz.zarr")
    os.makedirs(bz, exist_ok=True)
    with open(os.path.join(bz, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    bn = 50
    b_id = np.arange(bn, dtype="<i8") * 7 - 3
    b_emb = (np.arange(bn * 5, dtype="<f4").reshape(bn, 5) % 13) * 0.5 - 2.0
    b_plain = np.arange(bn, dtype="<f8") * 0.125
    write_array(os.path.join(bz, "vec_id"), b_id, (16,),
                {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 1})
    write_array(os.path.join(bz, "emb"), b_emb, (16, 5),
                {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 1})
    write_array(os.path.join(bz, "plain"), b_plain, (50,),
                {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 0})
    # memcpy-form chunk: same .zarray, chunk bytes hand-framed
    mc = os.path.join(bz, "mc")
    os.makedirs(mc, exist_ok=True)
    mcarr = np.arange(bn, dtype="<i4")
    with open(os.path.join(mc, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [bn], "chunks": [bn],
                   "dtype": "<i4", "order": "C", "filters": None,
                   "fill_value": 0,
                   "compressor": {"id": "blosc", "cname": "zlib",
                                  "clevel": 5, "shuffle": 1}}, f)
    with open(os.path.join(mc, "0"), "wb") as f:
        f.write(blosc_zlib_chunk(mcarr.tobytes(), 4, force_memcpy=True))

    # BITshuffle fixtures (independent producer: numpy unpackbits
    # formulation of bshuf_trans_bit_elem) — 1-D i8, 2-D f4, and a
    # non-multiple-of-8 tail (leftover bytes verbatim)
    bs = os.path.join(ROOT, "bitshuf.zarr")
    os.makedirs(bs, exist_ok=True)
    with open(os.path.join(bs, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    bsn = 43  # 43 % 8 != 0: exercises the leftover rule in every chunk
    bs_id = np.arange(bsn, dtype="<i8") * 11 - 5
    bs_emb = ((np.arange(bsn * 3, dtype="<f4").reshape(bsn, 3) % 7)
              * 0.25 - 1.0)
    blosc_bit = {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 2}
    write_array(os.path.join(bs, "vec_id"), bs_id, (16,), blosc_bit)
    write_array(os.path.join(bs, "emb"), bs_emb, (16, 3), blosc_bit)

    # rejection fixtures: blosclz codec (fmt 0) and BOTH shuffle flags
    for name, kw in (("blosclz.zarr", {"fmt": 0}),
                     ("bothshuf.zarr", {"flag_extra": 0x4})):
        rd = os.path.join(ROOT, name)
        os.makedirs(rd, exist_ok=True)
        rarr = np.arange(8, dtype="<i4")
        with open(os.path.join(rd, ".zarray"), "w") as f:
            json.dump({"zarr_format": 2, "shape": [8], "chunks": [8],
                       "dtype": "<i4", "order": "C", "filters": None,
                       "fill_value": 0,
                       "compressor": {"id": "blosc", "cname": "lz4"}}, f)
        with open(os.path.join(rd, "0"), "wb") as f:
            f.write(blosc_zlib_chunk(rarr.tobytes(), 4, **kw))
    # zarr v3 fixtures (independent producer): group with gzip+crc32c
    # i8, gzip f4 2-D, RAW big-endian f8, a v2-key-encoding array; a
    # sparse array (missing chunk -> fill); a sharding rejection
    v3 = os.path.join(ROOT, "table_v3.zarr")
    write_group_v3(v3)
    n3 = 37  # non-multiple chunk edges
    v3_id = np.arange(n3, dtype="<i8") * 13 - 7
    v3_emb = (np.arange(n3 * 4, dtype="<f4").reshape(n3, 4) % 11) * 0.5 - 2.5
    v3_big = np.arange(n3, dtype=">f8") * 0.75 - 1.0
    v3_u = (np.arange(n3, dtype="<u2") * 997) % 60000
    write_array_v3(os.path.join(v3, "vec_id"), v3_id, (10,),
                   ("gzip", "crc32c"))
    write_array_v3(os.path.join(v3, "emb"), v3_emb, (10, 4), ("gzip",))
    write_array_v3(os.path.join(v3, "big"), v3_big, (12,), ())
    write_array_v3(os.path.join(v3, "u"), v3_u, (10,), ("gzip",),
                   key_encoding="v2")
    v3s = os.path.join(ROOT, "sparse_v3.zarr")
    write_array_v3(v3s, np.arange(30, dtype="<i4"), (10,), ("gzip",),
                   fill_value=9, skip_chunks=(1,))
    # sharding_indexed fixtures (independent producer): 1-D i8 with a
    # missing inner chunk AND a missing whole shard (-> fill), gzip +
    # crc32c inner chain, trailing crc32c-protected index; a 2-D f4
    # store with the index at the START; a nested-sharding rejection
    shard = os.path.join(ROOT, "shard_v3.zarr")
    write_array_v3_sharded(
        shard, np.arange(100, dtype="<i8") * 7 - 3, (40,), (10,),
        ("gzip", "crc32c"), fill_value=5,
        skip_inner=(3,), skip_shards=(2,))
    shard2 = os.path.join(ROOT, "shard2d_v3.zarr")
    write_array_v3_sharded(
        shard2,
        (np.arange(33 * 4, dtype="<f4").reshape(33, 4) % 13) * 0.25 - 1.5,
        (20, 4), (5, 4), ("gzip",), index_location="start")
    shardbad = os.path.join(ROOT, "shardbad_v3.zarr")
    os.makedirs(shardbad, exist_ok=True)
    with open(os.path.join(shardbad, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array", "shape": [8],
                   "data_type": "int32",
                   "chunk_grid": {"name": "regular",
                                  "configuration": {"chunk_shape": [8]}},
                   "chunk_key_encoding": {"name": "default",
                                          "configuration": {"separator": "/"}},
                   "fill_value": 0,
                   "codecs": [{"name": "sharding_indexed",
                               "configuration": {
                                   "chunk_shape": [4],
                                   "codecs": [{"name": "sharding_indexed",
                                               "configuration": {}}],
                                   "index_codecs": [
                                       {"name": "bytes", "configuration":
                                        {"endian": "little"}}],
                                   "index_location": "end"}}],
                   "attributes": {}}, f)

    fortran = os.path.join(ROOT, "fortran.zarr")
    os.makedirs(fortran, exist_ok=True)
    with open(os.path.join(fortran, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [4], "chunks": [4],
                   "dtype": "<i4", "order": "F", "filters": None,
                   "fill_value": 0, "compressor": None}, f)
    # v2 FILTER pipelines: delta (int, narrowing astype; float) and
    # fixedscaleoffset (float quantized to u1), zlib'd and raw
    filt = os.path.join(ROOT, "filters.zarr")
    os.makedirs(filt, exist_ok=True)
    with open(os.path.join(filt, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    n = 37
    key = (np.arange(n, dtype="<i8") * 5 - 40)  # negatives included
    write_array_v2_filtered(
        os.path.join(filt, "key"), key, (10,),
        {"id": "delta", "dtype": "<i8", "astype": "<i4"}, zlib1)
    fval = np.arange(n, dtype="<f8") * 0.5 + 1000.0  # [1000, 1018]
    write_array_v2_filtered(
        os.path.join(filt, "fso"), fval, (10,),
        {"id": "fixedscaleoffset", "offset": 1000.0, "scale": 10.0,
         "dtype": "<f8", "astype": "|u1"}, zlib1)
    fdelta = np.cumsum(np.arange(n, dtype="<f4") * 0.25 - 2.0).astype("<f4")
    write_array_v2_filtered(
        os.path.join(filt, "fd"), fdelta, (10,),
        {"id": "delta", "dtype": "<f4"})  # astype defaults, no compressor
    # unsupported filter id stays loud
    bad = os.path.join(ROOT, "filterbad.zarr")
    write_array_v2_filtered(
        os.path.join(bad), np.arange(8, dtype="<i4"), (8,),
        {"id": "delta", "dtype": "<i4"})
    with open(os.path.join(bad, ".zarray")) as f:
        m = json.load(f)
    m["filters"] = [{"id": "quantize", "digits": 3, "dtype": "<i4"}]
    with open(os.path.join(bad, ".zarray"), "w") as f:
        json.dump(m, f)
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
            if meta["compressor"] and meta["compressor"]["id"] == "zlib":
                data = zlib.decompress(data)
            elif meta["compressor"]:
                assert meta["compressor"]["id"] == "blosc"
                data = blosc_zlib_decode(data)
            block = np.frombuffer(data, dtype=dt).reshape(chunks)
            rows.append(block)
        full = np.concatenate(rows)[:shape[0]]
        out[child] = full
    return out



def blosc_zlib_decode(chunk):
    """Independent blosc1 decoder (zlib codec only) for verify()."""
    flags, typesize = chunk[2], chunk[3]
    nbytes, blocksize, cbytes = struct.unpack("<iii", chunk[4:16])
    assert cbytes == len(chunk)
    if flags & 0x2:
        return chunk[16:16 + nbytes]
    fmt = (flags >> 5) & 0x7
    assert fmt == 3, f"verify() only decodes blosc-zlib, got fmt {fmt}"
    shuffled = (flags & 0x1) and typesize > 1
    nblocks = (nbytes + blocksize - 1) // blocksize
    out = bytearray()
    for j in range(nblocks):
        neblock = min(blocksize, nbytes - j * blocksize)
        (boff,) = struct.unpack("<i", chunk[16 + 4 * j:20 + 4 * j])
        (csize,) = struct.unpack("<i", chunk[boff:boff + 4])
        payload = chunk[boff + 4:boff + 4 + csize]
        b = payload if csize == neblock else zlib.decompress(payload)
        assert len(b) == neblock
        if flags & 0x4:
            b = bitunshuffle_block(b, typesize)
        elif shuffled:
            ne = neblock // typesize * typesize
            arr = np.frombuffer(b[:ne], dtype="u1").reshape(typesize, -1)
            b = arr.T.tobytes() + b[ne:]
        out += b
    return bytes(out)


def verify_v3(store):
    """Independent v3 re-reader (gzip/crc32c codecs) for cross-checking
    the Scala writer's v3 output: returns {name: ndarray}."""
    import gzip as _gz
    with open(os.path.join(store, "zarr.json")) as f:
        root = json.load(f)
    assert root["zarr_format"] == 3 and root["node_type"] == "group"
    out = {}
    for name in sorted(os.listdir(store)):
        adir = os.path.join(store, name)
        mpath = os.path.join(adir, "zarr.json")
        if not os.path.isdir(adir) or not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            meta = json.load(f)
        assert meta["node_type"] == "array"
        shape = meta["shape"]
        chunks = meta["chunk_grid"]["configuration"]["chunk_shape"]
        cke = meta["chunk_key_encoding"]
        assert cke["name"] == "default" and \
            cke["configuration"]["separator"] == "/"
        dt = {"bool": "|b1", "int8": "|i1", "int16": "<i2", "int32": "<i4",
              "int64": "<i8", "float32": "<f4", "float64": "<f8"}[
                  meta["data_type"]]
        sharded = meta["codecs"][0]["name"] == "sharding_indexed"
        if sharded:
            scfg = meta["codecs"][0]["configuration"]
            inner = scfg["chunk_shape"]
            names = [c["name"] for c in scfg["codecs"]]
            at_end = scfg.get("index_location", "end") == "end"
            icn = [c["name"] for c in scfg["index_codecs"]]
            assert icn[0] == "bytes" and icn[1:] in ([], ["crc32c"])
            idx_crc = len(icn) == 2
        else:
            names = [c["name"] for c in meta["codecs"]]
        assert names[0] == "bytes"
        fill = meta.get("fill_value", 0)

        def decode(data):
            for c in reversed(names[1:]):
                if c == "crc32c":
                    body, tail = data[:-4], data[-4:]
                    assert struct.unpack("<I", tail)[0] == crc32c(body)
                    data = body
                elif c == "gzip":
                    data = _gz.decompress(data)
                else:
                    raise AssertionError(f"verify_v3: codec {c}")
            return data

        arr = np.zeros(shape, dtype=dt)
        grid = [int(np.ceil(s / c)) for s, c in zip(shape, chunks)]
        for i in range(grid[0]):
            for j in range(grid[1] if len(shape) > 1 else 1):
                idx = [str(i)] + ([str(j)] if len(shape) > 1 else [])
                path = os.path.join(adir, "c", *idx)
                if not sharded:
                    with open(path, "rb") as f:
                        data = f.read()
                    block = np.frombuffer(decode(data), dtype=dt) \
                        .reshape(chunks)
                else:
                    with open(path, "rb") as f:
                        shard = f.read()
                    per = [sc // ic for sc, ic in zip(chunks, inner)]
                    cps = per[0] * (per[1] if len(shape) > 1 else 1)
                    ilen = 16 * cps + (4 if idx_crc else 0)
                    ib = shard[-ilen:] if at_end else shard[:ilen]
                    if idx_crc:
                        assert struct.unpack("<I", ib[-4:])[0] == \
                            crc32c(ib[:-4])
                        ib = ib[:-4]
                    block = np.full(chunks, fill, dtype=dt)
                    for k in range(cps):
                        off, nb = struct.unpack_from("<QQ", ib, 16 * k)
                        if off == 2**64 - 1:
                            continue
                        ib2 = np.frombuffer(
                            decode(shard[off:off + nb]), dtype=dt) \
                            .reshape(inner)
                        ii = k // (per[1] if len(shape) > 1 else 1)
                        jj = k % (per[1] if len(shape) > 1 else 1)
                        if len(shape) > 1:
                            block[ii * inner[0]:(ii + 1) * inner[0],
                                  jj * inner[1]:(jj + 1) * inner[1]] = ib2
                        else:
                            block[ii * inner[0]:(ii + 1) * inner[0]] = ib2
                lo0, hi0 = i * chunks[0], min((i + 1) * chunks[0], shape[0])
                if len(shape) > 1:
                    lo1 = j * chunks[1]
                    hi1 = min((j + 1) * chunks[1], shape[1])
                    arr[lo0:hi0, lo1:hi1] = block[:hi0 - lo0, :hi1 - lo1]
                else:
                    arr[lo0:hi0] = block[:hi0 - lo0]
        out[name] = arr
    return out


if __name__ == "__main__":
    main()
