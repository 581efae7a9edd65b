#!/usr/bin/env python3
"""Generate the typed-columns Arrow IPC fixture for ArrowIpcSpec.

Covers the non-scalar / temporal types the reader must handle from
real pyarrow writers: fixed_size_list<float32> (embedding dumps),
list<utf8> (token lists), list<int64>, naive timestamp[us], date32,
and binary — with null rows, null elements and empty lists.

Run once; the output is committed at src/test/resources/arrow/typed.arrow.
"""
import pyarrow as pa
import pyarrow.ipc as ipc

emb = pa.array([[1.5, -2.25, 0.0, 4.0],
                [0.5, 0.5, 0.5, 0.5],
                None,
                [-1.0, 2.0, -3.0, 4.5]],
               type=pa.list_(pa.float32(), 4))
toks = pa.array([["alpha", "beta"], [], None, ["gamma", None, "delta"]],
                type=pa.list_(pa.utf8()))
vals = pa.array([[10, 20, 30], None, [7], []], type=pa.list_(pa.int64()))
ts = pa.array([1700000000000000, None, 1700000123456789, 1500000000000000],
              type=pa.timestamp("us"))
d = pa.array([19700, 0, None, -365], type=pa.date32())
payload = pa.array([b"\x00\x01\xff", b"", None, b"graft"], type=pa.binary())

table = pa.table({
    "id": pa.array([1, 2, 3, 4], type=pa.int64()),
    "emb": emb, "toks": toks, "vals": vals,
    "ts": ts, "d": d, "payload": payload,
})

out = "src/test/resources/arrow/typed.arrow"
with ipc.new_file(out, table.schema) as w:
    w.write_table(table, max_chunksize=3)  # 2 record batches
print("wrote", out)

# large/wide-unit variants: large_utf8, large_binary, large_list<int64>,
# timestamp[ns] (pandas default), timestamp[ms, tz], date64
large = pa.table({
    "id": pa.array([1, 2, 3], type=pa.int64()),
    "ls": pa.array(["big", None, "strings"], type=pa.large_utf8()),
    "lb": pa.array([b"\x01\x02", b"", None], type=pa.large_binary()),
    "ll": pa.array([[1, 2, 3], None, []], type=pa.large_list(pa.int64())),
    "tns": pa.array([1700000000123456789, None, 1500000000000000001],
                    type=pa.timestamp("ns")),
    "tms": pa.array([1700000000123, 1500000000456, None],
                    type=pa.timestamp("ms", tz="UTC")),
    "d64": pa.array([19700 * 86400000, None, -365 * 86400000],
                    type=pa.date64()),
})
out2 = "src/test/resources/arrow/typed_large.arrow"
with ipc.new_file(out2, large.schema) as w:
    w.write_table(large)
print("wrote", out2)

# nested/struct + decimal + unsigned: the remaining wild-file shapes
nested = pa.table({
    "id": pa.array([1, 2, 3], type=pa.int64()),
    "st": pa.array([{"a": 10, "b": "x"}, None, {"a": None, "b": "z"}],
                   type=pa.struct([("a", pa.int64()), ("b", pa.utf8())])),
    "lst": pa.array([[{"q": 1.5}], [], None],
                    type=pa.list_(pa.struct([("q", pa.float64())]))),
    "dec": pa.array([None, 123456, -25], type=pa.decimal128(10, 2)),
    "u8": pa.array([0, 200, 255], type=pa.uint8()),
    "u16": pa.array([0, 60000, None], type=pa.uint16()),
    "u32": pa.array([0, 4000000000, 7], type=pa.uint32()),
    "u64": pa.array([0, 18446744073709551615, 42], type=pa.uint64()),
})
out3 = "src/test/resources/arrow/typed_nested.arrow"
with ipc.new_file(out3, nested.schema) as w:
    w.write_table(nested)
print("wrote", out3)
