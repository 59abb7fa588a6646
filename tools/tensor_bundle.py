"""Pure-python TensorFlow TensorBundle (TF-v1 checkpoint) reader/writer.

The reference releases its two trained models as TF-v1 checkpoints
(`/root/reference/download_model.sh:2`); importing them previously
required a machine with TensorFlow to dump an .npz first
(tools/import_tf_checkpoint.py header). This module removes that
external step: it implements enough of the TensorBundle format —
a LevelDB/SSTable index file plus raw data shards — to read (and, for
round-trip testing, write) real checkpoints with no TF dependency.

Format (tensorflow/core/util/tensor_bundle; leveldb/table):

  <prefix>.index                an SSTable mapping
                                  ""            -> BundleHeaderProto
                                  <tensor name> -> BundleEntryProto
  <prefix>.data-%05d-of-%05d    raw little-endian tensor bytes

SSTable: data blocks (prefix-compressed key/value entries + restart
array), an index block of last-key -> BlockHandle, and a 48-byte footer
ending in the magic 0xdb4775248b80fb57. Block trailers carry a masked
CRC32C. TF writes these with compression disabled, which is what we
support (snappy-compressed blocks raise with a clear message).

Only the dtypes the reference models use are mapped; extending the
table is one line per dtype.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Tuple

import numpy as np

_MAGIC = 0xdb4775248b80fb57
_MASK_DELTA = 0xa282ead8

# TF DataType enum -> numpy
_DTYPES = {1: np.dtype("<f4"), 2: np.dtype("<f8"), 3: np.dtype("<i4"),
           9: np.dtype("<i8"), 19: np.dtype("<f2")}
_DTYPES_INV = {v: k for k, v in _DTYPES.items()}

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven, with the leveldb masking.
# ---------------------------------------------------------------------------

_CRC_TABLE: List[int] = []


def _crc_table():
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tab = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Varints and minimal protobuf encode/decode.
# ---------------------------------------------------------------------------


def _put_varint(out: bytearray, v: int):
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _get_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _pb_fields(buf: bytes) -> List[Tuple[int, int, object]]:
    """Decode a protobuf message into (field, wire_type, value) items."""
    out = []
    pos = 0
    while pos < len(buf):
        tag, pos = _get_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _get_varint(buf, pos)
        elif wt == 2:
            n, pos = _get_varint(buf, pos)
            v = buf[pos:pos + n]
            pos += n
        elif wt == 5:
            v = struct.unpack("<I", buf[pos:pos + 4])[0]
            pos += 4
        elif wt == 1:
            v = struct.unpack("<Q", buf[pos:pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.append((field, wt, v))
    return out


def _pb_varint_field(field: int, v: int) -> bytes:
    out = bytearray()
    _put_varint(out, field << 3)
    _put_varint(out, v)
    return bytes(out)


def _pb_len_field(field: int, payload: bytes) -> bytes:
    out = bytearray()
    _put_varint(out, (field << 3) | 2)
    _put_varint(out, len(payload))
    return bytes(out) + payload


# ---------------------------------------------------------------------------
# SSTable reader / writer (uncompressed blocks).
# ---------------------------------------------------------------------------


def _parse_block(block: bytes) -> List[Tuple[bytes, bytes]]:
    n_restarts = struct.unpack("<I", block[-4:])[0]
    data_end = len(block) - 4 - 4 * n_restarts
    entries = []
    pos = 0
    key = b""
    while pos < data_end:
        shared, pos = _get_varint(block, pos)
        non_shared, pos = _get_varint(block, pos)
        vlen, pos = _get_varint(block, pos)
        key = key[:shared] + block[pos:pos + non_shared]
        pos += non_shared
        entries.append((key, block[pos:pos + vlen]))
        pos += vlen
    return entries


def _read_block(buf: bytes, offset: int, size: int) -> bytes:
    raw = buf[offset:offset + size]
    ctype = buf[offset + size]
    crc = struct.unpack("<I", buf[offset + size + 1:offset + size + 5])[0]
    if masked_crc(buf[offset:offset + size + 1]) != crc:
        raise ValueError("sstable block crc mismatch")
    if ctype == 0:
        return raw
    raise NotImplementedError(
        "snappy-compressed sstable block; TF tensor bundles are written "
        "uncompressed — is this really a checkpoint index?")


def _sstable_read(path: str) -> List[Tuple[bytes, bytes]]:
    with open(path, "rb") as fh:
        buf = fh.read()
    magic = struct.unpack("<Q", buf[-8:])[0]
    if magic != _MAGIC:
        raise ValueError(f"{path}: not an sstable (bad magic)")
    footer = buf[-48:-8]
    mi_off, pos = _get_varint(footer, 0)
    mi_size, pos = _get_varint(footer, pos)
    ix_off, pos = _get_varint(footer, pos)
    ix_size, pos = _get_varint(footer, pos)
    index = _parse_block(_read_block(buf, ix_off, ix_size))
    entries: List[Tuple[bytes, bytes]] = []
    for _, handle in index:
        off, p = _get_varint(handle, 0)
        size, p = _get_varint(handle, p)
        entries.extend(_parse_block(_read_block(buf, off, size)))
    return entries


class _BlockBuilder:
    """LevelDB block with restart interval 16."""

    def __init__(self):
        self.buf = bytearray()
        self.restarts = [0]
        self.counter = 0
        self.last_key = b""

    def add(self, key: bytes, value: bytes):
        shared = 0
        if self.counter < 16:
            m = min(len(key), len(self.last_key))
            while shared < m and key[shared] == self.last_key[shared]:
                shared += 1
        else:
            self.restarts.append(len(self.buf))
            self.counter = 0
        _put_varint(self.buf, shared)
        _put_varint(self.buf, len(key) - shared)
        _put_varint(self.buf, len(value))
        self.buf += key[shared:]
        self.buf += value
        self.last_key = key
        self.counter += 1

    def finish(self) -> bytes:
        out = bytes(self.buf)
        out += b"".join(struct.pack("<I", r) for r in self.restarts)
        out += struct.pack("<I", len(self.restarts))
        return out

    def __len__(self):
        return len(self.buf)


def _sstable_write(path: str, items: List[Tuple[bytes, bytes]]):
    """items must be sorted by key."""
    out = bytearray()
    index: List[Tuple[bytes, bytes]] = []

    def emit_block(block_bytes: bytes, last_key: bytes):
        handle = bytearray()
        _put_varint(handle, len(out))
        _put_varint(handle, len(block_bytes))
        out.extend(block_bytes)
        out.append(0)  # no compression
        out.extend(struct.pack("<I", masked_crc(block_bytes + b"\x00")))
        index.append((last_key, bytes(handle)))

    bb = _BlockBuilder()
    for key, value in items:
        bb.add(key, value)
        if len(bb) >= 4096:
            emit_block(bb.finish(), key)
            bb = _BlockBuilder()
    if len(bb.buf):
        emit_block(bb.finish(), items[-1][0])

    # metaindex (empty block)
    mb = _BlockBuilder().finish()
    mi_handle = bytearray()
    _put_varint(mi_handle, len(out))
    _put_varint(mi_handle, len(mb))
    out.extend(mb)
    out.append(0)
    out.extend(struct.pack("<I", masked_crc(mb + b"\x00")))

    ib = _BlockBuilder()
    for k, h in index:
        ib.add(k, h)
    ibb = ib.finish()
    ix_handle = bytearray()
    _put_varint(ix_handle, len(out))
    _put_varint(ix_handle, len(ibb))
    out.extend(ibb)
    out.append(0)
    out.extend(struct.pack("<I", masked_crc(ibb + b"\x00")))

    footer = bytes(mi_handle) + bytes(ix_handle)
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", _MAGIC)
    out.extend(footer)
    with open(path, "wb") as fh:
        fh.write(out)


# ---------------------------------------------------------------------------
# Bundle protos.
# ---------------------------------------------------------------------------


def _encode_shape(shape) -> bytes:
    payload = b""
    for d in shape:
        payload += _pb_len_field(2, _pb_varint_field(1, int(d)))
    return payload


def _decode_shape(buf: bytes) -> Tuple[int, ...]:
    dims = []
    for field, wt, v in _pb_fields(buf):
        if field == 2 and wt == 2:
            size = 0
            for f2, _, v2 in _pb_fields(v):
                if f2 == 1:
                    size = v2
            dims.append(size)
    return tuple(dims)


def _encode_entry(dtype_enum, shape, shard, offset, size, crc) -> bytes:
    out = _pb_varint_field(1, dtype_enum)
    out += _pb_len_field(2, _encode_shape(shape))
    if shard:
        out += _pb_varint_field(3, shard)
    if offset:
        out += _pb_varint_field(4, offset)
    out += _pb_varint_field(5, size)
    tag = bytearray()
    _put_varint(tag, (6 << 3) | 5)
    out += bytes(tag) + struct.pack("<I", crc)
    return out


def _decode_entry(buf: bytes):
    dtype_enum = shard = offset = size = crc = 0
    shape: Tuple[int, ...] = ()
    for field, wt, v in _pb_fields(buf):
        if field == 1:
            dtype_enum = v
        elif field == 2:
            shape = _decode_shape(v)
        elif field == 3:
            shard = v
        elif field == 4:
            offset = v
        elif field == 5:
            size = v
        elif field == 6:
            crc = v
    return dtype_enum, shape, shard, offset, size, crc


def _encode_header(num_shards: int) -> bytes:
    # num_shards; endianness LITTLE (0, omitted); version {producer: 1}
    return (_pb_varint_field(1, num_shards)
            + _pb_len_field(3, _pb_varint_field(1, 1)))


# ---------------------------------------------------------------------------
# Public API.
# ---------------------------------------------------------------------------


def load(prefix: str, check_crc: bool = True) -> Dict[str, np.ndarray]:
    """Read a TF checkpoint: `prefix` as in tf.train.Saver.save's return
    (files <prefix>.index + <prefix>.data-…). Returns {name: array}."""
    entries = _sstable_read(prefix + ".index")
    if not entries or entries[0][0] != b"":
        raise ValueError("bundle header entry missing")
    num_shards = 1
    for field, wt, v in _pb_fields(entries[0][1]):
        if field == 1:
            num_shards = v
    shards = {}
    for i in range(num_shards):
        p = f"{prefix}.data-{i:05d}-of-{num_shards:05d}"
        with open(p, "rb") as fh:
            shards[i] = fh.read()
    out = {}
    for key, value in entries[1:]:
        dtype_enum, shape, shard, offset, size, crc = _decode_entry(value)
        if dtype_enum not in _DTYPES:
            raise NotImplementedError(
                f"tensor {key.decode()}: TF dtype enum {dtype_enum} not "
                "mapped (add it to _DTYPES)")
        raw = shards[shard][offset:offset + size]
        if check_crc and crc and masked_crc(raw) != crc:
            raise ValueError(f"tensor {key.decode()}: data crc mismatch")
        out[key.decode()] = np.frombuffer(
            raw, dtype=_DTYPES[dtype_enum]).reshape(shape).copy()
    return out


def save(prefix: str, tensors: Dict[str, np.ndarray]):
    """Write a single-shard TF checkpoint readable by tf.train (and by
    `load`). Used for the checkpoint-parity dress rehearsal."""
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    names = sorted(tensors)
    data = bytearray()
    items: List[Tuple[bytes, bytes]] = [(b"", _encode_header(1))]
    for name in names:
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype not in _DTYPES_INV:
            arr = arr.astype(np.float32)
        raw = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
        entry = _encode_entry(_DTYPES_INV[np.dtype(arr.dtype)],
                              arr.shape, 0, len(data), len(raw),
                              masked_crc(raw))
        items.append((name.encode(), entry))
        data.extend(raw)
    with open(f"{prefix}.data-00000-of-00001", "wb") as fh:
        fh.write(bytes(data))
    _sstable_write(prefix + ".index", items)
