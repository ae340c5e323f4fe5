"""Binary page wire format for the DCN data plane.

The reference serializes pages per-block with optional LZ4 and a checksum
marker (``execution/buffer/PagesSerde.java:41,64-79``,
``spi/block/*Encoding.java``).  Our columns are already fixed-width device
arrays, so the wire format is trivial by design (SURVEY.md §2.1 "Page wire
format"): a JSON header describing each column (name, type, dtype, validity,
dictionary) followed by raw little-endian buffers, zlib-compressed, with a
crc32 trailer (the PageCodecMarker checksum analog — this environment has
no LZ4/xxhash; zlib/crc32 are the stdlib equivalents).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Optional

import numpy as np

from ..batch import Column, RecordBatch
from ..types import SqlType, DecimalType, parse_type_str

MAGIC = b"P1PG"


def _type_str(t: SqlType) -> str:
    return str(t)


def serialize_batch(batch: RecordBatch, compress: bool = True) -> bytes:
    """RecordBatch -> bytes.  Device arrays are read back to host here —
    this is the DCN boundary, the one place the engine pays PCIe."""
    n = batch.num_rows if isinstance(batch.num_rows, int) else int(batch.num_rows)
    header = {"num_rows": n, "columns": []}
    buffers = []

    def add(arr: np.ndarray) -> int:
        buffers.append(np.ascontiguousarray(arr))
        return len(buffers) - 1

    for name, c in batch.columns.items():
        data = np.asarray(c.data)[:n]
        col = {
            "name": name,
            "type": _type_str(c.type),
            "dtype": str(data.dtype),
            "data": add(data),
            "validity": None,
            "dictionary": None,
        }
        if data.ndim > 1:  # nested (array/map): [n, W] element matrix
            col["shape"] = list(data.shape)
        if c.lengths is not None:
            col["lengths"] = add(np.asarray(c.lengths)[:n].astype(np.int32))
        if c.map_values is not None:
            mv = np.asarray(c.map_values)[:n]
            col["map_values"] = add(mv)
            col["mv_dtype"] = str(mv.dtype)
        if c.validity is not None:
            col["validity"] = add(np.asarray(c.validity)[:n].astype(np.uint8))
        if c.dictionary is not None:
            d = np.asarray(c.dictionary, dtype="U")
            blob = "\x00".join(d.tolist()).encode("utf-8")
            col["dictionary"] = add(np.frombuffer(blob, dtype=np.uint8))
        header["columns"].append(col)
    header["buffer_lengths"] = [b.nbytes for b in buffers]
    hjson = json.dumps(header).encode()
    body = b"".join(b.tobytes() for b in buffers)
    flags = 1 if compress else 0
    if compress:
        body = zlib.compress(body, level=1)
    payload = struct.pack("<II", len(hjson), flags) + hjson + body
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    return MAGIC + struct.pack("<I", crc) + payload


def deserialize_batch(data: bytes, device: bool = False) -> RecordBatch:
    if data[:4] != MAGIC:
        raise ValueError("bad page magic")
    (crc,) = struct.unpack_from("<I", data, 4)
    payload = data[8:]
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError("page checksum mismatch")
    hlen, flags = struct.unpack_from("<II", payload, 0)
    header = json.loads(payload[8:8 + hlen].decode())
    body = payload[8 + hlen:]
    if flags & 1:
        body = zlib.decompress(body)
    lengths = header["buffer_lengths"]
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)

    def buf(i: int) -> bytes:
        return body[offsets[i]:offsets[i + 1]]

    n = header["num_rows"]
    cols = {}
    for col in header["columns"]:
        t = parse_type_str(col["type"])
        arr = np.frombuffer(buf(col["data"]), dtype=np.dtype(col["dtype"]))
        if col.get("shape"):
            arr = arr.reshape(col["shape"])
        lengths = None
        if col.get("lengths") is not None:
            lengths = np.frombuffer(buf(col["lengths"]), dtype=np.int32)
        map_values = None
        if col.get("map_values") is not None:
            map_values = np.frombuffer(
                buf(col["map_values"]),
                dtype=np.dtype(col["mv_dtype"])).reshape(col["shape"])
        validity = None
        if col["validity"] is not None:
            validity = np.frombuffer(buf(col["validity"]),
                                     dtype=np.uint8).astype(bool)
        dictionary = None
        if col["dictionary"] is not None:
            blob = bytes(buf(col["dictionary"])).decode("utf-8")
            dictionary = np.array(blob.split("\x00") if blob else [],
                                  dtype="U")
        if device:
            import jax.numpy as jnp

            arr = jnp.asarray(arr)
            if validity is not None:
                validity = jnp.asarray(validity)
            if lengths is not None:
                lengths = jnp.asarray(lengths)
            if map_values is not None:
                map_values = jnp.asarray(map_values)
        cols[col["name"]] = Column(arr, t, validity=validity,
                                   dictionary=dictionary, lengths=lengths,
                                   map_values=map_values)
    return RecordBatch(cols, n)


def concat_batches(batches, device: bool = True) -> Optional[RecordBatch]:
    """Concatenate host-side batches (post-DCN merge).  Dictionary columns
    are re-encoded against the union dictionary so codes stay comparable."""
    batches = [b for b in batches if b is not None]
    if not batches:
        return None
    if len(batches) == 1:
        return _to_device(batches[0]) if device else batches[0]
    names = list(batches[0].columns.keys())
    total = sum(b.num_rows for b in batches)
    cols = {}
    for name in names:
        parts = [(b[name], b.num_rows) for b in batches]
        t = parts[0][0].type
        if any(p.is_nested for p, _ in parts):
            # nested [n, W] element matrices: pad every part to the max W
            # before concatenating, and carry lengths/map_values through
            w = max(np.asarray(p.data).shape[1] for p, _ in parts)

            def _pad_w(m):
                m = np.asarray(m)
                if m.shape[1] == w:
                    return m
                return np.concatenate(
                    [m, np.zeros((m.shape[0], w - m.shape[1]), m.dtype)],
                    axis=1)

            data = np.concatenate([_pad_w(p.data[:n]) for p, n in parts])
            lengths = np.concatenate(
                [np.asarray(p.lengths)[:n] for p, n in parts])
            mv = None
            if any(p.map_values is not None for p, _ in parts):
                mv = np.concatenate(
                    [_pad_w(p.map_values[:n]) for p, n in parts])
            validity = None
            if any(p.validity is not None for p, _ in parts):
                validity = np.concatenate([
                    np.asarray(p.validity)[:n] if p.validity is not None
                    else np.ones(n, dtype=bool)
                    for p, n in parts])
            cols[name] = Column(data, t, validity=validity,
                                lengths=lengths, map_values=mv)
            continue
        if any(p.dictionary is not None for p, _ in parts):
            union = np.unique(np.concatenate(
                [p.dictionary for p, _ in parts if p.dictionary is not None]))
            datas = []
            for p, n in parts:
                codes = np.asarray(p.data)[:n]
                # remap codes into the union dictionary (order-preserving:
                # both source and union dictionaries are sorted)
                codes = np.searchsorted(union, p.dictionary[
                    np.clip(codes, 0, len(p.dictionary) - 1)])
                datas.append(codes.astype(np.int32))
            data = np.concatenate(datas)
            dictionary = union
        else:
            data = np.concatenate([np.asarray(p.data)[:n] for p, n in parts])
            dictionary = None
        validity = None
        if any(p.validity is not None for p, _ in parts):
            validity = np.concatenate([
                np.asarray(p.validity)[:n] if p.validity is not None
                else np.ones(n, dtype=bool)
                for p, n in parts])
        cols[name] = Column(data, t, validity=validity, dictionary=dictionary)
    out = RecordBatch(cols, total)
    return _to_device(out) if device else out


def _to_device(batch: RecordBatch) -> RecordBatch:
    import jax
    import jax.numpy as jnp

    from ..batch import round_capacity

    n = batch.num_rows
    cap = round_capacity(n)
    cols = {}

    def _pad_rows(a: np.ndarray) -> np.ndarray:
        if a.shape[0] >= cap:
            return a
        pad = np.zeros((cap - a.shape[0],) + a.shape[1:], dtype=a.dtype)
        return np.concatenate([a, pad])

    with jax.default_device(jax.devices()[0]):
        for name, c in batch.columns.items():
            data = _pad_rows(np.asarray(c.data))
            validity = c.validity
            if validity is not None:
                v = np.asarray(validity)
                if v.shape[0] < cap:
                    v = np.concatenate([v, np.zeros(cap - v.shape[0], bool)])
                validity = jnp.asarray(v)
            lengths = (jnp.asarray(_pad_rows(np.asarray(c.lengths)))
                       if c.lengths is not None else None)
            mv = (jnp.asarray(_pad_rows(np.asarray(c.map_values)))
                  if c.map_values is not None else None)
            cols[name] = Column(jnp.asarray(data), c.type, validity=validity,
                                dictionary=c.dictionary, lengths=lengths,
                                map_values=mv)
    return RecordBatch(cols, n)
