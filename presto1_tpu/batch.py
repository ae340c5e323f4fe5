"""Columnar data model: the device-side replacement for Trino Page/Block.

A :class:`Column` is a fixed-width device array plus an optional validity
mask; strings are dictionary-encoded (int32 codes into a host-side sorted
dictionary, so code order == string order and range predicates work directly
on codes).  A :class:`RecordBatch` is an ordered dict of columns with a
static row count.

Reference parity notes:
* ``spi/Page.java:18`` (Block[] + positionCount)  → RecordBatch
* ``spi/block/LongArrayBlock.java`` etc.          → plain device arrays
* ``spi/block/DictionaryBlock.java``              → Column.dictionary
* ``spi/block/LazyBlock.java``                    → lazy column loading is
  handled one level up, in the table scan (tpch/catalog.py), which only
  materialises referenced columns.
* RLE blocks are unnecessary: XLA broadcasts constants for free.

Row counts are static Python ints.  Operators whose output cardinality is
data-dependent (filter, join) compute into padded capacity buffers plus a
device count, and the executor re-bucketizes (`round_capacity`) between
operators so jit caches stay warm across queries.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .types import SqlType, VARCHAR


def round_capacity(n: int) -> int:
    """Bucket a row count to limit distinct compiled shapes.

    Powers of two above 1024, multiples of 128 below; minimum 128.
    """
    if n <= 128:
        return 128
    if n <= 1024:
        return ((n + 127) // 128) * 128
    p = 1
    while p < n:
        p <<= 1
    # allow 1.5x steps between powers of two to limit over-padding
    if p // 2 + p // 4 >= n and p > 2048:
        return p // 2 + p // 4
    return p


@dataclass
class Column:
    """One column: device data + optional validity + host dictionary."""

    data: jnp.ndarray
    type: SqlType
    validity: Optional[jnp.ndarray] = None  # bool, True = non-null
    dictionary: Optional[np.ndarray] = None  # sorted np array of str (varchar only)
    # nested types (array/map): data is a [n, W] padded element matrix,
    # lengths the per-row element count, map_values the aligned value
    # matrix for maps (the ArrayBlock/MapBlock analog with pad+length
    # instead of offsets — static shapes for XLA)
    lengths: Optional[jnp.ndarray] = None   # int32 [n]
    map_values: Optional[jnp.ndarray] = None  # [n, W] (maps only)

    @property
    def is_nested(self) -> bool:
        return self.lengths is not None

    def __len__(self) -> int:
        return int(self.data.shape[0])

    def with_data(self, data, validity="keep") -> "Column":
        if validity == "keep":
            validity = self.validity
        return replace(self, data=data, validity=validity)

    def gather(self, indices: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "Column":
        """Column at ``indices``; rows where ``valid`` is False become NULL."""
        if indices.dtype != jnp.int32:  # int64 indices gather ~2x slower
            indices = indices.astype(jnp.int32)
        data = jnp.take(self.data, indices, axis=0, mode="clip")
        validity = self.validity
        if validity is not None:
            validity = jnp.take(validity, indices, mode="clip")
        if valid is not None:
            validity = valid if validity is None else (validity & valid)
        extra = {}
        if self.lengths is not None:
            extra["lengths"] = jnp.take(self.lengths, indices, mode="clip")
        if self.map_values is not None:
            extra["map_values"] = jnp.take(self.map_values, indices,
                                           axis=0, mode="clip")
        return replace(self, data=data, validity=validity, **extra)

    def decode(self, n: Optional[int] = None) -> np.ndarray:
        """Materialise to host numpy values (strings decoded, nulls -> object None)."""
        n = len(self) if n is None else n
        data = np.asarray(self.data[:n])
        if self.lengths is not None:
            lens = np.asarray(self.lengths[:n])

            def dec(vals, t):
                e = Column(jnp.asarray(vals), t, dictionary=self.dictionary)
                return e.decode(len(vals))

            out = np.empty(n, dtype=object)
            if self.type.kind == "map":
                vdata = np.asarray(self.map_values[:n])
                for i in range(n):
                    k = dec(data[i, :lens[i]], self.type.key)
                    v = dec(vdata[i, :lens[i]], self.type.value)
                    out[i] = dict(zip(k.tolist(), v.tolist()))
            else:
                for i in range(n):
                    out[i] = dec(data[i, :lens[i]],
                                 self.type.element).tolist()
            if self.validity is not None:
                mask = np.asarray(self.validity[:n])
                out[~mask] = None
            return out
        if self.type.is_string:
            assert self.dictionary is not None
            codes = np.clip(data, 0, len(self.dictionary) - 1) if len(self.dictionary) else data
            out = self.dictionary[codes] if len(self.dictionary) else np.array([""] * n, dtype=object)
            if self.type.kind == "varbinary":
                # physical latin-1 image -> real bytes at the boundary
                out = np.array([s.encode("latin-1") for s in out],
                               dtype=object)
        elif self.type.kind == "decimal":
            out = data / (10 ** self.type.scale)  # type: ignore[attr-defined]
        elif self.type.kind == "date":
            out = np.array(["1970-01-01"], dtype="datetime64[D]")[0] + data
        elif self.type.kind == "timestamp":
            out = (np.array(["1970-01-01"], dtype="datetime64[us]")[0]
                   + data.astype("timedelta64[us]"))
        elif self.type.kind == "timestamptz":
            # render the civil time in the column's zone + offset suffix
            off_min = self.type.offset_minutes
            local = (np.array(["1970-01-01"], dtype="datetime64[us]")[0]
                     + (data + self.type.offset_micros)
                     .astype("timedelta64[us]"))
            sign = "+" if off_min >= 0 else "-"
            suffix = f" {sign}{abs(off_min) // 60:02d}:{abs(off_min) % 60:02d}"
            out = np.array(
                [str(v).replace("T", " ") + suffix for v in local],
                dtype=object)
        elif self.type.kind == "interval_ds":
            # render like the reference's SqlIntervalDayTime: 'D HH:MM:SS.mmm'
            def _ds(us):
                sign = "-" if us < 0 else ""
                us = abs(int(us))
                d, rem = divmod(us, 86_400_000_000)
                h, rem = divmod(rem, 3_600_000_000)
                m, rem = divmod(rem, 60_000_000)
                s, rem = divmod(rem, 1_000_000)
                return f"{sign}{d} {h:02d}:{m:02d}:{s:02d}.{rem // 1000:03d}"

            out = np.array([_ds(v) for v in data], dtype=object)
        elif self.type.kind == "interval_ym":
            def _ym(months):
                sign = "-" if months < 0 else ""
                y, m = divmod(abs(int(months)), 12)
                return f"{sign}{y}-{m}"

            out = np.array([_ym(v) for v in data], dtype=object)
        else:
            out = data
        if self.validity is not None:
            mask = np.asarray(self.validity[:n])
            out = np.asarray(out, dtype=object)
            out[~mask] = None
        return out


@dataclass
class RecordBatch:
    """An ordered set of equal-length columns with a static row count."""

    columns: Dict[str, Column]
    num_rows: int

    @property
    def names(self):
        return list(self.columns.keys())

    def __getitem__(self, name: str) -> Column:
        return self.columns[name]

    def capacity(self) -> int:
        for c in self.columns.values():
            return len(c)
        return 0

    def select(self, names) -> "RecordBatch":
        return RecordBatch({n: self.columns[n] for n in names}, self.num_rows)

    def gather(self, indices: jnp.ndarray, num_rows: int,
               valid: Optional[jnp.ndarray] = None) -> "RecordBatch":
        return RecordBatch(gather_columns(self.columns, indices, valid),
                           num_rows)

    def to_pylist(self):
        cols = {n: c.decode(self.num_rows) for n, c in self.columns.items()}
        return [tuple(cols[n][i] for n in self.names) for i in range(self.num_rows)]

    def to_pandas(self):
        import pandas as pd

        return pd.DataFrame({n: c.decode(self.num_rows) for n, c in self.columns.items()})


def from_numpy(arrays: Dict[str, np.ndarray], types: Dict[str, SqlType],
               dictionaries: Optional[Dict[str, np.ndarray]] = None) -> RecordBatch:
    """Build a RecordBatch from host arrays (test/ingest helper)."""
    dictionaries = dictionaries or {}
    cols = {}
    n = None
    for name, arr in arrays.items():
        t = types[name]
        n = len(arr) if n is None else n
        if t.is_string and name not in dictionaries and arr.dtype.kind in ("U", "O", "S"):
            dictionary, codes = encode_dictionary(arr)
            cols[name] = Column(jnp.asarray(codes), t, dictionary=dictionary)
        elif t.kind == "timestamp" and arr.dtype.kind == "M":
            micros = arr.astype("datetime64[us]").astype(np.int64)
            cols[name] = Column(jnp.asarray(micros), t)
        elif t.kind == "date" and arr.dtype.kind == "M":
            days = arr.astype("datetime64[D]").astype(np.int32)
            cols[name] = Column(jnp.asarray(days), t)
        else:
            cols[name] = Column(
                jnp.asarray(arr.astype(t.np_dtype, copy=False)), t,
                dictionary=dictionaries.get(name),
            )
    return RecordBatch(cols, n or 0)


def hash_strings_host(strings) -> "np.ndarray":
    """Vectorized, width-independent uint64 hash of a numpy 'U' array.

    numpy 'U' storage is fixed-width UTF-32, so ``view(uint32)`` exposes a
    [n, W] codepoint matrix (W = longest entry, zero-padded).  The hash is
    a positional polynomial Σ cp[i]·M^(i+1) ⊕ len·C — padding codepoints
    are zero and contribute nothing, so two hosts with different local
    dictionary widths produce identical hashes for equal values.  Replaces
    a per-entry Python md5 loop (hostile at SF100 dictionary sizes)."""
    import numpy as np

    d = np.asarray(strings, dtype="U")
    nd = len(d)
    if nd == 0:
        return np.zeros(0, np.uint64)
    w = max(d.dtype.itemsize // 4, 1)
    cps = np.frombuffer(d.tobytes(), dtype=np.uint32).reshape(
        nd, w).astype(np.uint64)
    m = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        powers = np.empty(w, np.uint64)
        acc = m
        for i in range(w):  # W is small (longest string), not dict size
            powers[i] = acc
            acc = acc * m
        h = (cps * powers[None, :]).sum(axis=1, dtype=np.uint64)
        lengths = (cps != 0).sum(axis=1).astype(np.uint64)
        h ^= lengths * np.uint64(0xFF51AFD7ED558CCD)
    return h



def encode_dictionary(values: np.ndarray):
    """Sort-dictionary-encode a host string array → (dictionary, int32 codes).

    The dictionary is sorted, so code comparisons implement string
    comparisons (reference DictionaryBlock gives no such ordering guarantee;
    we add it because every device-side string comparison rides on it).
    """
    dictionary, codes = np.unique(np.asarray(values), return_inverse=True)
    return dictionary, codes.astype(np.int32)


def gather_columns(cols: Dict[str, Column], indices: jnp.ndarray,
                   valid: Optional[jnp.ndarray] = None) -> Dict[str, Column]:
    """Gather many columns at the same indices with ONE gather per byte
    width — TPU gathers are per-row latency-bound, so amortising k columns
    per lookup is ~k x faster than per-column takes.

    Three levers, all measured on v5e (see join profile in the commit log):
    * int32 indices (int64-indexed gathers are ~2x slower);
    * width-class packing: same-width columns BITCAST to one unsigned
      dtype and stack (int64/f64/decimal together; int32/date/dict codes
      together; validity bools pack 4-per-u32 and ride the 32-bit class);
    * the 2-D gather temp is tiled T(8,128) with k in the 128-lane minor
      dimension (128/k x padding — an 8 GB temp OOMed SF1 Q3), so large
      gathers run in fixed-size index chunks under lax.map."""
    import jax

    if indices.dtype != jnp.int32:
        indices = indices.astype(jnp.int32)
    out: Dict[str, Column] = {}
    nested = {n: c for n, c in cols.items() if c.is_nested}
    cols = {n: c for n, c in cols.items() if not c.is_nested}
    for name, c in nested.items():  # [n, W] rows: plain axis-0 takes
        out[name] = c.gather(indices, valid)
    entries: list = []  # (key, u32 array) — the single 32-bit class
    f64_names = []
    for name, c in cols.items():
        d = c.data
        if d.dtype == jnp.float64:
            # f64 through the u32 width-class pack crashes the v5e AOT
            # compiler at join scale (emulated f64 + bitcast interplay;
            # minimal repro in BASELINE round-3, the q17/q22 crash class).
            # f64 join payloads are rare (avg outputs only) — give them a
            # plain per-column take instead.
            f64_names.append(name)
            continue
        if d.dtype.itemsize == 8:
            b = jax.lax.bitcast_convert_type(d, jnp.uint32)  # [n, 2]
            entries.append((name + "\0lo", b[:, 0]))
            entries.append((name + "\0hi", b[:, 1]))
        elif d.dtype.itemsize == 4:
            entries.append((name, jax.lax.bitcast_convert_type(d,
                                                               jnp.uint32)))
        else:  # bool / int8 / int16 — widen (cheap elementwise)
            entries.append((name, d.astype(jnp.uint32)))
    # pack validity bytes 4-per-u32
    vslots: Dict[str, tuple] = {}  # validity column -> (slot, byte)
    vnames = [n for n, c in cols.items() if c.validity is not None]
    for gi in range(0, len(vnames), 4):
        grp = vnames[gi:gi + 4]
        word = jnp.zeros(cols[grp[0]].validity.shape, jnp.uint32)
        for b, n in enumerate(grp):
            word = word | (cols[n].validity.astype(jnp.uint32)
                           << jnp.uint32(8 * b))
            vslots[n] = (f"__v{gi // 4}", b)
        entries.append((f"__v{gi // 4}", word))

    gathered: Dict[str, jnp.ndarray] = {}
    if len(entries) == 1:
        gathered[entries[0][0]] = jnp.take(entries[0][1], indices,
                                           mode="clip")
    elif entries:
        M = jnp.stack([d for _, d in entries], axis=1)
        G = _stacked_take(M, indices)
        for j, (n, _) in enumerate(entries):
            gathered[n] = G[:, j]

    for name, c in cols.items():
        if name in f64_names:
            data = jnp.take(c.data, indices, mode="clip")
        elif c.data.dtype.itemsize == 8:
            pair = jnp.stack([gathered[name + "\0lo"],
                              gathered[name + "\0hi"]], axis=-1)
            data = jax.lax.bitcast_convert_type(pair, c.data.dtype)
        elif c.data.dtype.itemsize == 4:
            data = jax.lax.bitcast_convert_type(gathered[name], c.data.dtype)
        else:
            data = gathered[name].astype(c.data.dtype)
        validity = None
        if c.validity is not None:
            slot, b = vslots[name]
            validity = ((gathered[slot] >> jnp.uint32(8 * b))
                        & jnp.uint32(1)) != 0
        if valid is not None:
            validity = valid if validity is None else (validity & valid)
        out[name] = Column(data, c.type, validity=validity,
                           dictionary=c.dictionary)
    return out


# padded gather temp cap (bytes); env-tunable for hardware triage (the
# chunked lax.map form trades HBM for a while-loop the AOT compiler must
# unroll-analyze)
import os as _os

_GATHER_TEMP_BUDGET = int(_os.environ.get("P1_GATHER_TEMP_BUDGET",
                                          256 << 20))


def _stacked_take(M: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """take(M, indices, axis=0) with the padded gather temp bounded.

    XLA tiles the [m, k] result T(8,128) padding k up to 128 lanes, so the
    temp costs m*128*itemsize bytes regardless of k; above the budget the
    gather runs in index chunks under lax.map."""
    import jax

    m = indices.shape[0]
    chunk = _GATHER_TEMP_BUDGET // (128 * M.dtype.itemsize)
    if m <= chunk:
        return jnp.take(M, indices, axis=0, mode="clip")
    pad = (-m) % chunk
    idxp = jnp.concatenate(
        [indices, jnp.zeros((pad,), indices.dtype)]) if pad else indices
    chunks = idxp.reshape(-1, chunk)
    G = jax.lax.map(lambda ix: jnp.take(M, ix, axis=0, mode="clip"), chunks)
    return G.reshape(-1, M.shape[1])[:m]


def concat_batches(a: "RecordBatch", b: "RecordBatch",
                   capacity: int) -> "RecordBatch":
    """Concatenate two batches with identical column sets by index
    arithmetic (scatter-free; rows of ``b`` follow rows of ``a``)."""
    i = jnp.arange(capacity, dtype=jnp.int64)
    na = a.num_rows
    cols = {}
    for name, ca in a.columns.items():
        cb = b.columns[name]
        ia = jnp.clip(i, 0, len(ca) - 1)
        ib = jnp.clip(i - na, 0, len(cb) - 1)
        sel = i < na

        def _join2(da, db, sel2d=False):
            ta = jnp.take(da, ia, axis=0, mode="clip")
            tb = jnp.take(db, ib, axis=0, mode="clip")
            s = sel[:, None] if sel2d else sel
            return jnp.where(s, ta, tb)

        if ca.is_nested:  # pad the narrower [n, W] matrix to the wider W
            wa, wb = ca.data.shape[1], cb.data.shape[1]
            w = max(wa, wb)

            def _pad(d):
                return d if d.shape[1] == w else jnp.concatenate(
                    [d, jnp.zeros((d.shape[0], w - d.shape[1]),
                                  d.dtype)], axis=1)

            data = _join2(_pad(ca.data), _pad(cb.data), sel2d=True)
            lengths = _join2(ca.lengths, cb.lengths)
            mv = None
            if ca.map_values is not None:
                mv = _join2(_pad(ca.map_values), _pad(cb.map_values),
                            sel2d=True)
        else:
            data = _join2(ca.data, cb.data)
            lengths = mv = None
        va = (jnp.take(ca.validity, ia, mode="clip")
              if ca.validity is not None else jnp.ones((capacity,), bool))
        vb = (jnp.take(cb.validity, ib, mode="clip")
              if cb.validity is not None else jnp.ones((capacity,), bool))
        validity = None
        if ca.validity is not None or cb.validity is not None:
            validity = jnp.where(sel, va, vb)
        cols[name] = Column(data, ca.type, validity=validity,
                            dictionary=ca.dictionary, lengths=lengths,
                            map_values=mv)
    return RecordBatch(cols, a.num_rows + b.num_rows)
