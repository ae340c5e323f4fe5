"""Shared operator utilities: key packing and row-index helpers.

Replaces the reference's compiled hash strategies (``sql/gen/JoinCompiler``,
``operator/GroupByHash``'s per-type fast paths): instead of per-row hashing
of multi-channel keys, we bit-pack the normalised key columns into one int64
word (TPC-H composite keys fit comfortably), so grouping and join matching
become integer sort/search problems that XLA maps onto the VPU.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import Column

INT64_MAX = np.iinfo(np.int64).max

# trace-time backend override (CPU discovery under a TPU default backend)
_BACKEND_OVERRIDE = [None]


def effective_backend() -> str:
    import jax

    return _BACKEND_OVERRIDE[0] or jax.default_backend()


class backend_override:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.prev = _BACKEND_OVERRIDE[0]
        _BACKEND_OVERRIDE[0] = self.name

    def __exit__(self, *a):
        _BACKEND_OVERRIDE[0] = self.prev


def key_ranges(cols: Sequence[Column], num_rows) -> List[Tuple[int, int]]:
    """Host-synced (min, max) per key column over the first num_rows rows.

    Used by the eager executor; fused fragments pass static ranges from
    table statistics instead (the TPC-H catalog knows exact ranges).
    """
    out = []
    for c in cols:
        n = len(c)
        idx = jnp.arange(n)
        live = idx < num_rows
        if c.validity is not None:
            live = live & c.validity
        data = c.data.astype(jnp.int64)
        lo = jnp.min(jnp.where(live, data, INT64_MAX))
        hi = jnp.max(jnp.where(live, data, -INT64_MAX))
        lo_i, hi_i = int(lo), int(hi)
        if lo_i > hi_i:  # all-null / empty
            lo_i, hi_i = 0, 0
        out.append((lo_i, hi_i))
    return out


def pack_key_words(
    cols: Sequence[Column],
    ranges: Sequence[Tuple[int, int]],
    num_rows,
    mask: Optional[jnp.ndarray] = None,
    null_high: bool = False,
) -> List[jnp.ndarray]:
    """Bit-pack key columns into as few int64 words as needed.

    Each column is normalised to ``value - min + 1`` (0 is reserved for
    NULL, or the per-column top code when ``null_high``), opening a new
    word when 63 bits fill up.  Within a word the FIRST column takes the
    HIGHEST bits, so comparing the word list (word 0 primary) orders rows
    lexicographically ascending by (col 1, col 2, ...) — grouping sorts
    therefore emit groups in key order, and a single- or multi-column
    sorted input stays sorted after packing (exec/ordering.py relies on
    both).  Rows beyond ``num_rows`` or excluded by ``mask`` get the
    global sentinel INT64_MAX in every word so they sort to the end.
    """
    widths = []
    for (lo, hi) in ranges:
        span = hi - lo + 2  # +1 for null slot, +1 so max value < 2**w
        widths.append(max(min(int(span).bit_length(), 63), 1))
    n = len(cols[0])
    # greedy first-fit grouping of columns into 63-bit words (in order)
    groups: List[List[int]] = [[]]
    used = 0
    for i, w in enumerate(widths):
        if used + w > 63:
            groups.append([])
            used = 0
        groups[-1].append(i)
        used += w
    words: List[jnp.ndarray] = []
    for g in groups:
        word = jnp.zeros((n,), dtype=jnp.int64)
        shift = sum(widths[i] for i in g)
        for i in g:  # earlier column -> higher bits
            c, (lo, hi), w = cols[i], ranges[i], widths[i]
            shift -= w
            v = c.data.astype(jnp.int64) - lo + 1
            v = jnp.clip(v, 0, (1 << w) - 1)
            if c.validity is not None:
                nullcode = (hi - lo + 2) if null_high else 0
                v = jnp.where(c.validity, v, nullcode)
            word = word | (v << shift)
        words.append(word)
    idx = jnp.arange(n)
    dead = idx >= num_rows
    if mask is not None:
        dead = dead | ~mask
    return [jnp.where(dead, INT64_MAX, wd) for wd in words]


def pack_keys(
    cols: Sequence[Column],
    ranges: Sequence[Tuple[int, int]],
    num_rows,
    mask: Optional[jnp.ndarray] = None,
    null_high: bool = False,
) -> jnp.ndarray:
    """Single-word packing (joins); raises if the key exceeds 63 bits.
    TPC-H's widest join composite — partsupp's (partkey, suppkey) — fits
    at every published scale factor."""
    words = pack_key_words(cols, ranges, num_rows, mask, null_high)
    if len(words) != 1:
        raise NotImplementedError(
            "join key exceeds 63 bits; multi-word join keys TBD")
    return words[0]


_MIX64 = np.uint64(0x9E3779B97F4A7C15).astype(np.int64)
_MIX_MASK = np.int64((1 << 62) - 1)


def mix_key_word(
    cols: Sequence[Column],
    ranges: Sequence[Tuple[int, int]],
    num_rows,
    mask: Optional[jnp.ndarray] = None,
    null_high: bool = False,
) -> jnp.ndarray:
    """Collision-prone 62-bit mix of wide composite keys (used when the
    exact packing exceeds 63 bits).  Callers MUST verify candidate matches
    against the real key columns (hash_join does, via its residual path).

    Dead/invalid rows get sentinels outside the live 62-bit range:
    INT64_MAX on the build side, -1 on the probe side — they can never
    collide with live values or each other."""
    n = len(cols[0])
    word = jnp.zeros((n,), dtype=jnp.int64)
    invalid = jnp.zeros((n,), dtype=bool)
    for c, (lo, hi) in zip(cols, ranges):
        v = c.data.astype(jnp.int64) - lo + 1
        if c.validity is not None:
            invalid = invalid | ~c.validity
        word = (word * _MIX64) ^ v
    word = word & _MIX_MASK
    idx = jnp.arange(n)
    dead = (idx >= num_rows) | invalid
    if mask is not None:
        dead = dead | ~mask
    sentinel = jnp.asarray(INT64_MAX if null_high else -1, jnp.int64)
    return jnp.where(dead, sentinel, word)


def iota(n: int) -> jnp.ndarray:
    return jnp.arange(n, dtype=jnp.int64)


def _wide_sort_rows() -> int:
    """Row threshold above which wide (>8 payload operand) sorts switch
    from the variadic payload sort to the perm + packed-gather form.

    The v5e AOT compiler charges hundreds of seconds for wide variadic
    sorts well below the original 65536 gate (round-5 bisect: q10's
    16-operand sort at 49,152 rows compiled for 312 s — the dominant
    term of its 612 s cold wall), while the gather form is crash-prone
    only at TINY shapes (round-3 remote_compile HTTP 500 repro).  8192
    keeps tiny batches on the payload sort and routes everything else
    to the gather form.  Override: P1_WIDE_SORT_ROWS."""
    import os

    return int(os.environ.get("P1_WIDE_SORT_ROWS", "8192"))


def searchsorted_cosort(a: jnp.ndarray, v: jnp.ndarray,
                        side: str = "left") -> jnp.ndarray:
    """Scatter-free co-sorting searchsorted for TPU.

    jax's ``method='sort'`` ranks via ``zeros.at[argsort(x)].set(iota)`` —
    a scatter (serial on TPU) — plus a second rank of the queries, and its
    int64 argsort decomposes into three u32 operands that XLA's remat pass
    materialises as a ``[n+m, 3]`` array whose TPU tile layout pads the
    minor dim 3→128 (measured 42x memory expansion, OOM at SF1 join
    shapes).  This version is two stable variadic sorts with at most two
    narrow 1D operands each and no scatter:

      1. sort (concat keys, origin-iota): stable order makes the tie rule
         (a-before-v = 'right', v-before-a = 'left') exact;
      2. exclusive cumsum of the a-indicator = #a before each position;
      3. sort (origin, counts) routes each query's answer back to its slot.
    """
    n, m = a.shape[0], v.shape[0]
    total = n + m
    if side == "right":
        key = jnp.concatenate([a, v])
        is_a_of = lambda origin: origin < n
    else:
        key = jnp.concatenate([v, a])
        is_a_of = lambda origin: origin >= m
    origin = jnp.arange(total, dtype=jnp.int32)
    s_key, s_origin = jax.lax.sort((key, origin), num_keys=1,
                                   is_stable=True)
    is_a = is_a_of(s_origin).astype(jnp.int32)
    a_before = jnp.cumsum(is_a) - is_a
    _, routed = jax.lax.sort((s_origin, a_before), num_keys=1,
                             is_stable=True)
    out = routed[n:] if side == "right" else routed[:m]
    return out.astype(jnp.int64)


def searchsorted_fast(a: jnp.ndarray, v: jnp.ndarray, side: str = "left"):
    """Backend-aware searchsorted: XLA:TPU executes the default binary-
    search ('scan') method orders of magnitude slower than co-sorting,
    so pick per backend at trace time."""
    if effective_backend() == "cpu":
        return jnp.searchsorted(a, v, side=side, method="scan")
    return searchsorted_cosort(a, v, side=side)


def narrow_i32(words: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Narrow packed int64 key words of known bit width to int32 (halves
    sort bytes and avoids the u32-pair decomposition).  INT64_MAX
    sentinels map onto INT32_MAX, preserving sort-to-the-end."""
    if bits > 30:
        return words
    i32max = jnp.asarray(np.iinfo(np.int32).max, jnp.int64)
    return jnp.minimum(words, i32max).astype(jnp.int32)
