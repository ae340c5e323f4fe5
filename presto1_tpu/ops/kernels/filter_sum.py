"""Pallas kernel: fused range-filter + product-sum (single HBM pass).

The shape of TPC-H Q6 (scan → filter → sum(a*b)) and of any
filter-aggregate partial: the XLA path evaluates the predicate and the
product as separate HBM-sized intermediates; this kernel streams column
blocks HBM→VMEM once, evaluates the range predicates and the product on
the VPU in-register, and emits tiny per-block partial sums.

Exactness: inputs are int32 (cents/dates/codes all fit); the per-row
product can reach ~2^27, so it is split into 16-bit limbs accumulated in
int32 per block (no overflow for blocks ≤ 2^15 rows) and recombined in
int64 outside.  The final reduction over per-block partials is a trivial
jnp.sum.

This is the template the other operator kernels follow (predicate-masked
compaction, hash probe, radix partition — SURVEY.md §7 kernel list).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8          # sublanes per int32 tile row
LANE = 128
BLOCK_ROWS = 2048  # rows per grid step (16 int32 tiles)


ACC_SUB = 8  # accumulator block [ACC_SUB, LANE]; slot = grid step mod slots


def _kernel3(bounds_ref, ship_ref, disc_ref, qty_ref, price_ref,
             lo_ref, hi_ref, cnt_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        lo_ref[:] = jnp.zeros((ACC_SUB, LANE), jnp.int32)
        hi_ref[:] = jnp.zeros((ACC_SUB, LANE), jnp.int32)
        cnt_ref[:] = jnp.zeros((ACC_SUB, LANE), jnp.int32)

    ship = ship_ref[:]
    disc = disc_ref[:]
    qty = qty_ref[:]
    price = price_ref[:]
    mask = (
        (ship >= bounds_ref[0, 0]) & (ship < bounds_ref[0, 1])
        & (disc >= bounds_ref[0, 2]) & (disc <= bounds_ref[0, 3])
        & (qty < bounds_ref[0, 4])
    )
    prod = price * disc
    lo = jnp.sum(jnp.where(mask, prod & 0xFFFF, 0))
    hi = jnp.sum(jnp.where(mask, prod >> 16, 0))
    cnt = jnp.sum(mask.astype(jnp.int32))
    slots = ACC_SUB * LANE
    slot = i % slots
    sub = jax.lax.broadcasted_iota(jnp.int32, (ACC_SUB, LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ACC_SUB, LANE), 1)
    here = (sub * LANE + lane) == slot
    lo_ref[:] = lo_ref[:] + jnp.where(here, lo, 0)
    hi_ref[:] = hi_ref[:] + jnp.where(here, hi, 0)
    cnt_ref[:] = cnt_ref[:] + jnp.where(here, cnt, 0)


def _pad32(x: jnp.ndarray, n_pad: int, fill) -> jnp.ndarray:
    x = x.astype(jnp.int32)
    if n_pad:
        x = jnp.concatenate([x, jnp.full((n_pad,), fill, jnp.int32)])
    return x


def _call_kernel(bounds2d, ship2d, disc2d, qty2d, price2d, grid: int,
                 block_sub: int, interpret: bool):
    in_spec = pl.BlockSpec((block_sub, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((ACC_SUB, LANE), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((ACC_SUB, LANE), jnp.int32)
    return pl.pallas_call(
        _kernel3,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (0, 0), memory_space=pltpu.SMEM),
            in_spec, in_spec, in_spec, in_spec,
        ],
        out_specs=(acc_spec, acc_spec, acc_spec),
        out_shape=(acc_shape, acc_shape, acc_shape),
        interpret=interpret,
    )(bounds2d, ship2d, disc2d, qty2d, price2d)


_call_kernel_jit = jax.jit(_call_kernel,
                           static_argnames=("grid", "block_sub", "interpret"))


def range_filter_product_sum(ship, disc, qty, price, bounds,
                             interpret: bool = False):
    """sum(price*disc), count over rows passing the range predicate.

    bounds = [ship_lo, ship_hi_excl, disc_lo, disc_hi, qty_hi_excl] (int32).
    Inputs are 1-D device arrays (any integer dtype that fits int32).
    Returns (sum int64, count int64).
    """
    n = ship.shape[0]
    n_pad = (-n) % BLOCK_ROWS
    # padding rows fail the predicate via an impossible shipdate
    ship_p = _pad32(ship, n_pad, np.iinfo(np.int32).max)
    disc_p = _pad32(disc, n_pad, 0)
    qty_p = _pad32(qty, n_pad, 0)
    price_p = _pad32(price, n_pad, 0)
    total = n + n_pad
    rows = total // LANE
    grid = total // BLOCK_ROWS
    block_sub = BLOCK_ROWS // LANE

    def shape2d(x):
        return x.reshape(rows, LANE)

    # Mosaic is 32-bit: trace the kernel with x64 promotion OFF so weak
    # int literals stay int32 (the context must wrap the jit call — it
    # has no effect from inside an outer x64 trace)
    with jax.enable_x64(False):
        lo_a, hi_a, cnt_a = _call_kernel_jit(
            bounds.astype(jnp.int32).reshape(1, 5), shape2d(ship_p),
            shape2d(disc_p), shape2d(qty_p), shape2d(price_p),
            grid=grid, block_sub=block_sub, interpret=interpret)

    lo = jnp.sum(lo_a.astype(jnp.int64))
    hi = jnp.sum(hi_a.astype(jnp.int64))
    cnt = jnp.sum(cnt_a.astype(jnp.int64))
    return hi * 65536 + lo, cnt
