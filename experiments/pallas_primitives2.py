"""Round 2 of primitive probes: 2D DMA forms, take_along_axis gather,
in-kernel histogram speed."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *a, reps=20):
    r = fn(*a)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    t0 = time.time()
    for _ in range(reps):
        r = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    return (time.time() - t0) / reps


def try_run(name, f):
    try:
        out = f()
        print(f"[OK] {name}: {out}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


# T4a: VMEM->HBM DMA, 2D, dynamic ROW offset (row=128 lanes), static size
def t4a(row_off=123):
    R, C = 512, 128
    L = 16  # rows to copy

    def kern(x_ref, off_ref, o_hbm, sem):
        o = off_ref[0]
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, L), :], o_hbm.at[pl.ds(o, L), :], sem)
        dma.start()
        dma.wait()

    x = jnp.arange(L * C, dtype=jnp.int32).reshape(L, C)
    off = jnp.asarray([row_off], jnp.int32)
    f = jax.jit(lambda x, o: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(x, o))
    out = f(x, off)
    ok = bool(jnp.all(out[row_off:row_off + L] == x))
    return f"correct={ok} dyn row offset {row_off}"


try_run("T4a 2D DMA VMEM->HBM dyn row off", t4a)


# T4b/T4c: 1D DMA dynamic offset (aligned / unaligned)
def t4b(off_v=256):
    N, L = 1 << 14, 512

    def kern(x_ref, off_ref, o_hbm, sem):
        o = off_ref[0]
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, L)], o_hbm.at[pl.ds(o, L)], sem)
        dma.start()
        dma.wait()

    x = jnp.arange(L, dtype=jnp.int32)
    off = jnp.asarray([off_v], jnp.int32)
    f = jax.jit(lambda x, o: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(x, off))
    out = f(x, off)
    ok = bool(jnp.all(out[off_v:off_v + L] == x))
    return f"correct={ok} off={off_v}"


try_run("T4b 1D DMA dyn off aligned(256)", functools.partial(t4b, 256))
try_run("T4c 1D DMA dyn off unaligned(37)", functools.partial(t4b, 37))


# T5b: HBM->HBM 2D DMA dyn row offsets both sides
def t5b():
    R, C, L = 1024, 128, 64

    def kern(x_hbm, offs_ref, o_hbm, sem):
        s, d = offs_ref[0], offs_ref[1]
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(s, L), :], o_hbm.at[pl.ds(d, L), :], sem)
        dma.start()
        dma.wait()

    x = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
    offs = jnp.asarray([77, 333], jnp.int32)
    f = jax.jit(lambda x, o: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(x, o))
    out = f(x, offs)
    ok = bool(jnp.all(out[333:333 + L] == x[77:77 + L]))
    return f"correct={ok}"


try_run("T5b HBM->HBM 2D DMA dyn rows", t5b)


# T6x: many sequential HBM->HBM 2D DMAs, dynamic offsets — overhead per DMA
def t6x(n_dma=4096, L=16):
    C = 128
    R = n_dma * L

    def kern(x_hbm, o_hbm, sem):
        def body(i, _):
            o = i * jnp.int32(L)
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(o, L), :], o_hbm.at[pl.ds(o, L), :], sem)
            dma.start()
            dma.wait()
            return 0
        jax.lax.fori_loop(0, jnp.int32(n_dma), body, 0)

    x = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x))
    out = f(x)
    ok = bool(jnp.all(out == x))
    w = bench(f, x, reps=5)
    gb = R * C * 4 / 1e9
    return (f"correct={ok} {w*1e3:.2f} ms for {n_dma} x {L*C*4}B "
            f"= {w/n_dma*1e6:.2f} us/DMA, {2*gb/w:.0f} GB/s")


try_run("T6x 4096 HBM->HBM DMAs of 8KB", functools.partial(t6x, 4096, 16))
try_run("T6y 1024 HBM->HBM DMAs of 32KB", functools.partial(t6x, 1024, 64))
try_run("T6z 16384 HBM->HBM DMAs of 2KB", functools.partial(t6x, 16384, 4))


# T6p: pipelined (no wait-each) small DMAs using semaphore array
def t6p(n_dma=4096, L=16, NSEM=8):
    C = 128
    R = n_dma * L

    def kern(x_hbm, o_hbm, sems):
        def start(i):
            o = i * jnp.int32(L)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(o, L), :], o_hbm.at[pl.ds(o, L), :],
                sems.at[i % NSEM])

        def body(i, _):
            @pl.when(i >= NSEM)
            def _():
                start(i - NSEM).wait()
            start(i).start()
            return 0
        jax.lax.fori_loop(0, jnp.int32(n_dma), body, 0)

        def drain(i, _):
            j = jnp.maximum(jnp.int32(n_dma) - NSEM, 0) + i
            @pl.when(j < n_dma)
            def _():
                start(j).wait()
            return 0
        jax.lax.fori_loop(0, jnp.int32(NSEM), drain, 0)

    x = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x))
    out = f(x)
    ok = bool(jnp.all(out == x))
    w = bench(f, x, reps=5)
    gb = R * C * 4 / 1e9
    return (f"correct={ok} {w*1e3:.2f} ms for {n_dma} x {L*C*4}B "
            f"= {w/n_dma*1e6:.2f} us/DMA, {2*gb/w:.0f} GB/s")


try_run("T6p 4096 pipelined DMAs of 8KB", functools.partial(t6p, 4096, 16))
try_run("T6q 16384 pipelined DMAs of 2KB", functools.partial(t6p, 16384, 4))


# T1c/T1d: take_along_axis in kernel
def t1c(axis=0):
    R, C = 512, 128

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    rng = np.random.RandomState(0)
    x = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
    if axis == 0:
        idx = jnp.asarray(
            np.stack([rng.permutation(R) for _ in range(C)], 1).astype(np.int32))
    else:
        idx = jnp.asarray(
            np.stack([rng.permutation(C) for _ in range(R)], 0).astype(np.int32))
    f = jax.jit(lambda x, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    out = f(x, idx)
    ref = jnp.take_along_axis(x, idx, axis=axis)
    ok = bool(jnp.all(out == ref))
    w = bench(f, x, idx)
    return f"correct={ok} {w*1e6:.1f} us for {R}x{C} axis={axis}"


try_run("T1c take_along_axis axis0 (sublanes)", functools.partial(t1c, 0))
try_run("T1d take_along_axis axis1 (lanes)", functools.partial(t1c, 1))


# T7: in-kernel one-hot histogram throughput, big input
def t7():
    n = 1 << 23
    NB = 64
    B = n // NB  # rows per grid step

    def kern(d_ref, h_ref):
        d = d_ref[:].reshape(B // 128, 128)
        acc = jnp.zeros((256,), jnp.int32)
        # loop over 256 bins? no — one-hot chunks: compare to iota bins
        # shape [B/128, 128] vs 256 bins => do 8 chunks of 32 bins
        outs = []
        for c in range(8):
            bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2) + c * 32
            oh = (d[:, :, None] == bins).astype(jnp.int32)
            outs.append(jnp.sum(oh, axis=(0, 1)))
        h_ref[:] = jnp.concatenate(outs)

    d = jnp.asarray(np.random.RandomState(0).randint(0, 256, n).astype(np.int32))
    f = jax.jit(lambda d: pl.pallas_call(
        kern,
        grid=(NB,),
        out_shape=jax.ShapeDtypeStruct((NB, 256), jnp.int32),
        in_specs=[pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(d))
    out = f(d)
    ok = int(jnp.sum(out)) == n
    w = bench(f, d, reps=5)
    return f"sum-correct={ok} {w*1e3:.2f} ms for {n} rows = {n/w/1e6:.0f} Mrows/s"


try_run("T7 in-kernel histogram 8.4M rows", t7)
print("done")
