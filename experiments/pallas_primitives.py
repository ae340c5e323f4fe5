"""Probe which Mosaic/Pallas primitives work on this chip + their speed.

T1 VMEM gather (jnp.take inside kernel)
T2 VMEM scatter (.at[].set inside kernel)
T3 dynamic-size DMA
T4 dynamic-offset static-size DMA VMEM->HBM
T5 HBM->HBM DMA with dynamic offsets
T6 many small DMA throughput (overhead per descriptor)
T8 per-row scalar store loop
"""
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
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


# ---------------- T1: VMEM gather ------------------------------------------
def t1():
    B = 2048

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    x = jnp.arange(B, dtype=jnp.int32) * 7
    idx = jnp.asarray(np.random.RandomState(0).permutation(B).astype(np.int32))
    f = jax.jit(lambda x, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    out = f(x, idx)
    ok = bool(jnp.all(out == x[idx]))
    w = bench(f, x, idx)
    return f"correct={ok} {w*1e6:.1f} us for {B}"


try_run("T1 vmem gather 1d", t1)


def t1b():
    # 2D gather of rows: take along sublane axis
    B, W = 1024, 128

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    x = jnp.arange(B * W, dtype=jnp.int32).reshape(B, W)
    idx = jnp.asarray(np.random.RandomState(0).permutation(B).astype(np.int32))
    f = jax.jit(lambda x, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    out = f(x, idx)
    ok = bool(jnp.all(out == x[idx]))
    w = bench(f, x, idx)
    return f"correct={ok} {w*1e6:.1f} us for {B}x{W} rows"


try_run("T1b vmem gather rows 2d", t1b)


# ---------------- T2: VMEM scatter ------------------------------------------
def t2():
    B = 2048

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.zeros((B,), jnp.int32).at[idx_ref[:]].set(x_ref[:])

    x = jnp.arange(B, dtype=jnp.int32) * 3
    idx = jnp.asarray(np.random.RandomState(0).permutation(B).astype(np.int32))
    f = jax.jit(lambda x, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    out = f(x, idx)
    ref = jnp.zeros((B,), jnp.int32).at[idx].set(x)
    ok = bool(jnp.all(out == ref))
    w = bench(f, x, idx)
    return f"correct={ok} {w*1e6:.1f} us for {B}"


try_run("T2 vmem scatter 1d", t2)


# ---------------- T3: dynamic-size DMA --------------------------------------
def t3():
    N = 8192

    def kern(x_hbm, n_ref, o_ref, sem):
        sz = n_ref[0]
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, sz)], o_ref.at[pl.ds(0, sz)], sem)
        dma.start()
        dma.wait()

    x = jnp.arange(N, dtype=jnp.int32)
    nsz = jnp.asarray([1000], jnp.int32)
    f = jax.jit(lambda x, n: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, n))
    out = f(x, nsz)
    ok = bool(jnp.all(out[:1000] == x[:1000]))
    return f"correct={ok}"


try_run("T3 dynamic-size DMA", t3)


# ---------------- T4: dyn-offset static-size DMA VMEM->HBM ------------------
def t4():
    N, C = 1 << 16, 512

    def kern(x_ref, off_ref, o_hbm, sem):
        o = off_ref[0]
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, C)], o_hbm.at[pl.ds(o, C)], sem)
        dma.start()
        dma.wait()

    x = jnp.arange(C, dtype=jnp.int32)
    off = jnp.asarray([12345], jnp.int32)
    f = jax.jit(lambda x, o: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(x, o))
    out = f(x, off)
    ok = bool(jnp.all(out[12345:12345 + C] == x))
    return f"correct={ok} (unaligned dyn offset 12345)"


try_run("T4 dyn-offset static-size DMA VMEM->HBM", t4)


# ---------------- T5: HBM->HBM dyn offsets both sides -----------------------
def t5():
    N, C = 1 << 16, 512

    def kern(x_hbm, offs_ref, o_hbm, sem):
        s, d = offs_ref[0], offs_ref[1]
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(s, C)], o_hbm.at[pl.ds(d, C)], sem)
        dma.start()
        dma.wait()

    x = jnp.arange(N, dtype=jnp.int32)
    offs = jnp.asarray([777, 33333], jnp.int32)
    f = jax.jit(lambda x, o: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(x, o))
    out = f(x, offs)
    ok = bool(jnp.all(out[33333:33333 + C] == x[777:777 + C]))
    return f"correct={ok}"


try_run("T5 HBM->HBM DMA dyn offsets", t5)


# ---------------- T6: small-DMA throughput ----------------------------------
def t6(n_dma=4096, C=256):
    # n_dma sequential HBM->HBM copies of C int32 at dynamic offsets
    N = n_dma * C

    def kern(x_hbm, o_hbm, sem):
        def body(i, _):
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * C, C)], o_hbm.at[pl.ds(i * C, C)], sem)
            dma.start()
            dma.wait()
            return 0
        jax.lax.fori_loop(0, n_dma, body, 0)

    x = jnp.arange(N, dtype=jnp.int32)
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x))
    out = f(x)
    ok = bool(jnp.all(out == x))
    w = bench(f, x, reps=5)
    return (f"correct={ok} {w*1e3:.2f} ms for {n_dma} DMAs of {C*4}B "
            f"= {w/n_dma*1e6:.2f} us/DMA")


try_run("T6 4096 seq DMAs of 1KB", functools.partial(t6, 4096, 256))
try_run("T6b 16384 seq DMAs of 256B", functools.partial(t6, 16384, 64))


# ---------------- T8: per-row scalar store loop ------------------------------
def t8():
    B = 8192

    def kern(x_ref, idx_ref, o_ref):
        def body(i, _):
            o_ref[idx_ref[i]] = x_ref[i]
            return 0
        jax.lax.fori_loop(0, B, body, 0)

    x = jnp.arange(B, dtype=jnp.int32)
    idx = jnp.asarray(np.random.RandomState(0).permutation(B).astype(np.int32))
    f = jax.jit(lambda x, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx))
    out = f(x, idx)
    ref = jnp.zeros((B,), jnp.int32).at[idx].set(x)
    ok = bool(jnp.all(out == ref))
    w = bench(f, x, idx, reps=5)
    return f"correct={ok} {w*1e6:.1f} us for {B} rows = {w/B*1e9:.1f} ns/row"


try_run("T8 scalar store loop", t8)
print("done")
