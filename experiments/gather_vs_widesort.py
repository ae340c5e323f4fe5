"""Round-4: the q18-class fragment is gather-bound (xplane: 254 ms for an
18-col stacked u32 gather at 6.29M rows + 4x54 ms 1-D gathers), while sorts
are ~26 ms.  Decide between (a) wide variadic sorts (round-3 cliff: ~30
operands at 1M compiled >50 min — is it real at OUR operand counts?) and
(b) a lane-padded row-major gather layout.

Run: python experiments/gather_vs_widesort.py <case>
Cases: sort8 sort12 sort16 sort20 gather18 gatherpad18 gatherpair
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
# NO persistent cache: we time compiles

n = 6_291_456
case = sys.argv[1]
rng = np.random.RandomState(0)
key = jnp.asarray(rng.randint(0, n, n).astype(np.int32))
idx = jnp.asarray(rng.randint(0, n, n).astype(np.int32))


def bench(fn, *a, reps=5):
    t0 = time.time()
    r = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        r = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    return compile_s, (time.time() - t0) / reps


if case == "sortpair9":
    # pair-packed: 18 u32 entries as 9 i64 payloads + i8 key (compact shape)
    pays = tuple(jnp.asarray(rng.randint(0, 1 << 60, n).astype(np.int64))
                 for _ in range(9))
    k8 = (key & 1).astype(jnp.int8)
    f = jax.jit(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1,
                                           is_stable=True))
    c, w = bench(f, k8, *pays)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")
elif case.startswith("sort"):
    k = int(case[4:])
    pays = tuple(jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.uint32))
                 for _ in range(k))
    f = jax.jit(lambda key, *p: jax.lax.sort((key,) + p, num_keys=1))
    c, w = bench(f, key, *pays)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")
elif case == "gather18":
    M = jnp.asarray(rng.randint(0, 1 << 30, (n, 18)).astype(np.uint32))
    f = jax.jit(lambda M, i: jnp.take(M, i, axis=0, mode="clip"))
    c, w = bench(f, M, idx)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")
elif case == "gatherpad18":
    # pad k to 32 lanes... try forcing a row-contiguous layout by making
    # the minor dim a tile multiple and gathering rows
    M = jnp.asarray(rng.randint(0, 1 << 30, (n, 32)).astype(np.uint32))
    f = jax.jit(lambda M, i: jnp.take(M, i, axis=0, mode="clip"))
    c, w = bench(f, M, idx)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")
elif case == "gatherpad128":
    M = jnp.asarray(rng.randint(0, 1 << 30, (n, 128)).astype(np.uint32))
    f = jax.jit(lambda M, i: jnp.take(M, i, axis=0, mode="clip"))
    c, w = bench(f, M, idx)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")
elif case == "gatherpair":
    # 9 int64 gathers (pairs of u32) vs 18-wide u32
    M = jnp.asarray(rng.randint(0, 1 << 60, (n, 9)).astype(np.int64))
    f = jax.jit(lambda M, i: jnp.take(M, i, axis=0, mode="clip"))
    c, w = bench(f, M, idx)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")
elif case == "gather1d":
    src = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.uint32))
    f = jax.jit(lambda s, i: jnp.take(s, i, mode="clip"))
    c, w = bench(f, src, idx)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")

if case == "sortpair9":
    # pair-packed: 18 u32 entries as 9 i64 payloads + i8 key (compact shape)
    pays = tuple(jnp.asarray(rng.randint(0, 1 << 60, n).astype(np.int64))
                 for _ in range(9))
    k8 = (key & 1).astype(jnp.int8)
    f = jax.jit(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1,
                                           is_stable=True))
    c, w = bench(f, k8, *pays)
    print(f"{case}: compile {c:.1f}s warm {w*1e3:.1f}ms")
