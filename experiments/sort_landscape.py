"""Measure the sort landscape on the chip to pick the radix-sort design.

Run: python experiments/sort_landscape.py [--rows 8388608]
"""
import argparse
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--rows", type=int, default=1 << 23)
args = ap.parse_args()
n = args.rows

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def bench(fn, *a, reps=5):
    r = fn(*a)
    jax.block_until_ready(r)
    # tunnel-safe completion barrier: force a scalar readback
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.reshape(-1)[:1])
    t0 = time.time()
    for _ in range(reps):
        r = fn(*a)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.reshape(-1)[:1])
    return (time.time() - t0) / reps


rng = np.random.RandomState(0)
k64 = jnp.asarray(rng.randint(0, n // 4, n).astype(np.int64))
k32 = k64.astype(jnp.int32)
pay64 = jnp.arange(n, dtype=jnp.int64)
pay32 = jnp.arange(n, dtype=jnp.int32)

results = []


def rep(name, wall):
    results.append((name, wall * 1e3, n / wall / 1e6))
    print(f"{name:44s} {wall*1e3:9.2f} ms {n/wall/1e6:9.1f} Mrows/s", flush=True)


# --- lax.sort variants ------------------------------------------------------
rep("sort 1op i64", bench(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), k64))
rep("sort 1op i32", bench(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), k32))
rep("sort 2op i64+i64", bench(
    jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)[0]), k64, pay64))
rep("sort 2op i32+i32", bench(
    jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)[0]), k32, pay32))
packed = (k64 << 32) | pay64.astype(jnp.int64)
rep("sort 1op i64 packed(key|idx)", bench(
    jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), packed))

# --- batched (blocked) sorts ------------------------------------------------
for nb in (64, 256, 1024, 4096):
    b = n // nb
    kb = k64.reshape(nb, b)
    rep(f"sort [{nb},{b}] i64 batched", bench(
        jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, dimension=1)[0]), kb))

kb32 = k32.reshape(256, n // 256)
rep("sort [256,b] i32 batched", bench(
    jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, dimension=1)[0]), kb32))

# --- histogram building blocks ----------------------------------------------
NB = 256
B = n // NB
d8 = (k64 & 0xFF).astype(jnp.int32).reshape(NB, B)


def hist_onehot(d):
    oh = (d[:, :, None] == jnp.arange(256, dtype=jnp.int32)[None, None, :])
    return jnp.sum(oh.astype(jnp.int32), axis=1)


rep("hist one-hot [256 blk x 256 bins]", bench(jax.jit(hist_onehot), d8))


def hist_sortss(d):
    ds = jax.lax.sort((d,), num_keys=1, dimension=1)[0]
    edges = jnp.arange(257, dtype=jnp.int32)
    f = jax.vmap(lambda row: jnp.searchsorted(row, edges))
    s = f(ds)
    return s[:, 1:] - s[:, :-1]


rep("hist sort+searchsorted per block", bench(jax.jit(hist_sortss), d8))

# --- gather by permutation (the apply step) ---------------------------------
perm32 = jnp.asarray(rng.permutation(n).astype(np.int32))
rep("gather i64 by random i32 perm", bench(
    jax.jit(lambda x, p: jnp.take(x, p)), k64, perm32))

# near-sorted gather (radix dest locality: sorted within 256 runs)
perm_local = jnp.asarray(
    np.concatenate([np.sort(x) for x in np.array_split(rng.permutation(n), 256)])
    .astype(np.int32))
rep("gather i64 by blockwise-sorted perm", bench(
    jax.jit(lambda x, p: jnp.take(x, p)), k64, perm_local))

# --- cumsum ------------------------------------------------------------------
big = jnp.asarray(rng.randint(0, 100, n).astype(np.int32))
rep("cumsum i32 n", bench(jax.jit(jnp.cumsum), big))

print("\nsummary:")
for nm, ms, mrps in results:
    print(f"{nm:44s} {ms:9.2f} ms {mrps:9.1f} Mrows/s")
