"""Microbenchmark candidate executor kernel patterns on the real TPU.

A) scalar op loop: 1 dynamic row load + 1 dynamic row store per iteration,
   single chain vs 8 interleaved independent chains -> cycles/op.
B) cross-sublane vreg gather: gather 1024 arbitrary int32s from a (8,128)
   vreg table via 8 broadcast-shuffle-select rounds -> elements/s.
C) same with a 9-vreg (36KiB) table span.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import timed_device

INTERP = jax.default_backend() != "tpu"


# ---------------- A: scalar op loop --------------------------------------

def make_scalar_kernel(n_ops: int, n_chains: int):
    """Each chain does n_ops iterations: load a dynamic row, add 1, store to
    another dynamic row.  Rows precomputed in SMEM."""

    def kernel(rows_ref, buf_ref, out_ref):
        def body(i, _):
            for c in range(n_chains):
                src = rows_ref[c * n_ops * 2 + i * 2]
                dst = rows_ref[c * n_ops * 2 + i * 2 + 1]
                v = buf_ref[pl.ds(src, 1), :]
                buf_ref[pl.ds(dst, 1), :] = v + 1
            return 0

        jax.lax.fori_loop(0, n_ops, body, 0)
        out_ref[0, :] = buf_ref[0, :]

    return kernel


def bench_scalar(n_ops=8192, n_chains=1, rows=4096):
    rng = np.random.default_rng(0)
    # per chain: disjoint row regions to avoid aliasing between chains
    rr = rows // n_chains
    rows_arr = np.zeros(n_chains * n_ops * 2, np.int32)
    for c in range(n_chains):
        rows_arr[c * n_ops * 2 : (c + 1) * n_ops * 2] = rng.integers(
            c * rr, (c + 1) * rr, n_ops * 2, dtype=np.int32)
    buf = jnp.zeros((rows, 128), jnp.int32)

    f = pl.pallas_call(
        make_scalar_kernel(n_ops, n_chains),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        interpret=INTERP,
    )
    jf = jax.jit(lambda r, b: f(r, b))
    t, _ = timed_device(jf, (jnp.asarray(rows_arr), buf), 3)
    total = n_ops * n_chains
    print(f"A chains={n_chains}: {t*1e9/total:.1f} ns/op "
          f"({total/t/1e6:.1f} M ops/s)", flush=True)


# ---------------- B: cross-sublane vreg gather -----------------------------

def make_gather_kernel(n_iters: int, tbl_vregs: int):
    """Gather (8,128) int32 results from a (8*tbl_vregs,128) table at
    arbitrary flat indices, n_iters times (iterating over query blocks)."""

    def kernel(tbl_ref, idx_ref, out_ref):
        def body(i, acc):
            idx = idx_ref[pl.ds(i * 8, 8), :]
            sub = idx // 128   # which table row 0..8*tbl_vregs-1
            lane = idx % 128
            r = jnp.zeros((8, 128), jnp.int32)
            for row in range(8 * tbl_vregs):
                tr = jnp.broadcast_to(tbl_ref[pl.ds(row, 1), :], (8, 128))
                g = jnp.take_along_axis(tr, lane, axis=1)
                r = jnp.where(sub == row, g, r)
            return acc + r

        acc = jax.lax.fori_loop(0, n_iters, body,
                                jnp.zeros((8, 128), jnp.int32))
        out_ref[:, :] = acc

    return kernel


def bench_gather(n_iters=512, tbl_vregs=1):
    rng = np.random.default_rng(1)
    tblN = tbl_vregs * 1024
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (tbl_vregs * 8, 128),
                                   dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, tblN, (n_iters * 8, 128),
                                   dtype=np.int32))
    f = pl.pallas_call(
        make_gather_kernel(n_iters, tbl_vregs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=INTERP,
    )
    jf = jax.jit(lambda t_, i_: f(t_, i_))
    t, _ = timed_device(jf, (tbl, idx), 3)
    total = n_iters * 1024
    print(f"B tbl={tbl_vregs}vreg ({tblN*4//1024}KiB): "
          f"{t*1e9/total:.2f} ns/elem ({total/t/1e9:.2f} G elem/s)",
          flush=True)


# ---------------- C: take_along_axis raw throughput ------------------------

def bench_taa(n_iters=2048):
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, 100, (8, 128), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 128, (n_iters * 8, 128), dtype=np.int32))

    def kernel(a_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = idx_ref[pl.ds(i * 8, 8), :]
            return acc + jnp.take_along_axis(a_ref[:, :], ix, axis=1)

        out_ref[:, :] = jax.lax.fori_loop(
            0, n_iters, body, jnp.zeros((8, 128), jnp.int32))

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=INTERP,
    )
    jf = jax.jit(lambda a_, i_: f(a_, i_))
    t, _ = timed_device(jf, (a, idx), 3)
    total = n_iters * 1024
    print(f"C take_along_axis: {t*1e9/total:.2f} ns/elem "
          f"({total/t/1e9:.2f} G elem/s)", flush=True)


if __name__ == "__main__":
    bench_taa()
    bench_gather(tbl_vregs=1)
    bench_gather(tbl_vregs=2)
    bench_gather(tbl_vregs=4)
    bench_gather(n_iters=256, tbl_vregs=9)
    bench_scalar(n_chains=1)
    bench_scalar(n_chains=2)
    bench_scalar(n_chains=4)
    bench_scalar(n_chains=8)
    bench_scalar(n_chains=16)
