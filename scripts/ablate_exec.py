"""Ablation study of the chained executor body on real TPU.

Clones _make_chain_kernel with feature switches to locate the per-op cost:
  full       — the real body (both sub-slots, realign, masks)
  norealign  — windows return r0 un-realigned (no barrel shifts)
  nomask     — skip bmask construction (store unmasked)
  onewin     — single unified sub-slot per iteration (span state machine)
  minimal    — 1 load + 1 store per op, no vector logic

Synthetic op streams mirror bench-corpus stats: ~6.6 B/op fused lit+copy
records (llen~2, clen~5).
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
from minlz_tpu.ops.exec_chain import OP_T, ROW_B, tile_words

# int32 byte-lane masks 0x000000FF..0xFF000000 (the pre-arithmetic-bmask
# form the ablation bodies were measured with).
_BYTE_MASKS = [
    np.int32(np.uint32(0xFF << (8 * k)).view(np.int32)) for k in range(4)
]

INTERP = jax.default_backend() != "tpu"


def make_kernel(nchain, out_base_row, chain_rows, n_arena_rows, variant):
    F = 8

    def kernel(counts_ref, ops_ref, arena_in_ref, arena_ref, st_ref,
               acc_ref):
        t = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        b4 = iota * 4

        @pl.when(t == 0)
        def _init():
            arena_ref[...] = arena_in_ref[...]
            for ch in range(nchain):
                st_ref[ch * F + 0] = 0
                st_ref[ch * F + 1] = 0
                st_ref[ch * F + 2] = 0
                st_ref[ch * F + 3] = 1
                st_ref[ch * F + 4] = 0
                st_ref[ch * F + 5] = (out_base_row + ch * chain_rows) * ROW_B

        def window(byte_start):
            ws = byte_start >> 2
            bs = byte_start & 3
            row = jnp.clip(ws >> 7, 0, n_arena_rows - 2)
            m = ws - row * 128
            r0 = jnp.broadcast_to(arena_ref[pl.ds(row, 1), :], (8, 128))
            if variant == "norealign":
                return r0
            r1 = jnp.broadcast_to(arena_ref[pl.ds(row + 1, 1), :], (8, 128))
            idx = iota + m
            w = jnp.where(
                idx < 128,
                jnp.take_along_axis(r0, idx & 127, axis=1),
                jnp.take_along_axis(r1, idx & 127, axis=1),
            )
            idx1 = idx + 1
            wn = jnp.where(
                idx1 < 128,
                jnp.take_along_axis(r0, idx1 & 127, axis=1),
                jnp.take_along_axis(r1, idx1 & 127, axis=1),
            )
            sr_u = (bs * 8).astype(jnp.uint32)
            sl = (32 - bs * 8) & 31
            lo = (w.astype(jnp.uint32) >> sr_u).astype(jnp.int32)
            hi = wn << sl
            return jnp.where(bs == 0, lo, lo | hi)

        def bmask(lo_b, hi_b):
            if variant == "nomask":
                return jnp.full((8, 128), -1, jnp.int32)
            m = jnp.zeros((8, 128), jnp.int32)
            for kby in range(4):
                p = b4 + kby
                sel = (p >= lo_b) & (p < hi_b)
                m = m | jnp.where(sel, _BYTE_MASKS[kby], jnp.int32(0))
            return m

        limits = [jnp.minimum(counts_ref[ch], (t + 1) * OP_T)
                  for ch in range(nchain)]

        def cond(state):
            act = None
            for ch in range(nchain):
                op, lr, cr = (state[ch * 3], state[ch * 3 + 1],
                              state[ch * 3 + 2])
                a = (op < limits[ch]) | (lr > 0) | (cr > 0)
                act = a if act is None else (act | a)
            return act

        def body(state):
            new = list(state)
            for ch in range(nchain):
                op = state[ch * 3]
                lr = state[ch * 3 + 1]
                cr = state[ch * 3 + 2]
                eff = state[nchain * 3 + ch * 3]
                ls = state[nchain * 3 + ch * 3 + 1]
                cur = state[nchain * 3 + ch * 3 + 2]
                acc = state[nchain * 6 + ch]
                last_row = out_base_row + (ch + 1) * chain_rows - 1

                if variant == "minimal":
                    can = op < limits[ch]
                    idx = jnp.clip(op - t * OP_T, 0, OP_T - 1)
                    base = ch * (OP_T * 3) + idx * 3
                    a = ops_ref[base]
                    srcrow = jnp.clip(
                        (ops_ref[base + 1] >> 9), 0, n_arena_rows - 1)
                    v = arena_ref[pl.ds(srcrow, 1), :]
                    arena_ref[pl.ds(jnp.minimum(cur >> 9, last_row), 1),
                              :] = v
                    cur = cur + (a & 0x3FFF) + ((a >> 14) & 0x3FFF)
                    op = op + can.astype(jnp.int32)
                    new[ch * 3] = op
                    new[nchain * 3 + ch * 3 + 2] = cur
                    continue

                need = (lr == 0) & (cr == 0)
                can = need & (op < limits[ch])
                idx = jnp.clip(op - t * OP_T, 0, OP_T - 1)
                base = ch * (OP_T * 3) + idx * 3
                a = ops_ref[base]
                b = ops_ref[base + 1]
                cw = ops_ref[base + 2]
                lr = jnp.where(can, a & 0x3FFF, lr)
                cr = jnp.where(can, (a >> 14) & 0x3FFF, cr)
                eff = jnp.where(can, jnp.maximum(b, 1), eff)
                ls = jnp.where(can, cw, ls)
                op = op + can.astype(jnp.int32)

                if variant == "onewin":
                    # unified span slot: literal if lr>0 else copy
                    is_lit = lr > 0
                    q = cur & (ROW_B - 1)
                    rem = jnp.where(is_lit, lr, jnp.minimum(cr, eff))
                    ta = jnp.minimum(rem, ROW_B - q)
                    srcb = jnp.where(is_lit, ls - q, cur - eff - q)
                    win = window(srcb)
                    m = bmask(q, q + ta)
                    acc = (win & m) | (acc & ~m)
                    arena_ref[
                        pl.ds(jnp.minimum(cur >> 9, last_row), 1), :
                    ] = acc[0:1]
                    cur = cur + ta
                    ls = jnp.where(is_lit, ls + ta, ls)
                    lr = jnp.where(is_lit, lr - ta, lr)
                    crn = jnp.where(is_lit, cr, cr - ta)
                    eff = jnp.where(
                        ~is_lit & (ta == eff) & (crn > 0), eff * 2, eff)
                    cr = crn
                else:
                    q = cur & (ROW_B - 1)
                    ta = jnp.minimum(lr, ROW_B - q)
                    win = window(ls - q)
                    m = bmask(q, q + ta)
                    acc = (win & m) | (acc & ~m)
                    arena_ref[
                        pl.ds(jnp.minimum(cur >> 9, last_row), 1), :
                    ] = acc[0:1]
                    cur = cur + ta
                    ls = ls + ta
                    lr = lr - ta

                    q2 = cur & (ROW_B - 1)
                    tb = jnp.minimum(jnp.minimum(cr, eff), ROW_B - q2)
                    tb = jnp.where(lr == 0, tb, 0)
                    win2 = window(cur - eff - q2)
                    m2 = bmask(q2, q2 + tb)
                    acc = (win2 & m2) | (acc & ~m2)
                    arena_ref[
                        pl.ds(jnp.minimum(cur >> 9, last_row), 1), :
                    ] = acc[0:1]
                    cur = cur + tb
                    cr = cr - tb
                    eff = jnp.where((tb == eff) & (cr > 0), eff * 2, eff)

                new[ch * 3] = op
                new[ch * 3 + 1] = lr
                new[ch * 3 + 2] = cr
                new[nchain * 3 + ch * 3] = eff
                new[nchain * 3 + ch * 3 + 1] = ls
                new[nchain * 3 + ch * 3 + 2] = cur
                new[nchain * 6 + ch] = acc
            return tuple(new)

        state = []
        for ch in range(nchain):
            state += [st_ref[ch * F + 0], st_ref[ch * F + 1],
                      st_ref[ch * F + 2]]
        for ch in range(nchain):
            state += [st_ref[ch * F + 3], st_ref[ch * F + 4],
                      st_ref[ch * F + 5]]
        for ch in range(nchain):
            state.append(
                jnp.broadcast_to(acc_ref[pl.ds(ch, 1), :], (8, 128))
            )
        state = jax.lax.while_loop(cond, body, tuple(state))
        for ch in range(nchain):
            st_ref[ch * F + 0] = state[ch * 3]
            st_ref[ch * F + 1] = state[ch * 3 + 1]
            st_ref[ch * F + 2] = state[ch * 3 + 2]
            st_ref[ch * F + 3] = state[nchain * 3 + ch * 3]
            st_ref[ch * F + 4] = state[nchain * 3 + ch * 3 + 1]
            st_ref[ch * F + 5] = state[nchain * 3 + ch * 3 + 2]
            acc_ref[pl.ds(ch, 1), :] = state[nchain * 6 + ch][0:1]

    return kernel


def run(variant, nchain=8, ops_per_chain=4096):
    rng = np.random.default_rng(0)
    # synthetic records: llen 0-4, clen 4-10, eff(off) 8-2000
    cap_pc = -(-ops_per_chain // OP_T) * OP_T
    chain_rows = 64  # 32KiB per chain output
    out_base_row = 8
    n_arena_rows = out_base_row + nchain * chain_rows + 2

    ops = np.zeros((nchain, cap_pc, 3), np.int32)
    for c in range(nchain):
        ll = rng.integers(0, 5, ops_per_chain)
        cl = rng.integers(4, 11, ops_per_chain)
        ops[c, :ops_per_chain, 0] = ll | (cl << 14)
        ops[c, :ops_per_chain, 1] = rng.integers(8, 2000, ops_per_chain)
        ops[c, :ops_per_chain, 2] = rng.integers(
            0, out_base_row * ROW_B, ops_per_chain)
    counts = jnp.full((nchain,), ops_per_chain, jnp.int32)
    n_tiles = cap_pc // OP_T
    tiles = (ops.reshape(nchain, n_tiles, OP_T, 3)
             .transpose(1, 0, 2, 3).reshape(n_tiles, nchain * OP_T * 3))
    tw = tile_words(nchain)
    ops_flat = jnp.asarray(np.pad(
        tiles, ((0, 0), (0, tw - nchain * OP_T * 3))).reshape(-1))
    arena = jnp.zeros((n_arena_rows, 128), jnp.int32)

    kern = pl.pallas_call(
        make_kernel(nchain, out_base_row, chain_rows, n_arena_rows, variant),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tw,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_arena_rows, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_arena_rows, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_arena_rows, 128), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((nchain * 8,), jnp.int32),
            pltpu.VMEM((nchain, 128), jnp.int32),
        ],
        input_output_aliases={2: 0},
        interpret=INTERP,
    )
    jf = jax.jit(lambda c_, o_, a_: kern(c_, o_, a_))
    try:
        t, _ = timed_device(jf, (counts, ops_flat, arena), 3)
    except Exception as e:
        print(f"{variant} nchain={nchain}: FAIL {str(e)[:100]}", flush=True)
        return
    total = nchain * ops_per_chain
    print(f"{variant:10s} nchain={nchain:2d}: {t*1e9/total:6.1f} ns/op",
          flush=True)


if __name__ == "__main__":
    for variant in ("full", "onewin", "norealign", "nomask", "minimal"):
        for nc in (8, 16):
            run(variant, nchain=nc)
