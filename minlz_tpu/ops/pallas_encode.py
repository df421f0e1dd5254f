"""Pallas kernel for the greedy token-selection parse (encode side).

The pure-XLA ``lax.scan`` version pays ~20µs/step of scan overhead — 80ms
for a 4096-step segment walk.  Inside a Pallas ``fori_loop`` the same
lockstep state machine runs at VPU latency (~10 cycles/step): the whole
walk costs tens of microseconds.

Layout: off/length arrive as [seg, B] (position-major rows); lanes are
segments, grouped (SUB, 128).  State (skip countdown, repeat offset)
persists in VMEM scratch across sequential grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_STEP = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _greedy_kernel(off_ref, len_ref, take_ref, isrep_ref, state_ref):
    t = pl.program_id(0)
    sub = off_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        state_ref[0] = jnp.zeros((sub, 128), jnp.int32)  # skip
        state_ref[1] = jnp.full((sub, 128), -1, jnp.int32)  # rep

    skip = state_ref[0]
    rep = state_ref[1]

    def body(r, st):
        skip, rep = st
        o = off_ref[r]
        l = len_ref[r]
        take = (skip == 0) & (l >= 4)
        take_ref[r] = take.astype(jnp.int32)
        isrep_ref[r] = (take & (o == rep)).astype(jnp.int32)
        new_skip = jnp.where(take, l - 1, jnp.maximum(skip - 1, 0))
        new_rep = jnp.where(take, o, rep)
        return (new_skip, new_rep)

    skip, rep = jax.lax.fori_loop(0, ROWS_PER_STEP, body, (skip, rep))
    state_ref[0] = skip
    state_ref[1] = rep


@functools.partial(jax.jit, static_argnames=("seg",))
def greedy_parse_pallas(off_t, len_t, seg: int):
    """off_t, len_t: [seg, SUB, 128] int32 (position-major, lane = segment).

    Returns (take, is_rep): [seg, SUB, 128] int32.
    """
    sub = off_t.shape[1]
    grid = (seg // ROWS_PER_STEP,)
    out_shape = jax.ShapeDtypeStruct((seg, sub, 128), jnp.int32)
    kernel = pl.pallas_call(
        _greedy_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS_PER_STEP, sub, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 2,
        out_specs=[
            pl.BlockSpec((ROWS_PER_STEP, sub, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 2,
        out_shape=[out_shape] * 2,
        scratch_shapes=[pltpu.VMEM((2, sub, 128), jnp.int32)],
        interpret=_interpret(),
    )
    return kernel(off_t, len_t)
