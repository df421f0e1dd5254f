"""Encode match-finder phase split on the bench corpus (TPU).

Times find_matches_dyn at each level plus isolated tier passes, to rank
where the 8+ ms/MB goes (sorts vs doubling vs merges).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import timed_device, make_corpus
from minlz_tpu.ops import encode_kernel as ek
from minlz_tpu.ops import exec_chain as ec


def main():
    block = make_corpus(1 << 20)
    N = 1 << 20
    flat = jnp.asarray(np.frombuffer(block, np.uint8))[None, :]

    def lvl(level):
        @jax.jit
        def f(x):
            return ek.find_matches_dyn(
                x.astype(jnp.int32), N, ek.SEG, ec.RANGE, level=level)[0]
        return f

    for level in (-1, 1, 2, 3):
        t, _ = timed_device(lvl(level), (flat,), 3)
        print(f"find_matches level {level:2d}: {t*1e3:6.2f} ms/MB")

    # Isolated passes at the real geometry.
    d = flat.astype(jnp.uint32)
    v0 = (d | jnp.roll(d, -1, axis=1) << 8 | jnp.roll(d, -2, axis=1) << 16
          | jnp.roll(d, -3, axis=1) << 24)
    W = 2 * ek.WINDOW
    pos_bits0 = 15
    h = ((v0 * ek._PRIME4) >> (32 - 16)).astype(jnp.int32)
    key = h << pos_bits0

    def short_pass(nback, shift):
        @jax.jit
        def f(k):
            return ek._window_pass(k, [], N, W, shift, nback=nback,
                                   pos_bits=pos_bits0)[0]
        return f

    for nback, shift, tag in ((2, 0, "short aligned nb2"),
                              (1, W // 2, "short shifted nb1"),
                              (1, 0, "short aligned nb1")):
        t, _ = timed_device(short_pass(nback, shift), (key,), 3)
        print(f"{tag}: {t*1e3:6.2f} ms")

    # Mid tier (stride 8): 2 value payloads.
    M = N // 8
    words = flat.astype(jnp.uint32).reshape(1, M, 8)
    w0 = (words[:, :, 0] | words[:, :, 1] << 8 | words[:, :, 2] << 16
          | words[:, :, 3] << 24).astype(jnp.int32)
    w1 = (words[:, :, 4] | words[:, :, 5] << 8 | words[:, :, 6] << 16
          | words[:, :, 7] << 24).astype(jnp.int32)
    keym = (w0 * 31 + w1) << ek._POS_BITS

    def mid_pass(shift):
        @jax.jit
        def f(k, a, b):
            return ek._window_pass(k, [a, b], M, ek.WINDOW, shift,
                                   nback=1)[0]
        return f

    for shift, tag in ((0, "mid aligned"), (ek.WINDOW // 2, "mid shifted")):
        t, _ = timed_device(mid_pass(shift), (keym, w0, w1), 3)
        print(f"{tag}: {t*1e3:6.2f} ms")

    # Doubling cost on [1, N].
    ext = (flat > 0)

    @jax.jit
    def dbl(e):
        return ek._run_doubling(e, 256)

    t, _ = timed_device(dbl, (ext,), 3)
    print(f"run_doubling cap256 on [1,1Mi]: {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
