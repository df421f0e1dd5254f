"""Phase breakdown + primitive probes for the decode executor redesign.

Measures on the real chip:
  1. decode phase split: transducer parse / op compaction / chain execute
     on bench-corpus block 0 (the 50 ms/MB mystery).
  2. op statistics: ops per MB, avg bytes/op (the op budget).
  3. pltpu.roll (dynamic lane rotate) vs take_along_axis in a chain loop.
  4. XLA-level jnp.take gather throughput (pointer-doubling feasibility).
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

from bench import timed_device, make_corpus

INTERP = jax.default_backend() != "tpu"


def phase_breakdown(n_blocks=4):
    """Parse vs (compact+schedule+execute) split for the BATCHED decode
    pipeline (exec_chain._decode_batch_jit) on bench-corpus blocks."""
    from minlz_tpu.ops import encode_kernel as ek
    from minlz_tpu.ops import exec_chain as ec
    from minlz_tpu.ops.device_codec import split_body
    from minlz_tpu.native.codec import get_codec
    from minlz_tpu.ops.pallas_decode import parse_segments_pallas

    corpus = make_corpus(n_blocks << 20)
    seg = ek.SEG
    codec = get_codec()
    batch_segs = []
    for bi in range(n_blocks):
        block = corpus[bi << 20 : (bi + 1) << 20]
        flat = jnp.asarray(np.frombuffer(block, np.uint8))[None, :].astype(
            jnp.int32)
        dist, _ = ek.find_matches_dyn(flat, len(block), seg, ec.RANGE)
        body, hints = codec.parse_serialize(
            block, np.asarray(dist).reshape(-1), seg, ec.RANGE)
        batch_segs.append(split_body(body, [h[0] for h in hints]))
    (cl, ln, ba, lr), statics, out0, _ = ec.plan_batch(
        batch_segs, seg, ec.RANGE)
    args = (jnp.asarray(cl), jnp.asarray(ln), jnp.asarray(ba),
            jnp.asarray(lr))
    n_rows = statics["n_rows"]
    lanes = cl.shape[0]

    @jax.jit
    def parse_only(cl_, ln_, ba_, lr_):
        ct = cl_[:, :n_rows].T.astype(jnp.int32)
        ct = ct.reshape(n_rows // 4, 4, lanes // 128, 128)
        words = (ct[:, 0] | (ct[:, 1] << 8) | (ct[:, 2] << 16)
                 | (ct[:, 3] << 24))
        return parse_segments_pallas(words, ln_, n_rows)

    @jax.jit
    def full(cl_, ln_, ba_, lr_):
        return ec._decode_batch_jit(cl_, ln_, ba_, lr_, **statics)[0]

    t_parse, _ = timed_device(parse_only, args, 3)
    t_full, _ = timed_device(full, args, 3)
    _, counts = ec._decode_batch_jit(*args, **statics)
    total_ops = int(np.asarray(counts).sum())
    mb = n_blocks
    print(f"batch {n_blocks} x 1 MiB, R {statics['R']}, K {statics['K']}, "
          f"cap_pr {statics['cap_pr']}")
    print(f"ops total {total_ops} ({total_ops/mb:.0f}/MiB, "
          f"{(mb << 20)/max(total_ops,1):.1f} B/op)")
    print(f"parse          {t_parse*1e3:8.2f} ms ({t_parse*1e3/mb:.2f}/MB)")
    print(f"full pipeline  {t_full*1e3:8.2f} ms ({t_full*1e3/mb:.2f}/MB)")
    print(f"compact+exec   {(t_full-t_parse)*1e3:8.2f} ms "
          f"({(t_full-t_parse)*1e9/max(total_ops,1):.0f} ns/op)")


# ---------------- roll vs take_along_axis chain loop ----------------------

def bench_chain_body(n_ops=4096, n_chains=16, rows=4096, mode="taa"):
    """Per chain-op: load 2 dynamic rows, realign window (taa vs roll),
    mask-merge into accumulator, store 1 dynamic row.  Approximates the
    real executor body cost without op semantics."""
    rng = np.random.default_rng(0)
    rr = rows // n_chains
    meta = np.zeros(n_chains * n_ops * 3, np.int32)
    for c in range(n_chains):
        base = c * n_ops * 3
        meta[base : base + n_ops * 3 : 3] = rng.integers(
            c * rr, (c + 1) * rr - 2, n_ops, dtype=np.int32)       # src row
        meta[base + 1 : base + n_ops * 3 : 3] = rng.integers(
            c * rr, (c + 1) * rr, n_ops, dtype=np.int32)           # dst row
        meta[base + 2 : base + n_ops * 3 : 3] = rng.integers(
            0, 512, n_ops, dtype=np.int32)                          # byte off
    buf = jnp.zeros((rows, 128), jnp.int32)
    masks = [np.int32(np.uint32(0xFF << (8 * k)).view(np.int32))
             for k in range(4)]

    def kernel(meta_ref, buf_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        b4 = iota * 4

        def body(i, _):
            for c in range(n_chains):
                base = c * n_ops * 3 + i * 3
                src = meta_ref[base]
                dst = meta_ref[base + 1]
                off = meta_ref[base + 2]
                m = off >> 2
                r0 = jnp.broadcast_to(buf_ref[pl.ds(src, 1), :], (8, 128))
                r1 = jnp.broadcast_to(
                    buf_ref[pl.ds(src + 1, 1), :], (8, 128))
                if mode == "taa":
                    idx = iota + m
                    w = jnp.where(
                        idx < 128,
                        jnp.take_along_axis(r0, idx & 127, axis=1),
                        jnp.take_along_axis(r1, idx & 127, axis=1))
                elif mode == "roll":
                    sh = (128 - m) & 127
                    rot0 = pltpu.roll(r0, sh, 1)
                    rot1 = pltpu.roll(r1, sh, 1)
                    w = jnp.where(iota < 128 - m, rot0, rot1)
                else:  # minimal: no realign at all
                    w = r0 + r1
                lo = off & 511
                hi = jnp.minimum(lo + 64, 512)
                msk = jnp.zeros((8, 128), jnp.int32)
                for k in range(4):
                    p = b4 + k
                    msk = msk | jnp.where((p >= lo) & (p < hi), masks[k], 0)
                buf_ref[pl.ds(dst, 1), :] = (w & msk)[0:1]
            return 0

        jax.lax.fori_loop(0, n_ops, body, 0)
        out_ref[0, :] = buf_ref[0, :]

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        input_output_aliases={},
        interpret=INTERP,
    )
    jf = jax.jit(lambda r, b: f(r, b))
    t, _ = timed_device(jf, (jnp.asarray(meta), buf), 3)
    total = n_ops * n_chains
    print(f"chainbody mode={mode} chains={n_chains}: {t*1e9/total:.1f} ns/op",
          flush=True)


# ---------------- XLA gather throughput -----------------------------------

def bench_xla_gather(n=1 << 20, rounds=4):
    rng = np.random.default_rng(3)
    tbl = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))

    @jax.jit
    def f(t_, i_):
        x = i_
        for _ in range(rounds):
            x = jnp.take(t_, x)
        return x

    t, _ = timed_device(f, (tbl, idx), 3, chain=4)
    per = t / rounds
    print(f"XLA gather {n>>20} Mi elems: {per*1e3:.2f} ms/round "
          f"({n/per/1e9:.2f} G elem/s)", flush=True)


def bench_xla_scatter(L=256, P=2816, cap=8192):
    """Per-lane scatter (vmap .at[].set) — the sort-free compaction
    candidate: dense[l, rank] = value."""
    rng = np.random.default_rng(4)
    vals = jnp.asarray(rng.integers(0, 1 << 20, (L, P), dtype=np.int32))
    # ascending ranks with gaps (like op records within a lane)
    idx = np.sort(rng.integers(0, cap, (L, P)), axis=1).astype(np.int32)
    idx_d = jnp.asarray(idx)

    @jax.jit
    def f(v, ix):
        out = jnp.zeros((L, cap), jnp.int32)
        return jax.vmap(lambda o, a, w: o.at[a].set(w, mode="drop"))(
            out, ix, v)

    t, _ = timed_device(f, (vals, idx_d), 3, chain=8)
    total = L * P
    print(f"XLA scatter [{L},{P}]->[{L},{cap}]: {t*1e3:.2f} ms "
          f"({total/t/1e9:.2f} G elem/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "phases"):
        phase_breakdown()
    if which in ("all", "body"):
        for mode in ("minimal", "taa", "roll"):
            for c in (8, 16, 32):
                try:
                    bench_chain_body(n_chains=c, mode=mode)
                except Exception as e:
                    print(f"chainbody mode={mode} chains={c}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    if which in ("all", "gather"):
        try:
            bench_xla_gather()
        except Exception as e:
            print(f"gather FAIL: {str(e)[:200]}", flush=True)
    if which in ("all", "scatter"):
        try:
            bench_xla_scatter()
        except Exception as e:
            print(f"scatter FAIL: {str(e)[:200]}", flush=True)
