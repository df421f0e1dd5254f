"""Profile the device decode phases separately on real TPU.

Times parse / compact / execute individually plus a jnp.take gather
microbench, using the chained-dispatch timing discipline (tunnel-safe).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_corpus, timed_device
from minlz_tpu.ops import encode_kernel as ek
from minlz_tpu.ops import pallas_decode as pdk
from minlz_tpu.ops.device_codec import split_body
from minlz_tpu.native.codec import get_codec


def main():
    block_size = 1 << 20
    corpus = make_corpus(block_size)
    block = corpus[:block_size]

    codec = get_codec()
    seg = ek.SEG
    flat = jnp.asarray(np.frombuffer(block, np.uint8))[None, :]
    dist, _ = ek.find_matches_dyn(flat.astype(jnp.int32), block_size, seg)
    dist_np = np.asarray(dist).reshape(-1)
    body, hints = codec.parse_serialize(block, dist_np, seg)
    print(f"comp len {len(body)} ratio {len(body)/block_size:.4f}", flush=True)

    segs = split_body(body, [h[0] for h in hints])
    pc_data = max(len(sb) for sb in segs)
    n_rows = -(-(pc_data + 1) // pdk.ROW_TILE) * pdk.ROW_TILE
    pc = n_rows + pdk.MARGIN
    lens = np.zeros((pdk.SUB, 128), np.int32)
    comp = np.zeros((n_rows, pdk.B_LANES), np.uint8)
    for i, sb in enumerate(segs):
        a = np.frombuffer(sb, np.uint8)
        comp[: len(a), i] = a
        lens[i // 128, i % 128] = len(a)
    comp_d = jnp.asarray(comp)
    lens_d = jnp.asarray(lens)

    total_comp0 = sum(len(sb) for sb in segs)
    bound = total_comp0 // 2 + len(segs) + 1
    max_ops = -(-bound // pdk.OP_TILE) * pdk.OP_TILE
    max_ops = max(max_ops, pdk.OP_TILE)
    seg_rows = seg // 128
    n_out_rows = len(segs) * seg_rows + 8
    print(f"n_rows {n_rows} max_ops {max_ops} lanes {len(segs)}", flush=True)

    def prep(comp_u8):
        c = comp_u8.astype(jnp.int32)
        shifts = (jnp.asarray([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32))[
            None, :, None, None]
        words_d = (c.reshape(n_rows // 4, 4, pdk.SUB, 128) * shifts).sum(axis=1)
        comp_flat = jnp.pad(c.T.reshape(pdk.B_LANES, n_rows),
                            ((0, 0), (0, pc - n_rows)))
        return words_d, comp_flat

    def parse_only(comp_u8, lens_d):
        words_d, _ = prep(comp_u8)
        return pdk.parse_segments_pallas(words_d, lens_d, n_rows)

    def parse_compact(comp_u8, lens_d):
        words_d, _ = prep(comp_u8)
        emits = pdk.parse_segments_pallas(words_d, lens_d, n_rows)
        return pdk.compact_ops(*emits[:6], max_ops)

    def full(comp_u8, lens_d):
        words_d, comp_flat = prep(comp_u8)
        emits = pdk.parse_segments_pallas(words_d, lens_d, n_rows)
        packed, n_real = pdk.compact_ops(*emits[:6], max_ops)
        return pdk.execute_ops_pallas(
            packed, n_real, comp_flat.reshape(-1, 128), max_ops, pc,
            n_out_rows, seg_rows)

    t_parse, r = timed_device(jax.jit(parse_only), (comp_d, lens_d), 3)
    print(f"parse(+prep): {t_parse*1000:.2f} ms", flush=True)
    t_pc, (packed, n_real) = timed_device(
        jax.jit(parse_compact), (comp_d, lens_d), 3)
    print(f"parse+compact: {t_pc*1000:.2f} ms (compact ~{(t_pc-t_parse)*1000:.2f})",
          flush=True)
    print(f"n_real ops = {int(n_real)}", flush=True)
    t_full, _ = timed_device(jax.jit(full), (comp_d, lens_d), 3)
    print(f"full: {t_full*1000:.2f} ms (exec ~{(t_full-t_pc)*1000:.2f})", flush=True)

    # ---- gather microbench: 1M random int32 take from 1M table ----
    N = 1 << 20
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

    def take1(tbl, idx):
        return jnp.take(tbl, idx)

    t_take, _ = timed_device(jax.jit(take1), (tbl, idx), 3)
    print(f"jnp.take 1M<-1M int32: {t_take*1000:.3f} ms", flush=True)

    def take_chain(tbl, idx):
        for _ in range(8):
            idx = jnp.take(tbl, idx)
        return idx

    t_chain, _ = timed_device(jax.jit(take_chain), (tbl, idx), 3)
    print(f"8x chained take: {t_chain*1000:.3f} ms ({t_chain/8*1000:.3f}/take)",
          flush=True)

    # gather of bytes via int8
    tbl8 = jnp.asarray(rng.integers(0, 127, N, dtype=np.int8))
    t_take8, _ = timed_device(jax.jit(take1), (tbl8, idx), 3)
    print(f"jnp.take 1M<-1M int8: {t_take8*1000:.3f} ms", flush=True)

    # searchsorted microbench: 1M queries into 64K boundaries
    bnd = jnp.asarray(np.sort(rng.integers(0, N, 1 << 16).astype(np.int32)))
    q = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

    def ss(bnd, q):
        return jnp.searchsorted(bnd, q)

    t_ss, _ = timed_device(jax.jit(ss), (bnd, q), 3)
    print(f"searchsorted 1M q / 64K bnd: {t_ss*1000:.3f} ms", flush=True)

    # cumsum 1M
    def cs(x):
        return jnp.cumsum(x)

    t_cs, _ = timed_device(jax.jit(cs), (idx,), 3)
    print(f"cumsum 1M int32: {t_cs*1000:.3f} ms", flush=True)

    # sort 1M
    def srt(x):
        return jnp.sort(x)

    t_srt, _ = timed_device(jax.jit(srt), (idx,), 3)
    print(f"sort 1M int32: {t_srt*1000:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
