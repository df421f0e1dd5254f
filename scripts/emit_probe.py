"""Measure the all-device encode path (emit.encode_block_emit) on TPU:
device time per MB and ratio vs the host-serialized path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import timed_device, make_corpus


def main():
    from minlz_tpu.ops import encode_kernel as ek
    from minlz_tpu.ops import exec_chain as ec
    from minlz_tpu.ops.emit import encode_block_emit
    from minlz_tpu.oracle import decode as odec
    from minlz_tpu.minlz import put_uvarint
    from minlz_tpu.native.codec import get_codec

    corpus = make_corpus(1 << 20)
    n = len(corpus)
    seg = ek.SEG
    flat = jnp.asarray(np.frombuffer(corpus, np.uint8))[None, :].astype(
        jnp.int32
    )

    t_emit, (out, out_lens) = timed_device(
        lambda f: encode_block_emit(f, n, seg, ec.RANGE), (flat,), 3,
        chain=8,
    )
    out = np.asarray(out)
    out_lens = np.asarray(out_lens)
    body = b"".join(
        out[i, : out_lens[i]].tobytes() for i in range(out.shape[0])
    )
    print(f"device emit: {t_emit*1e3:.2f} ms/MB, "
          f"ratio {len(body)/n:.4f}")
    blk = b"\x00" + put_uvarint(n) + body
    assert odec.decode_block(blk) == corpus, "emit stream corrupt!"
    print("emit stream decodes bit-exact")

    # Host path comparison (match find already shared): serialize cost
    dist, _ = ek.find_matches_dyn(flat, n, seg, ec.RANGE)
    dist_np = np.asarray(dist).reshape(-1)
    codec = get_codec()
    t0 = time.perf_counter()
    hb, _ = codec.parse_serialize(corpus, dist_np, seg, ec.RANGE)
    t_host = time.perf_counter() - t0
    print(f"host parse+serialize: {t_host*1e3:.2f} ms/MB, "
          f"ratio {len(hb)/n:.4f}")


if __name__ == "__main__":
    main()
