"""Fine phase split for executor v2 vs v1: parse / +compact / full."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import timed_device, make_corpus
from minlz_tpu.ops import encode_kernel as ek
from minlz_tpu.ops import exec_chain as ec
from minlz_tpu.ops.device_codec import split_body
from minlz_tpu.native.codec import get_codec
from minlz_tpu.ops.pallas_decode import parse_segments_pallas

N_BLOCKS = int(os.environ.get("NB", "4"))


def main():
    corpus = make_corpus(N_BLOCKS << 20)
    seg = ek.SEG
    codec = get_codec()
    batch_segs = []
    for bi in range(N_BLOCKS):
        block = corpus[bi << 20:(bi + 1) << 20]
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
    mb = N_BLOCKS

    @jax.jit
    def parse_only(cl_, ln_, ba_, lr_):
        ct = cl_[:, :n_rows].T.astype(jnp.int32)
        ct = ct.reshape(n_rows // 4, 4, lanes // 128, 128)
        words = (ct[:, 0] | (ct[:, 1] << 8) | (ct[:, 2] << 16)
                 | (ct[:, 3] << 24))
        return parse_segments_pallas(words, ln_, n_rows)

    inner = ec._decode_batch_jit.__wrapped__  # bypass shared jit cache

    def measure(v2, stub_exec):
        st = dict(statics, v2=v2)
        orig = ec.execute_fast, ec.execute_scheduled
        if stub_exec:
            ec.execute_fast = lambda ops, ends, comp, **k: ops[:8]
            ec.execute_scheduled = lambda ops, c, b, l, comp, **k: ops[:8]
        try:
            f = jax.jit(lambda a, b, c, d: inner(a, b, c, d, **st)[0])
            t, _ = timed_device(f, args, 3)
        finally:
            ec.execute_fast, ec.execute_scheduled = orig
        return t

    abl = os.environ.get("MINLZ_ABL", "")
    if abl:
        tf = measure(True, False)
        print(f"v2[{abl}]: full  {tf*1e3/mb:7.2f} ms/MB")
        return

    t_parse, _ = timed_device(parse_only, args, 3)
    print(f"parse          {t_parse*1e3/mb:7.2f} ms/MB")
    for v2 in (True, False):
        tc = measure(v2, True)
        tf = measure(v2, False)
        tag = "v2" if v2 else "v1"
        print(f"{tag}: +compact    {tc*1e3/mb:7.2f} ms/MB   "
              f"(compact {max(tc-t_parse,0)*1e3/mb:.2f})")
        print(f"{tag}: full        {tf*1e3/mb:7.2f} ms/MB   "
              f"(execute {max(tf-tc,0)*1e3/mb:.2f})")


if __name__ == "__main__":
    main()
