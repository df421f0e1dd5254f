"""Record statistics for the decode executor redesign (round 5).

Classifies transducer records on the bench corpus by whether they can
execute in ONE executor pass with fully precomputed addressing:
  fast  = literal part fits one 512B arena row AND copy part fits one row
          AND no RLE eff-doubling (csrc >= clen)
Everything else needs the multi-pass state machine.  Prints the fraction
plus a pass-count histogram estimate for the slow remainder.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_corpus
from minlz_tpu.ops import encode_kernel as ek
from minlz_tpu.ops import exec_chain as ec
from minlz_tpu.ops.device_codec import split_body
from minlz_tpu.ops.pallas_decode import parse_segments_pallas
from minlz_tpu.native.codec import get_codec

MB = int(os.environ.get("MB", "4"))
ROW_B = 512


def main():
    corpus = make_corpus(MB << 20)
    block_size = 1 << 20
    blocks = [corpus[i * block_size:(i + 1) * block_size]
              for i in range(len(corpus) // block_size)]
    seg = ek.SEG
    codec = get_codec()

    enc_fn = jax.jit(lambda f: ek.find_matches_dyn(
        f.astype(jnp.int32), block_size, seg, ec.RANGE)[0])
    batch_segs = []
    for b in blocks:
        d = np.asarray(enc_fn(jnp.asarray(
            np.frombuffer(b, np.uint8))[None, :])).reshape(-1)
        body, hints = codec.parse_serialize(b, d, seg, ec.RANGE)
        batch_segs.append(split_body(body, [h[0] for h in hints]))

    (comp_lanes, lens, bases, lastrow), statics, out0, _ = ec.plan_batch(
        batch_segs, seg, ec.RANGE)
    n_rows = statics["n_rows"]

    @jax.jit
    def stats(comp_lanes, lens):
        ct = comp_lanes[:, :n_rows].T.astype(jnp.int32)
        sub = comp_lanes.shape[0] // 128
        ct = ct.reshape(n_rows // 4, 4, sub, 128)
        words = (ct[:, 0] | (ct[:, 1] << 8) | (ct[:, 2] << 16)
                 | (ct[:, 3] << 24))
        kind, dst, clen, csrc, lsrc, llen, _lacc = parse_segments_pallas(
            words, lens, n_rows)
        real = kind > 0
        q = dst & (ROW_B - 1)
        lit_ok = (llen == 0) | (q + llen <= ROW_B)
        q2 = (q + llen) & (ROW_B - 1)
        no_dbl = csrc >= clen
        cpy_ok = (clen == 0) | ((q2 + clen <= ROW_B) & no_dbl)
        fast = real & lit_ok & cpy_ok

        # Pass estimate for slow records: lit rows + doubling rounds + copy
        # row crossings (upper-bound-ish; doubling rounds via log2).
        lit_passes = jnp.where(llen > 0, (q + llen + ROW_B - 1) // ROW_B, 0)
        eff0 = jnp.maximum(csrc, 1)
        dbl_rounds = jnp.where(
            (clen > 0) & (csrc < clen),
            jnp.ceil(jnp.log2(jnp.maximum(clen.astype(jnp.float32)
                                          / eff0.astype(jnp.float32), 1.0))
                     ).astype(jnp.int32) + 1,
            0)
        cpy_passes = jnp.where(
            clen > 0,
            jnp.maximum((q2 + clen + ROW_B - 1) // ROW_B, dbl_rounds), 0)
        passes = jnp.maximum(lit_passes, 1) + cpy_passes - 1
        passes = jnp.where(real, jnp.maximum(passes, 1), 0)

        r = {}
        r["n_real"] = jnp.sum(real)
        r["n_fast"] = jnp.sum(fast)
        r["n_dbl"] = jnp.sum(real & (clen > 0) & ~no_dbl)
        r["n_litcross"] = jnp.sum(real & ~lit_ok)
        r["n_cpycross"] = jnp.sum(
            real & (clen > 0) & no_dbl & (q2 + clen > ROW_B))
        r["tot_passes"] = jnp.sum(passes)
        r["slow_passes"] = jnp.sum(jnp.where(fast, 0, passes))
        r["litonly"] = jnp.sum(real & (clen == 0))
        r["cpyonly"] = jnp.sum(real & (llen == 0))
        r["llen_sum"] = jnp.sum(jnp.where(real, llen, 0))
        r["clen_sum"] = jnp.sum(jnp.where(real, clen, 0))
        return r

    r = {k: int(v) for k, v in stats(
        jnp.asarray(comp_lanes), jnp.asarray(lens)).items()}
    n = r["n_real"]
    print(f"MB={MB} records={n} ({n/MB/1024:.0f}/KiB)")
    print(f"fast: {r['n_fast']} ({r['n_fast']/n:.1%})")
    print(f"  doubling (csrc<clen): {r['n_dbl']} ({r['n_dbl']/n:.2%})")
    print(f"  lit row-cross: {r['n_litcross']} ({r['n_litcross']/n:.2%})")
    print(f"  copy row-cross: {r['n_cpycross']} ({r['n_cpycross']/n:.2%})")
    print(f"lit-only: {r['litonly']/n:.1%}  copy-only: {r['cpyonly']/n:.1%}")
    print(f"avg llen {r['llen_sum']/n:.2f} avg clen {r['clen_sum']/n:.2f}")
    print(f"est passes/record: {r['tot_passes']/n:.3f} "
          f"(slow records avg {r['slow_passes']/max(n-r['n_fast'],1):.2f})")


if __name__ == "__main__":
    main()
