"""Debug harness: encode a block via the device encoder, decode it via
both the oracle and decode_block_chained, and report the first divergence."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from minlz_tpu.oracle import decode as odec
from minlz_tpu.ops.encode_kernel import encode_block_device
from minlz_tpu.ops.device_codec import split_body
from minlz_tpu.ops.exec_chain import decode_block_chained, chain_geometry

twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
data = (twain * 20)[: int(os.environ.get("DBG_KB", "32")) << 10]

SEG = 4096
RNG = 128 * 1024
block, hints = encode_block_device(data, SEG, RNG)
assert odec.decode_block(block) == data, "oracle decode failed!"
_, want, pos = odec.parse_header(block)
body = block[pos:]
segs = split_body(body, [h[0] for h in hints])
print(f"nseg={len(segs)} seg={SEG} out={len(data)}")
print("geometry:", chain_geometry(len(segs), SEG, RNG))

got = decode_block_chained(segs, len(data), SEG, RNG)
if got == data:
    print("chained decode OK")
else:
    g = np.frombuffer(got, np.uint8)
    d = np.frombuffer(data, np.uint8)
    bad = np.nonzero(g != d)[0]
    print(f"MISMATCH: {len(bad)} bytes differ; first at {bad[0]}, last {bad[-1]}")
    i = int(bad[0])
    print("seg of first bad:", i // SEG, "offset in seg:", i % SEG)
    print("want:", d[max(0,i-8):i+24].tobytes())
    print("got :", g[max(0,i-8):i+24].tobytes())
    # distribution of bad bytes by segment
    segs_bad = np.unique(bad // SEG)
    print("bad segments:", segs_bad[:20], "..." if len(segs_bad) > 20 else "")
