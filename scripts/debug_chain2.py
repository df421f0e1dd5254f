"""Dump the compacted op list for chain 0 and simulate the executor
semantics in pure Python; compare against expected output."""
import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from minlz_tpu.oracle import decode as odec
from minlz_tpu.ops.encode_kernel import encode_block_device
from minlz_tpu.ops.device_codec import split_body
from minlz_tpu.ops import exec_chain as ec
from minlz_tpu.ops.pallas_decode import parse_segments_pallas

twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
data = (twain * 20)[: 32 << 10]

SEG = 4096
RNG = 128 * 1024
block, hints = encode_block_device(data, SEG, RNG)
_, want, pos = odec.parse_header(block)
segs = split_body(block[pos:], [h[0] for h in hints])
nseg = len(segs)
spc, nchain = ec.chain_geometry(nseg, SEG, RNG)
lanes = 128 * -(-(nchain * spc) // 128)
pc_data = max(len(sb) for sb in segs)
n_rows = -(-(pc_data + 1) // 512) * 512
pc = n_rows + ec.ROW_B

lens = np.zeros((lanes // 128, 128), np.int32)
comp_lanes = np.zeros((lanes, pc), np.uint8)
for i, sb in enumerate(segs):
    a = np.frombuffer(bytes(sb), np.uint8)
    comp_lanes[i, : len(a)] = a
    lens[i // 128, i % 128] = len(a)

# Parse on the (CPU interpret) transducer.
ct = comp_lanes[:, :n_rows].T.astype(np.int32)
ct = ct.reshape(n_rows // 4, 4, lanes // 128, 128)
words = ct[:, 0] | (ct[:, 1] << 8) | (ct[:, 2] << 16) | (ct[:, 3] << 24)
emits = parse_segments_pallas(jnp.asarray(words), jnp.asarray(lens), n_rows)

cap_pc = spc * (SEG // 2 + 2)
cap_pc = -(-cap_pc // ec.OP_T) * ec.OP_T
ops, counts = ec.compact_ops_chained(
    *emits, spc=spc, cap_pc=cap_pc, pc=pc, nchain=nchain
)
ops = np.asarray(ops)
counts = np.asarray(counts)
print("counts:", counts)

# Simulate the executor semantics faithfully in Python (per chain).
arena_bytes = np.zeros(ec.ROW_B, np.uint8)  # guard row
arena_bytes = np.concatenate([arena_bytes, comp_lanes.reshape(-1)])
out_base = len(arena_bytes)
out = np.zeros(nchain * spc * SEG, np.uint8)
arena = np.concatenate([arena_bytes, out])

ok = True
for ch in range(nchain):
    cur = out_base + ch * spc * SEG
    for k in range(counts[ch]):
        a, b, c = ops[ch, k]
        llen = a & 0x3FFF
        clen = (a >> 14) & 0x3FFF
        csrc = b
        ls = c
        # literals
        arena[cur : cur + llen] = arena[ls : ls + llen]
        cur += llen
        # copy
        src = cur - csrc
        for j in range(clen):
            arena[cur + j] = arena[src + j]
        cur += clen

sim = arena[out_base : out_base + len(data)].tobytes()
d = np.frombuffer(data, np.uint8)
g = np.frombuffer(sim, np.uint8)
bad = np.nonzero(g != d)[0]
if len(bad) == 0:
    print("python sim of op semantics: OK — bug is in the kernel")
else:
    i = int(bad[0])
    print(f"python sim MISMATCH: {len(bad)} bytes, first at {i}")
    print("want:", d[max(0, i - 8) : i + 24].tobytes())
    print("got :", g[max(0, i - 8) : i + 24].tobytes())
    # find the op covering dst=i in chain i//(spc*SEG)
    ch = i // (spc * SEG)
    cur = ch * spc * SEG
    for k in range(counts[ch]):
        a, b, c = ops[ch, k]
        llen = a & 0x3FFF
        clen = (a >> 14) & 0x3FFF
        if cur <= i < cur + llen + clen:
            print(f"op {k}: llen={llen} clen={clen} csrc={b} lsrc={c} "
                  f"dst={cur} (bad at +{i-cur})")
            break
        cur += llen + clen
