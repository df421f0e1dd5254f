"""Faithful Python simulation of the exec_chain kernel algorithm (row/acc
granularity, eff-doubling, tile limits) to find where it diverges from the
simple op semantics."""
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

ROW = 512
guard = np.zeros(ROW, np.uint8)
arena = np.concatenate([guard, comp_lanes.reshape(-1),
                        np.zeros(nchain * spc * SEG + 2 * ROW, np.uint8)])
out_base = ROW + comp_lanes.size

first_bad_reported = [False]
d = np.frombuffer(data, np.uint8)


def window(bs):
    """512 arena bytes starting at bs, replicating window()'s row clamp."""
    ws = bs >> 2
    row = min(max(ws >> 7, 0), len(arena) // ROW - 2)
    m = ws - row * 128
    # words ws..ws+128 from rows row,row+1 then byte shift
    base = row * ROW + (m << 2) + (bs & 3)
    return arena[base : base + 513]


for ch in range(nchain):
    op = lr = cr = 0
    eff = 1
    ls = 0
    cur = out_base + ch * spc * SEG
    acc = np.zeros(ROW, np.uint8)
    count = counts[ch]
    it = 0
    while op < count or lr > 0 or cr > 0:
        it += 1
        can = (lr == 0 and cr == 0 and op < count)
        if can:
            a, b, c = ops[ch, op]
            lr = int(a) & 0x3FFF
            cr = (int(a) >> 14) & 0x3FFF
            eff = max(int(b), 1)
            ls = int(c)
            op += 1
        # literal sub-slot
        q = cur & (ROW - 1)
        ta = min(lr, ROW - q)
        win = window(ls - q)
        acc[q : q + ta] = win[q : q + ta]
        arena[(cur >> 9) * ROW : (cur >> 9) * ROW + ROW] = acc
        cur += ta
        ls += ta
        lr -= ta
        # copy sub-slot
        q2 = cur & (ROW - 1)
        tb = min(cr, eff, ROW - q2) if lr == 0 else 0
        win2 = window(cur - eff - q2)
        acc[q2 : q2 + tb] = win2[q2 : q2 + tb]
        arena[(cur >> 9) * ROW : (cur >> 9) * ROW + ROW] = acc
        cur += tb
        cr -= tb
        if tb == eff and cr > 0:
            eff *= 2
        # check output so far
        done = cur - out_base
        if done <= len(data) and not first_bad_reported[0]:
            g = arena[out_base : out_base + done]
            bad = np.nonzero(g != d[:done])[0]
            if len(bad):
                i = int(bad[0])
                print(f"DIVERGED at iter {it}, op {op-1}, out pos {i}")
                a0, b0, c0 = ops[ch, op - 1]
                print(f"  op: llen={int(a0)&0x3FFF} clen={(int(a0)>>14)&0x3FFF} "
                      f"csrc={b0} lsrc={c0}")
                print(f"  state: cur={cur} q={q} ta={ta} q2={q2} tb={tb} "
                      f"eff={eff} lr={lr} cr={cr}")
                print("  want:", d[max(0, i - 8) : i + 16].tobytes())
                print("  got :", g[max(0, i - 8) : i + 16].tobytes())
                first_bad_reported[0] = True
                sys.exit(1)

print("kernel-sim OK — bug must be pallas-specific")
