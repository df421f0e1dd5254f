"""Micro-test execute_chained: one literal op per run, arena filled with a
known byte ramp, sweep (lsrc alignment x llen) and check output bytes."""
import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from minlz_tpu.ops import exec_chain as ec

ROW = ec.ROW_B
OP_T = ec.OP_T

# Arena: 1 guard row + 4 comp rows + 4 out rows + 2 slack
comp_rows, out_rows = 4, 4
n_arena = 1 + comp_rows + out_rows + 2
comp = (np.arange(comp_rows * ROW, dtype=np.uint32) % 251).astype(np.uint8)


def run_ops(op_list):
    """op_list: [(llen, clen, csrc, lsrc_global_byte)]  (single chain)."""
    nchain = 1
    cap_pc = OP_T
    ops = np.zeros((1, cap_pc, 3), np.int32)
    for k, (llen, clen, csrc, ls) in enumerate(op_list):
        ops[0, k, 0] = llen | (clen << 14)
        ops[0, k, 1] = csrc
        ops[0, k, 2] = ls
    counts = np.array([len(op_list)], np.int32)
    ops_flat = ops.reshape(1, cap_pc * 3)
    arena = np.zeros((n_arena, 128), np.int32)
    cw = comp.reshape(-1, 128, 4).astype(np.int32)
    arena[1 : 1 + comp_rows] = (
        cw[:, :, 0] | (cw[:, :, 1] << 8) | (cw[:, :, 2] << 16)
        | (cw[:, :, 3] << 24)
    )
    out = ec.execute_chained(
        jnp.asarray(ops_flat), jnp.asarray(counts), jnp.asarray(arena),
        nchain=1, cap_pc=cap_pc, out_base_row=1 + comp_rows,
        chain_rows=out_rows, n_arena_rows=n_arena,
    )
    ob = np.asarray(out[1 + comp_rows :]).view(np.uint32).view(np.uint8)
    return ob.reshape(-1)


fails = 0
# Sweep literal-only ops: lsrc alignment 0..7, llen in {1,3,26,511,513}
for align in range(8):
    for llen in (1, 3, 26, 511, 513):
        ls = ROW + align  # global byte: start of comp + align
        got = run_ops([(llen, 0, 0, ls)])
        want = comp[align : align + llen]
        if not (got[:llen] == want).all():
            bad = np.nonzero(got[:llen] != want)[0]
            print(f"LIT FAIL align={align} llen={llen}: first bad "
                  f"{bad[0]}, got={got[bad[0]]} want={want[bad[0]]} "
                  f"({len(bad)} bad)")
            fails += 1

# Literal at a non-zero output offset (prior op advances cur): lead literal
# of L bytes then the probe literal.
for lead in (225, 224, 100, 509):
    for align in range(4):
        llen = 26
        ls = ROW + 600 + align
        got = run_ops([(lead, 0, 0, ROW), (llen, 0, 0, ls)])
        want = comp[600 + align : 600 + align + llen]
        g = got[lead : lead + llen]
        if not (g == want).all():
            bad = np.nonzero(g != want)[0]
            print(f"LIT2 FAIL lead={lead} align={align}: first bad "
                  f"+{bad[0]}, got={g[bad[0]]:#x} want={want[bad[0]]:#x} "
                  f"({len(bad)} bad)")
            fails += 1

# Copy ops: lead literal then copy at distance d, len cl
for lead in (64, 225):
    for d in (1, 2, 3, 7, 39, 64):
        for cl in (3, 22, 100):
            got = run_ops([(lead, 0, 0, ROW), (0, cl, d, 0)])
            want = np.zeros(lead + cl, np.uint8)
            want[:lead] = comp[:lead]
            for j in range(cl):
                want[lead + j] = want[lead + j - d]
            g = got[: lead + cl]
            if not (g == want).all():
                bad = np.nonzero(g != want)[0]
                print(f"COPY FAIL lead={lead} d={d} cl={cl}: first bad "
                      f"{bad[0]}, got={g[bad[0]]:#x} want={want[bad[0]]:#x}")
                fails += 1

print("fails:", fails)
