"""Chained decode executor: C interleaved op streams over one block.

v2 of the decode execute phase (replaces the single scalar op walk in
``pallas_decode._make_exec_kernel`` for range-clamped streams).  Design is
set by measured TPU primitives (scripts/kernel_probe.py): arbitrary per-lane
gathers are serial, but dynamic whole-row loads/stores and lane-uniform
rotates are fast, and a few independent scalar chains overlap
latency (the gather pipeline saturates at ~2 streams; see MAXC).  So the
executor walks C = MAXC independent op streams — contiguous segment ranges of the SAME block — in
one branch-free loop, each chain append-only at its own cursor.

Correctness of chain parallelism: the encoder clamps every match source to
the ``RANGE`` (128 KiB) range of its destination (``find_matches_dyn`` mask
+ the native parse's backward-extension clamp), recorded in parse-hints v2.
Chains own disjoint byte ranges and never read another chain's in-flight
output, so the scheduler may deal ranges to chains in any order — decode
batches several blocks per dispatch and serpentine-balances all their
ranges across 16 chains.

Memory layout: one VMEM *arena* of 512-byte rows (128 lanes x int32, 4
packed bytes per lane) holding [per-lane compressed streams || decoded
output], input/output-aliased.  Literal sources and copy sources then share
one window primitive: two dynamic row loads + two dynamic lane-rotates +
byte shift.  Stores read-modify-write the arena row under a byte mask;
write-through keeps every row current, so rows double as accumulators and
each sub-slot's vector work can be skipped entirely (``pl.when``) when the
slot is vacuous.

Overlapping (RLE) copies use effective-offset doubling: each emit reads
[cur-eff, cur-eff+t) with eff a multiple of the true offset, growing
eff geometrically as output accumulates — log rounds, no byte loops.

Hostile input safety: all dynamic row indices are clamped into the arena
(stores additionally into the chain's own span), so corrupt streams can
only produce wrong bytes — caught by the stream CRC — never out-of-bounds
access.

Reference behavior match: minLZDecodeGo (/root/reference/decode.go:178);
speed class target README.md:405.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_B = 512          # bytes per arena row (128 lanes x 4 packed bytes)
PROW_B = 128         # bytes per arena row in PLANAR mode (1 byte per lane)
# Chains (static unroll); env override for A/B probes.  r5 sweep on the
# bench batch (ms/MB): 1 -> 25.9, 2 -> 23.9, 4 -> 24.4, 8 -> 24.5,
# 16 -> 25.3, 24 -> 25.4, 32 crashes the Mosaic compiler.  The gather
# pipeline saturates at ~2 concurrent streams — the executor is
# gather-THROUGHPUT-bound, so extra chains only add per-pass skeleton
# cost.  4 is the default: within noise of 2 on mixed data and the best
# point on drain-heavy (RLE) batches, with robustness to imbalance.
MAXC = int(os.environ.get("MINLZ_MAXC", "4"))
# Ops per chain per grid step (SMEM tile); env override for A/B probes.
OP_T = int(os.environ.get("MINLZ_OP_T", "256"))
# Encoder match-source clamp granularity (hints v2).  128 KiB costs ~0.2
# ratio points less than 64 KiB (more reachable matches); a 1 MiB block
# yields 8 independent ranges, and the batched decode path (4 blocks per
# dispatch) still fills all 16 executor chains with 32 ranges.  Offsets
# within a range are <= RANGE-1 = 131071, exactly the compaction word's
# 17-bit csrc field.
RANGE = 128 * 1024
# Auto-select the planar (byte-per-lane) arena up to this much decoded
# output per dispatch: its ~14 MB VMEM (arena + comp input) fits a 1 MiB
# block on 16 MB-VMEM parts and buys ~no-realign windows.
PLANAR_MAX_OUT = 1 << 20
# Executor v2 (precomputed records) on by default; MINLZ_EXEC_V1=1 falls
# back to the r4 state-machine executor for A/B comparison.
_V2_DEFAULT = os.environ.get("MINLZ_EXEC_V1", "") != "1"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def tile_words(nchain: int) -> int:
    """Per-grid-step op words, padded to Mosaic's 1024-word 1D tiling."""
    return -(-(nchain * OP_T * 3) // 1024) * 1024


# --------------------------------------------------------------------------
# Compaction: op arrays [P, sub, 128] -> per-chain padded op lists
# --------------------------------------------------------------------------

def _stitch_kernel(meta_ref, a_ref, b_ref, outa_ref, outb_ref):
    """Copy window i's first `count` elements to out[offset:offset+count].

    Identical mechanism to pallas_decode._stitch_kernel, but the per-window
    meta offsets target per-chain padded regions instead of one dense list.
    """
    i = pl.program_id(0)
    o = meta_ref[i, 0]
    c = meta_ref[i, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def write_rows(src_ref, out_ref):
        def body(q, _):
            first = q * 128 - o
            row = jnp.maximum(first, 0) // 128
            m = first - row * 128
            a = jnp.broadcast_to(src_ref[0, pl.ds(row, 1), :], (8, 128))
            b = jnp.broadcast_to(src_ref[0, pl.ds(row + 1, 1), :], (8, 128))
            v = jnp.take_along_axis(
                jnp.where(iota >= m, a, b), (iota + m) & 127, axis=1
            )
            gpos = iota + q * 128
            mask = (gpos >= o) & (gpos < o + c)
            cur = jnp.broadcast_to(out_ref[pl.ds(q, 1), :], (8, 128))
            out_ref[pl.ds(q, 1), :] = jnp.where(mask, v, cur)[0:1]
            return 0

        jax.lax.fori_loop(o // 128, (o + c + 127) // 128, body, 0)

    @pl.when(c > 0)
    def _():
        write_rows(a_ref, outa_ref)
        write_rows(b_ref, outb_ref)


@functools.partial(
    jax.jit, static_argnames=("nchain", "cap_chain", "pc", "guard")
)
def compact_ops_dense(kind, dst, clen, csrc, lsrc, llen, lane_off, lane_cnt,
                      nchain: int, cap_chain: int, pc: int,
                      guard: int = ROW_B):
    """Pack per-row op records into DENSE per-chain op lists.

    kind..llen: [P, sub, 128] int32 transducer emissions (see
    transducer.py).  lane_off/lane_cnt: [L] int32 — each lane's dense
    destination slot range within [nchain * cap_chain) (the scheduler lays
    chains out back-to-back with no intra-chain padding, so executor
    iterations track the max chain TOTAL, not per-slot maxima).  Lane ids
    must be monotone along each chain's dense stream (the scheduler orders
    each chain's ranges ascending) — that is what lets the per-op owning
    lane be reconstructed with a tiny scatter + cummax.  pc: compressed
    bytes per lane in the arena (for global lsrc).

    Executor words: A = llen | clen << 14; B = csrc (copy offset, up to
    RANGE = 17 bits); C = lane*pc + lsrc (global arena byte position of
    the first literal).  To cut sort and stitch bandwidth, the three words
    travel packed in TWO (llen/clen are 14-bit so seg = 8192 whole-literal
    or whole-copy records survive, lsrc is 14-bit, csrc 17) and unpack
    after the stitch.  Returns ops [nchain, cap_chain, 3] int32.
    """
    del dst  # cursors are append-only; dst is implied
    P = kind.shape[0]
    L = lane_off.shape[0]

    # Pack in parse layout (cheap vector work), transpose only 3 arrays.
    # w1 is already the executor A word (llen | clen << 14, 28 bits); w2
    # packs csrc (17 bits) with a 14-bit lsrc — lsrc < pc and pc tops out
    # at seg + one row of margin, so 14 bits cover seg = 8192 streams.
    # csrc is clamped to >= 1 HERE (free vector op) so the scalar-bound
    # executor loop can use it as the eff-doubling seed without a
    # per-iteration max (csrc == 0 only on literal-only records, whose
    # copy slot never fires; hostile clen>0/csrc==0 would otherwise
    # deadlock the doubling).
    w1 = llen | (clen << 14)
    w2 = jnp.maximum(csrc, 1) | (lsrc << 17)

    def lane_major(x):
        return x.reshape(P, -1).T[:L]  # [L, P]

    k = lane_major(kind)
    w1 = lane_major(w1)
    w2 = lane_major(w2)

    real = k > 0
    big = jnp.int32(0x7FFFFFFF)
    key = jnp.where(real, jnp.arange(P, dtype=jnp.int32)[None, :], big)
    # One sort window per lane: rows stay op-ordered, counts fall out.
    key_s, w1_s, w2_s = jax.lax.sort(
        (key, w1, w2), dimension=1, num_keys=1
    )
    del key_s
    meta = jnp.stack([lane_off, lane_cnt], axis=1)

    Wr = P // 128
    pad = jnp.zeros((L, 1, 128), jnp.int32)
    a_p = jnp.concatenate([w1_s.reshape(L, Wr, 128), pad], axis=1)
    b_p = jnp.concatenate([w2_s.reshape(L, Wr, 128), pad], axis=1)

    rows = nchain * cap_chain // 128
    win_spec = pl.BlockSpec((1, Wr + 1, 128), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _stitch_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            win_spec, win_spec,
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * 2,
        interpret=_interpret(),
    )(meta, a_p, b_p)
    p1 = out[0].reshape(nchain, cap_chain)
    p2 = out[1].reshape(nchain, cap_chain)
    # Reconstruct each dense op slot's owning lane: scatter every lane's
    # first-op position, then forward-fill.  Empty lanes collide on the
    # same slot; max keeps the later lane, which is correct since the
    # earlier lane owns no slots (lane ids are monotone per chain's
    # stream by the scheduler's ascending-range order).
    flat_pos = jnp.minimum(lane_off, nchain * cap_chain - 1)
    lane_map = (
        jnp.zeros((nchain * cap_chain,), jnp.int32)
        .at[flat_pos].max(jnp.arange(L, dtype=jnp.int32))
        .reshape(nchain, cap_chain)
    )
    lane_u = jax.lax.cummax(lane_map, axis=1)
    # Unpack to executor words.  +guard on C: the arena carries one guard
    # row before the compressed lanes so window() never sees a negative
    # byte address (literal reads are window(ls - q), q up to a row).
    a = p1
    b = p2 & 0x1FFFF
    c = ((p2 >> 17) & 0x3FFF) + lane_u * pc + guard
    return jnp.stack([a, b, c], axis=2)


# --------------------------------------------------------------------------
# Precomputed-record compaction (executor v2)
# --------------------------------------------------------------------------
#
# The r4 executor is scalar-unit-bound: ~30 always-on scalar ops per chain
# per pass maintain the (lr, cr, eff, ls, cur) state machine even though
# 98% of records complete in ONE pass (measured on the bench corpus:
# literal and copy each fit one 512B arena row, no RLE doubling).  All
# addressing is static — cursors are append-only and the transducer emits
# dst — so v2 precomputes every fast record's window/store arguments at
# compact time (vector-cheap) into three packed words:
#
#   W0 = lit window  row(15) | m(7)<<15 | bs(2)<<22 | llen(8)<<24
#        (or, when the inline bit of W2 is set, the literal run's <= 4
#        bytes verbatim — collected by the transducer — so short runs
#        need no window gather at all)
#   W1 = copy window row(15) | m(7)<<15 | bs(2)<<22 | clen(8)<<24
#   W2 = dst row(15) | q(9)<<15 | copy-row-bump(1)<<24 | inline(1)<<25
#        | inline-llen(3)<<26                                 (bit31 = 0)
#
# Rare records (multi-row output, RLE doubling, or llen/clen > 255) ship
# the legacy fields instead (bit31 of W2 set) and run on a drain state
# machine whose scalars live in SMEM and execute only under pl.when:
#
#   W0 = lit_src_global(25) | llen[0:7)<<25
#   W1 = csrc(17) | clen(14)<<17 | llen[7]<<31
#   W2 = flag(1)<<31 | cur(25) | llen[8:14)<<25
#
# Hostile-input safety moves to compact time: llen/clen clamp to 14 bits
# and to the record's range span, csrc clamps to [1, 2^17), and window rows
# clamp into the arena — corrupt streams yield wrong bytes (stream CRC
# catches), never out-of-bounds access.

_F15 = 0x7FFF
_F9 = 0x1FF


def _win_fields(src, n_arena_rows):
    """Pack a window byte address into row(15)|m(7)|bs(2) (vectorized)."""
    src = jnp.maximum(src, 0)
    ws = src >> 2
    row = jnp.clip(ws >> 7, 0, n_arena_rows - 2)
    m = jnp.clip(ws - row * 128, 0, 127)
    bs = src & 3
    return row | (m << 15) | (bs << 22)


@functools.partial(
    jax.jit, static_argnames=("nchain", "cap_chain", "pc", "n_arena_rows")
)
def compact_ops_fast(kind, dst, clen, csrc, lsrc, llen, lacc, lane_off,
                     lane_cnt, out_base, last_row, nchain: int,
                     cap_chain: int, pc: int, n_arena_rows: int):
    """Pack per-row op records into DENSE per-chain PRECOMPUTED op lists.

    kind..llen: [P, sub, 128] int32 transducer emissions.  lane_off/
    lane_cnt: [L] — dense destination slots (see compact_ops_dense).
    out_base/last_row: [L] int32 per-lane output cursor base (arena byte)
    and last writable arena row — baked into every record so the executor
    carries no cursor state at all.  Returns ops [nchain, cap_chain, 3].
    """
    P, sub = kind.shape[0], kind.shape[1]
    L = lane_off.shape[0]
    lanes = sub * 128

    lane_idx = jnp.arange(lanes, dtype=jnp.int32).reshape(1, sub, 128)
    ob = jnp.zeros((lanes,), jnp.int32).at[:L].set(out_base)
    lrow = jnp.zeros((lanes,), jnp.int32).at[:L].set(last_row)
    ob = ob.reshape(1, sub, 128)
    lrow = lrow.reshape(1, sub, 128)

    # Hostile clamps (valid encoder output is unaffected): 14-bit lengths,
    # spans confined to the record's range, csrc in [1, 2^17).
    llen_c = jnp.clip(llen, 0, (1 << 14) - 1)
    clen_c = jnp.clip(clen, 0, (1 << 14) - 1)
    rng_end = (lrow + 1) * ROW_B
    cur = jnp.minimum(ob + jnp.maximum(dst, 0), rng_end - 1)
    llen_c = jnp.minimum(llen_c, rng_end - cur)
    clen_c = jnp.minimum(clen_c, rng_end - cur - llen_c)
    csrc_c = jnp.clip(csrc, 1, (1 << 17) - 1)
    ls_glob = lane_idx * pc + jnp.clip(lsrc, 0, pc - 1) + ROW_B

    q = cur & (ROW_B - 1)
    cur2 = cur + llen_c
    q2 = cur2 & (ROW_B - 1)
    lit_ok = (llen_c <= 255) & (q + llen_c <= ROW_B)
    cpy_ok = (clen_c <= 255) & (q2 + clen_c <= ROW_B) & (csrc_c >= clen_c)
    fast = lit_ok & (cpy_ok | (clen_c == 0))

    row_a = cur >> 9
    row_c = cur2 >> 9
    # Short literal runs travel INLINE: the transducer collects each run's
    # first four bytes (lacc), so records with llen <= 4 replace the lit
    # window fields with the literal bytes themselves and the executor
    # materializes them from the op word — no compressed-window gather.
    inline = (llen_c >= 1) & (llen_c <= 4)
    w0f = jnp.where(
        inline, lacc,
        _win_fields(ls_glob - q, n_arena_rows) | (llen_c << 24),
    )
    w1f = _win_fields(cur2 - csrc_c - q2, n_arena_rows) | (clen_c << 24)
    w2f = (
        row_a | (q << 15) | ((row_c - row_a) << 24)
        | (inline.astype(jnp.int32) << 25)
        | (jnp.where(inline, llen_c, 0) << 26)
    )

    w0s = ls_glob | ((llen_c & 0x7F) << 25)
    w1s = csrc_c | (clen_c << 17) | (((llen_c >> 7) & 1) << 31)
    w2s = (
        jnp.int32(-(1 << 31)) | cur | (((llen_c >> 8) & 0x3F) << 25)
    )

    w0 = jnp.where(fast, w0f, w0s)
    w1 = jnp.where(fast, w1f, w1s)
    w2 = jnp.where(fast, w2f, w2s)

    def lane_major(x):
        return x.reshape(P, -1).T[:L]  # [L, P]

    k = lane_major(kind)
    w0 = lane_major(w0)
    w1 = lane_major(w1)
    w2 = lane_major(w2)

    real = k > 0
    big = jnp.int32(0x7FFFFFFF)
    key = jnp.where(real, jnp.arange(P, dtype=jnp.int32)[None, :], big)
    key_s, w0_s, w1_s, w2_s = jax.lax.sort(
        (key, w0, w1, w2), dimension=1, num_keys=1
    )
    del key_s
    meta = jnp.stack([lane_off, lane_cnt], axis=1)

    Wr = P // 128
    pad = jnp.zeros((L, 1, 128), jnp.int32)
    a_p = jnp.concatenate([w0_s.reshape(L, Wr, 128), pad], axis=1)
    b_p = jnp.concatenate([w1_s.reshape(L, Wr, 128), pad], axis=1)
    c_p = jnp.concatenate([w2_s.reshape(L, Wr, 128), pad], axis=1)

    rows = nchain * cap_chain // 128
    win_spec = pl.BlockSpec((1, Wr + 1, 128), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _stitch3_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            win_spec, win_spec, win_spec,
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * 3,
        interpret=_interpret(),
    )(meta, a_p, b_p, c_p)
    return jnp.stack(
        [o.reshape(nchain, cap_chain) for o in out], axis=2
    )


def _stitch3_kernel(meta_ref, a_ref, b_ref, c_ref, outa_ref, outb_ref,
                    outc_ref):
    """3-array variant of _stitch_kernel; zero-fills the outputs at step 0
    so unwritten slots are vacuous records (the v2 executor streams every
    slot up to the tile limit)."""
    i = pl.program_id(0)
    o = meta_ref[i, 0]
    c = meta_ref[i, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    @pl.when(i == 0)
    def _zero():
        for ref in (outa_ref, outb_ref, outc_ref):
            ref[...] = jnp.zeros_like(ref)

    def write_rows(src_ref, out_ref):
        def body(q, _):
            first = q * 128 - o
            row = jnp.maximum(first, 0) // 128
            m = first - row * 128
            a = jnp.broadcast_to(src_ref[0, pl.ds(row, 1), :], (8, 128))
            b = jnp.broadcast_to(src_ref[0, pl.ds(row + 1, 1), :], (8, 128))
            v = jnp.take_along_axis(
                jnp.where(iota >= m, a, b), (iota + m) & 127, axis=1
            )
            gpos = iota + q * 128
            mask = (gpos >= o) & (gpos < o + c)
            cur = jnp.broadcast_to(out_ref[pl.ds(q, 1), :], (8, 128))
            out_ref[pl.ds(q, 1), :] = jnp.where(mask, v, cur)[0:1]
            return 0

        jax.lax.fori_loop(o // 128, (o + c + 127) // 128, body, 0)

    @pl.when(c > 0)
    def _():
        write_rows(a_ref, outa_ref)
        write_rows(b_ref, outb_ref)
        write_rows(c_ref, outc_ref)


# --------------------------------------------------------------------------
# Scheduled chained executor kernel
# --------------------------------------------------------------------------

def _make_sched_kernel(nchain: int, K: int, cap_chain: int,
                       n_arena_rows: int, planar: bool = False):
    """Build the scheduled chained executor.

    Each chain walks K *slots* (ranges) laid out DENSELY in its op stream:
    slot k occupies [bnd_k, bnd_k + counts[ch*K+k]) where bnd_k is the
    running sum of earlier slot counts — no intra-chain padding, so the
    while-loop iteration count tracks the max chain TOTAL (schedule-
    balanced to ~the mean), not per-slot maxima.  The slot->range
    assignment is a serpentine deal of ranges sorted by op count — ranges
    are independent by the encoder's source-range clamp, so chains may
    process them in any order.

    counts_ref/bases_ref/lastrow_ref: SMEM [nchain*K] per-slot op count,
    output cursor base (arena byte) and last writable arena row.
    ops_ref: 1D SMEM tile of nchain * OP_T * 3 words (tile-major repack of
    the per-chain dense streams) — 1D because Mosaic's (8, 128)
    divisibility rule applies to >=2D SMEM blocks.
    comp_ref: VMEM [comp_rows_in, 128] int32 — [guard row || comp rows];
    arena_ref: VMEM [n_arena_rows, 128] int32 output-only — the kernel
    seeds [guard || comp] from comp_ref and zeros the out region at t==0,
    so VMEM holds ~1.5x the arena instead of 2x (the r3 layout aliased a
    full arena input, which OOMed 16 MB scoped VMEM at batch >= 4).
    st_ref: SMEM scratch (nchain*8,) persisted per-chain scalars.
    Sub-slot stores read-modify-write the arena row directly
    (write-through keeps rows current) and each sub-slot's vector work
    runs under ``pl.when`` — a vacuous slot costs only scalar bookkeeping.

    ``planar``: the arena holds ONE byte per int32 lane (128-byte rows)
    instead of four packed bytes (512-byte rows).  Costs 4x the VMEM but
    removes the byte-realign half of every window — no neighbour-word
    gather pair and no variable shifts — and turns the store masks into
    plain lane compares.  The op stream and all byte addresses are
    identical; only row geometry changes.
    """
    F = 8  # scalar state fields per chain (SMEM stride = live scalars)
    F_S = 8  # live loop-carried scalars per chain
    row_b = PROW_B if planar else ROW_B
    row_shift = 7 if planar else 9

    def kernel(counts_ref, bases_ref, lastrow_ref, ops_ref, comp_ref,
               arena_ref, st_ref):
        t = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        b4 = iota * 4  # first byte index of each packed word
        comp_rows_in = comp_ref.shape[0]

        @pl.when(t == 0)
        def _init():
            # The output VMEM block is uninitialized on real TPU: seed the
            # [guard || comp] prefix from the input and zero the out region.
            arena_ref[0:comp_rows_in] = comp_ref[...]
            arena_ref[comp_rows_in:n_arena_rows] = jnp.zeros(
                (n_arena_rows - comp_rows_in, 128), jnp.int32
            )
            for ch in range(nchain):
                st_ref[ch * F + 0] = 0  # slot
                st_ref[ch * F + 1] = 0  # gidx (dense op index in chain)
                st_ref[ch * F + 2] = counts_ref[ch * K]  # end of slot 0
                st_ref[ch * F + 3] = 0  # lit_rem
                st_ref[ch * F + 4] = 0  # cpy_rem
                st_ref[ch * F + 5] = 1  # eff
                st_ref[ch * F + 6] = 0  # lsrc_pos
                st_ref[ch * F + 7] = bases_ref[ch * K]  # out cursor

        def window_planar(byte_start):
            """(8,128) lanes = arena bytes [byte_start, +128) (planar)."""
            row = jnp.clip(byte_start >> 7, 0, n_arena_rows - 2)
            m = byte_start - row * 128
            r0 = jnp.broadcast_to(arena_ref[pl.ds(row, 1), :], (8, 128))
            r1 = jnp.broadcast_to(arena_ref[pl.ds(row + 1, 1), :], (8, 128))
            idx = iota + m
            return jnp.where(
                idx < 128,
                jnp.take_along_axis(r0, idx & 127, axis=1),
                jnp.take_along_axis(r1, idx & 127, axis=1),
            )

        def window(byte_start):
            """(8,128) packed words = arena bytes [byte_start, +512)."""
            ws = byte_start >> 2
            bs = byte_start & 3
            row = jnp.clip(ws >> 7, 0, n_arena_rows - 2)
            m = ws - row * 128
            r0 = jnp.broadcast_to(arena_ref[pl.ds(row, 1), :], (8, 128))
            r1 = jnp.broadcast_to(arena_ref[pl.ds(row + 1, 1), :], (8, 128))
            idx = iota + m
            w = jnp.where(
                idx < 128,
                jnp.take_along_axis(r0, idx & 127, axis=1),
                jnp.take_along_axis(r1, idx & 127, axis=1),
            )
            # Neighbour word wn[i] = word at idx+1 via a second gather
            # pair.  (Deriving wn from w with a static roll + one
            # boundary fix-up measured 1.5x SLOWER in-kernel — Mosaic's
            # static lane roll is not the cheap shuffle one would hope;
            # keep the 4-barrel form.)
            idx1 = idx + 1
            wn = jnp.where(
                idx1 < 128,
                jnp.take_along_axis(r0, idx1 & 127, axis=1),
                jnp.take_along_axis(r1, idx1 & 127, axis=1),
            )
            # Byte realign: little-endian packing, so byte k of the stream
            # window comes from (w >> 8*bs) | (w_next << 8*(4-bs)).  The
            # shift count must also be unsigned: uint32 >> int32 promotes
            # back to int32 and becomes an ARITHMETIC shift that smears
            # sign bits (0xff) over high bytes.
            sr_u = (bs * 8).astype(jnp.uint32)   # right-shift count (uint)
            sl = (32 - bs * 8) & 31              # left-shift count (int32)
            lo = (w.astype(jnp.uint32) >> sr_u).astype(jnp.int32)
            hi = wn << sl
            return jnp.where(bs == 0, lo, lo | hi)

        def bmask(lo_b, hi_b):
            """Per-word int32 mask selecting row bytes [lo_b, hi_b).

            Arithmetic form: per word at byte base b4, the covered byte
            count clamps to [0,4]; (1 << 8n) - 1 builds the little-endian
            byte mask, and the lo mask is cleared from the hi mask.  ~9
            vector ops vs ~24 for the compare-per-byte-lane version.
            """

            def lowmask(nbytes):
                # (1 << 8n) - 1 for n in [0,4] without shift-width UB:
                # n==4 must give all-ones.
                sh = (nbytes * 8).astype(jnp.uint32)
                full = nbytes >= 4
                m = ((jnp.uint32(1) << sh) - jnp.uint32(1)).astype(
                    jnp.int32
                )
                return jnp.where(full, jnp.int32(-1), m)

            n_hi = jnp.clip(hi_b - b4, 0, 4)
            n_lo = jnp.clip(lo_b - b4, 0, 4)
            return lowmask(n_hi) & ~lowmask(n_lo)

        lim = (t + 1) * OP_T

        def cond(state):
            act = None
            for ch in range(nchain):
                s, gidx = state[ch * F_S], state[ch * F_S + 1]
                end = state[ch * F_S + 2]
                lr, cr = state[ch * F_S + 3], state[ch * F_S + 4]
                if K == 1:
                    a = ((gidx < end) & (gidx < lim)) | (lr > 0) | (cr > 0)
                else:
                    a = ((s < K) & (gidx < lim)) | (lr > 0) | (cr > 0)
                act = a if act is None else (act | a)
            return act

        def one_pass(state):
            new = list(state)
            for ch in range(nchain):
                s = state[ch * F_S]
                gidx = state[ch * F_S + 1]
                end = state[ch * F_S + 2]
                lr = state[ch * F_S + 3]
                cr = state[ch * F_S + 4]
                eff = state[ch * F_S + 5]
                ls = state[ch * F_S + 6]
                cur = state[ch * F_S + 7]

                need = (lr == 0) & (cr == 0)
                if K == 1:
                    # Single-slot chains: no advance machinery, and the
                    # SMEM meta reads are static-indexed (cheap scalar
                    # path — the loop is scalar-unit-bound).
                    last_row = lastrow_ref[ch]
                else:
                    # Slot advance: dense layout means the next slot
                    # starts exactly at gidx; only the output cursor and
                    # end move (ranges are independent, so no other state
                    # carries over).
                    adv = need & (s < K) & (gidx >= end)
                    s = s + adv.astype(jnp.int32)
                    si = ch * K + jnp.minimum(s, K - 1)
                    cur = jnp.where(adv, bases_ref[si], cur)
                    end = jnp.where(adv, gidx + counts_ref[si], end)
                    # Stores clamp into the current slot's span: keeps
                    # idle iterations and hostile op streams from touching
                    # other ranges' rows or escaping the arena.
                    last_row = lastrow_ref[si]

                can = need & (s < K) & (gidx < end) & (gidx < lim)
                idx = jnp.clip(gidx - t * OP_T, 0, OP_T - 1)
                base = ch * (OP_T * 3) + idx * 3
                a = ops_ref[base]
                b = ops_ref[base + 1]
                cw = ops_ref[base + 2]
                lr = jnp.where(can, a & 0x3FFF, lr)
                cr = jnp.where(can, (a >> 14) & 0x3FFF, cr)
                eff = jnp.where(can, b, eff)  # compact clamps csrc >= 1
                ls = jnp.where(can, cw, ls)
                gidx = gidx + can.astype(jnp.int32)

                # literal sub-slot (vector work gated: pure-copy records
                # and idle chains pay only the scalar bookkeeping)
                q = cur & (row_b - 1)
                ta = jnp.minimum(lr, row_b - q)
                row_a = jnp.minimum(cur >> row_shift, last_row)

                @pl.when(ta > 0)
                def _lit(q=q, ta=ta, ls=ls, row_a=row_a):
                    # RMW on the arena row itself: write-through keeps the
                    # row current, so it doubles as the accumulator.
                    cur_row = jnp.broadcast_to(
                        arena_ref[pl.ds(row_a, 1), :], (8, 128)
                    )
                    if planar:
                        win = window_planar(ls - q)
                        sel = (iota >= q) & (iota < q + ta)
                        arena_ref[pl.ds(row_a, 1), :] = jnp.where(
                            sel, win, cur_row
                        )[0:1]
                    else:
                        win = window(ls - q)
                        m = bmask(q, q + ta)
                        arena_ref[pl.ds(row_a, 1), :] = (
                            (win & m) | (cur_row & ~m)
                        )[0:1]

                cur = cur + ta
                ls = ls + ta
                lr = lr - ta

                # copy sub-slot (eff-doubling handles RLE overlap); gated
                # on lr == 0 so a row-crossing literal run finishes before
                # its op's copy starts.
                q2 = cur & (row_b - 1)
                tb = jnp.minimum(jnp.minimum(cr, eff), row_b - q2)
                tb = jnp.where(lr == 0, tb, 0)
                rowb = jnp.minimum(cur >> row_shift, last_row)

                @pl.when(tb > 0)
                def _cpy(q2=q2, tb=tb, cur=cur, eff=eff, rowb=rowb):
                    cur_row = jnp.broadcast_to(
                        arena_ref[pl.ds(rowb, 1), :], (8, 128)
                    )
                    if planar:
                        win2 = window_planar(cur - eff - q2)
                        sel2 = (iota >= q2) & (iota < q2 + tb)
                        arena_ref[pl.ds(rowb, 1), :] = jnp.where(
                            sel2, win2, cur_row
                        )[0:1]
                    else:
                        win2 = window(cur - eff - q2)
                        m2 = bmask(q2, q2 + tb)
                        arena_ref[pl.ds(rowb, 1), :] = (
                            (win2 & m2) | (cur_row & ~m2)
                        )[0:1]

                cur = cur + tb
                cr = cr - tb
                eff = jnp.where((tb == eff) & (cr > 0), eff * 2, eff)

                new[ch * F_S] = s
                new[ch * F_S + 1] = gidx
                new[ch * F_S + 2] = end
                new[ch * F_S + 3] = lr
                new[ch * F_S + 4] = cr
                new[ch * F_S + 5] = eff
                new[ch * F_S + 6] = ls
                new[ch * F_S + 7] = cur
            return tuple(new)

        # Unroll: amortizes the cond evaluation and loop-carried state
        # shuffle; an exhausted chain's extra passes are no-ops (can/adv
        # all false), so semantics don't depend on the factor.  Measured
        # on TPU: 2x 36.5 / 4x 35.5 / 8x 35.1 ms/MB.  Interpret mode
        # (CPU tests) keeps 2x — the 8x body inflates trace/compile time
        # across the suite's many geometries for zero benefit there.
        unroll = 2 if _interpret() else 8

        def body(state):
            for _ in range(unroll):
                state = one_pass(state)
            return state

        state = []
        for ch in range(nchain):
            state += [st_ref[ch * F + j] for j in range(F_S)]
        state = jax.lax.while_loop(cond, body, tuple(state))
        for ch in range(nchain):
            for j in range(F_S):
                st_ref[ch * F + j] = state[ch * F_S + j]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nchain", "K", "cap_chain", "n_arena_rows", "planar"),
)
def execute_scheduled(ops_flat, counts, bases, lastrows, comp, nchain: int,
                      K: int, cap_chain: int, n_arena_rows: int,
                      planar: bool = False):
    """Run the scheduled chained executor.  ops_flat:
    [n_tiles * tile_words(nchain)] tile-major op words (flat 1D with each
    tile zero-padded to a 1024-word multiple: Mosaic tiles 1D memrefs by
    1024 and the grid-stepped block must divide evenly).  counts/bases/
    lastrows: [nchain*K] int32 per-slot meta (dense layout: slot k of a
    chain starts at the running sum of its earlier slot counts).  comp:
    [comp_rows_in, 128] int32 packed bytes — guard row at row 0,
    compressed lanes after it.  Returns the arena [n_arena_rows, 128]
    with the output region filled."""
    grid = (cap_chain // OP_T,)
    tile_w = tile_words(nchain)
    kernel = pl.pallas_call(
        _make_sched_kernel(nchain, K, cap_chain, n_arena_rows, planar),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_w,), lambda t: (t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((comp.shape[0], 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_arena_rows, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_arena_rows, 128), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((nchain * 8,), jnp.int32),
        ],
        interpret=_interpret(),
    )
    return kernel(counts, bases, lastrows, ops_flat, comp)


# --------------------------------------------------------------------------
# Executor v2: precomputed records, stateless fast path + rare SMEM drain
# --------------------------------------------------------------------------

def _make_fast_kernel(nchain: int, cap_chain: int, n_arena_rows: int):
    """Executor over precomputed records (see compact_ops_fast).

    Fast records carry their complete window/store arguments, so the only
    per-chain loop state is the op index; the vector work (two dynamic row
    loads + lane rotates + one masked accumulator merge per sub-slot) is
    gated by scalar length fields and overlaps the scalar stream.  Slow
    records (bit31 of W2) load a legacy (lr, cr, eff, ls, cur) state
    machine into SMEM and drain it under pl.when — only ~2% of passes on
    real data.

    Output rows go through a per-chain ACCUMULATOR row in VMEM scratch at
    a static address: cursors are append-only and ranges are row-aligned,
    so the chain's current output row is written many times (~76 records
    per 512B row) before moving on.  The accumulator turns the per-slot
    read-modify-write of a dynamic arena row (2 dynamic VMEM accesses)
    into static-address scratch traffic, flushing one dynamic store per
    row transition; window reads patch in the unflushed row with a select.
    """
    F = 8  # SMEM per chain: 0=drain 1=gidx 2=lr 3=cr 4=eff 5=ls 6=cur 7=accrow
    # Timing-only ablation hooks (scripts/probe_v2.py): results are WRONG
    # under any of these; they isolate which kernel component binds.
    #   nota = no take_along_axis barrels; nowin = no window loads at all;
    #   novec = no vector work in slots; nobr = no pl.when gating (slots
    #   run unconditionally); noop = fetch/advance loop only.
    abl = os.environ.get("MINLZ_ABL", "")

    def kernel(ends_ref, ops_ref, comp_ref, arena_ref, st_ref, acc_ref):
        t = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        b4 = iota * 4
        comp_rows_in = comp_ref.shape[0]

        @pl.when(t == 0)
        def _init():
            arena_ref[0:comp_rows_in] = comp_ref[...]
            arena_ref[comp_rows_in:n_arena_rows] = jnp.zeros(
                (n_arena_rows - comp_rows_in, 128), jnp.int32
            )
            acc_ref[...] = jnp.zeros((nchain, 128), jnp.int32)
            for ch in range(nchain):
                st_ref[ch * F + 0] = 0
                st_ref[ch * F + 1] = 0
                st_ref[ch * F + 7] = 0  # accrow 0 = guard row (all-zero)

        def _realign(r0, r1, m, bs):
            if abl == "nota":
                return r0 ^ r1 ^ jnp.broadcast_to(m + bs, (8, 128))
            # One gather per straddled row pair: because the gather index
            # is iota + m (mod 128), pre-selecting rsel[lane] = r0[lane]
            # for lane >= shift and r1[lane] below it makes a single
            # take_along_axis return the two-row window — the wrapped
            # indices (< m) are exactly the ones that must read r1.  This
            # halves the dominant barrel count (measured ~50% of the
            # executor) vs the 4-gather form.
            w = jnp.take_along_axis(
                jnp.where(iota >= m, r0, r1), (iota + m) & 127, axis=1
            )
            if abl == "noshift":  # timing-only: skip byte realign
                return w
            m1 = m + 1
            wn = jnp.take_along_axis(
                jnp.where(iota >= m1, r0, r1), (iota + m1) & 127, axis=1
            )
            sr_u = (bs * 8).astype(jnp.uint32)
            sl = (32 - bs * 8) & 31
            lo = (w.astype(jnp.uint32) >> sr_u).astype(jnp.int32)
            hi = wn << sl
            return jnp.where(bs == 0, lo, lo | hi)

        def _rows_patched(ch, o, row):
            """Arena rows [row, row+1] with the chain's unflushed
            accumulator row patched in."""
            if abl in ("nowin", "novec"):
                z = jnp.broadcast_to(row, (8, 128))
                return z, z
            ar = st_ref[o + 7]
            av = jnp.broadcast_to(acc_ref[pl.ds(ch, 1), :], (8, 128))
            r0 = jnp.broadcast_to(arena_ref[pl.ds(row, 1), :], (8, 128))
            r1 = jnp.broadcast_to(arena_ref[pl.ds(row + 1, 1), :], (8, 128))
            r0 = jnp.where(row == ar, av, r0)
            r1 = jnp.where(row + 1 == ar, av, r1)
            return r0, r1

        def window_f(ch, o, w):
            """Window from precomputed row(15)|m(7)<<15|bs(2)<<22 fields."""
            row = w & _F15
            m = (w >> 15) & 127
            bs = (w >> 22) & 3
            r0, r1 = _rows_patched(ch, o, row)
            return _realign(r0, r1, m, bs)

        def window_f_aligned(ch, o, w):
            """Word-aligned variant (bs == 0): one gather, no byte shift."""
            row = w & _F15
            m = (w >> 15) & 127
            r0, r1 = _rows_patched(ch, o, row)
            return jnp.take_along_axis(
                jnp.where(iota >= m, r0, r1), (iota + m) & 127, axis=1
            )

        def window(ch, o, byte_start):
            """Window from a byte address (drain path only)."""
            ws = byte_start >> 2
            bs = byte_start & 3
            row = jnp.clip(ws >> 7, 0, n_arena_rows - 2)
            m = ws - row * 128
            r0, r1 = _rows_patched(ch, o, row)
            return _realign(r0, r1, m, bs)

        def bmask(lo_b, hi_b):
            def lowmask(nbytes):
                sh = (nbytes * 8).astype(jnp.uint32)
                full = nbytes >= 4
                m = ((jnp.uint32(1) << sh) - jnp.uint32(1)).astype(
                    jnp.int32
                )
                return jnp.where(full, jnp.int32(-1), m)

            n_hi = jnp.clip(hi_b - b4, 0, 4)
            n_lo = jnp.clip(lo_b - b4, 0, 4)
            return lowmask(n_hi) & ~lowmask(n_lo)

        def store(ch, o, row, win, m, active=None):
            """Merge a masked window into the chain's accumulator row,
            flushing the previous row on transition (dst rows are fresh
            when entered: cursors are append-only and ranges row-aligned,
            so no arena read is ever needed for the new row).

            ``active``: scalar gate for VACUOUS slots (empty mask).  The
            merge itself is a no-op then, but the flush must not fire —
            a record ending exactly at its range end computes row one
            past its own range, and moving accrow there would make a
            later flush drop zeros into ANOTHER chain's rows."""
            if abl == "novec":
                st_ref[o + 7] = row
                return
            ar = st_ref[o + 7]
            changed = (row != ar) if active is None else (
                active & (row != ar)
            )

            @pl.when(changed)
            def _flush(ar=ar):
                arena_ref[pl.ds(ar, 1), :] = acc_ref[pl.ds(ch, 1), :]
                acc_ref[pl.ds(ch, 1), :] = jnp.zeros((1, 128), jnp.int32)
                st_ref[o + 7] = row

            cur = jnp.broadcast_to(acc_ref[pl.ds(ch, 1), :], (8, 128))
            acc_ref[pl.ds(ch, 1), :] = ((win & m) | (cur & ~m))[0:1]

        lim = (t + 1) * OP_T
        ends = [
            jnp.minimum(ends_ref[ch], lim) for ch in range(nchain)
        ]

        def one_pass(g):
            new = []
            for ch in range(nchain):
                gidx = g[ch]
                o = ch * F
                dr = st_ref[o]
                fire = (dr == 0) & (gidx < lim)
                idx = jnp.clip(gidx - t * OP_T, 0, OP_T - 1)
                base = ch * (OP_T * 3) + idx * 3
                a = ops_ref[base]
                b = ops_ref[base + 1]
                cw = ops_ref[base + 2]
                slow = cw < 0
                gidx = gidx + fire.astype(jnp.int32)
                fastf = fire & ~slow
                inl = (cw >> 25) & 1
                llen = jnp.where(
                    inl == 1, (cw >> 26) & 7, (a >> 24) & 255
                )
                clen = (b >> 24) & 255
                qv = (cw >> 15) & _F9

                # Separate pl.when regions per sub-slot measured FASTER
                # than one merged region per record (25.4 vs 29.5 ms/MB
                # full-decode on the bench batch) — Mosaic schedules the
                # small gated bodies better than one large one.

                def _ilit(a=a, cw=cw, qv=qv, llen=llen):
                    # Inline literal: materialize the run's <=4 bytes from
                    # the op word itself — two scalar-broadcast lane
                    # selects, no window gather.
                    sh = ((qv & 3) * 8).astype(jnp.uint32)
                    val = a << sh
                    spill = jnp.where(
                        sh == 0,
                        0,
                        (
                            a.astype(jnp.uint32)
                            >> (jnp.uint32(32) - sh)
                        ).astype(jnp.int32),
                    )
                    l0 = qv >> 2
                    win = jnp.where(
                        iota == l0,
                        jnp.broadcast_to(val, (8, 128)),
                        jnp.where(
                            iota == l0 + 1,
                            jnp.broadcast_to(spill, (8, 128)),
                            0,
                        ),
                    )
                    store(ch, o, cw & _F15, win, bmask(qv, qv + llen))

                def _lit(a=a, cw=cw, qv=qv, llen=llen):
                    store(ch, o, cw & _F15, window_f(ch, o, a),
                          bmask(qv, qv + llen))

                def _cpy(b=b, cw=cw, qv=qv, llen=llen, clen=clen):
                    row_c = (cw & _F15) + ((cw >> 24) & 1)
                    q2 = (qv + llen) & (ROW_B - 1)
                    store(ch, o, row_c, window_f(ch, o, b),
                          bmask(q2, q2 + clen))

                def _cpy_al(b=b, cw=cw, qv=qv, llen=llen, clen=clen):
                    # Word-aligned source (~25% of copies): saves the
                    # neighbor gather on the gather-throughput-bound unit.
                    row_c = (cw & _F15) + ((cw >> 24) & 1)
                    q2 = (qv + llen) & (ROW_B - 1)
                    store(ch, o, row_c, window_f_aligned(ch, o, b),
                          bmask(q2, q2 + clen))

                if abl == "noop":
                    new.append(gidx)
                    continue
                if abl == "nobr":
                    _lit()
                    _cpy()
                else:
                    # The same split on the window-LIT slot regressed
                    # (24.8 vs 23.2): post-inline, window lits are ~12%
                    # of records and the extra branch predicates cost
                    # more than the ~3% saved gathers.
                    cbs = (b >> 22) & 3
                    pl.when(fastf & (inl == 1))(_ilit)
                    pl.when(fastf & (inl == 0) & (llen > 0))(_lit)
                    pl.when(fastf & (clen > 0) & (cbs == 0))(_cpy_al)
                    pl.when(fastf & (clen > 0) & (cbs != 0))(_cpy)

                @pl.when(fire & slow)
                def _enter(a=a, b=b, cw=cw):
                    ll = (a >> 25) & 0x7F
                    ll = ll | (((b >> 31) & 1) << 7)
                    ll = ll | (((cw >> 25) & 0x3F) << 8)
                    st_ref[o + 2] = ll
                    st_ref[o + 3] = (b >> 17) & 0x3FFF
                    st_ref[o + 4] = b & 0x1FFFF
                    st_ref[o + 5] = a & 0x1FFFFFF
                    st_ref[o + 6] = cw & 0x1FFFFFF
                    st_ref[o + 0] = 1

                @pl.when(dr != 0)
                def _drain(o=o):
                    lr = st_ref[o + 2]
                    cr = st_ref[o + 3]
                    eff = st_ref[o + 4]
                    ls = st_ref[o + 5]
                    cur = st_ref[o + 6]
                    q = cur & (ROW_B - 1)
                    ta = jnp.minimum(lr, ROW_B - q)
                    row_a = jnp.clip(cur >> 9, 0, n_arena_rows - 3)

                    @pl.when(ta > 0)
                    def _l(q=q, ta=ta, ls=ls, row_a=row_a):
                        store(ch, o, row_a, window(ch, o, ls - q),
                              bmask(q, q + ta))

                    cur = cur + ta
                    ls = ls + ta
                    lr = lr - ta
                    q2 = cur & (ROW_B - 1)
                    tb = jnp.minimum(jnp.minimum(cr, eff), ROW_B - q2)
                    tb = jnp.where(lr == 0, tb, 0)
                    rowb = jnp.clip(cur >> 9, 0, n_arena_rows - 3)

                    @pl.when(tb > 0)
                    def _c(q2=q2, tb=tb, cur=cur, eff=eff, rowb=rowb):
                        store(
                            ch, o, rowb, window(ch, o, cur - eff - q2),
                            bmask(q2, q2 + tb),
                        )

                    cur = cur + tb
                    cr = cr - tb
                    eff = jnp.where((tb == eff) & (cr > 0), eff * 2, eff)
                    st_ref[o + 2] = lr
                    st_ref[o + 3] = cr
                    st_ref[o + 4] = eff
                    st_ref[o + 5] = ls
                    st_ref[o + 6] = cur
                    st_ref[o + 0] = (
                        (lr > 0) | (cr > 0)
                    ).astype(jnp.int32)

                new.append(gidx)
            return new

        def cond(state):
            act = None
            for ch in range(nchain):
                a = (state[2 * ch] < ends[ch]) | (state[2 * ch + 1] != 0)
                act = a if act is None else (act | a)
            return act

        # 8x on TPU (measured sweet spot; 16 regressed); interpret mode
        # defaults to 2x to keep suite trace times down, but MINLZ_UNROLL
        # overrides BOTH so a CPU test can pin the production 8x body.
        unroll = int(
            os.environ.get("MINLZ_UNROLL", "2" if _interpret() else "8")
        )

        def body(state):
            g = [state[2 * ch] for ch in range(nchain)]
            for _ in range(unroll):
                g = one_pass(g)
            out = []
            for ch in range(nchain):
                out += [g[ch], st_ref[ch * F]]
            return tuple(out)

        state = []
        for ch in range(nchain):
            state += [st_ref[ch * F + 1], st_ref[ch * F]]
        state = jax.lax.while_loop(cond, body, tuple(state))
        for ch in range(nchain):
            st_ref[ch * F + 1] = state[2 * ch]
            # Flush the accumulator so the arena is current at step end
            # (idempotent; the accumulator itself persists across steps).
            ar = st_ref[ch * F + 7]
            arena_ref[pl.ds(ar, 1), :] = acc_ref[pl.ds(ch, 1), :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nchain", "cap_chain", "n_arena_rows")
)
def execute_fast(ops_flat, ends, comp, nchain: int, cap_chain: int,
                 n_arena_rows: int):
    """Run the v2 executor.  ops_flat: tile-major precomputed op words (see
    execute_scheduled for the layout); ends: [nchain] int32 total ops per
    chain; comp: [comp_rows_in, 128] int32 guard row + compressed lanes."""
    grid = (cap_chain // OP_T,)
    tile_w = tile_words(nchain)
    kernel = pl.pallas_call(
        _make_fast_kernel(nchain, cap_chain, n_arena_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_w,), lambda t: (t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((comp.shape[0], 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_arena_rows, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_arena_rows, 128), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((nchain * 8,), jnp.int32),
            pltpu.VMEM((nchain, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )
    return kernel(ends, ops_flat, comp)


# --------------------------------------------------------------------------
# Fused batched decode: parse -> compact -> schedule -> execute in one jit
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "pc", "spr", "R", "K", "nchain", "cap_pr",
                     "out_rows", "planar", "seg", "v2"),
)
def _decode_batch_jit(comp_lanes, lens, bases_r, lastrow_r, n_rows: int,
                      pc: int, spr: int, R: int, K: int, nchain: int,
                      cap_pr: int, out_rows: int, planar: bool = False,
                      seg: int = 4096, v2: bool = True):
    """Fused multi-block decode.  comp_lanes: [lanes, pc] uint8 per-segment
    token streams (zero padded, all blocks' segments stacked); lens:
    [sub, 128] int32; bases_r/lastrow_r: [R] int32 per-range output cursor
    base (arena byte) / last writable arena row.  Returns (arena, counts):
    the filled arena [1 + comp_rows + out_rows + 2, 128] int32 and the
    per-range op counts (for host-side cap-overflow detection)."""
    from .pallas_decode import parse_segments_pallas

    lanes = comp_lanes.shape[0]
    sub = lanes // 128
    L = R * spr

    # Parse wants row-major packed words [n_rows//4, sub, 128].
    ct = comp_lanes[:, :n_rows].T.astype(jnp.int32)  # [n_rows, lanes]
    ct = ct.reshape(n_rows // 4, 4, sub, 128)
    words = (ct[:, 0] | (ct[:, 1] << 8) | (ct[:, 2] << 16)
             | (ct[:, 3] << 24))
    emits = parse_segments_pallas(words, lens, n_rows)
    kind = emits[0]

    # Schedule BEFORE compaction: per-lane/per-range op counts are cheap
    # column sums, and knowing the (serpentine) range->chain deal up front
    # lets the stitch write every chain's ops DENSELY — the executor's
    # iteration count then tracks the max chain total (~the mean), not
    # per-slot maxima.  All scheduling arrays are tiny (<= a few hundred).
    lane_counts = jnp.sum(kind > 0, axis=0, dtype=jnp.int32).reshape(-1)[:L]
    counts = lane_counts.reshape(R, spr).sum(axis=1)  # per-range ops
    counts_c = jnp.minimum(counts, cap_pr)  # cap (overflow detected host-side)

    CK = nchain * K
    order = jnp.argsort(-counts)  # ranges by op count, descending
    rr = jnp.arange(CK, dtype=jnp.int32)
    sl = rr // nchain
    po = rr % nchain
    chain_of_rank = jnp.where(sl % 2 == 0, po, nchain - 1 - po)
    rng_of_rank = jnp.where(
        rr < R, order[jnp.minimum(rr, R - 1)], R
    )  # R = empty-slot sentinel
    assigned = (
        jnp.full((nchain, K), R, jnp.int32)
        .at[chain_of_rank, sl].set(rng_of_rank)
    )
    # Each chain processes its ranges in ascending range order: lane ids
    # stay monotone along the dense stream (compact_ops_dense relies on
    # this for its scatter+cummax lane reconstruction).
    assigned = jnp.sort(assigned, axis=1)  # sentinels sort last
    a_cl = jnp.minimum(assigned, R - 1)
    valid = assigned < R
    counts_cs = jnp.where(valid, counts_c[a_cl], 0)  # [nchain, K]
    bases_cs = jnp.where(valid, bases_r[a_cl], bases_r[0])
    lastrow_cs = jnp.where(valid, lastrow_r[a_cl], 0)

    # Dense destination offsets: chain base + prior slots' counts; scatter
    # per-range starts back to range index, then expand to lanes.
    slot_start = jnp.cumsum(counts_cs, axis=1) - counts_cs  # [nchain, K]
    cap_chain = K * cap_pr
    chain_base = jnp.arange(nchain, dtype=jnp.int32)[:, None] * cap_chain
    range_start = (
        jnp.zeros((R + 1,), jnp.int32)
        .at[assigned.reshape(-1)]
        .set((chain_base + slot_start).reshape(-1))[:R]
    )
    within = jnp.cumsum(lane_counts.reshape(R, spr), axis=1) - \
        lane_counts.reshape(R, spr)
    within_c = jnp.minimum(within, counts_c[:, None])
    lane_cnt = jnp.minimum(
        lane_counts.reshape(R, spr), counts_c[:, None] - within_c
    ).reshape(-1)
    lane_off = (range_start[:, None] + within_c).reshape(-1)

    # Comp prefix: guard row (negative-window clamp target) + per-lane comp
    # bytes — packed 4-per-word, or 1-per-lane in planar mode; the kernel
    # zero-fills the output region.
    if planar:
        comp_body = comp_lanes.astype(jnp.int32).reshape(-1, 128)
        comp_rows = lanes * pc // PROW_B
    else:
        flat = comp_lanes.reshape(-1, 128, 4).astype(jnp.int32)
        comp_body = (flat[:, :, 0] | (flat[:, :, 1] << 8)
                     | (flat[:, :, 2] << 16) | (flat[:, :, 3] << 24))
        comp_rows = lanes * pc // ROW_B
    comp = jnp.concatenate(
        [jnp.zeros((1, 128), jnp.int32), comp_body], axis=0
    )
    n_arena_rows = 1 + comp_rows + out_rows + 2

    use_v2 = v2 and not planar
    if use_v2:
        out_base = (
            jnp.repeat(bases_r, spr)
            + (jnp.arange(L, dtype=jnp.int32) % spr) * seg
        )
        last_row = jnp.repeat(lastrow_r, spr)
        ops = compact_ops_fast(
            *emits, lane_off, lane_cnt, out_base, last_row,
            nchain=nchain, cap_chain=cap_chain, pc=pc,
            n_arena_rows=n_arena_rows,
        )
    else:
        ops = compact_ops_dense(
            *emits[:6], lane_off, lane_cnt, nchain=nchain,
            cap_chain=cap_chain, pc=pc, guard=PROW_B if planar else ROW_B,
        )

    n_tiles = cap_chain // OP_T
    tiles = (
        ops.reshape(nchain, n_tiles, OP_T, 3)
        .transpose(1, 0, 2, 3)
        .reshape(n_tiles, nchain * OP_T * 3)
    )
    tw = tile_words(nchain)
    ops_flat = jnp.pad(
        tiles, ((0, 0), (0, tw - nchain * OP_T * 3))
    ).reshape(n_tiles * tw)

    if use_v2:
        out = execute_fast(
            ops_flat, counts_cs.sum(axis=1).astype(jnp.int32), comp,
            nchain=nchain, cap_chain=cap_chain, n_arena_rows=n_arena_rows,
        )
    else:
        out = execute_scheduled(
            ops_flat, counts_cs.reshape(-1), bases_cs.reshape(-1),
            lastrow_cs.reshape(-1), comp, nchain=nchain, K=K,
            cap_chain=cap_chain, n_arena_rows=n_arena_rows, planar=planar,
        )
    return out, counts


def chain_geometry(nseg: int, seg: int, rng: int = RANGE):
    """(spc, nchain): segments per chain and chain count for a block."""
    if rng % seg:
        raise ValueError("range must be a multiple of the segment size")
    segs_per_rng = rng // seg
    nrng = -(-nseg // segs_per_rng)
    rng_per_chain = -(-nrng // MAXC)
    spc = rng_per_chain * segs_per_rng
    nchain = -(-nseg // spc)
    return spc, nchain


def _hard_cap(spr: int, seg: int) -> int:
    """Worst-case ops per range for VALID encoder output: every record
    emits >= 2 output bytes (the repeat probe's 2-byte gate is the
    encoder's shortest match), so ops per segment <= seg/2 + 2."""
    return -(-(spr * (seg // 2 + 2)) // OP_T) * OP_T


# Op-slot budget for the compaction stitch output (two [R*cap_pr/128, 128]
# VMEM arrays): 1M slots = 8.4 MB, comfortably inside 16 MB VMEM alongside
# the window blocks.
_STITCH_BUDGET = 1 << 20


def _range_cap(R: int, spr: int, seg: int) -> int:
    """Static per-range op capacity: the worst case when the stitch budget
    affords it, else scaled down (overflowing ranges are detected from the
    returned counts and their blocks redone solo at the worst-case cap)."""
    cap = min(_hard_cap(spr, seg), max(OP_T, _STITCH_BUDGET // max(R, 1)))
    return -(-cap // OP_T) * OP_T


def plan_batch(blocks_segs, seg: int, rng: int = RANGE,
               cap_pr: int | None = None, planar: bool = False):
    """Host-side planning for a batched decode: pack all blocks' segment
    streams into lockstep lanes and lay out per-range output geometry.

    Returns (arrays, statics): arrays = (comp_lanes [lanes, pc] uint8,
    lens [sub, 128] int32, bases [R] int32, lastrow [R] int32) ready to
    ship to the device; statics = kwargs for ``_decode_batch_jit`` plus
    ``out0`` (first output arena row) and ``nrng_b`` (ranges per block).
    """
    if rng % seg:
        raise ValueError("range must be a multiple of the segment size")
    if seg > 8192:
        raise ValueError(f"segment size {seg} exceeds op packing (14 bits)")
    spr = rng // seg
    nchain = MAXC
    nrng_b = [-(-len(s) // spr) for s in blocks_segs]
    R = sum(nrng_b)
    K = -(-R // nchain)
    lanes = 128 * -(-(R * spr) // 128)

    pc_data = max(len(sb) for segs in blocks_segs for sb in segs)
    n_rows = -(-(pc_data + 1) // 512) * 512
    pc = n_rows + ROW_B  # window-load margin; keeps pc % 512 == 0
    if pc > (1 << 14):
        # lsrc travels in 14 bits (compact_ops_chained); valid encoder
        # output never exceeds seg + tag margin, so this is corrupt input.
        raise ValueError(
            f"segment stream of {pc_data} bytes exceeds lsrc packing"
        )

    lens = np.zeros((lanes // 128, 128), np.int32)
    comp_lanes = np.zeros((lanes, pc), np.uint8)
    lane_base = 0
    for segs in blocks_segs:
        for i, sb in enumerate(segs):
            a = np.frombuffer(bytes(sb), np.uint8)
            comp_lanes[lane_base + i, : len(a)] = a
            lens[(lane_base + i) // 128, (lane_base + i) % 128] = len(a)
        lane_base += -(-len(segs) // spr) * spr

    if cap_pr is None:
        cap_pr = _range_cap(R, spr, seg)

    # Per-range output geometry: block outputs are concatenated in block
    # order after the comp region; each range owns [j*rng, min((j+1)*rng,
    # block_bytes)) of its block.
    row_b = PROW_B if planar else ROW_B
    comp_rows = lanes * pc // row_b
    out0 = 1 + comp_rows
    bases = np.zeros(R, np.int32)
    lastrow = np.zeros(R, np.int32)
    ri = 0
    row_base = out0
    for b, segs in enumerate(blocks_segs):
        blk_bytes = len(segs) * seg
        for j in range(nrng_b[b]):
            bases[ri] = row_base * row_b + j * rng
            hi = min((j + 1) * rng, blk_bytes)
            lastrow[ri] = row_base + hi // row_b - 1
            ri += 1
        row_base += blk_bytes // row_b
    out_rows = row_base - out0

    arrays = (comp_lanes, lens, bases, lastrow)
    statics = dict(n_rows=n_rows, pc=pc, spr=spr, R=R, K=K, nchain=nchain,
                   cap_pr=cap_pr, out_rows=out_rows, planar=planar,
                   seg=seg, v2=_V2_DEFAULT)
    return arrays, statics, out0, nrng_b


def decode_blocks_chained(blocks_segs, out_totals, seg: int,
                          rng: int = RANGE, cap_pr: int | None = None,
                          planar: bool | None = None):
    """Decode a BATCH of blocks whose parse hints guarantee match sources
    stay within `rng`-byte ranges of their destination (hints v2).  All
    blocks' ranges go into one scheduling pool, so chains stay full and
    balanced regardless of block sizes.  Returns a list of bytes objects,
    one per block.

    ``planar`` (None = auto): byte-per-lane arena — cheaper per op (no
    byte realign) but 4x the VMEM, so it is only auto-selected when the
    workload fits (~1 MiB of output on 16 MB-VMEM parts).
    """
    if planar is None:
        # The v2 packed executor beats the planar arena (precomputed
        # records remove the state machine the planar trade targeted), so
        # planar is now opt-in via MINLZ_DEC_PLANAR/explicit arg.
        planar = False if _V2_DEFAULT else (
            sum(len(s) * seg for s in blocks_segs) <= PLANAR_MAX_OUT
        )
    (comp_lanes, lens, bases, lastrow), statics, out0, nrng_b = plan_batch(
        blocks_segs, seg, rng, cap_pr, planar
    )
    spr = statics["spr"]
    cap_pr = statics["cap_pr"]
    out_rows = statics["out_rows"]

    arena, counts = _decode_batch_jit(
        jnp.asarray(comp_lanes), jnp.asarray(lens), jnp.asarray(bases),
        jnp.asarray(lastrow), **statics,
    )
    counts_np = np.asarray(counts)
    out_np = np.asarray(arena[out0 : out0 + out_rows])
    if planar:
        out_bytes = out_np.astype(np.uint8).reshape(-1)
    else:
        out_bytes = out_np.view(np.uint32).view(np.uint8).reshape(-1)

    results = []
    pos = 0
    ri = 0
    for b, segs in enumerate(blocks_segs):
        blk_bytes = len(segs) * seg
        full_cap = _hard_cap(spr, seg)
        if (
            np.any(counts_np[ri : ri + nrng_b[b]] > cap_pr)
            and cap_pr < full_cap
        ):
            # Op cap overflow (pathological short-op density): redo this
            # block alone at the worst-case capacity, which always fits —
            # counts can only exceed it on hostile input, where the
            # compaction clamp yields wrong bytes (stream CRC catches)
            # but never out-of-bounds access or unbounded recursion.
            results.append(
                decode_blocks_chained(
                    [segs], [out_totals[b]], seg, rng, cap_pr=full_cap
                )[0]
            )
        else:
            results.append(
                out_bytes[pos : pos + blk_bytes][: out_totals[b]].tobytes()
            )
        pos += blk_bytes
        ri += nrng_b[b]
    return results


def decode_block_chained(seg_bytes_list, out_total: int, seg: int,
                         rng: int = RANGE):
    """Decode one block (batch-of-one wrapper over the scheduled path)."""
    return decode_blocks_chained(
        [seg_bytes_list], [out_total], seg, rng
    )[0]
