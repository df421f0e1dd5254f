"""Chained decode executor: C interleaved op streams over one block.

v2 of the decode execute phase (replaces the single scalar op walk in
``pallas_decode._make_exec_kernel`` for range-clamped streams).  Design is
set by measured TPU primitives (scripts/kernel_probe.py): arbitrary per-lane
gathers are serial, but dynamic whole-row loads/stores and lane-uniform
rotates are fast, and N independent scalar chains overlap latency ~N-fold
(266 ns/op at 1 chain -> 36 ns/op at 16).  So the executor walks C = 16
independent op streams — contiguous segment ranges of the SAME block — in
one branch-free loop, each chain append-only at its own cursor.

Correctness of chain parallelism: the encoder clamps every match source to
the ``RANGE`` (64 KiB) range of its destination (``find_matches_dyn`` mask +
the native parse's backward-extension clamp), recorded in parse-hints v2.
Chains own disjoint byte ranges and never read another chain's in-flight
output.

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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_B = 512          # bytes per arena row (128 lanes x 4 packed bytes)
MAXC = 16            # chains (static unroll)
OP_T = 256           # ops per chain per grid step (SMEM tile)
# Encoder match-source clamp granularity (hints v2).  64 KiB gives a 1 MiB
# block 16 independent ranges = 16 executor chains (measured ~1.3x the
# per-op rate of 8); the ratio cost vs 128 KiB is ~0.1 points because the
# match finder's exact level already stays within 32 KiB windows.
RANGE = 64 * 1024

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
            idx = iota + m
            va = jnp.take_along_axis(a, idx & 127, axis=1)
            vb = jnp.take_along_axis(b, idx & 127, axis=1)
            v = jnp.where(idx < 128, va, vb)
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
    jax.jit, static_argnames=("spc", "cap_pc", "pc", "nchain")
)
def compact_ops_chained(kind, dst, clen, csrc, lsrc, llen,
                        spc: int, cap_pc: int, pc: int, nchain: int):
    """Pack per-row op records into per-chain dense lists.

    kind..llen: [P, sub, 128] int32 transducer emissions (see transducer.py).
    spc: segments (lanes) per chain; cap_pc: padded ops per chain (multiple
    of OP_T); pc: compressed bytes per lane in the arena (for global lsrc).

    Executor words: A = llen | clen << 14; B = csrc (copy offset, up to
    RANGE = 17 bits); C = lane*pc + lsrc (global arena byte position of
    the first literal).  To cut sort and stitch bandwidth, the three words
    travel packed in TWO (llen/clen are 14-bit so seg = 8192 whole-literal
    or whole-copy records survive, lsrc is 14-bit, csrc 17)
    and unpack after the stitch; the per-op lane id is NOT packed — it is
    reconstructed from the per-lane count scan by a tiny scatter + cummax
    over the dense op positions.  Returns
    (ops [nchain, cap_pc, 3] int32, counts [nchain] int32).
    """
    del dst  # cursors are append-only; dst is implied
    P = kind.shape[0]
    L = nchain * spc  # lanes actually covered by chains

    # Pack in parse layout (cheap vector work), transpose only 3 arrays.
    # w1 is already the executor A word (llen | clen << 14, 28 bits); w2
    # packs csrc (17 bits) with a 14-bit lsrc — lsrc < pc and pc tops out
    # at seg + one row of margin, so 14 bits cover seg = 8192 streams.
    w1 = llen | (clen << 14)
    w2 = csrc | (lsrc << 17)

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
    counts = jnp.sum(real, axis=1, dtype=jnp.int32)  # [L]
    within = jnp.cumsum(counts.reshape(nchain, spc), axis=1)
    within = (within - counts.reshape(nchain, spc)).reshape(-1)
    lane_idx = jnp.arange(L, dtype=jnp.int32)[:, None]
    chain = lane_idx[:, 0] // spc
    meta = jnp.stack([chain * cap_pc + within, counts], axis=1)

    Wr = P // 128
    pad = jnp.zeros((L, 1, 128), jnp.int32)
    a_p = jnp.concatenate([w1_s.reshape(L, Wr, 128), pad], axis=1)
    b_p = jnp.concatenate([w2_s.reshape(L, Wr, 128), pad], axis=1)

    rows = nchain * cap_pc // 128
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
    p1 = out[0].reshape(nchain, cap_pc)
    p2 = out[1].reshape(nchain, cap_pc)
    # Reconstruct each dense op slot's owning lane: scatter every lane's
    # first-op position (chain-dense coords), then forward-fill.  Empty
    # lanes collide on the same slot; max keeps the later lane, which is
    # correct since the earlier lane owns no slots.
    flat_pos = chain * cap_pc + within
    lane_map = (
        jnp.zeros((nchain * cap_pc,), jnp.int32)
        .at[flat_pos].max(jnp.arange(L, dtype=jnp.int32))
        .reshape(nchain, cap_pc)
    )
    lane_u = jax.lax.cummax(lane_map, axis=1)
    # Unpack to executor words.  +ROW_B on C: the arena carries one guard
    # row before the compressed lanes so window() never sees a negative
    # byte address (literal reads are window(ls - q), q up to ROW_B-1).
    a = p1
    b = p2 & 0x1FFFF
    c = ((p2 >> 17) & 0x3FFF) + lane_u * pc + ROW_B
    ops = jnp.stack([a, b, c], axis=2)
    chain_counts = jnp.sum(counts.reshape(nchain, spc), axis=1)
    return ops, chain_counts


# --------------------------------------------------------------------------
# Chained executor kernel
# --------------------------------------------------------------------------

def _make_chain_kernel(nchain: int, out_base_row: int, chain_rows: int,
                       n_arena_rows: int):
    """Build the chained executor.

    counts_ref: SMEM [nchain].  ops_ref: 1D SMEM tile of
    nchain * OP_T * 3 words (tile-major repack of the per-chain lists) —
    1D because Mosaic's (8, 128) divisibility rule applies to >=2D SMEM
    blocks and a (1, W) block over a multi-tile array fails it.
    arena_in_ref/arena_ref: VMEM [n_arena_rows, 128] int32 — [comp rows
    || out rows], aliased input/output (all access goes through the out
    ref; unwritten rows read back the aliased input).  st_ref: SMEM scratch (nchain*8,) persisted
    per-chain scalars.  Sub-slot stores read-modify-write the arena row
    directly (write-through keeps rows current, so the row doubles as the
    accumulator), and each sub-slot's vector work runs under
    ``pl.when(t? > 0)`` — a vacuous slot (pure-copy record's literal slot,
    a row-crossing literal's copy slot, or an exhausted chain idling while
    stragglers finish) costs only scalar bookkeeping.
    """
    F = 8  # scalar state fields per chain

    def kernel(counts_ref, ops_ref, arena_in_ref, arena_ref, st_ref,
               ):
        t = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        b4 = iota * 4  # first byte index of each packed word

        @pl.when(t == 0)
        def _init():
            # The HBM buffers are aliased, but on real TPU the output VMEM
            # block is a distinct, uninitialized buffer — seed it from the
            # input block (interpret mode pre-copies; hardware does not).
            arena_ref[...] = arena_in_ref[...]
            for ch in range(nchain):
                st_ref[ch * F + 0] = 0  # op_ptr
                st_ref[ch * F + 1] = 0  # lit_rem
                st_ref[ch * F + 2] = 0  # cpy_rem
                st_ref[ch * F + 3] = 1  # eff
                st_ref[ch * F + 4] = 0  # lsrc_pos
                st_ref[ch * F + 5] = (out_base_row + ch * chain_rows) * ROW_B

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

        limits = [jnp.minimum(counts_ref[ch], (t + 1) * OP_T)
                  for ch in range(nchain)]

        def cond(state):
            act = None
            for ch in range(nchain):
                op, lr, cr = (state[ch * 3], state[ch * 3 + 1],
                              state[ch * 3 + 2])
                a = (op < limits[ch]) | (lr > 0) | (cr > 0)
                act = a if act is None else (act | a)
            return act

        def body(state):
            new = list(state)
            for ch in range(nchain):
                op = state[ch * 3]
                lr = state[ch * 3 + 1]
                cr = state[ch * 3 + 2]
                eff = state[nchain * 3 + ch * 3]
                ls = state[nchain * 3 + ch * 3 + 1]
                cur = state[nchain * 3 + ch * 3 + 2]
                # Stores clamp into the chain's own span: keeps idle
                # iterations and hostile op streams from touching other
                # chains' rows or escaping the arena.
                last_row = out_base_row + (ch + 1) * chain_rows - 1

                need = (lr == 0) & (cr == 0)
                can = need & (op < limits[ch])
                idx = jnp.clip(op - t * OP_T, 0, OP_T - 1)
                base = ch * (OP_T * 3) + idx * 3
                a = ops_ref[base]
                b = ops_ref[base + 1]
                cw = ops_ref[base + 2]
                lr = jnp.where(can, a & 0x3FFF, lr)
                cr = jnp.where(can, (a >> 14) & 0x3FFF, cr)
                eff = jnp.where(can, jnp.maximum(b, 1), eff)
                ls = jnp.where(can, cw, ls)
                op = op + can.astype(jnp.int32)

                # literal sub-slot (vector work gated: pure-copy records
                # and idle chains pay only the scalar bookkeeping)
                q = cur & (ROW_B - 1)
                ta = jnp.minimum(lr, ROW_B - q)
                row_a = jnp.minimum(cur >> 9, last_row)

                @pl.when(ta > 0)
                def _lit(q=q, ta=ta, ls=ls, row_a=row_a):
                    # RMW on the arena row itself: write-through keeps the
                    # row current, so it doubles as the accumulator.
                    cur_row = jnp.broadcast_to(
                        arena_ref[pl.ds(row_a, 1), :], (8, 128)
                    )
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
                q2 = cur & (ROW_B - 1)
                tb = jnp.minimum(jnp.minimum(cr, eff), ROW_B - q2)
                tb = jnp.where(lr == 0, tb, 0)
                row_b = jnp.minimum(cur >> 9, last_row)

                @pl.when(tb > 0)
                def _cpy(q2=q2, tb=tb, cur=cur, eff=eff, row_b=row_b):
                    cur_row = jnp.broadcast_to(
                        arena_ref[pl.ds(row_b, 1), :], (8, 128)
                    )
                    win2 = window(cur - eff - q2)
                    m2 = bmask(q2, q2 + tb)
                    arena_ref[pl.ds(row_b, 1), :] = (
                        (win2 & m2) | (cur_row & ~m2)
                    )[0:1]

                cur = cur + tb
                cr = cr - tb
                eff = jnp.where((tb == eff) & (cr > 0), eff * 2, eff)

                new[ch * 3] = op
                new[ch * 3 + 1] = lr
                new[ch * 3 + 2] = cr
                new[nchain * 3 + ch * 3] = eff
                new[nchain * 3 + ch * 3 + 1] = ls
                new[nchain * 3 + ch * 3 + 2] = cur
            return tuple(new)

        state = []
        for ch in range(nchain):
            state += [st_ref[ch * F + 0], st_ref[ch * F + 1],
                      st_ref[ch * F + 2]]
        for ch in range(nchain):
            state += [st_ref[ch * F + 3], st_ref[ch * F + 4],
                      st_ref[ch * F + 5]]
        state = jax.lax.while_loop(cond, body, tuple(state))
        for ch in range(nchain):
            st_ref[ch * F + 0] = state[ch * 3]
            st_ref[ch * F + 1] = state[ch * 3 + 1]
            st_ref[ch * F + 2] = state[ch * 3 + 2]
            st_ref[ch * F + 3] = state[nchain * 3 + ch * 3]
            st_ref[ch * F + 4] = state[nchain * 3 + ch * 3 + 1]
            st_ref[ch * F + 5] = state[nchain * 3 + ch * 3 + 2]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nchain", "cap_pc", "out_base_row", "chain_rows",
                     "n_arena_rows"),
)
def execute_chained(ops_flat, counts, arena, nchain: int, cap_pc: int,
                    out_base_row: int, chain_rows: int, n_arena_rows: int):
    """Run the chained executor.  ops_flat: [n_tiles * tile_words(nchain)]
    tile-major op words (flat 1D with each tile zero-padded to a 1024-word
    multiple: Mosaic tiles 1D memrefs by 1024 and the grid-stepped block
    must divide evenly; the >=2D (8, 128) rule is no easier to satisfy
    here).  arena: [n_arena_rows, 128] int32 packed bytes with a guard row
    at row 0 and the compressed lanes at rows [1, out_base_row).  Returns
    the arena with the output region filled."""
    grid = (cap_pc // OP_T,)
    tile_w = tile_words(nchain)
    kernel = pl.pallas_call(
        _make_chain_kernel(nchain, out_base_row, chain_rows, n_arena_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_w,), lambda t: (t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_arena_rows, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_arena_rows, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_arena_rows, 128), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((nchain * 8,), jnp.int32),
        ],
        input_output_aliases={2: 0},
        interpret=_interpret(),
    )
    return kernel(counts, ops_flat, arena)


# --------------------------------------------------------------------------
# Fused block decode: parse -> compact -> execute in one jit
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "pc", "seg", "spc", "nchain", "cap_pc",
                     "out_rows"),
)
def _decode_block_jit(comp_lanes, lens, n_rows: int, pc: int, seg: int,
                      spc: int, nchain: int, cap_pc: int, out_rows: int):
    """comp_lanes: [lanes, pc] uint8 per-segment token streams (zero
    padded); lens: [sub, 128] int32.  Returns the filled arena
    [comp_rows + out_rows + 2, 128] int32."""
    from .pallas_decode import parse_segments_pallas

    lanes = comp_lanes.shape[0]
    sub = lanes // 128

    # Parse wants row-major packed words [n_rows//4, sub, 128].
    ct = comp_lanes[:, :n_rows].T.astype(jnp.int32)  # [n_rows, lanes]
    ct = ct.reshape(n_rows // 4, 4, sub, 128)
    words = (ct[:, 0] | (ct[:, 1] << 8) | (ct[:, 2] << 16)
             | (ct[:, 3] << 24))
    emits = parse_segments_pallas(words, lens, n_rows)

    ops, counts = compact_ops_chained(
        *emits, spc=spc, cap_pc=cap_pc, pc=pc, nchain=nchain
    )
    n_tiles = cap_pc // OP_T
    tiles = (
        ops.reshape(nchain, n_tiles, OP_T, 3)
        .transpose(1, 0, 2, 3)
        .reshape(n_tiles, nchain * OP_T * 3)
    )
    tw = tile_words(nchain)
    ops_flat = jnp.pad(
        tiles, ((0, 0), (0, tw - nchain * OP_T * 3))
    ).reshape(n_tiles * tw)

    # Arena: guard row (negative-window clamp target), per-lane comp bytes
    # packed 4-per-word, then the output region.
    flat = comp_lanes.reshape(-1, 128, 4).astype(jnp.int32)
    comp_words = (flat[:, :, 0] | (flat[:, :, 1] << 8)
                  | (flat[:, :, 2] << 16) | (flat[:, :, 3] << 24))
    comp_rows = lanes * pc // ROW_B
    arena = jnp.concatenate(
        [jnp.zeros((1, 128), jnp.int32), comp_words,
         jnp.zeros((out_rows + 2, 128), jnp.int32)], axis=0
    )
    n_arena_rows = 1 + comp_rows + out_rows + 2
    chain_rows = spc * seg // ROW_B
    return execute_chained(
        ops_flat, counts, arena, nchain=nchain, cap_pc=cap_pc,
        out_base_row=1 + comp_rows, chain_rows=chain_rows,
        n_arena_rows=n_arena_rows,
    )


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


def decode_block_chained(seg_bytes_list, out_total: int, seg: int,
                         rng: int = RANGE):
    """Decode one block whose parse hints guarantee match sources stay
    within `rng`-byte ranges of their destination (hints v2).  Chains take
    contiguous whole ranges, so cross-range references never race.
    """
    nseg = len(seg_bytes_list)
    if seg > 8192:
        raise ValueError(f"segment size {seg} exceeds op packing (14 bits)")
    spc, nchain = chain_geometry(nseg, seg, rng)
    lanes = 128 * -(-(nchain * spc) // 128)

    pc_data = max(len(sb) for sb in seg_bytes_list)
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
    for i, sb in enumerate(seg_bytes_list):
        a = np.frombuffer(bytes(sb), np.uint8)
        comp_lanes[i, : len(a)] = a
        lens[i // 128, i % 128] = len(a)

    # Ops per chain bound: a copy needs >= 2 compressed bytes and literal
    # runs are fused, so records <= comp_bytes/2 + 2 per segment.
    cap_pc = spc * (seg // 2 + 2)
    cap_pc = -(-cap_pc // OP_T) * OP_T

    out_rows = nchain * spc * seg // ROW_B
    arena = _decode_block_jit(
        jnp.asarray(comp_lanes), jnp.asarray(lens), n_rows=n_rows, pc=pc,
        seg=seg, spc=spc, nchain=nchain, cap_pc=cap_pc, out_rows=out_rows,
    )
    comp_rows = lanes * pc // ROW_B
    out_np = np.asarray(arena[1 + comp_rows : 1 + comp_rows + out_rows])
    out_bytes = out_np.view(np.uint32).view(np.uint8).reshape(-1)
    return out_bytes[:out_total].tobytes()
