"""Chained decode executor (ops/exec_chain.py) correctness tests.

Ported from the one-shot scripts/debug_chain*.py harnesses (r2 advisor
finding): the realign/length sweep guards the uint32>>int32 arithmetic-shift
regression in window(), and the oracle-differential round-trips exercise
single- and multi-chain geometries end-to-end.  Runs in CPU interpret mode;
the real-TPU lowering of the same entry points is covered by
tests/test_tpu_smoke.py under MINLZ_TEST_TPU=1.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from minlz_tpu.ops import exec_chain as ec

ROW = ec.ROW_B
OP_T = ec.OP_T

# Arena geometry shared by the micro-tests: 1 guard row + 4 compressed rows
# + 4 output rows + 2 slack rows.
COMP_ROWS, OUT_ROWS = 4, 4
N_ARENA = 1 + COMP_ROWS + OUT_ROWS + 2
COMP = (np.arange(COMP_ROWS * ROW, dtype=np.uint32) % 251).astype(np.uint8)


def run_ops(op_list):
    """Execute a single-chain op list against the known byte-ramp arena.

    op_list entries: (llen, clen, csrc, lsrc_global_byte).  Returns the
    decoded output bytes.
    """
    cap_pc = OP_T
    ops = np.zeros((1, cap_pc, 3), np.int32)
    for k, (llen, clen, csrc, ls) in enumerate(op_list):
        ops[0, k, 0] = llen | (clen << 14)
        ops[0, k, 1] = csrc
        ops[0, k, 2] = ls
    counts = np.array([len(op_list)], np.int32)
    bases = np.array([(1 + COMP_ROWS) * ROW], np.int32)
    lastrows = np.array([COMP_ROWS + OUT_ROWS], np.int32)
    ops_flat = np.zeros(ec.tile_words(1), np.int32)
    ops_flat[: cap_pc * 3] = ops.reshape(cap_pc * 3)
    comp = np.zeros((1 + COMP_ROWS, 128), np.int32)
    cw = COMP.reshape(-1, 128, 4).astype(np.int32)
    comp[1:] = (
        cw[:, :, 0]
        | (cw[:, :, 1] << 8)
        | (cw[:, :, 2] << 16)
        | (cw[:, :, 3] << 24)
    )
    out = ec.execute_scheduled(
        jnp.asarray(ops_flat),
        jnp.asarray(counts),
        jnp.asarray(bases),
        jnp.asarray(lastrows),
        jnp.asarray(comp),
        nchain=1,
        K=1,
        cap_chain=cap_pc,
        n_arena_rows=N_ARENA,
    )
    ob = np.asarray(out[1 + COMP_ROWS :]).view(np.uint32).view(np.uint8)
    return ob.reshape(-1)


@pytest.mark.parametrize("align", [0, 1, 2, 3, 5, 7])
@pytest.mark.parametrize("llen", [1, 3, 26, 511, 513])
def test_literal_alignment_sweep(align, llen):
    """Literal window reads at every byte alignment: catches the signed
    right-shift realign bug (window() must shift unsigned)."""
    ls = ROW + align  # global byte address of the literal source
    got = run_ops([(llen, 0, 0, ls)])
    want = COMP[align : align + llen]
    assert (got[:llen] == want).all(), (align, llen)


@pytest.mark.parametrize(
    "offset,clen",
    [(1, 5), (1, 100), (2, 37), (3, 64), (7, 29), (64, 200), (300, 513)],
)
def test_copy_offsets(offset, clen):
    """Copies incl. RLE overlap (offset < length): eff-doubling path."""
    seed = max(64, offset)  # copy source must stay inside the chain output
    got = run_ops([(seed, clen, offset, ROW)])
    want = bytearray(COMP[:seed])
    for _ in range(clen):
        want.append(want[-offset])
    assert bytes(got[: seed + clen]) == bytes(want)


def test_copy_zero_literal_op():
    """lr == 0 ops must run their copy in the same slot (r2 fix: the copy
    sub-slot gate is lr == 0, not 'literal ran')."""
    got = run_ops([(16, 0, 0, ROW), (0, 8, 4, ROW)])
    want = bytearray(COMP[:16])
    for _ in range(8):
        want.append(want[-4])
    assert bytes(got[:24]) == bytes(want)


def test_row_crossing_literal_then_copy():
    """A literal run crossing a 512B row boundary must finish before its
    own op's copy starts."""
    got = run_ops([(500, 0, 0, ROW), (30, 40, 10, ROW + 500)])
    want = bytearray(COMP[:530])
    for _ in range(40):
        want.append(want[-10])
    assert bytes(got[:570]) == bytes(want)


def _roundtrip(nkb: int):
    from minlz_tpu.oracle import decode as odec
    from minlz_tpu.ops.device_codec import split_body
    from minlz_tpu.ops.encode_kernel import encode_block_device

    twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    data = (twain * 40)[: nkb << 10]
    seg, rng = 4096, ec.RANGE
    block, hints = encode_block_device(data, seg, rng)
    assert odec.decode_block(block) == data
    _, want, pos = odec.parse_header(block)
    segs = split_body(block[pos:], [h[0] for h in hints])
    got = ec.decode_block_chained(segs, len(data), seg, rng)
    assert got == data


def test_differential_roundtrip_single_chain():
    _roundtrip(32)  # 8 segments -> nchain == 1


def test_differential_roundtrip_multi_chain():
    nkb = 160  # 40 segments -> multiple ranges -> nchain >= 2
    spc, nchain = ec.chain_geometry(40, 4096)
    assert nchain >= 2
    _roundtrip(nkb)


def _encode_segs(data, seg, rng):
    from minlz_tpu.oracle import decode as odec
    from minlz_tpu.ops.device_codec import split_body
    from minlz_tpu.ops.encode_kernel import encode_block_device

    block, hints = encode_block_device(data, seg, rng)
    assert odec.decode_block(block) == data
    _, _, pos = odec.parse_header(block)
    return split_body(block[pos:], [h[0] for h in hints])


def test_batched_multi_block_decode():
    """Several blocks of mixed sizes through one scheduled dispatch: the
    serpentine range schedule must keep per-block outputs bit-exact."""
    twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    rng_np = np.random.default_rng(3)
    seg, rng = 4096, ec.RANGE
    blocks = [
        (twain * 40)[: 160 << 10],                      # text, 40 segs
        rng_np.integers(0, 16, 96 << 10, dtype=np.uint8).tobytes(),
        (twain * 40)[13:][: 64 << 10],                  # different phase
        bytes(48 << 10),                                # RLE zeros
    ]
    segs = [_encode_segs(b, seg, rng) for b in blocks]
    got = ec.decode_blocks_chained(
        segs, [len(b) for b in blocks], seg, rng
    )
    for g, b in zip(got, blocks):
        assert g == b


def test_batched_cap_overflow_fallback():
    """A tiny cap_pr forces the overflow path: the block must be redone
    solo at the worst-case capacity and still decode bit-exact."""
    twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    seg, rng = 4096, ec.RANGE
    data = (twain * 40)[: 64 << 10]
    segs = _encode_segs(data, seg, rng)
    got = ec.decode_blocks_chained(
        [segs], [len(data)], seg, rng, cap_pr=ec.OP_T
    )
    assert got[0] == data


def test_seg8192_whole_literal_record():
    """seg = 8192 with a wholly-literal segment: llen = 8192 and lsrc >
    8191 must survive the two-word op packing (r3 advisor high finding —
    13-bit fields silently corrupted such blocks)."""
    from minlz_tpu.oracle import encode as oenc

    seg = 8192
    rng_bytes = (np.arange(seg, dtype=np.uint32) * 2654435761 >> 13).astype(
        np.uint8
    ).tobytes()  # incompressible-ish ramp
    s0 = bytearray()
    oenc.emit_literals(s0, rng_bytes)  # one op, llen = 8192
    twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    s1 = bytearray()
    # Literal-heavy second segment so its lsrc cursor passes 8191 too.
    oenc.emit_literals(s1, twain[:seg])
    data = rng_bytes + twain[:seg]
    got = ec.decode_block_chained([bytes(s0), bytes(s1)], len(data), seg)
    assert got == data


def test_seg8192_device_roundtrip():
    """End-to-end device encode/decode at seg = 8192 (the DeviceCodec
    geometry for 2-4 MiB blocks), mixing incompressible and text data."""
    from minlz_tpu.oracle import decode as odec
    from minlz_tpu.ops.device_codec import split_body
    from minlz_tpu.ops.encode_kernel import encode_block_device

    rng = np.random.default_rng(7)
    twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    data = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes() + (
        twain * 2
    )[: 3 * 8192]
    seg = 8192
    block, hints = encode_block_device(data, seg, ec.RANGE)
    assert odec.decode_block(block) == data
    _, want, pos = odec.parse_header(block)
    segs = split_body(block[pos:], [h[0] for h in hints])
    got = ec.decode_block_chained(segs, len(data), seg, ec.RANGE)
    assert got == data


def test_unroll8_body_bit_exact(monkeypatch):
    """Pin the PRODUCTION 8x-unrolled executor body on CPU (r4 verdict:
    interpret-mode tests ran only the 2x body that TPU never uses).  The
    unroll factor only multiplies no-op passes for exhausted chains, so
    output must be identical — this test proves it rather than arguing it."""
    twain = open("testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    seg, rng = 4096, ec.RANGE
    blocks = [
        (twain * 12)[: 48 << 10],
        bytes(16 << 10),              # RLE zeros exercise the drain path
    ]
    segs = [_encode_segs(b, seg, rng) for b in blocks]

    def run():
        ec.execute_fast.clear_cache()
        ec._decode_batch_jit.clear_cache()
        return ec.decode_blocks_chained(
            segs, [len(b) for b in blocks], seg, rng
        )

    try:
        monkeypatch.setenv("MINLZ_UNROLL", "8")
        got8 = run()
    finally:
        monkeypatch.delenv("MINLZ_UNROLL", raising=False)
        ec.execute_fast.clear_cache()
        ec._decode_batch_jit.clear_cache()
    for g, b in zip(got8, blocks):
        assert g == b
