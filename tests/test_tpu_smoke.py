"""Real-TPU lowering smoke tests: every Pallas entry point must compile AND
run on hardware, on tiny inputs.

Round 2 shipped a kernel that only ever executed in interpret mode (the
Mosaic SMEM-block divisibility rejection was invisible off-TPU); this tier
makes that failure class structurally impossible.  Run with
``MINLZ_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py -v`` on a
machine with a TPU.  Mirrors the reference's multi-build-tag differential CI
(/root/reference/.github/workflows/go.yml:29-44) where every optimized path
is exercised, not just the portable one.

First compile of each kernel takes 20-40s on a tunneled TPU; the module
shares one small corpus so each entry point compiles once.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("MINLZ_TEST_TPU"),
    reason="real-TPU smoke tier (set MINLZ_TEST_TPU=1)",
)


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    return jax.default_backend()


@pytest.fixture(scope="module")
def small_block(tpu_backend):
    """A 64 KiB compressible input encoded via the device encoder."""
    from minlz_tpu.ops.encode_kernel import encode_block_device

    rng = np.random.default_rng(7)
    base = rng.integers(0, 48, 8 * 1024, dtype=np.uint8).tobytes()
    data = (base * 8)[: 64 * 1024]
    block, hints = encode_block_device(data, 4096, 128 * 1024)
    assert block is not None
    return data, block, hints


def test_chained_executor_lowers_and_runs(small_block):
    """exec_chain: parse -> compact_ops_chained -> execute_chained."""
    from minlz_tpu.oracle import decode as odec
    from minlz_tpu.ops.device_codec import split_body
    from minlz_tpu.ops.exec_chain import decode_block_chained

    data, block, hints = small_block
    _, want, pos = odec.parse_header(block)
    segs = split_body(block[pos:], [h[0] for h in hints])
    got = decode_block_chained(segs, len(data), 4096, 128 * 1024)
    assert got == data


def test_v1_executor_lowers_and_runs(small_block):
    """pallas_decode: parse_segments_pallas -> compact_ops -> execute."""
    from minlz_tpu.oracle import decode as odec
    from minlz_tpu.ops.device_codec import split_body
    from minlz_tpu.ops.pallas_decode import decode_block_tpu

    data, block, hints = small_block
    _, want, pos = odec.parse_header(block)
    segs = split_body(block[pos:], [h[0] for h in hints])
    got = decode_block_tpu(segs, len(data), 4096)
    assert got == data


def test_greedy_parse_pallas_lowers_and_runs(tpu_backend):
    """pallas_encode.greedy_parse_pallas vs the lax.scan reference parse."""
    import jax.numpy as jnp

    from minlz_tpu.ops.encode_kernel import (
        find_matches,
        greedy_parse,
        greedy_parse_compact,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(0, 32, 2048, dtype=np.uint8).tobytes()
    data = (base * 8)[: 16 * 1024]
    seg = 4096
    flat = jnp.asarray(
        np.frombuffer(data, np.uint8).astype(np.int32)[None, :]
    )
    off, ln = find_matches(flat, len(data), seg=seg)
    off_r = off.reshape(-1, seg)
    len_r = ln.reshape(-1, seg)
    pos, _, _, _, count = greedy_parse_compact(off_r, len_r, seg)
    take_r, _, _, _ = greedy_parse(off_r, len_r, seg)
    want_pos = np.nonzero(np.asarray(take_r).reshape(-1) > 0)[0]
    got = np.asarray(pos)[: int(count)]
    np.testing.assert_array_equal(np.sort(got), want_pos)


def test_device_encoder_lowers_and_runs(small_block):
    """find_matches_dyn + the fused native parse produce a valid block."""
    from minlz_tpu.oracle import decode as odec

    data, block, hints = small_block
    assert odec.decode_block(block) == data
    assert len(hints) == len(data) // 4096
