"""Device (Pallas-interpret on CPU) encode/decode pipeline tests."""

import io

import numpy as np
import pytest

from minlz_tpu.oracle import decode as odec
from minlz_tpu.ops.device_codec import marshal_hints, parse_hints, split_body
from minlz_tpu.ops.encode_kernel import encode_block_device
from minlz_tpu.ops.pallas_decode import decode_block_tpu
from minlz_tpu.stream import Reader, Writer


def test_hint_wire_roundtrip():
    hints = [(0, 0), (100, 4096), (250, 8192), (1000, 12288)]
    payload = marshal_hints(4096, hints)
    seg, offs = parse_hints(payload)
    assert seg == 4096
    assert offs == [h[0] for h in hints]


def test_device_encode_oracle_decodable(twain):
    """Device-encoded blocks are plain MinLZ: the spec oracle decodes them."""
    block, hints = encode_block_device(twain)
    assert odec.decode_block(block) == twain
    assert hints[0][0] == 0


def test_device_roundtrip_mixed(twain):
    rng = np.random.default_rng(3)
    data = (
        twain[:6000]
        + rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
        + twain[:8000]
        + b"A" * 3000
        + bytes(rng.integers(0, 4, 2000, dtype=np.uint8))
    )
    block, hints = encode_block_device(data)
    assert odec.decode_block(block) == data
    _, want, pos = odec.parse_header(block)
    body = block[pos:]
    segs = split_body(body, [h[0] for h in hints])
    assert decode_block_tpu(segs, len(data)) == data


def test_device_stream_roundtrip(twain):
    data = twain * 20
    buf = io.BytesIO()
    with Writer(buf, device=True, block_size=128 << 10, concurrency=1) as w:
        w.encode_buffer(data)
    enc = buf.getvalue()
    assert len(enc) < len(data)
    # Device reader (uses hints).
    assert Reader(io.BytesIO(enc), device=True).readall() == data
    # Plain reader must also decode the same stream (hints are skippable).
    assert Reader(io.BytesIO(enc)).readall() == data


def test_device_stream_incompressible():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    buf = io.BytesIO()
    with Writer(buf, device=True, block_size=64 << 10, concurrency=1) as w:
        w.encode_buffer(data)
    enc = buf.getvalue()
    assert Reader(io.BytesIO(enc), device=True).readall() == data
