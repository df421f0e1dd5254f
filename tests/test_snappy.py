"""Snappy fallback tests: block decode + legacy framed streams."""

import io

import pytest

from minlz_tpu import block as blockapi
from minlz_tpu import minlz
from minlz_tpu.snappy import snappy_decode_block, snappy_encode_block
from minlz_tpu.stream import Reader


def test_snappy_block_roundtrip(twain):
    enc = snappy_encode_block(twain)
    assert snappy_decode_block(enc) == twain


def test_golden_rawsnappy(twain):
    with open("testdata/Mark.Twain-Tom.Sawyer.txt.rawsnappy", "rb") as f:
        raw = f.read()
    assert snappy_decode_block(raw) == twain


def test_block_api_fallback(twain):
    """block.decode transparently decodes Snappy (non-zero first byte)."""
    enc = snappy_encode_block(twain)
    assert enc[0] != 0
    assert blockapi.decode(enc) == twain


def test_snappy_framed_stream(twain):
    # Build a Snappy framing-format stream by hand.
    enc = snappy_encode_block(twain)
    c = minlz.crc(twain)
    payload = c.to_bytes(4, "little") + enc
    stream = (
        b"\xff\x06\x00\x00sNaPpY"
        + bytes([0x00])
        + len(payload).to_bytes(3, "little")
        + payload
    )
    with pytest.raises(minlz.UnsupportedError):
        Reader(io.BytesIO(stream)).readall()
    got = Reader(io.BytesIO(stream), fallback=True).readall()
    assert got == twain
