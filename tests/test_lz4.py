"""LZ4 conversion tests: differential vs decompress-then-recompress."""

import numpy as np
import pytest

from minlz_tpu import lz4
from minlz_tpu.oracle import decode as odec

from conftest import load_corpus


def test_lz4_mini_codec_roundtrip(twain):
    enc = lz4.lz4_encode_block(twain)
    assert len(enc) < len(twain)
    assert lz4.lz4_decode_block(enc) == twain


def test_convert_block_twain(twain):
    enc = lz4.lz4_encode_block(twain)
    mlz = lz4.convert_block(enc)
    assert odec.decode_block(mlz) == twain
    # Conversion should not be drastically larger than the LZ4 input.
    assert len(mlz) <= len(enc) * 1.05


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_convert_block_mixed(twain, seed):
    rng = np.random.default_rng(seed)
    data = (
        twain[:4000]
        + rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
        + twain[:4000]
        + b"x" * 500
    )
    enc = lz4.lz4_encode_block(data)
    assert lz4.lz4_decode_block(enc) == data
    mlz = lz4.convert_block(enc)
    assert odec.decode_block(mlz) == data


def test_convert_corpus():
    """Round-trip corpus inputs through lz4-encode -> convert -> decode."""
    n = 0
    for data in load_corpus("FuzzLZ4Block.zip"):
        if len(data) < 16 or len(data) > 100_000:
            continue
        enc = lz4.lz4_encode_block(data)
        if lz4.lz4_decode_block(enc) != data:
            continue
        mlz = lz4.convert_block(enc)
        assert odec.decode_block(mlz) == data
        n += 1
        if n >= 15:
            break
    assert n >= 5


def test_corrupt_lz4_rejected():
    with pytest.raises(lz4.LZ4CorruptError):
        lz4.convert_block(b"\xff\x01\x02")  # truncated literal ext
    with pytest.raises(lz4.LZ4CorruptError):
        # offset beyond output
        lz4.convert_block(bytes([1 << 4]) + b"A" + b"\x10\x00" + b"\x00")
