"""Dictionary compression tests."""

import pytest

from minlz_tpu.dict import Dict, decode_with_dict, encode_with_dict
from minlz_tpu.oracle import encode as oenc


def test_dict_roundtrip_and_gain(twain):
    d = Dict(twain[:8000])
    data = twain[6000:14000]
    enc = encode_with_dict(data, d)
    assert decode_with_dict(enc, d) == data
    # Dictionary overlap must beat dict-less encoding.
    assert len(enc) < len(oenc.encode_block(data))


def test_dict_disjoint_content(twain):
    d = Dict(b"\x01\x02\x03\x04" * 64)
    data = twain[:5000]
    enc = encode_with_dict(data, d)
    assert decode_with_dict(enc, d) == data


def test_dict_size_limits():
    with pytest.raises(ValueError):
        Dict(b"short")
    with pytest.raises(ValueError):
        Dict(b"x" * 70000)


@pytest.mark.parametrize("level", [-1, 1, 2, 3])
def test_dict_levels_beat_nondict(twain, level):
    """Dict-aware optimal parse at every level: beats the same-level
    non-dict encode and round-trips via both oracle and native decoders."""
    from minlz_tpu import block as blockapi
    from minlz_tpu.native.codec import get_codec

    d = Dict(twain[:8192])
    data = twain[4096:]
    enc = encode_with_dict(data, d, level=level)
    assert decode_with_dict(enc, d) == data
    codec = get_codec()
    if codec is not None:
        assert codec.decode_block_dict(enc, d.bytes) == data
    assert len(enc) < len(blockapi.encode(data, level=level))


def test_dict_level_ladder(twain):
    """Higher levels never produce larger dict-encoded output."""
    d = Dict(twain[:8192])
    data = twain[4096:]
    sizes = [len(encode_with_dict(data, d, level=lv)) for lv in (-1, 1, 2, 3)]
    assert sizes == sorted(sizes, reverse=True) or len(set(sizes)) < 4


def test_dict_marshal(twain):
    d = Dict(twain[:1000])
    assert Dict.load(d.marshal()).bytes == d.bytes


def test_dict_tiny_input(twain):
    d = Dict(twain[:100])
    for data in (b"", b"abc", twain[:20]):
        enc = encode_with_dict(data, d)
        assert decode_with_dict(enc, d) == data
