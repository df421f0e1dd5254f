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


def test_dict_marshal(twain):
    d = Dict(twain[:1000])
    assert Dict.load(d.marshal()).bytes == d.bytes


def test_dict_tiny_input(twain):
    d = Dict(twain[:100])
    for data in (b"", b"abc", twain[:20]):
        enc = encode_with_dict(data, d)
        assert decode_with_dict(enc, d) == data
