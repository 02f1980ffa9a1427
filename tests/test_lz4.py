"""Native LZ4 decoder tests with handcrafted frames (no lz4 wheel needed)."""

import io
import struct

import numpy as np
import pytest

from diffusion_classifier_tpu.utils import lz4io

pytestmark = pytest.mark.skipif(
    not lz4io.native_available(), reason="native toolchain unavailable"
)

MAGIC = struct.pack("<I", 0x184D2204)


def frame(blocks: list[tuple[bytes, bool]], content_size=None) -> bytes:
    """Assemble an LZ4 frame from (payload, is_compressed) blocks."""
    flg = 0x40 | (0x08 if content_size is not None else 0)
    out = [MAGIC, bytes([flg, 0x40])]
    if content_size is not None:
        out.append(struct.pack("<Q", content_size))
    out.append(b"\x00")  # header checksum (not verified by the decoder)
    for payload, compressed in blocks:
        size = len(payload) | (0 if compressed else 0x80000000)
        out.append(struct.pack("<I", size))
        out.append(payload)
    out.append(struct.pack("<I", 0))  # EndMark
    return b"".join(out)


def lz4_block_rle(literals: bytes, match_offset: int, match_len: int) -> bytes:
    """One literals+match sequence (match_len in [4, 18] for simplicity)."""
    assert 4 <= match_len <= 18 and len(literals) < 15
    token = (len(literals) << 4) | (match_len - 4)
    return bytes([token]) + literals + struct.pack("<H", match_offset)


def test_store_only_frame_roundtrip():
    payload = bytes(range(256)) * 10
    data = frame([(payload, False)])
    assert lz4io.decompress(data) == payload


def test_compressed_block_with_match():
    lit = b"0123456789"
    data = frame([(lz4_block_rle(lit, 10, 10), True)])
    assert lz4io.decompress(data) == lit + lit  # offset-10 match repeats them


def test_overlapping_match_rle():
    # single literal 'a', then match offset 1 len 18 → 'a' * 19
    data = frame([(lz4_block_rle(b"a", 1, 18), True)])
    assert lz4io.decompress(data) == b"a" * 19


def test_content_size_hint_used():
    payload = b"x" * 100000
    data = frame([(payload, False)], content_size=len(payload))
    assert lz4io.decompress(data) == payload


def test_multiple_blocks_concatenate():
    data = frame([(b"hello ", False), (lz4_block_rle(b"world", 5, 5), True)])
    assert lz4io.decompress(data) == b"hello worldworld"


def test_malformed_magic_raises():
    with pytest.raises(ValueError):
        lz4io.decompress(b"\x00\x00\x00\x00garbage")


def test_npy_lz4_roundtrip(tmp_path):
    arr = np.arange(1000, dtype=np.float32).reshape(10, 100)
    buf = io.BytesIO()
    np.save(buf, arr)
    data = frame([(buf.getvalue(), False)])
    p = tmp_path / "vol.npy.lz4"
    p.write_bytes(data)
    out = lz4io.load_npy_lz4(str(p))
    np.testing.assert_array_equal(out, arr)
