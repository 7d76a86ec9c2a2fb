"""Feature-detected multimodal decode: real codec branch when PIL is
importable, deterministic stub otherwise — and text payloads always
take the stub path, so the registered queries' oracles hold under
either environment."""

from __future__ import annotations

import struct

from old_original_java_little_horse_spark.functions import multimodal as M

# A handcrafted 2x3 24-bit BMP (no codec needed to *write* one):
# BITMAPFILEHEADER + BITMAPINFOHEADER + 3 rows of 8 bytes (2px * 3B,
# padded to a 4-byte boundary).
_ROWS = 3 * 8
BMP_2X3 = (
    struct.pack("<2sIHHI", b"BM", 14 + 40 + _ROWS, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 2, 3, 1, 24, 0, _ROWS, 2835, 2835, 0, 0)
    + bytes(range(_ROWS))
)


def test_text_bytes_always_take_stub_path():
    payload = b"just some document text"
    assert M.decode_meta(payload) == M.fake_decode_meta(payload)


def test_image_bytes_take_real_branch_when_codec_exists():
    meta = M.decode_meta(BMP_2X3)
    if M._HAS_PIL:
        # Real decode: actual dimensions, not the stub's arithmetic.
        assert (meta["fake_width"], meta["fake_height"]) == (2, 3)
        assert meta["fake_n_frames"] == 1
    else:
        # No codec in this environment → deterministic stub.
        assert meta == M.fake_decode_meta(BMP_2X3)
    assert meta["byte_len"] == len(BMP_2X3)


def test_stub_is_pure_and_deterministic():
    assert M.fake_decode_meta(BMP_2X3) == M.fake_decode_meta(BMP_2X3)
    n = len(BMP_2X3)
    got = M.fake_decode_meta(BMP_2X3)
    assert got["fake_width"] == 64 + (n % 577)
    assert got["fake_height"] == 64 + (n % 311)
    assert got["fake_n_frames"] == 1 + (n % 24)
