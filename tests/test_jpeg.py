"""Baseline JPEG decoder tests against HAND-DERIVED bitstreams.

Each fixture is built marker-by-marker with hand-packed entropy bits
and DC-only blocks, whose decoded value has a closed form independent
of the decoder: a block with only F(0,0)=c dequantized decodes to the
constant round(c/8) + 128 (the (0,0) DCT basis is the constant 1/8).
That makes these true oracles — no encoder shares code or assumptions
with the decoder under test.
"""

import numpy as np
import pytest

from ds2_spark.operators.jpeg import decode_jpeg


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_unit() -> bytes:
    return _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # table 0, all ones


def _dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    counts = [0] * 16
    for b in bits:
        counts[b - 1] += 1
    return _seg(0xC4, bytes([cls << 4 | tid]) + bytes(counts) + bytes(vals))


def _pack_bits(bits: str) -> bytes:
    bits = bits.replace(" ", "")
    pad = (-len(bits)) % 8
    bits += "1" * pad  # T.81 pads the final byte with 1-bits
    out = bytearray(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    # byte-stuff any 0xFF produced by the bit packing
    stuffed = bytearray()
    for byte in out:
        stuffed.append(byte)
        if byte == 0xFF:
            stuffed.append(0x00)
    return bytes(stuffed)


def test_gray_single_block_dc_only():
    """8x8 gray, q=1, DC=24 -> every pixel = 24/8 + 128 = 131."""
    sof = _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    dht_dc = _dht(0, 0, [2], [5])        # code 00 -> category 5
    dht_ac = _dht(1, 0, [2], [0x00])     # code 00 -> EOB
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # DC: code 00, receive 11000 (=24, cat 5); AC: EOB 00
    entropy = _pack_bits("00 11000 00")
    b = b"\xff\xd8" + _dqt_unit() + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    img = decode_jpeg(b)
    assert img.shape == (8, 8, 1)
    assert (img == 131).all()


def test_gray_two_blocks_dc_prediction():
    """16x8 gray: block 1 DC diff +24 (->131), block 2 diff -8 so the
    predictor gives 16 -> 16/8 + 128 = 130. Exercises DC prediction."""
    sof = _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    dht_dc = _dht(0, 0, [2, 2], [5, 4])  # 00 -> cat5, 01 -> cat4
    dht_ac = _dht(1, 0, [2], [0x00])
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # blk1: 00 + 11000 (+24) + EOB; blk2: 01 + 0111 (extend(7,4) = -8) + EOB
    entropy = _pack_bits("00 11000 00  01 0111 00")
    b = b"\xff\xd8" + _dqt_unit() + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    img = decode_jpeg(b)
    assert img.shape == (8, 16, 1)
    assert (img[:, :8] == 131).all()
    assert (img[:, 8:] == 130).all()


def test_color_420_mcu_interleave_and_upsample():
    """16x16 4:2:0 YCbCr, one MCU (4 Y blocks + Cb + Cr), DC-only:
    Y=131, Cb=Cr=128 (neutral chroma) -> uniform RGB gray 131.
    Exercises component interleaving, subsampled chroma, upsampling,
    and the YCbCr->RGB convert."""
    sof = _seg(0xC0, bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
               + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht_dc = _dht(0, 0, [2, 2], [5, 0])  # 00 -> cat5, 01 -> cat0 (diff 0)
    dht_ac = _dht(1, 0, [2], [0x00])
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    # Y blocks: +24, 0, 0, 0; Cb: 0; Cr: 0 (cat-0 codes carry no bits)
    entropy = _pack_bits("00 11000 00  01 00  01 00  01 00  01 00  01 00")
    b = b"\xff\xd8" + _dqt_unit() + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    img = decode_jpeg(b)
    assert img.shape == (16, 16, 3)
    assert (img == 131).all()


def test_restart_markers_reset_prediction():
    """Two 8x8 blocks with DRI=1: an RST0 between MCUs resets the DC
    predictor, so both blocks decode as absolute DC 24 -> 131."""
    dri = _seg(0xDD, (1).to_bytes(2, "big"))
    sof = _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    dht_dc = _dht(0, 0, [2], [5])
    dht_ac = _dht(1, 0, [2], [0x00])
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blk = _pack_bits("00 11000 00")
    entropy = blk + b"\xff\xd0" + blk
    b = (b"\xff\xd8" + _dqt_unit() + dri + sof + dht_dc + dht_ac + sos
         + entropy + b"\xff\xd9")
    img = decode_jpeg(b)
    assert (img == 131).all()


def test_refusals():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")  # not a JPEG
    # progressive (SOF2) is refused, never mis-decoded
    sof2 = _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8" + _dqt_unit() + sof2 + b"\xff\xd9")


def test_image_features_end_to_end_jpeg(spark):
    """A JPEG payload flows through the production image_features
    mapInPandas stage with decoded_ok=true and the exact mean luma."""
    from ds2_spark.operators.multimodal import image_features

    sof = _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    dht_dc = _dht(0, 0, [2], [5])
    dht_ac = _dht(1, 0, [2], [0x00])
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    entropy = _pack_bits("00 11000 00")
    b = b"\xff\xd8" + _dqt_unit() + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    df = spark.createDataFrame(
        [("j0", bytearray(b), "image/jpeg"), ("j1", bytearray(b[:20]), "image/jpeg")],
        "media_id string, bytes binary, mime string",
    )
    out = {r["media_id"]: r for r in image_features(df).collect()}
    assert out["j0"]["decoded_ok"] and out["j0"]["mean_luma"] == 131.0
    assert not out["j1"]["decoded_ok"]  # truncated: refused, not crashed


def _avi(frames: list[bytes]) -> bytes:
    """Minimal RIFF-AVI wrapping each payload as a 00dc chunk in a
    movi LIST (word-aligned, as real muxers emit)."""
    body = bytearray()
    for f in frames:
        body += b"00dc" + len(f).to_bytes(4, "little") + f
        if len(f) & 1:
            body += b"\x00"
    movi = b"LIST" + (len(body) + 4).to_bytes(4, "little") + b"movi" + bytes(body)
    riff = b"AVI " + movi
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def test_video_mjpeg_avi_decode():
    """Real video decode: two hand-built JPEG frames (DC-only gray
    131 / 130) muxed into a minimal AVI; decode_video_frame extracts
    and decodes each by index."""
    from ds2_spark.operators.multimodal import decode_video_frame, parse_avi_mjpeg

    sof = _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    dht_dc = _dht(0, 0, [2, 2], [5, 4])
    dht_ac = _dht(1, 0, [2], [0x00])
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    f131 = (b"\xff\xd8" + _dqt_unit() + sof + dht_dc + dht_ac + sos
            + _pack_bits("00 11000 00") + b"\xff\xd9")
    # DC cat5, receive 01001=9 -> extend(9,5) = -22 -> uniform 125ish
    f125 = (b"\xff\xd8" + _dqt_unit() + sof + dht_dc + dht_ac + sos
            + _pack_bits("00 01001 00") + b"\xff\xd9")
    avi = _avi([f131, f125])
    assert len(parse_avi_mjpeg(avi)) == 2
    img0 = decode_video_frame(avi, 0)
    img1 = decode_video_frame(avi, 1)
    assert (img0 == 131).all()
    assert img1.shape == (8, 8, 1) and len(np.unique(img1)) == 1
    assert img0[0, 0, 0] != img1[0, 0, 0]
    with pytest.raises(ValueError):
        decode_video_frame(avi, 2)  # out of range
