"""FLAC subset decoder tests.

Streams are HAND-PACKED with a test-side bit writer (no encoder
exists in this container, and an encoder written from the same
understanding could self-confirm a decoder bug). Every case's decoded
output is derivable on paper: CONSTANT frames decode to the literal
warmup value, VERBATIM to the literal sample list, FIXED/LPC cases
are reconstructed in the test by an INDEPENDENT formulation
(np.cumsum integration for fixed predictors) rather than by re-running
the decoder's recurrence. CRC-8/CRC-16 implementations are pinned to
published check values first, then reused for packing."""

import numpy as np
import pytest

from ds2_spark.operators.flac import (
    _crc8,
    _crc16,
    decode_flac,
    decode_flac_int,
    parse_streaminfo,
)


class _BitWriter:
    """MSB-first bit packer (the dual of the decoder's reader, but
    write-side only — no shared code)."""

    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def write_signed(self, value, n):
        return self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q):
        self.bits.extend([0] * q + [1])
        return self

    def write_rice(self, value, param):
        # zigzag: n>=0 -> 2n, n<0 -> -2n-1
        u = 2 * value if value >= 0 else -2 * value - 1
        self.write_unary(u >> param)
        if param:
            self.write(u & ((1 << param) - 1), param)
        return self

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def tobytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def _streaminfo(sr=8000, channels=1, bits=16, total=0):
    w = _BitWriter()
    w.write(16, 16).write(16, 16)      # min/max blocksize
    w.write(0, 24).write(0, 24)        # min/max framesize
    w.write(sr, 20)
    w.write(channels - 1, 3)
    w.write(bits - 1, 5)
    w.write(total, 36)
    body = w.tobytes() + bytes(16)     # md5 = zeros
    hdr = bytes([0x80]) + len(body).to_bytes(3, "big")  # last-block, type 0
    return b"fLaC" + hdr + body


def _frame(subframe_bits, blocksize, channels=1, ch_code=None, frame_no=0):
    """Frame header (8-bit blocksize-at-end code 0110, sample-rate
    code 0000 = streaminfo, sample-size 0 = streaminfo) + subframes +
    CRCs."""
    w = _BitWriter()
    w.write(0x3FFE, 14).write(0, 1).write(0, 1)
    w.write(6, 4)                      # blocksize: 8-bit at end
    w.write(0, 4)                      # sample rate: from streaminfo
    w.write(ch_code if ch_code is not None else channels - 1, 4)
    w.write(0, 3).write(0, 1)          # sample size: from streaminfo
    assert frame_no < 0x80
    w.write(frame_no, 8)               # coded number, 1 byte
    w.write(blocksize - 1, 8)
    head = w.tobytes()
    head += bytes([_crc8(head)])
    body = _BitWriter()
    for sb in subframe_bits:
        body.bits.extend(sb.bits)
    body.align()
    raw = head + body.tobytes()
    return raw + _crc16(raw).to_bytes(2, "big")


def _sub_constant(value, bps=16):
    w = _BitWriter()
    w.write(0, 1).write(0, 6).write(0, 1)  # pad, type CONSTANT, no wasted
    w.write_signed(value, bps)
    return w


def _sub_verbatim(values, bps=16):
    w = _BitWriter()
    w.write(0, 1).write(1, 6).write(0, 1)
    for v in values:
        w.write_signed(v, bps)
    return w


def _sub_fixed(order, warmup, residuals, param, bps=16, porder=0,
               params=None, wasted=0):
    w = _BitWriter()
    w.write(0, 1).write(8 + order, 6)
    if wasted:
        w.write(1, 1).write_unary(wasted - 1)
    else:
        w.write(0, 1)
    for v in warmup:
        w.write_signed(v, bps - wasted)
    w.write(0, 2)                      # rice method, 4-bit params
    w.write(porder, 4)
    nparts = 1 << porder
    n = len(warmup) + len(residuals)
    k = 0
    for p in range(nparts):
        count = (n >> porder) - (order if p == 0 else 0)
        pp = params[p] if params else param
        w.write(pp, 4)
        if pp == 15:                   # escape: 5-bit width then raw
            w.write(9, 5)
            for v in residuals[k : k + count]:
                w.write_signed(v, 9)
        else:
            for v in residuals[k : k + count]:
                w.write_rice(v, pp)
        k += count
    return w


def test_crc_published_check_values():
    """CRC-8 poly 0x07 and CRC-16 poly 0x8005 (no reflection, init 0)
    over '123456789' — published check values, independent of any
    stream we pack."""
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_constant_and_verbatim_frames():
    vals = [0, 1, -1, 100, -100, 32767, -32768, 7]
    stream = (
        _streaminfo(total=16)
        + _frame([_sub_constant(-1234)], 8, frame_no=0)
        + _frame([_sub_verbatim(vals)], 8, frame_no=1)
    )
    pcm = decode_flac_int(stream)
    assert pcm.tolist() == [-1234] * 8 + vals
    info = parse_streaminfo(stream)
    assert info["sr_hz"] == 8000 and info["bits"] == 16
    f = decode_flac(stream)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f[:8], -1234 / 32767.0, rtol=0, atol=1e-7)


def test_fixed_orders_match_cumsum_integration():
    """FIXED order-k reconstruction == k-fold np.cumsum integration of
    the residuals seeded by the warmup's difference pyramid — an
    independent derivation of the same predictor (the decoder runs the
    recurrence x[i] = sum(binom coefs) + r; integration composes
    cumsum)."""
    rng = np.random.default_rng(5)
    for order in (1, 2, 3, 4):
        warm = [int(v) for v in rng.integers(-100, 100, size=order)]
        res = [int(v) for v in rng.integers(-6, 7, size=16 - order)]
        stream = _streaminfo(total=16) + _frame(
            [_sub_fixed(order, warm, res, param=3)], 16
        )
        got = decode_flac_int(stream)
        # independent reconstruction: k-fold difference of the warmup
        # gives the integrator seeds; integrate residuals back up
        seq = np.array(warm, dtype=np.int64)
        diffs = []
        d = seq
        for _ in range(order):
            diffs.append(d[0])
            d = np.diff(d)
        x = np.array(res, dtype=np.int64)
        for k in range(order - 1, -1, -1):
            x = np.concatenate([[diffs[k]], x]).cumsum()
        assert got.tolist() == x.tolist(), f"order {order}"


def test_rice_partitions_and_escape():
    """Partition order 1 (two partitions with different parameters)
    and a raw-escape partition decode exactly."""
    warm = [10]
    res = [3, -2, 0, 5, -100, 90, -7, 1, 2, 3, -4, 5, -6, 7, -8]
    stream = _streaminfo(total=16) + _frame(
        [_sub_fixed(1, warm, res, param=None, porder=1, params=[2, 15])], 16
    )
    got = decode_flac_int(stream)
    exp = np.concatenate([[10], res]).cumsum()
    assert got.tolist() == exp.tolist()


def test_lpc_subframe():
    """LPC order 2, coefs [3, -1], shift 1: x[i] = ((3*x[i-1] -
    x[i-2]) >> 1) + r — recomputed in the test with plain ints."""
    warm = [100, 90]
    res = [1, -1, 2, 0, -3, 4, 1, 0, -2, 5, -1, 2, 0, 1]
    w = _BitWriter()
    w.write(0, 1).write(32 + 1, 6).write(0, 1)  # LPC order 2
    for v in warm:
        w.write_signed(v, 16)
    w.write(4, 4)                      # precision-1 -> 5 bits
    w.write_signed(1, 5)               # shift
    w.write_signed(3, 5).write_signed(-1, 5)
    w.write(0, 2).write(0, 4).write(3, 4)
    for v in res:
        w.write_rice(v, 3)
    stream = _streaminfo(total=16) + _frame([w], 16)
    got = decode_flac_int(stream)
    x = list(warm)
    for r in res:
        x.append(((3 * x[-1] - 1 * x[-2]) >> 1) + r)
    assert got.tolist() == x


def test_wasted_bits_shift():
    """wasted_bits=2: samples are coded at bps-2 and shifted left 2
    on output."""
    stream = _streaminfo(total=8) + _frame(
        [_sub_fixed(0, [], [5, -3, 0, 7, -8, 1, 2, -1], param=3, wasted=2)], 8
    )
    got = decode_flac_int(stream)
    assert got.tolist() == [20, -12, 0, 28, -32, 4, 8, -4]


def test_stereo_assignments_average_to_mono():
    """Independent stereo + all three decorrelated assignments decode
    and average to mono. left/side: ch1 = L - side; mid/side uses the
    spec's (mid<<1 | side&1) reconstruction."""
    L = [100, 102, 104, 106, 108, 110, 112, 114]
    R = [20, 19, 18, 17, 16, 15, 14, 13]
    exp_mono = [(l + r) // 2 for l, r in zip(L, R)]  # all sums positive

    # independent channels (ch_code = 1 means 2 channels)
    s = _streaminfo(channels=2, total=8) + _frame(
        [_sub_verbatim(L), _sub_verbatim(R)], 8, ch_code=1
    )
    assert decode_flac_int(s).tolist() == exp_mono

    # left/side (ch_code 8): side = L - R, 17 bits
    side = [l - r for l, r in zip(L, R)]
    s = _streaminfo(channels=2, total=8) + _frame(
        [_sub_verbatim(L), _sub_verbatim(side, bps=17)], 8, ch_code=8
    )
    assert decode_flac_int(s).tolist() == exp_mono

    # right/side (ch_code 9): first subframe is side (17 bits)
    s = _streaminfo(channels=2, total=8) + _frame(
        [_sub_verbatim(side, bps=17), _sub_verbatim(R)], 8, ch_code=9
    )
    assert decode_flac_int(s).tolist() == exp_mono

    # mid/side (ch_code 10): mid = (L+R)>>1, side 17 bits
    mid = [(l + r) >> 1 for l, r in zip(L, R)]
    s = _streaminfo(channels=2, total=8) + _frame(
        [_sub_verbatim(mid), _sub_verbatim(side, bps=17)], 8, ch_code=10
    )
    assert decode_flac_int(s).tolist() == exp_mono


def test_multi_frame_and_total_samples_truncation():
    """Two frames concatenate; STREAMINFO total_samples truncates the
    tail (a last partial block padded up by the encoder)."""
    stream = (
        _streaminfo(total=12)
        + _frame([_sub_constant(5)], 8, frame_no=0)
        + _frame([_sub_constant(-5)], 8, frame_no=1)
    )
    got = decode_flac_int(stream)
    assert got.tolist() == [5] * 8 + [-5] * 4


def test_eight_bit_stream():
    stream = _streaminfo(bits=8, total=4) + _frame(
        [_sub_verbatim([7, -8, 127, -128], bps=8)], 4
    )
    assert decode_flac_int(stream).tolist() == [7, -8, 127, -128]
    f = decode_flac(stream)
    # 8-bit full scale maps onto the 16-bit grid (x256)
    np.testing.assert_allclose(
        f, np.array([7, -8, 127, -128], np.float32) * 256 / 32767.0,
        rtol=0, atol=1e-7,
    )


def test_refusals_are_loud():
    """Garbage, PCM16-tagged-as-flac, corrupt CRC, truncated stream,
    reserved subframe type: all raise ValueError (-> decoded_ok=false
    upstream), never garbage output."""
    with pytest.raises(ValueError):
        decode_flac_int(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_flac_int(np.arange(100, dtype="<i2").tobytes())  # PCM16
    good = _streaminfo(total=8) + _frame([_sub_constant(1)], 8)
    bad_crc = bytearray(good)
    bad_crc[-1] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac_int(bytes(bad_crc))
    with pytest.raises(ValueError):
        decode_flac_int(good[:-6])
    # reserved subframe type 2
    w = _BitWriter()
    w.write(0, 1).write(2, 6).write(0, 1).write_signed(0, 16)
    with pytest.raises(ValueError):
        decode_flac_int(_streaminfo(total=8) + _frame([w], 8))


def test_registry_integration(spark):
    """A real FLAC payload decodes through the generic Spark stages;
    a PCM16 payload tagged flac refuses by default and still decodes
    under the fixture alias (both pre-existing behaviors pinned)."""
    from ds2_spark.operators.audio import (
        FIXTURE_PCM16_ALIASES,
        audio_codec_energy,
        audio_sanity,
        audio_sanity_fast,
        decode_pcm,
    )

    vals = [0, 500, -500, 1000, -1000, 250, -250, 125]
    flac_real = _streaminfo(total=8) + _frame([_sub_verbatim(vals)], 8)
    pcm16 = np.array(vals, dtype="<i2").tobytes()
    df = spark.createDataFrame(
        [
            ("real", bytearray(flac_real), 8000, 1, "flac"),
            ("alias", bytearray(pcm16), 8000, 1, "flac"),
        ],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    san = {r["clip_id"]: r for r in audio_sanity(df).collect()}
    assert san["real"]["pcm_ok"] and san["real"]["n_samples"] == 8
    assert not san["alias"]["pcm_ok"]  # not a FLAC stream
    # fast path: variable-rate codec is not metadata-checkable
    fast = {r["clip_id"]: r["pcm_ok"] for r in audio_sanity_fast(df).collect()}
    assert fast == {"real": False, "alias": False}
    # fixture alias overrides: PCM16 payload decodes, real FLAC fails
    san2 = {r["clip_id"]: r for r in
            audio_sanity(df, pcm16_alias_codecs=FIXTURE_PCM16_ALIASES).collect()}
    assert san2["alias"]["pcm_ok"] and san2["alias"]["n_samples"] == 8
    en = {r["clip_id"]: r for r in audio_codec_energy(df).collect()}
    assert en["real"]["decoded_ok"]
    assert en["real"]["abs_energy"] == sum(abs(v) for v in vals)
    assert en["real"]["max_abs"] == 1000
    assert not en["alias"]["decoded_ok"]
    dec = {r["clip_id"]: r["pcm"] for r in decode_pcm(df).collect()}
    np.testing.assert_allclose(
        np.array(dec["real"], np.float32),
        np.array(vals, np.float32) / 32767.0, rtol=0, atol=1e-7,
    )
    assert dec["alias"] == []


def test_lpc_high_order_random_coefficients():
    """LPC order 8 with random 12-bit coefficients and a nonzero
    shift: the decoder's recurrence is recomputed in the test with
    plain Python ints (arbitrary precision — would catch any int32
    truncation in the accumulator)."""
    rng = np.random.default_rng(23)
    order = 8
    warm = [int(v) for v in rng.integers(-2000, 2000, size=order)]
    coefs = [int(v) for v in rng.integers(-2048, 2048, size=order)]
    res = [int(v) for v in rng.integers(-30, 30, size=32 - order)]
    shift = 11
    w = _BitWriter()
    w.write(0, 1).write(32 + order - 1, 6).write(0, 1)
    for v in warm:
        w.write_signed(v, 16)
    w.write(12 - 1, 4)
    w.write_signed(shift, 5)
    for c in coefs:
        w.write_signed(c, 12)
    w.write(0, 2).write(0, 4).write(5, 4)
    for r in res:
        w.write_rice(r, 5)
    stream = _streaminfo(total=32) + _frame([w], 32)
    got = decode_flac_int(stream)
    x = list(warm)
    for r in res:
        acc = sum(c * x[-1 - j] for j, c in enumerate(coefs))
        x.append((acc >> shift) + r)
    assert got.tolist() == x


def test_blocksize_16bit_code_and_uncommon_table_sizes():
    """The 16-bit blocksize-at-end header code (0111) and table-coded
    blocksizes decode; a frame whose declared blocksize disagrees
    with the subframe bit budget raises instead of desynchronizing."""
    vals = [int(v) for v in np.arange(-96, 96)]  # 192 samples
    # table code 0001 = 192
    w = _BitWriter()
    w.write(0x3FFE, 14).write(0, 1).write(0, 1)
    w.write(1, 4).write(0, 4).write(0, 4).write(0, 3).write(0, 1)
    w.write(0, 8)
    head = w.tobytes()
    head += bytes([_crc8(head)])
    body = _BitWriter()
    body.bits.extend(_sub_verbatim(vals).bits)
    body.align()
    raw = head + body.tobytes()
    stream = _streaminfo(total=192) + raw + _crc16(raw).to_bytes(2, "big")
    assert decode_flac_int(stream).tolist() == vals

    # 16-bit blocksize-1 code (0111)
    vals2 = [7, -7, 300, -300]
    w = _BitWriter()
    w.write(0x3FFE, 14).write(0, 1).write(0, 1)
    w.write(7, 4).write(0, 4).write(0, 4).write(0, 3).write(0, 1)
    w.write(0, 8)
    w.write(len(vals2) - 1, 16)
    head = w.tobytes()
    head += bytes([_crc8(head)])
    body = _BitWriter()
    body.bits.extend(_sub_verbatim(vals2).bits)
    body.align()
    raw = head + body.tobytes()
    stream = _streaminfo(total=4) + raw + _crc16(raw).to_bytes(2, "big")
    assert decode_flac_int(stream).tolist() == vals2
