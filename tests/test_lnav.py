"""LNAV encode/decode round-trip tests (parity, preamble, ephemeris fields)."""
import numpy as np
import pytest

from gps_jamming_tpu.models.receiver import lnav


def _test_eph():
    return lnav.Ephemeris(
        prn=12, week=340, toc=345600.0, af0=4.56e-4, af1=-2.27e-12, af2=0.0,
        tgd=-1.02e-8, iodc=0x155, ura=2, health=0,
        iode=0x55, toe=345600.0, sqrt_a=5153.72, e=0.0123,
        m0=1.2345, delta_n=4.5e-9, omega0=-2.1, omega_dot=-8.1e-9,
        omega=0.9876, i0=0.958, idot=-3.2e-10,
        cuc=1.2e-6, cus=7.8e-6, crc=221.5, crs=-87.25,
        cic=-6.0e-8, cis=1.1e-7)


def test_word_parity_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        data = rng.integers(0, 2, 24)
        d29, d30 = int(rng.integers(0, 2)), int(rng.integers(0, 2))
        word = lnav.encode_word(data, d29, d30)
        ok, dec = lnav.check_word(word, d29, d30)
        assert ok
        assert np.array_equal(dec, data)
        # flipping any bit breaks parity
        bad = word.copy()
        bad[int(rng.integers(0, 30))] ^= 1
        ok_bad, _ = lnav.check_word(bad, d29, d30)
        assert not ok_bad


def test_subframe_chain_parity():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 2, (10, 24))
    sf = lnav.encode_subframe(words, 0, 0)
    ok, data = lnav.check_subframe(sf, 0, 0)
    assert ok
    assert np.array_equal(data, words)


def test_pack_unpack():
    assert lnav.unpack_u(lnav.pack_bits(12345, 17)) == 12345
    assert lnav.unpack_s(lnav.pack_bits(-5 & 0xFF, 8)) == -5
    assert lnav.unpack_s(lnav.pack_bits(100, 8)) == 100


def test_frame_encode_decode_roundtrip():
    eph = _test_eph()
    bits = lnav.encode_frames(eph, start_tow_s=345600.0, n_subframes=3)
    assert bits.size == 900
    dec = lnav.decode_bits(bits, prn=12)
    assert dec.complete, dec.have_subframes
    # quantized round trip: fields match within one LSB of their scale
    assert dec.week == eph.week
    assert dec.iodc == eph.iodc
    assert dec.iode == eph.iode
    assert abs(dec.toe - eph.toe) < 16.0
    assert abs(dec.toc - eph.toc) < 16.0
    assert abs(dec.sqrt_a - eph.sqrt_a) < 2.0 ** -19 * 2
    assert abs(dec.e - eph.e) < 2.0 ** -33 * 2
    assert abs(dec.m0 - eph.m0) < 2.0 ** -31 * 3.15 * 2
    assert abs(dec.omega0 - eph.omega0) < 2.0 ** -31 * 3.15 * 2
    assert abs(dec.omega - eph.omega) < 2.0 ** -31 * 3.15 * 2
    assert abs(dec.i0 - eph.i0) < 2.0 ** -31 * 3.15 * 2
    assert abs(dec.delta_n - eph.delta_n) < 2.0 ** -43 * 3.15 * 2
    assert abs(dec.omega_dot - eph.omega_dot) < 2.0 ** -43 * 3.15 * 2
    assert abs(dec.idot - eph.idot) < 2.0 ** -43 * 3.15 * 2
    assert abs(dec.af0 - eph.af0) < 2.0 ** -31 * 2
    assert abs(dec.af1 - eph.af1) < 2.0 ** -43 * 2
    assert abs(dec.crc - eph.crc) < 2.0 ** -5 * 2
    assert abs(dec.crs - eph.crs) < 2.0 ** -5 * 2
    assert abs(dec.cuc - eph.cuc) < 2.0 ** -29 * 2
    assert abs(dec.cus - eph.cus) < 2.0 ** -29 * 2
    assert abs(dec.cic - eph.cic) < 2.0 ** -29 * 2
    assert abs(dec.cis - eph.cis) < 2.0 ** -29 * 2
    assert abs(dec.tgd - eph.tgd) < 2.0 ** -31 * 2
    # TOW of the last decoded subframe (sf3 starts at 345612)
    assert dec.tow_s == 345612.0


def test_decode_with_offset_and_inverted_polarity():
    eph = _test_eph()
    bits = lnav.encode_frames(eph, start_tow_s=0.0, n_subframes=4)
    rng = np.random.default_rng(2)
    lead = rng.integers(0, 2, 37)
    stream = np.concatenate([lead, bits])
    dec = lnav.decode_bits(stream ^ 1, prn=3)      # inverted polarity
    assert dec.complete
    assert dec.week == eph.week
    assert abs(dec.sqrt_a - eph.sqrt_a) < 2.0 ** -19 * 2


def test_find_preamble_rejects_random():
    rng = np.random.default_rng(3)
    # random bits: double-preamble coincidence at 300-bit spacing is rare
    bits = rng.integers(0, 2, 700)
    cands = lnav.find_preamble(bits)
    eph = _test_eph()
    good = lnav.encode_frames(eph, 0.0, 2)
    assert 0 in lnav.find_preamble(good)


def test_subframe4_page18_iono_utc_roundtrip():
    """Subframe 4 page 18: Klobuchar iono + UTC parameters decode from the
    page bits (beyond the reference, which reads only the ToW of
    subframes 4/5 — sdrnav_gps.c:71-77)."""
    eph = lnav.Ephemeris(prn=5, week=300)
    eph.iono = lnav.IonoParams(
        alpha=(1.1176e-8, -7.45e-9, -5.96e-8, 1.19e-7),
        beta=(90112.0, -32768.0, -196608.0, 196608.0))
    eph.utc = lnav.UtcParams(a0=-9.31e-10, a1=8.88e-16, dt_ls=18,
                             t0t=405504.0, wn0t=44, wn_lsf=137, dn=7,
                             dt_lsf=18)
    bits = lnav.encode_frames(eph, 345600.0, 5, cycle=(1, 2, 3, 4, 5))
    dec, _ = lnav.decode_stream(bits, prn=5)
    # (subframe 5 carries no almanac here -> empty page, not recorded)
    assert 4 in dec.have_subframes
    assert dec.iono is not None and dec.utc is not None
    for k in range(4):
        assert abs(dec.iono.alpha[k] - eph.iono.alpha[k]) <= 2.0 ** -24
        assert abs(dec.iono.beta[k] - eph.iono.beta[k]) <= 2.0 ** 16
    assert dec.utc.dt_ls == 18 and dec.utc.dn == 7 and dec.utc.wn_lsf == 137
    assert abs(dec.utc.a0 - eph.utc.a0) <= 2.0 ** -30
    assert abs(dec.utc.a1 - eph.utc.a1) <= 2.0 ** -50
    assert dec.utc.t0t == 405504.0 and dec.utc.wn0t == 44
    # leap-second application
    t_utc = dec.utc.to_utc_seconds(405504.0, week=300 % 256)
    assert abs((405504.0 - t_utc) - 18.0) < 1e-6


def test_subframe5_almanac_pages_roundtrip():
    """Subframe 5 almanac pages: per-PRN entries decode and accumulate."""
    eph = lnav.Ephemeris(prn=5, week=300)
    eph.almanac[7] = lnav.AlmanacEntry(
        prn=7, e=0.009, toa=319488.0, delta_i=0.02, omega_dot=-8.1e-9,
        health=0, sqrt_a=5153.5, omega0=1.1, omega=-2.0, m0=0.7,
        af0=3e-5, af1=4e-11)
    eph.almanac[9] = lnav.AlmanacEntry(
        prn=9, e=0.002, toa=319488.0, delta_i=-0.01, omega_dot=-7.9e-9,
        health=63, sqrt_a=5153.7, omega0=-0.4, omega=2.4, m0=-1.3,
        af0=-2e-5, af1=0.0)
    # 10 subframes of 1..5 cycle -> sf5 appears twice -> both alm pages
    bits = lnav.encode_frames(eph, 345600.0, 10, cycle=(1, 2, 3, 4, 5))
    dec, _ = lnav.decode_stream(bits, prn=5)
    assert sorted(dec.almanac) == [7, 9]
    for prn in (7, 9):
        a, w = dec.almanac[prn], eph.almanac[prn]
        assert a.prn == prn and a.health == w.health
        assert abs(a.e - w.e) <= 2.0 ** -21
        assert a.toa == w.toa
        assert abs(a.delta_i - w.delta_i) <= 2.0 ** -19 * 3.15
        assert abs(a.sqrt_a - w.sqrt_a) <= 2.0 ** -11
        assert abs(a.omega0 - w.omega0) <= 2.0 ** -23 * 3.15
        assert abs(a.m0 - w.m0) <= 2.0 ** -23 * 3.15
        assert abs(a.af0 - w.af0) <= 2.0 ** -20
        assert abs(a.af1 - w.af1) <= 2.0 ** -38
