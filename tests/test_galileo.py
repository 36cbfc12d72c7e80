"""Galileo E1B tests: FEC, interleaver, I/NAV page codec, acquisition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gps_jamming_tpu.config import AcquisitionConfig
from gps_jamming_tpu.models.receiver import acquisition as acq_mod
from gps_jamming_tpu.models.receiver import galileo as gal
from gps_jamming_tpu.ops import codes as codes_ops
from gps_jamming_tpu.ops import cplx
from gps_jamming_tpu.utils import fec

FS = 2.048e6
N_CODE = 8192                  # 4 ms at 2.048 MS/s


def test_fec_roundtrip_with_errors():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 114)
    sym = fec.encode(bits)
    assert sym.size == 240
    noisy = sym.astype(float)
    idx = rng.choice(240, 10, replace=False)
    noisy[idx] = 1 - noisy[idx]
    assert np.array_equal(fec.viterbi_decode(noisy), bits)


def test_interleaver_roundtrip():
    x = np.arange(240)
    assert np.array_equal(gal.deinterleave(gal.interleave(x)), x)
    assert not np.array_equal(gal.interleave(x), x)


def test_half_page_roundtrip():
    rng = np.random.default_rng(2)
    info = rng.integers(0, 2, 114)
    page = gal.encode_half_page(info)
    assert page.size == 250
    ok, bits = gal.decode_half_page(page)
    assert ok and np.array_equal(bits, info)
    # inverted polarity
    ok2, bits2 = gal.decode_half_page(1 - page)
    assert ok2 and np.array_equal(bits2, info)


def test_nominal_page_crc():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 2, 128)
    even, odd = gal.build_nominal_page(data)
    ok, back = gal.parse_nominal_page(even, odd)
    assert ok and np.array_equal(back, data)
    bad = odd.copy()
    bad[50] ^= 1
    ok2, _ = gal.parse_nominal_page(even, bad)
    assert not ok2


def test_inav_ephemeris_roundtrip():
    eph = gal.Ephemeris(
        prn=11, week=1280, toe=345600.0, toc=345600.0, iode=87,
        sqrt_a=np.sqrt(29_600_000.0), e=0.0002, m0=0.8, delta_n=3e-9,
        omega0=-1.5, omega_dot=-5.6e-9, omega=0.4, i0=0.975, idot=-2e-10,
        cuc=9e-7, cus=8e-6, crc=180.0, crs=25.0, cic=4e-8, cis=-3e-8,
        af0=6e-4, af1=-8e-12, af2=0.0, tgd=2.3e-9, tow_s=345610.0)
    sym = gal.encode_inav_symbols(eph)
    assert sym.size == 5 * 500
    # noisy soft symbols with a random symbol offset
    rng = np.random.default_rng(4)
    stream = np.concatenate([rng.integers(0, 2, 77).astype(float), sym])
    stream = np.clip(stream + rng.normal(0, 0.2, stream.size), 0, 1)
    dec = gal.decode_inav_symbols(stream, prn=11)
    assert gal.inav_complete(dec), dec.have_subframes
    assert dec.iode == 87
    assert dec.week == 1280
    assert abs(dec.sqrt_a - eph.sqrt_a) < 2 ** -19 * 2
    assert abs(dec.m0 - eph.m0) < 2 ** -31 * 3.15 * 2
    assert abs(dec.toe - eph.toe) < 60.0
    assert abs(dec.af0 - eph.af0) < 2 ** -34 * 2
    assert abs(dec.cuc - eph.cuc) < 2 ** -29 * 2
    assert abs(dec.tgd - eph.tgd) < 2 ** -32 * 2
    assert dec.tow_s == 345610.0


def test_inav_words_0_and_6():
    """Word 0 (spare/time) and word 6 (GST-UTC) round-trip through the
    page codec and merge into the ephemeris — full 0-6 coverage of the
    reference's I/NAV decoder (sdrnav_gal.c:20-275), plus the GST->UTC
    conversion the reference omits (it reads only word 6's TOW)."""
    from gps_jamming_tpu.models.receiver.lnav import UtcParams
    utc = UtcParams(a0=-9.3132257e-10, a1=8.881784e-16, dt_ls=18,
                    t0t=432000.0, wn0t=120, wn_lsf=137, dn=7, dt_lsf=18)
    eph = gal.Ephemeris(prn=3, week=1280, tow_s=345602.0, utc=utc)
    sym = gal.encode_inav_symbols(eph, word_types=(0, 6))
    dec = gal.decode_inav_symbols(sym, prn=3)
    assert set(dec.have_subframes) == {0, 6}
    assert dec.week == 1280
    assert dec.tow_s == 345602.0
    assert dec.utc is not None
    assert dec.utc.dt_ls == 18 and dec.utc.dt_lsf == 18
    assert dec.utc.wn0t == 120 and dec.utc.wn_lsf == 137 and dec.utc.dn == 7
    assert dec.utc.t0t == 432000.0
    assert abs(dec.utc.a0 - utc.a0) < 2.0 ** -30
    assert abs(dec.utc.a1 - utc.a1) < 2.0 ** -50
    # GST -> UTC: subtracting the broadcast offset (~dt_ls = 18 s here)
    t_utc = dec.utc.to_utc_seconds(345602.0, week=1280 % 256)
    assert abs((345602.0 - t_utc) - 18.0) < 1e-6


def test_inav_full_word_cycle_0_to_6():
    """A stream carrying every word type 0-6 decodes a complete ephemeris
    plus time and UTC fields in one pass."""
    from gps_jamming_tpu.models.receiver.lnav import UtcParams
    eph = gal.Ephemeris(
        prn=11, week=1280, toe=345600.0, toc=345600.0, iode=87,
        sqrt_a=np.sqrt(29_600_000.0), e=0.0002, m0=0.8, delta_n=3e-9,
        omega0=-1.5, omega_dot=-5.6e-9, omega=0.4, i0=0.975, idot=-2e-10,
        cuc=9e-7, cus=8e-6, crc=180.0, crs=25.0, cic=4e-8, cis=-3e-8,
        af0=6e-4, af1=-8e-12, af2=0.0, tgd=2.3e-9, tow_s=345610.0,
        utc=UtcParams(a0=2e-9, a1=0.0, dt_ls=18, t0t=405000.0, wn0t=121,
                      wn_lsf=137, dn=3, dt_lsf=19))
    sym = gal.encode_inav_symbols(eph, word_types=(0, 1, 2, 3, 4, 5, 6))
    dec = gal.decode_inav_symbols(sym, prn=11)
    assert set(dec.have_subframes) == {0, 1, 2, 3, 4, 5, 6}
    assert gal.inav_complete(dec)
    assert dec.iode == 87 and dec.week == 1280
    assert dec.utc.dt_lsf == 19 and dec.utc.dn == 3


def test_e1b_icd_code_table():
    """The shipped primary codes are the real ICD memory codes.

    Pins the published spec properties (Galileo OS SIS ICD Annex C;
    reference embeds the same table at sdrcode.c:424-490): PRN1 starts
    with hex F5D71013 (chips via logical 0 -> +1), every code is exactly
    balanced, and zero-lag cross-correlation is at the memory-code design
    level (< 0.04), far below anything a wrong/synthetic table gives.
    """
    prefix_hex = 0xF5D71013
    bits = [(prefix_hex >> (31 - i)) & 1 for i in range(32)]
    want = np.array([1 - 2 * b for b in bits], np.int8)
    assert np.array_equal(gal.e1b_code(1)[:32], want)

    table = np.stack([gal.e1b_code(p) for p in range(1, 51)])
    assert table.shape == (50, 4092)
    assert np.array_equal(table.sum(axis=1), np.zeros(50))
    xc = (table @ table.T).astype(np.float64) / 4092.0
    np.fill_diagonal(xc, 0.0)
    assert np.abs(xc).max() < 0.04

    # the old placeholder is NOT the ICD code (and must stay available
    # as an explicitly-synthetic fixture only)
    syn = gal.synthetic_e1b_code(1)
    agree = (syn == table[0]).mean()
    assert 0.4 < agree < 0.6


@pytest.mark.slow
def test_e1b_receiver_rejects_synthetic_rendering():
    """A receiver on the ICD table must not acquire a capture rendered
    with a non-ICD (synthetic) code — guards against the r2 failure mode
    where sim and receiver shared one synthetic table and a code bug
    would cancel out."""
    FS = 4.096e6
    N_CODE = 16384
    prn, dopp, cp = 7, 900.0, 1000.5
    syn_boc = codes_ops.boc11(gal.synthetic_e1b_code(prn))
    code = jnp.asarray(syn_boc, jnp.float32)
    f = gal.BOC_RATE * (1.0 + dopp / 1575.42e6)
    chips = codes_ops.resample_code_bandlimited(code, f, FS, 2 * N_CODE,
                                                rem_chips=cp)
    t = jnp.arange(2 * N_CODE, dtype=jnp.float32) / FS
    osc = cplx.expi(2.0 * jnp.pi * dopp * t)
    x = cplx.to_complex(cplx.scale(osc, chips))
    blocks = x.reshape(2, N_CODE)
    rep = gal.replica_table_host(FS, N_CODE, prns=range(1, 37))
    cfg = AcquisitionConfig(doppler_step_hz=150.0, doppler_max_hz=4500.0)
    res = acq_mod.acquire_all(cplx.from_complex(blocks), rep, FS, cfg,
                              code_period_s=gal.PERIOD_S,
                              code_len_chips=gal.BOC_LEN)
    assert not np.asarray(res.acquired).any()


def test_e1b_acquisition_boc():
    """Acquire two E1B PRNs via the generic CAF with BOC replicas.

    Runs at 4.096 MS/s (2 samples per BOC half-chip): at 2.048 MS/s the
    lag grid is a full half-chip, so a worst-case fractional code phase
    lands mid-way between the BOC correlation main peak and its negative
    side lobe and the peak is unrecoverable at any sample alignment.
    """
    FS = 4.096e6
    N_CODE = 16384                # 4 ms
    prns = [4, 19]
    fcode = gal.BOC_RATE
    sigs = []
    for prn, dopp, cp in [(4, 900.0, 1000.5), (19, -2100.0, 7000.0)]:
        code = jnp.asarray(gal.e1b_boc_code(prn), jnp.float32)
        f = fcode * (1.0 + dopp / 1575.42e6)
        # band-limited synthesis: square-wave BOC sampled raw at 2.048 MS/s
        # aliases its 2.046 MHz doubled-subcarrier line to -2 kHz, which a
        # real front-end filters out before the ADC
        chips = codes_ops.resample_code_bandlimited(code, f, FS, 2 * N_CODE,
                                                    rem_chips=cp)
        t = jnp.arange(2 * N_CODE, dtype=jnp.float32) / FS
        osc = cplx.expi(2.0 * jnp.pi * dopp * t)
        sigs.append(cplx.to_complex(cplx.scale(osc, chips)))
    x = sum(sigs) + 0.4 * (
        jax.random.normal(jax.random.PRNGKey(5), (2 * N_CODE,))
        + 1j * jax.random.normal(jax.random.PRNGKey(6), (2 * N_CODE,)))
    blocks = x.reshape(2, N_CODE)
    rep = gal.replica_table_host(FS, N_CODE, prns=range(1, 37))
    cfg = AcquisitionConfig(doppler_step_hz=150.0, doppler_max_hz=4500.0)
    res = acq_mod.acquire_all(cplx.from_complex(blocks), rep, FS, cfg,
                              code_period_s=gal.PERIOD_S,
                              code_len_chips=gal.BOC_LEN)
    acq = np.asarray(res.acquired)
    dopp = np.asarray(res.doppler_hz)
    assert acq[3] and acq[18], (np.where(acq)[0] + 1)
    assert abs(dopp[3] - 900.0) <= 100.0
    assert abs(dopp[18] + 2100.0) <= 100.0
    # no false PRNs
    others = [i for i in range(36) if i not in (3, 18)]
    assert not acq[others].any()
