"""GLONASS tests: KX parity, GNAV round trip, FDMA batched acquisition."""
import jax
import numpy as np
import pytest

from gps_jamming_tpu.config import AcquisitionConfig
from gps_jamming_tpu.models.receiver import glonass as glo
from gps_jamming_tpu.sim import glo as sim_glo
from gps_jamming_tpu.utils import constants as C

FS = 10e6                      # GLONASS capture rate (sdrinit.c:6-9)
N_CODE = 10000                 # 1 ms at 10 MS/s


def test_kx_roundtrip_and_detection():
    rng = np.random.default_rng(0)
    for _ in range(10):
        d = rng.integers(0, 2, 77)
        s = glo.encode_string(d)
        ok, dec = glo.check_string(s)
        assert ok and np.array_equal(dec, d)
        bad = s.copy()
        bad[int(rng.integers(0, 85))] ^= 1
        assert not glo.check_string(bad)[0]


def test_gnav_eph_roundtrip():
    eph = glo.GloEphemeris(
        freq_ch=3, tb_s=8100.0, tk_s=3 * 3600 + 22 * 60 + 30,
        pos_m=(11_234_567.0, -18_765_432.0, 9_876_543.0),
        vel_mps=(1234.5, -2345.6, 987.2),
        acc_mps2=(1.8e-6, -9.3e-7, 2.7e-6),
        tau_s=-4.56e-5, gamma=1.82e-11)
    strings = glo.encode_eph_strings(eph)
    dec = glo.decode_strings(strings, freq_ch=3)
    assert dec.complete
    assert dec.tb_s == eph.tb_s
    assert dec.tk_s == eph.tk_s
    for i in range(3):
        assert abs(dec.pos_m[i] - eph.pos_m[i]) < glo._POS_SCALE
        assert abs(dec.vel_mps[i] - eph.vel_mps[i]) < glo._VEL_SCALE
        assert abs(dec.acc_mps2[i] - eph.acc_mps2[i]) < glo._ACC_SCALE
    assert abs(dec.tau_s - eph.tau_s) < 2.0 ** -30
    assert abs(dec.gamma - eph.gamma) < 2.0 ** -40


def test_symbols_roundtrip():
    eph = glo.GloEphemeris(pos_m=(1e7, -2e7, 5e6), vel_mps=(100, 200, -300),
                           acc_mps2=(0, 0, 0), tb_s=900.0, tk_s=60.0)
    strings = glo.encode_eph_strings(eph)
    sym = glo.bits_to_symbols(strings)
    back = glo.symbols_to_strings(sym)
    assert len(back) == 4
    dec = glo.decode_strings(back)
    assert dec.complete
    assert dec.tb_s == 900.0


def test_fdma_acquisition():
    """Two FDMA channels acquired at the right channel + Doppler + lag."""
    sigs = [sim_glo.GloSignal(freq_ch=-3, doppler_hz=1500.0,
                              code_phase_chips=123.25),
            sim_glo.GloSignal(freq_ch=4, doppler_hz=-2800.0,
                              code_phase_chips=401.0, amplitude=0.9)]
    n_intg = 4
    x = sim_glo.scene(sigs, n_intg * N_CODE, FS, noise_std=0.4,
                      key=jax.random.PRNGKey(2))
    blocks = x.reshape(n_intg, N_CODE)
    cfg = AcquisitionConfig(doppler_step_hz=250.0)
    res = glo.acquire_all(blocks, FS, cfg)
    acq = np.asarray(res.acquired)
    dopp = np.asarray(res.doppler_hz)
    lag = np.asarray(res.code_phase)
    chans = list(glo.FREQ_CHANNELS)
    for sig in sigs:
        i = chans.index(sig.freq_ch)
        assert acq[i], f"channel {sig.freq_ch} not acquired"
        assert abs(dopp[i] - sig.doppler_hz) <= 150.0
        expect_lag = ((C.GLO_CODE_LEN - sig.code_phase_chips)
                      * FS / C.GLO_CHIP_RATE_HZ) % N_CODE
        err = (lag[i] - expect_lag + N_CODE / 2) % N_CODE - N_CODE / 2
        assert abs(err) <= 3.0, (sig.freq_ch, lag[i], expect_lag)
    # channels without signal must not fire
    silent = [i for i, ch in enumerate(chans)
              if ch not in (-3, 4)]
    assert not acq[silent].any()


def test_fdma_acquisition_pcf_matches_std():
    """The factorized FDMA-PCF search finds the same (channel, lag) as
    the direct per-row search, with Doppler within the PCF grid bias,
    on the same blocks (the ops.caf.caf_accumulate_pcf_fdma contract)."""
    sigs = [sim_glo.GloSignal(freq_ch=-3, doppler_hz=1500.0,
                              code_phase_chips=123.25),
            sim_glo.GloSignal(freq_ch=4, doppler_hz=-2800.0,
                              code_phase_chips=401.0, amplitude=0.9)]
    n_intg = 4
    x = sim_glo.scene(sigs, n_intg * N_CODE, FS, noise_std=0.4,
                      key=jax.random.PRNGKey(2))
    blocks = x.reshape(n_intg, N_CODE)
    cfg = AcquisitionConfig(doppler_step_hz=250.0)
    r_std = glo.acquire_all(blocks, FS, cfg, method="std")
    r_pcf = glo.acquire_all(blocks, FS, cfg, method="pcf")
    chans = list(glo.FREQ_CHANNELS)
    for sig in sigs:
        i = chans.index(sig.freq_ch)
        assert bool(np.asarray(r_std.acquired)[i])
        assert bool(np.asarray(r_pcf.acquired)[i])
        lag_s = float(np.asarray(r_std.code_phase)[i])
        lag_p = float(np.asarray(r_pcf.code_phase)[i])
        err = (lag_p - lag_s + N_CODE / 2) % N_CODE - N_CODE / 2
        assert abs(err) <= 2.0, (sig.freq_ch, lag_s, lag_p)
        d_s = float(np.asarray(r_std.doppler_hz)[i])
        d_p = float(np.asarray(r_pcf.doppler_hz)[i])
        assert abs(d_p - d_s) <= 200.0, (d_s, d_p)
    # the 5 ms coherent PCF grouping must not LOSE either signal and
    # both searches agree on silence elsewhere
    silent = [i for i, ch in enumerate(chans) if ch not in (-3, 4)]
    assert not np.asarray(r_pcf.acquired)[silent].any()
