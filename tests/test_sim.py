"""Simulation library: jammers, GPS baseband, mixing, scenario captures."""
import numpy as np
import jax
import jax.numpy as jnp

from gps_jamming_tpu.ops import iq, pathloss, power
from gps_jamming_tpu.sim import gps, jammers, mix, scenario


FS = 2.048e6


def test_cw_tone_frequency():
    x = np.asarray(jammers.cw(1 << 14, FS, offset_hz=250e3))
    spec = np.abs(np.fft.fft(x))
    f = np.fft.fftfreq(x.size, 1 / FS)
    assert abs(f[np.argmax(spec)] - 250e3) < 200


def test_chirp_sweeps_band():
    x = np.asarray(jammers.chirp(int(FS * 0.5), FS, -400e3, 400e3, 0.5))
    # instantaneous freq at start vs end of sweep
    seg0 = x[:4096]
    seg1 = x[-4096:]
    f = np.fft.fftfreq(4096, 1 / FS)
    f0 = f[np.argmax(np.abs(np.fft.fft(seg0)))]
    f1 = f[np.argmax(np.abs(np.fft.fft(seg1)))]
    assert f0 < -300e3 and f1 > 300e3


def test_pulsed_duty_cycle():
    x = np.asarray(jammers.pulsed(1 << 16, FS, prf_hz=1000.0, duty=0.5))
    on = np.abs(x) > 0.5
    assert 0.45 < on.mean() < 0.55


def test_broadband_is_white():
    x = np.asarray(jammers.broadband(1 << 14, jax.random.PRNGKey(3)))
    p = np.abs(np.fft.fft(x)) ** 2
    # flat-ish spectrum: no bin dominates
    assert p.max() / p.mean() < 30


def test_distance_power_scale_contract():
    # add_jammer_and_mix.py:86-95 with range=20 -> ref=10
    s_near = float(mix.distance_power_scale(5.0, 20.0))
    s_mid = float(mix.distance_power_scale(15.0, 20.0))
    s_far = float(mix.distance_power_scale(25.0, 20.0))
    np.testing.assert_allclose(s_near, 0.605, rtol=1e-6)
    np.testing.assert_allclose(s_mid, 0.605 * 10 / 15, rtol=1e-6)
    assert s_far == 0.0


def test_inject_static_window():
    n = int(FS * 0.01)
    g = jnp.zeros(n, dtype=jnp.complex64)
    j = jammers.cw(n, FS, offset_hz=100e3)
    out = np.asarray(mix.inject_static(g, j, FS, delay_s=0.004, duration_s=0.003,
                                       power_scale=2.0))
    a, b = int(0.004 * FS), int(0.007 * FS)
    assert np.all(np.abs(out[:a - 1]) == 0)
    assert np.all(np.abs(out[b + 1:]) == 0)
    np.testing.assert_allclose(np.abs(out[a + 10:b - 10]), 2.0, rtol=1e-4)


def test_weaken_scales_and_noises():
    sig = jnp.full(10000, 8.0 + 0.0j, dtype=jnp.complex64)
    out = np.asarray(mix.weaken(sig, 0.125, 6.25, jax.random.PRNGKey(0)))
    assert abs(np.mean(np.real(out)) - 1.0) < 0.3
    assert abs(np.std(np.real(out)) - 6.25) < 0.3


def test_trajectory_power_profile_interpolates():
    d = jnp.asarray(np.array([5.0, 15.0], dtype=np.float32))
    prof = np.asarray(mix.trajectory_power_profile(d, 4, 20.0))
    assert prof.shape == (8,)
    np.testing.assert_allclose(prof[0], 0.605, rtol=1e-5)
    assert prof[0] > prof[3] > prof[4] - 1e-6
    np.testing.assert_allclose(prof[4:], 0.605 * 10 / 15, rtol=1e-5)


def test_gps_baseband_acquirable():
    """A simulated C/A signal must correlate against its own code replica."""
    from gps_jamming_tpu.ops import codes as codes_ops, caf
    n = 2048
    sat = gps.SatelliteSignal(prn=5, doppler_hz=1000.0, code_phase_chips=200.0)
    x = gps.ca_baseband(sat, n, FS)
    rep = codes_ops.sampled_code_fft_conj(codes_ops.gps_ca_table()[4:5], 1.023e6, FS, n)
    freqs = jnp.asarray(caf.doppler_bins(7000.0, 200.0))
    surf = np.asarray(caf.caf_surface(jnp.asarray(x), rep, freqs, FS))[0]
    fi, li = np.unravel_index(np.argmax(surf), surf.shape)
    assert abs(float(freqs[fi]) - 1000.0) <= 200.0
    # code phase 200 chips -> lag in samples = 200 * fs/chiprate
    expect_lag = (1023 - 200.0) * FS / 1.023e6 % n
    assert min(abs(li - expect_lag), n - abs(li - expect_lag)) < 4


def test_scenario_capture_rssi_consistency(tmp_path):
    """Scenario amplitude must invert to the true distance via the path-loss
    model (the property the RSSI localizer relies on)."""
    scn = scenario.JammerScenario(kind="cw", position_m=(8.0, 0.0),
                                  start_s=0.0, duration_s=0.01)
    cap = scenario.render_antenna_capture(scn, (0.0, 0.0), int(FS * 0.01), FS,
                                          noise_std=0.0)
    amp_norm = np.mean(np.abs(np.asarray(cap))) / 127.5
    prx = pathloss.received_power_db(amp_norm)
    d = float(pathloss.invert_distance_m(prx, 40.0, 3.0, 1575.42))
    np.testing.assert_allclose(d, 8.0, rtol=0.15)


def test_write_capture_set(tmp_path):
    scn = scenario.JammerScenario(position_m=(5.0, 5.0), start_s=0.001,
                                  duration_s=0.005)
    paths = [str(tmp_path / f"ant{i}.bin") for i in range(2)]
    scenario.write_capture_set(scn, [(0, 0), (0.5, 0)], paths,
                               n_samples=int(FS * 0.01), noise_std=2.0)
    for p in paths:
        x = iq.read_iq_file(p)
        assert x.size == int(FS * 0.01)
