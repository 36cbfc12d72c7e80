"""Fused Pallas CAF kernel vs the XLA reference path (interpret mode on CPU).

The kernel's permuted-frequency Cooley-Tukey factorization, host-permuted
replica table, and non-coherent grid accumulation must reproduce
`caf.caf_accumulate` (itself validated against numpy in test_corr/test_sim).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gps_jamming_tpu.ops import caf, cplx, pallas_caf

FS = 2.048e6


def _case(n, n_blocks, n_prn, n_freq, seed=0):
    rng = np.random.default_rng(seed)
    x = cplx.CArray(
        jnp.asarray(rng.standard_normal((n_blocks, n)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((n_blocks, n)).astype(np.float32)))
    rep_c = rng.standard_normal((n_prn, n)) + 1j * rng.standard_normal(
        (n_prn, n))
    rep_host = cplx.CArray(np.real(rep_c).astype(np.float32),
                           np.imag(rep_c).astype(np.float32))
    freqs = caf.doppler_bins(2000.0, 500.0)[:n_freq]
    return x, rep_host, freqs


def _xla_ref(x, rep_host, freqs):
    rep = cplx.CArray(jnp.asarray(rep_host.re), jnp.asarray(rep_host.im))
    return np.asarray(
        jnp.sum(caf.caf_surface(x, rep, jnp.asarray(freqs), FS), axis=0))


def test_factorization():
    assert pallas_caf.factorization(2048) == (16, 128)
    assert pallas_caf.factorization(256) == (2, 128)
    assert pallas_caf.factorization(16384) == (128, 128)
    assert pallas_caf.factorization(10000) is None
    assert not pallas_caf.supported(10000)
    assert pallas_caf.supported(4096)


@pytest.mark.parametrize("freq_tile", [1, 2, 4])
def test_fused_matches_xla(freq_tile):
    x, rep, freqs = _case(n=256, n_blocks=3, n_prn=4, n_freq=5)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused(
        x, rep, freqs, FS, freq_tile=freq_tile, interpret=True))
    assert got.shape == ref.shape == (4, 5, 256)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 1e-4


def test_fused_padding_slices_extra_bins():
    # n_freq=5 with freq_tile=4 pads to 8 internally; output must be (C,5,n)
    x, rep, freqs = _case(n=256, n_blocks=2, n_prn=3, n_freq=5, seed=1)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused(
        x, rep, freqs, FS, freq_tile=4, interpret=True))
    assert got.shape == (3, 5, 256)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 1e-4


def test_fused_bf16_close():
    x, rep, freqs = _case(n=256, n_blocks=2, n_prn=3, n_freq=3, seed=2)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused(
        x, rep, freqs, FS, precision="bf16", freq_tile=1, interpret=True))
    # bf16 operands, f32 accumulation: ~1% on a power surface
    assert np.max(np.abs(got - ref)) / np.max(ref) < 0.05


def test_fused_peak_detection_parity():
    """A buried replica must produce the same (prn, doppler, lag) peak."""
    n, nb = 256, 4
    rng = np.random.default_rng(3)
    rep_c = np.sign(rng.standard_normal((3, n))) + 0j    # chip-like codes
    rep_fft_conj = np.conj(np.fft.fft(rep_c, axis=-1))
    rep = cplx.CArray(np.real(rep_fft_conj).astype(np.float32),
                      np.imag(rep_fft_conj).astype(np.float32))
    freqs = caf.doppler_bins(2000.0, 1000.0)             # 5 bins
    true_lag, true_f, prn = 37, 1000.0, 1
    t = np.arange(n) / FS
    sig = np.roll(rep_c[prn], true_lag) * np.exp(2j * np.pi * true_f * t)
    blocks = np.tile(sig, (nb, 1))
    blocks = blocks + 0.1 * (rng.standard_normal((nb, n))
                             + 1j * rng.standard_normal((nb, n)))
    x = cplx.CArray(jnp.asarray(np.real(blocks).astype(np.float32)),
                    jnp.asarray(np.imag(blocks).astype(np.float32)))
    surf = np.asarray(pallas_caf.caf_accumulate_fused(
        x, rep, freqs, FS, freq_tile=2, interpret=True))
    c, f, lag = np.unravel_index(np.argmax(surf), surf.shape)
    assert (c, freqs[f], lag) == (prn, true_f, true_lag)


def test_factorization_v2():
    assert pallas_caf.factorization_v2(2048) == (16, 128)
    assert pallas_caf.factorization_v2(256) == (2, 128)
    assert pallas_caf.factorization_v2(128) == (1, 128)
    assert pallas_caf.factorization_v2(10000) is None
    assert pallas_caf.supported_v2(4096)


@pytest.mark.parametrize("freq_tile", [1, 2, 4])
def test_fused_v2_matches_xla(freq_tile):
    x, rep, freqs = _case(n=256, n_blocks=3, n_prn=4, n_freq=5)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused_v2(
        x, rep, freqs, FS, freq_tile=freq_tile, interpret=True))
    assert got.shape == ref.shape == (4, 5, 256)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 1e-4


def test_fused_v2_padding_slices_extra_bins():
    x, rep, freqs = _case(n=256, n_blocks=2, n_prn=3, n_freq=5, seed=1)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused_v2(
        x, rep, freqs, FS, freq_tile=4, interpret=True))
    assert got.shape == (3, 5, 256)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 1e-4


def test_fused_v2_bf16_close():
    x, rep, freqs = _case(n=256, n_blocks=2, n_prn=3, n_freq=3, seed=2)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused_v2(
        x, rep, freqs, FS, precision="bf16", freq_tile=1, interpret=True))
    assert np.max(np.abs(got - ref)) / np.max(ref) < 0.05


@pytest.mark.parametrize("freq_tile", [1, 2, 4])
def test_fused_v3_matches_xla(freq_tile):
    # n=256 -> (n1=2, n2=128); n_prn=4 pads to cp=64*...: C'*2 % 128 -> 64
    x, rep, freqs = _case(n=256, n_blocks=3, n_prn=4, n_freq=5)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused_v3(
        x, rep, freqs, FS, freq_tile=freq_tile, interpret=True))
    assert got.shape == ref.shape == (4, 5, 256)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 1e-4


def test_fused_v3_padding_slices_extra_bins_and_prns():
    x, rep, freqs = _case(n=256, n_blocks=2, n_prn=3, n_freq=5, seed=1)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused_v3(
        x, rep, freqs, FS, freq_tile=4, interpret=True))
    assert got.shape == (3, 5, 256)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 1e-4


def test_fused_v3_bf16_close():
    x, rep, freqs = _case(n=256, n_blocks=2, n_prn=3, n_freq=3, seed=2)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused_v3(
        x, rep, freqs, FS, precision="bf16", freq_tile=1, interpret=True))
    assert np.max(np.abs(got - ref)) / np.max(ref) < 0.05


def test_v3_prn_padding():
    assert pallas_caf._pad_prn_v3(32, 16) == 32     # 512 lanes, exact
    assert pallas_caf._pad_prn_v3(19, 16) == 24     # SBAS: 24*16 = 384
    assert pallas_caf._pad_prn_v3(3, 2) == 64       # tiny C, n1=2 -> 128
    assert pallas_caf.supported_v3(2048, 32)        # GPS search
    assert pallas_caf.supported_v3(16384, 36)       # Galileo: v3 (32, 512)
    assert not pallas_caf.supported_v3(10000, 32)   # unfactorable


def test_factorization_v3_overrides_v2_greedy_pick():
    # v2 minimizes n2 greedily (n1 up to 128); v3 caps n1 at 32 but searches
    # its own split instead of rejecting sizes where v2's pick is too wide.
    assert pallas_caf.factorization_v2(16384) == (128, 128)
    assert pallas_caf.factorization_v3(16384) == (32, 512)
    assert pallas_caf.factorization_v2(8192) == (64, 128)
    assert pallas_caf.factorization_v3(8192) == (32, 256)
    assert pallas_caf.factorization_v3(2048) == (16, 128)   # == v2
    assert pallas_caf.factorization_v3(10000) is None


def test_fused_v3_large_n1_override_matches_xla():
    # n=8192: exercises the v3-specific (32, 256) split (v2 would use 64x128)
    x, rep, freqs = _case(n=8192, n_blocks=1, n_prn=3, n_freq=2, seed=4)
    ref = _xla_ref(x, rep, freqs)
    got = np.asarray(pallas_caf.caf_accumulate_fused_v3(
        x, rep, freqs, FS, freq_tile=1, interpret=True))
    assert got.shape == ref.shape == (3, 2, 8192)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 1e-4


def test_acq_precision_setter_validates():
    assert caf.ACQ_FUSED_PRECISION in ("auto", "f32", "bf16")
    prev = caf.ACQ_FUSED_PRECISION
    try:
        caf.set_acq_precision("f32")
        assert caf.ACQ_FUSED_PRECISION == "f32"
        with pytest.raises(ValueError):
            caf.set_acq_precision("fp8")
    finally:
        caf.set_acq_precision(prev)


def test_fused_dispatch_prefers_v3():
    # GPS 2048-lag and Galileo 16384-lag searches both route to the
    # lane-merged v3 kernel; v2 handles a known-size search with unknown PRN
    # count; v1 remains the fallback for v2-unfactorable sizes; unfactorable
    # sizes fall back to the XLA path.
    assert caf.fused_dispatch(2048, 32) == "v3"    # GPS: lane-merged
    assert caf.fused_dispatch(2048) == "v2"        # unknown PRN count
    assert caf.fused_dispatch(16384, 36) == "v3"   # Galileo: v3 (32, 512)
    # 81*128: v2's power-of-two n1 cannot keep n2 VMEM-sized -> v1 (n1=81)
    assert caf.fused_dispatch(81 * 128, 32) == "v1"
    assert caf.fused_dispatch(10000, 32) is None


def test_resolve_acq_precision_policy():
    from gps_jamming_tpu.ops import fftcore
    prev = caf.ACQ_FUSED_PRECISION
    pinned = fftcore._PRECISION_PINNED
    prec = fftcore.get_precision()
    try:
        caf.set_acq_precision("auto")
        fftcore._PRECISION_PINNED = False
        # auto: bf16 only on the MXU-bound v2 kernel; f32 on layout-bound v1
        assert caf.resolve_acq_precision(None, "v2") == "bf16"
        assert caf.resolve_acq_precision(None, "v1") == "f32"
        # explicit argument wins over everything
        assert caf.resolve_acq_precision("f32", "v2") == "f32"
        # a pinned fftcore precision governs the fused path too
        fftcore.set_precision("f32")
        assert caf.resolve_acq_precision(None, "v2") == "f32"
        fftcore.set_precision("bf16")
        assert caf.resolve_acq_precision(None, "v1") == "bf16"
        # the one-knob entry point sets both policies
        from gps_jamming_tpu import ops as ops_pkg
        ops_pkg.set_compute_precision("f32")
        assert caf.ACQ_FUSED_PRECISION == "f32"
        assert fftcore.get_precision() == "f32"
        assert caf.resolve_acq_precision(None, "v2") == "f32"
    finally:
        caf.set_acq_precision(prev)
        fftcore._PRECISION = prec
        fftcore._PRECISION_PINNED = pinned


@pytest.mark.slow
def test_fused_pcf_matches_xla_pcf():
    """The fused PCF path (6 v3-kernel calls over coarse-shifted replica
    chunks + time-domain group combination) reproduces the XLA
    caf_accumulate_pcf surface exactly (f32, interpret mode)."""
    rng = np.random.default_rng(11)
    n, nb, n_prn = 2048, 10, 32
    x = cplx.CArray(
        jnp.asarray(rng.standard_normal((nb, n)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((nb, n)).astype(np.float32)))
    rep_c = rng.standard_normal((n_prn, n)) + 1j * rng.standard_normal(
        (n_prn, n))
    rep = cplx.CArray(np.real(rep_c).astype(np.float32),
                      np.imag(rep_c).astype(np.float32))
    want = np.asarray(caf.caf_accumulate_pcf(
        x, cplx.CArray(jnp.asarray(rep.re), jnp.asarray(rep.im)), FS))
    got = np.asarray(pallas_caf.caf_accumulate_pcf_fused(
        x, rep, FS, precision="f32", interpret=True))
    assert got.shape == want.shape == (n_prn, 90, n)
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * want.max())


@pytest.mark.slow
def test_fused_pcf_intrace_replica_shifts_match(monkeypatch):
    """Forcing the in-trace coarse-shift branch (used when the shifted
    replica table would exceed the inlined-constant cap, e.g. Galileo
    E1B's 269 MB) reproduces the host-precomputed fused surface."""
    monkeypatch.setattr(pallas_caf, "PCF_HOST_REPLICA_MAX_BYTES", 0)
    rng = np.random.default_rng(12)
    n, nb, n_prn = 2048, 4, 32
    x = cplx.CArray(
        jnp.asarray(rng.standard_normal((nb, n)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((nb, n)).astype(np.float32)))
    rep = cplx.CArray(rng.standard_normal((n_prn, n)).astype(np.float32),
                      rng.standard_normal((n_prn, n)).astype(np.float32))
    want = np.asarray(caf.caf_accumulate_pcf(
        x, cplx.CArray(jnp.asarray(rep.re), jnp.asarray(rep.im)), FS))
    got = np.asarray(pallas_caf.caf_accumulate_pcf_fused(
        x, rep, FS, precision="f32", interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * want.max())


def test_pcf_doppler_grid():
    d = caf.pcf_doppler_hz(FS, 2048, 7000.0)
    assert d.size == 15 * 2 * 3
    assert d.min() == -7200.0 and d.max() == 7700.0
    # every |f| <= 7000 is within 150 Hz of a grid point (interior: 50 Hz)
    probe = np.linspace(-7000, 7000, 281)
    dist = np.abs(probe[:, None] - d[None, :]).min(axis=1)
    assert dist.max() <= 150.0
    assert np.median(dist) <= 50.0


def _pcf_stats_case(seed=3):
    rng = np.random.default_rng(seed)
    n, nb, nprn = 2048, 10, 8
    x = cplx.CArray(
        jnp.asarray(rng.standard_normal((nb, n)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((nb, n)).astype(np.float32)))
    rep = cplx.CArray(rng.standard_normal((nprn, n)).astype(np.float32),
                      rng.standard_normal((nprn, n)).astype(np.float32))
    return x, rep, n


def test_pcf_stats_match_surface_reductions():
    """The in-kernel stats reduction (stats_excl >= 0) reproduces every
    reduction of the materialized surface: per-row peak, lag argmax
    (same tie-breaking), circularly-excluded second peak, total and
    window sums (the checkacquisition statistics, sdracq.c:52-81)."""
    from gps_jamming_tpu.ops import corr as corr_ops

    x, rep, n = _pcf_stats_case()
    excl = 4
    surf = np.asarray(pallas_caf.caf_accumulate_pcf_fused(
        x, rep, FS, max_doppler_hz=7000.0, precision="f32",
        interpret=True))
    max1, arg1, exmax, tot, wsum = [np.asarray(s) for s in
                                    pallas_caf.caf_accumulate_pcf_fused(
                                        x, rep, FS, max_doppler_hz=7000.0,
                                        precision="f32", interpret=True,
                                        stats_excl=excl)]
    np.testing.assert_allclose(max1, surf.max(-1), rtol=1e-6)
    np.testing.assert_array_equal(arg1.astype(int), surf.argmax(-1))
    rows = surf.reshape(-1, n)
    pk = rows.argmax(-1)
    ref_ex = np.asarray(corr_ops.second_peak_excluded(
        jnp.asarray(rows), jnp.asarray(pk), excl)).reshape(max1.shape)
    np.testing.assert_allclose(exmax, ref_ex, rtol=1e-6)
    np.testing.assert_allclose(tot, surf.sum(-1), rtol=1e-4)
    pos = np.arange(n)
    dist = np.abs((pos[None, :] - pk[:, None] + n // 2) % n - n // 2)
    ref_w = np.where(dist <= excl, rows, 0.0).sum(-1).reshape(max1.shape)
    np.testing.assert_allclose(wsum, ref_w, rtol=1e-4)


def test_pcf_stats_peak_only_mode():
    """stats_excl=-1 skips the exclusion passes: max/arg live, the
    three exclusion rows are zeros."""
    x, rep, n = _pcf_stats_case(seed=4)
    surf = np.asarray(pallas_caf.caf_accumulate_pcf_fused(
        x, rep, FS, max_doppler_hz=7000.0, precision="f32",
        interpret=True))
    max1, arg1, exmax, tot, wsum = [np.asarray(s) for s in
                                    pallas_caf.caf_accumulate_pcf_fused(
                                        x, rep, FS, max_doppler_hz=7000.0,
                                        precision="f32", interpret=True,
                                        stats_excl=-1)]
    np.testing.assert_allclose(max1, surf.max(-1), rtol=1e-6)
    np.testing.assert_array_equal(arg1.astype(int), surf.argmax(-1))
    assert not exmax.any() and not tot.any() and not wsum.any()


def test_acquisition_from_stats_matches_surface_test():
    """acquisition_test_from_stats == acquisition_test on the same
    search: identical acquired/code_phase/doppler and matching
    ratio/C-N0 (the two paths the TPU/non-TPU backends take)."""
    from gps_jamming_tpu.config import AcquisitionConfig
    from gps_jamming_tpu.models.receiver import acquisition as acq_mod

    x, rep, n = _pcf_stats_case(seed=5)
    cfg = AcquisitionConfig()
    nsampchip = max(int(round(n / 1023.0)), 1)
    excl = int(cfg.exclude_chips * nsampchip)
    surf = pallas_caf.caf_accumulate_pcf_fused(
        x, rep, FS, max_doppler_hz=cfg.doppler_max_hz, precision="f32",
        interpret=True)
    stats = pallas_caf.caf_accumulate_pcf_fused(
        x, rep, FS, max_doppler_hz=cfg.doppler_max_hz, precision="f32",
        interpret=True, stats_excl=excl)
    freqs = jnp.asarray(caf.pcf_doppler_hz(FS, n, cfg.doppler_max_hz))
    a = acq_mod.acquisition_test(surf, freqs, FS, cfg, 5e-3)
    b = acq_mod.acquisition_test_from_stats(stats, freqs, n, cfg, 5e-3)
    np.testing.assert_array_equal(np.asarray(a.acquired),
                                  np.asarray(b.acquired))
    np.testing.assert_array_equal(np.asarray(a.code_phase),
                                  np.asarray(b.code_phase))
    np.testing.assert_array_equal(np.asarray(a.doppler_hz),
                                  np.asarray(b.doppler_hz))
    np.testing.assert_allclose(np.asarray(a.peak_ratio),
                               np.asarray(b.peak_ratio), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.cn0_dbhz),
                               np.asarray(b.cn0_dbhz), rtol=1e-5)


def test_pcf_stats_supported_gates():
    assert pallas_caf.pcf_stats_supported(2048, 32, 7000.0, 2.048e6)
    # Galileo E1B: 269 MB of shifted replicas exceeds the inline cap
    assert not pallas_caf.pcf_stats_supported(16384, 36, 7000.0, 4.096e6)
    assert not pallas_caf.pcf_stats_supported(10000, 14, 7000.0, 10e6)
