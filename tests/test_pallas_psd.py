"""Fused Pallas Welch-PSD kernel vs the XLA path (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gps_jamming_tpu.ops import cplx, pallas_psd, spectral

FS = 2.048e6


@pytest.mark.parametrize("n", [1 << 17, 100_000, 16_384, 131_772])
def test_fused_psd_matches_xla(n, rng):
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64)
    xp = cplx.asarray(jnp.asarray(x))
    want = np.asarray(spectral.welch_psd_p(xp, FS, 1024))
    got = np.asarray(pallas_psd.welch_psd_fused(xp, FS, 1024,
                                                interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5,
                               atol=2e-5 * want.max())


def test_fused_psd_matches_scipy(rng):
    """End parity: fused kernel vs scipy.signal.welch on a toned signal."""
    from scipy import signal as ss
    n = 1 << 16
    t = np.arange(n) / FS
    x = (np.exp(2j * np.pi * 200e3 * t)
         + 0.5 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    _, want = ss.welch(x, FS, nperseg=1024, return_onesided=False)
    got = np.asarray(pallas_psd.welch_psd_fused(
        cplx.asarray(jnp.asarray(x)), FS, 1024, interpret=True))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4 * want.max())
    assert np.argmax(got) == np.argmax(want)


def test_fused_psd_supported():
    assert pallas_psd.supported(1024)
    assert pallas_psd.supported(256)
    assert not pallas_psd.supported(1000)
