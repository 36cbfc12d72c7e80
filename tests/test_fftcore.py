"""MXU (matmul-DFT) FFT backend vs numpy oracle.

The production TPU runtime has no FFT HLO; fftcore implements DFT-as-matmul
(single-stage) and two-stage Cooley-Tukey for large n. These must match
np.fft to float32 tolerance at every size the framework uses.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gps_jamming_tpu.ops import fftcore


@pytest.fixture(autouse=True)
def _mxu_backend():
    fftcore.set_backend("mxu")
    yield
    fftcore.set_backend("auto")


def _rand_c(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("n", [64, 1000, 1024, 2048])
def test_single_stage_matches_numpy(rng, n):
    x = _rand_c(rng, n)
    got = np.asarray(fftcore.fft(jnp.asarray(x)))
    want = np.fft.fft(x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2 * np.sqrt(n))


@pytest.mark.parametrize("n", [4096, 50000, 131072])
def test_two_stage_matches_numpy(rng, n):
    x = _rand_c(rng, n)
    got = np.asarray(fftcore.fft(jnp.asarray(x)))
    want = np.fft.fft(x)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)


def test_ifft_roundtrip(rng):
    for n in (1024, 8192):
        x = _rand_c(rng, n)
        back = np.asarray(fftcore.ifft(fftcore.fft(jnp.asarray(x))))
        np.testing.assert_allclose(back, x, atol=1e-3)


def test_batched(rng):
    x = _rand_c(rng, 3, 5, 512)
    got = np.asarray(fftcore.fft(jnp.asarray(x)))
    want = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.3)


def test_padding_arg(rng):
    x = _rand_c(rng, 300)
    got = np.asarray(fftcore.fft(jnp.asarray(x), n=512))
    want = np.fft.fft(x, n=512)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.2)


def test_fft_power(rng):
    x = _rand_c(rng, 7, 1024)
    got = np.asarray(fftcore.fft_power(jnp.asarray(x)))
    want = np.abs(np.fft.fft(x, axis=-1)) ** 2
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1.0)


def test_ops_parity_on_mxu_backend(rng):
    """Welch PSD and xcorr must stay scipy-accurate through the MXU path."""
    from scipy import signal as ss
    from gps_jamming_tpu.ops import corr, spectral
    fs = 2.048e6
    n = 1 << 14
    x = _rand_c(rng, n)
    got = np.asarray(spectral.welch_psd(jnp.asarray(x), fs, nperseg=1024))
    _, want = ss.welch(x, fs, nperseg=1024, return_onesided=False)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-9)

    a = _rand_c(rng, 2000)
    true_lag = 57
    b = np.roll(a, -true_lag)
    lag, _ = corr.xcorr_peak_lag(jnp.asarray(a), jnp.asarray(b), subsample=False)
    assert int(lag) == true_lag


def test_bf16_precision_mode(rng):
    """bf16 operand mode: same spectral peaks, bounded relative error."""
    from gps_jamming_tpu.ops import fftcore
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)) \
        .astype(np.complex64)
    x += np.exp(2j * np.pi * 0.123 * np.arange(1024)).astype(np.complex64) * 4
    fftcore.set_backend("mxu")
    try:
        ref = np.asarray(fftcore.fft(jnp.asarray(x)))
        fftcore.set_precision("bf16")
        lo = np.asarray(fftcore.fft(jnp.asarray(x)))
    finally:
        fftcore.set_precision("f32")
        fftcore.set_backend("auto")
    assert np.argmax(np.abs(ref)) == np.argmax(np.abs(lo))
    rel = np.abs(lo - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel
