"""Sharding tests on the 8-device virtual CPU mesh.

Property: sharded results must match the single-shard (unsharded) reference
computation exactly (SURVEY.md §7 'property-test against single-shard').
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gps_jamming_tpu.config import DetectorConfig, SpectralConfig
from gps_jamming_tpu.ops import power as power_ops, spectral
from gps_jamming_tpu.parallel import fusion, halo, mesh as mesh_lib


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_construction():
    m = mesh_lib.make_mesh(2, 4)
    assert m.shape == {"antenna": 2, "time": 4}
    m1 = mesh_lib.make_mesh(2)
    assert m1.shape == {"antenna": 2, "time": 4}


def test_halo_from_next():
    m = mesh_lib.make_mesh(1, 8)
    x = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8)

    def k(local):
        blk = local.reshape(local.shape[0], -1)
        return halo.halo_from_next(blk, 3)

    f = shard_map(k, mesh=m, in_specs=P("antenna", "time", None),
                  out_specs=P("antenna", "time"))
    out = np.asarray(jax.jit(f)(x))     # (1, 8*11)
    rows = out.reshape(8, 11)
    for i in range(7):
        np.testing.assert_array_equal(rows[i, :8], np.arange(8 * i, 8 * i + 8))
        np.testing.assert_array_equal(rows[i, 8:], np.arange(8 * (i + 1), 8 * (i + 1) + 3))
    np.testing.assert_array_equal(rows[7, 8:], [0, 0, 0])


def test_halo_from_prev():
    m = mesh_lib.make_mesh(1, 8)
    x = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8)

    def k(local):
        blk = local.reshape(local.shape[0], -1)
        return halo.halo_from_prev(blk, 2)

    f = shard_map(k, mesh=m, in_specs=P("antenna", "time", None),
                  out_specs=P("antenna", "time"))
    rows = np.asarray(jax.jit(f)(x)).reshape(8, 10)
    np.testing.assert_array_equal(rows[0, :2], [0, 0])
    for i in range(1, 8):
        np.testing.assert_array_equal(rows[i, :2], np.arange(8 * i - 2, 8 * i))


def test_sharded_caf_matches_unsharded(rng):
    """2 antennas x 4 time shards, 8 PRNs x 15 Doppler x 512 lags: the
    psum-accumulated, all-gathered CAF equals per-antenna unsharded
    caf_accumulate over the same integration blocks."""
    from gps_jamming_tpu.ops import caf as caf_ops
    from gps_jamming_tpu.ops import codes, cplx

    fs = 2.048e6
    n_code = 512
    n_ant, n_time = 2, 4
    blocks_per_shard = 2
    block = blocks_per_shard * n_code
    n = n_time * block
    streams = (rng.standard_normal((n_ant, n)) +
               1j * rng.standard_normal((n_ant, n))).astype(np.complex64)

    rep = codes.sampled_code_fft_conj(codes.gps_ca_table()[:8], 1.023e6,
                                      fs, n_code)
    freqs = caf_ops.doppler_bins(7000.0, 1000.0)

    m = mesh_lib.make_mesh(n_ant, n_time)
    blk = jnp.asarray(fusion.shard_blocks(streams, n_ant, n_time, block))
    surf = fusion.sharded_caf_acquire(blk, m, rep, freqs, fs)
    assert surf.shape == (n_ant, 8, freqs.size, n_code)

    for a in range(n_ant):
        want = np.asarray(caf_ops.caf_accumulate(
            cplx.asarray(jnp.asarray(streams[a].reshape(-1, n_code))),
            rep, jnp.asarray(freqs), fs))
        np.testing.assert_allclose(np.asarray(surf[a]), want, rtol=2e-4)


def test_sharded_pair_xcorr_matches_unsharded(rng):
    """Antenna-sharded all-pairs xcorr == the single-device pair math."""
    from gps_jamming_tpu.ops import cplx, fftcore

    L = 1024
    n_ant = 4
    base = (rng.standard_normal(L + 64)
            + 1j * rng.standard_normal(L + 64)).astype(np.complex64)
    slices = np.stack([base[k:k + L] for k in range(n_ant)])

    m = mesh_lib.make_mesh(n_ant, 2)
    out = np.asarray(fusion.sharded_pair_xcorr(jnp.asarray(slices), m))
    assert out.shape == (n_ant * (n_ant - 1) // 2, 2 * L)

    import itertools
    for k, (i, j) in enumerate(itertools.combinations(range(n_ant), 2)):
        fi = np.fft.fft(slices[i], 2 * L)
        fj = np.fft.fft(slices[j], 2 * L)
        want = np.abs(np.fft.ifft(fi * np.conj(fj))) ** 2
        np.testing.assert_allclose(out[k], want, rtol=3e-3, atol=1e-3)
        # known relative delay: r[k] = sum a_i[n+k] conj(a_j[n]) peaks at
        # k = j-i (a_j is a_i advanced by j-i samples)
        assert int(np.argmax(out[k])) == (j - i) % (2 * L)


def test_sharded_psd_matches_unsharded(rng):
    """2 antennas x 4 time shards: PSD must equal the single-stream Welch."""
    fs = 2.048e6
    det = DetectorConfig(power_chunk_samples=2048)
    spec = SpectralConfig(nperseg=1024)
    n_ant, n_time = 2, 4
    block = 1 << 14                       # multiple of hop=512 and chunk
    n = n_time * block
    streams = (rng.standard_normal((n_ant, n)) +
               1j * rng.standard_normal((n_ant, n))).astype(np.complex64)
    t = np.arange(n) / fs
    streams[0] += np.exp(2j * np.pi * 200e3 * t)

    m = mesh_lib.make_mesh(n_ant, n_time)
    blocks = jnp.asarray(fusion.shard_blocks(streams, n_ant, n_time, block))
    psd_fused, psd_ant, pm = fusion.sharded_psd_and_power(
        blocks, m, fs, det, spec)

    # unsharded oracles
    want_ant = np.stack([
        np.asarray(spectral.welch_psd(jnp.asarray(s), fs, 1024))
        for s in streams])
    np.testing.assert_allclose(np.asarray(psd_ant), want_ant, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(psd_fused), want_ant.mean(0), rtol=2e-4)

    want_pm = np.stack([
        np.asarray(power_ops.chunk_power(jnp.asarray(s), 2048))
        for s in streams])
    np.testing.assert_allclose(np.asarray(pm), want_pm, rtol=1e-5)


def test_sharded_pcf_caf_matches_unsharded(rng):
    """The shipping PCF factorized acquisition on the mesh: per-shard
    whole-coherent-group powers psum'd along time == single-device
    caf_accumulate_pcf on the same blocks (the coherent-group boundary
    contract: the shard-local index phase cancels in |.|^2 only for
    whole groups, so exactness here proves the contract holds)."""
    from gps_jamming_tpu.ops import caf as caf_ops
    from gps_jamming_tpu.ops import codes, cplx

    fs = 2.048e6
    n_code = 512
    n_ant, n_time = 2, 4
    group_blocks = 2               # 5 ms-style coherent groups, 1/shard
    block = group_blocks * n_code
    n = n_time * block
    streams = (rng.standard_normal((n_ant, n)) +
               1j * rng.standard_normal((n_ant, n))).astype(np.complex64)

    rep = codes.sampled_code_fft_conj(codes.gps_ca_table()[:8], 1.023e6,
                                      fs, n_code)
    m = mesh_lib.make_mesh(n_ant, n_time)
    blk = jnp.asarray(fusion.shard_blocks(streams, n_ant, n_time, block))
    surf = fusion.sharded_caf_acquire(blk, m, rep, None, fs,
                                      method="pcf", max_doppler_hz=7000.0,
                                      group_blocks=group_blocks)
    dopp = caf_ops.pcf_doppler_hz(fs, n_code, 7000.0)
    assert surf.shape == (n_ant, 8, dopp.size, n_code)

    n_blocks_total = n // n_code
    for a in range(n_ant):
        want = np.asarray(caf_ops.caf_accumulate_pcf(
            cplx.asarray(jnp.asarray(streams[a].reshape(-1, n_code))),
            rep, fs, max_doppler_hz=7000.0,
            n_groups=n_blocks_total // group_blocks))
        np.testing.assert_allclose(np.asarray(surf[a]), want, rtol=2e-4,
                                   atol=1e-3 * want.max())


def test_sharded_pcf_rejects_straddling_groups(rng):
    """A group length that does not divide the per-shard block count must
    be rejected (it would silently break coherence across the boundary)."""
    import pytest

    from gps_jamming_tpu.ops import codes

    fs = 2.048e6
    n_code = 512
    rep = codes.sampled_code_fft_conj(codes.gps_ca_table()[:4], 1.023e6,
                                      fs, n_code)
    m = mesh_lib.make_mesh(2, 4)
    blk = jnp.zeros((2, 4, 3 * n_code), jnp.complex64)
    with pytest.raises(ValueError, match="group_blocks"):
        fusion.sharded_caf_acquire(blk, m, rep, None, fs, method="pcf",
                                   group_blocks=2)
