"""Streaming receiver tests: health resets, re-acquisition, eph reuse.

The self-healing behaviors of the reference receiver (sdrmain.c:263-340
health checks, resetStructs :417-462): lock lost to mid-capture jamming
frees the channel slots; once the jam clears, slots re-acquire, re-anchor
timing from one subframe, reuse the cached ephemeris, and PVT resumes.
"""
import numpy as np
import pytest

import jax

from gps_jamming_tpu.models.receiver import lnav
from gps_jamming_tpu.runtime import rx_stream
from gps_jamming_tpu.sim import constellation, jammers

FS = 2.048e6
RX_LLA = (50.06, 19.94, 219.0)
TOE = 345600.0
JAM_START_S = 20.0
JAM_END_S = 26.0
TOTAL_S = 39.0


def _shell(n=24):
    ephs = []
    for k in range(n):
        ephs.append(lnav.Ephemeris(
            prn=k + 1, week=2400, toc=TOE, af0=0.0, af1=0.0, af2=0.0,
            tgd=0.0, iodc=100 + k, ura=1, health=0, iode=100 + k, toe=TOE,
            sqrt_a=np.sqrt(26_560_000.0), e=0.008, m0=2.0 * np.pi * k / n,
            delta_n=4.5e-9, omega0=2.0 * np.pi * (k % 6) / 6.0,
            omega_dot=-8.0e-9, omega=0.25 * k, i0=0.958, idot=-3e-10,
            cuc=0.0, cus=0.0, crc=0.0, crs=0.0, cic=0.0, cis=0.0,
            have_subframes=(1, 2, 3)))
    return ephs


@pytest.mark.slow
def test_streaming_receiver_survives_jam_and_reacquires():
    tow0 = TOE - 1.3
    n = int(TOTAL_S * FS)
    iq_sig, truths, rx_ecef = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.4, seed=6)
    assert len(truths) >= 4
    # strong enough to crush C/N0 below the 15 dB-Hz health threshold
    jam = np.asarray(jammers.broadband(
        int((JAM_END_S - JAM_START_S) * FS), jax.random.PRNGKey(3),
        amplitude=400.0))
    s0, s1 = int(JAM_START_S * FS), int(JAM_END_S * FS)
    x = iq_sig.copy()
    x[s0:s1] += jam

    rx = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
    res = rx.process(x.astype(np.complex64))

    ep = np.asarray(res.fix_epochs, np.float64) / 1000.0
    errs = np.array([np.linalg.norm(f.pos_ecef - rx_ecef)
                     for f in res.fixes])
    valid = np.array([f.valid for f in res.fixes])
    pre = valid & (ep < JAM_START_S)
    post = valid & (ep > JAM_END_S + 2.0)
    assert pre.any(), "no valid fix before the jam"
    assert post.any(), ("no valid fix after the jam "
                        "(re-acquisition failed)", ep.tolist())
    assert np.median(errs[pre]) < 30.0, np.median(errs[pre])
    assert np.median(errs[post]) < 30.0, np.median(errs[post])
    # no trustworthy fixes reported from inside the jam window
    mid = valid & (ep > JAM_START_S + 2.0) & (ep < JAM_END_S)
    assert mid.sum() <= 2, f"{mid.sum()} fixes inside the jam window"


@pytest.mark.slow
def test_process_file_matches_one_shot(tmp_path):
    """Chunked/streaming feed == one-shot whole-capture processing.

    process_file streams the capture through CaptureReader in fixed
    segment windows (device memory = segment_window_samples() samples,
    independent of file length — the sdrrcv.c:61-107 ring-buffer role);
    the fixes and channel sets must match the device-resident path on the
    same bytes.
    """
    tow0 = TOE - 1.3
    n = int(26.0 * FS)          # LNAV needs subframes 1-3 (18 s) + margin
    iq_sig, truths, rx_ecef = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.3, seed=11)
    assert len(truths) >= 4

    # write the RTL-SDR uint8 capture
    x = iq_sig.astype(np.complex64)
    scale = 45.0 / max(np.abs(x.real).max(), np.abs(x.imag).max())
    inter = np.empty(2 * n, np.float32)
    inter[0::2] = x.real * scale
    inter[1::2] = x.imag * scale
    raw = np.clip(np.round(inter + 127.5), 0, 255).astype(np.uint8)
    path = str(tmp_path / "cap.bin")
    raw.tofile(path)

    from gps_jamming_tpu.ops import iq as iq_ops
    x_host = iq_ops.read_iq_file(path, convention="centered")

    rx1 = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
    res1 = rx1.process(x_host)
    rx2 = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
    # bounded window: ~2 s + one code period + one epoch, regardless of n
    W = rx2.segment_window_samples()
    assert W == int(2.0 * FS) + 2048 + 2048
    assert W < n
    res2 = rx2.process_file(path, convention="centered")

    assert sorted(c.prn for c in res1.channels) == \
        sorted(c.prn for c in res2.channels)
    assert res1.fix_epochs == res2.fix_epochs
    assert len(res1.fixes) >= 1
    for f1, f2 in zip(res1.fixes, res2.fixes):
        assert f1.valid == f2.valid
        np.testing.assert_allclose(f1.pos_ecef, f2.pos_ecef, atol=1e-2)
    # both land near the simulated receiver
    errs = [np.linalg.norm(f.pos_ecef - rx_ecef)
            for f in res2.fixes if f.valid]
    assert errs and np.median(errs) < 30.0

    # --- checkpoint/resume: interrupted + resumed == uninterrupted ------
    # (SURVEY §5 checkpoint role; the reference's only recovery is rerun)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        ck = f"{d}/rx.ckpt"
        rx3 = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
        rx3.process_file(path, convention="centered", max_segments=6,
                         checkpoint_path=ck, checkpoint_every_s=4.0)
        import os
        assert os.path.exists(ck), "no checkpoint written"
        rx4 = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
        res4 = rx4.process_file(path, convention="centered",
                                checkpoint_path=ck, resume=True)
    assert res4.fix_epochs == res2.fix_epochs
    for f2, f4 in zip(res2.fixes, res4.fixes):
        assert f2.valid == f4.valid
        np.testing.assert_array_equal(f2.pos_ecef, f4.pos_ecef)
    np.testing.assert_array_equal(res4.cn0_epochs, res2.cn0_epochs)
    assert res4.tracked_spans == res2.tracked_spans


def test_checkpoint_rejects_mismatched_receiver(tmp_path):
    """A checkpoint from a different receiver configuration must raise,
    not silently corrupt tracking state."""
    import pickle

    rng = np.random.default_rng(0)
    path = str(tmp_path / "noise.bin")
    rng.integers(0, 256, int(2 * 1.0 * FS), dtype=np.uint8).tofile(path)

    ck = str(tmp_path / "rx.ckpt")
    with open(ck, "wb") as f:
        pickle.dump({"meta": {"fs": FS, "system": "gps",
                              "seg_epochs": 2000,       # 2 s segments
                              "n_slots": 12, "pvt_filter": "wls"},
                     "next_seg": 1}, f)
    rx = rx_stream.StreamingReceiver(FS, system="gps", segment_s=0.25)
    with pytest.raises(ValueError, match="checkpoint incompatible"):
        rx.process_file(path, checkpoint_path=ck, resume=True)


@pytest.mark.slow
def test_checkpoint_resume_across_jam_resets(tmp_path):
    """Resume from a checkpoint taken BEFORE a jam reproduces the
    uninterrupted run bitwise through the resets + re-acquisition that
    follow — the slot/holdoff/interval state restore under stress (no
    nav decode needed; the telemetry sources are the contract)."""
    tow0 = TOE - 1.3
    n = int(10.0 * FS)
    iq_sig, truths, _ = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.4, seed=6)
    jam = np.asarray(jammers.broadband(
        int(3.0 * FS), jax.random.PRNGKey(3), amplitude=400.0))
    x = iq_sig.copy()
    x[int(4.0 * FS):int(7.0 * FS)] += jam
    from gps_jamming_tpu.ops import iq as iq_ops
    path = str(tmp_path / "jam10.bin")
    iq_ops.write_iq_file(path, (x * 12.0).astype(np.complex64))

    rx_a = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
    res_a = rx_a.process_file(path, convention="centered")

    ck = str(tmp_path / "rx.ckpt")
    rx_b = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
    rx_b.process_file(path, convention="centered", max_segments=3,
                      checkpoint_path=ck, checkpoint_every_s=4.0)
    rx_c = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
    res_c = rx_c.process_file(path, convention="centered",
                              checkpoint_path=ck, resume=True)

    np.testing.assert_array_equal(res_c.cn0_epochs, res_a.cn0_epochs)
    assert res_c.tracked_spans == res_a.tracked_spans
    assert sorted(c.prn for c in res_c.channels) == \
        sorted(c.prn for c in res_a.channels)
    # the jam actually caused resets (spans that end before EOF) —
    # the state restore below segment 3 is only stressed if they did
    assert any(end * res_a.epoch_ms * 1e-3 < 9.0
               for _, _, end in res_a.tracked_spans), \
        "jam produced no resets; stress premise broken"
