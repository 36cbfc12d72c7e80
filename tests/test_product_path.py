"""Flagship product-path e2e: the detect pipeline on a long jammed capture.

VERDICT r3 items 1/2/5 in one scenario: `analyze_capture` (the detect
verb's engine) drives the self-healing StreamingReceiver.process_file —
bounded HBM, channel health resets, post-jam re-acquisition
(sdrmain.c:248-400, :417-511 roles) — over a 60 s capture with a hard
mid-capture jam, with the 8-state EKF coasting through the outage the
snapshot WLS cannot survive, and the telemetry records showing all of it:
time-varying TRACKED|/DECODED| lists, per-satellite observations[], the
EKF FILTER name and innovations.
"""
import numpy as np
import pytest

import jax

from gps_jamming_tpu.ops import iq
from gps_jamming_tpu.runtime import pipeline
from gps_jamming_tpu.sim import constellation, jammers
from tests.test_rx_stream import FS, RX_LLA, TOE, _shell

JAM_START_S = 25.0
JAM_END_S = 31.0                  # 6 s outage > the 5 s EKF coast limit
TOTAL_S = 60.0


@pytest.mark.slow
def test_detect_product_path_long_jammed_capture(tmp_path):
    tow0 = TOE - 1.3
    n = int(TOTAL_S * FS)
    iq_sig, truths, rx_ecef = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.4, seed=6)
    assert len(truths) >= 4
    jam = np.asarray(jammers.broadband(
        int((JAM_END_S - JAM_START_S) * FS), jax.random.PRNGKey(3),
        amplitude=400.0))
    x = iq_sig.copy()
    x[int(JAM_START_S * FS):int(JAM_END_S * FS)] += jam
    path = str(tmp_path / "long_jam.bin")
    # scale into the uint8 ADC range (the sim floats are ~unit
    # amplitude; unscaled they quantize to +-1 LSB and the C/A
    # SNR dies); the jam (amp 400 * 12) clips at 127 = saturation
    iq.write_iq_file(path, (x * 12.0).astype(np.complex64))

    res = pipeline.analyze_capture([path], run_receiver=True,
                                   localize=False, pvt_filter="ekf")

    # --- F1 power range + detector event over the jam window -------------
    assert len(res.power_ranges) == 1
    s_b, e_b = res.power_ranges[0]
    assert abs(s_b / 2 / FS - JAM_START_S) < 0.1
    assert abs(e_b / 2 / FS - JAM_END_S) < 0.1
    assert len(res.events) >= 1
    assert abs(res.events[0]["start_time"] - JAM_START_S) < 0.5

    # --- self-healing visible in telemetry: TRACKED| dips then recovers --
    recs = res.telemetry.records
    assert len(recs) >= int(TOTAL_S * 10) - 5

    def tracked_at(t0, t1):
        counts = [len(r["tracked"]) for r in recs
                  if t0 < r["elapsed_time"] < t1]
        return max(counts) if counts else 0

    pre = tracked_at(10.0, JAM_START_S)
    mid = tracked_at(JAM_START_S + 3.0, JAM_END_S)
    post = tracked_at(JAM_END_S + 6.0, TOTAL_S)
    assert pre >= 4, f"pre-jam tracked {pre}"
    assert mid < pre, f"jam did not thin the tracked list ({mid} vs {pre})"
    assert post >= 4, f"post-jam re-acquisition missing ({post})"

    # a satellite tracked before the jam re-enters the list after it
    pre_set = {p for r in recs if 10.0 < r["elapsed_time"] < JAM_START_S
               for p in r["tracked"]}
    post_set = {p for r in recs if r["elapsed_time"] > JAM_END_S + 6.0
                for p in r["tracked"]}
    assert pre_set & post_set, "no satellite re-acquired after the jam"

    # --- fixes: good before and after, EKF coasting inside ---------------
    ep = np.asarray(res.receiver.fix_epochs, np.float64) / 1000.0
    fixes = res.receiver.fixes
    assert fixes, "receiver produced no PVT fixes at all"
    errs = np.array([np.linalg.norm(f.pos_ecef - rx_ecef) for f in fixes])
    valid = np.array([f.valid for f in fixes])
    pre_m = valid & (ep < JAM_START_S)
    post_m = valid & (ep > JAM_END_S + 6.0)
    assert pre_m.any() and np.median(errs[pre_m]) < 30.0
    assert post_m.any() and np.median(errs[post_m]) < 30.0

    # coasting: valid fixes with <4 sats inside the jam window — exactly
    # what snapshot WLS cannot produce (its gate needs >= 4 healthy sats)
    coast = [(f, e) for f, e, v in zip(fixes, ep, valid)
             if v and JAM_START_S + 0.7 < e < JAM_START_S + 5.0
             and f.nsat < 4]
    assert coast, "EKF produced no coasting fixes inside the jam"
    for f, _ in coast:
        assert np.linalg.norm(f.pos_ecef - rx_ecef) < 500.0
    # the coast limit holds: nothing valid later in the jam
    deep = [e for e, v, f in zip(ep, valid, fixes)
            if v and JAM_START_S + 5.5 < e < JAM_END_S and f.nsat < 4]
    assert not deep, f"coasting past the 5 s limit at {deep}"

    # --- telemetry carries the filter + per-sat observations --------------
    assert res.receiver.filter_name == "EKF"
    assert all(r["filter"] == "EKF" for r in recs)
    n_obs = sum(len(r["observations"]) for r in recs)
    assert n_obs > 100
    innovs = [o["innovation"] for r in recs for o in r["observations"]]
    assert any(v != 0.0 for v in innovs), "EKF innovations missing"
    from gps_jamming_tpu.utils import analysis
    series = analysis.per_prn_series(recs)
    assert len(series) >= 4

    # self-produced records satisfy the reference-corpus schema contract
    # (the same key sets the 41 archived gnssdec campaigns are checked
    # against) and replay through the detector frame extractor
    from tests.test_reference_corpus import (OBS_KEYS, POS_KEYS,
                                             SCHEMA_KEYS)
    for r in recs:
        assert SCHEMA_KEYS <= set(r)
        assert POS_KEYS <= set(r["position"])
        for o in r["observations"]:
            assert OBS_KEYS <= set(o)
    from gps_jamming_tpu.config import DEFAULT_CONFIG
    from gps_jamming_tpu.runtime import telemetry as tel
    frames2 = tel.frames_from_records(recs, DEFAULT_CONFIG.detector)
    assert np.asarray(frames2.buffcnt).max() > 0


class _Kill(Exception):
    pass


@pytest.mark.slow
def test_detect_checkpoint_resume_bitwise(tmp_path):
    """`detect --checkpoint/--resume` on the PRODUCT path: a run killed
    mid-capture (after the power pre-scan, a receiver checkpoint, and
    some live emissions) resumes and produces the EXACT events +
    telemetry record log of an uninterrupted run — power profile,
    receiver segment state, and the live-emission cursor all persist
    (VERDICT r4 missing item 4)."""
    import json

    tow0 = TOE - 1.3
    total_s = 14.0
    n = int(total_s * FS)
    iq_sig, truths, _ = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.4, seed=6)
    jam = np.asarray(jammers.broadband(
        int(3.0 * FS), jax.random.PRNGKey(3), amplitude=400.0))
    x = iq_sig.copy()
    x[int(5.0 * FS):int(8.0 * FS)] += jam
    path = str(tmp_path / "jam14.bin")
    iq.write_iq_file(path, (x * 12.0).astype(np.complex64))

    # uninterrupted reference run (no checkpointing)
    res_ref = pipeline.analyze_capture([path], localize=False)

    ck = str(tmp_path / "detect.ckpt")
    live1 = []

    def killing_sink(rec):
        live1.append(rec)
        if rec["elapsed_time"] > 6.0:
            raise _Kill()

    with pytest.raises(_Kill):
        pipeline.analyze_capture([path], localize=False,
                                 checkpoint_path=ck,
                                 checkpoint_every_s=4.0,
                                 emit_every_s=4.0, sink=killing_sink)
    import os
    assert os.path.exists(ck), "detect checkpoint missing"
    assert os.path.exists(ck + ".rx"), "receiver checkpoint missing"
    assert live1, "no live records before the kill"

    live2 = []
    res = pipeline.analyze_capture([path], localize=False,
                                   checkpoint_path=ck,
                                   checkpoint_every_s=4.0,
                                   emit_every_s=4.0, resume=True,
                                   sink=live2.append)
    # bitwise: same events, same record log as the uninterrupted run
    assert json.dumps(res.events, sort_keys=True) == \
        json.dumps(res_ref.events, sort_keys=True)
    assert json.dumps(res.telemetry.records, sort_keys=True) == \
        json.dumps(res_ref.telemetry.records, sort_keys=True)
    assert len(res.events) >= 1
    np.testing.assert_array_equal(res.flags_trace["jamming"],
                                  res_ref.flags_trace["jamming"])
    # live emission resumed at (or just before) the cursor: the two
    # sink streams together cover the timeline without a gap
    f1 = {round(r["elapsed_time"], 3) for r in live1}
    f2 = {round(r["elapsed_time"], 3) for r in live2}
    assert f2, "no live records after resume"
    assert min(f2) <= max(f1) + 0.101, (max(f1), min(f2))

    # resume rejects a checkpoint from a different invocation
    with pytest.raises(ValueError, match="detect checkpoint"):
        pipeline.analyze_capture([path], localize=False, system="glonass",
                                 sample_rate=FS,
                                 checkpoint_path=ck, resume=True)


@pytest.mark.slow
def test_streaming_product_path_galileo_and_glonass(tmp_path):
    """The detect pipeline's default (streaming) receiver produces PVT
    fixes + populated telemetry for the other two constellations — the
    gnssdec -a/-l modes through the r4 product path (VERDICT r3 weak
    item 2: the GLONASS/Galileo realtime envelope was unproven)."""
    from tests.test_multiconstellation_e2e import (GAL_FS, GLO_FS,
                                                   _gal_shell, _glo_shell)
    from gps_jamming_tpu.models.receiver import pvt as pvt_mod

    # --- Galileo E1B ------------------------------------------------------
    tow0 = TOE - 1.3
    n = int(16.0 * GAL_FS)
    sig, truths, rx_ecef = constellation.simulate_galileo_constellation(
        _gal_shell(), RX_LLA, tow0, n, GAL_FS, noise_std=0.4, seed=2)
    assert len(truths) >= 4
    p = str(tmp_path / "gal.bin")
    iq.write_iq_file(p, (sig * 12.0).astype(np.complex64))
    res = pipeline.analyze_capture([p], system="galileo",
                                   sample_rate=GAL_FS, localize=False,
                                   segment_s=2.0)
    fix = res.receiver.best_fix
    assert fix is not None, "no Galileo fix through the streaming path"
    assert np.linalg.norm(fix.pos_ecef - rx_ecef) < 30.0
    recs = res.telemetry.records
    assert sum(len(r["observations"]) for r in recs) > 50
    assert any(len(r["tracked"]) >= 4 for r in recs)

    # --- GLONASS L1OF -----------------------------------------------------
    t0 = 27030.0
    sats = _glo_shell(t0, tb=27000.0)
    n = int(13.0 * GLO_FS)
    sig, truths, rx_ecef = constellation.simulate_glonass_constellation(
        sats, RX_LLA, t0, n, GLO_FS, noise_std=0.4, seed=4)
    assert len(truths) == 5
    p = str(tmp_path / "glo.bin")
    iq.write_iq_file(p, (sig * 12.0).astype(np.complex64))
    res = pipeline.analyze_capture([p], system="glonass",
                                   sample_rate=GLO_FS, localize=False,
                                   segment_s=2.0)
    fix = res.receiver.best_fix
    assert fix is not None, "no GLONASS fix through the streaming path"
    assert np.linalg.norm(fix.pos_ecef - rx_ecef) < 40.0
    recs = res.telemetry.records
    assert sum(len(r["observations"]) for r in recs) > 20
