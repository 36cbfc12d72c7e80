"""Streaming driver tests: block processing parity + checkpoint/resume."""
import jax.numpy as jnp
import numpy as np
import pytest

from gps_jamming_tpu.config import DEFAULT_CONFIG as CFG
from gps_jamming_tpu.models import detector
from gps_jamming_tpu.ops import iq
from gps_jamming_tpu.runtime import streaming
from gps_jamming_tpu.sim import scenario

FS = 2.048e6


@pytest.fixture(scope="module")
def long_capture(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "long.bin")
    scn = scenario.JammerScenario(kind="broadband", position_m=(3.0, 2.0),
                                  start_s=1.1, duration_s=0.9, seed=11)
    scenario.write_capture_set(scn, [(0.0, 0.0)], [p], int(3 * FS), FS,
                               noise_std=1.0)
    return p


def test_streaming_matches_batch(long_capture):
    """Streamed power profile == one-shot batch profile."""
    res = streaming.StreamProcessor().process_file(long_capture)
    cap = iq.read_iq_file(long_capture, convention="centered")
    batch = detector.power_profile(jnp.asarray(cap), CFG.detector)
    np.testing.assert_allclose(np.asarray(res.profile.power_map),
                               np.asarray(batch.power_map), rtol=1e-5)
    assert res.ranges == detector.power_profile_ranges(batch, CFG.detector)
    # jam window ~1.1..2.0 s
    assert len(res.events) == 1
    assert abs(res.events[0]["start_s"] - 1.1) < 0.05
    assert abs(res.events[0]["end_s"] - 2.0) < 0.05
    assert res.psd.shape == (CFG.spectral.nperseg,)


def test_streaming_checkpoint_resume(long_capture, tmp_path):
    """Interrupt after 1 block, resume from checkpoint, identical result."""
    proc = streaming.StreamProcessor()
    ck = str(tmp_path / "ck.npz")
    partial = proc.process_file(long_capture, checkpoint_path=ck,
                                checkpoint_every_blocks=1, max_blocks=1)
    assert partial.n_blocks == 1
    st = streaming.StreamState.load(ck)
    assert st.offset_samples == proc.block

    resumed = proc.process_file(long_capture, state=st)
    full = streaming.StreamProcessor().process_file(long_capture)
    np.testing.assert_allclose(np.asarray(resumed.profile.power_map),
                               np.asarray(full.profile.power_map),
                               rtol=1e-6)
    assert resumed.ranges == full.ranges
    np.testing.assert_allclose(resumed.psd * (resumed.state.psd_blocks),
                               full.psd * full.state.psd_blocks, rtol=1e-5)
