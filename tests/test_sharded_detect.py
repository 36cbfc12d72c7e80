"""Sharded product path (`detect --devices N`): the fusion library run
over a REAL 3-antenna simulated capture set on the 8-device virtual CPU
mesh, asserting numerical equality with the single-device kernels — the
product promotion of what dryrun_multichip proves at toy shapes.
"""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gps_jamming_tpu.config import DEFAULT_CONFIG as CFG
from gps_jamming_tpu.models import detector
from gps_jamming_tpu.ops import cplx, iq as iq_ops
from gps_jamming_tpu.runtime import sharded
from gps_jamming_tpu.sim import scenario

FS = 2.048e6


@pytest.fixture(scope="module")
def capture_set(tmp_path_factory):
    d = tmp_path_factory.mktemp("shard")
    scn = scenario.JammerScenario(kind="chirp", position_m=(4.0, 3.0),
                                  start_s=0.3, duration_s=0.4, seed=7)
    ants = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0)]
    paths = [str(d / f"ant{i}.bin") for i in range(3)]
    scenario.write_capture_set(scn, ants, paths, int(FS), FS,
                               noise_std=1.0)
    return paths


def test_sharded_detect_matches_single_device(capture_set):
    paths = capture_set
    assert len(jax.devices()) >= 6, "conftest should give 8 CPU devices"
    out = sharded.analyze_capture_sharded(paths, n_devices=8)
    assert out["mesh"] == {"antenna": 3, "time": 2, "devices": 6}

    # --- F1 ranges equal the single-device power pre-scan ---------------
    # (the sharded path trims to whole chunks x time shards; compare on
    # the same sample count)
    n_used = None
    for i, p in enumerate(paths):
        got = out["per_antenna"][i]["power_ranges_bytes"]
        chunk = CFG.detector.power_chunk_samples
        import os
        n = os.path.getsize(p) // 2
        L = (n // (2 * chunk)) * chunk
        n_used = 2 * L
        x = iq_ops.read_iq_file(p, convention="centered",
                                count=2 * n_used)
        prof = detector.power_profile(jnp.asarray(x), CFG.detector)
        want = detector.power_profile_ranges(prof, CFG.detector)
        assert got == want, (i, got, want)
        assert got, "no F1 range detected on the jammed capture"
        s_b, e_b = got[0]
        assert abs(s_b / 2 / FS - 0.3) < 0.05

    # --- sharded PCF acquisition equals the single-device surface -------
    # (re-run the fused call and compare raw arrays)
    from gps_jamming_tpu.models.receiver import acquisition as acq_mod
    from gps_jamming_tpu.ops import caf as caf_ops
    from gps_jamming_tpu.parallel import fusion, mesh as mesh_lib
    n_code = 2048
    per_shard = 8 * n_code
    mesh = mesh_lib.make_mesh(3, 2, devices=jax.devices()[:6])
    caps = [sharded._load_planar(p, n_used) for p in paths]
    blocks = cplx.CArray(
        np.stack([c.re.reshape(2, -1)[:, :per_shard] for c in caps]),
        np.stack([c.im.reshape(2, -1)[:, :per_shard] for c in caps]))
    replica = acq_mod.gps_replica_table_host(FS, n_code)
    surf_sh = np.asarray(fusion.sharded_caf_acquire(
        blocks, mesh, replica, None, FS, method="pcf", group_blocks=4))
    for i in range(3):
        one = cplx.CArray(blocks.re[i].reshape(-1, n_code),
                          blocks.im[i].reshape(-1, n_code))
        want = np.asarray(caf_ops.caf_accumulate_pcf(
            one, replica, FS, n_groups=4))
        np.testing.assert_allclose(surf_sh[i], want, rtol=2e-4,
                                   atol=1e-3 * want.max())

    # --- acquisition/tdoa sections populated ----------------------------
    assert out["acquisition"] is not None and len(out["acquisition"]) == 3
    assert out["tdoa_pairs"] is not None and len(out["tdoa_pairs"]) == 3
    for row in out["tdoa_pairs"]:
        # simulated antennas are meters apart: |lag| small but defined
        assert abs(row["lag_samples"]) < 200

    # JSON-able (the CLI prints it verbatim)
    json.dumps(out)


def test_sharded_detect_cli(capture_set):
    """`detect --devices 8` end-to-end through the CLI parser."""
    import contextlib
    import io

    from gps_jamming_tpu import cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["detect", *capture_set, "--devices", "8"])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["mesh"]["devices"] == 6
    assert out["per_antenna"][0]["power_ranges_bytes"]
