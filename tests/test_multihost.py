"""Two-process fake-multihost test of the distributed bring-up.

SURVEY §4 implication (d): multi-host behavior is tested on one machine via
jax multi-process simulation. Two OS processes, each exposing 4 virtual CPU
devices, join through `mesh.init_distributed` (a loopback coordinator),
build the global ('antenna', 'time') = (2, 4) mesh with `multihost_mesh`,
and run `fusion.sharded_psd_and_power` — per-antenna data lives on its own
"host" (the multi-SDR capture layout of worker.py:613-627), and the psum
antenna fusion crosses the process boundary. Process 0 checks the fused
PSD against the single-process oracle.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import numpy as np
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
coord = sys.argv[2]

from gps_jamming_tpu.parallel import fusion, mesh as mesh_lib
ok = mesh_lib.init_distributed(coordinator_address=coord,
                               num_processes=2, process_id=pid)
assert ok, "init_distributed returned False"
assert jax.process_count() == 2
assert len(jax.devices()) == 8            # global view: 2 hosts x 4

m = mesh_lib.multihost_mesh(n_antenna=2)
assert m.shape == {"antenna": 2, "time": 4}

from gps_jamming_tpu.config import DetectorConfig, SpectralConfig
fs = 2.048e6
det = DetectorConfig(power_chunk_samples=512)
spec = SpectralConfig(nperseg=256)
n_time, block = 4, 4096

rng = np.random.default_rng(7)            # SAME stream in both processes
streams = (rng.standard_normal((2, n_time * block))
           + 1j * rng.standard_normal((2, n_time * block))
           ).astype(np.complex64)
blocks = fusion.shard_blocks(streams, 2, n_time, block)

from gps_jamming_tpu.ops import cplx
sh = mesh_lib.capture_sharding(m)
planes = (np.ascontiguousarray(blocks.real),
          np.ascontiguousarray(blocks.imag))
xg = cplx.CArray(
    jax.make_array_from_process_local_data(sh, planes[0][pid:pid + 1]),
    jax.make_array_from_process_local_data(sh, planes[1][pid:pid + 1]))

psd_fused, psd_ant, pm = fusion.sharded_psd_and_power(xg, m, fs, det, spec)
out = np.asarray(psd_fused)               # replicated -> addressable
if pid == 0:
    print("RESULT " + json.dumps({"psd": out.tolist()}), flush=True)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_matches_single_process():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("cannot bind loopback port")
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    code = WORKER % {"repo": REPO}
    procs = [subprocess.Popen(
        [sys.executable, "-c", code, str(pid), coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd=REPO) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    for rc, out, err in outs:
        assert rc == 0, err[-1500:]
    line = [ln for ln in outs[0][1].splitlines() if ln.startswith("RESULT ")]
    assert line, outs[0][1][-500:]
    got = np.asarray(json.loads(line[0][len("RESULT "):])["psd"])

    # single-process oracle on the same streams
    from gps_jamming_tpu.config import DetectorConfig, SpectralConfig
    from gps_jamming_tpu.ops import spectral
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    streams = (rng.standard_normal((2, 4 * 4096))
               + 1j * rng.standard_normal((2, 4 * 4096))
               ).astype(np.complex64)
    want = np.mean([np.asarray(spectral.welch_psd(jnp.asarray(s),
                                                  2.048e6, 256))
                    for s in streams], axis=0)
    np.testing.assert_allclose(got, want, rtol=3e-4)
