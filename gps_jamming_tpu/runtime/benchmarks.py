"""Benchmark harness: flagship single-chip throughput + weak scaling.

The BASELINE.md performance envelope is "I/Q Msamples/s/chip at 1 chip,
1 host, and N>=2 hosts with >=80% weak-scaling efficiency". This module
provides both measurements as a library + the CLI `benchmark` verb:

- `single_chip()` runs the fused detection+acquisition chain (bench.py's
  flagship step) on the current backend with host-fetch-synchronized slope
  timing.
- `weak_scaling(device_counts)` measures the sharded multi-antenna
  PSD/power step (parallel.fusion: ppermute halo exchange + psum antenna
  fusion + all_gather) at a FIXED per-device workload over growing meshes.
  Each mesh size runs in a subprocess because the device count must be
  fixed before the JAX backend initializes
  (`--xla_force_host_platform_device_count` for the virtual CPU mesh; on a
  real multi-chip host, pass platform='tpu' to use the local chips).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

_PER_DEVICE_SAMPLES = 1 << 19          # weak-scaling workload per device
_BLOCK = 1 << 14


def _slope_time(fn, *args, n_lo=2, n_hi=12, reps=3) -> float:
    """Sustained seconds/step via fetch-synchronized two-point timing."""
    import jax

    def fetch(out):
        return jax.tree_util.tree_map(np.asarray, out)

    fetch(fn(*args))
    def timed(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fetch(out)
        return time.perf_counter() - t0

    lo = [timed(n_lo) for _ in range(reps)]
    hi = [timed(n_hi) for _ in range(reps)]
    return max((float(np.median(hi)) - float(np.median(lo)))
               / (n_hi - n_lo), 1e-9)


def single_chip() -> dict:
    """Flagship detection+acquisition chain throughput on this backend."""
    import bench as _bench_mod  # repo-root bench.py when run from checkout
    jfn, raw, n_block = _bench_mod._build_tpu_chain()
    msps = _bench_mod._time_tpu(jfn, raw, n_block)
    import jax
    return {"metric": "iq_detect_acquire_throughput",
            "backend": jax.default_backend(),
            "msamples_per_s_per_chip": round(msps, 2)}


def scaling_worker(n_devices: int, include_caf: bool = True) -> dict:
    """One weak-scaling point: the sharded detect+acquire chain
    (PSD/power fusion + non-coherent CAF acquisition) on an n-device mesh.

    Per-device workload is constant (_PER_DEVICE_SAMPLES), so perfect
    scaling = constant step time; efficiency = t(1) / t(N).
    """
    import jax
    import jax.numpy as jnp

    from ..config import DetectorConfig, SpectralConfig
    from ..ops import caf as caf_ops
    from ..ops import codes, cplx
    from ..parallel import fusion, mesh as mesh_lib

    devices = jax.devices()[:n_devices]
    n_ant = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    n_time = n_devices // n_ant
    mesh = mesh_lib.make_mesh(n_ant, n_time, devices=devices)

    det = DetectorConfig(power_chunk_samples=4096)
    spec = SpectralConfig(nperseg=1024)
    n_per_stream = _PER_DEVICE_SAMPLES * n_time
    rng = np.random.default_rng(0)
    streams = (rng.standard_normal((n_ant, n_per_stream))
               + 1j * rng.standard_normal((n_ant, n_per_stream))
               ).astype(np.complex64)
    blocks = jnp.asarray(fusion.shard_blocks(streams, n_ant, n_time, _BLOCK))

    fs = 2.048e6
    n_code = 2048                       # one C/A period at 2.048 MS/s
    on_tpu = jax.default_backend() == "tpu"
    n_prn = 32 if on_tpu else 8         # CPU-mesh plumbing stays quick
    dopp = caf_ops.doppler_bins(7000.0, 1000.0 if not on_tpu else 200.0)
    rep = cplx.CArray(*codes.sampled_code_fft_conj_host(
        codes.gps_ca_table()[:n_prn], 1.023e6, fs, n_code))

    def step(b):
        psd_fused, psd_ant, pm = fusion.sharded_psd_and_power(
            b, mesh, fs, det, spec)
        return psd_fused.sum(), pm.sum()

    jstep = jax.jit(step)
    dt = _slope_time(jstep, blocks)
    out = {"n_devices": n_devices, "mesh": [n_ant, n_time]}
    if include_caf:
        # detect+acquire chain: CAF over 8 integration blocks per shard
        # (the sharded form of the flagship bench.py step)
        def chain(b):
            _, _, pm = fusion.sharded_psd_and_power(b, mesh, fs, det, spec)
            surf = fusion.sharded_caf_acquire(b, mesh, rep, dopp, fs)
            return pm.sum(), surf.max()

        dt_chain = _slope_time(jax.jit(chain), blocks)
        out["chain_step_s"] = round(dt_chain, 6)
        out["chain_msamples_per_s_per_device"] = round(
            n_ant * n_per_stream / dt_chain / 1e6 / n_devices, 2)
    total = n_ant * n_per_stream
    out.update(step_s=round(dt, 6),
               msamples_per_s=round(total / dt / 1e6, 2),
               msamples_per_s_per_device=round(
                   total / dt / 1e6 / n_devices, 2))
    return out


def weak_scaling(device_counts: list[int], platform: str = "cpu"
                 ) -> list[dict]:
    """Run scaling_worker in one subprocess per mesh size."""
    rows = []
    for n in device_counts:
        env = dict(os.environ)
        if platform == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + f" --xla_force_host_platform_device_count={n}")
        code = ("import json;"
                "import jax; jax.config.update('jax_platforms', 'cpu');"
                if platform == "cpu" else "import json;") + (
                "from gps_jamming_tpu.runtime import benchmarks;"
                f"print('RESULT '+json.dumps(benchmarks.scaling_worker({n})))")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=1200)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            rows.append({"n_devices": n, "error":
                         (out.stderr or out.stdout)[-400:]})
            continue
        rows.append(json.loads(line[0][len("RESULT "):]))
    base = next((r.get("msamples_per_s_per_device") for r in rows
                 if r.get("n_devices") == device_counts[0]
                 and "error" not in r), None)
    if base:
        for r in rows:
            if "error" not in r:
                r["weak_scaling_efficiency"] = round(
                    r["msamples_per_s_per_device"] / base, 3)
    if platform == "cpu":
        for r in rows:
            r["note"] = ("virtual CPU mesh: devices share one host's cores, "
                         "so efficiency measures host contention, not ICI; "
                         "use --platform tpu on multi-chip hardware")
    return rows
