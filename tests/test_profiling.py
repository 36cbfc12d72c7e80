"""EventLog / Profiler / sync barrier + distributed-init no-op behavior."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gps_jamming_tpu.parallel import mesh as mesh_lib
from gps_jamming_tpu.runtime import profiling


def test_event_log_ring_and_jsonl(tmp_path):
    path = os.path.join(tmp_path, "events.jsonl")
    log = profiling.EventLog(path, ring_size=5)
    for i in range(8):
        log.emit("tick", i=i)
    tail = log.tail()
    assert len(tail) == 5 and tail[-1]["i"] == 7
    log.close()
    lines = [json.loads(line) for line in open(path)]
    assert len(lines) == 8
    assert all(ln["kind"] == "tick" for ln in lines)


def test_profiler_stage_counts_samples():
    prof = Profiler = profiling.Profiler(profiling.EventLog())
    x = jnp.arange(1024, dtype=jnp.float32)
    f = jax.jit(lambda v: (v * 2.0).sum())
    with prof.stage("double", n_samples=1024) as box:
        box["out"] = f(x)
    with prof.stage("double", n_samples=1024) as box:
        box["out"] = f(x)
    rep = prof.report()
    assert rep[0]["stage"] == "double"
    assert rep[0]["calls"] == 2
    assert rep[0]["samples_per_s"] > 0
    assert prof.log.tail()[-1]["kind"] == "stage"


def test_sync_fetches_pytree():
    out = {"a": jnp.ones((4, 4)), "b": (jnp.zeros(3), 1.5)}
    profiling.sync(out)          # must not raise on mixed pytrees


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert mesh_lib.init_distributed() is False


def test_multihost_mesh_single_process():
    m = mesh_lib.multihost_mesh()
    assert m.axis_names == (mesh_lib.ANTENNA_AXIS, mesh_lib.TIME_AXIS)
    assert m.devices.shape[0] == 1          # one process in tests
    assert m.devices.size == len(jax.devices())
