"""Multi-host (DCN) path: topology mesh, global batch assembly, fleet
work assignment — process-count-1 degenerate cases on the virtual CPU
mesh (the driver's dryrun covers the same path; SURVEY.md section 5.8)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import STANDARD
from noaa_apt_tpu.graph.decode import Decoder, pad_bucket
from noaa_apt_tpu.parallel import (
    batch_decode,
    fleet_shard,
    global_batch,
    init_distributed,
    topology_mesh,
)
from noaa_apt_tpu.synth import synth_recording


def test_init_distributed_no_coordinator_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False


def test_topology_mesh_layout():
    mesh = topology_mesh(n_data=2, n_seq=4)
    assert mesh.shape == {"data": 2, "seq": 4}
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError, match="exceeds"):
        topology_mesh(n_data=16, n_seq=16)


def test_topology_mesh_defaults():
    mesh = topology_mesh()
    # One process: data axis degenerates to process_count (1).
    assert mesh.shape["data"] == 1
    assert mesh.shape["seq"] == len(jax.devices())


def test_fleet_shard_deterministic_partition():
    paths = [f"{c}.wav" for c in "fedcba"]
    shards = [fleet_shard(paths, process_id=i, process_count=3) for i in range(3)]
    assert sorted(sum(shards, [])) == sorted(paths)  # exact cover
    assert shards[0] == ["a.wav", "d.wav"]  # sorted round-robin
    assert fleet_shard(paths, process_id=0, process_count=1) == sorted(paths)


def test_global_batch_decode_matches_single():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=15.0)
    rate = Rate(11025)
    dec = Decoder(STANDARD)
    single = dec.decode(signal, rate)

    mesh = topology_mesh(n_data=2, n_seq=4)
    n_pad = pad_bucket(len(signal))
    local = np.zeros((2, n_pad), np.float32)
    local[:, : len(signal)] = signal
    gbatch = global_batch(mesh, local)
    results = batch_decode(dec, gbatch, rate, mesh, axis="data", n_true=len(signal))
    assert len(results) == 2
    for r in results:
        assert r.sync_positions == single.sync_positions
        np.testing.assert_array_equal(single.image_np(), r.image_np())


def test_two_process_distributed_fleet_and_global_batch(tmp_path):
    """REAL multi-process coverage (not the degenerate case): two
    jax.distributed processes on localhost split the fleet without
    communicating and decode one global batch spanning both, bit-exact
    vs single-chip in each process."""
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "workers" / "dist_fleet_worker.py"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).resolve().parent.parent)]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out

    shares = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARE "):
                _, pid, files = line.split(" ", 2)
                shares[int(pid)] = files.split(",")
        assert "OK" in out
    # Disjoint, complete, deterministic partition.
    assert sorted(shares[0] + shares[1]) == [f"pass{i}.wav" for i in range(5)]
    assert not set(shares[0]) & set(shares[1])


def test_rows_by_process_submesh_spreads_hosts():
    """A sub-mesh (n_data*n_seq < total devices) must give every process
    its share of rows — a flat truncation would hand all rows to the
    first process and leave other hosts with no addressable devices."""
    from dataclasses import dataclass

    from noaa_apt_tpu.parallel.dist import _rows_by_process

    @dataclass(frozen=True)
    class FakeDev:
        process_index: int
        id: int

    devices = [FakeDev(p, p * 4 + i) for p in range(2) for i in range(4)]
    grid = _rows_by_process(devices, rows_per_proc=1, n_seq=2)
    assert grid.shape == (2, 2)
    assert {d.process_index for d in grid[0]} == {0}
    assert {d.process_index for d in grid[1]} == {1}

    with pytest.raises(ValueError, match="owns"):
        _rows_by_process(devices, rows_per_proc=1, n_seq=8)


def test_init_distributed_raises_on_bad_coordinator(monkeypatch):
    """A failed multi-host init must not silently degrade to
    single-host (every host would then decode the whole fleet)."""
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")  # unreachable
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    import noaa_apt_tpu.parallel.dist as dist

    called = {}

    def fake_initialize(coordinator_address=None, num_processes=None, process_id=None):
        called["args"] = (coordinator_address, num_processes, process_id)
        raise RuntimeError("Could not connect to the coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    with pytest.raises(RuntimeError, match="coordinator"):
        dist.init_distributed()
    assert called["args"] == ("127.0.0.1:1", 2, 0)

    # ...but an already-initialized runtime stays benign (launcher did
    # it): detected from runtime state, so initialize is never re-run
    # and NO exception-message parsing is involved.
    def fake_never(**kw):  # would raise if reached
        raise AssertionError("initialize must not be called when already up")

    monkeypatch.setattr(jax.distributed, "initialize", fake_never)
    monkeypatch.setattr(dist, "_distributed_initialized", lambda: True)
    assert dist.init_distributed() is False  # 1-process view, no raise

    # An error whose message merely CONTAINS "already"/"once" must still
    # propagate when the runtime is NOT initialized (the old substring
    # match would have swallowed it and degraded to single-host).
    monkeypatch.setattr(dist, "_distributed_initialized", lambda: False)

    def fake_misleading(**kw):
        raise RuntimeError("barrier already timed out once: coordinator gone")

    monkeypatch.setattr(jax.distributed, "initialize", fake_misleading)
    with pytest.raises(RuntimeError, match="barrier"):
        dist.init_distributed()
