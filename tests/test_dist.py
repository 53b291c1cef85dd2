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
