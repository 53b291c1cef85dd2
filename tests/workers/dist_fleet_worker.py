"""Worker for the real 2-process multi-host test (test_dist.py).

Each process: initialize the distributed runtime, take its fleet share,
decode it, and run one global cross-process batch_decode; print results
for the parent to assert on.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    from noaa_apt_tpu.parallel import (
        batch_decode,
        fleet_shard,
        global_batch,
        init_distributed,
        topology_mesh,
    )

    assert init_distributed(f"127.0.0.1:{port}", 2, pid) is True
    assert jax.process_count() == 2

    # Deterministic, communication-free work partition.
    share = fleet_shard([f"pass{i}.wav" for i in range(5)])
    print(f"SHARE {pid} {','.join(share)}", flush=True)

    # One logical batch spanning both processes.
    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder, pad_bucket
    from noaa_apt_tpu.synth import synth_recording

    signal, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=15.0)
    rate = Rate(11025)
    dec = Decoder(STANDARD)
    single = dec.decode(signal, rate)

    mesh = topology_mesh()  # 2 processes x 1 local device
    assert mesh.shape == {"data": 2, "seq": 1}
    n_pad = pad_bucket(len(signal))
    local = np.zeros((1, n_pad), np.float32)
    local[0, : len(signal)] = signal
    gbatch = global_batch(mesh, local)
    results = batch_decode(dec, gbatch, rate, mesh, axis="data", n_true=len(signal))
    assert len(results) == 2
    for r in results:
        assert r.sync_positions == single.sync_positions
        np.testing.assert_array_equal(single.image_np(), r.image_np())
    print(f"OK {pid} rows={results[0].n_rows}", flush=True)


if __name__ == "__main__":
    main()
