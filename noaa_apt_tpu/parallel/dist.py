"""Multi-host (DCN) execution: runtime init, topology-aware meshes,
fleet work assignment.

The reference is one desktop process (SURVEY.md section 2.2 — no
distributed execution of any kind); this module is the N>=2-host story
the TPU build adds on top:

- **Axis placement** follows the ICI/DCN split: the batch ("data")
  axis — embarrassingly parallel passes — shards ACROSS hosts over
  DCN, while the sequence ("seq") axis — whose ring halo exchanges
  (``ppermute``) and reductions need low latency — stays WITHIN a
  host's ICI-connected chips.  ``topology_mesh`` builds exactly that
  layout (via ``mesh_utils.create_hybrid_device_mesh`` when more than
  one slice/host participates).
- **Fleet mode needs no cross-host collectives at all**: recordings
  are independent, so ``fleet_shard`` deterministically partitions the
  input list by process and each host runs its local pipeline
  (``serve.decode_fleet``) on its own chips; DCN carries only process
  coordination, never signal data.
- A single logical batch CAN span hosts when required (one
  ``batch_decode`` call over the global "data" axis):
  ``global_batch`` assembles the globally-sharded array from each
  process's local recordings.
"""

from __future__ import annotations

import logging
import os

import numpy as np

log = logging.getLogger(__name__)


def _distributed_initialized() -> bool:
    """Whether the multi-process JAX runtime is already up, asked of
    the runtime itself (``jax.distributed.is_initialized()``, with the
    underlying client state as fallback for versions without it)."""
    import jax

    if hasattr(jax.distributed, "is_initialized"):
        return bool(jax.distributed.is_initialized())
    try:  # pragma: no cover - old-JAX fallback
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, initializes only when a coordinator is
    configured in the environment (``JAX_COORDINATOR_ADDRESS``, or a
    TPU-pod metadata server) — a plain single-host run stays
    uninitialized and returns False.  Returns True when more than one
    process participates afterwards.
    """
    import jax

    # Forward the standard coordinator environment explicitly —
    # relying on auto-detection here would make a typo'd environment
    # silently fall back to single-host (see below).
    if coordinator_address is None:
        coordinator_address = os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        ) or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is not None or num_processes is not None:
        # Only a repeated initialize (e.g. the launcher already did it)
        # is benign.  Anything else — unreachable coordinator,
        # inconsistent process counts — must NOT degrade silently to
        # single-host: with a 1-process view, fleet_shard would hand
        # every host the ENTIRE recording list and N hosts would decode
        # (and overwrite) the whole fleet N times.  Detect "already
        # initialized" from the runtime's own state, never by matching
        # exception message text (which changes across JAX versions).
        if _distributed_initialized():
            log.debug("jax.distributed already initialized; skipping")
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    return jax.process_count() > 1


def topology_mesh(n_data: int | None = None, n_seq: int | None = None):
    """A 2-D ("data", "seq") mesh laid out for the network topology:
    "data" spans hosts/slices (DCN), "seq" spans each host's local
    chips (ICI), so halo exchange and reductions never cross DCN.

    Defaults: ``n_data = process_count``, ``n_seq = chips per process``.
    With one process this degenerates to a local reshape (the dryrun
    case), keeping the code path identical.
    """
    import jax
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    n_total = len(jax.devices())
    if n_data is None:
        n_data = n_proc
    if n_seq is None:
        n_seq = n_total // n_data
    if n_data * n_seq > n_total:
        raise ValueError(
            f"mesh {n_data}x{n_seq} exceeds {n_total} devices"
        )
    if n_proc > 1:
        # Every process must own its full share of mesh rows: data
        # rows split evenly across processes, and each row's n_seq
        # devices come from ONE process (the seq axis must not cross
        # DCN).  A flat truncation of the device list would instead
        # hand all rows to the first processes and leave later hosts
        # with no addressable mesh devices.
        rows_per_proc = n_data // n_proc
        if n_data % n_proc != 0 or rows_per_proc * n_seq > n_local:
            raise ValueError(
                f"multi-host mesh must keep seq within a host: "
                f"data={n_data} (processes: {n_proc}), seq={n_seq} "
                f"(local chips: {n_local})"
            )
        n_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
        if n_slices == n_proc and n_data * n_seq == n_total:
            # Real pod using every chip: let mesh_utils optimize the
            # intra-slice layout.  (A sub-mesh can't go through
            # create_hybrid_device_mesh — it requires all devices —
            # so it falls through to the per-process construction.)
            from jax.experimental import mesh_utils

            dev = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_data // n_proc, n_seq),
                dcn_mesh_shape=(n_proc, 1),
            )
        else:
            # Group rows by owning process — the process boundary IS
            # the DCN boundary.  Also covers multi-process CPU and
            # hosts sharing a slice (no slice topology info).
            dev = _rows_by_process(jax.devices(), rows_per_proc, n_seq)
    else:
        dev = np.array(jax.devices()[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(dev, ("data", "seq"))


def _rows_by_process(devices, rows_per_proc: int, n_seq: int) -> np.ndarray:
    """[n_data, n_seq] device grid where each row's devices come from one
    process and every process owns exactly ``rows_per_proc`` rows."""
    by_proc: dict[int, list] = {}
    for d in sorted(devices, key=lambda d: (d.process_index, d.id)):
        by_proc.setdefault(d.process_index, []).append(d)
    rows = []
    for pid in sorted(by_proc):
        local = by_proc[pid]
        if len(local) < rows_per_proc * n_seq:
            raise ValueError(
                f"process {pid} owns {len(local)} devices, "
                f"needs {rows_per_proc}x{n_seq}"
            )
        for r in range(rows_per_proc):
            rows.append(local[r * n_seq : (r + 1) * n_seq])
    return np.array(rows)


def fleet_shard(paths, process_id: int | None = None, process_count: int | None = None):
    """The subset of recordings THIS process decodes in fleet mode.

    Deterministic round-robin by sorted order, so every host computes
    the same assignment without communicating.  Identity on one host.
    """
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    ordered = sorted(paths)
    return ordered[pid::n]


def global_batch(mesh, local_signals: np.ndarray, axis: str = "data"):
    """Assemble a globally batch-sharded array from per-process local
    recordings: [B_local, N] on each host -> global [B_local * n_proc, N]
    sharded over ``axis``.  Use with :func:`~..parallel.batch_decode`
    when one logical batch must span hosts.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis, None))
    if jax.process_count() == 1:
        return jax.device_put(local_signals, sharding)
    return jax.make_array_from_process_local_data(sharding, local_signals)
