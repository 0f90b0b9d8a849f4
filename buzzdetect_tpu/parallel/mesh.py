"""Device mesh and sharding helpers for multi-chip / multi-host scale-out.

Design (SURVEY.md §2c): inference is pure data parallelism —
* within a host, a chunk's patches shard across local chips on the 'data'
  mesh axis (XLA partitions the conv stack; no collectives needed until the
  head, and even there the batch axis stays sharded);
* across hosts, *files* shard by a stable hash — combined with the
  filesystem-based resume protocol (partial CSVs + manifest), hosts are
  coordination-free, exactly like the reference's one-streamer-one-file
  design scaled out (`src/analyze.py:179-194`).

The model is ~3 M params: weights are replicated (tensor parallelism would
be pure overhead at this size); the classifier's sharding hooks accept any
NamedSharding, so a larger embedder could shard conv channels over ICI
without touching the pipeline.
"""

import hashlib

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, axis: str = 'data',
              devices=None, shape=None, axes=None) -> Mesh:
    """A device mesh over local (or given) devices.

    Default: 1-D data-parallel over ``axis``. For the trainer's DPxTP
    sharding pass a 2-D layout, e.g.
    ``make_mesh(shape=(4, 2), axes=('data', 'model'))`` — without this the
    package's own mesh factory could not build the mesh its own train step
    requires.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.array(devices)
    if shape is not None:
        if axes is None or len(axes) != len(shape):
            raise ValueError('axes must name every dim of shape')
        return Mesh(devices[:int(np.prod(shape))].reshape(shape),
                    tuple(axes))
    return Mesh(devices, (axis,))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = 'data',
                  sharded_dim: int = 0) -> NamedSharding:
    """Shard dimension ``sharded_dim`` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[sharded_dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def resolve_replica_devices(devices):
    """Normalize ``analyze(devices=...)`` to a list of local jax devices.

    Replica data parallelism (the TPU scale-out of the reference's
    "multiple GPU analyzers" row, `docs/source/tuning.rst:110-117`): each
    listed chip gets its OWN classifier replica and dispatch thread, fed
    independent chunks — zero collectives, N independent streams. For a
    ~3 M-param model this is the throughput-max layout; ``mesh=`` patch
    sharding is the latency-min layout for one big chunk.

    Accepts an int (first N local devices), 'all' (every local device), or
    an explicit device list. Returns a list, always; raises on requests the
    hardware can't honor rather than silently shrinking the fleet.
    """
    local = jax.local_devices()
    if devices == 'all':
        devices = len(local)
    if isinstance(devices, bool) or devices is None or \
            isinstance(devices, str):
        # a stray string like '4' must not fall through to list('4')
        raise ValueError("devices must be an int >= 1, 'all', or a device list")
    if isinstance(devices, int):
        if devices < 1:
            raise ValueError(f'devices must be >= 1, got {devices}')
        if devices > len(local):
            raise ValueError(
                f'devices={devices} but only {len(local)} local device(s) '
                f'are attached')
        return list(local[:devices])
    devices = list(devices)
    if not devices:
        raise ValueError('devices list is empty')
    return devices


def shard_files(paths, host_id: int = None, n_hosts: int = None,
                root: str = None):
    """Deterministically assign files to this host (multi-host DP).

    Stable across runs and independent of listing order, so interrupted
    multi-host jobs resume with the same assignment. Hosts need no
    communication: completion state lives in the shared output directory.

    Pass ``root`` (the audio directory) so the hash covers the path
    RELATIVE to it: hosts that mount or spell the corpus directory
    differently (/data/audio vs /mnt/shared/audio) then still agree on
    every file's owner. Hashing absolute paths would silently assign some
    files to no host at all when spellings differ.
    """
    import os
    if host_id is None:
        host_id = jax.process_index()
    if n_hosts is None:
        n_hosts = jax.process_count()
    if n_hosts <= 1:
        return list(paths)
    mine = []
    for p in paths:
        key = os.path.relpath(str(p), root) if root else str(p)
        digest = hashlib.sha1(key.encode()).digest()
        if int.from_bytes(digest[:4], 'big') % n_hosts == host_id:
            mine.append(p)
    return mine
