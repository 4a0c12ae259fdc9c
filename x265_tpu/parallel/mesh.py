"""Device mesh construction (x265 ThreadPool/NUMA-pool analog, SURVEY §2.4).

Axes of the full design:
  frames — frame-pipeline axis (P2 frame parallelism)
  tile   — intra-frame CTU-band axis (P1 WPP / P4 slices)
Multi-host GOP/ladder sharding (P6) composes on top via jax.distributed.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_tile_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs), ("tile",))


def make_frame_tile_mesh(n_frames: int, n_tiles: int) -> Mesh:
    devs = jax.devices()[:n_frames * n_tiles]
    if len(devs) < n_frames * n_tiles:
        raise RuntimeError("not enough devices")
    arr = np.array(devs).reshape(n_frames, n_tiles)
    return Mesh(arr, ("frames", "tile"))
