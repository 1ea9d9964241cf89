"""Device mesh construction — the framework's communication backend.

The reference has *no* distributed support at all (single `cuda`/`cpu` device,
/root/reference/train.py:1392; no NCCL/Gloo/MPI — SURVEY.md §2 parallelism
inventory). The TPU-native replacement is a `jax.sharding.Mesh` over ICI with
XLA collectives: the batch is sharded along a ``data`` axis, gradients are
reduced with `pmean` (lowered to an ICI all-reduce), and parameters carry
partition specs along an optional ``model`` axis so tensor parallelism is a
config change, not a rewrite.

Axes:
    data   — data parallel (primary; BASELINE.json: "data-parallel pmean over ICI")
    model  — tensor parallel (QKV / MLP sharding; 1 by default at ViT scale)
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data != -1 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(
    config: MeshConfig | None = None, devices=None, platform: str | None = None
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    On a real slice the device order from `jax.devices()` already follows the
    ICI torus; the (data, model) reshape keeps model-parallel groups on
    nearest neighbours so TP collectives ride the fastest links.

    `platform="cpu"` builds the mesh from the fake CPU devices created by
    ``--xla_force_host_platform_device_count`` (distributed tests without a
    slice, SURVEY.md §4).
    """
    if devices is None:
        import os

        platform = platform or os.environ.get("ARSVT_PLATFORM") or None
        devices = jax.devices(platform) if platform else jax.devices()
    config = config or MeshConfig()
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh(platform: str | None = None) -> Mesh:
    """1x1 mesh honoring the same ARSVT_PLATFORM pin as make_mesh — a bare
    jax.devices() here would initialize every registered plugin (a dead
    TPU tunnel hangs that forever, the round-1 driver failure mode)."""
    import os

    platform = platform or os.environ.get("ARSVT_PLATFORM") or None
    devices = (jax.devices(platform) if platform else jax.devices())[:1]
    return make_mesh(MeshConfig(data=1, model=1), devices=devices)
