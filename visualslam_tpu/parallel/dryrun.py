"""Multi-chip dry run: compile + execute the distributed step on an
n-device mesh with tiny shapes (driven by __graft_entry__.dryrun_multichip).

Currently exercises the data-parallel frontend with a cross-device psum
reduction; the sharded Schur-BA step is added to this path as the backend
lands (it extends `step`, same mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from visualslam_tpu.frontend import detect_and_describe
from visualslam_tpu.parallel.mesh import make_mesh
from visualslam_tpu.utils.config import DEFAULT_CONFIG


def run_dryrun(n_devices: int) -> None:
    mesh = make_mesh(n_devices, axis="data")
    cfg = DEFAULT_CONFIG.replace(image_height=64, image_width=96)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((n_devices, 64, 96), dtype=np.float32))

    def step(batch):
        feats = jax.vmap(lambda im: detect_and_describe(im, cfg))(batch)
        # Cross-device reduction: total detections over the data axis.
        total = jax.lax.psum(
            jnp.sum(feats.keypoints.valid.astype(jnp.int32)), "data")
        return feats.descriptors, total

    smapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=P("data"),
        out_specs=(P("data"), P()),
    )
    desc, total = jax.jit(smapped)(imgs)
    jax.block_until_ready((desc, total))
    assert desc.shape[0] == n_devices
    print(f"[dryrun] mesh={mesh.shape} total_detections={int(total)}")
