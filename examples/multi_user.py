"""Multi-user serving example: S editing sessions, each with its OWN
edit mask, served by ONE vmapped sparse step over a dp-sharded mesh
(sige_tpu.parallel.SessionServer).

The reference serves one user per process (reference: diffusion_demo/
start.py); here per-session plan arrays stack on a session axis (tile
capacities and bbox shapes pinned across sessions) so different users'
edits batch into a single compiled program — on a pod slice each
session runs on its own chips.

Run: python examples/multi_user.py   (any backend; tiny random-weight
model, CPU-friendly shapes)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sige_tpu.core.masks import dilate_mask, downsample_mask
from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
from sige_tpu.nn import SIGEModel
from sige_tpu.parallel import SessionServer, make_mesh


def main():
    S, R = 4, 64
    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(16,), resolution=R,
                         sparse_resolution_threshold=R)
    module = SIGEFusedUNet(cfg=cfg)
    model = SIGEModel(module, bucket_min=1)

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((S, 1, R, R, 3)).astype(np.float32)
    tb = jnp.zeros((S, 1), jnp.float32)
    model.init(jax.random.key(0), jnp.asarray(x0[0]), tb[0])

    import math

    # dp = as many devices as divide the session count evenly (same
    # rule as demo.MultiSessionDemoRunner)
    mesh = make_mesh(math.gcd(S, len(jax.devices())), tp=1)
    server = SessionServer(module, model.params, mesh=mesh, bucket_min=1)
    server.prime(jnp.asarray(x0), tb)

    # every user edits a different region
    x1 = x0.copy()
    for i in range(S):
        m = np.zeros((R, R), bool)
        m[8 + 6 * i: 20 + 6 * i, 10: 26 + i] = True
        x1[i] += rng.standard_normal((1, R, R, 3)).astype(np.float32) \
            * m[None, :, :, None]
        server.set_masks(i, downsample_mask(dilate_mask(m, 2), min_res=4))

    y = server.step(jnp.asarray(x1), tb)      # compile
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        y = server.step(jnp.asarray(x1), tb)
    jax.block_until_ready(y)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"devices: {jax.devices()}")
    print(f"{S} sessions, distinct masks, one vmapped step: "
          f"{ms:.2f} ms/batch-step ({S / (ms / 1e3):.0f} session-steps/s)")
    print("outputs:", y.shape, "finite:", bool(np.isfinite(np.asarray(y)).all()))


if __name__ == "__main__":
    main()
