"""End-to-end tests of the flax SIGE module protocol + planner + engine.

Mirrors the reference's golden test (reference: example.py:94-95): a model
run in full mode on the edited input must match the sparse tile pipeline
run on top of original-input caches, to 1e-4.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.core.masks import dilate_mask
from sige_tpu.nn import (
    Gather,
    Scatter,
    ScatterWithBlockResidual,
    SIGEConv2d,
    SIGECtx,
    SIGEModel,
)


class ExampleNet(nn.Module):
    """Gather -> 3x3 conv -> Scatter (the reference example.py module)."""

    def setup(self):
        self.conv = SIGEConv2d(features=32, kernel_size=3, padding=1)
        self.g = Gather(block_size=6, kernel_size=3, conv_stride=1, conv_padding=1)
        self.s = Scatter(gather=self.g)

    def __call__(self, x, ctx: SIGECtx):
        x = self.g(x, ctx)
        x = self.conv(x, ctx)
        return self.s(x, ctx)


def test_example_net_full_sparse_equivalence(rng):
    H = W = 64
    x0 = jnp.asarray(rng.standard_normal((1, H, W, 16)).astype(np.float32))
    mask = rng.random((H, W)) < 0.04
    x1 = x0 + jnp.asarray(
        rng.standard_normal((1, H, W, 16)).astype(np.float32)
        * mask[None, :, :, None]
    )

    net = ExampleNet()
    model = SIGEModel(net)
    model.init(jax.random.key(0), x0)

    y_ref = model.full(x1)       # dense on edited (also fills caches - discard)
    _ = model.full(x0)           # caches from original
    model.set_masks({(H, W): mask})
    y_sparse = model.sparse(x1)

    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_ref), atol=1e-4)
    stats = model.stats()
    assert len(stats) == 1
    (info,) = stats.values()
    assert info["tiles"] > 0 and info["resolution"] == (H, W)


def test_example_net_sparse_update_chains_edits(rng):
    """After sparse(sparse_update=True), the cache holds the edited result,
    so a follow-up edit works without a new full pass
    (reference: sige/nn/scatter.py:59-60, used by the demo)."""
    H = W = 32
    x0 = jnp.asarray(rng.standard_normal((1, H, W, 16)).astype(np.float32))
    mask1 = np.zeros((H, W), bool)
    mask1[4:10, 4:10] = True
    mask2 = np.zeros((H, W), bool)
    mask2[20:26, 12:18] = True
    n1 = rng.standard_normal((1, H, W, 16)).astype(np.float32) * mask1[None, :, :, None]
    n2 = rng.standard_normal((1, H, W, 16)).astype(np.float32) * mask2[None, :, :, None]
    x1 = x0 + jnp.asarray(n1)
    x2 = x1 + jnp.asarray(n2)

    net = ExampleNet()
    model = SIGEModel(net)
    model.init(jax.random.key(0), x0)
    y2_ref = model.full(x2)
    _ = model.full(x0)

    model.set_masks({(H, W): mask1})
    _ = model.sparse(x1, sparse_update=True)   # cache now reflects x1
    model.set_masks({(H, W): mask2})
    y2 = model.sparse(x2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref), atol=1e-4)


def test_cache_slots(rng):
    """Multiple cache ids hold independent baselines
    (reference: sige/nn/scatter.py:40 per-cache-id dict, used by the
    interactive demo's per-step caches)."""

    class SlottedNet(nn.Module):
        def setup(self):
            self.conv = SIGEConv2d(features=8, kernel_size=3, padding=1)
            self.g = Gather(block_size=6, kernel_size=3, conv_stride=1, conv_padding=1)
            self.s = Scatter(gather=self.g, cache_slots=2)

        def __call__(self, x, ctx):
            return self.s(self.conv(self.g(x, ctx), ctx), ctx)

    H = W = 32
    xa = jnp.asarray(rng.standard_normal((1, H, W, 8)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((1, H, W, 8)).astype(np.float32))
    mask = np.zeros((H, W), bool)
    mask[10:16, 10:16] = True
    na = rng.standard_normal((1, H, W, 8)).astype(np.float32) * mask[None, :, :, None]
    xa1 = xa + jnp.asarray(na)
    xb1 = xb + jnp.asarray(na)

    net = SlottedNet()
    model = SIGEModel(net)
    model.init(jax.random.key(0), xa)
    ya_ref = model.full(xa1, cache_id=0)
    yb_ref = model.full(xb1, cache_id=1)
    _ = model.full(xa, cache_id=0)
    _ = model.full(xb, cache_id=1)
    model.set_masks({(H, W): mask})
    np.testing.assert_allclose(
        np.asarray(model.sparse(xa1, cache_id=0)), np.asarray(ya_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(model.sparse(xb1, cache_id=1)), np.asarray(yb_ref), atol=1e-4)


class BlockResidualNet(nn.Module):
    """Main 3x3 (block 6) + shortcut 1x1 (block 4) joined by
    ScatterWithBlockResidual (the SPADE resblock join)."""

    def setup(self):
        self.conv_m = SIGEConv2d(features=24, kernel_size=3, padding=1)
        self.conv_s = SIGEConv2d(features=24, kernel_size=1, padding=0)
        self.gm = Gather(block_size=6, kernel_size=3, conv_stride=1, conv_padding=1)
        self.gs = Gather(block_size=4, kernel_size=1, conv_stride=1, conv_padding=0)
        self.join = ScatterWithBlockResidual(main_gather=self.gm, shortcut_gather=self.gs)

    def __call__(self, x, ctx):
        m = self.conv_m(self.gm(x, ctx), ctx)
        s = self.conv_s(self.gs(x, ctx), ctx)
        return self.join(m, ctx, residual=s)


def test_block_residual_net(rng):
    H = W = 48
    x0 = jnp.asarray(rng.standard_normal((1, H, W, 12)).astype(np.float32))
    mask = rng.random((H, W)) < 0.05
    x1 = x0 + jnp.asarray(
        rng.standard_normal((1, H, W, 12)).astype(np.float32) * mask[None, :, :, None])

    model = SIGEModel(BlockResidualNet())
    model.init(jax.random.key(1), x0)
    y_ref = model.full(x1)
    _ = model.full(x0)
    model.set_masks({(H, W): mask})
    y = model.sparse(x1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    # two gathers planned
    assert len(model.stats()) == 2


def test_mask_resolution_mismatch_errors(rng):
    net = ExampleNet()
    model = SIGEModel(net)
    x = jnp.zeros((1, 16, 16, 16), jnp.float32)
    model.init(jax.random.key(0), x)
    model.full(x)
    with pytest.raises(KeyError):
        model.set_masks({(8, 8): np.zeros((8, 8), bool)})


def test_meta_refreshes_on_new_resolution(rng):
    """Re-using one model at a new input resolution must re-plan for the
    new shapes instead of silently keeping the stale meta (engine.full
    tracks the input-shape signature)."""
    net = ExampleNet()
    model = SIGEModel(net)
    x16 = jnp.asarray(rng.standard_normal((1, 16, 16, 16)).astype(np.float32))
    model.init(jax.random.key(0), x16)
    model.full(x16)
    model.set_masks({(16, 16): np.ones((16, 16), bool)})
    y16 = model.sparse(x16)
    assert y16.shape[1:3] == (16, 16)

    # same model, new resolution: full() must refresh meta + drop the plan
    x24 = jnp.asarray(rng.standard_normal((1, 24, 24, 16)).astype(np.float32))
    y_full = model.full(x24)
    with pytest.raises(RuntimeError):
        model.sparse(x24)  # stale plan was dropped
    model.set_masks({(24, 24): np.ones((24, 24), bool)})
    y24 = model.sparse(x24)
    np.testing.assert_allclose(np.asarray(y24), np.asarray(y_full), atol=1e-4)
