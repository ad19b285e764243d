"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.parallel import TwinStepServer, make_mesh, shard_batch


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 cpu devices")
def test_twin_step_server_dp_tp():
    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
    from sige_tpu.nn import SIGEModel
    from sige_tpu.core.masks import dilate_mask, downsample_mask

    mesh = make_mesh(8, tp=2, devices=jax.devices("cpu"))
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}

    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=32,
                         sparse_resolution_threshold=32)
    model = SIGEModel(SIGEFusedUNet(cfg=cfg), bucket_min=1)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    mask = np.zeros((32, 32), bool)
    mask[8:16, 10:20] = True
    x1 = x0 + jnp.asarray(
        rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        * mask[None, :, :, None])
    t1 = jnp.zeros((1,), jnp.float32)
    model.init(jax.random.key(0), x0, t1)
    model.full(x0, t1)
    model.set_masks(downsample_mask(dilate_mask(mask, 2), min_res=4))

    B = 4
    xb0 = jnp.tile(x0, (B, 1, 1, 1))
    xb1 = jnp.tile(x1, (B, 1, 1, 1))
    tb = jnp.zeros((B,), jnp.float32)
    server = TwinStepServer(model.module, model.params, model.plan, mesh=mesh)
    server.prime(xb0, tb)
    y0, y1 = server.step(xb0, xb1, tb)
    assert y0.shape == y1.shape == (B, 32, 32, 3)
    assert np.isfinite(np.asarray(y1)).all()
    # all requests identical -> identical outputs across the dp axis
    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y1[-1]), atol=1e-5)
    # sparse result matches the single-device engine
    y_single = model.sparse(x1, t1)
    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y_single[0]), atol=1e-4)


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 cpu devices")
def test_session_server_per_session_masks():
    """SessionServer: S sessions with DIFFERENT masks batched over dp —
    every session's vmapped sparse output must match a single-device
    SIGEModel planned with that session's own mask. Sessions 2/3 use a
    much larger edit than 0/1, so stacking crosses capacity AND box-shape
    buckets and exercises the re-pin/restack path."""
    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
    from sige_tpu.nn import SIGEModel
    from sige_tpu.parallel import SessionServer

    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=32,
                         sparse_resolution_threshold=32)
    module = SIGEFusedUNet(cfg=cfg)
    model = SIGEModel(module, bucket_min=1)
    rng = np.random.default_rng(3)
    S = 4
    x0 = rng.standard_normal((S, 1, 32, 32, 3)).astype(np.float32)
    boxes = [(2, 8, 4, 10), (20, 28, 18, 30), (4, 26, 6, 28), (0, 6, 24, 32)]
    masks, x1 = [], x0.copy()
    for i, (r0, r1, c0, c1) in enumerate(boxes):
        m = np.zeros((32, 32), bool)
        m[r0:r1, c0:c1] = True
        x1[i] += (rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
                  * m[None, :, :, None])
        masks.append(downsample_mask(dilate_mask(m, 2), min_res=4))
    tb = np.zeros((S, 1), np.float32)

    model.init(jax.random.key(0), jnp.asarray(x0[0]), jnp.asarray(tb[0]))
    mesh = make_mesh(4, tp=1, devices=jax.devices("cpu")[:4])
    server = SessionServer(module, model.params, mesh=mesh, bucket_min=1)
    server.prime(jnp.asarray(x0), jnp.asarray(tb))
    for i in range(S):
        server.set_masks(i, masks[i])
    y = np.asarray(server.step(jnp.asarray(x1), jnp.asarray(tb)))
    assert y.shape == (S, 1, 32, 32, 3)

    for i in range(S):
        model.full(jnp.asarray(x0[i]), jnp.asarray(tb[i]))
        model.set_masks(masks[i])
        want = np.asarray(model.sparse(jnp.asarray(x1[i]), jnp.asarray(tb[i])))
        np.testing.assert_allclose(y[i], want, atol=1e-4,
                                   err_msg=f"session {i}")

    # sparse_update commits each session's edit: a follow-up sparse step
    # on the SAME edited inputs must then reproduce the committed state
    y_upd = np.asarray(server.step(jnp.asarray(x1), jnp.asarray(tb),
                                   sparse_update=True))
    np.testing.assert_allclose(y_upd, y, atol=1e-5)


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 cpu devices")
def test_session_server_window_layout_compact_edits():
    """SessionServer with layout="window" (the default) on COMPACT
    per-session edits: plans must stack on PINNED window extents (the
    across-session max per resolution) and the vmapped window-chain
    sparse step must match each session's single-device engine. The
    spread-edit test above exercises the all-tiles fallback; this one
    asserts windows actually survive the merge."""
    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
    from sige_tpu.nn import SIGEModel
    from sige_tpu.parallel import SessionServer

    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=32,
                         sparse_resolution_threshold=32)
    module = SIGEFusedUNet(cfg=cfg)
    model = SIGEModel(module, bucket_min=1, layout="window")
    rng = np.random.default_rng(11)
    S = 4
    x0 = rng.standard_normal((S, 1, 32, 32, 3)).astype(np.float32)
    # compact boxes at different origins and slightly different sizes
    boxes = [(2, 8, 4, 10), (20, 27, 18, 26), (10, 15, 22, 28), (5, 13, 2, 9)]
    masks, x1 = [], x0.copy()
    for i, (r0, r1, c0, c1) in enumerate(boxes):
        m = np.zeros((32, 32), bool)
        m[r0:r1, c0:c1] = True
        x1[i] += (rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
                  * m[None, :, :, None])
        masks.append(downsample_mask(dilate_mask(m, 2), min_res=4))
    tb = np.zeros((S, 1), np.float32)

    model.init(jax.random.key(0), jnp.asarray(x0[0]), jnp.asarray(tb[0]))
    mesh = make_mesh(4, tp=1, devices=jax.devices("cpu")[:4])
    server = SessionServer(module, model.params, mesh=mesh, bucket_min=1)
    server.prime(jnp.asarray(x0), jnp.asarray(tb))
    for i in range(S):
        server.set_masks(i, masks[i])
    y = np.asarray(server.step(jnp.asarray(x1), jnp.asarray(tb)))

    # the merged layout kept real windows (not the tiles fallback)
    stacked = server._stack.stacked()
    assert server._stack.win_pins, "expected pinned window extents"
    leaf_names = {k for g in jax.tree_util.tree_flatten_with_path(stacked)[0]
                  for k in [jax.tree_util.keystr(g[0])]}
    assert any("win_in" in n for n in leaf_names)

    # oracle: the single-device engine planned under the SERVER's merged
    # pins — identical plans, so the vmapped step must match ~exactly.
    # (An unpinned solo plan would use smaller windows = a smaller
    # recompute set; both satisfy the SIGE contract but differ at the
    # truncation fringe.)
    caps = server._stack._caps()
    for i in range(S):
        model.full(jnp.asarray(x0[i]), jnp.asarray(tb[i]))
        model.set_masks(masks[i], capacities=caps)
        want = np.asarray(model.sparse(jnp.asarray(x1[i]), jnp.asarray(tb[i])))
        np.testing.assert_allclose(y[i], want, atol=1e-4,
                                   err_msg=f"session {i}")


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 cpu devices")
def test_spatial_apply_decoder_matches_single_device():
    """sp: one big request with rows sharded over 8 devices produces the
    single-device dense decode bit-for-tolerance (XLA SPMD inserts the
    conv halo exchanges / norm reductions)."""
    from sige_tpu.models.sd import SDVAEConfig, SIGEDecoder
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.parallel import make_spatial_mesh, spatial_apply

    cfg = SDVAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=32, num_groups=8)
    module = SIGEDecoder(cfg=cfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    params = module.init(jax.random.key(0), z,
                         ctx=SIGECtx(mode="dense"))["params"]
    want = module.apply({"params": params}, z, ctx=SIGECtx(mode="dense"))

    mesh = make_spatial_mesh(8, devices=jax.devices("cpu"))
    got = spatial_apply(mesh, module, params, z)
    from jax.sharding import PartitionSpec
    assert got.sharding.spec == PartitionSpec(None, "sp")  # rows sharded
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        spatial_apply(mesh, module, params, z[:, :12])


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 cpu devices")
def test_big_canvas_composition_sp_full_then_single_chip_sparse():
    """The big-canvas composition (parallel/spatial.py docstring): the
    one-time full pass runs row-sharded over the sp mesh and leaves
    ROW-SHARDED caches; the per-edit sparse step then runs on one chip
    from those adopted caches and must match the all-single-chip engine
    flow exactly."""
    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.models.sd import SDVAEConfig, SIGEDecoder
    from sige_tpu.nn import SIGEModel
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.parallel import make_spatial_mesh, spatial_full_apply

    cfg = SDVAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=32, num_groups=8)
    module = SIGEDecoder(cfg=cfg)
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    params = module.init(jax.random.key(0), z,
                         ctx=SIGECtx(mode="dense"))["params"]

    mesh = make_spatial_mesh(8, devices=jax.devices("cpu"))
    y_sp, cache_sp, meta_sp = spatial_full_apply(mesh, module, params, z)

    # the caches the full pass left behind live row-sharded on the mesh
    maps = [a for a in jax.tree.leaves(cache_sp) if a.ndim >= 4]
    assert maps and any(not a.sharding.is_fully_replicated for a in maps)

    mask = np.zeros((32, 32), bool)
    mask[8:16, 10:20] = True
    masks = downsample_mask(dilate_mask(mask, 2), min_res=16)
    z_edit = z + jnp.asarray(
        rng.standard_normal(z.shape).astype(np.float32)
        * np.asarray(masks[(16, 16)])[None, :, :, None])

    one = jax.devices("cpu")[0]
    model = SIGEModel(module, bucket_min=1)
    model.params = jax.device_put(params, one)
    model.adopt_full(jax.device_put(cache_sp, one),
                     jax.device_put(meta_sp, one), z)
    model.set_masks(masks)
    got = np.asarray(model.sparse(jax.device_put(z_edit, one)))

    # reference flow: everything on one chip from the start
    ref = SIGEModel(module, bucket_min=1)
    ref.params = params
    ref.full(z)
    ref.set_masks(masks)
    want = np.asarray(ref.sparse(z_edit))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and the sp full output itself matches the one-chip full output
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(ref.full(z)),
                               atol=1e-5)
