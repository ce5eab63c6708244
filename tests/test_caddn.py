"""CaDDN: LID discretization, frustum sampling, forward/backward."""
import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.config import Config
import pytest

pytestmark = pytest.mark.slow


def test_lid_discretization_roundtrip():
    from modest_tpu.models.caddn import depth_to_lid_target, lid_bin_from_depth

    d_min, d_max, nb = 2.0, 46.8, 80
    # bin edges: d_i = d_min + delta/2 * i * (i+1); centers map back to bin i
    delta = 2 * (d_max - d_min) / (nb * (1 + nb))
    edges = d_min + delta / 2 * np.arange(nb + 1) * (np.arange(nb + 1) + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    t = np.asarray(depth_to_lid_target(jnp.asarray(centers), d_min, d_max, nb))
    np.testing.assert_array_equal(t, np.arange(nb))
    # out of range → the extra bin
    t2 = np.asarray(depth_to_lid_target(jnp.asarray([0.5, 100.0, -1.0]),
                                        d_min, d_max, nb))
    np.testing.assert_array_equal(t2, [nb, nb, nb])
    # fractional index is monotonic
    idx = np.asarray(lid_bin_from_depth(jnp.linspace(d_min, d_max, 100),
                                        d_min, d_max, nb))
    assert (np.diff(idx) > 0).all()


def test_sample_frustum_exact():
    from modest_tpu.models.caddn import sample_frustum

    h, w, d, c = 4, 5, 3, 2
    rng = np.random.RandomState(0)
    fr = rng.randn(1, h, w, d, c).astype(np.float32)
    # exact grid point → exact value
    u = jnp.asarray([[2.0]]); v = jnp.asarray([[1.0]]); db = jnp.asarray([[1.0]])
    out = np.asarray(sample_frustum(jnp.asarray(fr), u, v, db, h, w, d))
    np.testing.assert_allclose(out[0, 0], fr[0, 1, 2, 1], rtol=1e-5)
    # midpoint in u → average of two cells
    out2 = np.asarray(sample_frustum(jnp.asarray(fr), jnp.asarray([[2.5]]),
                                     v, db, h, w, d))
    np.testing.assert_allclose(out2[0, 0], (fr[0, 1, 2, 1] + fr[0, 1, 3, 1]) / 2,
                               rtol=1e-5)
    # out of range → 0
    out3 = np.asarray(sample_frustum(jnp.asarray(fr), jnp.asarray([[-3.0]]),
                                     v, db, h, w, d))
    np.testing.assert_allclose(out3[0, 0], 0.0)


def caddn_model_cfg():
    from tests.test_grid_detectors import second_model_cfg

    cfg = second_model_cfg()
    cfg.NAME = "CaDDN"
    cfg.FFE = Config({
        "NAME": "DepthFFE",
        "DISC_CFG": {"depth_min": 2.0, "depth_max": 20.0, "num_bins": 16,
                     "mode": "LID"},
        "ENCODER_CHANNELS": [8, 16],
        "NUM_FEATURES": 16,
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"ddn_loss_weight": 3.0}},
    })
    cfg.MAP_TO_BEV = Config({"NAME": "Conv2DCollapse", "NUM_BEV_FEATURES": 32})
    # CaDDN's BEV sits at full voxel resolution (SECOND's is already /8)
    cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0].feature_map_stride = 1
    return cfg


def test_caddn_forward_backward(rng):
    from modest_tpu.models import caddn as cd
    from tests.test_grid_detectors import _toy_batch

    cfg = caddn_model_cfg()
    pcr = [0, -8, -3, 16, 8, 1]
    vs, gs = [0.5, 0.5, 0.5], (32, 32, 8)
    model = cd.CaDDN(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                     voxel_size=vs, grid_size=gs)
    b, h, w = 2, 32, 64
    images = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    # camera at origin looking down +x (lidar) == +z (cam)
    l2c = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                   np.float32)
    c2i = np.array([[40.0, 0, w / 2, 0], [0, 40.0, h / 2, 0], [0, 0, 1, 0]],
                   np.float32)
    l2c_b = jnp.asarray(np.tile(l2c, (b, 1, 1)))
    c2i_b = jnp.asarray(np.tile(c2i, (b, 1, 1)))
    _, gt = _toy_batch(rng, (16 / 3, -8 / 3))
    depth_maps = jnp.asarray(rng.uniform(0, 20, (b, h, w)), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), images, l2c_b, c2i_b, gt,
                           train=True)
    out, _ = model.apply(variables, images, l2c_b, c2i_b, gt, train=True,
                         mutable=["batch_stats"])
    loss, metrics = cd.caddn_loss(out, gt, cfg, depth_maps=depth_maps)
    assert np.isfinite(float(loss)), metrics
    assert float(metrics["depth_loss"]) > 0

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           images, l2c_b, c2i_b, gt, train=True,
                           mutable=["batch_stats"])
        return cd.caddn_loss(o, gt, cfg, depth_maps=depth_maps)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {jax.tree_util.keystr(p).split("'")[1] for p, _ in flat}
    assert any(k.startswith("encoder") or k == "ImageEncoder_0" for k in touched) \
        or "encoder" in touched

    # eval: decoded boxes exist and are finite
    out_e = model.apply(variables, images, l2c_b, c2i_b, train=False)
    assert np.isfinite(np.asarray(out_e["batch_box_preds"])).all()


def test_caddn_deeplab_path_forward_backward(rng):
    """The DeepLabV3 DDN path (FFE.DDN.NAME=DDNDeepLabV3, VERDICT r4 item
    9): full train forward + loss + grads through the ResNet/ASPP stack,
    and an eval forward. ResNet50 keeps the CPU runtime sane; the layer
    wiring is identical to ResNet101 (block counts only)."""
    from modest_tpu.models import caddn as cd
    from tests.test_grid_detectors import _toy_batch

    cfg = caddn_model_cfg()
    cfg.FFE.DDN = Config({"NAME": "DDNDeepLabV3", "BACKBONE_NAME": "ResNet50",
                          "FEAT_EXTRACT_LAYER": "layer1"})
    cfg.FFE.CHANNEL_REDUCE = Config({"in_channels": 256, "out_channels": 16,
                                     "bias": False})
    cfg.FFE.NUM_FEATURES = 16
    pcr = [0, -8, -3, 16, 8, 1]
    vs, gs = [0.5, 0.5, 0.5], (32, 32, 8)
    model = cd.CaDDN(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                     voxel_size=vs, grid_size=gs)
    b, h, w = 1, 32, 64
    images = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    l2c = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                   np.float32)
    c2i = np.array([[40.0, 0, w / 2, 0], [0, 40.0, h / 2, 0], [0, 0, 1, 0]],
                   np.float32)
    l2c_b = jnp.asarray(np.tile(l2c, (b, 1, 1)))
    c2i_b = jnp.asarray(np.tile(c2i, (b, 1, 1)))
    _, gt = _toy_batch(rng, (16 / 3, -8 / 3))
    gt = gt[:b]
    depth_maps = jnp.asarray(rng.uniform(0, 20, (b, h, w)), jnp.float32)

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, images, l2c_b, c2i_b, gt, train=True)
    assert "ddn" in variables["params"], list(variables["params"])

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, l2c_b, c2i_b, gt, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return cd.caddn_loss(o, gt, cfg, depth_maps=depth_maps)[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    ddn_leaves = [np.asarray(g) for p, g in leaves
                  if jax.tree_util.keystr(p).startswith("['ddn']")]
    assert ddn_leaves and all(np.isfinite(g).all() for g in ddn_leaves)
    assert any(np.abs(g).max() > 0 for g in ddn_leaves), \
        "no gradient reached the DeepLab DDN"

    out_e = model.apply(variables, images, l2c_b, c2i_b, train=False)
    assert np.isfinite(np.asarray(out_e["batch_box_preds"])).all()
