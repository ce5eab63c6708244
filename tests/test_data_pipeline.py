"""Dataset / augmentor / loader tests on a synthetic KITTI directory."""
import numpy as np
import pytest

from modest_tpu.data.kitti_dataset import KittiDataset, create_kitti_infos, png_shape
from modest_tpu.data.loader import build_dataloader
from modest_tpu.utils.config import Config, cfg_from_yaml_file

from synth_kitti import IMG_SHAPE, make_dataset

CFG_PATH = "configs/datasets/lyft_dataset_dynamic_obj.yaml"


def data_cfg(num_points=1024):
    cfg = cfg_from_yaml_file(CFG_PATH)
    cfg.DATA_PROCESSOR = [
        Config({"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True}),
        Config({"NAME": "sample_points", "NUM_POINTS": {"train": num_points, "test": num_points}}),
        Config({"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}}),
    ]
    return cfg


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    gt = make_dataset(root, n_train=4, n_val=2, seed=1)
    cfg = data_cfg()
    create_kitti_infos(cfg, ["Dynamic"], root, root)
    return root, gt


def test_png_shape(kitti_root):
    root, _ = kitti_root
    shape = png_shape(root / "training" / "image_2" / "000000.png")
    np.testing.assert_array_equal(shape, IMG_SHAPE)


def test_infos_and_gt_database(kitti_root):
    import pickle

    root, gt = kitti_root
    with open(root / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 4
    info = infos[0]
    assert info["annos"]["name"].tolist() == ["Dynamic"] * len(gt[0])
    # lidar boxes in the info roundtrip to the synthetic gt
    np.testing.assert_allclose(
        np.sort(info["annos"]["gt_boxes_lidar"][:, :6], axis=0),
        np.sort(gt[0][:, :6], axis=0),
        atol=1e-3,
    )
    assert (info["annos"]["num_points_in_gt"] > 100).all()

    with open(root / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert "Dynamic" in db and len(db["Dynamic"]) >= 4
    entry = db["Dynamic"][0]
    pts = np.fromfile(root / entry["path"], np.float32).reshape(-1, 4)
    assert pts.shape[0] == entry["num_points_in_gt"]
    # crop points are box-centered
    assert np.abs(pts[:, :2]).max() < 3.0


def test_train_getitem_static_shape(kitti_root):
    root, _ = kitti_root
    np.random.seed(0)
    ds = KittiDataset(data_cfg(), ["Dynamic"], training=True, root_path=root)
    sample = ds[0]
    assert sample["points"].shape == (1024, 4)
    assert sample["gt_boxes"].shape[1] == 8
    assert sample["gt_boxes"][:, 7].min() >= 1  # class column
    # gt_sampling pasted boxes: more gt than the raw 1-2 cars (up to 40)
    assert sample["gt_boxes"].shape[0] >= 2


def test_eval_getitem(kitti_root):
    root, _ = kitti_root
    ds = KittiDataset(data_cfg(), ["Dynamic"], training=False, root_path=root)
    assert len(ds) == 2
    sample = ds[0]
    assert sample["points"].shape == (1024, 4)
    assert sample["frame_id"] == "000004"


def test_dataloader_batches(kitti_root):
    root, _ = kitti_root
    np.random.seed(0)
    _, loader = build_dataloader(data_cfg(), ["Dynamic"], batch_size=2,
                                 root_path=root, training=True, max_gt=48)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["points"].shape == (2, 1024, 4)
    assert b["gt_boxes"].shape == (2, 48, 8)
    assert b["batch_size"] == 2


def test_prediction_dicts_roundtrip(kitti_root):
    """generate_prediction_dicts converts lidar boxes to camera annos whose
    re-conversion matches."""
    from modest_tpu.utils import box_np

    root, gt = kitti_root
    ds = KittiDataset(data_cfg(), ["Dynamic"], training=False, root_path=root)
    boxes = gt[4]  # frame 000004 gt lidar boxes
    batch = {
        "frame_id": ["000004"],
        "calib": [ds.get_calib("000004")],
        "image_shape": [ds.get_image_shape("000004")],
    }
    preds = [{
        "pred_boxes": boxes,
        "pred_scores": np.ones(len(boxes)) * 0.9,
        "pred_labels": np.ones(len(boxes), int),
    }]
    annos = ds.generate_prediction_dicts(batch, preds, ["Dynamic"])
    a = annos[0]
    assert (a["name"] == "Dynamic").all()
    cam = np.concatenate(
        [a["location"], a["dimensions"], a["rotation_y"][:, None]], axis=1
    )
    back = box_np.boxes3d_kitti_camera_to_lidar(cam, batch["calib"][0])
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)


def test_camera_items_collate_and_caddn_step(kitti_root):
    """GET_ITEM_LIST camera path: images/depth/calib load with static
    shapes, survive collate, and drive one numeric CaDDN train step
    (apply_train dict input → depth+2D-box supervised loss → finite grads)."""
    import jax
    import jax.numpy as jnp

    root, _ = kitti_root
    cfg = data_cfg(num_points=1024)
    cfg.GET_ITEM_LIST = ["points", "images", "depth_maps", "calib_matricies",
                         "gt_boxes2d"]
    cfg.IMAGE_PAD = [256, 1216]
    cfg.DATA_PROCESSOR.append(Config({"NAME": "calculate_grid_size",
                                      "VOXEL_SIZE": [0.5, 0.5, 0.5]}))
    cfg.DATA_PROCESSOR.append(Config({"NAME": "downsample_depth_map",
                                      "DOWNSAMPLE_FACTOR": 4}))
    cfg.DATA_AUGMENTOR = Config({
        "DISABLE_AUG_LIST": ["placeholder"],
        "AUG_CONFIG_LIST": [Config({"NAME": "random_image_flip",
                                    "ALONG_AXIS_LIST": ["horizontal"]})],
    })
    np.random.seed(0)
    ds = KittiDataset(cfg, ["Dynamic"], training=True, root_path=root)
    s = ds[0]
    assert s["images"].shape == (256, 1216, 3)
    assert s["depth_maps"].shape == (64, 304)
    assert s["trans_lidar_to_cam"].shape == (4, 4)
    assert s["trans_cam_to_img"].shape == (3, 4)
    assert (s["depth_maps"] > 0).sum() > 50  # lidar actually projected
    assert s["gt_boxes2d"].shape[1] == 4
    assert tuple(ds.grid_size) == (181, 160, 8)

    from modest_tpu.data.loader import collate_batch
    from modest_tpu.train.loop import model_inputs

    batch = collate_batch([s, ds[1 % len(ds)]], max_gt=8)
    assert batch["images"].shape == (2, 256, 1216, 3)
    assert batch["depth_maps"].shape == (2, 64, 304)
    assert batch["gt_boxes2d"].shape == (2, 8, 4)

    from tests.test_caddn import caddn_model_cfg
    from modest_tpu.models import build_network, api
    import types

    mcfg = caddn_model_cfg()
    dataset_ns = types.SimpleNamespace(
        point_cloud_range=np.array([0, -8, -3, 16, 8, 1], np.float32),
        voxel_size=[0.5, 0.5, 0.5], grid_size=np.array([32, 32, 8]),
        class_names=["Dynamic"])
    model = build_network(mcfg, num_class=1, dataset=dataset_ns)
    inputs = model_inputs(batch)
    assert isinstance(inputs, dict) and "images" in inputs
    gt = jnp.asarray(batch["gt_boxes"])
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           inputs["images"], inputs["trans_lidar_to_cam"],
                           inputs["trans_cam_to_img"], gt, train=True)

    def loss_fn(params):
        out, _ = api.apply_train(
            model, mcfg, {"params": params,
                          "batch_stats": variables["batch_stats"]},
            inputs, gt, jax.random.PRNGKey(1))
        assert "depth_maps" in out and "gt_boxes2d" in out
        loss, metrics = api.compute_loss(out, gt, mcfg, 1)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert "depth_loss" in metrics and np.isfinite(float(metrics["depth_loss"]))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
