"""End-to-end train→test CLI integration on the synthetic KITTI set (tiny model)."""
import pickle

import numpy as np
import pytest
import yaml

from modest_tpu.utils.config import Config, cfg_from_yaml_file

from synth_kitti import make_dataset
from test_pointrcnn_model import tiny_model_cfg

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_train")
    make_dataset(root, n_train=4, n_val=2, seed=3)
    data_cfg = cfg_from_yaml_file("configs/datasets/lyft_dataset_dynamic_obj.yaml")
    data_cfg.DATA_PROCESSOR = [
        Config({"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True}),
        Config({"NAME": "sample_points", "NUM_POINTS": {"train": 512, "test": 512}}),
        Config({"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}}),
    ]
    data_cfg.DATA_PATH = str(root)
    from modest_tpu.data.kitti_dataset import create_kitti_infos

    create_kitti_infos(data_cfg, ["Dynamic"], root, root)

    full = Config(
        {
            "CLASS_NAMES": ["Dynamic"],
            "DATA_CONFIG": data_cfg,
            "MODEL": tiny_model_cfg(),
            "OPTIMIZATION": {
                "BATCH_SIZE_PER_GPU": 1,
                "NUM_EPOCHS": 1,
                "OPTIMIZER": "adam_onecycle",
                "LR": 0.002,
                "WEIGHT_DECAY": 0.01,
                "MOMENTUM": 0.9,
                "MOMS": [0.95, 0.85],
                "PCT_START": 0.4,
                "DIV_FACTOR": 10,
                "GRAD_NORM_CLIP": 10,
            },
        }
    )
    cfg_file = root / "tiny_pointrcnn.yaml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(full.to_dict(), f)
    return root, cfg_file


def test_train_then_eval_cli(synth_env):
    root, cfg_file = synth_env
    out_dir = root / "output"
    from modest_tpu.cli import test as test_cli
    from modest_tpu.cli import train as train_cli

    state = train_cli.main(
        [
            "--cfg_file", str(cfg_file),
            "--batch_size", "2",
            "--epochs", "1",
            "--num_devices", "2",
            "--fix_random_seed",
            "--output_dir", str(out_dir),
        ]
    )
    assert state is not None
    assert (out_dir / "ckpt").exists()

    det_annos, metrics = test_cli.main(
        [
            "--cfg_file", str(cfg_file),
            "--ckpt_dir", str(out_dir / "ckpt"),
            "--batch_size", "2",
            "--num_devices", "2",
            "--output_dir", str(out_dir),
        ]
    )
    # result.pkl written in the format combine_labels expects
    result_files = list(out_dir.glob("eval/epoch_*/val/result.pkl"))
    assert result_files
    with open(result_files[0], "rb") as f:
        results = pickle.load(f)
    assert len(results) == 2  # val frames
    for r in results:
        for key in ["name", "location", "dimensions", "rotation_y", "score", "frame_id"]:
            assert key in r
    assert "Dynamic_bev_iou0.7/00-80_R40" in metrics
    assert np.isfinite(metrics["sec_per_example"])

    # --eval_all: evaluates every checkpoint once, records it, then exits
    # when no new checkpoint appears within max_waiting_mins
    det_annos2, metrics2 = test_cli.main(
        [
            "--cfg_file", str(cfg_file),
            "--ckpt_dir", str(out_dir / "ckpt"),
            "--batch_size", "2",
            "--num_devices", "2",
            "--output_dir", str(out_dir),
            "--eval_all", "--max_waiting_mins", "0",
        ]
    )
    assert "Dynamic_bev_iou0.7/00-80_R40" in metrics2
    record = out_dir / "eval" / "eval_list_val.txt"
    assert record.exists() and record.read_text().strip()


def test_demo_cli(synth_env, tmp_path):
    """demo.py runs raw .bin files through the full eval path and renders
    BEV PNGs (reference tools/demo.py, headless)."""
    root, cfg_file = synth_env
    from modest_tpu.cli import demo as demo_cli

    save_dir = tmp_path / "demo_out"
    results = demo_cli.main(
        [
            "--cfg_file", str(cfg_file),
            "--data_path", str(root / "training" / "velodyne"),
            "--ext", ".bin",
            "--save_dir", str(save_dir),
        ]
    )
    assert len(results) == 6  # 4 train + 2 val frames share the dir
    for r in results:
        assert r["boxes"].shape[1] == 7
        assert (save_dir / f"{r['frame_id']}.png").exists()


def test_metrics_logger(tmp_path):
    from modest_tpu.train.metrics import MetricsLogger

    m = MetricsLogger(tmp_path, use_tensorboard=False)
    m.log(1, {"loss": 2.5, "lr": 0.01}, prefix="train/")
    m.log(2, {"loss": 2.0}, prefix="train/")
    m.close()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 2.5
    assert lines[1]["step"] == 2


def test_plot_bev(tmp_path, rng):
    from modest_tpu.utils.visualize import plot_bev

    pts = rng.uniform(0, 50, (1000, 3))
    boxes = np.array([[20, 0, 0, 4, 2, 1.5, 0.4]])
    out = tmp_path / "bev.png"
    plot_bev(pts, boxes=boxes, point_color=pts[:, 2], save_path=out)
    assert out.exists() and out.stat().st_size > 1000


def test_merge_results_dist(tmp_path):
    from modest_tpu.parallel.multihost import merge_results_dist, shard_indices_for_process

    items = [{"frame_id": i} for i in range(11)]
    nproc = 3
    shards = [[items[j] for j in shard_indices_for_process(11, i, nproc)]
              for i in range(nproc)]
    for i in range(1, nproc):
        assert merge_results_dist(shards[i], tmp_path, part_id=i, num_parts=nproc) is None
    merged = merge_results_dist(shards[0], tmp_path, part_id=0, num_parts=nproc)
    assert [r["frame_id"] for r in merged] == list(range(11))


def test_load_params_partial(tmp_path):
    """Transfer load copies path+shape matching params, keeps the rest."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax.training import train_state as ts

    from modest_tpu.train.checkpoint import load_params_partial, make_manager, save_checkpoint

    class A(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4, name="d1")(nn.relu(nn.Dense(8, name="d0")(x)))

    class B(nn.Module):  # d0 matches, d1 reshaped, d2 new
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(8, name="d0")(x))
            x = nn.relu(nn.Dense(6, name="d1")(x))
            return nn.Dense(2, name="d2")(x)

    x = jnp.ones((1, 3))
    pa = A().init(jax.random.PRNGKey(0), x)["params"]
    sa = ts.TrainState.create(apply_fn=A().apply, params=pa, tx=optax.sgd(0.1))
    mgr = make_manager(tmp_path / "ckpt")
    save_checkpoint(mgr, sa, 1)
    mgr.wait_until_finished()

    pb = B().init(jax.random.PRNGKey(1), x)["params"]
    sb = ts.TrainState.create(apply_fn=B().apply, params=pb, tx=optax.sgd(0.1))
    loaded, n_loaded, n_skipped = load_params_partial(sb, tmp_path / "ckpt")
    assert n_loaded == 2  # d0 kernel + bias transfer
    assert n_skipped == 4  # d1 reshaped (2) + d2 new (2)
    np.testing.assert_array_equal(np.asarray(loaded.params["d0"]["kernel"]),
                                  np.asarray(pa["d0"]["kernel"]))
    # reshaped / new layers keep B's fresh init
    np.testing.assert_array_equal(np.asarray(loaded.params["d1"]["kernel"]),
                                  np.asarray(pb["d1"]["kernel"]))


def test_merge_all_iters_trains_one_pass(synth_env, tmp_path):
    """--merge_all_iters_to_one_epoch: the merged loader already spans
    total_epochs passes, so the run executes len(loader) steps TOTAL
    (reference train_utils semantics) — not len(loader) × epochs."""
    import jax

    from modest_tpu.cli import train as train_cli

    root, cfg_file = synth_env
    out_dir = tmp_path / "out_merged"
    state = train_cli.main(
        [
            "--cfg_file", str(cfg_file),
            "--batch_size", "2",
            "--epochs", "2",
            "--num_devices", "2",
            "--fix_random_seed",
            "--merge_all_iters_to_one_epoch",
            "--output_dir", str(out_dir),
        ]
    )
    # merged dataset: 4 train frames × 2 epochs = 8 samples → 4 steps @B=2
    assert int(jax.device_get(state.step)) == 4


def test_steps_per_dispatch_equivalence(synth_env, tmp_path):
    """--steps_per_dispatch 2 (lax.scan over stacked batches) trains to the
    SAME parameters as the default per-step driver on the same seed/stream,
    including the odd tail handled by single steps."""
    import jax
    import numpy as np

    from modest_tpu.cli import train as train_cli

    root, cfg_file = synth_env
    states = []
    for spd, tag in (("1", "spd1"), ("2", "spd2")):
        state = train_cli.main(
            [
                "--cfg_file", str(cfg_file),
                "--batch_size", "2",
                "--epochs", "1",
                "--num_devices", "2",
                "--fix_random_seed",
                "--steps_per_dispatch", spd,
                "--output_dir", str(tmp_path / f"out_{tag}"),
            ]
        )
        states.append(jax.device_get(state))
    assert int(states[0].step) == int(states[1].step) > 0
    for a, b in zip(jax.tree_util.tree_leaves(states[0].params),
                    jax.tree_util.tree_leaves(states[1].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
