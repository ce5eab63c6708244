"""Model-family dispatch: forward / loss / post-process per detector type.

The train/eval steps (train/state.py) are model-agnostic; this module maps a
MODEL config to the right apply signature, loss and post-processing — the
equivalent of the reference's Detector3DTemplate polymorphism.
"""
from __future__ import annotations


def is_grid_model(model_cfg) -> bool:
    return model_cfg.NAME in ("SECONDNet", "PointPillar")


def apply_train(model, model_cfg, variables, points, gt_boxes, rng):
    """Forward in train mode → (outputs, new_batch_stats).

    `points` is the batched point tensor for lidar models, or a dict of
    camera inputs (images, trans_lidar_to_cam, trans_cam_to_img, and the
    depth/2D-box supervision) for CaDDN.
    """
    kwargs = dict(mutable=["batch_stats"])
    if model_cfg.NAME == "CaDDN":
        out, mut = model.apply(
            variables, points["images"], points["trans_lidar_to_cam"],
            points["trans_cam_to_img"], gt_boxes, train=True,
            rngs={"dropout": rng}, **kwargs)  # ASPP dropout (DeepLab DDN)
        # depth/2D-box supervision rides along to caddn_loss
        if "depth_maps" in points:
            out["depth_maps"] = points["depth_maps"]
        if "gt_boxes2d" in points:
            out["gt_boxes2d"] = points["gt_boxes2d"]
    elif is_grid_model(model_cfg):
        out, mut = model.apply(variables, points, gt_boxes, train=True, **kwargs)
    else:
        out, mut = model.apply(
            variables, points, gt_boxes, train=True, rngs={"sampler": rng}, **kwargs
        )
    return out, mut["batch_stats"]


def apply_eval(model, model_cfg, variables, points):
    if model_cfg.NAME == "CaDDN":
        return model.apply(variables, points["images"],
                           points["trans_lidar_to_cam"],
                           points["trans_cam_to_img"], train=False)
    return model.apply(variables, points, train=False)


def is_parta2_free(model_cfg) -> bool:
    return (model_cfg.NAME == "PointRCNN"
            and model_cfg.get("BACKBONE_3D", None) is not None
            and model_cfg.BACKBONE_3D.get("NAME", "") == "UNetV2")


def compute_loss(out, gt_boxes, model_cfg, num_class: int = 1):
    if is_parta2_free(model_cfg):
        from .part_a2 import parta2_free_loss

        return parta2_free_loss(out, gt_boxes, model_cfg, num_class)
    if is_grid_model(model_cfg):
        from .grid_detectors import grid_detector_loss

        return grid_detector_loss(out, model_cfg, num_class)
    if model_cfg.NAME == "PVRCNN":
        from .pv_rcnn import pvrcnn_loss

        return pvrcnn_loss(out, gt_boxes, model_cfg, num_class)
    if model_cfg.NAME == "VoxelRCNN":
        from .voxel_rcnn import voxelrcnn_loss

        return voxelrcnn_loss(out, gt_boxes, model_cfg, num_class)
    if model_cfg.NAME in ("PartA2", "PartA2Net"):
        from .part_a2 import parta2_loss

        return parta2_loss(out, gt_boxes, model_cfg, num_class)
    if model_cfg.NAME in ("SECONDNetIoU", "SECONDIoU"):
        from .second_iou import second_iou_loss

        return second_iou_loss(out, gt_boxes, model_cfg, num_class)
    if model_cfg.NAME == "CaDDN":
        # camera models take (images, lidar_to_cam, cam_to_img) batches and
        # are driven by their own apply path; loss shares the dispatch
        from .caddn import caddn_loss

        return caddn_loss(out, gt_boxes, model_cfg, num_class)
    from .pointrcnn import pointrcnn_loss

    return pointrcnn_loss(out, gt_boxes, model_cfg, num_class)


def post_process(out, model_cfg):
    if is_grid_model(model_cfg):
        from .grid_detectors import grid_post_process

        return grid_post_process(out, model_cfg.POST_PROCESSING)
    # two-stage heads (PointRCNN, PVRCNN) share the refined-box NMS path
    from .pointrcnn import post_process as prcnn_post

    final = prcnn_post(out, model_cfg.POST_PROCESSING)
    final["rois"] = out.get("rois")
    return final
