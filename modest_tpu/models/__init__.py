from .pointrcnn import PointRCNN  # noqa: F401


def build_network(model_cfg, num_class: int, dataset):
    """Instantiate a detector from a model config (reference build_network)."""
    name = model_cfg.NAME
    if name == "PointRCNN" and model_cfg.get("BACKBONE_3D", None) is not None \
            and model_cfg.BACKBONE_3D.get("NAME", "") == "UNetV2":
        # the reference's PartA2-free config keeps NAME PointRCNN but swaps
        # the backbone to the sparse UNet (kitti_models/PartA2_free.yaml)
        from .part_a2 import PartA2Free

        return PartA2Free(model_cfg=model_cfg, num_class=num_class,
                          point_cloud_range=dataset.point_cloud_range,
                          voxel_size=dataset.voxel_size,
                          grid_size=dataset.grid_size)
    if name == "PointRCNN":
        return PointRCNN(model_cfg=model_cfg, num_class=num_class,
                         point_cloud_range=dataset.point_cloud_range)
    if name in ("SECONDNet", "PointPillar"):
        from .grid_detectors import GridDetector

        return GridDetector(model_cfg=model_cfg, num_class=num_class,
                            point_cloud_range=dataset.point_cloud_range,
                            voxel_size=dataset.voxel_size,
                            grid_size=dataset.grid_size,
                            class_names=tuple(getattr(dataset, "class_names",
                                                      ()) or ()) or None)
    if name == "PVRCNN":
        from .pv_rcnn import PVRCNN

        return PVRCNN(model_cfg=model_cfg, num_class=num_class,
                      point_cloud_range=dataset.point_cloud_range,
                      voxel_size=dataset.voxel_size,
                      grid_size=dataset.grid_size)
    if name == "VoxelRCNN":
        from .voxel_rcnn import VoxelRCNN

        return VoxelRCNN(model_cfg=model_cfg, num_class=num_class,
                         point_cloud_range=dataset.point_cloud_range,
                         voxel_size=dataset.voxel_size,
                         grid_size=dataset.grid_size)
    if name in ("SECONDNetIoU", "SECONDIoU"):
        from .second_iou import SECONDIoU

        return SECONDIoU(model_cfg=model_cfg, num_class=num_class,
                         point_cloud_range=dataset.point_cloud_range,
                         voxel_size=dataset.voxel_size,
                         grid_size=dataset.grid_size)
    if name in ("PartA2", "PartA2Net"):
        from .part_a2 import PartA2

        return PartA2(model_cfg=model_cfg, num_class=num_class,
                      point_cloud_range=dataset.point_cloud_range,
                      voxel_size=dataset.voxel_size,
                      grid_size=dataset.grid_size)
    if name == "CaDDN":
        from .caddn import CaDDN

        return CaDDN(model_cfg=model_cfg, num_class=num_class,
                     point_cloud_range=dataset.point_cloud_range,
                     voxel_size=dataset.voxel_size,
                     grid_size=dataset.grid_size)
    raise NotImplementedError(name)
