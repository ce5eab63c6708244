from .kitti_dataset import KittiDataset, create_kitti_infos  # noqa: F401
from .loader import build_dataloader  # noqa: F401
