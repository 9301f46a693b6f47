"""Datasets and input pipeline: PLY IO, CARLA segmentation datasets,
synthetic clouds, host-side prefetching loader, FPS."""
from ndtpu.data.ply import read_ply, write_ply, count_ply_points  # noqa: F401
from ndtpu.data.carla import CarlaSeg, CarlaNDTSeg, class_to_color, color_to_class  # noqa: F401
from ndtpu.data.synthetic import random_cloud, clustered_cloud, SyntheticSeg  # noqa: F401
from ndtpu.data.loader import batch_iterator, prefetch_to_device  # noqa: F401
from ndtpu.data.classification import ModelNetCls, SyntheticCls, read_off  # noqa: F401
