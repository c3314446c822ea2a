"""Dataset/stream factory.

Re-design of /root/reference/droid_slam/data_readers/factory.py:
training datasets by name (concatenated sampling), evaluation streams by
marker-file dispatch.
"""

import os.path as osp

import numpy as np


def dataset_factory(dataset_list, **kwargs):
    """Build a concatenated training dataset (factory.py:17-31)."""
    from .tartan import TartanAir

    registry = {"tartan": TartanAir}
    datasets = [registry[name](**kwargs) for name in dataset_list]
    if len(datasets) == 1:
        return datasets[0]
    return ConcatDataset(datasets)


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self.lengths = np.asarray([len(d) for d in datasets])
        self.offsets = np.concatenate([[0], np.cumsum(self.lengths)])

    def __len__(self):
        return int(self.lengths.sum())

    def __getitem__(self, index):
        index = index % len(self)
        d = int(np.searchsorted(self.offsets, index, side="right") - 1)
        return self.datasets[d][index - int(self.offsets[d])]

    def sample_batches(self, batch_size, rng=None, shuffle=True):
        import random

        rng = rng or random.Random(0)
        order = list(range(len(self)))
        while True:
            if shuffle:
                rng.shuffle(order)
            for s in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[i] for i in order[s:s + batch_size]]
                yield {
                    k: np.stack([it[k] for it in items]) for k in items[0]
                }


def create_stream(datapath, **kwargs):
    """Dispatch an evaluation stream by dataset marker files
    (factory.py:34-59 semantics)."""
    from . import streams

    # marker-file priority mirrors the reference dispatch
    # (factory.py:40-55: calibration.txt -> ETH3D, image_left ->
    # TartanAir, rgb.txt -> TUM, mav0 -> EuRoC, calib.txt -> KITTI)
    if osp.isfile(osp.join(datapath, "calibration.txt")):
        return streams.eth3d_stream(datapath, **kwargs)
    if osp.isdir(osp.join(datapath, "image_left")):
        return streams.tartan_stream(datapath, **kwargs)
    if osp.isfile(osp.join(datapath, "rgb.txt")) or \
       osp.isdir(osp.join(datapath, "rgb")):
        return streams.tum_stream(datapath, **kwargs)
    if osp.isfile(osp.join(datapath, "mav0", "cam0", "data.csv")) or \
       osp.isdir(osp.join(datapath, "mav0")):
        return streams.euroc_stream(datapath, **kwargs)
    if osp.isfile(osp.join(datapath, "calib.txt")):
        return streams.kitti_stream(datapath, **kwargs)
    raise ValueError(f"unrecognized dataset layout at {datapath}")
