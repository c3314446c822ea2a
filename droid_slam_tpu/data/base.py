"""Training dataset base: covisibility-graph frame sampling.

Re-design of /root/reference/droid_slam/data_readers/base.py (RGBDDataset)
without torch: scene indices are built once and pickle-cached; samples are
random walks over the flow-covisibility graph bounded by [fmin, fmax];
each sample is scale-normalized (mean disparity → 1).  Yields numpy
arrays in this framework's conventions (RGB images HWC, w2c poses [t,q]).
"""

import os
import os.path as osp
import pickle
import random

import numpy as np

from .augmentation import augment_sample
from .rgbd_utils import build_frame_graph_from_files

CACHE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "cache")


class RGBDDataset:
    def __init__(self, name, datapath, n_frames=4, crop_size=(384, 512),
                 fmin=8.0, fmax=75.0, do_aug=True, cache_dir=None):
        self.name = name
        self.root = datapath
        self.n_frames = n_frames
        self.fmin = fmin
        self.fmax = fmax
        self.do_aug = do_aug
        self.crop_size = tuple(crop_size)

        cache_dir = cache_dir or CACHE_DIR
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = osp.join(cache_dir, f"{name}.pickle")
        if osp.isfile(cache_path):
            with open(cache_path, "rb") as f:
                scene_info = pickle.load(f)[0]
        else:
            scene_info = self._build_dataset()
            with open(cache_path, "wb") as f:
                pickle.dump((scene_info,), f)

        self.scene_info = scene_info
        self._build_dataset_index()

    # -- subclass hooks ----------------------------------------------------

    def _build_dataset(self):
        raise NotImplementedError

    @staticmethod
    def is_test_scene(scene):
        return False

    @staticmethod
    def image_read(image_file):
        import cv2
        img = cv2.imread(image_file)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    @staticmethod
    def depth_read(depth_file):
        return np.load(depth_file)

    # ----------------------------------------------------------------------

    def build_frame_graph(self, poses, depths, intrinsics, f=16,
                          max_flow=256):
        return build_frame_graph_from_files(
            poses, depths, intrinsics, self.__class__.depth_read,
            f=f, max_flow=max_flow,
        )

    def _build_dataset_index(self):
        self.dataset_index = []
        for scene in self.scene_info:
            if not self.__class__.is_test_scene(scene):
                graph = self.scene_info[scene]["graph"]
                for i in graph:
                    if len(graph[i][0]) > self.n_frames:
                        self.dataset_index.append((scene, i))

    def __len__(self):
        return len(self.dataset_index)

    def __getitem__(self, index):
        """Returns dict(images (N,H,W,3) f32 RGB, poses (N,7) w2c,
        disps (N,H,W) f32, intrinsics (N,4))."""
        scene_id, ix = self.dataset_index[index % len(self.dataset_index)]

        info = self.scene_info[scene_id]
        graph = info["graph"]

        inds = [ix]
        while len(inds) < self.n_frames:
            k = (graph[ix][1] > self.fmin) & (graph[ix][1] < self.fmax)
            frames = graph[ix][0][k]
            if np.count_nonzero(frames[frames > ix]):
                ix = np.random.choice(frames[frames > ix])
            elif np.count_nonzero(frames):
                ix = np.random.choice(frames)
            inds.append(ix)

        images = np.stack(
            [self.__class__.image_read(info["images"][i]) for i in inds]
        ).astype(np.float32)
        depths = np.stack(
            [self.__class__.depth_read(info["depths"][i]) for i in inds]
        ).astype(np.float32)
        poses = np.stack([info["poses"][i] for i in inds]).astype(np.float32)
        intrinsics = np.stack(
            [info["intrinsics"][i] for i in inds]
        ).astype(np.float32)

        disps = 1.0 / depths

        if self.do_aug:
            images, poses, disps, intrinsics = augment_sample(
                images, poses, disps, intrinsics, self.crop_size
            )

        # scale normalization (base.py:144-148)
        valid = disps > 0.01
        if valid.any():
            s = disps[valid].mean()
            disps = disps / s
            poses = poses.copy()
            poses[..., :3] *= s

        return dict(images=images, poses=poses, disps=disps,
                    intrinsics=intrinsics)

    def sample_batches(self, batch_size, rng=None, shuffle=True):
        """Infinite generator of stacked batches."""
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
