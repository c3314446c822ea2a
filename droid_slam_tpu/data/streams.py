"""Evaluation image streams: TUM-RGBD, EuRoC (mono/stereo), ETH3D, generic.

Re-designs the per-script stream generators of the reference evaluation
suite (evaluation_scripts/test_{tum,euroc,eth3d}.py image_stream functions
and data_readers/stream.py) as one module.  All streams yield
``(t, image, intrinsics)`` with RGB HWC uint8 images (stereo: (2,H,W,3))
and fx/fy/cx/cy at full stream resolution; RGB-D streams yield
``(t, image, depth, intrinsics)``.
"""

import glob
import os
import os.path as osp

import numpy as np

# EuRoC rectification constants (test_euroc.py:29-49)
_EUROC_K_L = np.array(
    [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0, 0, 1]
).reshape(3, 3)
_EUROC_D_L = np.array(
    [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
)
_EUROC_R_L = np.array([
    0.999966347530033, -0.001422739138722922, 0.008079580483432283,
    0.001365741834644127, 0.9999741760894847, 0.007055629199258132,
    -0.008089410156878961, -0.007044357138835809, 0.9999424675829176,
]).reshape(3, 3)
_EUROC_P_L = np.array([
    435.2046959714599, 0, 367.4517211914062, 0,
    0, 435.2046959714599, 252.2008514404297, 0,
    0, 0, 1, 0,
]).reshape(3, 4)
_EUROC_K_R = np.array(
    [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0, 0, 1]
).reshape(3, 3)
_EUROC_D_R = np.array(
    [-0.28368365, 0.07451284, -0.00010473, -3.555907e-05, 0.0]
)
_EUROC_R_R = np.array([
    0.9999633526194376, -0.003625811871560086, 0.007755443660172947,
    0.003680398547259526, 0.9999684752771629, -0.007035845251224894,
    -0.007729688520722713, 0.007064130529506649, 0.999945173484644,
]).reshape(3, 3)
_EUROC_P_R = np.array([
    435.2046959714599, 0, 367.4517211914062, -47.90639384423901,
    0, 435.2046959714599, 252.2008514404297, 0,
    0, 0, 1, 0,
]).reshape(3, 4)


def tum_stream(datapath, stride=2):
    """TUM-RGBD mono stream (test_tum.py:23-51): undistort with the fr
    intrinsics, resize to 352x256, crop the distortion boundary to
    240x320."""
    import cv2

    fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3
    K = np.array([fx, 0, cx, 0, fy, cy, 0, 0, 1]).reshape(3, 3)
    d = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])

    images_list = sorted(
        glob.glob(osp.join(datapath, "rgb", "*.png"))
    )[::stride]

    for t, imfile in enumerate(images_list):
        image = cv2.imread(imfile)
        image = cv2.undistort(image, K, d)
        image = cv2.resize(image, (320 + 32, 240 + 16))
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

        intr = np.array([
            fx * 352 / 640.0, fy * 256 / 480.0,
            cx * 352 / 640.0 - 16, cy * 256 / 480.0 - 8,
        ], np.float32)
        image = image[8:-8, 16:-16]
        yield t, image, intr


def euroc_stream(datapath, stereo=False, stride=1, image_size=(320, 512)):
    """EuRoC MAV stream (test_euroc.py:26-74): stereo rectification maps,
    resize to image_size."""
    import cv2

    ht0, wd0 = 480, 752
    map_l = cv2.initUndistortRectifyMap(
        _EUROC_K_L, _EUROC_D_L, _EUROC_R_L, _EUROC_P_L[:3, :3],
        (wd0, ht0), cv2.CV_32F,
    )
    map_r = cv2.initUndistortRectifyMap(
        _EUROC_K_R, _EUROC_D_R, _EUROC_R_R, _EUROC_P_R[:3, :3],
        (wd0, ht0), cv2.CV_32F,
    )
    intr0 = np.array([
        435.2046959714599, 435.2046959714599,
        367.4517211914062, 252.2008514404297,
    ])

    images_left = sorted(
        glob.glob(osp.join(datapath, "mav0/cam0/data/*.png"))
    )[::stride]
    images_right = [x.replace("cam0", "cam1") for x in images_left]

    H, W = image_size
    for t, (imgL, imgR) in enumerate(zip(images_left, images_right)):
        if stereo and not osp.isfile(imgR):
            continue
        tstamp = float(osp.basename(imgL)[:-4])
        ims = [cv2.remap(cv2.imread(imgL), map_l[0], map_l[1],
                         interpolation=cv2.INTER_LINEAR)]
        if stereo:
            ims.append(cv2.remap(cv2.imread(imgR), map_r[0], map_r[1],
                                 interpolation=cv2.INTER_LINEAR))
        ims = [
            cv2.cvtColor(cv2.resize(im, (W, H)), cv2.COLOR_BGR2RGB)
            for im in ims
        ]
        image = np.stack(ims, 0) if stereo else ims[0]

        intr = intr0 * np.array([W / wd0, H / ht0, W / wd0, H / ht0])
        yield stride * t, image, intr.astype(np.float32), tstamp


def eth3d_stream(datapath, stride=1, depth_scale=5000.0):
    """ETH3D-SLAM RGB-D stream (test_eth3d.py image_stream): associated
    rgb/depth pairs, depth/5000."""
    import cv2

    from ..geom.align import associate

    rgb_list = np.loadtxt(
        osp.join(datapath, "rgb.txt"), dtype=str, skiprows=0
    ).reshape(-1, 2)
    depth_list = np.loadtxt(
        osp.join(datapath, "depth.txt"), dtype=str, skiprows=0
    ).reshape(-1, 2)
    calib = np.loadtxt(osp.join(datapath, "calibration.txt"))

    matches = associate(
        rgb_list[:, 0].astype(np.float64),
        depth_list[:, 0].astype(np.float64),
    )[::stride]

    for t, (i, j) in enumerate(matches):
        tstamp = float(rgb_list[i, 0])
        image = cv2.imread(osp.join(datapath, rgb_list[i, 1]))
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        depth = cv2.imread(
            osp.join(datapath, depth_list[j, 1]), cv2.IMREAD_ANYDEPTH
        ).astype(np.float32) / depth_scale
        # crop to a multiple of 8
        h, w = image.shape[:2]
        h8, w8 = h - h % 8, w - w % 8
        yield t, image[:h8, :w8], depth[:h8, :w8], calib[:4].astype(
            np.float32
        ), tstamp


def tartan_stream(datapath, stride=1):
    """TartanAir scene stream: `image_left/*.png` at the fixed TartanAir
    pinhole calibration (reference tartan.py:73-105 TartanAirStream).

    Yields (t, (H, W, 3) RGB uint8, fx/fy/cx/cy).
    """
    import cv2

    intr = np.array([320.0, 320.0, 320.0, 240.0], np.float32)
    paths = sorted(
        glob.glob(osp.join(datapath, "image_left", "*.png"))
    )[::stride]
    for t, path in enumerate(paths):
        image = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        h, w = image.shape[:2]
        yield t, image[: h - h % 8, : w - w % 8], intr


def kitti_stream(datapath, stride=1, stereo=False):
    """KITTI odometry sequence stream: `image_2/` (+ `image_3/` right)
    with the sequence `calib.txt` P2/P3 projection rows.

    The reference's factory dispatches `calib.txt` layouts to a
    KITTIStream (factory.py:51-52) that its repo never defines — this is
    the working implementation of that dead branch.

    Yields (t, image, intr) or, with stereo, (t, left, right, intr);
    images cropped to a multiple of 8.
    """
    import cv2

    # calib.txt rows: "P0: <12 floats>" (3x4 projections); color cams
    # are P2 (left) / P3 (right)
    P = {}
    with open(osp.join(datapath, "calib.txt")) as f:
        for line in f:
            if ":" in line:
                k, v = line.split(":", 1)
                P[k.strip()] = np.fromstring(v, sep=" ").reshape(3, 4)
    P2 = P["P2"] if "P2" in P else P["P0"]
    intr = np.array(
        [P2[0, 0], P2[1, 1], P2[0, 2], P2[1, 2]], np.float32
    )

    ldir = "image_2" if osp.isdir(osp.join(datapath, "image_2")) else \
        "image_0"
    rdir = "image_3" if osp.isdir(osp.join(datapath, "image_3")) else \
        "image_1"
    lefts = sorted(glob.glob(osp.join(datapath, ldir, "*.png")))[::stride]
    rights = sorted(glob.glob(osp.join(datapath, rdir, "*.png")))[::stride]

    def load(path):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        return img[: h - h % 8, : w - w % 8]

    for t, lp in enumerate(lefts):
        if stereo:
            yield t, load(lp), load(rights[t]), intr
        else:
            yield t, load(lp), intr


def directory_stream(imagedir, calib, stride=1, target_area=384 * 512):
    """Generic calibrated image-directory stream (demo.py:23-51)."""
    import cv2

    calib = np.loadtxt(calib, delimiter=" ")
    fx, fy, cx, cy = calib[:4]
    K = np.eye(3)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = fx, cx, fy, cy

    paths = sorted(
        glob.glob(osp.join(imagedir, "*.png"))
        + glob.glob(osp.join(imagedir, "*.jpg"))
    )[::stride]

    for t, path in enumerate(paths):
        image = cv2.imread(path)
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])
        h0, w0 = image.shape[:2]
        s = np.sqrt(target_area / (h0 * w0))
        h1, w1 = int(h0 * s), int(w0 * s)
        image = cv2.resize(image, (w1, h1))
        image = image[: h1 - h1 % 8, : w1 - w1 % 8]
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        intr = np.array(
            [fx * w1 / w0, fy * h1 / h0, cx * w1 / w0, cy * h1 / h0],
            np.float32,
        )
        yield t, image, intr


def stereo_directory_stream(datapath, calib, stride=1,
                            target_area=384 * 512):
    """Generic calibrated stereo stream: `image_left/` + `image_right/`
    subdirectories with matching sorted filenames (reference
    StereoStream, stream.py:127-184).

    Yields (t, (H, W, 3) left RGB, (H, W, 3) right RGB, intrinsics).
    """
    import cv2

    calib = np.loadtxt(calib, delimiter=" ")
    fx, fy, cx, cy = calib[:4]
    K = np.eye(3)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = fx, cx, fy, cy

    def listdir(sub):
        return sorted(
            glob.glob(osp.join(datapath, sub, "*.png"))
            + glob.glob(osp.join(datapath, sub, "*.jpg"))
        )[::stride]

    lefts, rights = listdir("image_left"), listdir("image_right")

    def load(path, w0h0=[None]):
        image = cv2.imread(path)
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])
        h0, w0 = image.shape[:2]
        s = np.sqrt(target_area / (h0 * w0))
        h1, w1 = int(h0 * s), int(w0 * s)
        image = cv2.resize(image, (w1, h1))
        image = image[: h1 - h1 % 8, : w1 - w1 % 8]
        w0h0[0] = (h0, w0, h1, w1)
        return cv2.cvtColor(image, cv2.COLOR_BGR2RGB), w0h0[0]

    for t, (lp, rp) in enumerate(zip(lefts, rights)):
        left, (h0, w0, h1, w1) = load(lp)
        right, _ = load(rp)
        intr = np.array(
            [fx * w1 / w0, fy * h1 / h0, cx * w1 / w0, cy * h1 / h0],
            np.float32,
        )
        yield t, left, right, intr


def rgbd_directory_stream(datapath, calib, stride=1, depth_scale=1000.0):
    """Generic calibrated RGB-D stream: `rgb/` + `depth/` subdirectories
    with matching sorted filenames; depth PNGs divided by depth_scale
    (reference RGBDStream, stream.py:18-72).

    Yields (t, (H, W, 3) RGB, (H, W) metric depth, intrinsics).
    """
    import cv2

    calib = np.loadtxt(calib, delimiter=" ")
    intr = calib[:4].astype(np.float32)

    rgbs = sorted(
        glob.glob(osp.join(datapath, "rgb", "*.png"))
        + glob.glob(osp.join(datapath, "rgb", "*.jpg"))
    )[::stride]
    depths = sorted(glob.glob(osp.join(datapath, "depth", "*.png")))[::stride]

    for t, (ip, dp) in enumerate(zip(rgbs, depths)):
        image = cv2.cvtColor(cv2.imread(ip), cv2.COLOR_BGR2RGB)
        depth = cv2.imread(dp, cv2.IMREAD_ANYDEPTH).astype(
            np.float32
        ) / depth_scale
        h, w = image.shape[:2]
        h8, w8 = h - h % 8, w - w % 8
        yield t, image[:h8, :w8], depth[:h8, :w8], intr
