"""Training-time augmentation: color jitter + random scale + crop.

Re-design of /root/reference/droid_slam/data_readers/augmentation.py in
numpy/cv2 (no torchvision): brightness/contrast/saturation/hue jitter,
a random spatial rescale in 2^[min_scale, 0.25] bounded below so the crop
fits, and a crop with intrinsics adjustment.
"""

import numpy as np


def _color_jitter(images, rng):
    """images: (N, H, W, 3) float RGB in [0,255]."""
    brightness = rng.uniform(0.6, 1.4)
    contrast = rng.uniform(0.6, 1.4)
    saturation = rng.uniform(0.6, 1.4)
    hue_shift = rng.uniform(-0.5 / 3.14, 0.5 / 3.14) * 180.0

    out = images * brightness
    mean = out.mean(axis=(-3, -2, -1), keepdims=True)
    out = (out - mean) * contrast + mean
    gray = out.mean(axis=-1, keepdims=True)
    out = (out - gray) * saturation + gray

    if abs(hue_shift) > 1e-3:
        import cv2
        res = []
        for im in np.clip(out, 0, 255).astype(np.uint8):
            hsv = cv2.cvtColor(im, cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                           + int(hue_shift)) % 180
            res.append(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB))
        out = np.stack(res).astype(np.float32)
    return np.clip(out, 0, 255)


def augment_sample(images, poses, disps, intrinsics, crop_size,
                   rng=None, do_color=True):
    """Augment one sample (augmentation.py:23-58 semantics).

    images: (N, H, W, 3) f32; disps: (N, H, W); intrinsics: (N, 4).
    Returns cropped arrays of spatial size crop_size.
    """
    import cv2

    rng = rng or np.random.default_rng()
    N, H, W = images.shape[:3]
    ch, cw = crop_size

    if do_color and rng.random() < 0.5:
        images = _color_jitter(images, rng)

    # random scale: at least enough that the crop fits
    min_scale = max(ch / H, cw / W)
    scale = 2 ** rng.uniform(np.log2(min_scale) if min_scale > 1 else
                             max(np.log2(min_scale), -0.25), 0.25)
    scale = max(scale, min_scale)

    H1, W1 = int(round(H * scale)), int(round(W * scale))
    imgs, dsp = [], []
    for n in range(N):
        imgs.append(cv2.resize(images[n], (W1, H1),
                               interpolation=cv2.INTER_LINEAR))
        dsp.append(cv2.resize(disps[n], (W1, H1),
                              interpolation=cv2.INTER_NEAREST))
    images = np.stack(imgs)
    disps = np.stack(dsp)
    intrinsics = intrinsics * np.asarray(
        [W1 / W, H1 / H, W1 / W, H1 / H], np.float32
    )

    # center-ish crop
    y0 = (H1 - ch) // 2
    x0 = (W1 - cw) // 2
    images = images[:, y0:y0 + ch, x0:x0 + cw]
    disps = disps[:, y0:y0 + ch, x0:x0 + cw]
    intrinsics = intrinsics - np.asarray([0, 0, x0, y0], np.float32)

    return images, poses, disps, intrinsics
