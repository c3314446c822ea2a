"""Synthetic textured-plane scenes with exact ground truth.

The environment has no SLAM datasets, so tests and benchmarks render their
own: a camera moving in front of a textured fronto-parallel plane, with
analytically exact depth maps and poses.  `write_tartanair_scene` emits the
TartanAir on-disk layout (image_left/*.png, depth_left/*.npy,
pose_left.txt in NED order, ×DEPTH_SCALE) so the real dataset reader and
covisibility pipeline are exercised end-to-end — the test strategy
SURVEY.md §4 prescribes for a reference with no test suite.
"""

import os
import os.path as osp

import numpy as np

from ..lie import se3


def _texture(rng, size=512):
    """Smooth random RGB texture via upsampled noise octaves."""
    tex = np.zeros((size, size, 3), np.float32)
    for octave, amp in [(8, 80), (32, 50), (128, 25)]:
        import cv2
        noise = rng.random((octave, octave, 3)).astype(np.float32)
        tex += amp * cv2.resize(noise, (size, size),
                                interpolation=cv2.INTER_LINEAR)
    tex = 255 * (tex - tex.min()) / (np.ptp(tex) + 1e-6)
    return tex.astype(np.float32)


def render_plane_scene(n_frames=12, H=96, W=128, plane_z=2.0, seed=0,
                       motion_scale=0.04, focal=0.9, tilt=0.0):
    """Render a camera trajectory viewing a textured plane.

    The plane passes through (0, 0, plane_z); `tilt` (radians) rotates its
    normal away from -z about a random in-plane axis, giving slanted
    geometry with real depth gradients (curriculum diversity — the
    fronto-parallel default is a degenerate constant-depth case).
    `focal` sets fx = fy = focal * W.

    Returns dict(images (N,H,W,3) uint8 RGB, poses_c2w (N,7),
    depths (N,H,W) f32, intrinsics (N,4)).
    """
    import cv2

    rng = np.random.default_rng(seed)
    tex = _texture(rng)
    tex_size = tex.shape[0]
    fx = fy = focal * W
    cx, cy = W / 2, H / 2
    intr = np.array([fx, fy, cx, cy], np.float32)

    # plane frame: unit normal (towards the camera) + in-plane basis
    if tilt != 0.0:
        phi = rng.uniform(0, 2 * np.pi)
        axis = np.array([np.cos(phi), np.sin(phi), 0.0])
        # rotate -z by `tilt` about `axis` (Rodrigues)
        nz = np.array([0.0, 0.0, -1.0])
        normal = (nz * np.cos(tilt)
                  + np.cross(axis, nz) * np.sin(tilt)
                  + axis * np.dot(axis, nz) * (1 - np.cos(tilt)))
    else:
        normal = np.array([0.0, 0.0, -1.0])
    normal = normal / np.linalg.norm(normal)
    e1 = np.cross(normal, [0.0, 1.0, 0.0])
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(normal, e1)
    p0 = np.array([0.0, 0.0, plane_z])

    # smooth random walk (c2w): mostly lateral translation + small rotation
    steps = motion_scale * rng.standard_normal((n_frames, 6))
    steps[:, 2] *= 0.3       # limit z motion
    steps[:, 3:] *= 0.3      # limit rotation
    steps[0] = 0
    xi = np.cumsum(steps, axis=0)
    poses_c2w = np.asarray(se3.exp(xi.astype(np.float32)))

    # world->texture mapping: 1 world unit = tex_size/4 px, centered
    w2t = tex_size / 4.0

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1
    )

    images, depths = [], []
    import jax.numpy as jnp
    from ..lie import so3

    for n in range(n_frames):
        g = poses_c2w[n]
        Rd = np.asarray(so3.act(jnp.asarray(g[3:7]), jnp.asarray(
            dirs.reshape(-1, 3)))).reshape(H, W, 3)
        o = g[:3]
        denom = Rd @ normal
        t = ((p0 - o) @ normal) / np.where(np.abs(denom) < 1e-6, 1e-6,
                                           denom)
        t = np.clip(t, 0.05, 100.0)
        pw = o + t[..., None] * Rd                    # world points
        # dirs has camera-z component 1, so the camera z-depth of the
        # intersection is exactly the ray parameter t
        depth = t

        rel = pw - p0
        u = (rel @ e1) * w2t + tex_size / 2
        v = (rel @ e2) * w2t + tex_size / 2
        img = cv2.remap(
            tex, u.astype(np.float32), v.astype(np.float32),
            interpolation=cv2.INTER_LINEAR, borderMode=cv2.BORDER_WRAP,
        )
        images.append(np.clip(img, 0, 255).astype(np.uint8))
        depths.append(depth.astype(np.float32))

    return dict(
        images=np.stack(images), poses_c2w=poses_c2w.astype(np.float32),
        depths=np.stack(depths), intrinsics=np.tile(intr, (n_frames, 1)),
    )


def render_box_scene(n_frames=12, H=96, W=128, seed=0, motion_scale=0.08,
                     box=(2.5, 1.8, 6.0), focal=0.9, n_obstacles=0,
                     intrinsics=None, poses_c2w=None):
    """Render a camera moving inside a textured box — varied depth,
    parallax, occlusion boundaries at wall joints, and larger motions
    than the fronto-parallel plane scene (curriculum for learned-weight
    training; VERDICT r1 #2 'varied geometry').

    The box spans x ∈ [−bx, bx], y ∈ [−by, by], z ∈ [−1, bz]; the camera
    random-walks near the center looking toward +z.  Depth maps and poses
    are analytically exact (nearest ray/plane intersection).

    Returns the same dict layout as render_plane_scene.
    """
    import cv2

    rng = np.random.default_rng(seed)
    bx, by, bz = box
    if intrinsics is not None:
        # explicit pinhole calibration (e.g. the EuRoC rectified model,
        # whose principal point is off-center) — overrides `focal`
        fx, fy, cx, cy = [float(v) for v in intrinsics]
    else:
        fx = fy = focal * W
        cx, cy = W / 2, H / 2
    intr = np.array([fx, fy, cx, cy], np.float32)

    # one texture per wall (5 walls: +x, −x, +y, −y, +z) + obstacles
    texs = [_texture(rng, 256) for _ in range(5 + n_obstacles)]
    tex_size = 256
    w2t = tex_size / 3.0

    # bounded random walk: translation up to ±motion_scale per frame,
    # rotation up to ±0.4·motion_scale rad, position clipped inside the
    # box, accumulated rotation clipped to keep +z in view.  Always drawn
    # (even when an explicit trajectory overrides it) so the rng stream —
    # and hence the obstacle geometry below — is identical for two calls
    # with the same seed (a stereo rig renders the SAME scene twice from
    # rigidly-offset poses).
    steps = motion_scale * rng.standard_normal((n_frames, 6))
    steps[:, 3:] *= 0.4
    steps[0] = 0
    xi = np.cumsum(steps, axis=0)
    xi[:, 0] = np.clip(xi[:, 0], -0.5 * bx, 0.5 * bx)
    xi[:, 1] = np.clip(xi[:, 1], -0.5 * by, 0.5 * by)
    xi[:, 2] = np.clip(xi[:, 2], -0.5, 0.4 * bz)
    xi[:, 3:] = np.clip(xi[:, 3:], -0.35, 0.35)
    if poses_c2w is not None:
        poses_c2w = np.asarray(poses_c2w, np.float32)
        n_frames = poses_c2w.shape[0]
    else:
        poses_c2w = np.asarray(se3.exp(xi.astype(np.float32)))

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1
    )

    # surfaces as (axis, offset, texture index, bounds) — bounds are
    # ((lo, hi), (lo, hi)) for the two other axes in ascending order
    lim = {0: bx, 1: by, 2: bz}

    def _wall_bounds(axis):
        oth = [a for a in range(3) if a != axis]
        return tuple(
            ((-1.0 if a == 2 else -lim[a]) - 1e-3, lim[a] + 1e-3)
            for a in oth
        )

    walls = [(0, bx, 0, _wall_bounds(0)), (0, -bx, 1, _wall_bounds(0)),
             (1, by, 2, _wall_bounds(1)), (1, -by, 3, _wall_bounds(1)),
             (2, bz, 4, _wall_bounds(2))]

    # floating rectangles perpendicular to the view axis, at varied
    # depths inside the box: occlusion boundaries + near structure the
    # bare box lacks (curriculum diversity)
    for k in range(n_obstacles):
        oz = rng.uniform(1.2, 0.8 * bz)
        hx = rng.uniform(0.25, 0.75)
        hy = rng.uniform(0.2, 0.6)
        ox = rng.uniform(-0.6 * bx, 0.6 * bx)
        oy = rng.uniform(-0.6 * by, 0.6 * by)
        walls.append((2, oz, 5 + k,
                      ((ox - hx, ox + hx), (oy - hy, oy + hy))))

    import jax.numpy as jnp
    from ..lie import so3

    images, depths = [], []
    for n in range(n_frames):
        g = poses_c2w[n]
        Rd = np.asarray(so3.act(jnp.asarray(g[3:7]), jnp.asarray(
            dirs.reshape(-1, 3)))).reshape(H, W, 3)
        o = g[:3]

        best_t = np.full((H, W), 1e6, np.float32)
        img = np.zeros((H, W, 3), np.float32)
        for axis, off, ti, bounds in walls:
            denom = Rd[..., axis]
            t = (off - o[axis]) / np.where(np.abs(denom) < 1e-6, 1e-6,
                                           denom)
            pw = o + t[..., None] * Rd
            oth = [a for a in range(3) if a != axis]
            ok = (
                (t > 0.1)
                & (pw[..., oth[0]] >= bounds[0][0])
                & (pw[..., oth[0]] <= bounds[0][1])
                & (pw[..., oth[1]] >= bounds[1][0])
                & (pw[..., oth[1]] <= bounds[1][1])
                & (t < best_t)
            )
            u = pw[..., oth[0]] * w2t + tex_size / 2
            v = pw[..., oth[1]] * w2t + tex_size / 2
            wall_img = cv2.remap(
                texs[ti], u.astype(np.float32), v.astype(np.float32),
                interpolation=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_WRAP,
            )
            img = np.where(ok[..., None], wall_img, img)
            best_t = np.where(ok, t, best_t)

        # dirs has camera-z component 1 → camera z-depth = ray parameter
        images.append(np.clip(img, 0, 255).astype(np.uint8))
        depths.append(np.minimum(best_t, 100.0).astype(np.float32))

    return dict(
        images=np.stack(images), poses_c2w=poses_c2w.astype(np.float32),
        depths=np.stack(depths), intrinsics=np.tile(intr, (n_frames, 1)),
    )


# inverse of the reader's NED permutation [1,2,0,4,5,3,6] (tartan.py)
_NED_INV = [2, 0, 1, 5, 3, 4, 6]


def write_tartanair_scene(root, scene="synth/synth/Easy/P001", n_frames=12,
                          H=96, W=128, seed=0, depth_scale=5.0):
    """Write a rendered scene in TartanAir's on-disk format."""
    import cv2

    data = render_plane_scene(n_frames, H, W, seed=seed)
    sdir = osp.join(root, scene)
    os.makedirs(osp.join(sdir, "image_left"), exist_ok=True)
    os.makedirs(osp.join(sdir, "depth_left"), exist_ok=True)

    for n in range(n_frames):
        cv2.imwrite(
            osp.join(sdir, "image_left", f"{n:06d}_left.png"),
            cv2.cvtColor(data["images"][n], cv2.COLOR_RGB2BGR),
        )
        np.save(
            osp.join(sdir, "depth_left", f"{n:06d}_left_depth.npy"),
            data["depths"][n] * depth_scale,
        )

    poses = data["poses_c2w"].copy()
    poses[:, :3] *= depth_scale
    np.savetxt(osp.join(sdir, "pose_left.txt"), poses[:, _NED_INV],
               delimiter=" ")
    return data
