"""Pose visualization (parity: misc/plot.py:14-81).

Draws the 14 joints and the hardcoded 14-edge skeleton (plus optional bbox)
over the RGB camera frame and writes PNGs to
visualization/<visDir>/single_N/%09d.png. The reference hard-requires an
external ../frames RGB directory and crashes without it; here a black canvas
is used when the frame is missing so visualization works on radar-only
installs.
"""

from __future__ import annotations

import os

import numpy as np

# joint-index edges of the HuPR skeleton (misc/plot.py:52-67)
SKELETON_EDGES = [
    (0, 1), (1, 2), (0, 3), (3, 4), (4, 5), (0, 6), (3, 6), (6, 7),
    (6, 8), (6, 11), (8, 9), (9, 10), (11, 12), (12, 13),
]


def _load_rgb(cfg, image_id: int, size):
    namestr = "%09d" % image_id
    path = os.path.join("../frames", cfg.TEST.plotImgDir,
                        "single_%d" % int(namestr[:4]), "processed/images",
                        "%09d.jpg" % int(namestr[-4:]))
    if os.path.exists(path):
        from PIL import Image
        img = Image.open(path).convert("RGB").resize(size)
        return np.asarray(img).copy()
    return np.zeros((size[1], size[0], 3), dtype=np.uint8)


def plot_human_pose(batch_joints, cfg, vis_dir: str, image_ids,
                    bbox=None, upsampling_size=(256, 256)):
    import cv2

    batch_joints = np.asarray(batch_joints)
    for j in range(len(batch_joints)):
        image_id = int(image_ids[j])
        namestr = "%09d" % image_id
        image_dir = os.path.join(vis_dir, "single_%d" % int(namestr[:4]))
        os.makedirs(image_dir, exist_ok=True)
        image_path = os.path.join(image_dir, "%09d.png" % int(namestr[-4:]))

        canvas = _load_rgb(cfg, image_id, upsampling_size)
        joints = batch_joints[j]
        for joint in joints:
            cv2.circle(canvas, (int(joint[0]), int(joint[1])), 2,
                       [255, 0, 0], 2)
        for a, b in SKELETON_EDGES:
            cv2.line(canvas,
                     (int(joints[a][0]), int(joints[a][1])),
                     (int(joints[b][0]), int(joints[b][1])),
                     [255, 0, 0], 1)
        if bbox is not None:
            x, y, w, h = [int(v) for v in bbox[j]]
            cv2.rectangle(canvas, (x, y), (x + w, y + h), [0, 255, 0], 1)
        cv2.imwrite(image_path, canvas[:, :, ::-1])
