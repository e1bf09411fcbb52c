"""Software renderer for `rgb_array` frames.

The reference renders through GLUT/OpenGL (`static_window.py` †,
`pydart2/gui` † — SURVEY.md §2.2/§3.4); a TPU host has no GL stack, so this
is a small pure-numpy orthographic rasterizer: geoms are projected onto the
camera plane and splatted as filled primitives.  Enough for Monitor video
and human debugging; not a visual-parity goal (recorded decision,
SURVEY.md §2.4 "gui ... deprioritized").
"""
from __future__ import annotations

import numpy as np

from dartenv_tpu.dynamics.algorithms import fk
from dartenv_tpu.model.skel_model import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, SkelModel,
)

_COLORS = np.array([
    [66, 133, 244], [219, 68, 55], [244, 180, 0], [15, 157, 88],
    [171, 71, 188], [0, 172, 193], [255, 112, 67], [158, 157, 36],
], dtype=np.uint8)


def render_frame(model: SkelModel, sim_state, width: int = 320,
                 height: int = 240, track_body: int = 0,
                 scale: float = 80.0):
    """Orthographic x/y view (the tasks are y-up, x-forward)."""
    kin = fk(model, sim_state.q, sim_state.dq)
    R_w = np.asarray(kin.R_w)
    p_w = np.asarray(kin.p_w)
    img = np.full((height, width, 3), 255, dtype=np.uint8)

    cx = p_w[track_body, 0] if model.nb > track_body else 0.0
    cy = 1.0

    def to_px(x, y):
        u = int((x - cx) * scale + width / 2)
        v = int(height / 2 - (y - cy) * scale)
        return u, v

    # ground lines
    for wi in range(0 if model.wg_offset is None else model.wg_offset.shape[0]):
        n = np.asarray(model.wg_normal[wi])
        off = float(model.wg_offset[wi])
        if abs(n[1]) > 0.9:  # horizontal plane
            _, v = to_px(0.0, off / max(n[1], 1e-6))
            if 0 <= v < height:
                img[v:min(v + 2, height), :, :] = 200

    yy, xx = np.mgrid[0:height, 0:width]
    ng = model.ng
    for gi in range(ng):
        b = int(np.asarray(model.geom_body)[gi])
        Rg = R_w[b] @ np.asarray(model.geom_rot[gi])
        pg = p_w[b] + R_w[b] @ np.asarray(model.geom_pos[gi])
        gt = int(np.asarray(model.geom_type)[gi])
        size = np.asarray(model.geom_size[gi])
        color = _COLORS[b % len(_COLORS)]
        if gt == GEOM_SPHERE:
            u, v = to_px(pg[0], pg[1])
            r = max(int(size[0] * scale), 1)
            mask = (xx - u) ** 2 + (yy - v) ** 2 <= r * r
        elif gt == GEOM_CAPSULE:
            axis = Rg[:, 2]
            e0 = pg + axis * size[1]
            e1 = pg - axis * size[1]
            u0, v0 = to_px(e0[0], e0[1])
            u1, v1 = to_px(e1[0], e1[1])
            r = max(int(size[0] * scale), 1)
            # distance from each pixel to the segment
            dx, dy = u1 - u0, v1 - v0
            den = max(dx * dx + dy * dy, 1)
            t = np.clip(((xx - u0) * dx + (yy - v0) * dy) / den, 0.0, 1.0)
            px = u0 + t * dx
            py = v0 + t * dy
            mask = (xx - px) ** 2 + (yy - py) ** 2 <= r * r
        elif gt == GEOM_BOX:
            u, v = to_px(pg[0], pg[1])
            hx = max(int(size[0] * scale), 1)
            hy = max(int(size[1] * scale), 1)
            mask = (np.abs(xx - u) <= hx) & (np.abs(yy - v) <= hy)
        else:
            continue
        img[mask] = color
    return img
