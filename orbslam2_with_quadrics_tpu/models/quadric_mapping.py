"""Quadric landmark management: detection association, init, joint BA.

Implements the *intended* object-landmark pipeline of the reference's
quadric_slam extension end-to-end (the reference has the data structures
but never wires them — SURVEY.md §2 'state of the quadric extension'):

- ``Detection``: per-keyframe 2D boxes (x, y, w, h, prob, class) from the
  offline files (reference include/quadric_slam/QuadricLandmark.h:30-54,
  matrix_utils.h:49-54)
- association: a detection belongs to the landmark whose member points
  fall inside its box (QuadricLandmark::IsInBox + AddAssociatedMapPoint,
  QuadricLandmark.cc:117-147)
- init: >=3 bbox observations -> SVD dual-quadric fit (ops/quadrics.py,
  fixing QuadricInit's never-filled vBoxes bug)
- refinement: joint camera-point-quadric BA (ops/quadrics.quadric_ba_solve)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import ba, camera, lie, orb, quadrics
from . import map_state as ms


@dataclasses.dataclass
class QuadricLandmark:
    class_id: int
    kf_slots: list          # keyframe slots with a bbox observation
    bboxes: list            # [4] xmin,ymin,xmax,ymax per observation
    point_ids: set          # associated map point ids
    initialized: bool = False
    pose: np.ndarray | None = None    # [7]
    scale: np.ndarray | None = None   # [3]


class QuadricManager:
    """Host-side landmark table + jitted geometry ops."""

    def __init__(self, Kc, min_obs_init: int = 3, min_points: int = 15):
        self.Kc = Kc
        self.landmarks: list[QuadricLandmark] = []
        self.min_obs_init = min_obs_init
        # reference gates landmark validity at >=15 associated points
        # (QuadricLandmark.cc:128-147); kept configurable since synthetic
        # tests run with sparser maps
        self.min_points = min_points

    def add_keyframe_detections(self, m: ms.MapState, slot: int, detections):
        """detections: [D,6] (x, y, w, h, prob, class_id) rows.

        Associates each detection by counting this keyframe's map points
        inside the box, then merges into the landmark sharing the most
        points (or starts a new one).
        """
        if detections is None or len(detections) == 0:
            return
        det = np.asarray(detections, np.float32).reshape(-1, 6)
        obs = np.asarray(m.kf_obs_point[slot])
        uv = np.asarray(m.kf_uv[slot])
        has_pt = obs >= 0

        for row in det:
            x, y, w, h, prob, cls = row
            if w <= 2 or h <= 2:
                continue
            bbox = np.array([x, y, x + w, y + h], np.float32)
            inside = (
                has_pt
                & (uv[:, 0] >= bbox[0]) & (uv[:, 0] <= bbox[2])
                & (uv[:, 1] >= bbox[1]) & (uv[:, 1] <= bbox[3])
            )
            pts = set(obs[inside].tolist())
            if len(pts) < 3:
                continue
            # find best landmark by shared points + class
            best, best_shared = None, 0
            for lm in self.landmarks:
                if lm.class_id != int(cls):
                    continue
                shared = len(pts & lm.point_ids)
                if shared > best_shared:
                    best, best_shared = lm, shared
            if best is not None and best_shared >= max(3, len(pts) // 4):
                best.kf_slots.append(slot)
                best.bboxes.append(bbox)
                best.point_ids |= pts
            else:
                self.landmarks.append(
                    QuadricLandmark(
                        class_id=int(cls), kf_slots=[slot], bboxes=[bbox],
                        point_ids=pts,
                    )
                )

    def try_initialize(self, m: ms.MapState):
        """SVD-init every landmark that has enough views + points.

        Culled keyframes are dropped from each landmark's observation
        list first: their pose rows are frozen at cull time and never
        see later BA/loop corrections, so a fit over them mixes
        reference frames and fails the ellipsoid validity gate (at full
        scale ~70% of keyframes are culled — r05's first two quadric
        evals initialized 0 landmarks through exactly this)."""
        kf_valid = np.asarray(m.kf_valid)
        K = len(kf_valid)
        n_new = 0
        for lm in self.landmarks:
            kept = [
                (s, b) for s, b in zip(lm.kf_slots, lm.bboxes)
                if 0 <= s < K and kf_valid[s]
            ]
            lm.kf_slots = [s for s, _ in kept]
            lm.bboxes = [b for _, b in kept]
            if lm.initialized:
                continue
            if len(lm.kf_slots) < self.min_obs_init:
                continue
            if len(lm.point_ids) < self.min_points:
                continue
            T_cws = jnp.asarray(
                np.stack([np.asarray(m.kf_pose[s]) for s in lm.kf_slots])
            )
            bboxes = jnp.asarray(np.stack(lm.bboxes))
            valid = jnp.ones((len(lm.kf_slots),), bool)
            quad, ok = quadrics.quadric_init(T_cws, self.Kc, bboxes, valid)
            if bool(ok):
                lm.initialized = True
                lm.pose = np.asarray(quad.pose)
                lm.scale = np.asarray(quad.scale)
                n_new += 1
        return n_new

    def joint_ba(self, m: ms.MapState, inv_sigma2_tab, n_iters: int = 8):
        """Joint camera-point-quadric BA over all initialized landmarks.

        Returns the updated MapState (poses/points written back) and
        updates landmark pose/scale in place.
        """
        init_lms = [lm for lm in self.landmarks if lm.initialized]
        if not init_lms:
            return m
        K_, N = m.kf_obs_point.shape
        P = m.pt_pos.shape[0]

        obs = m.kf_obs_point
        okobs = (obs >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
        pnt = jnp.clip(obs, 0, P - 1)
        okobs = okobs & m.pt_valid[pnt.reshape(-1)].reshape(K_, N)
        cam_idx = jnp.broadcast_to(
            jnp.arange(K_, dtype=jnp.int32)[:, None], (K_, N)
        ).reshape(-1)
        uvr = jnp.concatenate(
            [m.kf_uv, jnp.where(m.kf_ur > 0, m.kf_ur, 0.0)[..., None]], axis=-1
        ).reshape(-1, 3)
        inv_s2 = inv_sigma2_tab[
            jnp.clip(m.kf_level, 0, inv_sigma2_tab.shape[0] - 1)
        ].reshape(-1)

        base = ba.BAProblem(
            poses=m.kf_pose,
            points=m.pt_pos,
            K=self.Kc,
            bf=jnp.asarray(0.0),
            cam_idx=cam_idx,
            pnt_idx=pnt.reshape(-1),
            uvr=uvr,
            is_stereo=(m.kf_ur > 0).reshape(-1).astype(jnp.float32),
            inv_sigma2=inv_s2,
            valid=okobs.reshape(-1).astype(jnp.float32),
            fixed_cam=((jnp.arange(K_) == 0) | ~m.kf_valid).astype(jnp.float32),
            fixed_pnt=(~m.pt_valid).astype(jnp.float32),
        )
        qe_cam, qe_quad, qe_bbox = [], [], []
        for qi, lm in enumerate(init_lms):
            for s, b in zip(lm.kf_slots, lm.bboxes):
                qe_cam.append(s)
                qe_quad.append(qi)
                qe_bbox.append(b)
        prob = quadrics.QuadricBAProblem(
            base=base,
            quad_pose=jnp.asarray(np.stack([lm.pose for lm in init_lms])),
            quad_scale=jnp.asarray(np.stack([lm.scale for lm in init_lms])),
            qe_cam=jnp.asarray(qe_cam, jnp.int32),
            qe_quad=jnp.asarray(qe_quad, jnp.int32),
            qe_bbox=jnp.asarray(np.stack(qe_bbox)),
            qe_valid=jnp.ones((len(qe_cam),)),
            qe_w=jnp.full((len(qe_cam),), 1e-2),
        )
        out, cost = quadrics.quadric_ba_solve(prob, self.Kc, n_iters=n_iters)
        for qi, lm in enumerate(init_lms):
            lm.pose = np.asarray(out.quad_pose[qi])
            lm.scale = np.asarray(out.quad_scale[qi])
        return m._replace(kf_pose=out.base.poses, pt_pos=out.base.points)
