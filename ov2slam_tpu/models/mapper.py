"""Mapper: keyframe → 3D structure.

TPU-native replacement for `Mapper` + the mapping half of `MapManager`
(`src/mapper.cpp`, `src/map_manager.cpp:367-611`): stereo matching of the
new keyframe's keypoints (prior-guided fb-KLT left→right + epipolar gate),
stereo triangulation (`mapper.cpp:346-461`), temporal triangulation versus
each landmark's first observing keyframe (`mapper.cpp:191-344`), and
local-map descriptor matching (`mapper.cpp:469-774`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.image import build_pyramid, clahe
from ..geometry.essential import essential_from_pose, sampson_dist_sq
from ..geometry.triangulation import reprojection_checks, triangulate_midpoint
from ..ops.klt import fb_klt_track
from ..ops.matching import projection_match
from ..utils import lie_np
from ..utils.config import SlamConfig
from ..utils.profiler import Profiler


class Mapper:
    def __init__(self, cfg: SlamConfig, cam_l: Camera,
                 cam_r: Optional[Camera], map_store):
        self.cfg = cfg
        self.cam_l = cam_l
        self.cam_r = cam_r
        self.map = map_store
        self.prof = Profiler.instance()
        if cam_r is not None:
            # right-in-left extrinsic as numpy
            self.T_lr = np.array(cam_r.T_c0_ci, np.float64)
            self.E_lr = np.array(essential_from_pose(jnp.asarray(
                self.T_lr.astype(np.float32))))
            # rectified pair? (rotation ~identity, baseline along x) —
            # enables the epipolar SAD-scan prior (`getLineMinSAD`)
            rot_angle = float(np.linalg.norm(
                lie_np.so3_log(self.T_lr[:4])))
            t = self.T_lr[4:7]
            self._rectified = (rot_angle < 1e-3
                               and abs(t[0]) > 10 * (abs(t[1]) + abs(t[2]) + 1e-12))
        else:
            self.T_lr = None
            self._rectified = False

    # ------------------------------------------------------------------ #

    def process_keyframe(self, kfid: int, frame, left_pyr,
                         right_img: Optional[np.ndarray] = None):
        """Full KF mapping pass (`Mapper::run` body, `mapper.cpp:44-188`)."""
        if self.cfg.stereo and right_img is not None:
            self.prof.start("2.KF_StereoMatch")
            self.stereo_matching(kfid, frame, left_pyr, right_img)
            self.prof.stop("2.KF_StereoMatch")
            self.prof.start("2.KF_TriangulateStereo")
            self.triangulate_stereo(kfid)
            self.prof.stop("2.KF_TriangulateStereo")
        self.prof.start("2.KF_TriangulateTemporal")
        self.triangulate_temporal(kfid)
        self.prof.stop("2.KF_TriangulateTemporal")

    # ------------------------------------------------------------------ #

    def stereo_matching(self, kfid: int, frame, left_pyr, right_img):
        """Left→right prior-guided fb-KLT + epipolar residual gate
        (`MapManager::stereoMatching`, `map_manager.cpp:367-611`)."""
        cfg = self.cfg
        im = jnp.asarray(right_img, jnp.float32)
        if cfg.use_clahe:
            im = clahe(im, cfg.clahe_val)
        right_pyr = tuple(build_pyramid(im, cfg.klt_levels))

        valid = self.map.obs_lmid[kfid] >= 0
        px = self.map.obs_px[kfid].copy()  # undistorted left px

        # priors (`map_manager.cpp:396-489`): project 3D landmarks into the
        # right camera; for 2D keypoints on a rectified pair, run the
        # epipolar SAD scan (`getLineMinSAD`, `feature_tracker.cpp:140-206`);
        # otherwise start at the same pixel (pyramid absorbs the disparity).
        priors = px.copy()
        if self._rectified:
            from ..ops.stereo_sad import line_min_sad

            sad_priors, _, _ = line_min_sad(
                left_pyr[0], right_pyr[0],
                jnp.asarray(px.astype(np.float32)), jnp.asarray(valid))
            priors = np.array(sad_priors)
        lmids = self.map.obs_lmid[kfid]
        rows3d = np.nonzero(valid & (lmids >= 0))[0]
        rows3d = rows3d[self.map.lm_is3d[lmids[rows3d]]
                        & self.map.lm_valid[lmids[rows3d]]]
        if len(rows3d):
            T_wc = self.map.kf_poses[kfid].astype(np.float64)
            T_wr = lie_np.pose_compose(T_wc, self.T_lr)
            pr = lie_np.pose_apply(lie_np.pose_inverse(T_wr),
                                   self.map.lm_pos[lmids[rows3d]].astype(
                                       np.float64))
            z = np.maximum(pr[:, 2], 1e-3)
            fr = self.cam_r
            proj = np.stack([
                pr[:, 0] / z * float(fr.fx) + float(fr.cx),
                pr[:, 1] / z * float(fr.fy) + float(fr.cy)], -1)
            inb = ((proj[:, 0] >= 0) & (proj[:, 0] < fr.width)
                   & (proj[:, 1] >= 0) & (proj[:, 1] < fr.height))
            priors[rows3d[inb]] = proj[inb].astype(np.float32)

        tracked, status = fb_klt_track(
            left_pyr, right_pyr,
            jnp.asarray(px.astype(np.float32)),
            jnp.asarray(priors.astype(np.float32)),
            jnp.asarray(valid),
            win=cfg.klt_win_size, iters=cfg.max_iter,
            eps=cfg.max_px_precision, max_err=cfg.klt_err,
            max_fb_dist=cfg.max_fbklt_dist)
        tracked = np.array(tracked)
        status = np.array(status)

        # epipolar residual gate (`map_manager.cpp:583-603`): Sampson
        # distance under the known stereo essential matrix
        fx, fy = float(self.cam_l.fx), float(self.cam_l.fy)
        cx, cy = float(self.cam_l.cx), float(self.cam_l.cy)
        fxr, fyr = float(self.cam_r.fx), float(self.cam_r.fy)
        cxr, cyr = float(self.cam_r.cx), float(self.cam_r.cy)
        xl = (px - (cx, cy)) / (fx, fy)
        xr = (tracked - (cxr, cyr)) / (fxr, fyr)
        d2 = np.array(sampson_dist_sq(
            jnp.asarray(self.E_lr), jnp.asarray(xl.astype(np.float32)),
            jnp.asarray(xr.astype(np.float32))))
        epi_ok = d2 < (cfg.max_reproj_err / fx) ** 2

        good = status & epi_ok & valid
        self.map.obs_is_stereo[kfid] = good
        self.map.obs_rpx[kfid][good] = tracked[good]

    # ------------------------------------------------------------------ #

    def triangulate_stereo(self, kfid: int):
        """Triangulate stereo-matched, not-yet-3D landmarks
        (`Mapper::triangulateStereo`, `mapper.cpp:346-461`)."""
        cfg = self.cfg
        lmids = self.map.obs_lmid[kfid]
        st = self.map.obs_is_stereo[kfid]
        rows = np.nonzero(st & (lmids >= 0))[0]
        rows = rows[self.map.lm_valid[lmids[rows]]
                    & ~self.map.lm_is3d[lmids[rows]]]
        if len(rows) == 0:
            return

        bl = np.array(self.cam_l.bearing(
            jnp.asarray(self.map.obs_px[kfid][rows])))
        br = np.array(self.cam_r.bearing(
            jnp.asarray(self.map.obs_rpx[kfid][rows])))
        T_lr32 = jnp.asarray(self.T_lr.astype(np.float32))
        pts_l = np.array(triangulate_midpoint(
            T_lr32[None], jnp.asarray(bl.astype(np.float32)),
            jnp.asarray(br.astype(np.float32))))
        ok = np.array(reprojection_checks(
            T_lr32, jnp.asarray(bl.astype(np.float32)),
            jnp.asarray(br.astype(np.float32)),
            jnp.asarray(pts_l), float(self.cam_l.fx),
            cfg.max_reproj_err, min_depth=0.05))

        T_wc = self.map.kf_poses[kfid].astype(np.float64)
        pts_w = lie_np.pose_apply(T_wc, pts_l[ok].astype(np.float64))
        self.map.set_landmark_positions(
            lmids[rows[ok]], pts_w.astype(np.float32))
        # failed stereo checks lose their stereo flag
        self.map.obs_is_stereo[kfid][rows[~ok]] = False

    # ------------------------------------------------------------------ #

    def triangulate_temporal(self, kfid: int):
        """Triangulate 2D landmarks against their first observing keyframe
        (`Mapper::triangulateTemporal`, `mapper.cpp:191-344`)."""
        cfg = self.cfg
        lmids = self.map.obs_lmid[kfid]
        rows = np.nonzero(lmids >= 0)[0]
        cand = []
        for r in rows:
            l = int(lmids[r])
            if not self.map.lm_valid[l] or self.map.lm_is3d[l]:
                continue
            anchor = int(self.map.lm_anchor_kf[l])
            if anchor < 0 or anchor == kfid or not self.map.kf_valid[anchor]:
                continue
            slots = self.map.lm_obs_slot[l][self.map.lm_obs_kf[l] == anchor]
            if len(slots) == 0:
                continue
            cand.append((r, l, anchor, int(slots[0])))
        if not cand:
            return

        T_cur = self.map.kf_poses[kfid].astype(np.float64)
        out_ids, out_pos = [], []
        # group by anchor KF so each group is one batched triangulation
        anchors = sorted({c[2] for c in cand})
        for a in anchors:
            grp = [c for c in cand if c[2] == a]
            T_a = self.map.kf_poses[a].astype(np.float64)
            T_rel = lie_np.pose_relative(T_a, T_cur)  # cur in anchor frame
            # parallax requirement implicit in reprojection checks
            px_a = np.stack([self.map.obs_px[a][c[3]] for c in grp])
            px_c = np.stack([self.map.obs_px[kfid][c[0]] for c in grp])
            ba = np.array(self.cam_l.bearing(jnp.asarray(px_a)))
            bc = np.array(self.cam_l.bearing(jnp.asarray(px_c)))
            T32 = jnp.asarray(T_rel.astype(np.float32))
            pts_a = np.array(triangulate_midpoint(
                T32[None], jnp.asarray(ba.astype(np.float32)),
                jnp.asarray(bc.astype(np.float32))))
            ok = np.array(reprojection_checks(
                T32, jnp.asarray(ba.astype(np.float32)),
                jnp.asarray(bc.astype(np.float32)), jnp.asarray(pts_a),
                float(self.cam_l.fx), cfg.max_reproj_err, min_depth=0.05))
            pts_w = lie_np.pose_apply(T_a, pts_a[ok].astype(np.float64))
            out_ids.extend([grp[i][1] for i in np.nonzero(ok)[0]])
            out_pos.extend(pts_w)
        if out_ids:
            self.map.set_landmark_positions(
                np.asarray(out_ids, np.int32),
                np.asarray(out_pos, np.float32))

    # ------------------------------------------------------------------ #

    def match_to_local_map(self, kfid: int) -> int:
        """Project unmatched local-map landmarks into the new KF and match
        descriptors (`matchingToLocalMap`/`matchToMap`,
        `mapper.cpp:469-774`). Matches merge the KF's 2D landmark into the
        map landmark. Returns number of merges."""
        cfg = self.cfg
        m = self.map
        cov = m.covisible_kfs(kfid, min_score=5, max_n=10)
        if len(cov) == 0:
            return 0

        # local map = 3D landmarks of covisible KFs not observed in kfid
        own = set(int(l) for l in m.kf_landmark_ids(kfid))
        local = []
        for k in cov:
            for l in m.kf_landmark_ids(k, only_3d=True):
                li = int(l)
                if li not in own:
                    local.append(li)
        local = sorted(set(local))
        if not local:
            return 0

        # project into kfid
        T_cw = lie_np.pose_inverse(m.kf_poses[kfid].astype(np.float64))
        pc = lie_np.pose_apply(T_cw, m.lm_pos[local].astype(np.float64))
        z = pc[:, 2]
        fx, fy = float(self.cam_l.fx), float(self.cam_l.fy)
        cx, cy = float(self.cam_l.cx), float(self.cam_l.cy)
        with np.errstate(divide="ignore", invalid="ignore"):
            proj = np.stack([pc[:, 0] / z * fx + cx,
                             pc[:, 1] / z * fy + cy], -1)
        inb = ((z > 0.1) & (proj[:, 0] >= 0)
               & (proj[:, 0] < self.cam_l.width)
               & (proj[:, 1] >= 0) & (proj[:, 1] < self.cam_l.height))
        local = np.asarray(local)[inb]
        proj = proj[inb]
        if len(local) == 0:
            return 0

        # pad to capacity and match against the KF's own keypoints
        L = len(local)
        cap = ((L + 127) // 128) * 128
        proj_p = np.zeros((cap, 2), np.float32)
        proj_p[:L] = proj
        pv = np.zeros(cap, bool)
        pv[:L] = True
        pdesc = np.zeros((cap, 8), np.uint32)
        pdesc[:L] = m.lm_desc[local]

        kp_valid = m.obs_lmid[kfid] >= 0
        idx, dist = projection_match(
            jnp.asarray(proj_p), jnp.asarray(pv), jnp.asarray(pdesc),
            jnp.asarray(m.obs_px[kfid]), jnp.asarray(kp_valid),
            jnp.asarray(m.obs_desc[kfid]),
            cfg.max_proj_pxdist, int(cfg.max_desc_dist * 256))
        idx = np.array(idx)[:L]

        n_merged = 0
        for i, slot in enumerate(idx):
            if slot < 0:
                continue
            cur_lm = int(m.obs_lmid[kfid, slot])
            map_lm = int(local[i])
            if cur_lm == map_lm or cur_lm < 0:
                continue
            if m.lm_is3d[cur_lm]:
                continue  # both 3D: leave to loop-closure merging
            m.merge_landmarks(map_lm, cur_lm)
            n_merged += 1
        return n_merged
