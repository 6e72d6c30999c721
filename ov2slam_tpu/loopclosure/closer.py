"""Loop closure pipeline.

TPU-native replacement for `LoopCloser` (`src/loop_closer.cpp`): on every
new keyframe, query the place index; on a hit, verify with the reference's
cascade — 2-NN knn matching (`:378-459`) → epipolar filter (`:462-499`) →
P3P-RANSAC (`:765-830`) → loop-local-map projection matching + PnP
(`:502-763`, `:833-897`) — and on acceptance run the local pose graph
(`Optimizer::localPoseGraph`, `optimizer.cpp:2346-2591`), propagate the
correction to keyframes and landmarks, and merge duplicate landmarks
(`map_manager.cpp:801-882`).

Acceptance gates mirror the reference: >=15 knn matches, >=10 epipolar
inliers, >=5 P3P inliers, >=30 PnP inliers (`loop_closer.cpp:217,227,
251,288`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.essential import essential_ransac
from ..geometry.pnp import p3p_ransac
from ..ops.matching import knn_match_2nn, projection_match
from ..solvers.pnp_refine import pnp_refine
from ..solvers.posegraph import build_chain_edges, pose_graph_solve
from ..utils import lie_np
from ..utils.config import SlamConfig
from ..utils.profiler import Profiler
from .index import PlaceIndex


class LoopCloser:
    def __init__(self, cfg: SlamConfig, cam_l, map_store, estimator):
        self.cfg = cfg
        self.cam = cam_l
        self.map = map_store
        self.estimator = estimator
        self.index = PlaceIndex(
            cfg.max_keyframes, recent_mask=cfg.lc_recent_mask,
            island_radius=cfg.lc_island_radius,
            min_score=cfg.lc_min_score, match_bits=cfg.lc_match_bits)
        self.prof = Profiler.instance()
        self._rng = jax.random.PRNGKey(7)
        self.n_closures = 0

    def _key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # ------------------------------------------------------------------ #

    def process_keyframe(self, kfid: int) -> bool:
        """Query + verify + close. Returns True if a loop was closed."""
        m = self.map
        desc = m.obs_desc[kfid]
        valid = m.obs_lmid[kfid] >= 0

        self.prof.start("4.LC_QueryIndex")
        # exclude covisible KFs (`loop_closer.cpp:201-209`)
        cov = set(int(k) for k in m.covisible_kfs(kfid, min_score=1))
        cand, score = self.index.query(
            desc, valid, exclude=cov,
            seq_lookup=lambda ids: m.kf_seq[ids])
        self.index.add(kfid, desc, valid, seq=int(m.kf_seq[kfid]))
        self.prof.stop("4.LC_QueryIndex")
        if cand < 0 or not m.kf_valid[cand]:
            return False

        self.prof.start("4.LC_ProcessCandidate")
        ok = self._process_candidate(kfid, int(cand))
        self.prof.stop("4.LC_ProcessCandidate")
        if ok:
            self.n_closures += 1
            self.estimator.lc_kf_id = int(cand)
        return ok

    # ------------------------------------------------------------------ #

    def _process_candidate(self, kfid: int, cand: int) -> bool:
        cfg = self.cfg
        m = self.map

        cur_valid = m.obs_lmid[kfid] >= 0
        cand_valid = m.obs_lmid[cand] >= 0

        # 1) 2-NN knn matching with ratio 0.85 + <=50% bit distance
        idx, dist = knn_match_2nn(
            jnp.asarray(m.obs_desc[kfid]), jnp.asarray(cur_valid),
            jnp.asarray(m.obs_desc[cand]), jnp.asarray(cand_valid),
            max_dist_bits=128, ratio=0.85)
        idx = np.array(idx)
        matched = np.nonzero(idx >= 0)[0]
        if len(matched) < 15:
            return False

        cur_px = m.obs_px[kfid][matched]
        cand_px = m.obs_px[cand][idx[matched]]

        # 2) epipolar filter (10x RANSAC iters, `loop_closer.cpp:484`)
        fx, fy = float(self.cam.fx), float(self.cam.fy)
        cx, cy = float(self.cam.cx), float(self.cam.cy)
        n = len(matched)
        cap = ((n + 127) // 128) * 128
        xl = np.zeros((cap, 2), np.float32)
        xr = np.zeros((cap, 2), np.float32)
        vm = np.zeros(cap, bool)
        xl[:n] = (cand_px - (cx, cy)) / (fx, fy)
        xr[:n] = (cur_px - (cx, cy)) / (fx, fy)
        vm[:n] = True
        _, epi_inl, n_epi = essential_ransac(
            self._key(), jnp.asarray(xl), jnp.asarray(xr), jnp.asarray(vm),
            focal=fx, err_th_px=cfg.ransac_err,
            n_iters=min(1000, 10 * cfg.ransac_iter))
        if int(n_epi) < 10:
            return False
        epi_inl = np.array(epi_inl)[:n]
        matched = matched[epi_inl]

        # 3) P3P on candidate's 3D landmarks seen from the current KF
        lm_cand = m.obs_lmid[cand][idx[matched]]
        is3d = m.lm_valid[lm_cand] & m.lm_is3d[lm_cand]
        rows3d = matched[is3d]
        lms3d = lm_cand[is3d]
        if len(rows3d) < 5:
            return False
        N = cfg.max_kps
        pts = np.zeros((N, 3), np.float32)
        px = np.zeros((N, 2), np.float32)
        vmask = np.zeros(N, bool)
        k3 = len(rows3d)
        pts[:k3] = m.lm_pos[lms3d]
        px[:k3] = m.obs_px[kfid][rows3d]
        vmask[:k3] = True
        bv = np.array(self.cam.bearing(jnp.asarray(px)))
        T_p3p, p3p_inl, n_p3p = p3p_ransac(
            self._key(), jnp.asarray(bv), jnp.asarray(pts),
            jnp.asarray(px), jnp.asarray(vmask), fx, fy, cx, cy,
            err_th=cfg.ransac_err, n_iters=cfg.ransac_iter)
        if int(n_p3p) < 5:
            return False

        # 4) loop-local-map projection matching + PnP refinement.
        # The reference's >=30-inlier gate (`loop_closer.cpp:288`) assumes
        # its ~300-kp budget; scale to ours (~20% of grid cells ≈ 30/160).
        gy, gx = cfg.grid_cells
        pnp_gate = max(12, int(0.2 * gy * gx))
        T_loop, n_inliers, extra = self._track_loop_local_map(
            kfid, cand, np.array(T_p3p))
        if n_inliers < pnp_gate:
            return False

        # 5) pose-graph correction + landmark propagation + merges
        self._apply_closure(kfid, cand, T_loop,
                            list(zip(rows3d, lms3d)) + extra)
        return True

    # ------------------------------------------------------------------ #

    def _track_loop_local_map(self, kfid: int, cand: int, T_init):
        """Project the candidate's local map into the P3P pose and match
        descriptors, then PnP (`trackLoopLocalMap`,
        `loop_closer.cpp:502-763`). Returns (T_refined, n_inliers,
        extra_matches [(cur_slot, lmid)])."""
        cfg = self.cfg
        m = self.map
        # local map: 3D landmarks of the candidate and its covisible KFs
        local = set(int(l) for l in m.kf_landmark_ids(cand, only_3d=True))
        for k in m.covisible_kfs(cand, min_score=5, max_n=8):
            local |= set(int(l) for l in m.kf_landmark_ids(int(k),
                                                           only_3d=True))
        local = np.asarray(sorted(local), np.int32)
        if len(local) == 0:
            return T_init, 0, []

        T_cw = lie_np.pose_inverse(T_init.astype(np.float64))
        pc = lie_np.pose_apply(T_cw, m.lm_pos[local].astype(np.float64))
        z = pc[:, 2]
        fx, fy = float(self.cam.fx), float(self.cam.fy)
        cx, cy = float(self.cam.cx), float(self.cam.cy)
        with np.errstate(divide="ignore", invalid="ignore"):
            proj = np.stack([pc[:, 0] / z * fx + cx,
                             pc[:, 1] / z * fy + cy], -1)
        inb = ((z > 0.1) & (proj[:, 0] >= 0) & (proj[:, 0] < self.cam.width)
               & (proj[:, 1] >= 0) & (proj[:, 1] < self.cam.height))
        local, proj = local[inb], proj[inb]
        if len(local) == 0:
            return T_init, 0, []

        L = len(local)
        cap = ((L + 127) // 128) * 128
        proj_p = np.zeros((cap, 2), np.float32)
        pv = np.zeros(cap, bool)
        pdesc = np.zeros((cap, 8), np.uint32)
        proj_p[:L] = proj
        pv[:L] = True
        pdesc[:L] = m.lm_desc[local]

        kp_valid = m.obs_lmid[kfid] >= 0
        idx, _ = projection_match(
            jnp.asarray(proj_p), jnp.asarray(pv), jnp.asarray(pdesc),
            jnp.asarray(m.obs_px[kfid]), jnp.asarray(kp_valid),
            jnp.asarray(m.obs_desc[kfid]),
            max_px_dist=max(10.0, 2 * cfg.max_proj_pxdist),
            max_dist_bits=int(cfg.max_desc_dist * 256))
        idx = np.array(idx)[:L]
        pairs = [(int(idx[i]), int(local[i])) for i in range(L)
                 if idx[i] >= 0]
        if len(pairs) < 10:
            return T_init, 0, []

        # PnP over all matches
        N = cfg.max_kps
        pts = np.zeros((N, 3), np.float32)
        px = np.zeros((N, 2), np.float32)
        vmask = np.zeros(N, bool)
        k = len(pairs)
        pts[:k] = m.lm_pos[[p[1] for p in pairs]]
        px[:k] = m.obs_px[kfid][[p[0] for p in pairs]]
        vmask[:k] = True
        T_ref, inlier, _ = pnp_refine(
            jnp.asarray(T_init.astype(np.float32)), jnp.asarray(pts),
            jnp.asarray(px), jnp.asarray(vmask), fx, fy, cx, cy,
            robust_th=cfg.robust_mono_th, iters=10)
        inlier = np.array(inlier)[:k]
        good = [pairs[i] for i in np.nonzero(inlier)[0]]
        return np.array(T_ref, np.float64), len(good), good

    # ------------------------------------------------------------------ #

    def _apply_closure(self, kfid: int, cand: int, T_loop, matches):
        """Local pose graph from the loop KF to the new KF + correction
        propagation + landmark merges (`processLoopCandidate` acceptance
        branch, `loop_closer.cpp:300-376`)."""
        m = self.map
        # KFs created between the loop KF and the new KF, oldest first
        # (by insertion seq — slot ids are recycled)
        s_lo, s_hi = int(m.kf_seq[cand]), int(m.kf_seq[kfid])
        window = [int(k) for k in m.kfs_by_seq()
                  if s_lo <= m.kf_seq[k] <= s_hi]
        if len(window) < 2:
            return
        old_poses = m.kf_poses[window].astype(np.float64)

        # chain edges measured at current estimates; loop edge constrains
        # the NEW keyframe to its loop-verified pose in the world of the
        # loop KF: edge (cand_idx -> new_idx) with T_meas from T_loop
        i_cand = window.index(cand)
        i_new = window.index(kfid)
        T_loop_rel = lie_np.pose_relative(old_poses[i_cand], T_loop)
        ei, ej, eT, ew = build_chain_edges(
            old_poses, window, loop_i=i_cand, loop_j=i_new,
            T_loop=T_loop_rel, loop_weight=20.0)
        fixed = np.zeros(len(window), bool)
        fixed[i_cand] = True   # gauge = loop KF (`optimizer.cpp:2387`)

        new_poses, _ = pose_graph_solve(
            jnp.asarray(old_poses.astype(np.float32)), jnp.asarray(fixed),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eT),
            jnp.asarray(ew), iters=self.cfg.posegraph_iters)
        new_poses = np.array(new_poses, np.float64)

        # propagate: landmarks anchored in window KFs move with their
        # anchor's correction (`optimizer.cpp:2528-2585`)
        corr = {w: lie_np.pose_compose(new_poses[i],
                                       lie_np.pose_inverse(old_poses[i]))
                for i, w in enumerate(window)}
        anchors = m.lm_anchor_kf
        live = np.nonzero(m.lm_valid & m.lm_is3d)[0]
        for w, T_c in corr.items():
            sel = live[anchors[live] == w]
            if len(sel):
                m.lm_pos[sel] = lie_np.pose_apply(
                    T_c, m.lm_pos[sel].astype(np.float64)).astype(np.float32)
        for i, w in enumerate(window):
            m.kf_poses[w] = new_poses[i].astype(np.float32)

        # merge duplicate landmarks (cur KF slot ↔ loop landmark)
        for slot, lmid in matches:
            cur_lm = int(m.obs_lmid[kfid, slot])
            if cur_lm >= 0 and cur_lm != int(lmid) and m.lm_valid[cur_lm]:
                m.merge_landmarks(int(lmid), cur_lm)

        # structure-only refinement of the corrected region, then a loose
        # BA over the loop range if the pose correction was large
        # (`loop_closer.cpp:353-371`)
        from ..solvers.ba_variants import loose_ba, structure_only_ba

        structure_only_ba(m, window[-min(8, len(window)):],
                          self.estimator.params, self.cfg)
        pose_shift = float(np.linalg.norm(
            new_poses[i_new][4:7] - old_poses[i_new][4:7]))
        if pose_shift >= 0.02:
            loose_ba(m, cand, kfid, self.estimator.params, self.cfg)
