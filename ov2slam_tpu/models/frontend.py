"""Visual front-end: per-frame tracking state machine.

TPU-native replacement for `VisualFrontEnd` (`src/visual_front_end.cpp`):
CLAHE+pyramid preprocessing (`:1143-1177`), constant-velocity motion model
(`visual_front_end.hpp:38-90`), prior-guided forward-backward KLT
(`:132-275`), epipolar 2d-2d outlier gating (`:446-656`), P3P + motion-only
PnP pose computation (`:659-851`), monocular initialization (`:855-984`),
and keyframe-need heuristics (`:986-1061`).

State layout: the current frame's keypoints live in fixed-capacity slot
arrays (px, undistorted px, landmark ids, valid mask) — the array analogue
of `Frame::mapkps_`. Device work (pyramids, KLT, RANSAC, PnP) is dispatched
as a small number of jitted calls per frame; slot bookkeeping is host
numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.image import build_pyramid, clahe
from ..geometry.essential import essential_from_pose, relative_pose_ransac, sampson_dist_sq
from ..geometry.pnp import p3p_ransac
from ..geometry.triangulation import triangulate_midpoint
from ..solvers.pnp_refine import pnp_refine
from .frontend_step import CalibArrays, fused_track_step, pack_track_state
from ..utils import lie_np
from ..utils.config import SlamConfig
from ..utils.profiler import Profiler


class MotionModel:
    """Constant-velocity SE3 prior (`visual_front_end.hpp:38-90`)."""

    def __init__(self):
        self.prev_T = None
        self.prev_time = None
        self.rel = lie_np.pose_identity()
        self.rel_dt = 0.0

    def predict(self, time: float) -> Optional[np.ndarray]:
        if self.prev_T is None:
            return None
        if self.rel_dt <= 0:
            return self.prev_T.copy()
        dt = time - self.prev_time
        xi = lie_np.so3_log(self.rel[:4])
        scale = dt / self.rel_dt
        step = np.concatenate([lie_np.so3_exp(xi * scale),
                               self.rel[4:] * scale])
        return lie_np.pose_compose(self.prev_T, step)

    def update(self, T_wc: np.ndarray, time: float):
        if self.prev_T is not None and time > self.prev_time:
            self.rel = lie_np.pose_relative(self.prev_T, T_wc)
            self.rel_dt = time - self.prev_time
        self.prev_T = T_wc.copy()
        self.prev_time = time

    def reset(self):
        self.__init__()


@dataclasses.dataclass
class FrameState:
    """Current-frame keypoint slots (fixed capacity N)."""

    px: np.ndarray        # (N, 2) raw pixels
    px_und: np.ndarray    # (N, 2) undistorted pixels
    lmids: np.ndarray     # (N,) int32 (-1 = empty)
    valid: np.ndarray     # (N,) bool
    T_wc: np.ndarray      # (7,)
    time: float = 0.0
    kf_id: int = -1       # reference keyframe

    @classmethod
    def empty(cls, n: int):
        return cls(
            px=np.zeros((n, 2), np.float32),
            px_und=np.zeros((n, 2), np.float32),
            lmids=np.full(n, -1, np.int32),
            valid=np.zeros(n, bool),
            T_wc=lie_np.pose_identity().astype(np.float32),
        )

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())


class FrontEnd:
    def __init__(self, cfg: SlamConfig, cam_l: Camera, map_store):
        self.cfg = cfg
        self.cam = cam_l
        self.map = map_store
        self.motion = MotionModel()
        self.frame = FrameState.empty(cfg.max_kps)
        self.prev_pyr = None
        self.cur_pyr = None
        self.initialized = cfg.stereo   # mono needs bootstrapping
        self.init_kf_px: Optional[np.ndarray] = None
        self.prof = Profiler.instance()
        self._rng = jax.random.PRNGKey(0)
        self._quality = cfg.max_quality
        self._fast_th = float(cfg.fast_th)
        self._frames_since_kf = 0
        self.bootstrap_kf = False      # last returned KF is a bootstrap
        self.last_pose_ok = None       # per-frame diagnostics
        self.last_n_inl = 0
        self.last_n_3d = 0
        self._calib = CalibArrays(
            fx=jnp.asarray(cam_l.fx, jnp.float32),
            fy=jnp.asarray(cam_l.fy, jnp.float32),
            cx=jnp.asarray(cam_l.cx, jnp.float32),
            cy=jnp.asarray(cam_l.cy, jnp.float32),
            dist=jnp.asarray(cam_l.dist, jnp.float32))
        self._fisheye = cam_l.model == "fisheye"
        # transfer discipline: ONE packed upload per frame (preallocated
        # host buffer) + a device-resident PRNG key chain (the fused step
        # returns its successor key — no per-frame host split dispatch)
        self._state_buf = np.zeros((cfg.max_kps + 2, 8), np.float32)
        self._key_dev = jax.random.PRNGKey(0)
        # in-flight frame records for the pipelined dispatch/resolve
        # split (FIFO; sync mode keeps it at length <= 1)
        import collections

        self._pendings = collections.deque()
        # slot-birth bookkeeping: a pending dispatched BEFORE a slot was
        # (re)detected carries no information about it — its resolve must
        # not touch that slot (depth>=2 keeps several frames in flight
        # across keyframe insertions)
        self._dispatch_seq = 0
        self._slot_birth = np.zeros(cfg.max_kps, np.int64)
        # device-chained recurrence state (pipeline_depth >= 2): the
        # packed chain array + the latest dispatched frame's pyramid
        self._chain_S = None
        self._chain_pyr = None
        self._chain_patch = None     # (rows, px, und) new-KF-slot scatter
        self._chain_last_time = None
        self._chain_dt = 0.0
        self._lm_buf = np.zeros((cfg.max_kps + 1, 8), np.float32)
        self._chain_buf = np.zeros((cfg.max_kps + 2, 8), np.float32)
        # from-KF tracking (`btrack_keyframetoframe`): the reference
        # keyframe's device pyramid, captured at detection time
        self._kf_pyr = None

    # ------------------------------------------------------------------ #

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def preprocess(self, img: np.ndarray) -> None:
        """CLAHE + pyramid; swaps prev/cur (`preprocessImage`,
        `visual_front_end.cpp:1143-1177`)."""
        im = jnp.asarray(img, jnp.float32)
        if self.cfg.use_clahe:
            im = clahe(im, self.cfg.clahe_val)
        self.prev_pyr = self.cur_pyr
        self.cur_pyr = tuple(build_pyramid(im, self.cfg.klt_levels))

    # ------------------------------------------------------------------ #

    def track_frame(self, img: np.ndarray, time: float) -> bool:
        """Process one (left/mono) frame; returns True if it should become
        a keyframe (`visualTracking`/`trackMono`,
        `visual_front_end.cpp:40-128`).

        Synchronous path: dispatch + immediate resolve. The pipelined
        manager instead calls :meth:`dispatch_frame` /
        :meth:`resolve_pending` separately so the device→host readback of
        frame i overlaps everything up to frame i+1's dispatch (the
        readback RTT — ~30 ms on a tunneled remote chip — is the
        measured e2e throughput limiter, `0.FE_readback` profile)."""
        self.prof.start("0.Full-Front_End")
        pend = self.dispatch_frame(img, time)
        if pend is None:             # bootstrap path resolved inline
            self.prof.stop("0.Full-Front_End")
            return True
        is_kf = self.resolve_pending()
        self.prof.stop("0.Full-Front_End")
        return is_kf

    @property
    def has_pending(self) -> bool:
        return len(self._pendings) > 0

    @property
    def n_pending(self) -> int:
        return len(self._pendings)

    def wait_pending(self):
        """Force the OLDEST in-flight frame's device→host transfer to
        complete WITHOUT applying it (so the blocking wait can happen
        outside any map lock — the transfer touches no shared state)."""
        if self._pendings:
            p = self._pendings[0]
            if not isinstance(p["packed"], np.ndarray):
                p["packed"] = np.asarray(p["packed"])

    def dispatch_frame(self, img: np.ndarray, time: float):
        """Upload + dispatch the fused step for one frame WITHOUT reading
        the result back. Returns the pending record (resolved later by
        :meth:`resolve_pending`), or None when the frame took the inline
        bootstrap path (caller must treat it as an immediate KF request).

        With ``pipeline_depth >= 2`` the dispatch rides the device-chained
        recurrence (host slot state may trail by several frames); at
        depth 1 it requires the previous frame to be resolved."""
        cfg = self.cfg
        f = self.frame

        self.bootstrap_kf = False
        if self.map.n_keyframes == 0 or (f.kf_id < 0 and f.n_valid == 0):
            # bootstrap (or post-reset re-bootstrap): this frame becomes a
            # keyframe; pose = identity on first start, else keep the last
            # estimate so the map stays consistent. The flag exempts this
            # keyframe from the starvation veto — it has zero tracks BY
            # CONSTRUCTION (detection happens inside keyframe creation),
            # and vetoing it would deadlock recovery in a reset loop.
            f.time = time
            self.bootstrap_kf = True
            self.preprocess(img)
            if self.map.n_keyframes == 0:
                f.T_wc = lie_np.pose_identity().astype(np.float32)
            self.motion.update(f.T_wc.astype(np.float64), time)
            self._frames_since_kf = 0
            return None

        if (cfg.pipelined_frontend and cfg.pipeline_depth >= 2
                and self.initialized
                and not getattr(self, "debug_gates", False)):
            return self._dispatch_chained(img, time)

        self.prof.start("0.FE_pre")
        T_pred = self.motion.predict(time)
        if T_pred is None:
            T_pred = f.T_wc.astype(np.float64)

        # --- host-side slot gathers (vectorized numpy) ----------------- #
        ids = np.maximum(f.lmids, 0)
        live = f.valid & (f.lmids >= 0) & self.map.lm_valid[ids]
        is3d = live & self.map.lm_is3d[ids]
        lm_pos = np.where(is3d[:, None], self.map.lm_pos[ids], 0.0)

        kf_px = np.zeros_like(f.px_und)
        pair_valid = np.zeros(len(f.px), bool)
        T_kf = T_pred
        kfid = f.kf_id
        if kfid >= 0 and self.map.kf_valid[kfid]:
            T_kf = self.map.kf_poses[kfid].astype(np.float64)
            lookup = np.full(self.map.L, -1, np.int32)
            kf_lm = self.map.obs_lmid[kfid]
            sel = kf_lm >= 0
            lookup[kf_lm[sel]] = np.nonzero(sel)[0]
            slot_in_kf = lookup[ids]
            pair_valid = live & (slot_in_kf >= 0)
            kf_px[pair_valid] = self.map.obs_px[
                kfid, slot_in_kf[pair_valid]]

        # --- one fused device step ------------------------------------- #
        self.prof.stop("0.FE_pre")
        self.prof.start("0.FE_dispatch")
        do_pose = bool(self.initialized)
        debug = getattr(self, "debug_gates", False)
        # `kltTrackingFromKF` (`visual_front_end.cpp:278-442`): replaces
        # frame-to-frame tracking when enabled and a KF pyramid exists
        # (classic path only — the device chain tracks frame-to-frame)
        from_kf = bool(cfg.track_keyframetoframe and do_pose
                       and self._kf_pyr is not None)
        kf_pyr = self._kf_pyr if from_kf else None
        state = pack_track_state(f.px, lm_pos, kf_px, f.valid, is3d,
                                 pair_valid, np.asarray(T_pred, np.float32),
                                 np.asarray(T_kf, np.float32),
                                 out=self._state_buf)
        if isinstance(img, np.ndarray):
            # uint8 upload: 4x less tunnel bandwidth; real sensors are
            # 8-bit so the cast is lossless for dataset replay. Inputs
            # must be in [0, 255]; a normalized [0, 1] float image would
            # silently collapse to {0, 1}, so rescale that case.
            if img.dtype != np.uint8 and img.size and float(img.max()) <= 1.5:
                img = img * 255.0
            img_u8 = (img if img.dtype == np.uint8
                      else np.clip(np.round(img), 0, 255).astype(np.uint8))
        else:
            img_u8 = img   # already device-resident (rectified/undistorted)
        out = fused_track_step(
                jnp.asarray(img_u8), self.cur_pyr,
                jnp.asarray(state), self._key_dev, self._calib,
                clahe_val=float(cfg.clahe_val),
                max_fbklt_dist=float(cfg.max_fbklt_dist),
                klt_err=float(cfg.klt_err),
                ransac_err_px=float(cfg.ransac_err),
                robust_th=float(cfg.robust_mono_th),
                levels=cfg.klt_levels, win=cfg.klt_win_size,
                iters=cfg.max_iter, use_clahe=cfg.use_clahe,
                do_epipolar=cfg.do_epipolar, do_pose=do_pose,
                ransac_iters=cfg.ransac_iter, pnp_iters=cfg.pnp_iters,
                fisheye=self._fisheye, use_prior=cfg.klt_use_prior,
                debug=debug, split_sub=cfg.klt_split_sub,
                kf_pyr=kf_pyr, track_from_kf=from_kf)
        if debug:
            cur_pyr, packed, self._key_dev, dbg = out
            self.last_debug = jax.tree_util.tree_map(np.asarray, dbg)
        else:
            cur_pyr, packed, self._key_dev = out

        self.prev_pyr = self.cur_pyr
        self.cur_pyr = cur_pyr
        try:
            packed.copy_to_host_async()   # overlap transfer with host work
        except Exception:
            pass                          # backend without async copy
        self._dispatch_seq += 1
        pend = dict(packed=packed, time=time, T_pred=T_pred,
                    do_pose=do_pose, is3d=is3d, pyr=None,
                    seq=self._dispatch_seq)
        self._pendings.append(pend)
        self.prof.stop("0.FE_dispatch")
        return pend

    # ------------------------------------------------------------------ #
    # device-chained dispatch (pipeline_depth >= 2)
    # ------------------------------------------------------------------ #

    def _gather_lm_static(self):
        """Per-slot map view for the chained step (host gather; uploaded
        async every dispatch so BA updates / 2D→3D promotions / culls
        reach the device recurrence within one frame)."""
        f = self.frame
        m = self.map
        ids = np.maximum(f.lmids, 0)
        # f.valid is included so host-side slot invalidation (P3P-rescue
        # outliers, starvation culls) reaches the device recurrence at
        # the next dispatch; the reverse direction (chain kills a slot
        # the host still believes in) is handled by the chain's own
        # status recurrence, which never resurrects a dead slot
        live = f.valid & (f.lmids >= 0) & m.lm_valid[ids]
        is3d = live & m.lm_is3d[ids]
        lm_pos = np.where(is3d[:, None], m.lm_pos[ids], 0.0)
        kf_px = np.zeros_like(f.px_und)
        pair_valid = np.zeros(len(f.px), bool)
        kfid = f.kf_id
        T_kf = f.T_wc.astype(np.float64)
        if kfid >= 0 and m.kf_valid[kfid]:
            T_kf = m.kf_poses[kfid].astype(np.float64)
            lookup = np.full(m.L, -1, np.int32)
            kf_lm = m.obs_lmid[kfid]
            sel = kf_lm >= 0
            lookup[kf_lm[sel]] = np.nonzero(sel)[0]
            slot_in_kf = lookup[ids]
            pair_valid = live & (slot_in_kf >= 0)
            kf_px[pair_valid] = m.obs_px[kfid, slot_in_kf[pair_valid]]
        from .frontend_step import pack_lm_static

        st = pack_lm_static(lm_pos, kf_px, live, is3d, pair_valid,
                            T_kf.astype(np.float32), out=self._lm_buf)
        return st, is3d

    def _dispatch_chained(self, img, time: float):
        """One chained dispatch: the recurrent tracking state stays on
        device (`fused_track_step_chained`); the host ships only the
        image, the refreshed per-slot map view, and occasional new-slot
        patches — and reads results ``pipeline_depth`` frames late."""
        from .frontend_step import (fused_track_step_chained,
                                    pack_chain_state, patch_chain_rows)

        cfg = self.cfg
        f = self.frame
        self.prof.start("0.FE_dispatch")
        lm_host, is3d = self._gather_lm_static()
        lm_dev = jnp.asarray(lm_host)

        if self._chain_S is None:
            # seed from the resolved host state; T_prev reconstructed
            # from the motion model's last relative step
            T_cur = f.T_wc.astype(np.float64)
            T_prev = lie_np.pose_compose(
                T_cur, lie_np.pose_inverse(self.motion.rel))
            st = pack_chain_state(
                f.px, f.px_und, f.valid.astype(np.float32),
                T_cur.astype(np.float32), T_prev.astype(np.float32),
                out=self._chain_buf)
            self._chain_S = jnp.asarray(st)
            self._chain_pyr = self.cur_pyr
        elif self._chain_patch is not None:
            # pre-padded device arrays, already advanced to the chain's
            # head frame by `finalize_detect` (see advance_chain_patch)
            rows_d, px_d, und_d, st_d = self._chain_patch
            self._chain_S = patch_chain_rows(
                self._chain_S, rows_d, px_d, und_d, st_d)
        self._chain_patch = None

        if isinstance(img, np.ndarray):
            if img.dtype != np.uint8 and img.size \
                    and float(img.max()) <= 1.5:
                img = img * 255.0
            img_u8 = (img if img.dtype == np.uint8
                      else np.clip(np.round(img), 0, 255).astype(np.uint8))
        else:
            img_u8 = img
        # dt ratio vs the previous dispatch interval (frame drops /
        # uneven arrival): scales the device prior
        dt = time - self._chain_last_time if self._chain_last_time else 0.0
        ratio = 1.0
        if self._chain_dt > 0 and dt > 0:
            ratio = float(np.clip(dt / self._chain_dt, 0.2, 6.0))
        if dt > 0:
            self._chain_dt = dt
        self._chain_last_time = time
        cur_pyr, S_out, packed, self._key_dev = fused_track_step_chained(
            jnp.asarray(img_u8), self._chain_pyr, self._chain_S, lm_dev,
            jnp.asarray([ratio], jnp.float32),
            self._key_dev, self._calib,
            clahe_val=float(cfg.clahe_val),
            max_fbklt_dist=float(cfg.max_fbklt_dist),
            klt_err=float(cfg.klt_err),
            ransac_err_px=float(cfg.ransac_err),
            robust_th=float(cfg.robust_mono_th),
            levels=cfg.klt_levels, win=cfg.klt_win_size,
            iters=cfg.max_iter, use_clahe=cfg.use_clahe,
            do_epipolar=cfg.do_epipolar, do_pose=True,
            ransac_iters=cfg.ransac_iter, pnp_iters=cfg.pnp_iters,
            fisheye=self._fisheye, use_prior=cfg.klt_use_prior,
            split_sub=cfg.klt_split_sub)
        self._chain_S = S_out
        self._chain_pyr = cur_pyr
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        self._dispatch_seq += 1
        pend = dict(packed=packed, time=time, T_pred=None,
                    do_pose=True, is3d=is3d, pyr=cur_pyr,
                    seq=self._dispatch_seq)
        self._pendings.append(pend)
        self.prof.stop("0.FE_dispatch")
        return pend

    def chain_apply_correction(self, T_old: np.ndarray, T_new: np.ndarray):
        """Propagate a map-side pose correction (BA / pose-graph /
        P3P-rescue snapped the resolved frame from T_old to T_new) into
        the pipelined recurrence:

        - left-compose the world-frame delta onto the device chain's
          pose rows (so future dispatches predict from corrected state),
        - tag every in-flight pending with the same delta, so when its
          already-computed result is resolved, its pose is re-expressed
          in the corrected world frame instead of the stale one (the
          round-4 failure: each keyframe's BA shifted the map while
          `depth` frames resolved against pre-BA poses)."""
        if float(np.abs(T_new.astype(np.float64)
                        - T_old.astype(np.float64)).max()) < 1e-9:
            return   # no-op correction (e.g. BA left the pose unchanged)
        delta = lie_np.pose_compose(
            T_new.astype(np.float64),
            lie_np.pose_inverse(T_old.astype(np.float64)))
        for p in self._pendings:
            p["delta"] = (delta if p.get("delta") is None
                          else lie_np.pose_compose(delta, p["delta"]))
        if self._chain_S is None:
            return
        from .frontend_step import patch_chain_pose_delta

        self._chain_S = patch_chain_pose_delta(
            self._chain_S, jnp.asarray(delta.astype(np.float32)))

    def resolve_pending(self) -> bool:
        """Read back and apply the OLDEST in-flight frame's result:
        slot/pose update, motion model, P3P fallback, keyframe decision.
        Returns the keyframe request for THAT frame."""
        cfg = self.cfg
        f = self.frame
        p = self._pendings.popleft()
        time = p["time"]
        do_pose = p["do_pose"]
        is3d = p["is3d"]
        f.time = time
        if p["pyr"] is not None:      # chained: expose this frame's
            self.prev_pyr = self.cur_pyr   # pyramid to the KF path
            self.cur_pyr = p["pyr"]
        T_pred = p["T_pred"]
        if T_pred is None:            # chained: prior was computed on
            T_pred = self.motion.predict(time)   # device; reconstruct
            if T_pred is None:
                T_pred = f.T_wc.astype(np.float64)
        # single packed readback (one RPC on a remote-attached device);
        # in pipelined mode the transfer has been in flight since dispatch
        self.prof.start("0.FE_readback")
        packed = np.asarray(p["packed"])
        self.prof.stop("0.FE_readback")
        N = len(f.px)
        tracked = packed[:N, 0:2]
        und = packed[:N, 2:4]
        status = packed[:N, 4] > 0.5
        pose_ok = packed[N, 0] > 0.5
        n_inl = int(packed[N, 1])
        T_new = np.concatenate([packed[N + 1, :5], packed[N + 2, :2]])
        if p.get("delta") is not None:
            # a map correction (BA/pose-graph/rescue) landed while this
            # frame was in flight: re-express its pose in the corrected
            # world frame (see chain_apply_correction)
            T_new = lie_np.pose_compose(
                p["delta"], T_new.astype(np.float64)).astype(np.float32)
        n_before = int(f.valid.sum())
        # slots born after this frame was dispatched carry no signal in
        # its output — leave them untouched (they join at a later seq)
        known = self._slot_birth <= p["seq"]
        upd = status & known
        f.px = np.where(upd[:, None], tracked, f.px)
        f.px_und = np.where(upd[:, None], und, f.px_und)
        f.valid &= status | ~known

        self.last_pose_ok = bool(pose_ok) if do_pose else None
        self.last_n_inl = int(n_inl) if do_pose else 0
        self.last_n_3d = int(is3d.sum())
        # KLT-collapse P3P forcing (`visual_front_end.cpp:228-233`): when
        # under a third of the tracked set survives (fast turns, blur),
        # the motion-model-seeded local PnP is unreliable — re-localize
        # with global P3P-RANSAC instead of trusting it
        klt_collapsed = (n_before > 0
                         and f.n_valid < 0.33 * n_before)
        chained = p["pyr"] is not None
        if do_pose:
            if klt_collapsed and cfg.do_p3p:
                if self._p3p_fallback(T_pred):
                    if chained:
                        # rescue succeeded: snap the device recurrence
                        # (and in-flight results) onto the rescued pose —
                        # without this the next resolve would overwrite
                        # the rescue with the chain's diverged pose and
                        # the recovery would be inert (round-4 advisor)
                        self.chain_apply_correction(
                            np.array(T_new, np.float64), f.T_wc)
                else:
                    f.T_wc = (np.array(T_new, np.float32) if bool(pose_ok)
                              else T_pred.astype(np.float32))
            elif bool(pose_ok):
                f.T_wc = np.array(T_new, np.float32)
            else:
                # PnP failed: P3P re-localization attempt
                # (`visual_front_end.cpp:731-742,815-818`)
                if cfg.do_p3p and self._p3p_fallback(T_pred):
                    if chained:
                        self.chain_apply_correction(
                            np.array(T_new, np.float64), f.T_wc)
                else:
                    f.T_wc = T_pred.astype(np.float32)
        else:
            f.T_wc = T_pred.astype(np.float32)

        self.motion.update(f.T_wc.astype(np.float64), time)
        self._frames_since_kf += 1

        self.prof.start("0.FE_kfcheck")
        is_kf = self.check_new_kf()
        self.prof.stop("0.FE_kfcheck")
        if is_kf:
            self._frames_since_kf = 0
        return is_kf

    def _p3p_fallback(self, T_pred: np.ndarray) -> bool:
        """P3P-RANSAC + motion-only PnP re-localization, used when the
        fused step's PnP fails (`computePose` fallback branch,
        `visual_front_end.cpp:659-851`)."""
        cfg = self.cfg
        f = self.frame
        sel = f.valid & (f.lmids >= 0)
        ids = f.lmids[sel]
        is3d = np.zeros_like(sel)
        is3d[sel] = self.map.lm_is3d[ids] & self.map.lm_valid[ids]
        rows = np.nonzero(is3d)[0]
        n3d = len(rows)
        if n3d < 5:
            f.T_wc = T_pred.astype(np.float32)
            return not self.initialized  # mono pre-init: pose undefined yet
        self.prof.start("1.FE_ComputePose")

        pts = self.map.lm_pos[f.lmids[rows]].astype(np.float32)
        px = f.px_und[rows]
        N = self.cfg.max_kps
        pts_p = np.zeros((N, 3), np.float32)
        px_p = np.zeros((N, 2), np.float32)
        vm = np.zeros(N, bool)
        pts_p[:n3d] = pts
        px_p[:n3d] = px
        vm[:n3d] = True

        fx, fy, cx, cy = self.cam.intrinsics_f

        T0 = T_pred.astype(np.float32)
        use_p3p = cfg.do_p3p
        if use_p3p:
            bv = np.array(self.cam.bearing(jnp.asarray(px_p)))
            T_p3p, _, n_inl = p3p_ransac(
                self._next_key(), jnp.asarray(bv), jnp.asarray(pts_p),
                jnp.asarray(px_p), jnp.asarray(vm), fx, fy, cx, cy,
                err_th=cfg.ransac_err, n_iters=cfg.ransac_iter)
            if int(n_inl) >= 5:
                T0 = np.array(T_p3p)

        T_ref, inlier, _ = pnp_refine(
            jnp.asarray(T0), jnp.asarray(pts_p), jnp.asarray(px_p),
            jnp.asarray(vm), fx, fy, cx, cy,
            robust_th=cfg.robust_mono_th, iters=self.cfg.pnp_iters)
        inlier = np.array(inlier)[:n3d]
        n_inl = int(inlier.sum())

        self.prof.stop("1.FE_ComputePose")
        if n_inl < max(5, int(0.25 * n3d)):
            # tracking failure — or a spurious minimum: a re-localized
            # pose explaining under a quarter of the tracked 3D set is
            # far more likely a mirrored/degenerate P3P solution than
            # the true pose; accepting it poisons the motion model and
            # the map. Keep the prediction; caller may reset.
            f.T_wc = T_pred.astype(np.float32)
            return False

        f.T_wc = np.array(T_ref, np.float32)
        # remove outlier observations from the frame
        f.valid[rows[~inlier]] = False
        return True

    # ------------------------------------------------------------------ #

    def check_new_kf(self) -> bool:
        """Keyframe-need heuristics, mirroring `checkNewKfReq`
        (`visual_front_end.cpp:986-1061`) condition by condition."""
        cfg = self.cfg
        f = self.frame
        if not self.initialized:
            return False  # mono: init path decides
        kfid = f.kf_id
        if kfid < 0 or not self.map.kf_valid[kfid]:
            return False

        cap = cfg.grid_cells[0] * cfg.grid_cells[1]
        n_occup = f.n_valid  # one kp per cell ⇒ occupied-cell proxy
        sel = f.valid & (f.lmids >= 0)
        ids = f.lmids[sel]
        n3d = int((self.map.lm_is3d[ids] & self.map.lm_valid[ids]).sum()) \
            if len(ids) else 0
        kf_lm = self.map.kf_landmark_ids(kfid, only_3d=True)
        kf_n3d = len(kf_lm)
        nb_from_kf = self._frames_since_kf
        time_diff = f.time - float(self.map.kf_times[kfid])

        if n_occup < 0.33 * cap and nb_from_kf >= 5:
            return True
        if n3d < 20 and nb_from_kf >= 2:
            return True
        if n3d > 0.5 * cap and nb_from_kf < 2:
            return False
        if cfg.stereo and time_diff > 1.0:
            return True

        parallax = self._median_parallax_to_kf(kfid) or 0.0
        cx = (parallax >= cfg.init_parallax / 2.0
              or (cfg.stereo and nb_from_kf > 2))
        c0 = parallax >= cfg.init_parallax
        c1 = n3d < 0.75 * kf_n3d
        c2 = n_occup < 0.5 * cap and n3d < 0.85 * kf_n3d
        return (c0 or c1 or c2) and cx

    def _median_parallax_to_kf(self, kfid: int) -> Optional[float]:
        """Rotation-compensated median parallax (`computeParallax`,
        `visual_front_end.cpp:1066-1141`)."""
        f = self.frame
        sel = np.nonzero(f.valid & (f.lmids >= 0))[0]
        if len(sel) < 8:
            return None
        kf_slots = {int(l): s for s, l in enumerate(self.map.obs_lmid[kfid])
                    if l >= 0}
        pairs = [(s, kf_slots[int(f.lmids[s])]) for s in sel
                 if int(f.lmids[s]) in kf_slots]
        if len(pairs) < 8:
            return None
        cur = f.px_und[[p[0] for p in pairs]]
        kf = self.map.obs_px[kfid][[p[1] for p in pairs]]
        # rotation compensation: rotate KF bearings into cur frame
        T_kf = self.map.kf_poses[kfid].astype(np.float64)
        R_rel = lie_np.quat_to_matrix(
            lie_np.pose_relative(f.T_wc.astype(np.float64), T_kf)[:4])
        fx, fy, cx, cy = self.cam.intrinsics_f
        xn = np.concatenate([(kf - (cx, cy)) / (fx, fy),
                             np.ones((len(kf), 1))], -1)
        rot = (R_rel @ xn.T).T
        rot_px = rot[:, :2] / np.maximum(rot[:, 2:], 1e-6) * (fx, fy) + (cx, cy)
        return float(np.median(np.linalg.norm(cur - rot_px, axis=-1)))

    # ------------------------------------------------------------------ #

    def detect_and_describe(self) -> Tuple[np.ndarray, np.ndarray]:
        """Fill empty grid cells with new detections and BRIEF-describe all
        current keypoints (`MapManager::extractKeypoints`,
        `map_manager.cpp:286-341`). Returns (new_rows, descriptors (N, 8))."""
        return self.finalize_detect(self.dispatch_detect())

    def dispatch_detect(self) -> dict:
        """Dispatch keyframe detection/description WITHOUT reading the
        result back. Snapshots the per-slot state it was computed from so
        :meth:`finalize_detect` can register the keyframe one or more
        frames later (the deferred-detection path keeps the arrival
        thread free of per-KF blocking round trips)."""
        cfg = self.cfg
        f = self.frame

        # dispatch mirrors `map_manager.cpp:312-323`: use_shi_tomasi →
        # GFTT (two-pass + cornerSubPix), use_fast → grid FAST,
        # use_singlescale_detector → single-scale Shi-Tomasi.
        # ONE fused dispatch + two readbacks (desc / geometry) per KF.
        if cfg.use_shi_tomasi:
            detector, thresh = "gftt", self._quality
        elif cfg.use_singlescale_detector:
            detector, thresh = "single", self._quality
        else:
            detector, thresh = "fast", self._fast_th
        from .frontend_step import fused_detect_describe

        desc_all, det_packed = fused_detect_describe(
            self.cur_pyr[0], jnp.asarray(f.px), jnp.asarray(f.valid),
            float(thresh), self._calib, detector=detector,
            cell_size=cfg.max_dist, max_out=cfg.max_kps,
            fisheye=self._fisheye)
        try:   # start both transfers before blocking: one RTT, not two
            desc_all.copy_to_host_async()
            det_packed.copy_to_host_async()
        except Exception:
            pass
        return dict(desc=desc_all, det=det_packed,
                    valid_snap=f.valid.copy(), px_snap=f.px.copy(),
                    px_und_snap=f.px_und.copy(), lmids_snap=f.lmids.copy(),
                    T_wc_snap=f.T_wc.copy(), time_snap=f.time,
                    n_valid_snap=f.n_valid, pyr_snap=self.cur_pyr)

    def finalize_detect(self, ki: dict) -> Tuple[np.ndarray, np.ndarray]:
        """Read back a :meth:`dispatch_detect` result and place the new
        keypoints into (still-free) frame slots. Returns
        (new_rows, descriptors (N, 8)) — descriptors/positions describe
        the SNAPSHOT frame the detection ran on."""
        cfg = self.cfg
        f = self.frame
        self.prof.start("1.KF_DetectDescribe")
        desc_all = np.asarray(ki["desc"])
        det_packed = np.asarray(ki["det"])
        N = len(f.px)
        kps = det_packed[:, 0:2]
        und_new = det_packed[:, 2:4]
        ok = det_packed[:, 5] > 0.5

        # adaptive threshold update (`feature_extractor.cpp:418-423,546-552`)
        n_det = int(ok.sum())
        cap = cfg.grid_cells[0] * cfg.grid_cells[1]
        n_free = max(cap - int(ki["n_valid_snap"]), 1)
        if cfg.use_singlescale_detector or cfg.use_shi_tomasi:
            if n_det < 0.33 * n_free:
                self._quality /= 2.0
            elif n_det > 0.9 * n_free:
                self._quality *= 1.5
        else:
            # floor above the sensor-noise band (~3 sigma of read noise):
            # in sparse views the adaptive loop would otherwise drive the
            # threshold into accepting noise corners, which then stereo-
            # match against noise and triangulate garbage landmarks
            if n_det < 0.33 * n_free:
                self._fast_th = max(5.0, self._fast_th * 0.5)
            elif n_det > 0.9 * n_free:
                self._fast_th = min(80.0, self._fast_th * 1.5)

        # place new kps into free slots; descriptors and undistorted px
        # came back from the fused call (desc_all rows N.. / und_new).
        # Slots free at DETECTION time: slots can only be lost (never
        # re-filled) between a deferred dispatch and this finalize, so
        # these are still free now.
        free_slots = np.nonzero(~ki["valid_snap"])[0]
        desc = desc_all[:N].copy()
        new_rows = []
        det_rows = np.nonzero(ok)[0]
        for i, slot in zip(det_rows, free_slots):
            f.px[slot] = kps[i]
            f.px_und[slot] = und_new[i]
            f.valid[slot] = True
            f.lmids[slot] = -1  # landmark assigned by caller
            desc[slot] = desc_all[N + i]
            new_rows.append(slot)
        new_rows = np.array(new_rows, np.int64)
        # this frame is becoming the reference keyframe: its pyramid is
        # the from-KF tracking source until the next keyframe
        self._kf_pyr = ki.get("pyr_snap") or self.cur_pyr
        if len(new_rows):
            # chain bookkeeping: these slots exist only from the NEXT
            # dispatch on (device recurrence patched then; older
            # in-flight resolves must not touch them)
            self._slot_birth[new_rows] = self._dispatch_seq + 1
            if self._chain_S is not None:
                self._chain_patch = self._build_chain_patch(ki, new_rows)
        self.prof.stop("1.KF_DetectDescribe")
        return new_rows, desc

    def _build_chain_patch(self, ki: dict, new_rows: np.ndarray):
        """Express the fresh detections at the device chain's HEAD frame:
        KLT-advance them across every in-flight frame's pyramid (one
        device hop each, no readback), so `patch_chain_rows` scatters
        positions consistent with the pyramid the next chained step will
        track from. Returns pre-padded device arrays."""
        from .frontend_step import advance_chain_patch

        cfg = self.cfg
        f = self.frame
        N = cfg.max_kps
        rows_p = np.full(N, 1 << 20, np.int32)   # OOB pad -> dropped
        px_p = np.zeros((N, 2), np.float32)
        und_p = np.zeros((N, 2), np.float32)
        st_p = np.zeros(N, np.float32)
        rows_p[:len(new_rows)] = new_rows
        px_p[:len(new_rows)] = f.px[new_rows]
        und_p[:len(new_rows)] = f.px_und[new_rows]
        st_p[:len(new_rows)] = 1.0
        px_d, und_d, st_d = (jnp.asarray(px_p), jnp.asarray(und_p),
                             jnp.asarray(st_p))
        pyr_prev = ki.get("pyr_snap") or self.cur_pyr
        for p in self._pendings:
            if p.get("pyr") is None:
                continue
            px_d, und_d, st_d = advance_chain_patch(
                pyr_prev, p["pyr"], px_d, st_d, self._calib,
                win=cfg.klt_win_size, iters=cfg.max_iter,
                fisheye=self._fisheye)
            pyr_prev = p["pyr"]
        return jnp.asarray(rows_p), px_d, und_d, st_d

    # ------------------------------------------------------------------ #

    def reset(self):
        """Tracking-failure reset (`SlamManager::reset`,
        `ov2slam.cpp:428-455`)."""
        self.frame = FrameState.empty(self.cfg.max_kps)
        self.motion.reset()
        self.prev_pyr = None
        self.cur_pyr = None
        self._pendings.clear()
        self._chain_S = None
        self._chain_pyr = None
        self._chain_patch = None
        self._chain_last_time = None
        self._chain_dt = 0.0
        self._slot_birth[:] = 0
        self._kf_pyr = None
        self.initialized = self.cfg.stereo
