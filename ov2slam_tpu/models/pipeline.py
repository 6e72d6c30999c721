"""Asynchronous stage-overlap pipeline.

The reference runs front-end ∥ mapper ∥ BA ∥ loop-closer as OS threads
sharing the map under mutexes (`ov2slam_node.cpp:198-208`,
`mapper.cpp:38-51`), connected by bounded keyframe queues with
backpressure (`mapper.cpp:784-819`, `estimator.cpp:185-218`).

TPU-native version: the front-end stays on the caller thread (it is the
real-time path); keyframe processing (mapper + local BA + loop closure)
runs on one worker thread. Queue semantics mirror the reference:

- the worker drains its queue to the *latest* keyframe, folding skipped
  ones (Estimator::getNewKf drain, `estimator.cpp:185-218`),
- under backpressure the expensive optional stages (local-map matching,
  loop closure) are skipped (`bnewkfavailable_` checks,
  `mapper.cpp:153-162`),
- BA preemption (`signalStopLocalBA`) becomes "newer KF already queued →
  solve with fewer iterations" — bounded compute instead of wall-clock
  aborts.

Map consistency: a single coarse lock guards map mutations — the same
granularity as the reference's `map_mutex_` (held by the front-end for
its whole frame, `visual_front_end.cpp:42`); BA solves run outside the
lock on problem snapshots, exactly like Ceres solves outside the mutex
with locked write-back (`optimizer.cpp:741`).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from ..utils import lie_np
from .slam import SlamManager


class AsyncSlamManager(SlamManager):
    """SlamManager with keyframe processing on a worker thread."""

    def __init__(self, cfg, use_loop_closer: Optional[bool] = None,
                 queue_size: int = 64):
        super().__init__(cfg, use_loop_closer)
        self.map_lock = threading.RLock()
        self._kf_queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        # in-flight work count (queued + being processed): flush() must
        # wait for the worker to be IDLE, not merely for the queue to be
        # empty — otherwise close() can tear down the interpreter while
        # the worker is mid-dispatch on the device (fatal on exit)
        self._pending = 0
        self._pending_cv = threading.Condition()
        # keyframes enqueued but not yet stereo-matched/triangulated —
        # the quantity KF backpressure keys on (_allow_new_kf)
        self._unmapped = 0
        self._kf_deferrals = 0
        self._fold_backlog = []   # inline-mapped KFs awaiting a BA window
        self._kf_inflight = None  # deferred keyframe awaiting registration
        self._worker = threading.Thread(target=self._kf_worker, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ #
    # overrides
    # ------------------------------------------------------------------ #

    def _create_keyframe(self, time, img_right):
        fe = self.frontend
        f = fe.frame

        # deferred detection (device-chained mode): dispatch now, read
        # back + register at the NEXT call — the detect readback was the
        # last per-keyframe blocking round trip on the arrival thread
        # (one ~RTT stall per KF = one dropped frame per KF at camera
        # rate). The keyframe's state is snapshotted at dispatch; the
        # chain's slot-birth masking keeps in-flight resolves off the
        # new slots until they are registered.
        if (self.cfg.pipelined_frontend and self.cfg.pipeline_depth >= 2
                and fe.initialized and not fe.bootstrap_kf
                and self._kf_inflight is None):
            det = fe.dispatch_detect()
            self._kf_inflight = dict(det=det, img_right=img_right,
                                     pyr=fe.cur_pyr)
            return -2   # sentinel: registration pending

        new_rows, desc = fe.detect_and_describe()
        if fe.bootstrap_kf and self.map.n_keyframes >= 1 \
                and len(new_rows) < 8:
            # featureless re-bootstrap veto (see SlamManager)
            f.valid[:] = False
            f.lmids[:] = -1
            f.kf_id = -1
            return -1
        # graceful degradation at capacity: drop surplus detections
        # instead of aborting (their frame slots simply stay 2D-less)
        n_alloc = min(len(new_rows), self.map.free_landmark_capacity)
        if n_alloc:
            lmids = self.map.new_landmarks(n_alloc)
            f.lmids[new_rows[:n_alloc]] = lmids
        lm_slots = np.where(f.valid, f.lmids, -1).astype(np.int32)
        kfid = self.map.add_keyframe(
            time, f.T_wc, lm_slots, f.px_und, desc.astype(np.uint32))
        f.kf_id = kfid

        if fe.initialized:
            # hand off to the worker. EVERY keyframe must be mapped
            # (stereo match + triangulation) — the reference's queue is
            # unbounded and only OPTIONAL stages skip under backpressure
            # (`mapper.cpp:153-162,784-819`); dropping a queued keyframe
            # leaves its landmarks 2D forever, n3d collapses and the
            # keyframe heuristics cascade. If the (large) queue is ever
            # full, map INLINE — blocking here would deadlock (this
            # thread holds the map lock the worker needs), and real-time
            # shedding belongs at the INPUT (frame dropping,
            # `ov2slam.cpp:292-299`), not at the mapper.
            # The seq snapshot detects cull+recycle before processing.
            item = (kfid, int(self.map.kf_seq[kfid]), fe.cur_pyr, img_right)
            try:
                self._kf_queue.put_nowait(item)
                with self._pending_cv:
                    self._pending += 1
                    self._unmapped += 1
            except queue.Full:
                # overload fallback: map inline (never skip mapping) and
                # leave the keyframe for the worker's next BA window via
                # the fold list (`estimator.cpp:195-214` folds skipped
                # keyframes the same way)
                self.mapper.process_keyframe(kfid, f, fe.cur_pyr,
                                             img_right)
                with self._pending_cv:
                    self._fold_backlog.append(kfid)
        return kfid

    def _finalize_kf_inflight(self):
        """Register a deferred keyframe: read back the detection, place
        new keypoints, add the keyframe from its dispatch-time snapshot,
        and enqueue it for the worker. Call with map_lock held (the
        transfers should be forced beforehand, outside the lock)."""
        rec = self._kf_inflight
        if rec is None:
            return
        self._kf_inflight = None
        fe = self.frontend
        f = fe.frame
        ki = rec["det"]
        new_rows, desc = fe.finalize_detect(ki)
        n_alloc = min(len(new_rows), self.map.free_landmark_capacity)
        if n_alloc:
            lmids = self.map.new_landmarks(n_alloc)
            f.lmids[new_rows[:n_alloc]] = lmids
        valid_kf = ki["valid_snap"].copy()
        valid_kf[new_rows] = True
        lm_all = ki["lmids_snap"].copy()
        lm_all[new_rows] = f.lmids[new_rows]
        lm_slots = np.where(valid_kf, lm_all, -1).astype(np.int32)
        px_und = ki["px_und_snap"].copy()
        px_und[new_rows] = f.px_und[new_rows]
        kfid = self.map.add_keyframe(
            float(ki["time_snap"]), ki["T_wc_snap"], lm_slots, px_und,
            desc.astype(np.uint32))
        f.kf_id = kfid
        item = (kfid, int(self.map.kf_seq[kfid]), rec["pyr"],
                rec["img_right"])
        try:
            self._kf_queue.put_nowait(item)
            with self._pending_cv:
                self._pending += 1
                self._unmapped += 1
        except queue.Full:
            self.mapper.process_keyframe(kfid, f, rec["pyr"],
                                         rec["img_right"])
            with self._pending_cv:
                self._fold_backlog.append(kfid)

    def _allow_new_kf(self) -> bool:
        """Mapper-lag backpressure (`bnewkfavailable_` checks,
        `mapper.cpp:153-162`): while the worker still owes stereo
        matching/triangulation for a queued keyframe, the front-end's
        keyframe heuristics run against an UN-triangulated map (few 3D
        kps, sparse occupancy) and fire keyframe cascades — the round-3
        failure mode that inflated 14 sync keyframes to 58 async ones.

        Deferral is bounded and engages only at a REAL backlog (more
        than one keyframe still unmapped): at most 2 consecutive frames,
        and never when the track set is genuinely thinning. Deferring on
        any single unmapped keyframe — the round-4 behavior — stretched
        every keyframe baseline by up to 4 frames under load and cost
        ~8x async ATE on the 752x480 arc (0.10 vs 0.013 sync); the
        reference sheds load by skipping OPTIONAL mapper stages, never
        by delaying keyframe creation (`mapper.cpp:153-162`)."""
        if self._kf_inflight is not None:
            return False   # one deferred registration at a time
        if self._unmapped <= 1:
            self._kf_deferrals = 0
            return True
        cap = self.cfg.grid_cells[0] * self.cfg.grid_cells[1]
        if self.frontend.frame.n_valid < max(10, int(0.45 * cap)):
            self._kf_deferrals = 0
            return True
        self._kf_deferrals += 1
        if self._kf_deferrals > 2:
            self._kf_deferrals = 0
            return True
        return False

    def process_frame(self, img_left, img_right=None, time: float = 0.0):
        # the in-flight frame's device→host transfer is the only long
        # blocking wait on this thread — force it OUTSIDE the map lock so
        # the worker keeps running through it (round 3 held the lock for
        # the whole front-end frame and starved the worker on 2-core
        # hosts; the reference's `map_mutex_` never covers a device wait)
        self.frontend.wait_pending()
        if self._kf_inflight is not None:
            # force the detect transfers to complete OUTSIDE the lock,
            # then register the deferred keyframe under it
            ki = self._kf_inflight["det"]
            ki["desc"] = np.asarray(ki["desc"])
            ki["det"] = np.asarray(ki["det"])
            with self.map_lock:
                self._finalize_kf_inflight()
        # input backpressure for flat-out (unpaced) feeding: when the
        # worker owes mapping for more than one keyframe, tracking runs
        # against a mostly-2D map, the keyframe heuristics cascade, and
        # the system self-sustains its own overload. The reference's
        # non-realtime mode absorbs this by letting the INPUT queue grow
        # (`ov2slam.cpp:268-307` without `force_realtime`); blocking the
        # caller here is the bounded-memory equivalent. Paced (camera-
        # rate) callers almost never hit this wait.
        with self._pending_cv:
            deadline = float(self.cfg.backpressure_wait_s)
            while self._unmapped > 1 and deadline > 0:
                self._pending_cv.wait(0.05)
                deadline -= 0.05
        with self.map_lock:
            return super().process_frame(img_left, img_right, time)

    # ------------------------------------------------------------------ #

    def _kf_worker(self):
        while not self._stop.is_set():
            try:
                item = self._kf_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            # drain to the newest KF. Reference semantics: the Mapper maps
            # EVERY keyframe (stereo match + triangulation) but skips the
            # optional stages under backpressure (`mapper.cpp:153-162`),
            # while the Estimator optimizes only the LATEST, folding the
            # skipped ids into its BA window (`estimator.cpp:195-214`).
            items = [item]
            while True:
                try:
                    items.append(self._kf_queue.get_nowait())
                except queue.Empty:
                    break
            backlogged = len(items) > 1
            try:
                skipped = []
                for kfid, seq, pyr, img_right in items[:-1]:
                    if self.map.kf_valid[kfid] \
                            and int(self.map.kf_seq[kfid]) == seq:
                        self.mapper.process_keyframe(
                            kfid, self.frontend.frame, pyr, img_right,
                            lock=self.map_lock)
                        skipped.append(kfid)
                    with self._pending_cv:
                        self._unmapped = max(0, self._unmapped - 1)
                        self._pending_cv.notify_all()
                kfid, seq, pyr, img_right = items[-1]
                with self._pending_cv:
                    skipped.extend(self._fold_backlog)
                    self._fold_backlog = []
                self._process_kf(kfid, seq, pyr, img_right,
                                 under_pressure=backlogged,
                                 fold_kfs=skipped)
            except Exception:  # worker must survive; surface via counter
                import traceback

                traceback.print_exc()
                self.n_worker_errors = getattr(self, "n_worker_errors", 0) + 1
                # the per-item _unmapped decrements may have been skipped
                # by the raise; recompute from ground truth (items still
                # in the queue) so backpressure can't wedge open — two
                # leaked counts would otherwise cost every later frame
                # the full wait timeout
                with self._pending_cv:
                    self._unmapped = self._kf_queue.qsize()
                    self._pending_cv.notify_all()
            finally:
                with self._pending_cv:
                    self._pending -= len(items)
                    self._pending_cv.notify_all()

    def _process_kf(self, kfid, seq, pyr, img_right, under_pressure: bool,
                    fold_kfs=()):
        if not self.map.kf_valid[kfid] or int(self.map.kf_seq[kfid]) != seq:
            with self._pending_cv:
                self._unmapped = max(0, self._unmapped - 1)
                self._pending_cv.notify_all()
            return   # culled (and possibly recycled) while queued
        self.mapper.process_keyframe(kfid, self.frontend.frame, pyr,
                                     img_right, lock=self.map_lock)
        with self._pending_cv:
            self._unmapped = max(0, self._unmapped - 1)
            self._pending_cv.notify_all()
        if self.cfg.do_track_localmap and not under_pressure:
            self.mapper.match_to_local_map(kfid, lock=self.map_lock)
        if self.cfg.slam_mode:
            T_kf_pre = self.map.kf_poses[kfid].copy()
            self.estimator.local_ba(kfid, lock=self.map_lock,
                                    extra_window=fold_kfs)
            with self.map_lock:
                self.estimator.map_filtering(kfid)
                # propagate BA's pose correction into the live front-end
                # (the sync manager refreshes f.T_wc inline after BA;
                # without the async equivalent, tracking integrates from
                # pre-BA poses forever and the corrections never reach
                # the trajectory — measured 0.10 vs 0.013 sync ATE on
                # the 752x480 arc). World-frame delta of THIS keyframe,
                # left-composed onto the frame pose, the motion model
                # and the in-flight device chain.
                if self.map.kf_valid[kfid] \
                        and int(self.map.kf_seq[kfid]) == seq:
                    T_kf_post = self.map.kf_poses[kfid]
                    fe = self.frontend
                    f = fe.frame
                    T_old = f.T_wc.copy()
                    delta = lie_np.pose_compose(
                        T_kf_post.astype(np.float64),
                        lie_np.pose_inverse(T_kf_pre.astype(np.float64)))
                    f.T_wc = lie_np.pose_compose(
                        delta, f.T_wc.astype(np.float64)).astype(np.float32)
                    if fe.motion.prev_T is not None:
                        fe.motion.prev_T = lie_np.pose_compose(
                            delta, fe.motion.prev_T)
                    fe.chain_apply_correction(T_old, f.T_wc)
        if self.loop_closer is not None and not under_pressure:
            # lock passed DOWN, not held here: the closer holds it only
            # for the index query/add and the closure application — the
            # multi-second verification cascade runs lock-free so paced
            # arrival keeps tracking (round-5 revisit bench: closure
            # stalls under the lock caused drop storms + divergence)
            self.loop_closer.process_keyframe(
                kfid, img=pyr[0] if pyr is not None else None,
                lock=self.map_lock)

    # ------------------------------------------------------------------ #

    def flush(self, timeout: float = 120.0):
        """Wait until all queued keyframes are fully PROCESSED — not just
        dequeued (end-of-sequence barrier, `writeResults` waits for BA/LC,
        `ov2slam.cpp:579-582`). The generous default timeout covers cold
        XLA compiles inside the worker's first solves."""
        import time as _t

        deadline = _t.time() + timeout
        with self._pending_cv:
            while self._pending > 0:
                remain = deadline - _t.time()
                if remain <= 0:
                    break
                self._pending_cv.wait(remain)

    def close(self):
        self.flush()
        self._stop.set()
        # worker must actually exit before the interpreter can tear down:
        # a thread mid-device-dispatch at exit aborts the process
        self._worker.join(timeout=120.0)

    def estimated_trajectory(self):
        self.frontend.wait_pending()
        with self.map_lock:
            self._finalize_kf_inflight()
            self.finish()
            self._finalize_kf_inflight()     # may enqueue one final keyframe
        self.flush()
        with self.map_lock:
            return super().estimated_trajectory()

    def write_results(self, out_dir: str = "."):
        self.frontend.wait_pending()
        with self.map_lock:
            self._finalize_kf_inflight()
            self.finish()
            self._finalize_kf_inflight()
        self.flush()
        with self.map_lock:
            super().write_results(out_dir)
