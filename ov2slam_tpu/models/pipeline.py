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

from .slam import SlamManager


class AsyncSlamManager(SlamManager):
    """SlamManager with keyframe processing on a worker thread."""

    def __init__(self, cfg, use_loop_closer: Optional[bool] = None,
                 queue_size: int = 4):
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
        self._worker = threading.Thread(target=self._kf_worker, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ #
    # overrides
    # ------------------------------------------------------------------ #

    def _create_keyframe(self, time, img_right):
        fe = self.frontend
        f = fe.frame

        with self.map_lock:
            new_rows, desc = fe.detect_and_describe()
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
            # hand off to the worker (drop-oldest on overflow = the
            # reference's real-time load shedding); the seq snapshot
            # detects the slot being culled+recycled before processing
            item = (kfid, int(self.map.kf_seq[kfid]), fe.cur_pyr, img_right)
            with self._pending_cv:
                try:
                    self._kf_queue.put_nowait(item)
                    self._pending += 1
                except queue.Full:
                    try:
                        self._kf_queue.get_nowait()
                        self._pending -= 1
                    except queue.Empty:
                        pass
                    self._kf_queue.put_nowait(item)
                    self._pending += 1
        return kfid

    def process_frame(self, img_left, img_right=None, time: float = 0.0):
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
                        with self.map_lock:
                            self.mapper.process_keyframe(
                                kfid, self.frontend.frame, pyr, img_right)
                        skipped.append(kfid)
                kfid, seq, pyr, img_right = items[-1]
                self._process_kf(kfid, seq, pyr, img_right,
                                 under_pressure=backlogged,
                                 fold_kfs=skipped)
            except Exception:  # worker must survive; surface via counter
                import traceback

                traceback.print_exc()
                self.n_worker_errors = getattr(self, "n_worker_errors", 0) + 1
            finally:
                with self._pending_cv:
                    self._pending -= len(items)
                    self._pending_cv.notify_all()

    def _process_kf(self, kfid, seq, pyr, img_right, under_pressure: bool,
                    fold_kfs=()):
        if not self.map.kf_valid[kfid] or int(self.map.kf_seq[kfid]) != seq:
            return   # culled (and possibly recycled) while queued
        with self.map_lock:
            self.mapper.process_keyframe(kfid, self.frontend.frame, pyr,
                                         img_right)
            if self.cfg.do_track_localmap and not under_pressure:
                self.mapper.match_to_local_map(kfid)
        if self.cfg.slam_mode:
            self.estimator.local_ba(kfid, lock=self.map_lock,
                                    extra_window=fold_kfs)
            with self.map_lock:
                self.estimator.map_filtering(kfid)
        if self.loop_closer is not None and not under_pressure:
            with self.map_lock:
                self.loop_closer.process_keyframe(
                    kfid, img=pyr[0] if pyr is not None else None)

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

    def write_results(self, out_dir: str = "."):
        self.flush()
        with self.map_lock:
            super().write_results(out_dir)
