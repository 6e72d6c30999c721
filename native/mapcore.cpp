// mapcore — native runtime for the SLAM map's pointer-chasing hot paths.
//
// The reference implements its whole runtime in C++ (`src/map_manager.cpp`,
// `src/frame.cpp`: observation tables, observer lists, covisibility,
// problem construction). In this framework the *compute* path is JAX/XLA;
// this library is the native equivalent of the runtime around it: the
// per-keyframe bookkeeping loops that are pure pointer-chasing and would
// otherwise run as Python-level loops (BA problem row building, observer
// list maintenance, covisibility counting).
//
// Zero-copy design: Python/numpy owns every array; these functions operate
// on raw pointers into those buffers. All shapes are passed explicitly.
// Build: `make -C native` → libmapcore.so, loaded via ctypes
// (`ov2slam_tpu/native.py`), with a pure-numpy fallback when absent.

#include <cstdint>

extern "C" {

// Insert a keyframe's observations into per-landmark observer lists.
// Rejected slots (dead landmark / full observer list) are cleared to -1.
// Returns the number of accepted observations.
//   lmids        (N)       slot -> landmark id, -1 empty   [modified]
//   lm_valid     (L)       uint8
//   lm_obs_kf    (L, cap)  observer keyframe ids, -1 empty [modified]
//   lm_obs_slot  (L, cap)  slot within the observer's table [modified]
//   lm_anchor    (L)       first-observer keyframe id      [modified]
int32_t add_keyframe_obs(int32_t kfid, int32_t N, int32_t cap,
                         int32_t* lmids, const uint8_t* lm_valid,
                         int32_t* lm_obs_kf, int32_t* lm_obs_slot,
                         int32_t* lm_anchor) {
    int32_t accepted = 0;
    for (int32_t s = 0; s < N; ++s) {
        const int32_t l = lmids[s];
        if (l < 0) continue;
        if (!lm_valid[l]) { lmids[s] = -1; continue; }
        int32_t* row = lm_obs_kf + (int64_t)l * cap;
        int32_t free_i = -1;
        for (int32_t i = 0; i < cap; ++i) {
            if (row[i] < 0) { free_i = i; break; }
        }
        if (free_i < 0) { lmids[s] = -1; continue; }
        row[free_i] = kfid;
        lm_obs_slot[(int64_t)l * cap + free_i] = s;
        if (lm_anchor[l] < 0) lm_anchor[l] = kfid;
        ++accepted;
    }
    return accepted;
}

// Count, per landmark, how often it is observed (as a valid 3D landmark)
// across a window of keyframes. counts must be zero-initialized (L).
void count_window_lms(int32_t n_window, const int32_t* window,
                      const int32_t* obs_lmid, int32_t N,
                      const uint8_t* lm_is3d_valid, int32_t* counts) {
    for (int32_t wi = 0; wi < n_window; ++wi) {
        const int32_t k = window[wi];
        const int32_t* row = obs_lmid + (int64_t)k * N;
        for (int32_t s = 0; s < N; ++s) {
            const int32_t l = row[s];
            if (l >= 0 && lm_is3d_valid[l]) ++counts[l];
        }
    }
}

// Emit padded BA observation rows for a keyframe window. Landmarks are
// pre-selected by the caller via lm_index (L -> problem row or -1).
// Stereo observations expand to an extra right-camera row (cam = 1).
// Returns the number of rows written (<= max_obs).
int32_t build_ba_obs(int32_t n_window, const int32_t* window,
                     const int32_t* obs_lmid, const float* obs_px,
                     const float* obs_rpx, const uint8_t* obs_stereo,
                     int32_t N, const int32_t* lm_index, int32_t max_obs,
                     int32_t* out_kf, int32_t* out_lm, float* out_px,
                     int8_t* out_cam) {
    int32_t n = 0;
    for (int32_t wi = 0; wi < n_window; ++wi) {
        const int32_t k = window[wi];
        const int64_t base = (int64_t)k * N;
        const int32_t* lrow = obs_lmid + base;
        for (int32_t s = 0; s < N; ++s) {
            const int32_t l = lrow[s];
            if (l < 0) continue;
            const int32_t li = lm_index[l];
            if (li < 0) continue;
            if (n >= max_obs) return n;
            out_kf[n] = wi;
            out_lm[n] = li;
            out_px[2 * n] = obs_px[(base + s) * 2];
            out_px[2 * n + 1] = obs_px[(base + s) * 2 + 1];
            out_cam[n] = 0;
            ++n;
            if (obs_stereo[base + s]) {
                if (n >= max_obs) return n;
                out_kf[n] = wi;
                out_lm[n] = li;
                out_px[2 * n] = obs_rpx[(base + s) * 2];
                out_px[2 * n + 1] = obs_rpx[(base + s) * 2 + 1];
                out_cam[n] = 1;
                ++n;
            }
        }
    }
    return n;
}

// Covisibility: counts[k] += 1 for every observer k of every valid 3D
// landmark observed by keyframe kfid. counts must be zero-initialized (K).
void covisibility_counts(int32_t kfid, const int32_t* obs_lmid, int32_t N,
                         const uint8_t* lm_is3d_valid,
                         const int32_t* lm_obs_kf, int32_t cap,
                         const uint8_t* kf_valid, int32_t* counts) {
    const int32_t* lrow = obs_lmid + (int64_t)kfid * N;
    for (int32_t s = 0; s < N; ++s) {
        const int32_t l = lrow[s];
        if (l < 0 || !lm_is3d_valid[l]) continue;
        const int32_t* row = lm_obs_kf + (int64_t)l * cap;
        for (int32_t i = 0; i < cap; ++i) {
            const int32_t k = row[i];
            if (k >= 0 && kf_valid[k]) ++counts[k];
        }
    }
    counts[kfid] = 0;
}

}  // extern "C"
