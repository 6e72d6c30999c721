import numpy as np
import pytest

from ov2slam_tpu.mapping.store import MapStore
from ov2slam_tpu.utils.config import SlamConfig
from ov2slam_tpu.utils import lie_np


@pytest.fixture
def store():
    cfg = SlamConfig(max_keyframes=32, max_landmarks=512)
    return MapStore(cfg)


def add_kf(store, time, n_lm=None, lmids=None, stereo=False):
    N = store.N
    lm_slots = np.full(N, -1, np.int32)
    if lmids is not None:
        lm_slots[: len(lmids)] = lmids
    px = np.random.default_rng(int(time * 100)).uniform(
        0, 400, (N, 2)).astype(np.float32)
    desc = np.zeros((N, 8), np.uint32)
    T = np.concatenate([[1, 0, 0, 0], [time, 0, 0]]).astype(np.float32)
    if stereo:
        st = lm_slots >= 0
        return store.add_keyframe(time, T, lm_slots, px, desc,
                                  is_stereo=st, rpx=px - [5.0, 0.0])
    return store.add_keyframe(time, T, lm_slots, px, desc)


def test_add_keyframe_and_observers(store):
    lm = store.new_landmarks(10)
    k0 = add_kf(store, 0.0, lmids=lm)
    k1 = add_kf(store, 1.0, lmids=lm[:6])
    assert store.n_keyframes == 2
    assert set(store.landmark_observers(lm[0])) == {k0, k1}
    assert set(store.landmark_observers(lm[8])) == {k0}
    assert store.lm_anchor_kf[lm[0]] == k0


def test_covisibility(store):
    lm = store.new_landmarks(20)
    store.set_landmark_positions(lm, np.random.rand(20, 3).astype(np.float32))
    k0 = add_kf(store, 0.0, lmids=lm)          # sees all 20
    k1 = add_kf(store, 1.0, lmids=lm[:12])     # shares 12 with k0
    k2 = add_kf(store, 2.0, lmids=lm[15:])     # shares 5 with k0, 0 with k1
    c0 = store.covisibility_counts(k0)
    assert c0[k1] == 12 and c0[k2] == 5
    cov = store.covisible_kfs(k0, min_score=1)
    assert list(cov) == [k1, k2]
    assert list(store.covisible_kfs(k0, min_score=6)) == [k1]


def test_remove_keyframe_updates_observers(store):
    lm = store.new_landmarks(5)
    k0 = add_kf(store, 0.0, lmids=lm)
    k1 = add_kf(store, 1.0, lmids=lm)
    store.remove_keyframe(k0)
    assert not store.kf_valid[k0]
    assert set(store.landmark_observers(lm[0])) == {k1}


def test_remove_landmark_clears_slots(store):
    lm = store.new_landmarks(5)
    k0 = add_kf(store, 0.0, lmids=lm)
    store.remove_landmark(int(lm[2]))
    assert not store.lm_valid[lm[2]]
    assert (store.obs_lmid[k0] == lm[2]).sum() == 0
    # others untouched
    assert (store.obs_lmid[k0] == lm[0]).sum() == 1


def test_merge_landmarks(store):
    lma = store.new_landmarks(1)[0]
    lmb = store.new_landmarks(1)[0]
    k0 = add_kf(store, 0.0, lmids=[lma])          # sees a only
    k1 = add_kf(store, 1.0, lmids=[lmb])          # sees b only
    k2 = add_kf(store, 2.0, lmids=[lma, lmb])     # sees both
    store.merge_landmarks(int(lma), int(lmb))
    assert not store.lm_valid[lmb]
    obs = set(store.landmark_observers(lma))
    assert obs == {k0, k1, k2}
    # k2's duplicate observation of b removed, not rewritten
    assert (store.obs_lmid[k2] == lma).sum() == 1


def test_build_ba_problem(store):
    lm = store.new_landmarks(30)
    store.set_landmark_positions(
        lm, np.random.default_rng(0).uniform(-1, 1, (30, 3)).astype(np.float32))
    k0 = add_kf(store, 0.0, lmids=lm, stereo=True)
    k1 = add_kf(store, 1.0, lmids=lm[:20])
    k2 = add_kf(store, 2.0, lmids=lm[:9])

    prob = store.build_ba_problem([k0, k1, k2], [k0], max_kfs=8, max_obs=256)
    assert prob.kf_ids[0] == k0 and prob.kf_fixed[0]
    assert not prob.kf_fixed[1]
    # landmarks seen >=2 times: lm[:20]
    assert (prob.lm_ids >= 0).sum() == 20
    # stereo rows doubled for k0's 20 shared landmarks
    n_left = ((prob.obs_cam == 0) & prob.obs_valid).sum()
    n_right = ((prob.obs_cam == 1) & prob.obs_valid).sum()
    assert n_right == 20          # k0 stereo obs on the 20 selected lms
    assert n_left == 20 + 20 + 9

    # write-back
    new_poses = prob.kf_poses.copy()
    new_poses[:, 4] += 1.0
    new_lms = prob.lm_pos + 0.5
    keep = np.ones(len(prob.lm_ids), bool)
    keep[0] = False
    store.apply_ba_result(prob, new_poses, new_lms, keep)
    assert store.kf_poses[k1][4] == new_poses[1][4]
    assert store.kf_poses[k0][4] == 0.0        # fixed pose untouched
    assert not store.lm_valid[prob.lm_ids[0]]  # culled
    assert store.lm_pos[prob.lm_ids[1]][0] == new_lms[1][0]


def test_capacity_behavior():
    cfg = SlamConfig(max_keyframes=2, max_landmarks=4)
    store = MapStore(cfg)
    store.new_landmarks(4)
    with pytest.raises(RuntimeError):   # callers clamp via
        store.new_landmarks(1)          # free_landmark_capacity
    k0 = add_kf(store, 0.0)
    add_kf(store, 1.0)
    # keyframes degrade gracefully at capacity: the oldest NON-ORIGIN is
    # evicted (sliding-map backstop; the origin anchors the gauge and is
    # never culled) instead of aborting a long run
    k2 = add_kf(store, 2.0)
    assert store.n_keyframes == 2
    assert store.n_evictions == 1
    assert store.kf_valid[k0] and store.kf_valid[k2]
    assert sorted(store.kf_times[store.kf_valid].tolist()) == [0.0, 2.0]


def test_checkpoint_roundtrip(tmp_path, store):
    from ov2slam_tpu.mapping.checkpoint import load_map, save_map
    from ov2slam_tpu.utils.config import SlamConfig

    lm = store.new_landmarks(12)
    store.set_landmark_positions(lm, np.random.rand(12, 3).astype(np.float32))
    k0 = add_kf(store, 0.0, lmids=lm, stereo=True)
    k1 = add_kf(store, 1.0, lmids=lm[:6])
    p = tmp_path / "map.npz"
    save_map(store, str(p))

    fresh = MapStore(SlamConfig(max_keyframes=32, max_landmarks=512))
    load_map(fresh, str(p))
    assert fresh.n_keyframes == 2
    assert fresh.n_landmarks_3d == 12
    np.testing.assert_array_equal(fresh.obs_lmid, store.obs_lmid)
    np.testing.assert_array_equal(fresh.kf_poses, store.kf_poses)
    assert set(fresh.landmark_observers(lm[0])) == {k0, k1}
    # cursors restored: new allocations continue after the old ones
    nxt = fresh.new_landmarks(1)[0]
    assert nxt == lm[-1] + 1

    # capacity mismatch rejected
    small = MapStore(SlamConfig(max_keyframes=8, max_landmarks=64))
    with pytest.raises(ValueError):
        load_map(small, str(p))
