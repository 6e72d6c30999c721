"""Native mapcore vs numpy-fallback parity."""

import numpy as np
import pytest

from ov2slam_tpu import native
from ov2slam_tpu.mapping.store import MapStore
from ov2slam_tpu.utils.config import SlamConfig

from test_mapstore import add_kf


@pytest.mark.skipif(not native.AVAILABLE, reason="libmapcore not built")
def test_native_available():
    assert native.AVAILABLE


def _build_map(monkeypatch, use_native):
    monkeypatch.setattr(native, "AVAILABLE", use_native and native.AVAILABLE)
    rng = np.random.default_rng(0)
    store = MapStore(SlamConfig(max_keyframes=32, max_landmarks=512))
    lm = store.new_landmarks(40)
    store.set_landmark_positions(
        lm, rng.uniform(-1, 1, (40, 3)).astype(np.float32))
    k0 = add_kf(store, 0.0, lmids=lm, stereo=True)
    k1 = add_kf(store, 1.0, lmids=lm[:25])
    k2 = add_kf(store, 2.0, lmids=lm[10:30])
    return store, (k0, k1, k2)


@pytest.mark.skipif(not native.AVAILABLE, reason="libmapcore not built")
def test_parity_observers_and_covisibility(monkeypatch):
    s_nat, kfs = _build_map(monkeypatch, True)
    s_py, _ = _build_map(monkeypatch, False)
    np.testing.assert_array_equal(s_nat.obs_lmid, s_py.obs_lmid)
    np.testing.assert_array_equal(s_nat.lm_anchor_kf, s_py.lm_anchor_kf)
    # observer sets equal (row order may differ)
    for l in range(40):
        assert (set(s_nat.landmark_observers(l))
                == set(s_py.landmark_observers(l)))
    for k in kfs:
        monkeypatch.setattr(native, "AVAILABLE", True)
        c_nat = s_nat.covisibility_counts(k)
        monkeypatch.setattr(native, "AVAILABLE", False)
        c_py = s_py.covisibility_counts(k)
        np.testing.assert_array_equal(c_nat, c_py)


@pytest.mark.skipif(not native.AVAILABLE, reason="libmapcore not built")
def test_parity_ba_problem(monkeypatch):
    s_nat, (k0, k1, k2) = _build_map(monkeypatch, True)

    monkeypatch.setattr(native, "AVAILABLE", True)
    p_nat = s_nat.build_ba_problem([k0, k1, k2], [k0], max_kfs=8,
                                   max_obs=256)
    monkeypatch.setattr(native, "AVAILABLE", False)
    p_py = s_nat.build_ba_problem([k0, k1, k2], [k0], max_kfs=8,
                                  max_obs=256)
    np.testing.assert_array_equal(p_nat.kf_ids, p_py.kf_ids)
    np.testing.assert_array_equal(p_nat.lm_ids, p_py.lm_ids)
    np.testing.assert_array_equal(p_nat.obs_kf, p_py.obs_kf)
    np.testing.assert_array_equal(p_nat.obs_lm, p_py.obs_lm)
    np.testing.assert_array_equal(p_nat.obs_px, p_py.obs_px)
    np.testing.assert_array_equal(p_nat.obs_cam, p_py.obs_cam)
