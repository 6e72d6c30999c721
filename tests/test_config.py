import numpy as np
import pytest

from ov2slam_tpu.utils.config import SlamConfig, load_config

REF_YAML = "/root/reference/parameters_files/fast/euroc/euroc_stereo.yaml"


def test_load_reference_yaml():
    cfg = load_config(REF_YAML)
    assert cfg.stereo and not cfg.mono
    assert cfg.cam_left.fx == pytest.approx(458.654)
    assert cfg.cam_right.fy == pytest.approx(456.134)
    assert cfg.max_dist == 50
    assert cfg.klt_win_size == 9
    assert cfg.klt_pyr_lvl == 3
    assert cfg.robust_mono_th == pytest.approx(5.9915)
    assert cfg.use_fast and not cfg.use_shi_tomasi
    assert not cfg.use_loop_closer
    assert cfg.cam_left.T_body_cam is not None
    assert cfg.cam_left.T_body_cam.shape == (4, 4)
    np.testing.assert_allclose(cfg.cam_left.T_body_cam[3], [0, 0, 0, 1])


def test_grid_capacity_matches_reference_formula():
    cfg = load_config(REF_YAML)
    # slam_params.cpp:107-110: ceil(752/50)*ceil(480/50) = 16*10 = 160
    gy, gx = cfg.grid_cells
    assert (gy, gx) == (10, 16)
    assert cfg.max_kps >= 160
    assert cfg.max_kps % 128 == 0


def test_accurate_profile():
    cfg = load_config(
        "/root/reference/parameters_files/accurate/euroc/euroc_stereo.yaml")
    assert cfg.use_singlescale_detector
    assert cfg.use_clahe
    assert cfg.use_loop_closer
    assert cfg.max_dist == 35


def test_mode_validation():
    cfg = SlamConfig(mono=True, stereo=True)
    with pytest.raises(ValueError):
        cfg.validate()


def test_all_reference_parameter_files_load():
    """Every reference parameter file (3 profiles x 4 datasets, mono+stereo)
    must load and yield buildable cameras — the TPU build consumes the
    reference's YAMLs unchanged (`parameters_files/**`)."""
    import glob

    from ov2slam_tpu.core.camera import build_camera

    files = sorted(glob.glob(
        "/root/reference/parameters_files/**/*.yaml", recursive=True))
    assert len(files) >= 20
    for f in files:
        cfg = load_config(f)
        cam_l = build_camera(cfg.cam_left, other=cfg.cam_left)
        assert cam_l.width > 0 and cam_l.height > 0
        if cfg.stereo:
            cam_r = build_camera(cfg.cam_right, other=cfg.cam_left)
            assert cam_r.width == cfg.cam_right.width


def test_unhonored_keys_warn_once(tmp_path):
    """Config honesty (round-1 verdict #10): a key that is parsed but not
    honored must warn when set away from the implemented behavior."""
    import warnings

    import ov2slam_tpu.utils.config as cfg_mod

    src = open(REF_YAML).read()
    assert "use_dogleg: 0" in src
    mod = src.replace("use_dogleg: 0", "use_dogleg: 1")
    p = tmp_path / "dogleg.yaml"
    p.write_text(mod)

    cfg_mod._warned_keys.discard("use_dogleg")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        load_config(str(p))
    msgs = [str(w.message) for w in rec]
    assert any("use_dogleg" in m for m in msgs), msgs
    # warned once: second load stays silent
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        load_config(str(p))
    assert not any("use_dogleg" in str(w.message) for w in rec2)


def test_default_profile_values_do_not_warn():
    import warnings

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        load_config(REF_YAML)
    assert not [w for w in rec if "not honored" in str(w.message)], \
        [str(w.message) for w in rec]
