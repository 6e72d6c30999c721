from ov2slam_tpu.utils.config import load_config
from ov2slam_tpu.utils.profiles import apply_profile

import pytest

REF = "/root/reference/parameters_files/fast/euroc/euroc_stereo.yaml"


def test_profiles_match_reference_deltas():
    cfg = load_config(REF)
    apply_profile(cfg, "accurate")
    assert cfg.use_singlescale_detector and cfg.use_clahe
    assert cfg.use_loop_closer and not cfg.do_p3p
    assert cfg.max_dist == 35
    apply_profile(cfg, "fast")
    assert cfg.use_fast and not cfg.use_clahe
    assert not cfg.use_loop_closer and cfg.do_p3p
    assert cfg.max_dist == 50


def test_unknown_profile():
    cfg = load_config(REF)
    with pytest.raises(ValueError):
        apply_profile(cfg, "turbo")
