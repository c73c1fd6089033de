"""Config serialisation: full roundtrip incl. body templates."""

import numpy as np

from low_cost_mocap_tpu.config import (EngineConfig, RigConfig, load_config,
                                       save_config)


def test_config_roundtrip_with_body_markers(tmp_path):
    rig = RigConfig(num_cameras=3, image_size=128,
                    body_markers=((0.0, 0.0, 0.0), (0.1, 0.0, 0.0),
                                  (0.0, 0.08, 0.0), (0.04, 0.03, 0.05)),
                    max_bodies=3)
    eng = EngineConfig(max_blobs=12, sparse_budget=1024)
    path = str(tmp_path / "cfg.json")
    save_config(path, rig, eng)
    rig2, eng2 = load_config(path)
    assert rig2 == rig
    assert eng2 == eng
    tmpl = rig2.body_template()
    assert tmpl is not None and len(tmpl.markers) == 4
    assert rig2.K_stack().shape == (3, 3, 3)


def test_body_template_none_when_unset():
    assert RigConfig().body_template() is None
