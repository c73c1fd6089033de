"""Distributed BA across REAL process boundaries.

The rest of the suite shards over a virtual in-process mesh; here the
solver runs on a 2-process x 2-device cluster joined via jax.distributed
(Gloo collectives over localhost TCP) and must reproduce the
single-process solution — the CPU stand-in for multi-host DCN execution
(SURVEY.md §2.4, BASELINE.json "scaling measured at ... >=2 hosts").
"""

import numpy as np
import pytest

from low_cost_mocap_tpu.parallel.multiprocess import run_cluster

SCENE = dict(n_points=256, n_cams=4, max_iters=6)


@pytest.mark.slow
def test_two_process_schur_ba_matches_single_process():
    ref = run_cluster(1, local_devices=1, solver="schur", **SCENE)[0]
    dist = run_cluster(2, local_devices=2, solver="schur", **SCENE)

    # every process reports the same replicated solution
    assert dist[0]["global_devices"] == 4
    assert dist[0]["cost"] == pytest.approx(dist[1]["cost"], rel=0, abs=0)
    assert np.asarray(dist[0]["ts"]) == pytest.approx(
        np.asarray(dist[1]["ts"]), abs=0)

    # and it agrees with the 1-process solve (free-point BA with camera-0
    # fixed leaves the scale gauge free -> compare after scale alignment)
    t_ref = np.asarray(ref["ts"])
    t_d = np.asarray(dist[0]["ts"])
    s = float((t_d * t_ref).sum() / max((t_d * t_d).sum(), 1e-12))
    assert np.abs(s * t_d - t_ref).max() < 1e-3
    assert abs(dist[0]["cost"] - ref["cost"]) / ref["cost"] < 1e-4


@pytest.mark.slow
def test_two_process_camera_sharded_live_step():
    """The camera-sharded live step across REAL process boundaries: each
    rank detects its cameras, centroids cross in one all_gather, every
    rank reports the identical tracked pose (the one-host-per-camera-group
    deployment shape)."""
    ref = run_cluster(1, local_devices=1, solver="live-pipeline",
                      n_cams=4)[0]
    dist = run_cluster(2, local_devices=2, solver="live-pipeline",
                       n_cams=4)

    assert dist[0]["global_devices"] == 4
    # ranks agree bit-for-bit (replicated output)
    assert dist[0]["tracked_pos"] == dist[1]["tracked_pos"]
    assert dist[0]["tracked_valid"] == dist[1]["tracked_valid"]
    # and match the single-process run
    assert np.asarray(ref["tracked_valid"]).any()
    assert dist[0]["tracked_valid"] == ref["tracked_valid"]
    assert np.abs(np.asarray(dist[0]["tracked_pos"])
                  - np.asarray(ref["tracked_pos"])).max() < 1e-5
    assert dist[0]["n_points"] == ref["n_points"]


@pytest.mark.slow
def test_two_process_batched_sharded_serving_step():
    """The batched x camera-sharded SERVING mode (dist_scan_frame_step)
    across REAL process boundaries: 8 frames in one program, packed rows
    replicated bit-identically on every rank and matching the
    single-process run."""
    ref = run_cluster(1, local_devices=1, solver="batched-sharded",
                      n_cams=4)[0]
    dist = run_cluster(2, local_devices=2, solver="batched-sharded",
                       n_cams=4)

    assert dist[0]["global_devices"] == 4
    # ranks agree bit-for-bit on the ENTIRE packed output batch
    assert dist[0]["rows_sha"] == dist[1]["rows_sha"]
    assert dist[0]["frames_tracked"] >= 7
    # and the tracked result matches the single-process run
    assert dist[0]["tracked_valid"] == ref["tracked_valid"]
    assert np.abs(np.asarray(dist[0]["tracked_pos"])
                  - np.asarray(ref["tracked_pos"])).max() < 1e-5


@pytest.mark.slow
def test_two_process_time_sharded_rts_smoother():
    """rts_smooth_assoc (O(log T) associative-scan RTS) with the sequence
    sharded over a real 2-process time mesh: every rank reproduces the
    single-process smoothed track."""
    ref = run_cluster(1, local_devices=1, solver="rts-assoc")[0]
    dist = run_cluster(2, local_devices=2, solver="rts-assoc")

    assert dist[0]["global_devices"] == 4
    a = np.asarray(dist[0]["smoothed"])
    b = np.asarray(dist[1]["smoothed"])
    r = np.asarray(ref["smoothed"])
    np.testing.assert_array_equal(a, b)          # replicated across ranks
    assert np.abs(a - r).max() < 1e-4            # matches 1-process
    assert dist[0]["rmse_vs_truth_mm"] < 5.0     # and it actually smooths
