"""Utility-layer tests: config loader, logger, delays, wrappers, misc."""

import numpy as np
import pytest
import jax.numpy as jnp


def test_config_loader_bundled_and_ladder():
    from gym_pybullet_adrp_tpu.utils.config import load_config

    cfg = load_config("getting_started")
    assert cfg.pyb_freq == 500
    assert len(cfg.gates) == 4 and len(cfg.gates[0]) == 7
    assert cfg.init_states.drone0.pos == [0.9, 0.9, 0.05]
    # ladder flags
    assert not cfg.random_drone_state
    l3 = load_config("level3.yaml")
    assert l3.random_drone_state and l3.disturbances
    assert not l3.reseed_on_reset
    assert l3.disturbances_info.action.std == 0.001
    with pytest.raises(FileNotFoundError):
        load_config("nonexistent_scenario")


def test_logger_roundtrip(tmp_path):
    from gym_pybullet_adrp_tpu.utils.logger import Logger

    lg = Logger(logging_freq_hz=48, num_drones=2, output_folder=str(tmp_path))
    state = np.arange(20.0)
    for i in range(10):
        for d in range(2):
            lg.log(drone=d, timestamp=i / 48, state=state, control=np.zeros(12))
    path = lg.save()
    assert path.endswith(".npy")
    with open(path, "rb") as f:
        data = np.load(f)
        assert data["states"].shape[0] == 2
    dest = lg.save_as_csv("t")
    import os

    assert os.path.exists(os.path.join(dest, "x0.csv"))
    assert os.path.exists(os.path.join(dest, "pwm3-1.csv"))


def test_map2pi_and_str2bool():
    from gym_pybullet_adrp_tpu.utils.utils import map2pi, str2bool

    np.testing.assert_allclose(map2pi(np.pi + 0.1), -np.pi + 0.1, atol=1e-12)
    np.testing.assert_allclose(map2pi(-np.pi - 0.1), np.pi - 0.1, atol=1e-12)
    assert str2bool("true") and str2bool("Y") and not str2bool("0")
    with pytest.raises(ValueError):
        str2bool("maybe")


def test_sensor_delay_ring():
    """SENSOR_DELAY ring: the filters see samples delayed by N ticks
    (reference MellingerControl.py:228-233)."""
    from gym_pybullet_adrp_tpu.control import mellinger as mel

    st = mel.init_state((1,), dtype=jnp.float64, sensor_delay=2)
    # distinctive velocities produce distinctive raw accelerations
    vels = [np.array([[0.0, 0.0, v]]) for v in (0.1, 0.2, 0.3, 0.4)]
    outs = []
    for v in vels:
        st, fw, gyro, acc = mel.update_sensor_and_state(
            st, jnp.zeros((1, 3), dtype=jnp.float64),
            jnp.zeros((1, 3), dtype=jnp.float64),
            jnp.asarray(v, dtype=jnp.float64),
        )
        outs.append(float(np.asarray(acc)[0, 2]))
    # first two ticks the filters saw only zero-history samples
    assert abs(outs[0]) < 1e-9 and abs(outs[1]) < 1e-6
    # third tick gets the (filtered) first real sample
    assert abs(outs[2]) > 1e-3

    # zero delay: first tick already passes the live sample
    st0 = mel.init_state((1,), dtype=jnp.float64, sensor_delay=0)
    _, _, _, acc0 = mel.update_sensor_and_state(
        st0, jnp.zeros((1, 3), dtype=jnp.float64),
        jnp.zeros((1, 3), dtype=jnp.float64),
        jnp.asarray([[0.0, 0.0, 0.1]], dtype=jnp.float64),
    )
    assert abs(float(np.asarray(acc0)[0, 2])) > 1e-3


def test_velocity_aviary_tracks_commanded_velocity():
    from gym_pybullet_adrp_tpu.envs import VelocityAviary

    env = VelocityAviary(num_drones=1, pyb_freq=240, ctrl_freq=48,
                         initial_xyzs=np.array([[0, 0, 0.5]]))
    obs, _ = env.reset()
    cmd = np.array([[1.0, 0.0, 0.0, 0.5]])  # half speed limit in +x
    for _ in range(96):
        obs, *_ = env.step(cmd)
    vx = obs[0][10]
    expected = 0.5 * env.SPEED_LIMIT
    np.testing.assert_allclose(vx, expected, rtol=0.25)


def test_adjacency_matrix():
    from gym_pybullet_adrp_tpu.envs import core
    from gym_pybullet_adrp_tpu.envs.core import AviaryConfig

    cfg = AviaryConfig(num_drones=3, neighbourhood_radius=0.5)
    st = core.core_reset(
        cfg,
        np.array([[0, 0, 1], [0.3, 0, 1], [5, 5, 1]]),
        np.zeros((3, 3)),
    )
    adj = np.asarray(core.adjacency_matrix(cfg, st))
    assert adj[0, 1] == 1 and adj[1, 0] == 1
    assert adj[0, 2] == 0 and adj[2, 1] == 0
    np.testing.assert_array_equal(np.diag(adj), 1)


def test_normalized_action_to_rpm_endpoints():
    from gym_pybullet_adrp_tpu.envs import core
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.utils.enums import DroneModel

    p = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    r = core.normalized_action_to_rpm(p, jnp.asarray([-1.0, 0.0, 1.0]))
    np.testing.assert_allclose(float(r[0]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(r[1]), float(p.hover_rpm), rtol=1e-9)
    np.testing.assert_allclose(float(r[2]), float(p.max_rpm), rtol=1e-9)


def test_profiling_measure_steps_per_sec():
    import jax
    import jax.numpy as jnp

    from gym_pybullet_adrp_tpu.utils.profiling import (
        RealTimeFactor, measure_steps_per_sec,
    )

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((8,))
    for pipelined in (True, False):
        sps, sec = measure_steps_per_sec(
            f, x, n_repeats=2, steps_per_call=16, pipelined=pipelined
        )
        assert sps > 0 and sec > 0
    rtf = RealTimeFactor()
    assert rtf.factor(1.0) > 0


def test_hosts_single_process_noop():
    """parallel.hosts: single-host run is a no-op pass-through and the
    global mesh covers the local devices."""
    import jax

    from gym_pybullet_adrp_tpu.parallel import hosts

    assert hosts.ensure_initialized() is False
    mesh = hosts.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    start, count = hosts.local_env_slice(64)
    assert (start, count) == (0, 64)


def test_replay_viewer_builds_selfcontained_html(tmp_path):
    """scripts/replay_viewer.build_html: the interactive wall-clock replay
    artifact (the live-visualization counterpart of the reference's GUI
    race timer/debug view) embeds a valid data payload and player."""
    import json
    import re
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import replay_viewer

    T, N = 12, 2
    poses = np.cumsum(np.full((T, N, 6), 0.05), axis=0)
    events = [(0.2, 0, "gate", "G1"), (0.3, 1, "elim", "ELIMINATED"),
              (0.4, 0, "finish", "FINISH")]
    track = {"gates": np.zeros((4, 7)), "obstacles": np.zeros((4, 6))}
    html = replay_viewer.build_html(
        poses, None, events, track, 30.0, "unit test"
    )
    m = re.search(r"const D = (\{.*?\});\nconst COLORS = (\[.*?\]);",
                  html, re.S)
    d = json.loads(m.group(1))
    colors = json.loads(m.group(2))
    assert len(d["poses"]) == T and len(d["poses"][0]) == N
    assert len(colors) == N and all(c.startswith("#") for c in colors)
    # status derived from events: drone 1 eliminated from ~t=0.3 on
    assert d["status"][-1][1] == 2 and d["status"][-1][0] == 1
    assert "requestAnimationFrame" in html and "<canvas" in html
    out = tmp_path / "replay.html"
    out.write_text(html)
    assert out.stat().st_size > 8000


def test_live_fly_sliders_drive_running_sim():
    """Live-INPUT interactivity (the reference's user_debug_gui RPM
    sliders, BaseAviary.py:162-167/1053-1062, headless-native: browser
    sliders -> HTTP -> running sim; scripts/live_fly.py). Posting a
    high RPM must make the live-stepped drone climb, and the state
    endpoint must stream the ray-cast frame."""
    import base64
    import json
    import threading
    import time
    import urllib.request

    import importlib.util as ilu
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    spec = ilu.spec_from_file_location("lf", repo / "scripts/live_fly.py")
    lf = ilu.module_from_spec(spec)
    spec.loader.exec_module(lf)
    httpd = lf.serve(port=8917)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        base = "http://127.0.0.1:8917"
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "input type=range" in page and "/rpm" in page
        urllib.request.urlopen(urllib.request.Request(
            base + "/rpm", data=b"[21000,21000,21000,21000]",
            method="POST",
        ))
        s0 = json.loads(urllib.request.urlopen(base + "/state").read())
        time.sleep(0.3)
        s1 = json.loads(urllib.request.urlopen(base + "/state").read())
        time.sleep(0.3)
        s2 = json.loads(urllib.request.urlopen(base + "/state").read())
        assert s2["t"] > s0["t"]                       # sim runs live
        assert s2["pos"][2] > s0["pos"][2] + 0.05      # sliders act: climbs
        assert s2["rpm"] == [21000.0] * 4
        png = base64.b64decode(s1["png"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"          # live frame streams
        # live reset
        urllib.request.urlopen(urllib.request.Request(
            base + "/reset", data=b"", method="POST"))
        s3 = json.loads(urllib.request.urlopen(base + "/state").read())
        assert s3["pos"][2] < s2["pos"][2]
    finally:
        httpd.shutdown()
