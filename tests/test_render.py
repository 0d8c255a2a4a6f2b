"""Ray-casting renderer tests + RGB observation pathway."""

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.ops import render as r


def test_ground_and_sky():
    scene = r.empty_scene(dtype=jnp.float64)
    cam = jnp.asarray([0.0, 0.0, 1.0])
    # looking down: all ground
    rgba, depth, seg = r.render(scene, cam, jnp.asarray([0.0, 0.0, 0.0]),
                                width=16, height=12)
    assert np.all(np.asarray(seg) == 0)
    np.testing.assert_allclose(np.asarray(depth)[6, 8], 1.0, atol=0.1)
    # looking up: all sky
    rgba, depth, seg = r.render(scene, cam, jnp.asarray([0.0, 0.0, 2.0]),
                                width=16, height=12)
    assert np.all(np.asarray(seg) == -1)


def test_sphere_hit_and_depth():
    scene = r.empty_scene(dtype=jnp.float64)
    scene = scene._replace(
        sph_center=jnp.asarray([[2.0, 0.0, 1.0]]),
        sph_radius=jnp.asarray([0.5]),
        sph_color=jnp.asarray([[1.0, 0.0, 0.0]]),
        sph_valid=jnp.asarray([True]),
    )
    cam = jnp.asarray([0.0, 0.0, 1.0])
    rgba, depth, seg = r.render(
        scene, cam, jnp.asarray([2.0, 0.0, 1.0]), width=32, height=24
    )
    center_seg = int(np.asarray(seg)[12, 16])
    assert center_seg == 1  # first (only) sphere object id
    np.testing.assert_allclose(np.asarray(depth)[12, 16], 1.5, atol=0.01)


def test_capsule_hit():
    scene = r.empty_scene(dtype=jnp.float64)
    scene = scene._replace(
        cap_center=jnp.asarray([[2.0, 0.0, 0.5]]),
        cap_half=jnp.asarray([0.5]),
        cap_radius=jnp.asarray([0.1]),
        cap_color=jnp.asarray([[0.0, 0.0, 1.0]]),
        cap_valid=jnp.asarray([True]),
    )
    cam = jnp.asarray([0.0, 0.0, 0.5])
    rgba, depth, seg = r.render(
        scene, cam, jnp.asarray([2.0, 0.0, 0.5]), width=32, height=24
    )
    assert int(np.asarray(seg)[12, 16]) == 1
    # center pixel is half-a-pixel off-axis; allow the slant
    np.testing.assert_allclose(np.asarray(depth)[12, 16], 1.9, atol=0.02)


def test_race_scene_builds():
    from gym_pybullet_adrp_tpu.envs.race import MultiRaceAviary
    from gym_pybullet_adrp_tpu.ops.render import scene_from_race_state, render

    env = MultiRaceAviary("getting_started", num_drones=2)
    env.reset()
    st = env._state
    scene = scene_from_race_state(
        st.gates_actual, st.obstacles_actual, st.phys.pos
    )
    rgba, depth, seg = render(
        scene, jnp.asarray([3.0, 3.0, 1.5]), jnp.asarray([0.0, 0.0, 0.5]),
        width=64, height=48,
    )
    ids = np.unique(np.asarray(seg))
    # sky, ground, and scene objects all visible
    assert 0 in ids and ids.max() > 1


def test_rgb_observation_env():
    from gym_pybullet_adrp_tpu.envs import HoverAviary
    from gym_pybullet_adrp_tpu.utils.enums import ObservationType

    env = HoverAviary(obs=ObservationType.RGB)
    obs, info = env.reset()
    assert obs.shape == (1, 48, 64, 4)
    obs, *_ = env.step(np.zeros((1, 4)))
    assert obs.shape == (1, 48, 64, 4)
    assert obs.max() <= 255.0

    rgb, dep, seg = env._getDroneImages(0)
    assert rgb.shape == (48, 64, 4) and dep.shape == (48, 64)
