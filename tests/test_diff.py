"""Differentiable-simulation guarantees: the whole sim admits exact
gradients (PyBullet, the reference's backend, cannot — its C++ LCP stepper
is opaque to autodiff)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import rl as rlenv
from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel

CFG = rlenv.RLConfig(aviary=AviaryConfig(ctrl_freq=30),
                     act_type=ActionType.RPM)
PARAMS = drone_params(DroneModel.CF2X)
INIT_XYZS = np.array([[0.0, 0.0, 0.1125]])
INIT_RPYS = np.zeros((1, 3))


def test_env_step_is_differentiable():
    """d(final altitude)/d(action) through 5 rolled-out control steps is
    finite and nonzero — gradients flow through motor model, integrator,
    quaternion update and the action buffer."""
    def final_z(action):
        st = rlenv.rl_reset(CFG, INIT_XYZS, INIT_RPYS)
        def body(st, _):
            st, *_ = rlenv.rl_step(CFG, PARAMS, st, action)
            return st, None
        st, _ = jax.lax.scan(body, st, None, length=5)
        return st.core.phys.pos[0, 2]

    g = jax.grad(final_z)(jnp.zeros((1, 4)))
    assert np.all(np.isfinite(np.asarray(g)))
    # more rpm on every motor -> higher altitude: strictly positive grads
    assert np.all(np.asarray(g) > 0), g


def test_apg_training_reduces_loss():
    """Analytic-policy-gradient hover training (examples/apg.py) makes
    monotone-ish progress with exact BPTT gradients."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples import apg

    losses, dist = apg.run(iters=25, horizon=20, n_envs=8, lr=0.02)
    assert np.isfinite(losses).all()
    # tiny-batch BPTT wobbles iteration-to-iteration: assert on the best
    # loss reached, not the final one
    assert min(losses) < losses[0] * 0.75, (losses[0], min(losses))


def test_race_stack_is_differentiable():
    """Gradients flow through the ENTIRE race pipeline (FULLSTATE command
    processing, Mellinger law + biquad filters + tick gating, 20 physics
    substeps per step) and a few Adam steps on the action plan reduce the
    distance-to-gate loss (examples/race_grad.py, shortened)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples import race_grad

    losses, gates, closest = race_grad.run(
        iters=8, horizon=10, lr=0.05, verbose=False
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
