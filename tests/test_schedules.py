import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.core import VPSchedule, SigmaGrid


def test_vp_schedule_matches_reference_convention():
    """Bit-parity with cifar/dynamics.py:15-27."""
    s = VPSchedule()
    t = jnp.asarray([0.1, 0.5, 0.9])
    b0, b1 = 0.1, 20.0
    np.testing.assert_allclose(
        s.log_alpha(t), -0.5 * t * b0 - 0.25 * t**2 * (b1 - b0), rtol=1e-6
    )
    np.testing.assert_allclose(s.sigma(t), t, rtol=1e-6)
    np.testing.assert_allclose(
        s.beta(t), 1 + 0.5 * t * b0 + 0.5 * t**2 * (b1 - b0), rtol=1e-6
    )


def test_vp_derivatives_match_autodiff():
    s = VPSchedule()
    for tv in [0.05, 0.3, 0.77]:
        g = jax.grad(lambda t: s.log_alpha(t))(tv)
        np.testing.assert_allclose(s.dlog_alpha_dt(tv), g, rtol=1e-5)
        g = jax.grad(lambda t: s.log_sigma(t))(tv)
        np.testing.assert_allclose(s.dlog_sigma_dt(tv), g, rtol=1e-5)


def test_sigma_grid_euler_discrete():
    """Grid matches diffusers EulerDiscreteScheduler semantics."""
    g = SigmaGrid.euler_discrete(50)
    ts, sig = np.asarray(g.timesteps), np.asarray(g.sigmas)
    assert len(ts) == 50 and len(sig) == 51
    assert ts[0] == 999.0 and ts[-1] == 0.0
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) <= 0)  # monotone decreasing to 0
    # SD-1.x terminal sigma ~ 14.6; init_noise_sigma = sqrt(s_max^2+1)
    assert 14.0 < sig[0] < 15.0
    np.testing.assert_allclose(g.init_noise_sigma, np.sqrt(sig[0] ** 2 + 1), rtol=1e-6)


def test_sigma_grid_against_diffusers_if_available():
    try:
        from diffusers import EulerDiscreteScheduler  # noqa
    except Exception:
        return  # diffusers not in image; grid validated structurally above
    sched = EulerDiscreteScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear"
    )
    sched.set_timesteps(50)
    g = SigmaGrid.euler_discrete(50)
    np.testing.assert_allclose(np.asarray(g.sigmas), sched.sigmas.numpy(), rtol=1e-5)
