import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.models import dit as dit_mod
from dexbotic_tpu.ops.diffusion import (
    DiffusionSchedule,
    cosine_betas,
    ddim_timesteps,
    flow_euler_sample,
)


def test_cosine_schedule_monotone():
    betas = cosine_betas(100)
    assert betas.shape == (100,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    ab = np.cumprod(1 - betas)
    assert (np.diff(ab) < 0).all() and ab[0] > 0.99


def test_ddim_timesteps_stride():
    np.testing.assert_array_equal(ddim_timesteps(100, 10), np.arange(0, 100, 10))
    assert ddim_timesteps(100, 1)[0] == 50


def test_q_sample():
    sched = DiffusionSchedule.create(100)
    x0 = jnp.ones((2, 3, 4))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 99])
    xt = sched.q_sample(x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(xt[0]), np.sqrt(sched.alphas_cumprod[0]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(xt[1]), np.sqrt(sched.alphas_cumprod[99]), rtol=1e-4
    )


def test_ddim_oracle_recovers_x0():
    """With the exact-eps oracle, DDIM must land on x0."""
    sched = DiffusionSchedule.create(100)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 7))
    ab = jnp.asarray(sched.alphas_cumprod, jnp.float32)

    def eps_fn(x, t):
        a = ab[t].reshape(-1, 1, 1)
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    out = sched.ddim_sample(eps_fn, noise, ddim_steps=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_flow_euler_constant_velocity():
    noise = jnp.ones((2, 4))
    out = flow_euler_sample(lambda x, t: jnp.full_like(x, 3.0), noise, num_steps=10)
    np.testing.assert_allclose(np.asarray(out), 1.0 - 3.0, rtol=1e-5)


def test_dit_zero_init_and_shapes():
    cfg = dit_mod.make_dit_config("DiT-S", token_size=32, action_dim=7, chunk_size=16)
    p = dit_mod.init_dit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 7))
    t = jnp.array([5, 50])
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 32))
    out = dit_mod.dit_forward(p, cfg, x, t, z)
    assert out.shape == (2, 16, 7)
    # final layer zero-init -> exact zeros at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_dit_cfg_halves_identical():
    cfg = dit_mod.make_dit_config("DiT-S", token_size=32, action_dim=7, chunk_size=8)
    p = dit_mod.init_dit(jax.random.PRNGKey(0), cfg)
    # perturb final layer so outputs are nonzero
    p["final"]["w"] = jax.random.normal(jax.random.PRNGKey(3), p["final"]["w"].shape) * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 7))
    x = jnp.concatenate([noise, noise], axis=0)
    t = jnp.full((4,), 10, jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 1, 32))
    out = dit_mod.dit_forward_with_cfg(p, cfg, x, t, z, cfg_scale=1.5)
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(out[2:]), rtol=1e-5)


def test_dit_condition_dropout():
    cfg = dit_mod.make_dit_config("DiT-S", token_size=16, action_dim=4, chunk_size=4)
    p = dit_mod.init_dit(jax.random.PRNGKey(0), cfg)
    assert p["uncondition"].shape == (16,)
    x = jnp.zeros((8, 4, 4))
    t = jnp.zeros((8,), jnp.int32)
    z = jnp.ones((8, 1, 16)) * 100.0
    # with dropout rng, some rows use the uncondition embedding: just smoke
    out = dit_mod.dit_forward(p, cfg, x, t, z, drop_rng=jax.random.PRNGKey(4))
    assert out.shape == (8, 4, 4)
