"""Gaussian diffusion schedule + DDIM sampling as compiled lax loops.

Reimplements the behavior of the reference's OpenAI-style diffusion
(/root/reference/dexbotic/model/cogact/action_model/diffusion.py):
squaredcos_cap_v2 betas, epsilon prediction, MSE loss, "ddimN" respacing with
eta=0 — but the sampler is a single `lax.scan` inside one compiled program
instead of a Python loop of device launches (SURVEY.md §2.9 item 4).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def cosine_betas(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2 schedule (diffusion.py:205-231 behavior)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1, t2 = i / num_steps, (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def ddim_timesteps(num_steps: int, ddim_steps: int) -> np.ndarray:
    """DDIM-paper fixed striding (space_timesteps, diffusion.py:1012-1021)."""
    if ddim_steps == 1:
        return np.array([num_steps // 2])
    for stride in range(1, num_steps):
        if len(range(0, num_steps, stride)) == ddim_steps:
            return np.array(sorted(range(0, num_steps, stride)))
    raise ValueError(f"cannot stride {num_steps} into {ddim_steps} DDIM steps")


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    num_steps: int
    alphas_cumprod: np.ndarray  # float64 [T]

    @classmethod
    def create(cls, num_steps: int = 100) -> "DiffusionSchedule":
        betas = cosine_betas(num_steps)
        return cls(num_steps=num_steps, alphas_cumprod=np.cumprod(1.0 - betas))

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps;  t int[B]."""
        ab = jnp.asarray(self.alphas_cumprod, jnp.float32)[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        ab = ab.reshape(shape)
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise

    def training_loss(self, eps_fn, x0: jnp.ndarray, rng: jax.Array,
                      t: jnp.ndarray | None = None,
                      noise: jnp.ndarray | None = None,
                      reduction: str = "mean") -> jnp.ndarray:
        """Epsilon-prediction MSE at uniformly sampled t (fp32).  `t`/`noise`
        are injectable for torch-parity tests and checkpoint-replay pinning.
        reduction='none' returns the per-sample mean [B] (the reference
        hybrid's loss(..., reduction='none').mean(dim=[1,2]),
        hybrid_cogact_arch.py:175-181)."""
        k_t, k_n = jax.random.split(rng)
        B = x0.shape[0]
        if t is None:
            t = jax.random.randint(k_t, (B,), 0, self.num_steps)
        if noise is None:
            noise = jax.random.normal(k_n, x0.shape, jnp.float32)
        x_t = self.q_sample(x0.astype(jnp.float32), t, noise)
        eps_pred = eps_fn(x_t, t)
        se = jnp.square(eps_pred.astype(jnp.float32) - noise)
        if reduction == "none":
            return se.reshape(B, -1).mean(axis=1)
        return jnp.mean(se)

    def ddim_sample(
        self,
        eps_fn,
        noise: jnp.ndarray,
        ddim_steps: int = 10,
        unroll: int = 1,
    ) -> jnp.ndarray:
        """Deterministic DDIM (eta=0, clip_denoised=False) as one lax.scan.

        eps_fn(x, t_orig[B]) -> eps; t_orig are ORIGINAL-process timesteps
        (the respaced model wrapper's timestep_map behavior).
        """
        kept = ddim_timesteps(self.num_steps, ddim_steps)
        ab = np.asarray(self.alphas_cumprod)[kept]  # [N]
        ab_prev = np.concatenate([[1.0], ab[:-1]])
        ts = jnp.asarray(kept, jnp.int32)
        ab = jnp.asarray(ab, jnp.float32)
        ab_prev = jnp.asarray(ab_prev, jnp.float32)
        B = noise.shape[0]

        def step(x, i):
            t = jnp.full((B,), ts[i], jnp.int32)
            eps = eps_fn(x, t).astype(jnp.float32)
            a, a_prev = ab[i], ab_prev[i]
            pred_x0 = (x - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
            x_next = pred_x0 * jnp.sqrt(a_prev) + jnp.sqrt(1.0 - a_prev) * eps
            return x_next, None

        x, _ = jax.lax.scan(
            step,
            noise.astype(jnp.float32),
            jnp.arange(ddim_steps - 1, -1, -1),
            unroll=unroll,
        )
        return x


    def dpm_solver_pp_2m(
        self,
        eps_fn,
        noise: jnp.ndarray,
        steps: int = 5,
        unroll: int = 1,
    ) -> jnp.ndarray:
        """DPM-Solver++(2M) (Lu et al. 2022, arXiv:2211.01095): deterministic
        2nd-order multistep ODE solver in data-prediction space.  Same
        trained epsilon model as DDIM, no retraining — but 2nd order means
        ~5 steps match DDIM-10's trajectory error, halving the serial
        sampler chain that dominates B=1 action latency.  Exposed as
        ``CogActConfig.sampler='dpm'``; the reference only ships DDIM
        (cogact action_model vendored diffusion).

        Coefficients precomputed host-side in float64 over the same
        respaced timestep grid as DDIM (`ddim_timesteps`); the final step
        to the clean sample is first order (standard lower_order_final).
        """
        kept = ddim_timesteps(self.num_steps, steps)
        ab_src = np.asarray(self.alphas_cumprod, np.float64)[kept][::-1]  # T->0
        ab_tgt = np.concatenate([ab_src[1:], [1.0]])
        a_s, s_s = np.sqrt(ab_src), np.sqrt(1.0 - ab_src)
        a_t, s_t = np.sqrt(ab_tgt), np.sqrt(1.0 - ab_tgt)
        with np.errstate(divide="ignore"):
            lam_s = np.log(a_s / s_s)
            lam_t = np.log(a_t / np.where(s_t == 0.0, 1e-300, s_t))
        h = lam_t - lam_s  # > 0; inf at the terminal step
        sig_ratio = np.where(s_s > 0, s_t / s_s, 0.0)
        exp_neg_h = np.exp(-h)
        coef = -a_t * (exp_neg_h - 1.0)
        h_prev = np.concatenate([[np.inf], h[:-1]])
        inv_2r = np.where(np.isfinite(h), h_prev / (2.0 * h), 0.0)
        inv_2r = np.where(np.isfinite(inv_2r), inv_2r, 0.0)  # first step: 1st order

        ts = jnp.asarray(kept[::-1], jnp.int32)
        c = {k: jnp.asarray(v, jnp.float32) for k, v in {
            "a_s": a_s, "s_s": s_s, "sig_ratio": sig_ratio,
            "coef": coef, "inv_2r": inv_2r,
        }.items()}
        B = noise.shape[0]

        def step(carry, i):
            x, x0_prev = carry
            t = jnp.full((B,), ts[i], jnp.int32)
            eps = eps_fn(x, t).astype(jnp.float32)
            x0 = (x - c["s_s"][i] * eps) / c["a_s"][i]
            d = (1.0 + c["inv_2r"][i]) * x0 - c["inv_2r"][i] * x0_prev
            x = c["sig_ratio"][i] * x + c["coef"][i] * d
            return (x, x0), None

        (x, _), _ = jax.lax.scan(
            step, (noise.astype(jnp.float32), jnp.zeros_like(noise, jnp.float32)),
            jnp.arange(steps), unroll=unroll,
        )
        return x


def flow_euler_sample(
    v_fn,
    noise: jnp.ndarray,
    num_steps: int = 10,
) -> jnp.ndarray:
    """pi0/DM0 flow-matching Euler integrator as one lax.scan.

    Integrates x' = v(x, t) from t=1 -> 0 with dt = -1/num_steps, matching
    the reference's `while time > -dt/2` loop
    (/root/reference/dexbotic/model/pi0/pi0_arch.py:486-489).
    v_fn(x, t_scalar) -> v.
    """
    dt = -1.0 / num_steps

    def step(carry, _):
        x, t = carry
        v = v_fn(x, t)
        return (x + v * dt, t + dt), None

    (x, _), _ = jax.lax.scan(step, (noise, jnp.asarray(1.0, noise.dtype)), None, length=num_steps)
    return x
