"""Golden-value regression: pinned inference outputs at fixed seeds.

These freeze the numeric behavior of the policy forward paths (CogACT DDIM,
pi0 Euler-vs-cache, OFT heads) so refactors that silently change numerics
fail loudly.  Regenerate deliberately via tests/regen_goldens.py when a
behavior change is intended.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.presets import EXPERT_TEST, LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_outputs.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _ids():
    from dexbotic_tpu.models.cogact import CogActConfig

    COG = CogActConfig(vlm=VLMConfig(llm=LLM_TEST, vit=VIT_TEST),
                       action_model_type="DiT-S", action_dim=7, chunk_size=4)
    nt = COG.vlm.num_image_tokens
    ids = np.arange(1, nt + 9).reshape(1, -1)
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    return COG, jnp.asarray(ids)


def test_cogact_golden(golden):
    from dexbotic_tpu.models.cogact import cogact_inference_action, init_cogact

    COG, ids = _ids()
    p = init_cogact(jax.random.PRNGKey(0), COG)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    a = cogact_inference_action(
        p, COG, ids, jnp.ones_like(ids), imgs, jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(np.asarray(a), golden["cogact_actions"], rtol=1e-4, atol=1e-5)


def test_pi0_golden(golden):
    from dexbotic_tpu.models.flow_vla import (
        flow_vla_inference_action,
        init_flow_vla,
        pi0_config,
    )

    PI0 = pi0_config(LLM_TEST, EXPERT_TEST, VIT_TEST, action_dim=8, chunk_size=5,
                     projector_type="linear")
    fp = init_flow_vla(jax.random.PRNGKey(0), PI0)
    tids = jnp.asarray(np.arange(1, 7).reshape(1, -1))
    fimgs = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 28, 28, 3))
    fa = flow_vla_inference_action(
        fp, PI0, tids, jnp.ones_like(tids), fimgs, jnp.ones((1, 2), jnp.int32),
        jax.random.normal(jax.random.PRNGKey(3), (1, 8)), jax.random.PRNGKey(2),
    )
    np.testing.assert_allclose(np.asarray(fa), golden["pi0_actions"], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("head", ["L1", "Discrete"])
def test_oft_golden(golden, head):
    from dexbotic_tpu.models.oft import OFTConfig, init_oft, oft_inference_action

    COG, ids = _ids()
    OFT = OFTConfig(vlm=VLMConfig(llm=LLM_TEST, vit=VIT_TEST), action_model_type=head,
                    action_dim=3, chunk_size=4, num_bins=64)
    op = init_oft(jax.random.PRNGKey(0), OFT)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    oa = oft_inference_action(op, OFT, ids, jnp.ones_like(ids), imgs)
    np.testing.assert_allclose(
        np.asarray(oa), golden[f"oft_{head.lower()}_actions"], rtol=1e-4, atol=1e-5
    )
