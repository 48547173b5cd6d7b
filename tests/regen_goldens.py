"""Deliberately regenerate tests/golden_outputs.npz.

Run ONLY when an intended behavior change moves pinned inference numerics
(test_golden.py's docstring contract), e.g. the round-4 OFT-Discrete
reference-parity default (models/oft.py:OFTConfig.reference_parity).  Must
run on the same platform the tests use — the 8-device virtual CPU mesh —
so the env forcing below mirrors tests/conftest.py exactly.

    python tests/regen_goldens.py            # rewrite all keys
    python tests/regen_goldens.py --check    # recompute + diff, no write

Do NOT run while a pytest process is using tests/.jax_test_cache (this
repo's CLAUDE.md gotcha: concurrent cache writes corrupt it).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    # host-portable persistent-cache entries (see tests/conftest.py note)
    _flags = (_flags + " --xla_cpu_max_isa=AVX512").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
assert jax.devices()[0].platform == "cpu", jax.devices()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX  # noqa: E402
from dexbotic_tpu.models.presets import EXPERT_TEST, LLM_TEST, VIT_TEST  # noqa: E402
from dexbotic_tpu.models.vlm import VLMConfig  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_outputs.npz")


def _ids():
    from dexbotic_tpu.models.cogact import CogActConfig

    cog = CogActConfig(vlm=VLMConfig(llm=LLM_TEST, vit=VIT_TEST),
                       action_model_type="DiT-S", action_dim=7, chunk_size=4)
    nt = cog.vlm.num_image_tokens
    ids = np.arange(1, nt + 9).reshape(1, -1)
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    return cog, jnp.asarray(ids)


def compute_all() -> dict:
    out = {}

    from dexbotic_tpu.models.cogact import cogact_inference_action, init_cogact

    cog, ids = _ids()
    p = init_cogact(jax.random.PRNGKey(0), cog)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    out["cogact_actions"] = np.asarray(
        cogact_inference_action(p, cog, ids, jnp.ones_like(ids), imgs,
                                jax.random.PRNGKey(2)))

    from dexbotic_tpu.models.flow_vla import (
        flow_vla_inference_action, init_flow_vla, pi0_config)

    pi0 = pi0_config(LLM_TEST, EXPERT_TEST, VIT_TEST, action_dim=8,
                     chunk_size=5, projector_type="linear")
    fp = init_flow_vla(jax.random.PRNGKey(0), pi0)
    tids = jnp.asarray(np.arange(1, 7).reshape(1, -1))
    fimgs = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 28, 28, 3))
    out["pi0_actions"] = np.asarray(flow_vla_inference_action(
        fp, pi0, tids, jnp.ones_like(tids), fimgs, jnp.ones((1, 2), jnp.int32),
        jax.random.normal(jax.random.PRNGKey(3), (1, 8)), jax.random.PRNGKey(2)))

    from dexbotic_tpu.models.oft import OFTConfig, init_oft, oft_inference_action

    for head in ("L1", "Discrete"):
        oft = OFTConfig(vlm=VLMConfig(llm=LLM_TEST, vit=VIT_TEST),
                        action_model_type=head, action_dim=3, chunk_size=4,
                        num_bins=64)
        op = init_oft(jax.random.PRNGKey(0), oft)
        out[f"oft_{head.lower()}_actions"] = np.asarray(
            oft_inference_action(op, oft, ids, jnp.ones_like(ids), imgs))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="recompute and report diffs without writing")
    args = ap.parse_args()

    new = compute_all()
    if os.path.exists(GOLDEN):
        old = np.load(GOLDEN)
        for k in sorted(set(old.files) | set(new)):
            if k not in new:
                print(f"{k}: REMOVED (kept? no — not recomputed)")
            elif k not in old.files:
                print(f"{k}: NEW")
            elif old[k].shape != new[k].shape:
                print(f"{k}: SHAPE CHANGED {old[k].shape} -> {new[k].shape}")
            else:
                d = float(np.max(np.abs(old[k] - new[k])))
                print(f"{k}: max|old-new| = {d:.3e}" + ("  <-- CHANGED" if d > 1e-6 else ""))
    if not args.check:
        np.savez(GOLDEN, **new)
        print(f"wrote {GOLDEN} ({len(new)} keys)")


if __name__ == "__main__":
    main()
