"""Hybrid CogACT co-training (reference: exp/hybrid_cogact_exp.py):
joint loss = text_loss + action_loss gated by per-sample has_text/has_action
flags, so action-only robot data and VQA-style text data mix in one batch."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from dexbotic_tpu.data import transforms as T
from dexbotic_tpu.data.multimodal import LoadMultiModal
from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig
from dexbotic_tpu.models.cogact import cogact_loss


@dataclass
class HybridActionConfig(base_exp.ActionConfig):
    """Adds AddActionFlag/AddTextFlag so mixed batches carry gating flags
    (transform/common.py:117-141)."""

    empty_action_dim: int = 112  # chunk * action_dim fallback shape

    def build_action_process_func(self) -> T.Pipeline:
        """Reference order (exp/hybrid_cogact_exp.py:82-106): actions are
        NOT stringified into answers (add_answer=False), ReplaceAnswer marks
        answer-less (robot) rows has_text=0, and the flag transforms run on
        the SELECTED FRAME dict — the empty-action placeholder must be the
        per-frame [chunk*dim] vector."""
        stats = self._read_norm_stats(self.statistic_mapping)
        return T.Pipeline(
            [
                T.ToDict(),
                T.ToNumpy(),
                T.AddAction(predict_length=1),
                T.DeltaAction(enable=self.delta),
                T.AddTrajectory(
                    trajectory_length=self.trajectory_length,
                    padding_mode=self.trajectory_padding_mode,
                    padding_action=self.padding_action,
                ),
                T.ActionNormAnd2String(
                    statistic_mapping=stats, vocab_size=self.vocab_size,
                    string_format=self.string_format, add_answer=False,
                ),
                LoadMultiModal(),
                T.AddPromptTemplate(prompt_template=self.prompt_template),
                T.ReplaceAnswer(default_answer=self.replace_with_default_answer),
                T.ToConversation(),
                T.ToList(select_frame=True),
                T.AddActionFlag(np.zeros((self.empty_action_dim,), np.float32)),
                T.AddTextFlag(),
            ]
        )


@dataclass
class HybridCogActExp(CogActExp):
    exp_name: str = "hybrid_cogact"
    action: HybridActionConfig = field(default_factory=HybridActionConfig)
    data: base_exp.DataConfig = field(
        default_factory=lambda: base_exp.DataConfig(
            data_keys=["input_ids", "labels", "action", "image", "has_action", "has_text"],
        )
    )

    def build_model(self, tokenizer):
        cfg, params, _ = super().build_model(tokenizer)

        def loss_fn(params, batch, rng):
            return cogact_loss(
                params, cfg, batch, rng,
                remat=self.trainer.gradient_checkpointing, with_text_loss=True,
            )

        return cfg, params, loss_fn


if __name__ == "__main__":
    HybridCogActExp.main()
