"""RLHF scaffolding: value head over decoder hidden states.

Rebuild of the trl-style wrappers (reference
`pipeline/utils/modeling_value_head.py:21-415`): `ValueHead` (dropout +
scalar projection) and `DecoderWithValueHead` returning (lm_logits, values)
for PPO-style training. The reference training loops never use it (RLHF is
advertised in README:33); parity requires the scaffolding to exist.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from otter_tpu.config import TextConfig
from otter_tpu.models.decoder import Decoder


class ValueHead(nn.Module):
    """v_head: dropout -> Dense(hidden, 1) (modeling_value_head.py:21-54)."""

    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, *, deterministic: bool = True):
        x = nn.Dropout(self.dropout)(hidden_states,
                                     deterministic=deterministic)
        values = nn.Dense(1, dtype=self.dtype, name="summary")(x)
        return values[..., 0]    # [B, S]


class DecoderWithValueHead(nn.Module):
    """AutoModelForCausalLMWithValueHead equivalent
    (modeling_value_head.py:57-170): forward -> (logits, values)."""

    cfg: TextConfig
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, positions=None,
                 deterministic: bool = True):
        logits, _, hidden = Decoder(self.cfg, dtype=self.dtype,
                                    name="pretrained_model")(
            input_ids, attention_mask=attention_mask, positions=positions,
            output_hidden=True)
        values = ValueHead(self.dropout, self.dtype, name="v_head")(
            hidden, deterministic=deterministic)
        return logits, values
