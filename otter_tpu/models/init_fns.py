"""From-scratch parameter initialization zoo for the decoder backbones.

TPU-native equivalent of the reference's `param_init_fns.py`
(`/root/reference/src/otter_ai/models/mpt/param_init_fns.py:1-376`,
`MODEL_INIT_REGISTRY` :357-366): the same eight schemes, applied
functionally to a flax param tree instead of via module-walking hooks.
Selection and knobs mirror MPTConfig's `init_config`
(`configuration_mpt.py:17-26`): name, init_std, init_gain, fan_mode,
init_nonlinearity, init_div_is_residual, emb_init_std,
emb_init_uniform_lim.

Semantics reproduced (verified statistically vs the torch reference in
`tests/test_init_fns.py`):
  - Linear kernels get the scheme's base distribution; biases zero.
  - Residual-output projections (`attn/out_proj`, `ffn/down_proj` — the
    reference tags these `_is_residual`) are divided by
    sqrt(2*n_layers) (True), a numeric override, or the neox
    n_layers/sqrt(10) (`param_init_fns.py:67-69,212-219`).
  - Fused Wqkv is initialized per logical chunk (`fused_init_helper_`
    :19-28) — matters for fan-dependent schemes.
  - Embeddings (wte/wpe) use emb_init_std / emb_init_uniform_lim when
    given, else the scheme's base init (:71-95).
  - Norm scales are ones, norm biases zeros (:96-102).

Note on fans: flax kernels are [in, out] (torch stores [out, in]);
fan_in = shape[0], fan_out = shape[1] here.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import traverse_util

from otter_tpu.config import TextConfig

# norm parameter containers (scale->1, bias->0); everything else with a
# "scale" leaf (Int8Kernel etc.) is a quantized-serving artifact the init
# zoo must never touch
_NORM_NAMES = re.compile(
    r"(^|/)(norm_1|norm_2|norm_f|q_ln|k_ln|ln_1|ln_2|ln_f)(/|$)")
# projections the reference tags `_is_residual` (attention.py:256-257,
# blocks.py GPTMLP.mlp_down._is_residual)
_RESIDUAL_NAMES = re.compile(r"(^|/)(attn/out_proj|ffn/down_proj)/kernel$")
_EMBED_NAMES = re.compile(r"(^|/)(wte/embedding|wpe)$")


def _gain(nonlinearity: str, a: float) -> float:
    """torch.nn.init.calculate_gain for the subsets the registry uses."""
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + a * a))
    if nonlinearity in ("linear", "sigmoid"):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3.0
    raise ValueError(f"unsupported nonlinearity {nonlinearity!r}")


def _fan(shape, mode: str) -> float:
    fan_in, fan_out = shape[0], shape[-1]
    if mode == "fan_in":
        return fan_in
    if mode == "fan_out":
        return fan_out
    if mode == "fan_avg":
        return (fan_in + fan_out) / 2.0
    raise ValueError(f"unsupported fan_mode {mode!r}")


def _base_init(name: str, icfg: Dict[str, Any], d_model: int):
    """Returns draw(key, shape) for the scheme's base distribution."""
    gain = float(icfg.get("init_gain", 0.0))
    fan_mode = icfg.get("fan_mode", "fan_in")
    nonlin = icfg.get("init_nonlinearity", "leaky_relu")

    if name in ("baseline_", "small_init_", "neox_init_"):
        if name == "baseline_":
            std = icfg.get("init_std")
            if std is None:
                raise ValueError(
                    "init_config['init_std'] must be set for baseline_ "
                    "(reference param_init_fns.py:178-179)")
        else:
            std = math.sqrt(2.0 / (5.0 * d_model))

        def draw(key, shape):
            return jax.random.normal(key, shape) * std
        return draw
    if name == "kaiming_normal_":
        def draw(key, shape):
            std = _gain(nonlin, gain) / math.sqrt(_fan(shape, fan_mode))
            return jax.random.normal(key, shape) * std
        return draw
    if name in ("kaiming_uniform_", "default_"):
        a = math.sqrt(5.0) if name == "default_" else gain

        def draw(key, shape):
            bound = (_gain("leaky_relu" if name == "default_" else nonlin,
                           a)
                     * math.sqrt(3.0 / _fan(shape, fan_mode)))
            return jax.random.uniform(key, shape, minval=-bound,
                                      maxval=bound)
        return draw
    if name == "xavier_uniform_":
        def draw(key, shape):
            bound = gain * math.sqrt(6.0 / (shape[0] + shape[-1]))
            return jax.random.uniform(key, shape, minval=-bound,
                                      maxval=bound)
        return draw
    if name == "xavier_normal_":
        def draw(key, shape):
            std = gain * math.sqrt(2.0 / (shape[0] + shape[-1]))
            return jax.random.normal(key, shape) * std
        return draw
    raise ValueError(
        f"unknown init scheme {name!r}; known: {sorted(INIT_REGISTRY)}")


INIT_REGISTRY = (
    "default_", "baseline_", "kaiming_uniform_", "kaiming_normal_",
    "neox_init_", "small_init_", "xavier_uniform_", "xavier_normal_")


def _qkv_chunks(cfg: TextConfig, out_dim: int):
    """Chunk boundaries of the fused Wqkv out axis (q | k | v)."""
    d, hk, hd = cfg.hidden_size, cfg.kv_heads, cfg.head_dim
    if out_dim == 3 * d:
        return [(0, d), (d, 2 * d), (2 * d, 3 * d)]
    # MQA/GQA fused layout [q (d) | k (hk*hd) | v (hk*hd)]
    if out_dim == d + 2 * hk * hd:
        return [(0, d), (d, d + hk * hd), (d + hk * hd, out_dim)]
    h = cfg.num_attention_heads
    if out_dim == (h + 2 * hk) * hd:          # falcon layout
        return [(0, h * hd), (h * hd, (h + hk) * hd),
                ((h + hk) * hd, out_dim)]
    return [(0, out_dim)]


def init_decoder_params(rng, params, cfg: TextConfig,
                        init_config: Optional[Dict[str, Any]] = None):
    """Redraw every decoder parameter per the selected scheme.

    `params`: the decoder's param tree (nested or '/'-flat), e.g.
    `model.init(...)["params"]` of a bare Decoder or its
    `lang_encoder` subtree. Returns a tree of the same structure/dtypes.
    """
    icfg = dict(init_config or cfg.init_config or {})
    name = icfg.get("name", "kaiming_normal_")
    div = icfg.get("init_div_is_residual", True)
    if name == "default_":
        # torch_default_param_init_fn_ is plain reset_parameters();
        # it ignores init_div_is_residual (param_init_fns.py:11-16)
        div_val = None
    elif name == "neox_init_":
        div_val = cfg.num_hidden_layers / math.sqrt(10.0)
    elif div is True:
        div_val = math.sqrt(2.0 * cfg.num_hidden_layers)
    elif div is False:
        div_val = None
    else:
        div_val = float(div)
    draw = _base_init(name, icfg, cfg.hidden_size)

    emb_std = icfg.get("emb_init_std")
    emb_lim = icfg.get("emb_init_uniform_lim")

    def emb_draw(key, shape):
        if emb_std is not None:
            return jax.random.normal(key, shape) * emb_std
        if emb_lim is not None:
            lo, hi = ((-emb_lim, emb_lim)
                      if not isinstance(emb_lim, (tuple, list))
                      else (emb_lim[0], emb_lim[-1]))
            return jax.random.uniform(key, shape, minval=lo, maxval=hi)
        if name == "default_":
            # torch nn.Embedding.reset_parameters: normal(0, 1)
            return jax.random.normal(key, shape)
        # embeddings stay in torch's [V, D] layout through conversion
        # (no transpose), so fan-dependent schemes see torch's fans:
        # draw on the reversed shape and transpose back
        return draw(key, shape[::-1]).T

    nested = not any("/" in k for k in params) if isinstance(params, dict) \
        else True
    flat = traverse_util.flatten_dict(params, sep="/") \
        if nested else dict(params)

    out = {}
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        key = jax.random.fold_in(rng, i)
        shape, dtype = leaf.shape, leaf.dtype
        if _EMBED_NAMES.search(path):
            val = emb_draw(key, shape)
        elif _NORM_NAMES.search(path):
            val = (jnp.zeros(shape) if path.endswith("/bias")
                   else jnp.ones(shape))
        elif path.endswith("/bias"):
            if name == "default_":
                # torch Linear default: uniform(±1/sqrt(fan_in)); the
                # matching kernel leaf supplies fan_in
                kpath = path[:-len("bias")] + "kernel"
                fi = flat[kpath].shape[0] if kpath in flat else shape[-1]
                b = 1.0 / math.sqrt(fi)
                val = jax.random.uniform(key, shape, minval=-b, maxval=b)
            else:
                val = jnp.zeros(shape)
        elif path.endswith("/kernel"):
            if re.search(r"(^|/)attn/Wqkv/kernel$", path):
                # per-chunk init of the fused projection
                # (fused_init_helper_, param_init_fns.py:19-28)
                cols = []
                for j, (s0, s1) in enumerate(_qkv_chunks(cfg, shape[1])):
                    cols.append(draw(jax.random.fold_in(key, j),
                                     (shape[0], s1 - s0)))
                val = jnp.concatenate(cols, axis=1)
            else:
                val = draw(key, shape)
            if div_val is not None and _RESIDUAL_NAMES.search(path):
                val = val / div_val
        elif path.endswith("/embedding"):      # untied lm_head variants
            val = emb_draw(key, shape)
        else:
            raise NotImplementedError(
                f"init zoo does not know how to initialize {path!r} "
                "(reference param_init_fns.py:131-133 raises here too)")
        out[path] = val.astype(dtype)
    return traverse_util.unflatten_dict(out, sep="/") if nested else out
