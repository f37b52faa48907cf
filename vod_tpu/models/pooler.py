"""VodPooler: aggregate transformer hidden states into one embedding.

Parity: reference `src/vod_models/vod_encoder/modeling.py:115-181` — aggregator
(mean/max/cls/none), optional projection, activation, L1/L2 norm, and a learnable
log-scale temperature applied as `* exp(0.5 * log_scaler)` (`modeling.py:174`).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

AggMethod = typ.Literal["mean", "max", "cls", "none"]


@struct.dataclass
class VodPoolerConfig:
    agg_method: str = "mean"
    projection_size: typ.Optional[int] = None
    output_activation: typ.Optional[str] = None  # relu | tanh | sigmoid | gelu
    output_norm: typ.Optional[str] = None  # l1 | l2
    scaler: float = 1.0
    learn_scaler: bool = False


def _aggregate(method: str, x: jax.Array, mask: jax.Array) -> jax.Array:
    """x: [..., L, H]; mask: [..., L]."""
    if method == "cls":
        return x[..., 0, :]
    if method == "mean":
        m = mask[..., None].astype(x.dtype)
        return jnp.sum(x * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    if method == "max":
        # the vector with the largest norm (parity: `MaxAgg`, `modeling.py:90-95`)
        norms = jnp.linalg.norm(x, axis=-1)
        norms = jnp.where(mask > 0, norms, -jnp.inf)
        best = jnp.argmax(norms, axis=-1)
        return jnp.take_along_axis(x, best[..., None, None], axis=-2)[..., 0, :]
    if method == "none":
        return x
    raise ValueError(f"Unknown agg_method: {method}")


class VodPooler(nn.Module):
    config: VodPoolerConfig
    backbone_output_size: int

    @nn.compact
    def __call__(self, hidden_states: jax.Array, attention_mask: jax.Array) -> jax.Array:
        cfg = self.config
        pooled = _aggregate(cfg.agg_method, hidden_states, attention_mask)
        if cfg.projection_size is not None:
            pooled = nn.Dense(cfg.projection_size, name="projection")(pooled)
        if cfg.output_activation is not None:
            act = {"relu": nn.relu, "tanh": nn.tanh, "sigmoid": nn.sigmoid, "gelu": nn.gelu}[
                cfg.output_activation
            ]
            pooled = act(pooled)
        if cfg.output_norm is not None:
            p = {"l1": 1, "l2": 2}[cfg.output_norm]
            norm = jnp.linalg.norm(pooled, ord=p, axis=-1, keepdims=True)
            pooled = pooled / jnp.maximum(norm, 1e-12)
        init = nn.initializers.constant(jnp.log(cfg.scaler))
        if cfg.learn_scaler:
            log_scaler = self.param("log_scaler", init, ())
        else:
            log_scaler = jnp.asarray(jnp.log(cfg.scaler), dtype=pooled.dtype)
        return pooled * jnp.exp(0.5 * log_scaler)

    @property
    def output_size(self) -> int:
        return self.config.projection_size or self.backbone_output_size
