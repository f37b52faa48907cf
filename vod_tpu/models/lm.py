"""Causal language model (the REALM "reader") — GPT-2-exact layout.

Parity: the reference wires any pretrained HF autoregressive LM into `Realm`
(`vod_systems/realm.py:20`, hydra group `model/lm/` — e.g.
`model/lm/pygmalion-350m.yaml` instantiates a hub checkpoint directly); the
reader consumes flattened `[B*D, L]` token tensors and returns logits
(`realm.py:56-62`). This is a native flax pre-LN decoder whose module layout
matches HF GPT-2 tensor-for-tensor, so hub decoder-only checkpoints port
losslessly via `port_gpt2_weights` (torch-parity tested) — closing the one
missing pretrained-reader leg (BERT/RoBERTa/XLM-R/T5 ports already exist).

GPT-2 specifics honored for the lossless port:
  * pre-LN blocks `x + attn(ln_1 x)`, `x + mlp(ln_2 x)`
  * fused `c_attn` [H, 3H] split into q/k/v; Conv1D ([in, out]) or Linear
    ([out, in]) storage auto-detected by shape
  * `gelu_new` (tanh approximation — flax `nn.gelu(approximate=True)`)
  * tied lm_head (`logits = h @ wte.T`) via `tie_word_embeddings`
  * learned positions `wpe`, final `ln_f`

Generation (`lm_generate`) is KV-cached: the prompt runs ONE teacher-forced
prefill pass that also writes per-layer K/V caches, then each new token is a
single [B, 1] step under `lax.scan` — no quadratic recompute, one jit.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct


@struct.dataclass
class CausalLMConfig:
    vocab_size: int = 30522
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    intermediate_size: int = 1024
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    # GPT-2 ties the output head to the token embedding; the native default
    # stays untied for backward compatibility with existing configs
    tie_word_embeddings: bool = False
    dtype: typ.Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


class _DecoderLayer(nn.Module):
    cfg: CausalLMConfig

    def setup(self) -> None:
        cfg = self.cfg
        heads, hd = cfg.num_heads, cfg.head_dim
        self.ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln1")
        self.ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln2")
        self.query = nn.DenseGeneral((heads, hd), dtype=cfg.dtype, name="query")
        self.key = nn.DenseGeneral((heads, hd), dtype=cfg.dtype, name="key")
        self.value = nn.DenseGeneral((heads, hd), dtype=cfg.dtype, name="value")
        self.out = nn.DenseGeneral(
            cfg.hidden_size, axis=(-2, -1), dtype=cfg.dtype, name="out"
        )
        self.fc_in = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc_in")
        self.fc_out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc_out")

    def _attend(self, q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array) -> jax.Array:
        """q [B, Lq, Hh, D], k/v [B, Lk, Hh, D], mask [B, 1|Hh, Lq, Lk] bool."""
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / np.sqrt(self.cfg.head_dim)
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.cfg.dtype)
        return self.out(jnp.einsum("bhqk,bkhd->bqhd", probs, v))

    def __call__(
        self, h: jax.Array, mask: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Full-sequence pass. Returns (h, k, v) — k/v feed prefill caches."""
        x = self.ln1(h)
        q, k, v = self.query(x), self.key(x), self.value(x)
        h = h + self._attend(q, k, v, mask)
        x = self.ln2(h)
        h = h + self.fc_out(nn.gelu(self.fc_in(x)))  # gelu_new (tanh approx)
        return h, k, v

    def step(
        self,
        h: jax.Array,
        pos: jax.Array,
        cache_k: jax.Array,
        cache_v: jax.Array,
        kv_mask: jax.Array,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """One-token decode: h [B, 1, H]; caches [B, Lmax, Hh, D]; `pos` [B]
        per-row write positions; `kv_mask` [B, Lmax] already includes the new
        token's slot. Per-row scatter writes keep the step shape-static."""
        b = h.shape[0]
        x = self.ln1(h)
        rows = jnp.arange(b)
        cache_k = cache_k.at[rows, pos].set(self.key(x)[:, 0].astype(cache_k.dtype))
        cache_v = cache_v.at[rows, pos].set(self.value(x)[:, 0].astype(cache_v.dtype))
        mask = kv_mask[:, None, None, :] > 0
        h = h + self._attend(self.query(x), cache_k, cache_v, mask)
        x = self.ln2(h)
        h = h + self.fc_out(nn.gelu(self.fc_in(x)))
        return h, cache_k, cache_v


class CausalLM(nn.Module):
    cfg: CausalLMConfig

    def setup(self) -> None:
        cfg = self.cfg
        self.wte = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="wte")
        self.wpe = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=cfg.dtype, name="wpe"
        )
        self.layers = [_DecoderLayer(cfg, name=f"layer_{i}") for i in range(cfg.num_layers)]
        self.ln_f = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_f")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=jnp.float32, name="lm_head"
            )

    def _logits(self, h: jax.Array) -> jax.Array:
        h = self.ln_f(h).astype(jnp.float32)
        if self.cfg.tie_word_embeddings:
            return h @ jnp.asarray(self.wte.embedding).astype(jnp.float32).T
        return self.lm_head(h)

    def _embed(self, input_ids: jax.Array, positions: jax.Array) -> jax.Array:
        return self.wte(input_ids) + self.wpe(positions)

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Returns next-token logits [B, L, V] (float32)."""
        l = input_ids.shape[-1]
        h = self._embed(input_ids, jnp.arange(l)[None])
        causal = nn.make_causal_mask(input_ids, dtype=jnp.bool_)  # [B, 1, L, L]
        mask = causal & (attention_mask[:, None, None, :] > 0)
        for layer in self.layers:
            h, _, _ = layer(h, mask)
        return self._logits(h)

    # ---- incremental decoding -------------------------------------------

    def prefill(
        self, input_ids: jax.Array, attention_mask: jax.Array, max_len: int
    ) -> tuple[jax.Array, dict]:
        """Teacher-forced pass over the prompt that ALSO fills the K/V caches.

        Returns (logits [B, L, V], cache). The cache holds [B, max_len, Hh, D]
        K/V per layer plus the running kv_mask and per-row write positions
        (= each row's valid prompt length, so right-padded prompts continue
        compactly after their own prefix)."""
        cfg = self.cfg
        b, l = input_ids.shape
        h = self._embed(input_ids, jnp.arange(l)[None])
        causal = nn.make_causal_mask(input_ids, dtype=jnp.bool_)
        mask = causal & (attention_mask[:, None, None, :] > 0)
        pad = max_len - l
        cache: dict = {}
        for i, layer in enumerate(self.layers):
            h, k, v = layer(h, mask)
            zeros = jnp.zeros((b, pad, cfg.num_heads, cfg.head_dim), dtype=cfg.dtype)
            cache[f"layer_{i}"] = {
                "k": jnp.concatenate([k.astype(cfg.dtype), zeros], axis=1),
                "v": jnp.concatenate([v.astype(cfg.dtype), zeros], axis=1),
            }
        cache["kv_mask"] = jnp.concatenate(
            [attention_mask.astype(jnp.int32), jnp.zeros((b, pad), jnp.int32)], axis=1
        )
        cache["pos"] = jnp.sum(attention_mask > 0, axis=-1).astype(jnp.int32)  # [B]
        return self._logits(h), cache

    def decode_step(self, tok: jax.Array, cache: dict) -> tuple[jax.Array, dict]:
        """One decode step: tok [B] int32 -> (logits [B, V], cache)."""
        pos = cache["pos"]
        kv_mask = cache["kv_mask"].at[jnp.arange(tok.shape[0]), pos].set(1)
        h = self._embed(tok[:, None], pos[:, None])
        new_cache: dict = {"kv_mask": kv_mask, "pos": pos + 1}
        for i, layer in enumerate(self.layers):
            c = cache[f"layer_{i}"]
            h, ck, cv = layer.step(h, pos, c["k"], c["v"], kv_mask)
            new_cache[f"layer_{i}"] = {"k": ck, "v": cv}
        return self._logits(h)[:, 0, :], new_cache


# ---- generation ----------------------------------------------------------


def lm_generate(
    model: CausalLM,
    params: typ.Mapping,
    input_ids: jax.Array,
    attention_mask: typ.Optional[jax.Array] = None,
    *,
    max_new_tokens: int = 32,
    eos_id: typ.Optional[int] = None,
    pad_id: int = 0,
    temperature: float = 0.0,
    top_k: typ.Optional[int] = None,
    top_p: typ.Optional[float] = None,
    rng: typ.Optional[jax.Array] = None,
) -> jax.Array:
    """KV-cached decoder-only generation (greedy, or sampled if temperature>0).

    Parity: the reference delegates to HF `generate` (mode dispatch
    `vod_systems/base.py:37-51`). One prefill pass over the prompt, then
    `max_new_tokens` single-token steps under `lax.scan`. Right-padded prompts
    are handled compactly (each row continues after its own valid prefix —
    the first new token comes from the logits at that row's last valid
    position). Finished rows (emitted `eos_id`) keep emitting `pad_id`.
    Returns new tokens only, [B, max_new_tokens].
    """
    from .seq2seq import filter_logits  # shared top-k / nucleus filtering

    if rng is None:
        rng = jax.random.PRNGKey(0)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    b, l = input_ids.shape
    logits_all, cache = model.apply(
        params, input_ids, attention_mask, l + max_new_tokens, method=CausalLM.prefill
    )
    last = jnp.sum(attention_mask > 0, axis=-1) - 1  # [B] last valid position
    logits = logits_all[jnp.arange(b), last]  # [B, V]

    def pick(logits: jax.Array, key: jax.Array) -> jax.Array:
        if temperature > 0.0:
            return jax.random.categorical(
                key, filter_logits(logits / temperature, top_k, top_p), axis=-1
            )
        return jnp.argmax(logits, axis=-1)

    def step(carry, key):
        logits, cache, finished = carry
        nxt = pick(logits, key)
        nxt = jnp.where(finished, jnp.full_like(nxt, pad_id), nxt).astype(jnp.int32)
        if eos_id is not None:
            finished = finished | (nxt == eos_id)
        logits, cache = model.apply(params, nxt, cache, method=CausalLM.decode_step)
        return (logits, cache, finished), nxt

    init = (logits, cache, jnp.zeros((b,), dtype=bool))
    _, toks = jax.lax.scan(step, init, jax.random.split(rng, max_new_tokens))
    return jnp.transpose(toks)  # [B, T]


# ---- HF GPT-2 checkpoint porting ------------------------------------------


def gpt2_config_from_hf(hf_config: typ.Any, dtype=jnp.float32) -> CausalLMConfig:
    """HF `GPT2Config` -> `CausalLMConfig` (tied head, GPT-2 layer-norm eps)."""
    return CausalLMConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.n_embd,
        num_layers=hf_config.n_layer,
        num_heads=hf_config.n_head,
        intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
        max_position_embeddings=hf_config.n_positions,
        layer_norm_eps=getattr(hf_config, "layer_norm_epsilon", 1e-5),
        tie_word_embeddings=True,
        dtype=dtype,
    )


def _t(x: typ.Any) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def port_gpt2_weights(
    state_dict: typ.Mapping[str, typ.Any], cfg: CausalLMConfig
) -> dict:
    """torch GPT-2 state_dict -> flax `CausalLM` params subtree (lossless).

    Parity: reference hydra `model/lm/pygmalion-350m.yaml` plugs hub
    decoder-only LMs straight into `Realm` (`vod_systems/realm.py:20`).
    Accepts bare (`wte.weight`) and prefixed (`transformer.wte.weight`) keys.
    GPT-2's `Conv1D` stores weights [in, out]; Linear-layout forks ([out, in])
    are auto-detected by shape and transposed.
    """
    sd = dict(state_dict)
    if any(k.startswith("transformer.") for k in sd):
        sd = {k[len("transformer."):]: v for k, v in sd.items() if k.startswith("transformer.")}

    h, heads, hd, inter = cfg.hidden_size, cfg.num_heads, cfg.head_dim, cfg.intermediate_size

    def lin(key: str, d_in: int, d_out: int) -> np.ndarray:
        w = _t(sd[key])
        if w.shape == (d_in, d_out):  # Conv1D layout
            return w
        if w.shape == (d_out, d_in):  # Linear layout
            return w.T
        raise ValueError(f"{key}: shape {w.shape}, expected ({d_in},{d_out}) or transposed")

    params: dict = {
        "wte": {"embedding": _t(sd["wte.weight"])},
        "wpe": {"embedding": _t(sd["wpe.weight"])},
        "ln_f": {"scale": _t(sd["ln_f.weight"]), "bias": _t(sd["ln_f.bias"])},
    }
    for i in range(cfg.num_layers):
        p = f"h.{i}."
        wqkv = lin(p + "attn.c_attn.weight", h, 3 * h)
        bqkv = _t(sd[p + "attn.c_attn.bias"])
        wq, wk, wv = wqkv[:, :h], wqkv[:, h : 2 * h], wqkv[:, 2 * h :]
        bq, bk, bv = bqkv[:h], bqkv[h : 2 * h], bqkv[2 * h :]
        params[f"layer_{i}"] = {
            "ln1": {"scale": _t(sd[p + "ln_1.weight"]), "bias": _t(sd[p + "ln_1.bias"])},
            "ln2": {"scale": _t(sd[p + "ln_2.weight"]), "bias": _t(sd[p + "ln_2.bias"])},
            "query": {"kernel": wq.reshape(h, heads, hd), "bias": bq.reshape(heads, hd)},
            "key": {"kernel": wk.reshape(h, heads, hd), "bias": bk.reshape(heads, hd)},
            "value": {"kernel": wv.reshape(h, heads, hd), "bias": bv.reshape(heads, hd)},
            "out": {
                "kernel": lin(p + "attn.c_proj.weight", h, h).reshape(heads, hd, h),
                "bias": _t(sd[p + "attn.c_proj.bias"]),
            },
            "fc_in": {
                "kernel": lin(p + "mlp.c_fc.weight", h, inter),
                "bias": _t(sd[p + "mlp.c_fc.bias"]),
            },
            "fc_out": {
                "kernel": lin(p + "mlp.c_proj.weight", inter, h),
                "bias": _t(sd[p + "mlp.c_proj.bias"]),
            },
        }
    return params


def load_hf_causal_lm(name_or_path: str, dtype=jnp.float32) -> tuple[CausalLMConfig, dict]:
    """Load a hub/local GPT-2-family LM and port it (requires HF cache offline)."""
    import transformers

    hf = transformers.AutoModelForCausalLM.from_pretrained(name_or_path)
    if getattr(hf.config, "model_type", None) != "gpt2":
        raise ValueError(
            f"decoder-only port supports the gpt2 layout; got {hf.config.model_type!r}"
        )
    cfg = gpt2_config_from_hf(hf.config, dtype=dtype)
    return cfg, port_gpt2_weights(hf.state_dict(), cfg)
