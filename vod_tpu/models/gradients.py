"""Gradient estimators: pure functions (batch, encodings[, lm_logits]) -> RealmOutput.

Parity: reference `src/vod_models/vod_gradients/` —
  * `RetrievalGradients` (`retrieval.py:14`): KL-to-binary-relevance REINFORCE-style
    loss `w = (p_model - 1[pos]) / Np`, aux losses (huber guidance, self-supervision
    CE, score L2 decay), KL diagnostics;
  * `MarginalLikelihoodGradients` (`marginal_likelihood.py:9`):
    `log p(x) = logsumexp_z(log p_ret(z|q) + log p_lm(x|z))` with length-normalized
    shifted LM log-probs;
  * `VodGradients`: a `NotImplementedError` stub in the reference (`vod.py:26`).
    Implemented HERE properly: the batch carries everything the VOD estimator
    needs — self-normalized priority-sampling weights (`section__log_weight`),
    proposal scores (`section__score`), and the per-group normalizers
    (`section__lse_pos/neg`) — so the Rényi-bound estimator of arXiv:2210.06345
    closes the reference's gap. See `VodGradients` docstring for the math.

All estimators are plain jittable functions of pytrees; `jax.grad` differentiates
through them (the reference needs `@torch.jit.script` + `.detach()` bookkeeping).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp

from vod_tpu.ops.numpy_ops import masked_log_softmax
from vod_tpu.types.batch import RealmBatch, RealmOutput

GuidanceType = typ.Literal["sparse", "zero"]


def _compute_retriever_scores(
    query_encoding: jax.Array,  # [B, H]
    section_encoding: jax.Array,  # [B, D, H] or [BD_flat, H]
    mask: jax.Array,  # [B, D] True = padding
) -> jax.Array:
    """Parity: `_compute_retriever_scores` (`retrieval.py:187-203`)."""
    if section_encoding.ndim == 2:
        scores = jnp.einsum("bh,dh->bd", query_encoding, section_encoding)
    elif section_encoding.ndim == 3:
        scores = jnp.einsum("bh,bdh->bd", query_encoding, section_encoding)
    else:
        raise ValueError(f"Invalid section encoding shape: {section_encoding.shape}")
    return jnp.where(mask, -jnp.inf, scores)


def _padding_mask(batch: RealmBatch) -> jax.Array:
    return jnp.isneginf(batch.section__score)


def _kld(p_logits: jax.Array, q_logits: jax.Array) -> jax.Array:
    """KL(q || p) over finite entries (parity: `_compute_kld`, `retrieval.py:226`)."""
    p_def = jnp.isfinite(p_logits)
    q_def = jnp.isfinite(q_logits)
    p_lp = masked_log_softmax(jnp.where(p_def, p_logits, -jnp.inf))
    q_lp = masked_log_softmax(jnp.where(q_def, q_logits, -jnp.inf))
    terms = jnp.where(p_def & q_def, jnp.exp(q_lp) * (q_lp - p_lp), 0.0)
    return jnp.sum(terms, axis=-1)


def _huber(x: jax.Array, y: jax.Array, mask: jax.Array, delta: float = 1.0) -> jax.Array:
    d = jnp.where(mask, x - y, 0.0)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.where(jnp.abs(d) <= delta, 0.5 * d**2, delta * (jnp.abs(d) - 0.5 * delta))
    return jnp.sum(jnp.where(mask, loss, 0.0)) / n


class Gradients:
    """Base estimator (parity: `vod_gradients/base.py:8-21`)."""

    def __call__(
        self,
        *,
        batch: RealmBatch,
        query_encoding: jax.Array,
        section_encoding: jax.Array,
        lm_logits: typ.Optional[jax.Array] = None,
    ) -> RealmOutput:
        raise NotImplementedError


class RetrievalGradients(Gradients):
    """KL divergence between the model and binary relevance targets."""

    def __init__(
        self,
        guidance: GuidanceType = "zero",
        guidance_weight: float = 0.0,
        self_supervision_weight: float = 0.0,
        score_decay: float = 0.0,
    ):
        self.guidance = guidance
        self.guidance_weight = guidance_weight
        self.self_supervision_weight = self_supervision_weight
        self.score_decay = score_decay

    def __call__(
        self,
        *,
        batch: RealmBatch,
        query_encoding: jax.Array,
        section_encoding: jax.Array,
        lm_logits: typ.Optional[jax.Array] = None,
    ) -> RealmOutput:
        is_padding = _padding_mask(batch)
        retriever_scores = _compute_retriever_scores(query_encoding, section_encoding, is_padding)
        retriever_logprobs = masked_log_softmax(retriever_scores)

        targets = jnp.where(is_padding, 0.0, (batch.section__relevance > 0).astype(jnp.float32))
        n_positives = jnp.sum(targets, axis=-1)
        # rows without positives: fall back to the candidate count (`retrieval.py:57`)
        n_pos_safe = jnp.where(n_positives == 0, jnp.sum(~is_padding, axis=-1).astype(jnp.float32), n_positives)

        # KL loss: `grad = 1/Np sum (p_i - 1[pos]) grad log p_i` (`retrieval.py:154-177`)
        ref_probs = jax.lax.stop_gradient(jnp.exp(retriever_logprobs))
        w = (ref_probs - targets) / jnp.maximum(n_pos_safe[:, None], 1.0)
        row_loss = jnp.sum(
            jnp.where(is_padding, 0.0, jax.lax.stop_gradient(w) * retriever_logprobs), axis=-1
        )
        has_pos = n_positives > 0
        loss = jnp.sum(jnp.where(has_pos, row_loss, 0.0)) / jnp.maximum(jnp.sum(has_pos), 1.0)

        diagnostics: dict[str, jax.Array] = {}
        if self.guidance_weight > 0:
            ref = batch.section__sparse if self.guidance == "sparse" else jnp.zeros_like(retriever_scores)
            mask = jnp.isfinite(retriever_logprobs) & jnp.isfinite(ref)
            g = _huber(retriever_logprobs, ref, mask)
            loss = loss + self.guidance_weight * g
            diagnostics[f"{self.guidance}_guidance"] = g
        if self.self_supervision_weight > 0:
            pos_lp = jnp.where(targets > 0, retriever_logprobs, -jnp.inf)
            best = jnp.argmax(pos_lp, axis=-1)
            ce_rows = -jnp.take_along_axis(masked_log_softmax(pos_lp), best[:, None], axis=-1)[:, 0]
            ss = jnp.sum(jnp.where(has_pos, ce_rows, 0.0)) / jnp.maximum(jnp.sum(has_pos), 1.0)
            loss = loss + self.self_supervision_weight * ss
            diagnostics["self_supervision"] = ss
        if self.score_decay > 0:
            fin = jnp.isfinite(retriever_scores)
            sd = jnp.sum(jnp.where(fin, retriever_scores**2, 0.0)) / jnp.maximum(jnp.sum(fin), 1.0)
            loss = loss + self.score_decay * sd
            diagnostics["score_decay"] = sd

        # KL diagnostics vs the sampling distributions (`retrieval.py:78-87`)
        for key, ref_scores in {
            "kl_score": batch.section__score,
            "kl_sparse": batch.section__sparse,
            "kl_dense": batch.section__dense,
        }.items():
            if ref_scores is None:
                continue
            ref_scores = jnp.where(jnp.isnan(ref_scores), -jnp.inf, ref_scores)
            diagnostics[key] = jax.lax.stop_gradient(jnp.mean(_kld(retriever_logprobs, ref_scores)))

        return RealmOutput(loss=loss, retriever_scores=retriever_scores, diagnostics=diagnostics)


def _lm_logprobs(input_ids: jax.Array, attention_mask: jax.Array, lm_logits: jax.Array) -> jax.Array:
    """Length-normalized sequence log-probs (parity: `_compute_lm_logprobs`,
    `marginal_likelihood.py:52-67`). Shapes: [B, D, L] ids/mask, [B, D, L, V] logits.

    The softmax runs on the FLATTENED [B*D, L, V] view: a 4-D [B, D, L, V]
    log-softmax tempts XLA into a layout with (B, D) as the minormost tiled
    dims — measured 16x HBM padding blowup (a [16, 8, 63, 30522] f32 temp
    ballooned to 14.7GB) that OOMs seq2seq readers at realistic batch sizes.
    """
    b, d, l = input_ids.shape
    tgt = input_ids.reshape(b * d, l)[:, 1:]
    m = attention_mask.reshape(b * d, l)[:, 1:].astype(jnp.float32)
    logits = lm_logits.reshape(b * d, l, -1)[:, :-1, :]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    tok = tok * m
    return (jnp.sum(tok, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)).reshape(b, d)


class MarginalLikelihoodGradients(Gradients):
    """-log p(x) with `log p(x) = logsumexp_z(log p_ret(z|q) + log p_lm(x|z))`."""

    def __call__(
        self,
        *,
        batch: RealmBatch,
        query_encoding: jax.Array,
        section_encoding: jax.Array,
        lm_logits: typ.Optional[jax.Array] = None,
    ) -> RealmOutput:
        if lm_logits is None:
            raise ValueError("MarginalLikelihoodGradients requires lm_logits")
        is_padding = _padding_mask(batch)
        retriever_scores = _compute_retriever_scores(query_encoding, section_encoding, is_padding)
        retriever_logprobs = masked_log_softmax(retriever_scores)

        b, d = retriever_scores.shape
        ids = batch.lm__input_ids.reshape(b, d, -1)
        mask = batch.lm__attention_mask.reshape(b, d, -1)
        logits = lm_logits.reshape(b, d, *lm_logits.shape[-2:])
        logp_x_z = _lm_logprobs(ids, mask, logits)  # [B, D]

        joint = jnp.where(is_padding, -jnp.inf, retriever_logprobs + logp_x_z)
        logp_x = jax.nn.logsumexp(joint, axis=-1)
        loss = -jnp.mean(logp_x)
        return RealmOutput(loss=loss, retriever_scores=retriever_scores, diagnostics={})


class DistillationGradients(Gradients):
    """Cross-encoder -> dual-encoder distillation (beyond reference: upstream
    has no teacher-student path; its estimators train on binary relevance only).

    Consumes `batch.section__teacher_score` ([B, D], -inf/nan = missing — e.g.
    precomputed monoBERT scores, `models.cross_encoder.cross_encoder_scores`).
    Objectives:

      * `margin_mse` (Hofstaetter et al., arXiv:2010.02666): anchor at the
        highest-teacher-scored positive p; for every valid negative n minimize
        `((f_p - f_n) - (t_p - t_n))^2` — matches the teacher's MARGINS, which
        is scale-free in the teacher's score units.
      * `kl`: KL(softmax(t / T) || softmax(f)) over the valid candidates —
        matches the full teacher distribution (listwise).

    `ce_weight > 0` mixes in the `RetrievalGradients` KL-to-relevance loss so
    labels and teacher signal co-train (the standard recipe).
    """

    def __init__(
        self,
        objective: typ.Literal["margin_mse", "kl"] = "margin_mse",
        temperature: float = 1.0,
        ce_weight: float = 0.0,
    ):
        self.objective = objective
        self.temperature = temperature
        self.ce_weight = ce_weight
        self._ce = RetrievalGradients() if ce_weight > 0 else None

    def __call__(
        self,
        *,
        batch: RealmBatch,
        query_encoding: jax.Array,
        section_encoding: jax.Array,
        lm_logits: typ.Optional[jax.Array] = None,
    ) -> RealmOutput:
        t = batch.section__teacher_score
        if t is None:
            raise ValueError("DistillationGradients requires batch.section__teacher_score")
        is_padding = _padding_mask(batch)
        f = _compute_retriever_scores(query_encoding, section_encoding, is_padding)
        valid = ~is_padding & jnp.isfinite(t)
        t = jnp.where(valid, t, -jnp.inf)

        diagnostics: dict[str, jax.Array] = {}
        if self.objective == "margin_mse":
            is_pos = (batch.section__relevance > 0) & valid
            has_pos = jnp.any(is_pos, axis=-1)
            # anchor = the positive the teacher ranks highest
            anchor = jnp.argmax(jnp.where(is_pos, t, -jnp.inf), axis=-1)  # [B]
            f_p = jnp.take_along_axis(f, anchor[:, None], axis=-1)  # [B, 1]
            t_p = jnp.take_along_axis(t, anchor[:, None], axis=-1)
            is_neg = valid & ~is_pos
            d = jnp.where(is_neg & has_pos[:, None], (f_p - f) - (t_p - t), 0.0)
            n_pairs = jnp.maximum(jnp.sum(is_neg & has_pos[:, None]), 1.0)
            loss = jnp.sum(d**2) / n_pairs
            diagnostics["margin_mse_pairs"] = n_pairs
        elif self.objective == "kl":
            teacher_lp = masked_log_softmax(t / self.temperature)
            student_lp = masked_log_softmax(jnp.where(valid, f, -jnp.inf))
            terms = jnp.where(valid, jnp.exp(teacher_lp) * (teacher_lp - student_lp), 0.0)
            rows = jnp.sum(terms, axis=-1)
            has_any = jnp.any(valid, axis=-1)
            loss = jnp.sum(jnp.where(has_any, rows, 0.0)) / jnp.maximum(jnp.sum(has_any), 1.0)
        else:
            raise ValueError(f"Unknown distillation objective: {self.objective}")

        if self._ce is not None:
            ce_out = self._ce(
                batch=batch, query_encoding=query_encoding, section_encoding=section_encoding
            )
            loss = loss + self.ce_weight * ce_out.loss
            diagnostics["ce_loss"] = ce_out.loss

        return RealmOutput(loss=loss, retriever_scores=f, diagnostics=diagnostics)


class VodGradients(Gradients):
    """The VOD estimator (arXiv:2210.06345) — implemented, not stubbed.

    With priority-sampled sections S, self-normalized weights
    `w_i = exp(section__log_weight_i)` (sum to 1 per label group) approximating
    expectations under the per-group proposal `q_g(z) = exp(s_z) / exp(lse_g)`
    (s = `section__score`; lse_g = `section__lse_pos/neg`, the group's proposal
    log-mass), the groups are first recombined with their proposal masses

        log w~_i = log w_i + lse_{g(i)}

    (without this, positives — whose group mass is typically far smaller — would
    be over-weighted relative to negatives). Importance-corrected posterior
    weights are then

        v_i = softmax_i(log w~_i + f_i - s_i)       (f = retriever scores)

    and the Rényi bound on the marginal likelihood is estimated as

        L_alpha = 1/(1-alpha) * log sum_i v_i * exp((1-alpha) * log p_lm(x|z_i))

    (alpha -> 0 recovers the IWAE/marginal-likelihood bound; alpha -> 1 the ELBO).
    Retriever-only mode (no reader): KL-to-relevance loss as in
    `RetrievalGradients`, but with the partition function estimated over the
    sampled support via the same importance correction:

        log Z_hat = logsumexp_i(log w~_i + f_i - s_i)
                  = logsumexp_g(lse_g + logsumexp_{i in g}(log w_i + f_i - s_i))

    which is exact when every candidate is sampled (then log w_i = s_i - lse_g
    and log Z_hat = logsumexp_i(f_i)).
    """

    def __init__(self, alpha: float = 0.0, proposal_temperature: float = 1.0):
        self.alpha = alpha
        # The sampler's proposal is q_g(z) ∝ exp(beta * s_z) with beta =
        # `temperature` in `labeled_priority_sampling`; the correction must
        # subtract the same beta * s. Keep in sync with the collate config.
        self.proposal_temperature = proposal_temperature

    def __call__(
        self,
        *,
        batch: RealmBatch,
        query_encoding: jax.Array,
        section_encoding: jax.Array,
        lm_logits: typ.Optional[jax.Array] = None,
    ) -> RealmOutput:
        is_padding = _padding_mask(batch)
        f = _compute_retriever_scores(query_encoding, section_encoding, is_padding)

        log_w = batch.section__log_weight
        s = batch.section__score
        if log_w is None:
            raise ValueError("VodGradients requires section__log_weight (priority sampling)")
        # Recombine the per-group self-normalized weights with their proposal
        # masses (lse_pos/lse_neg): log w~ = log w + lse_{g(i)}. Items never
        # sampled (log_w = -inf, e.g. cross-query in-batch negatives) stay out.
        if batch.section__lse_pos is not None and batch.section__lse_neg is not None:
            is_pos = batch.section__relevance > 0
            lse_g = jnp.where(
                is_pos, batch.section__lse_pos[..., None], batch.section__lse_neg[..., None]
            )
            log_w = log_w + jnp.where(jnp.isfinite(lse_g), lse_g, 0.0)
        # importance correction: log w~ + f - beta*s over the sampled support
        beta = self.proposal_temperature
        corr = jnp.where(is_padding, -jnp.inf, log_w + f - beta * jnp.where(is_padding, 0.0, s))

        if lm_logits is not None:
            b, d = f.shape
            ids = batch.lm__input_ids.reshape(b, d, -1)
            mask = batch.lm__attention_mask.reshape(b, d, -1)
            logits = lm_logits.reshape(b, d, *lm_logits.shape[-2:])
            logp_x_z = _lm_logprobs(ids, mask, logits)  # [B, D]
            v = masked_log_softmax(corr)  # log v_i
            one_m_alpha = 1.0 - self.alpha
            if abs(one_m_alpha) < 1e-6:
                # alpha = 1: ELBO = sum_i v_i log p(x|z_i)
                bound = jnp.sum(jnp.where(is_padding, 0.0, jnp.exp(v) * logp_x_z), axis=-1)
            else:
                terms = jnp.where(is_padding, -jnp.inf, v + one_m_alpha * logp_x_z)
                bound = jax.nn.logsumexp(terms, axis=-1) / one_m_alpha
            loss = -jnp.mean(bound)
        else:
            # Retriever-only: KL(p_data || p_theta) with IS-corrected normalizer.
            targets = jnp.where(is_padding, 0.0, (batch.section__relevance > 0).astype(jnp.float32))
            n_pos = jnp.sum(targets, axis=-1)
            log_z = jax.nn.logsumexp(jnp.where(is_padding, -jnp.inf, corr), axis=-1)
            logp = f - log_z[:, None]
            pos_term = jnp.sum(jnp.where(targets > 0, logp, 0.0), axis=-1) / jnp.maximum(n_pos, 1.0)
            row_loss = -pos_term
            has_pos = n_pos > 0
            loss = jnp.sum(jnp.where(has_pos, row_loss, 0.0)) / jnp.maximum(jnp.sum(has_pos), 1.0)

        return RealmOutput(loss=loss, retriever_scores=f, diagnostics={})
