"""Generation-quality evaluation for seq2seq Realm systems.

Parity-plus: the reference's `VodSystem.forward(mode="generate")` exposes
generation but nothing consumes it during validation
(`vod_systems/base.py:37-51`); here KV-cached greedy decoding
(`models/seq2seq.generate`) feeds answer-level metrics — exact match and
token-F1 against the collate's gold answer segment — so REALM readers can be
tracked on actual generation, not only teacher-forced likelihood.

Everything runs with static shapes: per query, the generation conditioned on
the TOP-scoring retrieved section is compared against the gold answer tokens
(the `token_type_ids == 2` segment of `lm__input_ids`, compacted exactly like
`Seq2SeqRealm._reader_io`).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np

from vod_tpu.types.batch import RealmBatch


def _gold_answer_tokens(batch: RealmBatch, max_len: int) -> tuple[jax.Array, jax.Array]:
    """[B, D, T] gold answer ids + mask, front-compacted from the lm segment
    (same compaction the teacher-forced reader trains on)."""
    from vod_tpu.models.seq2seq import compact_answer_segment

    return compact_answer_segment(
        batch.lm__input_ids, batch.lm__token_type_ids, batch.lm__attention_mask, max_len
    )


def generation_metrics(
    generated: jax.Array,  # [B*D, T] (realm_generate output)
    batch: RealmBatch,
    *,
    eos_id: int = 1,
) -> dict[str, float]:
    """Exact match + token-F1 of the top-section generation vs the gold answer.

    `generated` rows follow the flattened (query, section) layout; the row
    scored highest by the retriever (`section__score` argmax) represents each
    query. EM compares the generated prefix up to (excluding) EOS with the
    gold tokens; F1 is bag-of-token overlap.
    """
    b, d = batch.section__score.shape
    t = generated.shape[-1]
    gen = generated.reshape(b, d, t)
    best = jnp.argmax(jnp.where(jnp.isfinite(batch.section__score), batch.section__score, -jnp.inf), axis=-1)
    gen_best = jnp.take_along_axis(gen, best[:, None, None], axis=1)[:, 0]  # [B, T]

    gold_ids, gold_m = _gold_answer_tokens(batch, t)
    gold_best = jnp.take_along_axis(gold_ids, best[:, None, None], axis=1)[:, 0]
    gold_mask = jnp.take_along_axis(gold_m, best[:, None, None], axis=1)[:, 0]

    # generated validity: tokens before the first EOS
    hit_eos = jnp.cumsum((gen_best == eos_id).astype(jnp.int32), axis=-1)
    gen_mask = (hit_eos == 0).astype(jnp.int32)

    gen_np = np.asarray(gen_best)
    gm_np = np.asarray(gen_mask)
    gold_np = np.asarray(gold_best)
    goldm_np = np.asarray(gold_mask)

    em, f1 = [], []
    for i in range(b):
        g = gen_np[i][gm_np[i] > 0].tolist()
        a = gold_np[i][goldm_np[i] > 0].tolist()
        # gold may itself end with EOS — strip it for comparison
        while a and a[-1] == eos_id:
            a = a[:-1]
        em.append(float(g == a))
        if not g and not a:
            f1.append(1.0)
        elif not g or not a:
            f1.append(0.0)
        else:
            from collections import Counter

            common = sum((Counter(g) & Counter(a)).values())
            if common == 0:
                f1.append(0.0)
            else:
                p, r = common / len(g), common / len(a)
                f1.append(2 * p * r / (p + r))
    return {"gen/exact_match": float(np.mean(em)), "gen/token_f1": float(np.mean(f1))}


def evaluate_generation(
    model: typ.Any,  # Seq2SeqRealm
    params: typ.Mapping,
    batches: typ.Iterable[RealmBatch],
    *,
    max_new_tokens: int = 16,
    eos_id: int = 1,
    max_batches: typ.Optional[int] = None,
) -> dict[str, float]:
    """Run KV-cached greedy generation over validation batches and aggregate
    answer metrics (mean over queries)."""
    from vod_tpu.models.seq2seq import realm_generate

    sums: dict[str, float] = {}
    count = 0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        toks = realm_generate(model, params, batch, max_new_tokens=max_new_tokens)
        m = generation_metrics(toks, batch, eos_id=eos_id)
        nb = batch.section__score.shape[0]
        for key, value in m.items():
            sums[key] = sums.get(key, 0.0) + value * nb
        count += nb
    return {k: v / max(count, 1) for k, v in sums.items()}
