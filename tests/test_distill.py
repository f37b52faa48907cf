"""Cross-encoder -> dual-encoder distillation (beyond reference: upstream has
no teacher-student path). Covers margin-MSE/KL objectives, padding/missing
teacher handling, the teacher-fill helper, and end-to-end trainability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.models.gradients import DistillationGradients
from vod_tpu.types import RealmBatch


def _batch(scores, relevance, teacher, b=None, d=None):
    scores = np.asarray(scores, np.float32)
    b, d = scores.shape
    return RealmBatch(
        query__input_ids=jnp.zeros((b, 4), jnp.int32),
        query__attention_mask=jnp.ones((b, 4), jnp.int32),
        section__input_ids=jnp.zeros((b * d, 4), jnp.int32),
        section__attention_mask=jnp.ones((b * d, 4), jnp.int32),
        section__relevance=jnp.asarray(relevance, jnp.float32),
        section__idx=jnp.zeros((b, d), jnp.int32),
        section__score=jnp.asarray(scores),
        section__sparse=jnp.zeros((b, d), jnp.float32),
        section__teacher_score=None if teacher is None else jnp.asarray(teacher, jnp.float32),
    )


def _encodings(f):
    """Craft (query, section) encodings so retriever scores == f exactly:
    query = e_0, section_i = f_i * e_0."""
    f = np.asarray(f, np.float32)
    b, d = f.shape
    q = np.zeros((b, 4), np.float32)
    q[:, 0] = 1.0
    s = np.zeros((b, d, 4), np.float32)
    s[..., 0] = f
    return jnp.asarray(q), jnp.asarray(s)


def test_margin_mse_zero_when_student_matches_teacher_margins():
    f = [[3.0, 1.0, 0.0]]
    teacher = [[5.0, 3.0, 2.0]]  # same margins as f (offset by 2)
    rel = [[1, 0, 0]]
    batch = _batch([[0.0, 0.0, 0.0]], rel, teacher)
    q, s = _encodings(f)
    out = DistillationGradients("margin_mse")(batch=batch, query_encoding=q, section_encoding=s)
    assert float(out.loss) == pytest.approx(0.0, abs=1e-6)


def test_margin_mse_penalizes_margin_mismatch():
    # teacher margin p-n = 2; student margin = 0 -> loss = 4 per pair
    f = [[1.0, 1.0]]
    teacher = [[3.0, 1.0]]
    batch = _batch([[0.0, 0.0]], [[1, 0]], teacher)
    q, s = _encodings(f)
    out = DistillationGradients("margin_mse")(batch=batch, query_encoding=q, section_encoding=s)
    assert float(out.loss) == pytest.approx(4.0, rel=1e-5)


def test_margin_mse_ignores_padding_and_missing_teacher():
    f = [[1.0, 1.0, 9.0, 9.0]]
    teacher = [[3.0, 1.0, np.nan, 7.0]]  # slot 2: no teacher; slot 3: padding
    scores = [[0.0, 0.0, 0.0, -np.inf]]
    batch = _batch(scores, [[1, 0, 0, 0]], teacher)
    q, s = _encodings(f)
    out = DistillationGradients("margin_mse")(batch=batch, query_encoding=q, section_encoding=s)
    # only the (0, 1) pair contributes: ((1-1) - (3-1))^2 = 4
    assert float(out.loss) == pytest.approx(4.0, rel=1e-5)


def test_kl_zero_at_exact_match_and_positive_otherwise():
    f = [[2.0, 1.0, 0.0]]
    batch = _batch([[0.0, 0.0, 0.0]], [[1, 0, 0]], f)  # teacher == student
    q, s = _encodings(f)
    out = DistillationGradients("kl")(batch=batch, query_encoding=q, section_encoding=s)
    assert float(out.loss) == pytest.approx(0.0, abs=1e-6)

    batch2 = _batch([[0.0, 0.0, 0.0]], [[1, 0, 0]], [[0.0, 1.0, 2.0]])
    out2 = DistillationGradients("kl")(batch=batch2, query_encoding=q, section_encoding=s)
    assert float(out2.loss) > 0.1


def test_kl_temperature_softens_teacher():
    f = [[0.0, 0.0]]
    q, s = _encodings(f)
    batch = _batch([[0.0, 0.0]], [[1, 0]], [[4.0, 0.0]])
    hot = DistillationGradients("kl", temperature=1.0)(batch=batch, query_encoding=q, section_encoding=s)
    soft = DistillationGradients("kl", temperature=8.0)(batch=batch, query_encoding=q, section_encoding=s)
    # softened teacher is closer to the student's uniform -> smaller KL
    assert float(soft.loss) < float(hot.loss)


def test_requires_teacher_scores():
    batch = _batch([[0.0, 0.0]], [[1, 0]], None)
    q, s = _encodings([[1.0, 0.0]])
    with pytest.raises(ValueError, match="teacher_score"):
        DistillationGradients()(batch=batch, query_encoding=q, section_encoding=s)


def test_ce_weight_mixes_relevance_loss():
    f = [[3.0, 1.0]]
    teacher = [[5.0, 3.0]]  # margin-matched -> pure distill loss = 0
    batch = _batch([[0.0, 0.0]], [[1, 0]], teacher)
    q, s = _encodings(f)
    pure = DistillationGradients("margin_mse")(batch=batch, query_encoding=q, section_encoding=s)
    mixed = DistillationGradients("margin_mse", ce_weight=1.0)(
        batch=batch, query_encoding=q, section_encoding=s
    )
    assert float(pure.loss) == pytest.approx(0.0, abs=1e-6)
    assert "ce_loss" in mixed.diagnostics
    assert np.isfinite(float(mixed.loss))


def test_fill_teacher_scores_aligns_and_masks_padding():
    from vod_tpu.models.cross_encoder import CrossEncoder, fill_teacher_scores
    from vod_tpu.models.encoder import TransformerEncoderConfig

    cfg = TransformerEncoderConfig(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=32, dtype=jnp.float32,
    )
    model = CrossEncoder(cfg)
    rng = np.random.default_rng(0)
    b, d, length = 2, 3, 8
    ids = rng.integers(5, 64, (b, d, length)).astype(np.int32)
    mask = np.ones((b, d, length), np.int32)
    types = np.zeros((b, d, length), np.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids[0]), jnp.asarray(mask[0]), jnp.asarray(types[0])
    )["params"]

    scores = np.zeros((b, d), np.float32)
    scores[1, 2] = -np.inf  # padding slot
    batch = _batch(scores, np.zeros((b, d)), None)

    def apply_fn(p, i, m, t):
        return model.apply({"params": p}, i, m, t)

    out = jax.jit(
        lambda p, bt, i, m, t: fill_teacher_scores(apply_fn, p, bt, i, m, t, chunk=4)
    )(params, batch, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
    ts = np.asarray(out.section__teacher_score)
    assert ts.shape == (b, d)
    assert np.isneginf(ts[1, 2])
    assert np.isfinite(ts[0]).all()

    # matches a direct (unchunked) forward on the same pairs
    direct = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids.reshape(-1, length)),
                    jnp.asarray(mask.reshape(-1, length)), jnp.asarray(types.reshape(-1, length)))
    ).reshape(b, d)
    np.testing.assert_allclose(ts[0], direct[0], rtol=1e-5)


def test_distillation_training_moves_student_toward_teacher_margins():
    """SGD on margin-MSE shrinks the teacher-student margin gap on a fixed batch."""
    import optax
    from vod_tpu.models.encoder import TransformerEncoderConfig
    from vod_tpu.models.systems import Ranker

    cfg = TransformerEncoderConfig(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=32, dtype=jnp.float32,
    )
    model = Ranker(cfg=cfg, gradients=DistillationGradients("margin_mse"))
    rng = np.random.default_rng(1)
    b, d, lq, ls = 2, 4, 6, 6
    teacher = rng.normal(size=(b, d)).astype(np.float32) * 3
    batch = RealmBatch(
        query__input_ids=jnp.asarray(rng.integers(5, 64, (b, lq)).astype("int32")),
        query__attention_mask=jnp.ones((b, lq), jnp.int32),
        section__input_ids=jnp.asarray(rng.integers(5, 64, (b * d, ls)).astype("int32")),
        section__attention_mask=jnp.ones((b * d, ls), jnp.int32),
        section__relevance=jnp.asarray((teacher == teacher.max(1, keepdims=True)).astype("float32")),
        section__idx=jnp.zeros((b, d), jnp.int32),
        section__score=jnp.zeros((b, d), jnp.float32),
        section__sparse=jnp.zeros((b, d), jnp.float32),
        section__teacher_score=jnp.asarray(teacher),
    )
    params = model.init(jax.random.PRNGKey(2), batch)["params"]
    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return model.apply({"params": p}, batch).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(30):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]
