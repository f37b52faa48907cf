"""Model layer (parity: reference `src/vod_models/`): flax encoders with VOD
pooling, Ranker/Realm systems, gradient estimators, retrieval metrics."""

from .pooler import VodPooler, VodPoolerConfig
from .encoder import TransformerEncoder, TransformerEncoderConfig, VodEncoder, DebugEncoder
from .lm import (
    CausalLM,
    CausalLMConfig,
    gpt2_config_from_hf,
    lm_generate,
    load_hf_causal_lm,
    port_gpt2_weights,
)
from .systems import Ranker, Realm
from .gradients import (
    DistillationGradients,
    Gradients,
    MarginalLikelihoodGradients,
    RetrievalGradients,
    VodGradients,
)
from .kbit import KbitParams, full_params, kbit_materialize, kbit_memory_bytes, kbit_prepare
from .monitoring import RetrievalMonitor, retrieval_metrics
from .seq2seq import Seq2SeqLM, Seq2SeqRealm, beam_generate, generate, port_t5_seq2seq_weights, realm_beam_generate, realm_generate
from .splade import SpladeEncoder, flops_loss, port_splade_weights, splade_topk_terms
from .cross_encoder import (
    CrossEncoder,
    cross_encoder_rerank,
    cross_encoder_scores,
    fill_teacher_scores,
    listwise_rerank_loss,
    port_bert_cross_encoder_weights,
    tokenize_pairs,
)

__all__ = [
    "CausalLM",
    "CausalLMConfig",
    "gpt2_config_from_hf",
    "lm_generate",
    "load_hf_causal_lm",
    "port_gpt2_weights",
    "DebugEncoder",
    "DistillationGradients",
    "Gradients",
    "cross_encoder_scores",
    "fill_teacher_scores",
    "KbitParams",
    "full_params",
    "kbit_materialize",
    "kbit_memory_bytes",
    "kbit_prepare",
    "MarginalLikelihoodGradients",
    "Ranker",
    "Realm",
    "RetrievalGradients",
    "RetrievalMonitor",
    "Seq2SeqLM",
    "SpladeEncoder",
    "flops_loss",
    "port_splade_weights",
    "splade_topk_terms",
    "beam_generate",
    "Seq2SeqRealm",
    "generate",
    "port_t5_seq2seq_weights",
    "realm_beam_generate",
    "realm_generate",
    "TransformerEncoder",
    "TransformerEncoderConfig",
    "VodEncoder",
    "VodGradients",
    "VodPooler",
    "VodPoolerConfig",
    "retrieval_metrics",
]
