"""vod_tpu — a TPU-native framework for retrieval-augmented language model training.

Capabilities mirror the reference VodLM/vod framework (see SURVEY.md), re-designed
program-first for TPU: corpus embeddings and search indexes are sharded JAX arrays in
HBM; search, score merging, priority sampling, and the REALM objective run inside one
jitted / shard_map-ed XLA program.
"""

__version__ = "0.1.0"
