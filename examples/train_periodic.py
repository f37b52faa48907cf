"""End-to-end periodic REALM training from a config dict.

Parity: the reference `train` CLI + `recipes/periodic_training.py` — train with
live retrieval, re-embedding + rebuilding the index between periods.

Run: python examples/train_periodic.py
"""

import os
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))

import jax

# honor an explicit JAX_PLATFORMS=cpu request: the axon TPU plugin's
# sitecustomize overrides jax_platforms to "axon,cpu", so the env var alone
# blocks forever on the relay when the chip is busy/down (round-3 finding)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from helpers import tiny_tokenizer

from vod_tpu.exps.cli import run_experiment
from vod_tpu.exps.structconf import Experiment

SECTIONS = []
QUERIES = []
_CITIES = ["paris", "tokyo", "berlin", "rome", "madrid", "london"]
_COUNTRIES = ["france", "japan", "germany", "italy", "spain", "england"]
for i in range(24):
    j = i % 6
    SECTIONS.append({"id": f"s{i}", "content": f"{_CITIES[j]} is the capital of {_COUNTRIES[j]} tok{i}",
                     "title": _COUNTRIES[j], "subset_id": None})
for i in range(48):
    j = i % 6
    QUERIES.append({"id": f"q{i}", "query": f"what is the capital of {_COUNTRIES[j]} tok{i % 24}",
                    "answers": [_CITIES[j]], "answer_scores": [1.0],
                    "retrieval_ids": [f"s{i % 24}"], "retrieval_scores": [1.0], "subset_ids": []})


def main() -> None:
    tok = tiny_tokenizer()
    exp = Experiment.parse({
        "model": {"kind": "ranker", "gradients": "retrieval", "vocab_size": tok.vocab_size,
                  "hidden_size": 32, "num_layers": 1, "num_heads": 2, "intermediate_size": 64,
                  "scaler": 8.0},
        "tokenizer": {"max_length": 24},
        "collate": {"prefetch_n_sections": 12, "n_sections": 4, "max_pos_sections": 1},
        "dataloader": {"batch_size": 8},
        "trainer": {"max_steps": 30, "period": 10, "log_interval": 5, "learning_rate": 3e-3,
                    "parameters": {"dense": {"mode": "constant", "value": 1.0},
                                   "sparse": {"mode": "linear", "start": 0.0, "value": 1.0, "period": 30}}},
    })
    out = run_experiment(
        exp, sections=SECTIONS, queries=QUERIES, val_queries=QUERIES[:8], tokenizer=tok,
        on_log=lambda s, m: print(f"  step {s}: " + ", ".join(f"{k}={v:.3f}" for k, v in m.items() if isinstance(v, float))),
    )
    print(f"\ncompleted {out['state'].step} steps over {len(out['history'])} periods")
    for h in out["history"]:
        print(f"  period {h['period']}: re-embed {h['embed_s']}s, total {h['period_s']}s")


if __name__ == "__main__":
    main()
