"""Dataset postprocessing: sectioning maps, subsampling, concatenation.

Parity: reference `vod_datasets/postprocessing.py` (`_extract_sections:62`,
`_take_subset:92`, `combine_datasets:104`).
"""

from __future__ import annotations

import typing as typ

from .sectioning import FixedLengthSectionizer, SentenceSectionizer


def make_sectionizer(cfg: typ.Mapping[str, typ.Any]) -> typ.Callable[[str, str], list[str]]:
    mode = cfg.get("mode", "fixed_length")
    if mode == "sentence":
        return SentenceSectionizer(delimiter=cfg.get("delimiter", ". "))
    if mode == "fixed_length":
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(
            cfg.get("tokenizer_name_or_path", "bert-base-uncased")
        )
        return FixedLengthSectionizer(
            tok,
            section_length=cfg.get("section_length", 200),
            stride=cfg.get("stride"),
            ellipsis_start=cfg.get("ellipsis_start", "(...) "),
            ellipsis_end=cfg.get("ellipsis_end", " (...)"),
        )
    raise ValueError(f"Unknown sectioning mode {mode}")


def extract_sections(ds: typ.Any, sectioning_cfg: typ.Mapping[str, typ.Any]) -> typ.Any:
    """Explode each section row into its chunks (parity: `_extract_sections:62`)."""
    sectionize = make_sectionizer(sectioning_cfg)

    def explode(batch: dict[str, list]) -> dict[str, list]:
        out: dict[str, list] = {k: [] for k in batch}
        n = len(batch["content"])
        for i in range(n):
            pieces = sectionize(batch["content"][i], "")
            for j, piece in enumerate(pieces):
                for k in batch:
                    if k == "content":
                        out[k].append(piece)
                    elif k == "id":
                        out[k].append(f"{batch['id'][i]}#{j}" if len(pieces) > 1 else batch["id"][i])
                    else:
                        out[k].append(batch[k][i])
        return out

    return ds.map(explode, batched=True, desc="sectioning")


def combine_datasets(parts: typ.Sequence[typ.Any]) -> typ.Any:
    """Concatenate HF datasets (parity: `combine_datasets:104`)."""
    import datasets as hf_datasets

    parts = list(parts)
    if len(parts) == 1:
        return parts[0]
    return hf_datasets.concatenate_datasets(parts)
