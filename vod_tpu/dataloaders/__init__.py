"""Host-side dataloaders (parity: reference `src/vod_dataloaders/`): batch
iteration over query shards feeding the device-fused collate."""

from .realm_dataloader import RealmDataloader
from .samplers import dl_sampler_factory
from .tokenizer_collate import TokenizerCollate

__all__ = ["RealmDataloader", "TokenizerCollate", "dl_sampler_factory"]
