"""Training harness (≙ reference training/: Hydra + Lightning).

Config tree -> Trainer -> jitted train step over a jax Mesh, with a native
C++ memmap data loader, fault-tolerant exact resume, speed/FLOPs monitors,
and ZeRO-1-style sharded optimizer state.
"""

from .config import TrainConfig, load_config
from .data import LMDataModule, TokenDataset, build_token_cache
from .train import Trainer, train
