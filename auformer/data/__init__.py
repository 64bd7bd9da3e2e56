from .framestore import FrameStore, FrameStoreWriter, open_store
from .samplers import (DataLoader, Prefetcher, SubsetRandomSampler,
                       SubsetSequentialSampler, BlockShuffleSampler,
                       collate, shard_indices)
from .dataset import Aff2CompDataset
from .testset import Aff2TestDataset
from .split import create_dataset_split
from .wav_arena import WavArena, build_wav_arena

__all__ = [
    "FrameStore", "FrameStoreWriter", "open_store",
    "DataLoader", "Prefetcher", "SubsetRandomSampler",
    "SubsetSequentialSampler", "BlockShuffleSampler", "collate",
    "shard_indices",
    "Aff2CompDataset", "Aff2TestDataset", "create_dataset_split",
    "WavArena", "build_wav_arena",
]
