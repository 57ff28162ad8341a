from .wavio import read_wav, write_wav, wav_info
from .dataset import NoisyDataset
from .batching import make_buckets, BucketBatcher
from .datamodule import DataModule
