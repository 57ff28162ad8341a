"""TPU-friendly primitive ops (L4 of the layer map).

All ops use channels-last ``(batch, time, channels)`` layout so the channel
dimension maps onto the TPU lane dimension (128) and convolutions lower to
MXU matmuls. This deliberately differs from the reference's torch
``(batch, channels, time)`` layout (see SURVEY.md §2.2).
"""
from .conv import Conv1d, ConvTranspose1d, PReLU, prelu
from .film import film
from .antialias import binomial_filter, low_pass_filter, BinomialAntiAlias
from .activations import snake, SnakeAlias
from .gru import GRU, BiGRU
from .stft import frame_signal, stft, istft, mel_filterbank, melspectrogram, MelSpec
from .embeddings import SigmaBlock, SimpleTimeEmbedding
