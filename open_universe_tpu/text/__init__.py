from .tokenizer import CharTokenizer
from .encoder import TextEncoder
from .conditioner import (
    TextConditioner,
    CrossAttentionBlock,
    FiLMText,
    LatentFiLM,
    rope,
    downsample_pad_mask,
)
