from .blocks import PReLUConv, ConvBlock
from .score import ScoreNetwork
from .condition import ConditionerNetwork, MelAdapter
