"""Model networks (L3): UNIVERSE score/conditioner nets + GAN discriminators."""
from .universe.score import ScoreNetwork
from .universe.condition import ConditionerNetwork
from .bigvgan.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
