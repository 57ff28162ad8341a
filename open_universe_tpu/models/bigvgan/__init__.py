from .discriminators import (
    DiscriminatorP,
    DiscriminatorR,
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
