from .gan import discriminator_loss, feature_loss, generator_loss
from .mdn import MixtureDensityNetworkLoss
from .multires_stft import MultiResL1SpecLoss
from .combine import MultiLoss
from .sisdr import si_sdr_loss
from .ssl_feature import SSLFeatureLoss
