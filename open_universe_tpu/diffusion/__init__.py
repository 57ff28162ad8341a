from .schedule import DiffusionConfig, get_std_dev, sampler_coefficients
from .sigma_sampling import sample_sigma
from .sampler import reverse_sde_sample
from .edm import EDMConfig, edm_weights, make_edm_score_fn
