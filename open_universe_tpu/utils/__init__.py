from .norm import normalize_batch, denormalize_batch
from .random import center_truncated_normal
from .stats import signal_median
from .params import count_parameters
