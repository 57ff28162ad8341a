from .lsd import log_spectral_distance
from .sisdr import si_sdr, sdr
from .stoi import stoi
from .eval import EvalMetrics
from .wer import wer, word_edit_distance
from .wrapper import Metrics
