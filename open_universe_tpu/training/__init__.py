from .schedules import linear_warmup_cosine_annealing
from .ema import EmaState, ema_init, ema_update
from .clipping import clip_by_global_norm_subtrees, AutoClipState, autoclip
from .gan_trainer import GanTrainState, GanTrainer, GanTrainConfig
from .universe_trainer import MdnTrainState, MdnTrainer, MdnTrainConfig
