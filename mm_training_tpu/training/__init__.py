from .ema import ema_update
from .loader import PrefetchLoader
from .optim import make_optimizer, multistep_schedule
from .train_step import (TrainState, create_train_state, make_eval_step,
                         make_predict_step, make_train_step, normalize_images,
                         depth_loss_fn)
from .trainer import Trainer, boxes_to_aimotive_dict
from .tta import tta_forward

__all__ = [
    'PrefetchLoader', 'TrainState', 'Trainer', 'boxes_to_aimotive_dict',
    'create_train_state', 'depth_loss_fn', 'ema_update',
    'make_eval_step', 'make_optimizer', 'make_predict_step', 'make_train_step',
    'multistep_schedule', 'normalize_images', 'tta_forward',
]
