"""Training stack: optax optimizer with texture param group, multistep+warmup
scheduler, jitted train step, host driver."""

from .optimizer import create_optimizer, param_group_labels
from .scheduler import create_scheduler, MultiStepLR
from .checkpoint import save_checkpoint, load_checkpoint
from .trainer import Trainer
