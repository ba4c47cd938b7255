from tdnet_tpu.train.loss import (cross_entropy, kl_divergence, make_loss_fn,
                                  ohem_cross_entropy)
from tdnet_tpu.train.metrics import AverageMeter, RunningScore
from tdnet_tpu.train.optim import ada_optimizer, get_optimizer
from tdnet_tpu.train.schedulers import get_scheduler
from tdnet_tpu.train.trainer import (make_eval_step, make_train_state,
                                     make_train_step)
