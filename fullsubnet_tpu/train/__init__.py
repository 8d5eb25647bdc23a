from fullsubnet_tpu.train.loss import LOSS_REGISTRY, mse_loss, l1_loss, si_snr_loss
from fullsubnet_tpu.train.trainer import Trainer
