from .state import TrainState, GanState, create_train_state, merge_state
from .losses import bce, mse
from .r_loop import (calibrate_batchnorm, make_r_eval_step,
                     make_r_segment_program, make_r_train_step)
from .adversarial import (Confusion, Y_GENERATOR, Y_NOT_GENERATOR,
                          make_adversarial_steps, make_epoch_program,
                          train_epoch)
from .pretrain_ae import (decoder_variables, make_ae_train_step,
                          make_autoencoder)
from .pretrain_distill import (make_distill_d_step, make_distill_g_step,
                               paired_noise)
