from .losses import (mse_loss, kl_divergence_loss, laplacian_loss,
                     latent_consistency_loss, weighted_cross_entropy,
                     region_feature_mask)
from .trainer import (LossWeights, TrainState, create_train_state,
                      make_train_step, make_scanned_train_step,
                      make_scanned_train_epochs, make_eval_step,
                      LOSS_KEYS, coupled_adam, assemble_epoch_plans)
from .torch_import import (import_reference_checkpoint,
                           export_reference_checkpoint,
                           import_reference_mlp,
                           import_reference_optimizer,
                           export_reference_optimizer)
