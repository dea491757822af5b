"""Training: jitted steps, LR schedules, trainer, checkpointing."""

from rigl_tpu.train.lr_schedules import (
    cifar_lr_schedule,
    constant_lr,
    imagenet_lr_schedule,
    mnist_lr_schedule,
    sgdr_schedule,
)
from rigl_tpu.train.steps import (
    cross_entropy_loss,
    init_train_state,
    l2_regularization,
    make_eval_step,
    make_train_step,
)
from rigl_tpu.train.train_state import TrainState
from rigl_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    build_algorithm,
    build_optimizer,
    simulate_step_sequence,
)

from rigl_tpu.train.checkpoint import (
    CheckpointManager,
    restore_masks_only,
    restore_params_only,
    shuffle_masks,
)
from rigl_tpu.train.eval_loop import evaluate_checkpoints
from rigl_tpu.train.export import export_model, load_for_inference
