"""Descriptor-model training (SSCD-style self-supervised fine-tuning)."""

from vsc2022_tpu.train.sscd_train import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    sscd_loss,
    train_shardings,
)
