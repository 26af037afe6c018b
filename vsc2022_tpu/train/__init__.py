"""Model training: SSCD-style self-supervised fine-tuning and DnS
student distillation."""

from vsc2022_tpu.train.sscd_train import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    sscd_loss,
    train_shardings,
)

from vsc2022_tpu.train.dns_distill import (  # noqa: F401
    DistillState,
    build_student_module,
    create_distill_state,
    make_distill_step,
    student_pair_similarity,
)
