"""Flax model definitions: SSCD (ResNet-50+GeM), DINO ViT-S/16, DnS students.

The reference executes pretrained TorchScript artifacts through libtorch
(reference: vsc/baseline/inference_impl.py:173). Here the architectures
are native Flax modules jit-compiled for TPU; published torch weights
are imported via ``vsc2022_tpu.models.convert``.
"""

from vsc2022_tpu.models.fold import fold_batchnorm  # noqa: F401
from vsc2022_tpu.models.resnet import ResNet50  # noqa: F401
from vsc2022_tpu.models.sscd import SSCDModel  # noqa: F401
from vsc2022_tpu.models.vit import DinoViT  # noqa: F401
