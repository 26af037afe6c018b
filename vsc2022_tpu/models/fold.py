"""Inference-time BatchNorm folding for the ResNet-family models.

At inference a BatchNorm is the affine ``y = (x − μ)·γ/√(σ²+ε) + β``;
because every BN in the trunk directly follows a bias-free conv, the
whole affine folds into that conv:

    W' = W · γ/√(σ²+ε)        (per output channel)
    b' = β − μ·γ/√(σ²+ε)

removing the BN ops from the compiled graph entirely. Measured on the
v5e: the BN elementwise passes cost ~6-8% of the bf16 b512 SSCD forward
even under XLA fusion (tools/profile_inference.py), so folding is the
cheapest remaining inference win after bf16 + batch sizing.

Usage::

    model  = SSCDModel(fold_bn=True)          # BN layers become no-ops
    folded = fold_batchnorm(variables)        # transform the params

The reference never folds — it runs the TorchScript artifact as
serialized (reference: vsc/baseline/inference_impl.py:173); folding is
a deployment optimization this framework adds. Fold math runs in
float64 on host and lands back in the parameters' dtype, so folded
outputs match unfolded ones to float32 roundoff (pinned by
tests/test_models.py).
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np


def _bn_partner(conv_name: str) -> Optional[str]:
    """BatchNorm module name paired with a conv, by trunk convention."""
    if conv_name == "downsample_conv":
        return "downsample_bn"
    if conv_name.startswith("conv"):
        return "bn" + conv_name[len("conv"):]
    return None


def fold_batchnorm(variables: Mapping, eps: float = 1e-5) -> dict:
    """Fold every (conv, BatchNorm) pair in ``variables`` into the conv.

    Returns a new variables dict with conv kernels rescaled, conv
    biases added, BN params removed, and the ``batch_stats`` collection
    dropped — the shape the ``fold_bn=True`` models expect. Raises if a
    BN has no preceding conv to absorb it (nothing in the ResNet trunk
    does). ``eps`` must match the model's BatchNorm epsilon.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    folded = _fold_level(params, stats, eps)
    out = {k: v for k, v in variables.items()
           if k not in ("params", "batch_stats")}
    out["params"] = folded
    return out


def _is_bn(sub) -> bool:
    return isinstance(sub, Mapping) and "scale" in sub and "kernel" not in sub


def _fold_level(params: Mapping, stats: Mapping, eps: float) -> dict:
    consumed = set()
    out = {}
    for name, sub in params.items():
        if not isinstance(sub, Mapping):
            out[name] = sub
            continue
        bn_name = _bn_partner(name) if "kernel" in sub else None
        if bn_name is not None and bn_name in params:
            bn_p = params[bn_name]
            bn_s = stats.get(bn_name, {})
            gamma = np.asarray(bn_p["scale"], np.float64)
            beta = np.asarray(bn_p["bias"], np.float64)
            mean = np.asarray(bn_s["mean"], np.float64)
            var = np.asarray(bn_s["var"], np.float64)
            scale = gamma / np.sqrt(var + eps)
            kernel = np.asarray(sub["kernel"])
            out[name] = {
                # Conv kernels are HWIO / dense kernels IO: the output
                # channel is the last axis either way, so a trailing-
                # axis broadcast rescales per channel.
                "kernel": (np.asarray(kernel, np.float64) * scale).astype(
                    kernel.dtype
                ),
                "bias": (beta - mean * scale).astype(kernel.dtype),
            }
            consumed.add(bn_name)
        elif "kernel" in sub or not any(
            isinstance(v, Mapping) for v in sub.values()
        ):
            out[name] = sub  # leaf module without a BN partner
        else:
            out[name] = _fold_level(sub, stats.get(name, {}), eps)
    leftover = [
        n for n, sub in params.items() if _is_bn(sub) and n not in consumed
    ]
    if leftover:
        raise ValueError(
            f"BatchNorm without a foldable preceding conv: {sorted(leftover)}"
        )
    return {k: v for k, v in out.items() if k not in consumed}


def s2d_stem(variables: Mapping) -> dict:
    """Transform the stem conv kernel for the space-to-depth stem
    (``stem_s2d=True`` models): the 7×7/2 3-channel kernel becomes the
    exact VALID 4×4/1 12-channel kernel over the 2×2 space-to-depth
    input (the MLPerf ResNet TPU transform).

    Derivation: with the input padding shifted 3 → 4 (even grid), the
    kernel zero-pads 7 → 8 at the leading edge, and
    ``W2[a, b, (r, s, c), f] = Wpad[2a + r, 2b + s, c, f]`` — the
    channel order (r, s, c) matching the space-to-depth reshape in the
    model. Pure relabeling of the same products, so outputs match the
    standard stem to f32 reassociation roundoff. Composes with
    ``fold_batchnorm`` in either order (the bias is per-output-channel
    and untouched here).
    """

    def walk(level):
        out = {}
        for name, sub in level.items():
            if not isinstance(sub, Mapping):
                out[name] = sub
                continue
            if name == "conv1" and "kernel" in sub and np.asarray(
                sub["kernel"]
            ).shape[:2] == (7, 7):
                w = np.asarray(sub["kernel"])
                c, f = w.shape[2], w.shape[3]
                wpad = np.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
                w2 = wpad.reshape(4, 2, 4, 2, c, f)
                w2 = w2.transpose(0, 2, 1, 3, 4, 5)
                w2 = np.ascontiguousarray(
                    w2.reshape(4, 4, 4 * c, f), dtype=w.dtype
                )
                out[name] = {
                    k: (w2 if k == "kernel" else v)
                    for k, v in sub.items()
                }
            else:
                out[name] = walk(sub)
        return out

    return {
        k: (walk(v) if k == "params" else v) for k, v in variables.items()
    }
