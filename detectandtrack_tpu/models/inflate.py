"""2D → 3D weight inflation (paper arXiv:1712.09184 §3.1).

Reference parity: the inflation lives in the reference's weight-loading path
(`lib/utils/net.initialize_gpu_from_weights_file`, SURVEY.md §3.4): 2D k×k
conv kernels become t×k×k, replicated along time and divided by t so the 3D
model reproduces the 2D activations on a temporally-constant clip
("mean" init). "center" init instead puts the 2D kernel at the center time
step and zeros elsewhere (identity at initialization).

Here it is a pure pytree-to-pytree transform: walk the 2D and 3D parameter
trees together; any pair of conv kernels whose shapes differ only in the
leading (time) dimension gets inflated. Everything else must match exactly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _inflate_kernel(k2d: jnp.ndarray, t: int, mode: str) -> jnp.ndarray:
    """(1, kh, kw, ci, co) → (t, kh, kw, ci, co)."""
    if mode == "mean":
        return jnp.repeat(k2d, t, axis=0) / float(t)
    if mode == "center":
        out = jnp.zeros((t,) + k2d.shape[1:], k2d.dtype)
        return out.at[t // 2].set(k2d[0])
    raise ValueError(f"Unknown inflate mode {mode!r}")


def inflate_params(params_2d: Any, params_3d_template: Any,
                   mode: str = "mean", strict: bool = True) -> Any:
    """Map 2D params onto the 3D model's structure.

    `params_3d_template` supplies target shapes (e.g. from `model3d.init`).
    Conv kernels whose shapes differ only in the leading time dim are
    inflated; identical shapes are copied from the 2D model.

    `strict=False` matches the paper's fine-tuning recipe: parameters that
    cannot map (head fc layers sized by T, per-frame regressors, …) keep the
    template's fresh initialization instead of raising. Use
    `inflate_params_report` to see what was skipped.
    """
    params, skipped = _inflate(params_2d, params_3d_template, mode, strict)
    return params


def inflate_params_report(params_2d: Any, params_3d_template: Any,
                          mode: str = "mean"):
    """Non-strict inflation returning (params, skipped_param_names)."""
    return _inflate(params_2d, params_3d_template, mode, strict=False)


def _inflate(params_2d, params_3d_template, mode, strict):
    flat2, tree2 = jax.tree.flatten_with_path(params_2d)
    flat3, tree3 = jax.tree.flatten_with_path(params_3d_template)
    if tree2 != tree3:
        raise ValueError("2D and 3D parameter trees differ in structure; "
                         "inflation requires matching architectures")

    out = []
    skipped = []
    for (path2, v2), (path3, v3) in zip(flat2, flat3):
        if v2.shape == v3.shape:
            out.append(v2)
        elif (v2.ndim == 5 and v3.ndim == 5 and v2.shape[0] == 1
              and v2.shape[1:] == v3.shape[1:]):
            out.append(_inflate_kernel(v2, v3.shape[0], mode))
        else:
            name = jax.tree_util.keystr(path2)
            if strict:
                raise ValueError(
                    f"Cannot inflate {name}: {v2.shape} → {v3.shape}")
            skipped.append(name)
            out.append(v3)
    params = jax.tree.unflatten(jax.tree.structure(params_3d_template), out)
    return params, skipped
