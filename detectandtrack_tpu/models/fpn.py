"""Feature Pyramid Network on (B, T, H, W, C) activations.

Reference parity: `lib/modeling/FPN.py` (SURVEY.md §2.1): 1x1 laterals,
nearest top-down upsampling, 3x3 posthoc convs, and a stride-64 P6 via
max-pool for RPN. The reference needed a custom CUDA `UpsampleNearest` op;
here nearest upsample is a reshape-broadcast that XLA fuses.

Applied per frame (t=1 convs), so the same module serves 2D and 3D models.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .backbone import Conv3d


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) → (B, T, 2H, 2W, C) nearest (reshape-broadcast)."""
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :],
                         (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """{res2..res5} → {p2..p6}; every level has `dim` channels.

    `extra_conv_levels` swaps the max-pool P6 for a stride-2 3x3 conv on
    P5 (lineage FPN.EXTRA_CONV_LEVELS, RetinaNet-style);
    `zero_init_lateral` zero-initializes the lateral 1x1s
    (FPN.ZERO_INIT_LATERAL) so training starts from the top-down pathway.
    """

    dim: int = 256
    use_p6: bool = True
    zero_init_lateral: bool = False
    extra_conv_levels: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["res2", "res3", "res4", "res5"]          # strides 4..32
        lat_init = (nn.initializers.zeros if self.zero_init_lateral
                    else None)
        laterals = []
        for n in names:
            laterals.append(Conv3d(self.dim, (1, 1, 1), use_bias=True,
                                   dtype=self.dtype, kernel_init=lat_init,
                                   name=f"lateral_{n}")(feats[n]))
        # Top-down pathway.
        td = laterals[-1]
        outs = {"p5": td}
        for i in range(len(names) - 2, -1, -1):
            td = laterals[i] + upsample_nearest_2x(td)
            outs[f"p{i + 2}"] = td
        # Posthoc 3x3 smoothing.
        for lvl in ["p2", "p3", "p4", "p5"]:
            outs[lvl] = Conv3d(self.dim, (1, 3, 3), use_bias=True,
                               dtype=self.dtype,
                               name=f"posthoc_{lvl}")(outs[lvl])
        if self.use_p6:
            if self.extra_conv_levels:
                outs["p6"] = Conv3d(self.dim, (1, 3, 3),
                                    strides=(1, 2, 2), use_bias=True,
                                    dtype=self.dtype,
                                    name="extra_p6")(outs["p5"])
            else:
                outs["p6"] = nn.max_pool(outs["p5"], (1, 1, 1),
                                         strides=(1, 2, 2), padding="VALID")
        return outs
