"""Toy-2D MLP (Flax) with the reference's normalisation menu.

Reference: toy2d_train.py:83-122 — n_hidden x (Linear [+ norm] + ReLU/LeakyReLU),
dropout(0.5) before the final 2-class linear layer; norm options none /
batch_norm / group_norm / weight_norm / spectral_norm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn


class ToyMLP(nn.Module):
    n_hidden: int = 3
    hidden_size: int = 512
    hidden_act: str = "relu"
    norm_layer: str = "batch_norm"

    @nn.compact
    def __call__(self, x, train: bool, use_dropout: bool = True):
        for i in range(self.n_hidden):
            dense = nn.Dense(self.hidden_size, name=f"dense{i}")
            if self.norm_layer == "spectral_norm":
                x = nn.SpectralNorm(dense)(x, update_stats=train)
            elif self.norm_layer == "weight_norm":
                x = nn.WeightNorm(dense)(x)
            else:
                x = dense(x)
            if self.norm_layer == "batch_norm":
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f"bn{i}")(x)
            elif self.norm_layer == "group_norm":
                x = nn.GroupNorm(num_groups=4, name=f"gn{i}")(x)
            if self.hidden_act == "relu":
                x = nn.relu(x)
            elif self.hidden_act == "lrelu":
                x = nn.leaky_relu(x, negative_slope=0.01)
            else:
                raise ValueError(self.hidden_act)
        if use_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(2, name="final")(x)
