"""Policy/value networks (Flax linen), TPU-first.

Topology matches the reference `BlockBlastNetwork`
(`/root/reference/src/models/network.py:33-271`): a residual CNN over the
(board + 3 piece-mask) planes, shared FC trunk, separate policy (192 logits)
and value heads, with action masking applied to the logits.  Differences are
deliberate TPU choices, not omissions:

  * NHWC layout (XLA's native conv layout on TPU) instead of NCHW;
  * configurable compute dtype (bfloat16 by default for MXU throughput,
    float32 parameters);
  * BatchNorm can synchronize batch statistics across the data-parallel mesh
    axis (`axis_name`) — the reference is single-device and has no notion of
    cross-replica BN;
  * optional GroupNorm swap for fully-deterministic rollouts.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# Kaiming-uniform with ReLU gain — the reference's initializer
# (`network.py:122-133`, torch `kaiming_uniform_(nonlinearity='relu')`).
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class _Norm(nn.Module):
    """BatchNorm (optionally cross-replica) or GroupNorm, behind one flag."""

    kind: str = "batch"        # 'batch' | 'group' | 'none'
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch momentum=0.1 ≡ flax momentum=0.9
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
            )(x)
        if self.kind == "group":
            return nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=self.dtype)(x)
        return x


class ResidualBlock(nn.Module):
    """conv3x3 -> norm -> relu -> conv3x3 -> norm -> +x -> relu
    (`network.py:14-30`)."""

    channels: int
    norm: str = "batch"
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_uniform)(x)
        y = _Norm(self.norm, self.axis_name, self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_uniform)(y)
        y = _Norm(self.norm, self.axis_name, self.dtype)(y, train)
        return nn.relu(y + residual)


class BlockBlastNetwork(nn.Module):
    """Shared-trunk policy/value net (`network.py:33-271`), ~5M params.

    Input: board [B, 8, 8] + pieces [B, 3, 8, 8] -> NHWC [B, 8, 8, 4].
    Output: (masked logits [B, 192], value [B]).
    """

    conv_channels: Sequence[int] = (64, 128, 128)
    fc_hidden: Sequence[int] = (512, 256)
    action_space_size: int = 192
    use_residual: bool = True
    norm: str = "batch"              # 'batch' | 'group' | 'none'
    dropout_rate: float = 0.1
    axis_name: Optional[str] = None  # mesh axis for cross-replica BN
    dtype: Any = jnp.bfloat16        # compute dtype (params stay f32)

    @nn.compact
    def __call__(
        self,
        board: jnp.ndarray,
        pieces: jnp.ndarray,
        action_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.concatenate(
            [board[..., None], jnp.transpose(pieces, (0, 2, 3, 1))], axis=-1
        ).astype(self.dtype)  # [B, 8, 8, 4]

        for i, ch in enumerate(self.conv_channels):
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=kaiming_uniform)(x)
            x = _Norm(self.norm, self.axis_name, self.dtype)(x, train)
            x = nn.relu(x)
            if self.use_residual and i > 0:
                x = ResidualBlock(ch, self.norm, self.axis_name, self.dtype)(x, train)

        x = x.reshape(x.shape[0], -1)  # [B, 128*64]
        for h in self.fc_hidden:
            x = nn.Dense(h, dtype=self.dtype, kernel_init=kaiming_uniform)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)

        p = nn.Dense(256, dtype=self.dtype, kernel_init=kaiming_uniform)(x)
        p = nn.relu(p)
        logits = nn.Dense(self.action_space_size, dtype=self.dtype,
                          kernel_init=kaiming_uniform)(p)

        v = nn.Dense(128, dtype=self.dtype, kernel_init=kaiming_uniform)(x)
        v = nn.relu(v)
        value = nn.Dense(1, dtype=self.dtype, kernel_init=kaiming_uniform)(v)[:, 0]

        logits = logits.astype(jnp.float32)
        value = value.astype(jnp.float32)
        if action_mask is not None:
            from .distributions import mask_logits
            logits = mask_logits(logits, action_mask)
        return logits, value


class ActorCritic(nn.Module):
    """Lighter separate-head variant (`network.py:274-420`), orthogonal init."""

    conv_channels: Sequence[int] = (32, 64, 64)
    fc_hidden: int = 256
    action_space_size: int = 192
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        board: jnp.ndarray,
        pieces: jnp.ndarray,
        action_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del train
        ortho = nn.initializers.orthogonal(scale=jnp.sqrt(2.0))
        x = jnp.concatenate(
            [board[..., None], jnp.transpose(pieces, (0, 2, 3, 1))], axis=-1
        ).astype(self.dtype)
        for ch in self.conv_channels:
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                                kernel_init=ortho)(x))
        x = x.reshape(x.shape[0], -1)

        a = nn.relu(nn.Dense(self.fc_hidden, dtype=self.dtype, kernel_init=ortho)(x))
        a = nn.relu(nn.Dense(self.fc_hidden, dtype=self.dtype, kernel_init=ortho)(a))
        logits = nn.Dense(self.action_space_size, dtype=self.dtype,
                          kernel_init=ortho)(a).astype(jnp.float32)

        c = nn.relu(nn.Dense(self.fc_hidden, dtype=self.dtype, kernel_init=ortho)(x))
        c = nn.relu(nn.Dense(self.fc_hidden, dtype=self.dtype, kernel_init=ortho)(c))
        value = nn.Dense(1, dtype=self.dtype, kernel_init=ortho)(c)[:, 0]
        value = value.astype(jnp.float32)

        if action_mask is not None:
            from .distributions import mask_logits
            logits = mask_logits(logits, action_mask)
        return logits, value


def count_parameters(params) -> int:
    """Total parameter count (`models/utils.py:27-37`)."""
    import jax
    return sum(x.size for x in jax.tree.leaves(params))
