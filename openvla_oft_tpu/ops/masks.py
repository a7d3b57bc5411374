"""Action-token masks and the OFT block-bidirectional attention mask.

The label->mask semantics exactly mirror the reference's cumsum construction
(`prismatic/training/train_utils.py:8-39`): positions whose label is not
IGNORE_INDEX are counted left-to-right; counts 1..ACTION_DIM are the *current*
action, counts > ACTION_DIM are the *next* actions; both intersected with
"token id is an action-bin token" (id > ACTION_TOKEN_BEGIN_IDX).

The attention-mask builder reproduces the behavior of the reference's
transformers fork (`moojink/transformers-openvla-oft`, pyproject.toml:52 and
`modeling_prismatic.py:742`): causal attention everywhere, except that
action-chunk positions attend to each other bidirectionally, enabling the whole
chunk to be decoded in one prefill.
"""

from __future__ import annotations

import jax.numpy as jnp

from openvla_oft_tpu.constants import ACTION_TOKEN_BEGIN_IDX, IGNORE_INDEX


def get_current_action_mask(token_ids: jnp.ndarray, action_dim: int) -> jnp.ndarray:
    """Mask of the first `action_dim` action tokens (the current action).

    token_ids: (B, S) label ids (IGNORE_INDEX outside the supervised tail).
    Reference: train_utils.py:8-22.
    """
    counted = (token_ids != IGNORE_INDEX).astype(jnp.int32)
    cumsum = jnp.cumsum(counted, axis=-1)
    in_window = (cumsum >= 1) & (cumsum <= action_dim)
    return in_window & (token_ids > ACTION_TOKEN_BEGIN_IDX)


def get_next_actions_mask(token_ids: jnp.ndarray, action_dim: int) -> jnp.ndarray:
    """Mask of all action tokens after the current action. Reference: train_utils.py:25-39."""
    counted = (token_ids != IGNORE_INDEX).astype(jnp.int32)
    cumsum = jnp.cumsum(counted, axis=-1)
    return (cumsum > action_dim) & (token_ids > ACTION_TOKEN_BEGIN_IDX)


def get_all_actions_mask(token_ids: jnp.ndarray, action_dim: int) -> jnp.ndarray:
    """Union of current+next action masks (reference `_process_action_masks`,
    modeling_prismatic.py:432-436)."""
    return get_current_action_mask(token_ids, action_dim) | get_next_actions_mask(
        token_ids, action_dim
    )


def make_block_bidirectional_mask(
    padding_mask: jnp.ndarray, bidir_mask: jnp.ndarray
) -> jnp.ndarray:
    """Build a (B, S, S) boolean attention mask: causal + bidirectional block.

    Args:
      padding_mask: (B, S) bool — True for real (non-pad) tokens.
      bidir_mask:   (B, S) bool — True for positions inside the action-chunk
        block. Query i may attend key j iff j <= i (causal) OR both i and j are
        in the block — and j is not padding.

    Returns a boolean mask where True = "may attend".
    """
    s = padding_mask.shape[-1]
    causal = jnp.tril(jnp.ones((s, s), dtype=bool))
    block = bidir_mask[:, :, None] & bidir_mask[:, None, :]
    return (causal[None] | block) & padding_mask[:, None, :]


def make_prefix_positions(padding_mask: jnp.ndarray) -> jnp.ndarray:
    """Position ids = index within the non-padded prefix (right padding)."""
    return jnp.cumsum(padding_mask.astype(jnp.int32), axis=-1) - 1
