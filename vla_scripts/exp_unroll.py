"""Round-3 experiment: does FULL scan unroll help the Llama prefill like it
does the ViTs? (exp_vit_ablation.py: ViT pair 10.2 -> 6.5 ms at unroll=FULL;
partial unroll=2/4 HURTS both stacks — only eliminating the loop entirely lets
XLA schedule across layers.)

Also times compilation, since full unroll trades compile time for latency.

Usage: python vla_scripts/exp_unroll.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


from vla_scripts.bench_timing import measure


def _measure(fn, args, k, label):
    ms, compile_s = measure(fn, args, k)
    print(f"{label:44s} {ms:8.2f} ms   (compile {compile_s:5.1f} s)",
          flush=True)
    return ms


def main():
    from __graft_entry__ import _cheap_params, _flagship_cfg
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.llama import llama_model

    cfg = _flagship_cfg()
    params = _cheap_params(cfg, LIBERO)
    rng = np.random.default_rng(0)
    k = 20

    s = 48 + 512 + 1 + LIBERO.chunk_len + 1
    embeds = jnp.asarray(rng.normal(0, 1, (1, s, cfg.llm_dim)), jnp.bfloat16)
    bidir = jnp.zeros((1, s), bool).at[:, -(LIBERO.chunk_len + 1):].set(True)

    _measure(lambda p, e: llama_model(p, cfg.llm, e, bidir_mask=bidir),
             (params["llm"], embeds), k, f"llama prefill u=1 (S={s})")
    _measure(lambda p, e: llama_model(p, cfg.llm, e, bidir_mask=bidir,
                                      unroll=cfg.llm.num_layers),
             (params["llm"], embeds), k, f"llama prefill u=FULL (S={s})")


if __name__ == "__main__":
    main()
