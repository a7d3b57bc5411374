"""OpenVLA eval/policy API — signature-compatible with the reference
`experiments/robot/openvla_utils.py` (get_vla :253, get_processor :380,
get_proprio_projector :393, get_noisy_action_projector :437, get_action_head
:463, get_vla_action :711, get_action_from_server :799), implemented on the
TPU-native stack.

`get_vla` loads an HF-format checkpoint dir into an `OpenVLAPolicy`;
`get_action_head`/`get_*_projector` import the reference's per-module
`{name}--{step}_checkpoint.pt` files; `get_vla_action` reproduces the image
conditioning (JPEG round trip -> lanczos3 resize -> optional 0.9 center crop),
prompt format, proprio normalization, and open-loop slicing.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from openvla_oft_tpu.constants import PlatformSpec, detect_robot_platform
from openvla_oft_tpu.data.transforms import normalize as _normalize_stats
from openvla_oft_tpu.policy import OpenVLAPolicy, init_openvla_params
from openvla_oft_tpu.processing.image_processing import prepare_images_for_policy
from openvla_oft_tpu.processing.processor import (
    FakeLlamaTokenizer,
    PrismaticProcessor,
    build_prompt,
)
from openvla_oft_tpu.serving.server import get_action_from_server  # noqa: F401
from openvla_oft_tpu.training.checkpoint import (
    find_checkpoint_file,
    import_action_head_pt,
    import_projector_pt,
)

OPENVLA_IMAGE_SIZE = 224


def update_auto_map(pretrained_checkpoint: str) -> None:
    """Compat no-op. The reference rewrites `auto_map` entries in checkpoint
    config.json so HF AutoClasses import the *local* model source
    (openvla_utils.py:56-96). This framework's checkpoints carry no Python
    code, so there is nothing to rewrite."""


def check_model_logic_mismatch(pretrained_checkpoint: str) -> None:
    """Compat no-op. The reference copies the current `modeling_prismatic.py`
    over the checkpoint's with timestamped backups (openvla_utils.py:168-198)
    — versioning-by-copy. Model logic here lives only in the installed
    package; checkpoints are pure weights + config."""


def model_is_on_hf_hub(model_path: str) -> bool:
    """Reference `model_is_on_hf_hub` (openvla_utils.py:49-53): True when the
    path is a hub id rather than a local directory."""
    return not os.path.isdir(str(model_path))


def _platform_from_cfg(cfg: Any) -> PlatformSpec:
    hint = " ".join(str(getattr(cfg, k, "")) for k in
                    ("pretrained_checkpoint", "task_suite_name", "unnorm_key",
                     "dataset_name"))
    return detect_robot_platform(hint or "libero")


def get_vla(cfg: Any) -> OpenVLAPolicy:
    """Load the OpenVLA policy from `cfg.pretrained_checkpoint`
    (reference openvla_utils.py:253-377)."""
    import jax
    import jax.numpy as jnp

    from openvla_oft_tpu.utils.hf_import import load_openvla_checkpoint

    platform = _platform_from_cfg(cfg)
    ckpt = str(cfg.pretrained_checkpoint)
    head = ("l1" if getattr(cfg, "use_l1_regression", True) else
            "diffusion" if getattr(cfg, "use_diffusion", False) else "discrete")
    if ckpt.startswith("random:"):
        from openvla_oft_tpu.config import OpenVLAConfig

        if ckpt == "random:tiny":
            import openvla_oft_tpu.config as C
            from openvla_oft_tpu.config import (
                TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP)

            C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
            C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
            model_cfg = OpenVLAConfig(
                vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama",
                num_images_in_input=getattr(cfg, "num_images_in_input", 1),
                use_film=getattr(cfg, "use_film", False))
        else:
            model_cfg = OpenVLAConfig(
                num_images_in_input=getattr(cfg, "num_images_in_input", 1),
                use_film=getattr(cfg, "use_film", False))
        if os.environ.get("OPENVLA_ZERO_INIT", "0") == "1":
            # Latency-bench aid: materialize the flagship SHAPES as zeros
            # via eval_shape (no host RNG, no 13.5 GB random materialization
            # — same trick as __graft_entry__._cheap_params). Latency is
            # value-independent; accuracy paths must not set this.
            shapes = jax.eval_shape(lambda: init_openvla_params(
                jax.random.PRNGKey(0), model_cfg, platform,
                dtype=jnp.bfloat16,
                head=head if head != "discrete" else None,
                with_lm_head=(head == "discrete")))
            params = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        else:
            params = init_openvla_params(
                jax.random.PRNGKey(0), model_cfg, platform,
                dtype=jnp.bfloat16,
                head=head if head != "discrete" else None,
                with_lm_head=(head == "discrete"))
        norm_stats = None
        if os.environ.get("OPENVLA_FAKE_NORM_STATS", "0") == "1":
            # Bench/smoke aid: identity-bounds statistics under the key
            # "{platform}_bench" so the FULL serving path — including
            # un-normalization and proprio normalization — runs against a
            # random: checkpoint (vla_scripts/bench_deploy.py). Real
            # checkpoints always carry their own stats; this never
            # engages for them.
            dim, pdim = platform.action_dim, platform.proprio_dim
            ones = [1.0] * dim
            norm_stats = {f"{platform.name}_bench": {
                "action": {"q01": [-1.0] * dim, "q99": ones,
                           "min": [-1.0] * dim, "max": ones,
                           "mask": [True] * (dim - 1) + [False]},
                "proprio": {"q01": [-1.0] * pdim, "q99": [1.0] * pdim,
                            "min": [-1.0] * pdim, "max": [1.0] * pdim},
            }}
    else:
        if not os.path.isdir(ckpt):
            # Hub-id checkpoint (reference model_is_on_hf_hub +
            # from_pretrained download, openvla_utils.py:270-303): resolve
            # through the registry's snapshot-download hook.
            from openvla_oft_tpu.models.registry import _resolve_checkpoint_dir

            ckpt = _resolve_checkpoint_dir(ckpt, None)
        model_cfg, params, norm_stats = load_openvla_checkpoint(
            ckpt, dtype=jnp.bfloat16)
        import dataclasses

        model_cfg = dataclasses.replace(
            model_cfg,
            num_images_in_input=getattr(cfg, "num_images_in_input", 1),
            use_film=getattr(cfg, "use_film", False))

    # FiLM: the reference fine-tune saves the whole FiLMed vision backbone as
    # `vision_backbone--{step}_checkpoint.pt` and reloads it at eval
    # (`_apply_film_to_vla`, openvla_utils.py:311-349).
    if getattr(cfg, "use_film", False) and os.path.isdir(ckpt):
        # LOUD, like the reference (_apply_film_to_vla's find_checkpoint_file
        # assert is uncaught): silently falling back to the un-FiLMed base
        # backbone would produce plausible-but-wrong actions for a
        # FiLM-trained policy.
        from openvla_oft_tpu.training.checkpoint import (
            import_film_vision_backbone_pt)

        vb_path = find_checkpoint_file(ckpt, "vision_backbone")
        backbone, film = import_film_vision_backbone_pt(vb_path, model_cfg)
        params["vision_backbone"] = backbone
        params["film"] = film

    # Serving-path weight fusion (wqkv/gate_up): one matmul + one
    # quant/dequant epilogue per projection group, numerics-exact
    # (models/llama.py::fuse_inference_weights). Opt out with fuse_weights
    # attr for checkpoint-structure round trips.
    if getattr(cfg, "fuse_weights", True):
        from openvla_oft_tpu.models.llama import fuse_inference_weights
        from openvla_oft_tpu.models.vit import fuse_vit_inference_weights

        # RMSNorm folds only for full-precision serving: under int8/int4 the
        # fold scales kernel rows and coarsens per-output-channel quant grids
        # (concat-only fusion is quantization-exact; docs/QUANTIZATION.md).
        # The mixed int8-vision config keeps the LLM bf16 -> folds stay on.
        params["llm"] = fuse_inference_weights(
            params["llm"],
            fold_norms=not (getattr(cfg, "load_in_8bit", False)
                            or getattr(cfg, "load_in_4bit", False)))
        # ViT epilogue folding, matching the bench configs exactly
        # (__graft_entry__._cheap_params): LN affine -> qkv/fc1 only when the
        # vision stays full-precision; LayerScale -> proj/fc2 always
        # (quantization-exact). Without this, a deployment would run an
        # unfused, slower ViT than the one the bench numbers describe.
        vit_int8 = (getattr(cfg, "load_in_8bit", False)
                    or getattr(cfg, "load_vision_in_8bit", False))
        params["vision_backbone"] = {
            name: fuse_vit_inference_weights(v, fold_norms=not vit_int8)
            for name, v in params["vision_backbone"].items()}
        # OPT-IN (set joint_vit=True): both backbones as ONE G=2 padded
        # batched-GEMM program (models/vit_joint.py). Round-3 measurement
        # flipped this to opt-in in EVERY dtype: the fully-unrolled
        # sequential pair beats it (bf16 6.4 vs 9.3 ms standalone, 55.2 vs
        # 58.3 ms headline; int8 36.2 vs 38.1 ms headline — the 1024->1152
        # pad FLOPs and grouped-LN masking cost more than the batched GEMM
        # saves at serving M; docs/PERFORMANCE.md). FiLM needs per-block
        # modulation (unsupported in the joint layout). int8's opt-in flag is
        # joint_vit_int8 (built from the unfolded-norm trees, quantized AFTER
        # the joint build so the grids match per-backbone).
        want_joint = (getattr(cfg, "joint_vit_int8", False) if vit_int8
                      else getattr(cfg, "joint_vit", False))
        if (not getattr(cfg, "load_in_4bit", False)
                and not getattr(cfg, "use_film", False)
                and len(params["vision_backbone"]) == 2
                and want_joint):
            from openvla_oft_tpu.models.vit_joint import (
                build_joint_vit_pair,
                quantize_joint_vit,
            )

            joint = build_joint_vit_pair(params["vision_backbone"],
                                         model_cfg.vision_configs)
            if vit_int8:
                joint = quantize_joint_vit(joint)
            params["vision_backbone"] = {"joint": joint}

    # Quantized inference (reference load_in_8bit/4bit via bitsandbytes,
    # openvla_utils.py:282-303 — here the TPU int8 MXU / packed-int4 paths).
    # int8 quantizes leaf-by-leaf with DONATED source kernels
    # (quantize_tree_lowmem): a real 7B's bf16 tree (~15 GB) and its int8
    # copy cannot coexist in 16 GB HBM — plain quantize_tree would OOM here.
    vit_joint_q8 = ("joint" in params["vision_backbone"]
                    and str(params["vision_backbone"]["joint"]["layers"][
                        "qkv_k"].dtype) == "int8")
    if getattr(cfg, "load_in_8bit", False):
        from openvla_oft_tpu.ops.quant import quantize_tree_lowmem

        for mod in ("llm", "vision_backbone", "projector"):
            if mod in params and not (mod == "vision_backbone" and vit_joint_q8):
                params[mod] = quantize_tree_lowmem(params[mod], min_dim=1024)
    elif getattr(cfg, "load_in_4bit", False):
        from openvla_oft_tpu.ops.quant import quantize_tree

        params["llm"] = quantize_tree(params["llm"], min_dim=1024, bits=4)
    elif getattr(cfg, "load_vision_in_8bit", False):
        # TPU extra (no reference analog): int8 vision + projector, bf16 LLM
        # — the ViT pair is the low-MFU stage of the bf16 path, so this takes
        # the int8 MXU win where utilization is worst while keeping full LLM
        # numerics parity. Same config as OPENVLA_QUANT=int8_vit in bench.
        from openvla_oft_tpu.ops.quant import quantize_tree_lowmem

        for mod in ("vision_backbone", "projector"):
            if mod in params and not (mod == "vision_backbone" and vit_joint_q8):
                params[mod] = quantize_tree_lowmem(params[mod], min_dim=1024)

    tokenizer = _try_tokenizer(ckpt)
    return OpenVLAPolicy(
        cfg=model_cfg, platform=platform, params=params, norm_stats=norm_stats,
        head=head, tokenizer=tokenizer,
        num_diffusion_steps=getattr(cfg, "num_diffusion_steps", 50),
        num_diffusion_steps_inference=getattr(
            cfg, "num_diffusion_steps_inference", None))


def _try_tokenizer(ckpt: str):
    """Load the checkpoint's Llama tokenizer — loudly.

    A real checkpoint with broken/missing tokenizer assets raises instead of
    silently substituting the test stand-in (a fake tokenizer would produce
    garbage actions with no error). The stand-in is allowed only for
    synthetic "random:" checkpoints or with OPENVLA_ALLOW_FAKE_TOKENIZER=1
    (tests/benchmarks)."""
    has_assets = os.path.isdir(ckpt) and any(
        os.path.exists(os.path.join(ckpt, f))
        for f in ("tokenizer.json", "tokenizer.model",
                  "tokenizer_config.json"))
    if has_assets:
        from openvla_oft_tpu.processing.processor import load_tokenizer

        return load_tokenizer(ckpt)  # failures propagate
    if (ckpt.startswith("random:")
            or os.environ.get("OPENVLA_ALLOW_FAKE_TOKENIZER") == "1"):
        return FakeLlamaTokenizer()
    raise FileNotFoundError(
        f"No tokenizer assets (tokenizer.json / tokenizer.model) found in "
        f"{ckpt!r}. Real checkpoints must include the Llama tokenizer; set "
        f"OPENVLA_ALLOW_FAKE_TOKENIZER=1 to use the deterministic test "
        f"stand-in (tests/benchmarks only).")


def _resolve_local_ckpt(ckpt: str) -> str:
    """Resolve hub-id checkpoint strings to their downloaded snapshot dir
    (same hook get_vla uses); local dirs and random: sentinels pass through."""
    if ckpt.startswith("random:") or os.path.isdir(ckpt):
        return ckpt
    from openvla_oft_tpu.models.registry import _resolve_checkpoint_dir

    return _resolve_checkpoint_dir(ckpt, None)


def get_processor(cfg: Any) -> PrismaticProcessor:
    """Reference openvla_utils.py:380-390."""
    from openvla_oft_tpu.config import OpenVLAConfig

    ckpt = _resolve_local_ckpt(str(cfg.pretrained_checkpoint))
    if not ckpt.startswith("random:") and os.path.isdir(ckpt):
        model_cfg, _ = OpenVLAConfig.from_json_file(
            os.path.join(ckpt, "config.json"))
    else:
        model_cfg = OpenVLAConfig()
    return PrismaticProcessor(model_cfg, _try_tokenizer(ckpt))


def get_action_head(cfg: Any, llm_dim: int = 4096):
    """Load the L1/diffusion head from the checkpoint dir
    (reference openvla_utils.py:463-513)."""
    ckpt = _resolve_local_ckpt(str(cfg.pretrained_checkpoint))
    if getattr(cfg, "use_l1_regression", True):
        path = find_checkpoint_file(ckpt, "action_head")
        return import_action_head_pt(path, head="l1")
    path = find_checkpoint_file(ckpt, "action_head")
    return import_action_head_pt(path, head="diffusion")


def get_proprio_projector(cfg: Any, llm_dim: int = 4096,
                          proprio_dim: int = 8):
    """Reference openvla_utils.py:393-434."""
    path = find_checkpoint_file(
        _resolve_local_ckpt(str(cfg.pretrained_checkpoint)),
        "proprio_projector")
    return import_projector_pt(path, kind="proprio")


def get_noisy_action_projector(cfg: Any, llm_dim: int = 4096):
    """Reference openvla_utils.py:437-460."""
    path = find_checkpoint_file(
        _resolve_local_ckpt(str(cfg.pretrained_checkpoint)),
        "noisy_action_projector")
    return import_projector_pt(path, kind="noisy_action")


def normalize_proprio(proprio: np.ndarray, norm_stats: Dict[str, Any],
                      norm_type=None) -> np.ndarray:
    """Reference openvla_utils.py:645-675 (clip to [-1, 1])."""
    from openvla_oft_tpu.constants import NormalizationType

    nt = norm_type or NormalizationType.BOUNDS_Q99
    out = _normalize_stats(proprio, norm_stats, nt)
    return np.clip(out, -1.0, 1.0)


def check_image_format(image: np.ndarray) -> None:
    """Reference openvla_utils.py:625-642."""
    assert isinstance(image, np.ndarray), "image must be a numpy array"
    assert image.dtype == np.uint8, f"expected uint8 image, got {image.dtype}"
    assert image.ndim == 3 and image.shape[-1] == 3, \
        f"expected (H, W, 3) image, got {image.shape}"


def get_vla_action(
    cfg: Any,
    vla: OpenVLAPolicy,
    processor: Any,
    obs: Dict[str, Any],
    task_label: str,
    action_head=None,
    proprio_projector=None,
    noisy_action_projector=None,
    use_film: bool = False,
) -> List[np.ndarray]:
    """Predict an action chunk from one observation
    (reference openvla_utils.py:711-796)."""
    all_images = [obs["full_image"]]
    if getattr(cfg, "num_images_in_input", 1) > 1:
        all_images.extend([obs[k] for k in obs.keys()
                           if "wrist" in k or "camera_gripper_image" in k])
    for im in all_images:
        check_image_format(im)

    # Inject separately-loaded modules (reference passes them into
    # predict_action; our policy holds one param tree).
    if action_head is not None:
        vla.params["action_head"] = action_head
    if proprio_projector is not None:
        vla.params["proprio_projector"] = proprio_projector
    if noisy_action_projector is not None:
        vla.params["noisy_action_projector"] = noisy_action_projector

    if getattr(cfg, "device_preprocess", False) and vla.head == "l1":
        # Latency path: the whole chunk (resize/crop/normalize -> prefill ->
        # head -> unnorm + proprio normalization) runs as ONE compiled
        # program (policy.serve_action_chunk). Skips the host JPEG round
        # trip — use the default staged path when bit-parity with the
        # reference eval conditioning matters more than latency.
        frames = np.stack([np.asarray(im, np.uint8) for im in all_images])
        actions = vla.predict_action_from_frames(
            frames, task_label,
            proprio=np.asarray(obs["state"], np.float32)
            if getattr(cfg, "use_proprio", False) else None,
            unnorm_key=getattr(cfg, "unnorm_key", None),
            center_crop=getattr(cfg, "center_crop", True))
        n = min(len(actions), getattr(cfg, "num_open_loop_steps", len(actions)))
        return [actions[i] for i in range(n)]

    pixels = prepare_images_for_policy(
        all_images, vla.cfg, center_crop=getattr(cfg, "center_crop", True))

    proprio = None
    if getattr(cfg, "use_proprio", False):
        proprio = np.asarray(obs["state"], np.float32)
        if vla.norm_stats:
            # stats-less policies (random: smoke checkpoints) pass proprio
            # through raw, mirroring the un-normalized action path
            unnorm_key = getattr(cfg, "unnorm_key", None) or \
                next(iter(vla.norm_stats))
            proprio = normalize_proprio(
                proprio, vla.norm_stats[unnorm_key]["proprio"],
                vla.platform.norm_type)
        obs["state"] = proprio

    actions = vla.predict_action(pixels, task_label, proprio=proprio,
                                 unnorm_key=getattr(cfg, "unnorm_key", None))
    n = min(len(actions), getattr(cfg, "num_open_loop_steps", len(actions)))
    return [actions[i] for i in range(n)]
